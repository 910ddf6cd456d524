package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Unicode NFC normalization as a native Catalyst expression — the
  * first pass of any text-cleaning pipeline (decomposed accent
  * sequences, compatibility variants from different scrapers, etc.
  * must collapse to one canonical form BEFORE hashing, dedup, or
  * tokenization, or visually identical documents fingerprint apart).
  * Spark ships no normalization builtin; a Scala UDF would serialize
  * through the encoder on every row, so this wraps
  * `java.text.Normalizer` (ICU-equivalent for the normalization
  * forms, part of the JDK — no new dependency) behind codegen. The
  * quick-check fast path inside Normalizer makes already-NFC input
  * (the overwhelming majority of real text) a scan, not a rewrite.
  *
  * Oracle parity: DuckDB exposes the same operation as
  * `nfc_normalize(text)`, making this the rare custom expression with
  * a true cross-engine oracle (`text_normalize`).
  */
case class NfcNormalize(child: Expression) extends UnaryExpression {

  override def dataType: DataType = StringType
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes(): TypeCheckResult =
    if (child.dataType == StringType) TypeCheckResult.TypeCheckSuccess
    else TypeCheckResult.TypeCheckFailure(
      s"nfc_normalize expects a string input, got " +
        child.dataType.catalogString)

  override def nullSafeEval(v: Any): Any =
    UTF8String.fromString(java.text.Normalizer.normalize(
      v.asInstanceOf[UTF8String].toString,
      java.text.Normalizer.Form.NFC))

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    defineCodeGen(ctx, ev, s =>
      s"org.apache.spark.unsafe.types.UTF8String.fromString(" +
        s"java.text.Normalizer.normalize($s.toString(), " +
        "java.text.Normalizer.Form.NFC))")

  override protected def withNewChildInternal(newChild: Expression)
      : NfcNormalize = copy(newChild)
}

object NfcNormalize {
  def nfc_normalize(c: Column): Column =
    GraftShim.toColumn(NfcNormalize(GraftShim.toExpression(c)))
}
