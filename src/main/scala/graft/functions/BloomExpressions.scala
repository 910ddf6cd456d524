package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._
import org.apache.spark.util.sketch.BloomFilter

/** Membership probe against a pre-built Bloom filter (the
  * `org.apache.spark.util.sketch` one `DataFrameStatFunctions
  * .bloomFilter` trains) — the engine's "broadcast a set too big for
  * an IN-list, too small to deserve a join" primitive.
  *
  * The filter ships as its serialized bytes inside the expression and
  * deserializes ONCE per executor (transient lazy / generated lazy
  * field), then every probe is a few xxhash bit tests — row-local,
  * zero shuffle, whole-stage-codegen friendly, and usable inside
  * higher-order-function lambdas (the interpreted path is the same
  * lazily-cached filter).
  *
  * May return false positives at the filter's trained fpp; never false
  * negatives — callers must treat `true` as "candidate", which is
  * exactly the decontamination-flagging semantic
  * (Pipeline.pipeline_decontaminate_bloom).
  */
case class BloomMightContain(child: Expression, filterBytes: Array[Byte])
    extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case LongType =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"bloom_might_contain expects a BIGINT item (hash your key " +
            s"first), got ${other.catalogString}")
    }

  @transient private lazy val bloom: BloomFilter =
    BloomFilter.readFrom(new java.io.ByteArrayInputStream(filterBytes))

  override def nullSafeEval(v: Any): Any =
    bloom.mightContainLong(v.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val bytesRef = ctx.addReferenceObj("bloomBytes", filterBytes, "byte[]")
    val bloomRef = ctx.addMutableState(
      "org.apache.spark.util.sketch.BloomFilter", "bloom")
    nullSafeCodeGen(ctx, ev, v => {
      s"""
         |if ($bloomRef == null) {
         |  try {
         |    $bloomRef = org.apache.spark.util.sketch.BloomFilter.readFrom(
         |      new java.io.ByteArrayInputStream($bytesRef));
         |  } catch (java.io.IOException e) {
         |    throw new RuntimeException(e);
         |  }
         |}
         |${ev.value} = $bloomRef.mightContainLong($v);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : BloomMightContain = copy(child = newChild)
}

object BloomFunctions {
  /** Column API: probe `item` (BIGINT) against a trained filter. */
  def bloom_might_contain(item: Column, bloom: BloomFilter): Column = {
    val baos = new java.io.ByteArrayOutputStream()
    bloom.writeTo(baos)
    GraftShim.toColumn(BloomMightContain(
      GraftShim.toExpression(item), baos.toByteArray))
  }
}
