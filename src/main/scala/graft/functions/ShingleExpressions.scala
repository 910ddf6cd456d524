package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Distinct hashed word-n-gram shingles of a text column, in ONE
  * native per-row pass: lowercase → whitespace-split → 60-bit packed
  * polynomial token hash → two-fold packed combine per n-gram →
  * first-occurrence distinct. All arithmetic is [[PolyHash]] — the
  * hashes replay in DuckDB SQL, which is what moves the MinHash
  * queries from rows-only to hash-verified oracles (round 8; the
  * previous xxhash64 basis needed 64-bit wraparound multiplies no
  * SQL engine exposes).
  *
  * Replaces the declarative chain
  * `array_distinct(transform(sequence(...), i => combine(element_at×3)))`
  * over `transform(split(lower(text)), tokenHash)` — four higher-order
  * functions whose lambdas evaluate interpreted, which made the
  * shingle stage the dominant cost of every dedup query. Produces
  * bit-identical hashes to that chain (same folds, same packing), so
  * swapping it in changes no query output — asserted by the parity
  * case in DedupSpec.
  */
case class ShingleHashes(child: Expression, n: Int = 3)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"shingle_hashes expects a string input, got " +
          child.dataType.catalogString)

  override def nullSafeEval(v: Any): Any =
    ShingleHashes.compute(v.asInstanceOf[UTF8String], n)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.ShingleHashes" +
        "$.MODULE$" + s".compute($c, $n);")

  override protected def withNewChildInternal(newChild: Expression)
      : ShingleHashes = copy(child = newChild)
}

object ShingleHashes {
  // same pattern string the declarative twin passes to split()
  private val Whitespace = UTF8String.fromString("\\s+")

  /** One pass over the text: 60-bit packed token hashes
    * ([[PolyHash.tokenHash64]]), each n-gram combined by the packed
    * two-fold ([[PolyHash.shingleHash]]), deduplicated keeping
    * first-occurrence order exactly like `array_distinct`.
    */
  def compute(s: UTF8String, n: Int): ArrayData = {
    val toks = s.toLowerCase.split(Whitespace, -1)
    val m = toks.length
    if (m < n) return new GenericArrayData(Array.emptyLongArray)
    val th = new Array[Long](m)
    var i = 0
    while (i < m) {
      th(i) = PolyHash.tokenHash64(toks(i).getBytes)
      i += 1
    }
    val out = new Array[Long](m - n + 1)
    val seen = new java.util.HashSet[java.lang.Long](((m - n + 1) * 4) / 3 + 1)
    var k = 0
    i = 0
    while (i <= m - n) {
      val h = PolyHash.shingleHash(th, i, n)
      if (seen.add(h)) { out(k) = h; k += 1 }
      i += 1
    }
    new GenericArrayData(java.util.Arrays.copyOf(out, k))
  }
}

/** Row-local MinHash signature over a hashed-shingle array: for each
  * of `numPerms` universal-hash "permutations"
  * (`(a_p·(x mod M) + b_p) mod M`, [[PolyHash.perm]]), the minimum.
  *
  * The scalar twin of MinHashAgg (same coefficients — identical
  * signatures). The aggregate formulation needs the
  * shingles EXPLODED and shuffled to a groupBy — at 100 TB that is a
  * shuffle of every shingle of every document. This computes the
  * signature where the document already is: no explode, no shuffle,
  * signature table falls out of a scan.
  */
case class MinHashSignature(child: Expression, numPerms: Int = 32)
    extends UnaryExpression {

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = child.nullable

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(LongType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case dt =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"minhash_signature expects array<bigint>, got ${dt.catalogString}")
    }

  override def nullSafeEval(v: Any): Any =
    MinHashSignature.compute(v.asInstanceOf[ArrayData], numPerms)

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.MinHashSignature" +
        "$.MODULE$" + s".compute($c, $numPerms);")

  override protected def withNewChildInternal(newChild: Expression)
      : MinHashSignature = copy(child = newChild)
}

object MinHashSignature {
  def compute(arr: ArrayData, numPerms: Int): ArrayData = {
    val sig = Array.fill(numPerms)(Long.MaxValue)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val x = arr.getLong(i) % PolyHash.M
      var p = 0
      while (p < numPerms) {
        val v = (PolyHash.PermA(p) * x + PolyHash.PermB(p)) % PolyHash.M
        if (v < sig(p)) sig(p) = v
        p += 1
      }
      i += 1
    }
    new GenericArrayData(sig)
  }
}

object ShingleFunctions {
  /** Column API: distinct hashed word-n-gram shingles of `text`. */
  def shingle_hashes(text: Column, n: Int = 3): Column =
    GraftShim.toColumn(ShingleHashes(GraftShim.toExpression(text), n))

  /** Column API: row-local MinHash signature of a shingle-hash array. */
  def minhash_signature(shh: Column, numPerms: Int = 32): Column =
    GraftShim.toColumn(
      MinHashSignature(GraftShim.toExpression(shh), numPerms))
}
