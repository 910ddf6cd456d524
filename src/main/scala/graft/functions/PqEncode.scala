package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._

/** Product-quantization encoder: maps a float/double embedding to its
  * `m` per-subspace nearest-centroid codes in one fused loop
  * (graft.sim.Similarity PQ — Jégou/Douze/Schmid 2011).
  *
  * Why a native expression instead of an argmax over per-cell literal
  * dot products: Lloyd iterations retrain the codebook every round, and
  * literal centroids would change the generated source each time —
  * every round pays a fresh Janino compile of a 64-dot-product
  * expression (measured: the literal formulation made PQ training
  * slower than the join it replaced). Here the codebook rides in a
  * codegen REFERENCE object, so the generated source is byte-identical
  * across rounds and the CodeGenerator cache serves every round after
  * the first.
  *
  * L2 argmin uses the 2·<x,c> − <c,c> identity (<x,x> is constant under
  * argmin); ties break to the lowest cell, matching the
  * max_by(struct(score, -cell)) formulation it replaces.
  *
  * `codebook(mi)(cell)` is the centroid of cell `cell` in subspace
  * `mi`; all subspaces must share one centroid count and one subvector
  * length. Structural (Seq) equality keeps plan equality exact.
  */
case class PqEncode(child: Expression, codebook: Seq[Seq[Seq[Double]]])
    extends UnaryExpression {

  require(codebook.nonEmpty && codebook.forall(_.nonEmpty))
  private val m = codebook.length
  private val kSub = codebook.head.length
  private val subLen = codebook.head.head.length
  require(codebook.forall(sub =>
    sub.length == kSub && sub.forall(_.length == subLen)),
    "ragged PQ codebook")

  override def dataType: DataType = ArrayType(IntegerType, containsNull = false)

  private def isFloat: Boolean =
    child.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    child.dataType match {
      case ArrayType(FloatType | DoubleType, _) =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
      case other =>
        org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
          s"pq_encode expects array<float|double>, got ${other.catalogString}")
    }

  @transient private lazy val cb: Array[Array[Array[Double]]] =
    codebook.map(_.map(_.toArray).toArray).toArray
  @transient private lazy val cc: Array[Array[Double]] =
    codebook.map(_.map(c => c.map(x => x * x).sum).toArray).toArray

  override def nullSafeEval(input: Any): Any = {
    val x = input.asInstanceOf[ArrayData]
    val f = isFloat
    val codes = new Array[Int](m)
    var mi = 0
    while (mi < m) {
      var best = Double.NegativeInfinity
      var bestCell = 0
      val off = mi * subLen
      var cell = 0
      while (cell < kSub) {
        val cent = cb(mi)(cell)
        var dot = 0.0
        var j = 0
        while (j < subLen) {
          val xv = if (f) x.getFloat(off + j).toDouble else x.getDouble(off + j)
          dot += xv * cent(j)
          j += 1
        }
        val score = 2 * dot - cc(mi)(cell)
        if (score > best) { best = score; bestCell = cell }
        cell += 1
      }
      codes(mi) = bestCell
      mi += 1
    }
    new GenericArrayData(codes)
  }

  override protected def doGenCode(ctx: CodegenContext,
      ev: ExprCode): ExprCode = {
    val cbRef = ctx.addReferenceObj("pqCodebook", cb, "double[][][]")
    val ccRef = ctx.addReferenceObj("pqNorms", cc, "double[][]")
    val get = if (isFloat) "getFloat" else "getDouble"
    nullSafeCodeGen(ctx, ev, a => {
      val codes = ctx.freshName("codes")
      val mi = ctx.freshName("mi")
      val cell = ctx.freshName("cell")
      val j = ctx.freshName("j")
      s"""
         |int[] $codes = new int[$m];
         |for (int $mi = 0; $mi < $m; $mi++) {
         |  double best = Double.NEGATIVE_INFINITY; int bestCell = 0;
         |  int off = $mi * $subLen;
         |  for (int $cell = 0; $cell < $kSub; $cell++) {
         |    double[] cent = $cbRef[$mi][$cell];
         |    double dot = 0.0;
         |    for (int $j = 0; $j < $subLen; $j++) {
         |      dot += ((double) $a.$get(off + $j)) * cent[$j];
         |    }
         |    double score = 2 * dot - $ccRef[$mi][$cell];
         |    if (score > best) { best = score; bestCell = $cell; }
         |  }
         |  $codes[$mi] = bestCell;
         |}
         |${ev.value} =
         |  new org.apache.spark.sql.catalyst.util.GenericArrayData($codes);
       """.stripMargin
    })
  }

  override protected def withNewChildInternal(newChild: Expression)
      : PqEncode = copy(child = newChild)
}

object PqFunctions {
  def pq_encode(emb: Column, codebook: Seq[Seq[Seq[Double]]]): Column =
    GraftShim.toColumn(PqEncode(GraftShim.toExpression(emb), codebook))
}
