package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}
import java.nio.ByteBuffer

/** MinHash signature aggregate over hashed shingles: for each of
  * `numPerms` universal-hash "permutations"
  * (`(a_p·(x mod M) + b_p) mod M`, PolyHash coefficients), keep the
  * minimum seen — one tight JVM loop per input row instead of
  * `numPerms` interpreted `array_min(transform(...))` HOF evaluations
  * per document (the same compile-weight/interpretation argument as
  * SimHashAgg; signature build was the dominant term of the MinHash
  * pipeline). Deterministic across processes AND engines — the same
  * arithmetic replays in the DuckDB oracles.
  *
  * Superseded in the LSH pipeline by the scalar twin
  * [[MinHashSignature]] (identical signatures with no explode/shuffle);
  * kept as the aggregate-shaped surface for pre-exploded inputs — e.g.
  * a shingle table that already exists row-per-shingle.
  */
case class MinHashAgg(
    child: Expression,
    numPerms: Int = 32,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Long]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  override def createAggregationBuffer(): Array[Long] =
    Array.fill(numPerms)(Long.MaxValue)

  override def update(buf: Array[Long], input: InternalRow): Array[Long] = {
    val v = child.eval(input)
    if (v != null) {
      val x = v.asInstanceOf[Long] % PolyHash.M
      var i = 0
      while (i < numPerms) {
        val p = (PolyHash.PermA(i) * x + PolyHash.PermB(i)) % PolyHash.M
        if (p < buf(i)) buf(i) = p
        i += 1
      }
    }
    buf
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < numPerms) {
      if (b(i) < a(i)) a(i) = b(i)
      i += 1
    }
    a
  }

  override def eval(buf: Array[Long]): Any = new GenericArrayData(buf)

  override def serialize(buf: Array[Long]): Array[Byte] = {
    val bb = ByteBuffer.allocate(numPerms * 8)
    buf.foreach(bb.putLong)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Long] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(numPerms)(bb.getLong())
  }

  override def withNewMutableAggBufferOffset(offset: Int): MinHashAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): MinHashAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): MinHashAgg =
    copy(child = newChildren.head)
}

object MinHashAgg {
  /** Column API: `minhash_agg(shingleHashCol)` → array<long> of
    * numPerms minimums.
    */
  def minhash_agg(shingleHash: Column, numPerms: Int = 32): Column =
    GraftShim.toColumn(
      MinHashAgg(GraftShim.toExpression(shingleHash), numPerms)
        .toAggregateExpression())
}
