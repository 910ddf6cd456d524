package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types.{DataType, LongType}
import java.nio.ByteBuffer

/** 64-bit SimHash aggregate over per-token hash values (Charikar
  * 2002): every input hash votes ±1 on each of the 64 bit positions;
  * the sign of each tally becomes the output bit.
  *
  * Why a custom TypedImperativeAggregate: the declarative formulation
  * needs 64 separate `sum(when(shiftright(h,k)&1=1,1).otherwise(-1))`
  * aggregate columns, whose generated code is so large that Janino+JIT
  * compilation costs ~11 s per session (measured — the query itself
  * then runs in ~3 s). This buffer does all 64 tallies in one tight
  * JVM loop per input row: negligible codegen, same result, and the
  * standard extension point for sketch-like aggregates (HLL, CPC,
  * DataSketches all use this shape).
  */
case class SimHashAgg(
    child: Expression,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[Array[Int]] {

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false
  override def dataType: DataType = LongType
  // input must already be LongType (xxhash64 output); AbstractDataType
  // is private[sql] in Spark 4 so no ExpectsInputTypes contract here

  override def createAggregationBuffer(): Array[Int] = new Array[Int](64)

  override def update(buf: Array[Int], input: InternalRow): Array[Int] = {
    val v = child.eval(input)
    if (v != null) {
      val h = v.asInstanceOf[Long]
      var k = 0
      while (k < 64) {
        buf(k) += (if (((h >>> k) & 1L) == 1L) 1 else -1)
        k += 1
      }
    }
    buf
  }

  override def merge(a: Array[Int], b: Array[Int]): Array[Int] = {
    var k = 0
    while (k < 64) { a(k) += b(k); k += 1 }
    a
  }

  override def eval(buf: Array[Int]): Any = {
    var out = 0L
    var k = 0
    while (k < 64) {
      if (buf(k) > 0) out |= (1L << k)
      k += 1
    }
    java.lang.Long.valueOf(out)
  }

  override def serialize(buf: Array[Int]): Array[Byte] = {
    val bb = ByteBuffer.allocate(64 * 4)
    buf.foreach(bb.putInt)
    bb.array()
  }

  override def deserialize(bytes: Array[Byte]): Array[Int] = {
    val bb = ByteBuffer.wrap(bytes)
    Array.fill(64)(bb.getInt())
  }

  override def withNewMutableAggBufferOffset(offset: Int): SimHashAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SimHashAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SimHashAgg =
    copy(child = newChildren.head)
}

object SimHashAgg {
  /** Column API: `simhash_agg(tokenHashCol)` → 64-bit simhash long. */
  def simhash_agg(tokenHash: Column): Column =
    GraftShim.toColumn(
      SimHashAgg(GraftShim.toExpression(tokenHash))
        .toAggregateExpression())
}
