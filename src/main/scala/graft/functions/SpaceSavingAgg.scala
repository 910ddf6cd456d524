package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.GenericArrayData
import org.apache.spark.sql.graftshim.GraftShim
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String
import java.nio.ByteBuffer
import java.nio.charset.StandardCharsets
import scala.collection.mutable

/** SpaceSaving heavy-hitters sketch (Metwally, Agrawal, El Abbadi
  * 2005) as a TypedImperativeAggregate — bounded-memory frequent-items
  * over an unbounded stream, the missing sibling of the HLL++ /
  * approx-percentile sketches in q29. `m` counters track the heaviest
  * items; when a new item arrives at capacity, the minimum counter is
  * evicted and the newcomer inherits its count as both estimate floor
  * and tracked error.
  *
  * Invariants (asserted in SpaceSavingSpec):
  *  - overestimate: est(i) >= true(i) for every reported item;
  *  - bounded: est(i) - err(i) <= true(i);
  *  - any item with true count > N/m cannot be displaced entirely;
  *  - with m >= distinct(items) no eviction ever happens and the
  *    sketch is EXACT — which is what lets q30_heavy_hitters run
  *    against a plain GROUP BY count oracle.
  *
  * Distributed merge keeps the overestimate invariant the
  * mergeable-summaries way (Agarwal et al. 2012): an item absent from
  * a FULL summary may have been evicted there, so the absent side
  * contributes that summary's min-count to both the estimate and the
  * error; a non-full summary proves absence and contributes zero.
  * After the union, only the top `m` by estimate survive. Merge is
  * what partial aggregation exercises on every multi-partition run,
  * so the property holds under Spark's map-side combine by
  * construction, not by luck.
  *
  * Eviction scans the m-entry map for the minimum — O(m) per evicting
  * update instead of the paper's O(1) linked buckets, the right trade
  * below a few thousand counters (the map stays L1/L2-resident; a
  * linked structure would chase pointers per UPDATE, evicting or not).
  *
  * Output: `array<struct<item string, est bigint, err bigint>>`
  * sorted by (est desc, item asc) — deterministic for the gate.
  */
case class SpaceSavingAgg(
    child: Expression,
    m: Int = 64,
    mutableAggBufferOffset: Int = 0,
    inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[mutable.HashMap[String, (Long, Long)]] {

  require(m > 0, "space_saving(item, m): capacity m must be positive")

  override def children: Seq[Expression] = Seq(child)
  override def nullable: Boolean = false

  override def checkInputDataTypes()
      : org.apache.spark.sql.catalyst.analysis.TypeCheckResult =
    if (child.dataType == StringType)
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckSuccess
    else
      org.apache.spark.sql.catalyst.analysis.TypeCheckResult.TypeCheckFailure(
        s"space_saving expects a string item column, got " +
          child.dataType.catalogString)

  override def dataType: DataType = ArrayType(StructType(Seq(
    StructField("item", StringType, nullable = false),
    StructField("est", LongType, nullable = false),
    StructField("err", LongType, nullable = false))), containsNull = false)

  override def createAggregationBuffer()
      : mutable.HashMap[String, (Long, Long)] =
    mutable.HashMap.empty

  override def update(buf: mutable.HashMap[String, (Long, Long)],
      input: InternalRow): mutable.HashMap[String, (Long, Long)] = {
    val v = child.eval(input)
    if (v != null)
      SpaceSaving.add(buf, v.asInstanceOf[UTF8String].toString, m)
    buf
  }

  override def merge(a: mutable.HashMap[String, (Long, Long)],
      b: mutable.HashMap[String, (Long, Long)])
      : mutable.HashMap[String, (Long, Long)] =
    SpaceSaving.merge(a, b, m)

  override def eval(buf: mutable.HashMap[String, (Long, Long)]): Any = {
    val sorted = buf.toSeq.sortBy { case (k, (c, _)) => (-c, k) }
    new GenericArrayData(sorted.map { case (k, (c, e)) =>
      InternalRow(UTF8String.fromString(k), c, e)
    }.toArray[Any])
  }

  override def serialize(buf: mutable.HashMap[String, (Long, Long)])
      : Array[Byte] = {
    val entries = buf.toSeq.map { case (k, (c, e)) =>
      (k.getBytes(StandardCharsets.UTF_8), c, e)
    }
    val bb = ByteBuffer.allocate(
      4 + entries.map(t => 4 + t._1.length + 16).sum)
    bb.putInt(entries.size)
    entries.foreach { case (kb, c, e) =>
      bb.putInt(kb.length); bb.put(kb); bb.putLong(c); bb.putLong(e)
    }
    bb.array()
  }

  override def deserialize(bytes: Array[Byte])
      : mutable.HashMap[String, (Long, Long)] = {
    val bb = ByteBuffer.wrap(bytes)
    val n = bb.getInt()
    val out = mutable.HashMap.empty[String, (Long, Long)]
    (0 until n).foreach { _ =>
      val kb = new Array[Byte](bb.getInt())
      bb.get(kb)
      out(new String(kb, StandardCharsets.UTF_8)) =
        (bb.getLong(), bb.getLong())
    }
    out
  }

  override def withNewMutableAggBufferOffset(offset: Int): SpaceSavingAgg =
    copy(mutableAggBufferOffset = offset)
  override def withNewInputAggBufferOffset(offset: Int): SpaceSavingAgg =
    copy(inputAggBufferOffset = offset)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): SpaceSavingAgg =
    copy(child = newChildren.head)
}

/** Algorithm core, shared by the batch aggregate above and the
  * streaming `StreamOps.heavyHittersStream` state (same counters,
  * same invariants — one implementation to trust).
  */
object SpaceSaving {
  /** One SpaceSaving update against a counter map of capacity m. */
  def add(buf: mutable.HashMap[String, (Long, Long)], k: String,
      m: Int): Unit =
    buf.get(k) match {
      case Some((c, e)) => buf(k) = (c + 1, e)
      case None if buf.size < m => buf(k) = (1L, 0L)
      case None =>
        // evict the minimum counter (smallest count, then largest
        // key — deterministic); newcomer inherits its count as error
        var minK: String = null
        var minC = Long.MaxValue
        buf.foreach { case (k2, (c, _)) =>
          if (c < minC || (c == minC && (minK == null || k2 > minK))) {
            minC = c; minK = k2
          }
        }
        buf -= minK
        buf(k) = (minC + 1, minC)
    }

  private def minCount(b: mutable.HashMap[String, (Long, Long)],
      m: Int): Long =
    if (b.size < m) 0L else b.valuesIterator.map(_._1).min

  /** Mergeable-summaries merge (see SpaceSavingAgg scaladoc). */
  def merge(a: mutable.HashMap[String, (Long, Long)],
      b: mutable.HashMap[String, (Long, Long)], m: Int)
      : mutable.HashMap[String, (Long, Long)] = {
    val offA = minCount(a, m) // what an item evicted from a could hide
    val offB = minCount(b, m)
    val out = mutable.HashMap.empty[String, (Long, Long)]
    a.foreach { case (k, (c, e)) =>
      b.get(k) match {
        case Some((c2, e2)) => out(k) = (c + c2, e + e2)
        case None => out(k) = (c + offB, e + offB)
      }
    }
    b.foreach { case (k, (c, e)) =>
      if (!a.contains(k)) out(k) = (c + offA, e + offA)
    }
    if (out.size <= m) out
    else {
      val kept = out.toSeq.sortBy { case (k, (c, _)) => (-c, k) }.take(m)
      mutable.HashMap(kept: _*)
    }
  }
}

object SpaceSavingAgg {
  /** Column API: `space_saving(itemCol, m)` →
    * array<struct<item,est,err>> sorted heaviest-first.
    */
  def space_saving(item: Column, m: Int): Column =
    GraftShim.toColumn(
      SpaceSavingAgg(GraftShim.toExpression(item), m)
        .toAggregateExpression())
}
