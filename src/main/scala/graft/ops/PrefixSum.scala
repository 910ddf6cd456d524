package graft.ops

import org.apache.spark.sql.{Column, DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{LongType, StructType}

/** Distributed running total (prefix sum) over a global ordering.
  *
  * A `Window.orderBy(...)` with no partitionBy plans as a SINGLE task
  * holding the entire sorted input — the one window shape that cannot
  * scale (fine on 60 k rows, fatal at 100 TB). The classic fix, and
  * what this operator implements, is the two-pass parallel scan:
  *
  *   1. range-repartition on the order key and sort within partitions
  *      (one shuffle — the same cost a global orderBy pays anyway);
  *   2. job A: per-partition value totals — |partitions| longs to the
  *      driver, exclusive-scanned into per-partition start offsets;
  *   3. job B: per-partition local running sum + broadcast offset.
  *
  * Both jobs re-read the range shuffle's files (stage reuse), and the
  * sorted frame is persisted so job B does not re-sort. The
  * driver-side state is one long per partition — constant-size at any
  * data scale, the same shape as k-means' driver-held centroids
  * (Similarity.kmeansCentroidsWithStats).
  *
  * The imperative per-partition pass is genuine per-partition logic —
  * exactly the `mapPartitions`-as-last-resort case the build rules
  * carve out; no declarative plan expresses "my partition's offset is
  * the sum of every earlier partition" without the driver hop.
  * PrefixSumSpec proves the result equals the single-task window form
  * and is invariant to the partition count.
  *
  * `value` must be integer-valued (long-castable): running totals in
  * doubles would make the result partition-count-DEPENDENT through
  * float fold order, which breaks both the spec's invariance claim and
  * oracle parity. Callers sum integer cents (the q1/q25 discipline).
  */
object PrefixSum {

  /** Append `outCol` = running total of `value` under `order`
    * (ascending lexicographic on the given columns, which must be a
    * total order — include a unique tie-break). The returned frame
    * keeps the sorted order; its lineage holds a persisted node the
    * caller releases via `spark.catalog.clearCache()` (Bench/Verify
    * already do — the repo's cache-lifecycle discipline).
    */
  def runningTotal(df: DataFrame, order: Seq[Column], value: Column,
      outCol: String): DataFrame = {
    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    val withV = df.withColumn("__psv", value.cast(LongType))
    val sorted = withV.repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vIdx = sorted.schema.fieldIndex("__psv")
    // both jobs walk the same deserialized view of the persisted
    // frame; pid indexing is consistent because the range partitioner
    // is deterministic for a given input
    val rowRdd = sorted.rdd
    // job A: one (pid, total) pair per partition — bytes to the driver
    val totals = rowRdd
      .mapPartitionsWithIndex { (pid, it) =>
        var s = 0L
        it.foreach(r => s += r.getLong(vIdx))
        Iterator((pid, s))
      }.collect().sortBy(_._1).map(_._2)
    // exclusive scan → partition start offsets (driver arithmetic)
    val offsets = totals.scanLeft(0L)(_ + _)
    val bc = spark.sparkContext.broadcast(offsets)
    val outSchema = StructType(sorted.schema.fields)
      .add(outCol, LongType, nullable = false)
    // job B: local inclusive scan + my partition's broadcast offset,
    // reading from the persisted sorted frame (no re-sort)
    val resultRdd = rowRdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = bc.value(pid)
      it.map { r =>
        acc += r.getLong(vIdx)
        Row.fromSeq(r.toSeq :+ acc)
      }
    }
    spark.createDataFrame(resultRdd, outSchema)
      .drop("__psv")
  }

  /** Append `outCol` = maximum of `value` over all STRICTLY EARLIER
    * rows under `order` (exclusive prefix max; Long.MinValue when no
    * earlier row exists). Same two-pass scan as `runningTotal` with
    * max as the combine — max is associative, so per-partition maxima
    * exclusive-scanned on the driver give each partition's carry-in,
    * and the local pass emits the carry BEFORE folding its own row
    * (that one-line ordering is what makes the prefix exclusive; an
    * inclusive max is useless for dominance tests, where a row must
    * not compare against itself). Driver state: one long per
    * partition, constant at any scale. Exclusivity is with respect to
    * ROW POSITION in the total order — callers whose predicate needs
    * "strictly earlier in a partial order" (e.g. skyline dominance)
    * must encode the strictness into the order columns themselves,
    * the way Mining.q76 orders (price asc, size desc) over DISTINCT
    * pairs. PrefixSumSpec proves equality with the single-task
    * `max().over(rowsBetween(unboundedPreceding, -1))` window and
    * invariance to the partition count.
    */
  def runningMaxExclusive(df: DataFrame, order: Seq[Column],
      value: Column, outCol: String): DataFrame = {
    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    val withV = df.withColumn("__psv", value.cast(LongType))
    val sorted = withV.repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vIdx = sorted.schema.fieldIndex("__psv")
    val rowRdd = sorted.rdd
    val totals = rowRdd
      .mapPartitionsWithIndex { (pid, it) =>
        var m = Long.MinValue
        it.foreach(r => m = math.max(m, r.getLong(vIdx)))
        Iterator((pid, m))
      }.collect().sortBy(_._1).map(_._2)
    val offsets = totals.scanLeft(Long.MinValue)(math.max)
    val bc = spark.sparkContext.broadcast(offsets)
    val outSchema = StructType(sorted.schema.fields)
      .add(outCol, LongType, nullable = false)
    val resultRdd = rowRdd.mapPartitionsWithIndex { (pid, it) =>
      var acc = bc.value(pid)
      it.map { r =>
        val prev = acc
        acc = math.max(acc, r.getLong(vIdx))
        Row.fromSeq(r.toSeq :+ prev)
      }
    }
    spark.createDataFrame(resultRdd, outSchema)
      .drop("__psv")
  }
}
