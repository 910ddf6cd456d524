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
      outCol: String): DataFrame =
    runningTotals(df, order, Seq(value -> outCol))

  /** Running totals of SEVERAL values under ONE order, in one pass.
    *
    * Chaining k `runningTotal` calls on the same order pays k range
    * shuffles, k sorts, k persists and 2k jobs — but the scan carries
    * each column independently, so every extra column rides the SAME
    * two-pass machinery for free: one vector of longs per partition
    * to the driver instead of one long (r19, guide §1.2/§2.4; the
    * q221 Jonckheere five-chain was 10 serial jobs, now 2). Callers
    * with a single value go through `runningTotal` above, which
    * delegates here — PrefixSumSpec's window-parity and
    * partition-invariance properties therefore pin this path too.
    */
  def runningTotals(df: DataFrame, order: Seq[Column],
      values: Seq[(Column, String)]): DataFrame = {
    val spark = df.sparkSession
    val n = spark.sessionState.conf.numShufflePartitions
    val k = values.size
    // withColumn REPLACES by name — a caller column named __psvN would
    // be silently corrupted (ADVICE r19), so reject the collision
    require(!df.schema.fieldNames.exists(_.startsWith("__psv")),
      "runningTotals: input must not contain __psv-prefixed columns")
    val withV = values.zipWithIndex.foldLeft(df) {
      case (acc, ((v, _), i)) =>
        acc.withColumn(s"__psv$i", v.cast(LongType))
    }
    val sorted = withV.repartitionByRange(n, order: _*)
      .sortWithinPartitions(order: _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val vIdx = (0 until k)
      .map(i => sorted.schema.fieldIndex(s"__psv$i")).toArray
    // both jobs walk the same deserialized view of the persisted
    // frame; pid indexing is consistent because the range partitioner
    // is deterministic for a given input
    val rowRdd = sorted.rdd
    // job A: one (pid, totals-vector) pair per partition — k longs per
    // partition to the driver
    val totals = rowRdd
      .mapPartitionsWithIndex { (pid, it) =>
        val s = new Array[Long](k)
        it.foreach { r =>
          var i = 0
          while (i < k) { s(i) += r.getLong(vIdx(i)); i += 1 }
        }
        Iterator((pid, s))
      }.collect().sortBy(_._1).map(_._2)
    // exclusive scan → partition start offsets (driver arithmetic)
    val offsets = totals.scanLeft(new Array[Long](k)) { (a, b) =>
      Array.tabulate(k)(i => a(i) + b(i))
    }
    val bc = spark.sparkContext.broadcast(offsets)
    val outSchema = values.foldLeft(StructType(sorted.schema.fields)) {
      case (sch, (_, out)) => sch.add(out, LongType, nullable = false)
    }
    // job B: local inclusive scan + my partition's broadcast offset,
    // reading from the persisted sorted frame (no re-sort)
    val resultRdd = rowRdd.mapPartitionsWithIndex { (pid, it) =>
      val acc = bc.value(pid).clone()
      it.map { r =>
        var i = 0
        while (i < k) { acc(i) += r.getLong(vIdx(i)); i += 1 }
        // acc mutates per row — materialize a snapshot into the Row
        Row.fromSeq(r.toSeq ++ acc.toList)
      }
    }
    (0 until k).foldLeft(
      spark.createDataFrame(resultRdd, outSchema)) { (acc, i) =>
      acc.drop(s"__psv$i")
    }
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
