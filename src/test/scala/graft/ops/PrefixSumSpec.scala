package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** The distributed prefix sum must (a) equal the single-task global
  * window exactly, (b) be invariant to the partition count — the two
  * claims that make it a safe replacement for `Window.orderBy` with
  * no partitionBy at any scale.
  */
class PrefixSumSpec extends SparkSpec {
  import spark.implicits._

  private def mk(n: Int) =
    (1 to n).map(i => ((i * 2654435761L) % 1000, i.toLong, (i % 97).toLong))
      .toDF("k", "id", "v")

  test("equals the partition-less window form") {
    val df = mk(5000)
    val got = PrefixSum.runningTotal(df, Seq($"k", $"id"), $"v", "run")
      .select($"k", $"id", $"run").as[(Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._2))
    val w = Window.orderBy($"k", $"id")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val want = df.withColumn("run", sum($"v").over(w))
      .select($"k", $"id", $"run").as[(Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._2))
    assert(got.sameElements(want))
    spark.catalog.clearCache()
  }

  test("result is invariant to the shuffle-partition count") {
    val df = mk(3000)
    def run(parts: String) = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try PrefixSum.runningTotal(df, Seq($"k", $"id"), $"v", "run")
        .select($"id", $"run").as[(Long, Long)]
        .collect().sortBy(_._1).toSeq
      finally {
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.catalog.clearCache()
      }
    }
    assert(run("1") == run("7") && run("7") == run("32"))
  }

  test("exclusive prefix max equals the rowsBetween(-1) window form") {
    val df = mk(5000)
    val got = PrefixSum.runningMaxExclusive(df, Seq($"k", $"id"), $"v",
        "pm")
      .select($"k", $"id", $"pm").as[(Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._2))
    val w = Window.orderBy($"k", $"id")
      .rowsBetween(Window.unboundedPreceding, -1)
    val want = df.withColumn("pm",
        coalesce(max($"v").over(w), lit(Long.MinValue)))
      .select($"k", $"id", $"pm").as[(Long, Long, Long)]
      .collect().sortBy(r => (r._1, r._2))
    assert(got.sameElements(want))
    spark.catalog.clearCache()
  }

  test("exclusive prefix max is invariant to the partition count") {
    val df = mk(3000)
    def run(parts: String) = {
      val prev = spark.conf.get("spark.sql.shuffle.partitions")
      spark.conf.set("spark.sql.shuffle.partitions", parts)
      try PrefixSum.runningMaxExclusive(df, Seq($"k", $"id"), $"v", "pm")
        .select($"id", $"pm").as[(Long, Long)]
        .collect().sortBy(_._1).toSeq
      finally {
        spark.conf.set("spark.sql.shuffle.partitions", prev)
        spark.catalog.clearCache()
      }
    }
    assert(run("1") == run("7") && run("7") == run("32"))
  }

  test("multi-value scan equals chained single-value scans") {
    // the r19 one-pass overload must be column-for-column identical
    // to the chained form it replaces (q220/q221/q222/supportCdf)
    val df = mk(4000).withColumn("w", ($"id" % 13))
    val got = PrefixSum.runningTotals(df, Seq($"k", $"id"),
        Seq($"v" -> "rv", $"w" -> "rw", lit(1L) -> "rn"))
      .select($"id", $"rv", $"rw", $"rn")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    spark.catalog.clearCache()
    val c1 = PrefixSum.runningTotal(df, Seq($"k", $"id"), $"v", "rv")
    val c2 = PrefixSum.runningTotal(c1, Seq($"k", $"id"), $"w", "rw")
    val want = PrefixSum.runningTotal(c2, Seq($"k", $"id"), lit(1L),
        "rn")
      .select($"id", $"rv", $"rw", $"rn")
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1).toSeq
    assert(got == want)
    spark.catalog.clearCache()
  }

  test("descending order keys work (the pareto shape)") {
    val df = mk(500).withColumn("neg", -$"v")
    val got = PrefixSum.runningTotal(df, Seq($"neg", $"id"), $"v", "run")
      .orderBy($"run").select($"v", $"run").as[(Long, Long)].collect()
    // running totals over v sorted descending: first row is the max v
    assert(got.head._1 == got.head._2)
    assert(got.head._1 == df.agg(max($"v")).as[Long].head())
    assert(got.last._2 == df.agg(sum($"v")).as[Long].head())
    spark.catalog.clearCache()
  }
}
