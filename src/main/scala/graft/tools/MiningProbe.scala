package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scaling probe for the PrefixSum-backed mining family:
  * synthesize a k× orders table by unioning key-shifted copies (each
  * copy keeps its value distribution, so quantile/rank work grows
  * exactly k×), then time the exact-quantile and rank pipelines at
  * 1×/2×/4×. The two-pass distributed scan should be ~linear in k;
  * a hidden single-task sort would flatline the parallelism and show
  * super-linear wall time growth as one task absorbs the whole
  * multiplied input.
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.MiningProbe"
  */
object MiningProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def orders(mult: Int): DataFrame = {
      val base = Tables.load(spark, sfDir, "orders")
        .select(col("o_custkey"), col("o_orderpriority"),
          col("o_totalprice"))
      (0 until mult).map { i =>
        base.select(
          (col("o_custkey") + lit(i.toLong * 100000000L))
            .as("o_custkey"),
          col("o_orderpriority"), col("o_totalprice"))
      }.reduce(_ unionByName _)
        .repartition(spark.sessionState.conf.numShufflePartitions)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = f
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    def quantiles(o: DataFrame): Long =
      graft.ops.Quantiles.exactByGroup(
        o.select(col("o_orderpriority").as("prio"),
          round(col("o_totalprice") * 100).cast("long").as("cents")),
        "prio", col("cents"),
        Seq("p05" -> 0.05, "p50" -> 0.5, "p95" -> 0.95)).count()

    def ranks(o: DataFrame): Long = {
      val rev = o.select(col("o_custkey"),
          round(col("o_totalprice") * 100).cast("long").as("cents"))
        .groupBy(col("o_custkey"))
        .agg(sum(col("cents")).as("x"))
      graft.ops.PrefixSum.runningTotal(rev,
        Seq(col("x"), col("o_custkey")), lit(1L), "rn").count()
    }

    // untimed warm-up: codegen + JIT of both pipelines
    { val w = orders(1); w.count(); quantiles(w); ranks(w)
      w.unpersist(); spark.catalog.clearCache() }

    Seq(1, 2, 4).foreach { k =>
      val o = orders(k)
      o.count()
      val (tq, nq) = time(quantiles(o))
      spark.catalog.clearCache(); o.count()
      val (tr, nr) = time(ranks(o))
      println(f"[probe] k=$k quantiles $tq%6.2f s ($nq rows) " +
        f"prefix-ranks $tr%6.2f s ($nr rows)")
      o.unpersist()
      spark.catalog.clearCache()
    }
    spark.stop()
  }
}
