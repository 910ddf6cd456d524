package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.queries.Replay

/** Scratch instrumentation: per-batch watermark + drop metrics for a
  * tiny staged tumbling-window replay — prints each progress row's
  * eventTime map and stateOperators numRowsDroppedByWatermark so the
  * q234 oracle models the runtime's REAL late-filter timing instead
  * of the documentation's.
  */
object WmProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val day = 86400000L
    def df(rows: Seq[(String, Long)]) = rows.toDF("k", "ms")
      .select($"k", timestamp_millis($"ms").as("ts"),
        lit(1.0).as("value"))
    // batch 0: on-time days 1,2,10 ; batch 1: straggler day 1 (late
    // by 9 days vs batch-0 max) + on-time day 11 ; batch 2:
    // straggler day 2 + on-time day 20; batch 3: far-future sentinel
    val b0 = df(Seq(("a", 1 * day), ("a", 2 * day), ("a", 10 * day)))
    val b1 = df(Seq(("a", 1 * day + 1000), ("a", 11 * day)))
    val b2 = df(Seq(("a", 2 * day + 1000), ("a", 20 * day)))
    val b3 = df(Seq(("drain", 1748736000000L)))
    val b4 = df(Seq(("drain", 1748822400000L)))
    val root = graft.ScratchDir.path(s"wmprobe_${Replay.run()}")
    val staged = Replay.stageBatches(root, Seq(b0, b1, b2, b3, b4))
    val progress = Replay.withRocksDb(spark) {
      val src = spark.readStream
        .schema("k STRING, ts TIMESTAMP, value DOUBLE")
        .option("maxFilesPerTrigger", "1").parquet(staged)
      val q = graft.streaming.StreamOps
        .tumblingCounts(src, "ts", "1 day", "1 hour", Seq("k"))
        .writeStream.format("parquet")
        .option("path", s"$root/out")
        .option("checkpointLocation", s"$root/ckpt")
        .outputMode("append")
        .start()
      Replay.drainStagedReplay(q, nFiles = 5)
      q.recentProgress.toSeq
    }
    progress.foreach { p =>
      val so = p.stateOperators.headOption
      println(s"batch=${p.batchId} rows=${p.numInputRows} " +
        s"eventTime=${p.eventTime} " +
        s"dropped=${so.map(_.numRowsDroppedByWatermark)} " +
        s"stateRows=${so.map(_.numRowsTotal)}")
    }
    val out = spark.read.schema(
        "window STRUCT<start: TIMESTAMP, end: TIMESTAMP>, k STRING, " +
        "n BIGINT, sum_value DOUBLE")
      .parquet(s"$root/out")
      .select(unix_micros($"window.start").as("ws"), $"k", $"n")
      .orderBy($"ws").collect()
    out.foreach(println)
    spark.stop()
  }
}
