package graft.tools

import graft.ops.Transforms
import graft.sinks.{InMemoryRecordsClient, KinesisSink}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Single-node throughput of the reference's full line pipeline
  * (F1→P1+P2→K1→B1→W1) in records/s — the number to hold against the
  * reference's envelope, which is Kinesis-bound at 1,000 records/s
  * per shard (public service limit; BASELINE.md).
  */
object Throughput {
  def main(args: Array[String]): Unit = {
    val n = args.headOption.map(_.toLong).getOrElse(2000000L)
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val lines = spark.range(n).select(
      concat(lit("10.0.0."), ($"id" % 255),
        lit(" - - [12/Aug/2026] GET /page/"), $"id",
        lit(" 200 "), ($"id" % 10000)).as("value"))
      .persist()
    lines.count() // materialize input outside the timed region

    val piped = lines
      .transform(Transforms.dropEmptyLines())
      .transform(Transforms.wrapLine("LogEntry",
        Seq("LogFile" -> "AccessLog")))
      .transform(Transforms.withPartitionKey("bench-host"))
      .select($"record".as("data"), $"partition_key")

    val client = new InMemoryRecordsClient("tp")
    val t0 = System.nanoTime()
    KinesisSink.writeBatch(piped, "bench", client)
    val sec = (System.nanoTime() - t0) / 1e9
    val got = InMemoryRecordsClient.recordsFor("tp", "bench").size
    println(f"[throughput] $got records in $sec%.2f s = ${got / sec}%.0f rec/s" +
      f" (reference envelope: 1000 rec/s/shard Kinesis-bound)")
    spark.stop()
  }
}
