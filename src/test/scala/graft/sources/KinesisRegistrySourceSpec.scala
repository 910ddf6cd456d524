package graft.sources

import graft.SparkSpec
import graft.sinks.{InMemoryRecordsClient, KinesisSink}
import java.nio.file.Files

/** Produce→consume round-trip: the sink's registry read back as an
  * unbounded stream through the `kinesis-registry` DSv2 source.
  */
class KinesisRegistrySourceSpec extends SparkSpec {
  import spark.implicits._

  test("round-trip: sink records stream back with payload + key intact") {
    InMemoryRecordsClient.clear()
    val client = new InMemoryRecordsClient("roundtrip")
    // produce through the sink's batch path
    val out = Seq(("alpha", "host-1"), ("beta", "host-1"),
      ("gamma", "host-2"))
      .toDF("data", "partition_key")
    KinesisSink.writeBatch(out, "RT", client)

    // consume as a stream
    val q = spark.readStream.format("kinesis-registry")
      .option("registryId", "roundtrip").option("stream", "RT").load()
      .selectExpr("seq", "CAST(data AS STRING) AS text", "partition_key")
      .writeStream.format("memory").queryName("rt")
      .outputMode("append").start()
    q.processAllAvailable()
    val got = spark.table("rt")
      .as[(Long, String, String)].collect().toSet
    assert(got.map(_._2) == Set("alpha", "beta", "gamma"))
    assert(got.map(_._3) == Set("host-1", "host-2"))

    // late production arrives as a NEW micro-batch at the next offset
    KinesisSink.writeBatch(Seq(("delta", "host-3"))
      .toDF("data", "partition_key"), "RT", client)
    q.processAllAvailable()
    val after = spark.table("rt").as[(Long, String, String)].collect()
    q.stop()
    assert(after.length == 4)
    assert(after.map(_._2).toSet.contains("delta"))
    // seq numbers are stable registry positions (replayable slices)
    assert(after.map(_._1).toSet == Set(0L, 1L, 2L, 3L))
  }

  test("exactly-once: re-delivered micro-batches do not duplicate records") {
    InMemoryRecordsClient.clear()
    val client = new InMemoryRecordsClient("eos")
    val b0 = Seq(("r1", "k1"), ("r2", "k1")).toDF("data", "partition_key")

    // a real stream through the exactly-once writer delivers batch 0
    implicit val sqlCtx = spark.sqlContext
    val src = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[(String, String)]
    src.addData(("r1", "k1"), ("r2", "k1"))
    val ck = Files.createTempDirectory("graft-eos-ck").toString
    val q = KinesisSink.writeStreamExactlyOnce(
      src.toDF().toDF("data", "partition_key"), "EOS", client, ck)
    q.processAllAvailable()
    q.stop()
    assert(InMemoryRecordsClient.recordsFor("eos", "EOS").size == 2)

    // post-crash foreachBatch replay re-delivers the SAME batchId
    // under the SAME checkpoint scope — the batch marker must turn it
    // into a no-op, not an append
    KinesisSink.deliverBatchIdempotent(b0, "EOS", client, ck,
      batchId = 0L)
    assert(InMemoryRecordsClient.recordsFor("eos", "EOS").size == 2,
      "replayed batchId must not duplicate records")

    // consumer-side count through the registry source stays 2
    val cq = spark.readStream.format("kinesis-registry")
      .option("registryId", "eos").option("stream", "EOS").load()
      .writeStream.format("memory").queryName("eos_consumer")
      .outputMode("append").start()
    cq.processAllAvailable()
    assert(spark.table("eos_consumer").count() == 2)

    // a genuinely NEW batchId still appends (and reaches the consumer)
    KinesisSink.deliverBatchIdempotent(b0, "EOS", client, ck,
      batchId = 1L)
    cq.processAllAvailable()
    val n = spark.table("eos_consumer").count()
    cq.stop()
    assert(n == 4)

    // batchIds are scoped to the QUERY (checkpoint): a different
    // query's batch 0 carries different data and MUST deliver —
    // a (stream, batchId)-only marker would silently drop it
    KinesisSink.deliverBatchIdempotent(b0, "EOS", client,
      "other-checkpoint", batchId = 0L)
    assert(InMemoryRecordsClient.recordsFor("eos", "EOS").size == 6,
      "a new query scope must not be masked by another query's markers")
  }

  test("full loop: CLI json mode → sink → consumer stream") {
    val dir = Files.createTempDirectory("graft-loop")
    Files.write(dir.resolve("in.json"),
      """{"b":1,"a":"x"} {"c":2}""".getBytes("UTF-8"))
    val cfg = graft.Main.parse(Seq("--format", "json",
      "--add-entry", "LogFile=Loop",
      "--input-dir", dir.toString, "--once", "LoopStream")).toOption.get
    InMemoryRecordsClient.clear()
    val client = new InMemoryRecordsClient("loop")
    val ck = Files.createTempDirectory("graft-loop-ck").toString
    val prod = graft.Main.run(spark, cfg, client, ck)
    prod.processAllAvailable(); prod.stop()

    val q = spark.readStream.format("kinesis-registry")
      .option("registryId", "loop").option("stream", "LoopStream").load()
      .selectExpr("CAST(data AS STRING) AS rec")
      .writeStream.format("memory").queryName("loop")
      .outputMode("append").start()
    q.processAllAvailable()
    val recs = spark.table("loop").as[String].collect().toSet
    q.stop()
    assert(recs == Set(
      """{"LogFile":"Loop","a":"x","b":1.0}""",
      """{"LogFile":"Loop","c":2.0}"""))
  }
}
