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

  /** foreachBatch collector: (batchId, rows) per micro-batch, so the
    * lineage-ordering assertions can see BATCH boundaries (a memory
    * sink flattens them away).
    */
  private def collectBatches(registryId: String, stream: String,
      ck: String, buf: scala.collection.mutable.ArrayBuffer[
        (Long, Seq[(Long, String, String, String)])]):
      org.apache.spark.sql.streaming.StreamingQuery =
    spark.readStream.format("kinesis-registry")
      .option("registryId", registryId).option("stream", stream).load()
      .selectExpr("seq", "CAST(data AS STRING) AS text",
        "partition_key", "shard_id")
      .writeStream
      .option("checkpointLocation", ck)
      .foreachBatch {
        (b: org.apache.spark.sql.DataFrame, id: Long) =>
          val rows = b.collect().map(r => (r.getLong(0), r.getString(1),
            r.getString(2), r.getString(3))).toSeq
          buf.synchronized { buf += ((id, rows)) }
          ()
      }
      .start()

  test("reshard kill-matrix: split mid-stream — parents drain fully " +
      "before children, exactly-once across a restart") {
    InMemoryRecordsClient.clear()
    val client = new InMemoryRecordsClient("reshard")
    val keys = (0 until 8).map(i => s"host-$i")
    // single-partition production: per-key FIFO at the producer is
    // writeBatchOrdered's contract; here the ORDER ITSELF is the test
    // fixture, so one partition makes it deterministic
    def put(ids: Range): Unit = KinesisSink.writeBatch(
      ids.map(i => (s"p-$i", keys(i % keys.size)))
        .toDF("data", "partition_key").coalesce(1), "RS", client)

    // 10 records land on the original single shard…
    put(0 until 10)
    // …then the shard SPLITS while the consumer has read NOTHING —
    // the parent closes with 10 un-drained records…
    val (c1, c2) = InMemoryRecordsClient.splitShard("reshard", "RS",
      "shardId-000000000000")
    // …and 10 more records route to the children
    put(10 until 20)

    val buf = scala.collection.mutable
      .ArrayBuffer[(Long, Seq[(Long, String, String, String)])]()
    val ck = Files.createTempDirectory("graft-reshard-ck").toString
    val q = collectBatches("reshard", "RS", ck, buf)
    q.processAllAvailable()
    q.stop()

    val parentBatches = buf.filter(_._2.exists(
      _._4 == "shardId-000000000000")).map(_._1)
    val childBatches = buf.filter(_._2.exists(r =>
      r._4 == c1 || r._4 == c2)).map(_._1)
    assert(parentBatches.nonEmpty && childBatches.nonEmpty)
    // THE GetRecords contract: every parent record is consumed in an
    // EARLIER micro-batch than any child record
    assert(parentBatches.max < childBatches.min,
      s"children replayed before the parent drained: " +
        s"parent batches $parentBatches, child batches $childBatches")
    // no batch mixes a parent and its children
    assert(!buf.exists(b =>
      b._2.exists(_._4 == "shardId-000000000000") &&
        b._2.exists(r => r._4 == c1 || r._4 == c2)))
    // no loss, no duplication
    val texts = buf.flatMap(_._2.map(_._2))
    assert(texts.size == 20 && texts.toSet == (0 until 20)
      .map(i => s"p-$i").toSet)
    // per-key FIFO survives the reshard boundary: for every key,
    // (batch, seq) order == production order
    val byKey = buf.flatMap { case (bid, rows) =>
      rows.map(r => (r._3, bid, r._1, r._2.drop(2).toInt)) }
      .groupBy(_._1)
    byKey.foreach { case (k, rs) =>
      val inOrder = rs.sortBy(r => (r._2, r._3)).map(_._4)
      assert(inOrder == inOrder.sorted,
        s"per-key order broken across the reshard for $k: $inOrder")
    }

    // ---- restart leg (exactly-once): split AGAIN under the same
    // checkpoint, produce more, and a RESTARTED query must deliver
    // only the new records — lineage gating included — with no
    // duplicates of anything already committed.
    val (g1, g2) = InMemoryRecordsClient.splitShard("reshard", "RS", c1)
    put(20 until 26)
    val buf2 = scala.collection.mutable
      .ArrayBuffer[(Long, Seq[(Long, String, String, String)])]()
    val q2 = collectBatches("reshard", "RS", ck, buf2)
    q2.processAllAvailable()
    q2.stop()
    val texts2 = buf2.flatMap(_._2.map(_._2))
    assert(texts2.toSet == (20 until 26).map(i => s"p-$i").toSet &&
      texts2.size == 6,
      s"restart must deliver exactly the new records, got $texts2")
    // grandchildren (split of c1) only appear after c1 drained — and
    // c1's leftover records (if any in this leg) precede them
    val gBatches = buf2.filter(_._2.exists(r =>
      r._4 == g1 || r._4 == g2)).map(_._1)
    val c1Batches = buf2.filter(_._2.exists(_._4 == c1)).map(_._1)
    if (gBatches.nonEmpty && c1Batches.nonEmpty)
      assert(c1Batches.max < gBatches.min)
  }

  test("reshard: merge gates the child on BOTH parents draining") {
    InMemoryRecordsClient.clear()
    val client = new InMemoryRecordsClient("merge")
    def put(ids: Range): Unit = KinesisSink.writeBatch(
      ids.map(i => (s"m-$i", s"host-${i % 8}"))
        .toDF("data", "partition_key").coalesce(1), "MG", client)
    put(0 until 6)
    val (a, b) = InMemoryRecordsClient.splitShard("merge", "MG",
      "shardId-000000000000")
    put(6 until 12)
    val merged = InMemoryRecordsClient.mergeShards("merge", "MG", a, b)
    put(12 until 18)
    val buf = scala.collection.mutable
      .ArrayBuffer[(Long, Seq[(Long, String, String, String)])]()
    val ck = Files.createTempDirectory("graft-merge-ck").toString
    val q = collectBatches("merge", "MG", ck, buf)
    q.processAllAvailable()
    q.stop()
    val texts = buf.flatMap(_._2.map(_._2))
    assert(texts.size == 18 &&
      texts.toSet == (0 until 18).map(i => s"m-$i").toSet)
    def batchesOf(p: String => Boolean): Seq[Long] =
      buf.filter(_._2.exists(r => p(r._4))).map(_._1).toSeq
    val root = batchesOf(_ == "shardId-000000000000")
    val mid = batchesOf(s => s == a || s == b)
    val last = batchesOf(_ == merged)
    assert(root.nonEmpty && mid.nonEmpty && last.nonEmpty)
    assert(root.max < mid.min, "split children started before the root drained")
    assert(mid.max < last.min, "merged child started before both parents drained")
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
