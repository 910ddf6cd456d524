package graft.sinks

import graft.SparkSpec
import graft.sinks.KinesisSink._
import org.apache.spark.sql.functions._

class KinesisSinkSpec extends SparkSpec {
  import spark.implicits._

  override def afterAll(): Unit = {
    InMemoryRecordsClient.clear(); super.afterAll()
  }

  test("BufferedPutter flushes at the record-count bound") {
    InMemoryRecordsClient.clear()
    val client = new InMemoryRecordsClient("count")
    val p = new BufferedPutter(client, "s", maxRecords = 5)
    (1 to 12).foreach(i => p.add(RecordEntry(s"r$i".getBytes, "k")))
    p.flush()
    assert(InMemoryRecordsClient.recordsFor("count", "s").size == 12)
    assert(InMemoryRecordsClient.callsFor("count", "s") == 3) // 5+5+2
  }

  test("BufferedPutter flushes at the byte bound") {
    InMemoryRecordsClient.clear()
    val client = new InMemoryRecordsClient("bytes")
    val p = new BufferedPutter(client, "s", maxRecords = 1000,
      maxBytes = 100)
    (1 to 5).foreach(i => p.add(RecordEntry(Array.fill(40)('x'.toByte), "k")))
    p.flush()
    assert(InMemoryRecordsClient.recordsFor("bytes", "s").size == 5)
    assert(InMemoryRecordsClient.callsFor("bytes", "s") >= 2)
  }

  test("BufferedPutter retries partial failures (at-least-once)") {
    InMemoryRecordsClient.clear()
    val client = new InMemoryRecordsClient("retry", failFirstN = 2)
    val p = new BufferedPutter(client, "s")
    (1 to 10).foreach(i => p.add(RecordEntry(s"r$i".getBytes, "k")))
    p.flush()
    val got = InMemoryRecordsClient.recordsFor("retry", "s")
      .map(r => new String(r.data)).toSet
    assert((1 to 10).map(i => s"r$i").toSet == got)
  }

  test("oversized record is rejected before the API call") {
    val p = new BufferedPutter(new InMemoryRecordsClient("big"), "s")
    intercept[IllegalArgumentException] {
      p.add(RecordEntry(new Array[Byte](1024 * 1024 + 1), "k"))
    }
  }

  test("writeBatch routes a DataFrame through per-partition putters") {
    InMemoryRecordsClient.clear()
    val client = new InMemoryRecordsClient("df")
    val df = (1 to 100).map(i => (s"payload$i", s"host-${i % 3}"))
      .toDF("data", "partition_key").repartition(4)
    KinesisSink.writeBatch(df, "events", client)
    val got = InMemoryRecordsClient.recordsFor("df", "events")
    assert(got.size == 100)
    assert(got.map(_.partitionKey).toSet ==
      Set("host-0", "host-1", "host-2"))
  }

  test("writeBatchOrdered preserves per-key FIFO (reference §1.4 semantics)") {
    InMemoryRecordsClient.clear()
    val client = new InMemoryRecordsClient("fifo")
    val rows = for {
      host <- Seq("h0", "h1", "h2"); i <- 1 to 40
    } yield (f"$host:$i%03d", host, i.toLong)
    val df = scala.util.Random.shuffle(rows)
      .toDF("data", "partition_key", "seq")
      .repartition(8) // deliberately scrambled input layout
    KinesisSink.writeBatchOrdered(df, "ordered", client, "seq")
    val got = InMemoryRecordsClient.recordsFor("fifo", "ordered")
    assert(got.size == 120)
    // per key, arrival order must be the seq order (no global order)
    Seq("h0", "h1", "h2").foreach { host =>
      val seqs = got.filter(_.partitionKey == host)
        .map(r => new String(r.data).split(":")(1).toInt)
      assert(seqs == seqs.sorted, s"$host out of order: $seqs")
    }
  }

  test("writeStream delivers micro-batches via foreachBatch") {
    InMemoryRecordsClient.clear()
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[String]
    val df = in.toDF().select($"value".as("data"),
      lit("host-s").as("partition_key"))
    val dir = java.nio.file.Files.createTempDirectory("graft-ck").toString
    val q = KinesisSink.writeStream(df, "stream-sink",
      new InMemoryRecordsClient("st"), dir)
    in.addData("a", "b", "c")
    q.processAllAvailable()
    q.stop()
    assert(InMemoryRecordsClient.recordsFor("st", "stream-sink")
      .map(r => new String(r.data)).toSet == Set("a", "b", "c"))
  }

  /** Kill-and-restart: the query CRASHES mid-batch — after the data
    * write and the batch marker commit, but before Spark's own commit
    * log records the batch. On restart from the same checkpoint Spark
    * re-runs that in-flight batchId (its at-least-once contract); the
    * (checkpoint, batchId) marker must turn the replay into a no-op
    * while genuinely new data afterwards still delivers. This is the
    * window the reference's fire-and-forget path simply drops or
    * duplicates (basestreamer.go:73-83); here it is exactly-once.
    */
  test("exactly-once survives a crash + checkpoint restart mid-batch") {
    InMemoryRecordsClient.clear()
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[String]
    val df = in.toDF().select($"value".as("data"),
      lit("host-eos").as("partition_key"))
    val ck = java.nio.file.Files
      .createTempDirectory("graft-eos-restart-ck").toString

    // client whose marker commit SUCCEEDS then throws once for the
    // chosen batch: data persisted + marker durable, foreachBatch
    // fails, Spark's commit log never sees the batch -> guaranteed
    // re-delivery of the same batchId on restart
    CrashAfterMarkerClient.fired.clear()
    val client = new CrashAfterMarkerClient("eosr", crashAtBatch = 1L)

    // batch 0 delivers cleanly; batch 1 crashes mid-batch
    val q1 = KinesisSink.writeStreamExactlyOnce(df, "EOSR", client, ck)
    in.addData("a", "b")
    q1.processAllAvailable()
    in.addData("c", "d")
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
      q1.awaitTermination()
    }
    assert(!q1.isActive, "query must have died mid-batch")
    // crash window: batch 1's records + marker ARE durable
    assert(InMemoryRecordsClient.recordsFor("eosr", "EOSR")
      .map(r => new String(r.data)).sorted == Seq("a", "b", "c", "d"))

    // restart from the SAME checkpoint: Spark replays batch 1 (not in
    // its commit log) -> marker makes it a no-op; then new data flows
    val q2 = KinesisSink.writeStreamExactlyOnce(df, "EOSR", client, ck)
    q2.processAllAvailable()
    assert(InMemoryRecordsClient.recordsFor("eosr", "EOSR").size == 4,
      "replayed in-flight batch must not duplicate after restart")
    in.addData("e")
    q2.processAllAvailable()
    q2.stop()
    val got = InMemoryRecordsClient.recordsFor("eosr", "EOSR")
      .map(r => new String(r.data)).sorted
    assert(got == Seq("a", "b", "c", "d", "e"),
      s"exactly-once across the restart: $got")
  }

  /** The OTHER crash window (r10 verdict item #7): process death after
    * the data write but BEFORE the marker commit. The scaladoc on
    * writeStreamExactlyOnce documents this window as at-least-once
    * (replay re-appends; a real deployment closes it by committing
    * marker+data in one transaction). This spec PINS that degrade
    * path: the replayed batch re-delivers (duplicates, never loss),
    * the marker then commits, and a subsequent restart replays
    * nothing — the degrade is one duplicate delivery wide, not
    * unbounded.
    */
  test("crash between data write and marker commit degrades to one duplicate, never loss") {
    InMemoryRecordsClient.clear()
    implicit val sqlCtx = spark.sqlContext
    val in = org.apache.spark.sql.execution.streaming.runtime
      .MemoryStream[String]
    val df = in.toDF().select($"value".as("data"),
      lit("host-eos2").as("partition_key"))
    val ck = java.nio.file.Files
      .createTempDirectory("graft-eos-midcommit-ck").toString
    CrashBeforeMarkerClient.fired.clear()
    val client = new CrashBeforeMarkerClient("eosm", crashAtBatch = 1L)

    // batch 0 delivers cleanly; batch 1 dies BEFORE its marker lands
    val q1 = KinesisSink.writeStreamExactlyOnce(df, "EOSM", client, ck)
    in.addData("a", "b")
    q1.processAllAvailable()
    in.addData("c", "d")
    intercept[org.apache.spark.sql.streaming.StreamingQueryException] {
      q1.processAllAvailable()
      q1.awaitTermination()
    }
    assert(!q1.isActive, "query must have died mid-commit")
    // crash window: batch 1's records ARE durable, its marker is NOT
    assert(InMemoryRecordsClient.recordsFor("eosm", "EOSM")
      .map(r => new String(r.data)).sorted == Seq("a", "b", "c", "d"))
    assert(!client.isBatchCommitted(ck, "EOSM", 1L),
      "marker must not exist in this crash window")

    // restart: Spark replays batch 1; no marker -> the batch
    // re-delivers (documented at-least-once degrade, no loss) and the
    // marker now commits
    val q2 = KinesisSink.writeStreamExactlyOnce(df, "EOSM", client, ck)
    q2.processAllAvailable()
    val afterReplay = InMemoryRecordsClient.recordsFor("eosm", "EOSM")
      .map(r => new String(r.data)).sorted
    assert(afterReplay == Seq("a", "b", "c", "c", "d", "d"),
      s"replay must re-append exactly the un-marked batch: $afterReplay")
    assert(client.isBatchCommitted(ck, "EOSM", 1L),
      "replay must land the marker")
    in.addData("e")
    q2.processAllAvailable()
    q2.stop()

    // third incarnation: nothing in flight -> nothing replays; the
    // duplicate window was exactly one delivery wide
    val q3 = KinesisSink.writeStreamExactlyOnce(df, "EOSM", client, ck)
    q3.processAllAvailable()
    q3.stop()
    val got = InMemoryRecordsClient.recordsFor("eosm", "EOSM")
      .map(r => new String(r.data)).sorted
    assert(got == Seq("a", "b", "c", "c", "d", "d", "e"),
      s"no further duplication across restarts: $got")
  }
}

/** Marker commit that succeeds DURABLY then throws once for the chosen
  * batchId — models a process death inside foreachBatch after the
  * transactional commit but before Spark writes its own commit log.
  * Named (not anonymous) so the executor-side task serialization of
  * the client never drags a ScalaTest spec into the closure.
  */
class CrashAfterMarkerClient(registryId: String, crashAtBatch: Long)
    extends InMemoryRecordsClient(registryId) {
  override def commitBatch(scope: String, streamName: String,
      batchId: Long): Unit = {
    super.commitBatch(scope, streamName, batchId)
    if (batchId == crashAtBatch &&
        CrashAfterMarkerClient.fired.add(s"$registryId/$batchId"))
      throw new RuntimeException(
        s"simulated crash after marker commit of batch $batchId")
  }
}

object CrashAfterMarkerClient {
  val fired: java.util.Set[String] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
}

/** Marker commit that throws once for the chosen batchId BEFORE
  * writing the marker — models a process death inside foreachBatch
  * after the data write but before the transactional commit (the
  * documented at-least-once window of writeStreamExactlyOnce). Named
  * for the same serialization reason as CrashAfterMarkerClient.
  */
class CrashBeforeMarkerClient(registryId: String, crashAtBatch: Long)
    extends InMemoryRecordsClient(registryId) {
  override def commitBatch(scope: String, streamName: String,
      batchId: Long): Unit = {
    if (batchId == crashAtBatch &&
        CrashBeforeMarkerClient.fired.add(s"$registryId/$batchId"))
      throw new RuntimeException(
        s"simulated crash before marker commit of batch $batchId")
    super.commitBatch(scope, streamName, batchId)
  }
}

object CrashBeforeMarkerClient {
  val fired: java.util.Set[String] =
    java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
}
