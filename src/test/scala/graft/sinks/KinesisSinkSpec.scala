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
}
