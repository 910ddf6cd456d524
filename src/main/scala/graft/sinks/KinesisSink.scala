package graft.sinks

import org.apache.spark.sql.{DataFrame, Row}
import scala.collection.mutable.ArrayBuffer

/** Kinesis-style record sink (reference W1+B1, basestreamer.go:19-87).
  *
  * The AWS SDK is not on this classpath, so the transport is the
  * pluggable `RecordsClient` trait: production wires an SDK-backed
  * implementation (PutRecords), tests use `InMemoryRecordsClient`. The
  * batching policy, partition-key routing, and retry semantics — the
  * parts the reference actually implements — are all here and tested.
  *
  * Semantics: the reference drops failed records (at-most-once,
  * basestreamer.go:73-83). We retry per-record failures up to
  * `maxRetries` and throw when exhausted, which under Spark's
  * micro-batch checkpointing yields at-least-once — deliberately
  * STRONGER than the reference (SURVEY.md §7.4); deduplicate
  * downstream on a record key if exactly-once matters.
  */
object KinesisSink {

  case class RecordEntry(data: Array[Byte], partitionKey: String)

  case class PutResult(failedIndices: Seq[Int], errors: Seq[String])

  /** Transport contract — mirrors Kinesis PutRecords: a batch call that
    * can partially fail per record.
    */
  trait RecordsClient extends Serializable {
    def putRecords(streamName: String, records: Seq[RecordEntry]): PutResult
  }

  /** Kinesis service limits (public AWS docs): ≤500 records and ≤5 MiB
    * per PutRecords call, ≤1 MiB per record. The reference's batch of 5
    * (basestreamer.go:20) was a latency choice, not a limit — at 100 TB
    * we fill the API maximums instead.
    */
  val MaxBatchRecords = 500
  val MaxBatchBytes: Long = 5L * 1024 * 1024
  val MaxRecordBytes: Long = 1L * 1024 * 1024

  /** Count/size-bounded buffer with retry-on-partial-failure. One
    * instance per task/partition — single-threaded use.
    */
  final class BufferedPutter(client: RecordsClient, streamName: String,
      maxRecords: Int = MaxBatchRecords, maxBytes: Long = MaxBatchBytes,
      maxRetries: Int = 3) extends Serializable {
    private val buf = new ArrayBuffer[RecordEntry]()
    private var bufBytes = 0L
    private var flushed = 0L

    def add(r: RecordEntry): Unit = {
      require(r.data.length <= MaxRecordBytes,
        s"record of ${r.data.length} B exceeds the 1 MiB Kinesis limit")
      // partition key counts toward the request limit in UTF-8 bytes,
      // not UTF-16 code units
      val recBytes = r.data.length.toLong +
        r.partitionKey.getBytes("UTF-8").length
      if (buf.size >= maxRecords || bufBytes + recBytes > maxBytes) flush()
      buf += r
      bufBytes += recBytes
    }

    def flush(): Unit = {
      if (buf.isEmpty) return
      var pending: Seq[RecordEntry] = buf.toSeq
      var attempt = 0
      while (pending.nonEmpty) {
        val res = client.putRecords(streamName, pending)
        val failed = res.failedIndices.map(pending)
        if (failed.nonEmpty) {
          attempt += 1
          if (attempt > maxRetries)
            throw new RuntimeException(
              s"${failed.size} records still failing after $maxRetries " +
                s"retries: ${res.errors.take(3).mkString("; ")}")
        }
        flushed += pending.size - failed.size
        pending = failed
      }
      buf.clear()
      bufBytes = 0L
    }

    def totalFlushed: Long = { flushed }
  }

  /** Batch write: each partition streams its rows through a putter.
    * Executor-side only — no collect; per-partition client instances.
    * Expects columns `data: binary|string` and `partition_key: string`
    * (K1's column).
    */
  def writeBatch(df: DataFrame, streamName: String, client: RecordsClient)
      : Unit = {
    val data = df.schema.fieldIndex("data")
    val key = df.schema.fieldIndex("partition_key")
    df.foreachPartition { rows: Iterator[Row] =>
      val putter = new BufferedPutter(client, streamName)
      rows.foreach { row =>
        val bytes = row.get(data) match {
          case b: Array[Byte] => b
          case s: String => s.getBytes("UTF-8")
          case other => other.toString.getBytes("UTF-8")
        }
        putter.add(RecordEntry(bytes, row.getString(key)))
      }
      putter.flush()
    }
  }

  /** Per-key FIFO write — the reference's delivery ordering (SURVEY
    * §1.4): all records of one partition key land on one shard in
    * order. Spark-side that means co-locating each key in one task
    * (repartition on the key) and ordering within it (sortWithin
    * Partitions on the sequence column) before the sequential
    * per-partition flush. No global order — exactly the reference's
    * guarantee, no more.
    */
  def writeBatchOrdered(df: DataFrame, streamName: String,
      client: RecordsClient, seqCol: String): Unit = {
    import org.apache.spark.sql.functions.col
    writeBatch(
      df.repartition(col("partition_key"))
        .sortWithinPartitions(col("partition_key"), col(seqCol)),
      streamName, client)
  }

  /** Streaming write via foreachBatch — Spark checkpointing + the
    * retry policy above give at-least-once end-to-end.
    */
  def writeStream(df: DataFrame, streamName: String, client: RecordsClient,
      checkpointDir: String): org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, _: Long) =>
        writeBatch(batch, streamName, client)
      }
      .start()

  /** Transactional batch-marker store for exactly-once delivery: a
    * transport that can atomically record "micro-batch N of query
    * `scope` is fully delivered" upgrades the at-least-once retry
    * policy to exactly-once under replay. Production analogues: a
    * manifest/commit table next to the data, a conditional put, a
    * Delta txn — raw Kinesis itself cannot store one, which is WHY
    * the reference (and our default path) is not exactly-once;
    * consumers there dedupe on a record key instead.
    *
    * `scope` MUST identify the streaming query (its checkpoint
    * location — Spark's own foreachBatch idempotence recipe): batchIds
    * are unique per CHECKPOINT, not per stream, so a marker keyed by
    * (stream, batchId) alone would make a different query's (or a
    * checkpoint-reset rerun's) batch 0 silently skip NEW data.
    */
  trait BatchMarkers {
    def isBatchCommitted(scope: String, streamName: String,
        batchId: Long): Boolean
    def commitBatch(scope: String, streamName: String,
        batchId: Long): Unit
  }

  /** One idempotent micro-batch delivery: skip if the marker says this
    * (scope, batchId) already committed (post-crash foreachBatch
    * re-delivery), else write-then-mark. Factored out of the stream
    * writer so specs can replay a batchId directly.
    */
  def deliverBatchIdempotent(batch: DataFrame, streamName: String,
      client: RecordsClient with BatchMarkers, scope: String,
      batchId: Long): Unit =
    if (!client.isBatchCommitted(scope, streamName, batchId)) {
      writeBatch(batch, streamName, client)
      client.commitBatch(scope, streamName, batchId)
    }

  /** Exactly-once streaming write: Spark's foreachBatch re-delivers
    * the last in-flight batchId after a failure; the
    * (checkpoint, batchId)-keyed marker makes that replay a no-op
    * instead of a duplicate append. A FRESH checkpoint is a new query
    * identity and correctly re-delivers. (A crash BETWEEN writeBatch
    * and commitBatch still re-appends on replay — closing that window
    * needs the marker written in the same transaction as the data,
    * which the in-memory registry's single-JVM lock provides and a
    * real deployment gets from its commit table; documented seam,
    * same as SdkRecordsClient.)
    */
  def writeStreamExactlyOnce(df: DataFrame, streamName: String,
      client: RecordsClient with BatchMarkers, checkpointDir: String)
      : org.apache.spark.sql.streaming.StreamingQuery =
    df.writeStream
      .option("checkpointLocation", checkpointDir)
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        deliverBatchIdempotent(batch, streamName, client, checkpointDir,
          batchId)
      }
      .start()
}

/** Test/local transport: collects records into a JVM-wide registry
  * (works in local mode where executors share the JVM). Optionally
  * fails the first N calls per stream to exercise retry.
  */
class InMemoryRecordsClient(registryId: String, failFirstN: Int = 0)
    extends KinesisSink.RecordsClient with KinesisSink.BatchMarkers {

  def isBatchCommitted(scope: String, streamName: String,
      batchId: Long): Boolean =
    InMemoryRecordsClient.synchronized {
      InMemoryRecordsClient.committedBatches
        .getOrElse(s"$registryId/$streamName/$scope", Set.empty)
        .contains(batchId)
    }

  def commitBatch(scope: String, streamName: String,
      batchId: Long): Unit =
    InMemoryRecordsClient.synchronized {
      val k = s"$registryId/$streamName/$scope"
      InMemoryRecordsClient.committedBatches(k) =
        InMemoryRecordsClient.committedBatches
          .getOrElse(k, Set.empty) + batchId
    }

  def putRecords(streamName: String,
      records: Seq[KinesisSink.RecordEntry]): KinesisSink.PutResult = {
    val shouldFail = InMemoryRecordsClient.synchronized {
      val k = s"$registryId/$streamName"
      val n = InMemoryRecordsClient.failures.getOrElse(k, 0)
      if (n < failFirstN) {
        InMemoryRecordsClient.failures(k) = n + 1
        true
      } else false
    }
    val failedIdx =
      if (shouldFail)
        records.indices.takeRight(math.max(1, records.size / 2)).toSet
      else Set.empty[Int]
    InMemoryRecordsClient.synchronized {
      val k = s"$registryId/$streamName"
      // like real Kinesis: non-failed records of a partial failure ARE
      // persisted — only the failed indices need a retry
      InMemoryRecordsClient.records.getOrElseUpdate(k,
        new ArrayBuffer[KinesisSink.RecordEntry]()) ++=
        records.indices.filterNot(failedIdx).map(records)
      InMemoryRecordsClient.calls(k) =
        InMemoryRecordsClient.calls.getOrElse(k, 0) + 1
    }
    KinesisSink.PutResult(failedIdx.toSeq.sorted,
      if (failedIdx.nonEmpty) Seq("InternalFailure (simulated)") else Nil)
  }
}

object InMemoryRecordsClient {
  import scala.collection.mutable
  private val records =
    mutable.Map[String, ArrayBuffer[KinesisSink.RecordEntry]]()
  private val calls = mutable.Map[String, Int]()
  private val failures = mutable.Map[String, Int]()
  private val committedBatches = mutable.Map[String, Set[Long]]()

  def recordsFor(registryId: String, stream: String)
      : Seq[KinesisSink.RecordEntry] = synchronized {
    records.getOrElse(s"$registryId/$stream", Nil).toSeq
  }
  def callsFor(registryId: String, stream: String): Int = synchronized {
    calls.getOrElse(s"$registryId/$stream", 0)
  }
  def clear(): Unit = synchronized {
    records.clear(); calls.clear(); failures.clear()
    committedBatches.clear()
  }
}
