package graft.sources

import graft.sinks.InMemoryRecordsClient
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.connector.read.streaming.{MicroBatchStream, Offset}
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{BinaryType, LongType, StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.util.{Map => JMap}

/** Streaming CONSUMER for the Kinesis-style sink — closes the
  * produce→consume loop: what `KinesisSink` wrote through an
  * `InMemoryRecordsClient` can be read back as an unbounded stream,
  * so end-to-end pipelines (CLI → sink → downstream job) are testable
  * in one process. The reference is producer-only; this is the
  * consumer a user needs to verify delivery.
  *
  *   spark.readStream.format("kinesis-registry")
  *     .option("registryId", "cli").option("stream", "my-stream").load()
  *
  * Schema: `seq long, data binary, partition_key string` — seq is the
  * record's position in the shard-like registry (per-key FIFO order is
  * the sink's delivery guarantee, §1.4). Offsets are positions into
  * the append-only registry, so micro-batches are replayable slices —
  * the same recovery contract a real Kinesis consumer gets from
  * sequence numbers. Local-mode scope by design: the registry lives in
  * the shared JVM, exactly like the InMemoryRecordsClient transport it
  * reads from (an SDK-backed consumer would swap in GetRecords against
  * real shards behind the same offset model).
  */
class KinesisRegistrySource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "kinesis-registry"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    KinesisRegistrySource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table = {
    // properties arrive case-preserved; read them case-insensitively
    val opts = new CaseInsensitiveStringMap(properties)
    new KinesisRegistryTable(opts.get("registryid"), opts.get("stream"))
  }
}

object KinesisRegistrySource {
  val schema: StructType = StructType(Seq(
    StructField("seq", LongType, nullable = false),
    StructField("data", BinaryType),
    StructField("partition_key", StringType)))
}

class KinesisRegistryTable(registryId: String, stream: String)
    extends Table with SupportsRead {
  require(registryId != null && stream != null,
    "kinesis-registry requires registryId and stream options")
  override def name(): String = s"kinesis-registry:$registryId/$stream"
  override def schema(): StructType = KinesisRegistrySource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new KinesisRegistryScanBuilder(registryId, stream)
}

class KinesisRegistryScanBuilder(registryId: String, stream: String)
    extends ScanBuilder with Scan {
  override def build(): Scan = this
  override def readSchema(): StructType = KinesisRegistrySource.schema
  override def toMicroBatchStream(checkpointLocation: String)
      : MicroBatchStream =
    new KinesisRegistryMicroBatchStream(registryId, stream)
}

/** Offset = number of records ever appended (the registry is
  * append-only, like a shard); a batch is the [start, end) slice.
  */
case class RegistryOffset(pos: Long) extends Offset {
  override def json(): String = pos.toString
}

case class RegistrySlice(registryId: String, stream: String,
    from: Long, until: Long) extends InputPartition

class KinesisRegistryMicroBatchStream(registryId: String, stream: String)
    extends MicroBatchStream {

  override def initialOffset(): Offset = RegistryOffset(0L)

  override def latestOffset(): Offset =
    RegistryOffset(
      InMemoryRecordsClient.recordsFor(registryId, stream).size.toLong)

  override def deserializeOffset(json: String): Offset =
    RegistryOffset(json.toLong)

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val s = start.asInstanceOf[RegistryOffset].pos
    val e = end.asInstanceOf[RegistryOffset].pos
    if (e <= s) Array.empty
    else Array(RegistrySlice(registryId, stream, s, e))
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new PartitionReaderFactory {
      override def createReader(partition: InputPartition)
          : PartitionReader[InternalRow] = {
        val slice = partition.asInstanceOf[RegistrySlice]
        new PartitionReader[InternalRow] {
          private val records = InMemoryRecordsClient
            .recordsFor(slice.registryId, slice.stream)
            .slice(slice.from.toInt, slice.until.toInt)
            .zipWithIndex.iterator
          private var current: InternalRow = _
          override def next(): Boolean = {
            if (records.hasNext) {
              val (r, i) = records.next()
              current = InternalRow(slice.from + i, r.data,
                UTF8String.fromString(r.partitionKey))
              true
            } else false
          }
          override def get(): InternalRow = current
          override def close(): Unit = ()
        }
      }
    }

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}
