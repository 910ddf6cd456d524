package graft.sources

import graft.ops.JsonValueSplitter
import org.apache.spark.sql.connector.catalog.{SupportsRead, Table, TableCapability, TableProvider}
import org.apache.spark.sql.connector.expressions.Transform
import org.apache.spark.sql.connector.read._
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.sources.DataSourceRegister
import org.apache.spark.sql.types.{StringType, StructField, StructType}
import org.apache.spark.sql.util.CaseInsensitiveStringMap
import org.apache.spark.unsafe.types.UTF8String
import java.nio.file.{Files, Path, Paths}
import java.util.{Map => JMap}
import scala.jdk.CollectionConverters._

/** DataSource V2 batch + micro-batch source for *concatenated* JSON
  * value streams —
  * the reference's json-mode input shape (whitespace-separated
  * top-level values, jsonstreamer.go:40-46), which stock Spark's
  * line-oriented json/text sources cannot split. One row per top-level
  * value, schema `value: string`; pipe through `from_json` +
  * graft.ops.ErrorModes for typed parsing with E1/E2 policies.
  *
  *   spark.read.format("concat-json").load("/logs/dir")
  *
  * Scale shape: one input partition per file (a splittable offset
  * scheme would need value-boundary sync marks, which raw concatenated
  * JSON lacks — same constraint as multiline JSON); many files →
  * natural parallelism.
  */
class ConcatJsonSource extends TableProvider with DataSourceRegister {
  override def shortName(): String = "concat-json"

  override def inferSchema(options: CaseInsensitiveStringMap): StructType =
    ConcatJsonSource.schema

  override def getTable(schema: StructType, partitioning: Array[Transform],
      properties: JMap[String, String]): Table =
    new ConcatJsonTable(properties.get("path"))
}

object ConcatJsonSource {
  val schema: StructType = StructType(Seq(StructField("value", StringType)))
}

class ConcatJsonTable(path: String) extends Table with SupportsRead {
  require(path != null, "concat-json requires a path")
  override def name(): String = s"concat-json:$path"
  override def schema(): StructType = ConcatJsonSource.schema
  override def capabilities(): java.util.Set[TableCapability] =
    java.util.EnumSet.of(TableCapability.BATCH_READ,
      TableCapability.MICRO_BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new ConcatJsonScanBuilder(path,
    Option(options.get("maxFilesPerTrigger")).map(_.toInt))
}

object ConcatJsonFiles {
  /** Visible regular files under `path`, sorted. Skips Hadoop
    * sidecar/hidden files (_SUCCESS, .*.crc) like the built-in file
    * sources do — a binary .crc would otherwise leak garbage tokens
    * into the stream.
    */
  def list(path: String): Seq[String] = {
    val p = Paths.get(path)
    def visible(f: Path): Boolean = {
      val n = f.getFileName.toString
      !n.startsWith("_") && !n.startsWith(".")
    }
    if (Files.isDirectory(p)) {
      val stream = Files.list(p)
      try stream.iterator().asScala
        .filter(f => Files.isRegularFile(f) && visible(f))
        .map(_.toString).toSeq.sorted
      finally stream.close() // directory fd leaks at GC otherwise
    } else Seq(p.toString)
  }
}

class ConcatJsonScanBuilder(path: String,
    maxFilesPerTrigger: Option[Int] = None) extends ScanBuilder with Scan
    with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = ConcatJsonSource.schema
  override def toBatch: Batch = this

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new ConcatJsonMicroBatchStream(path, maxFilesPerTrigger)

  override def planInputPartitions(): Array[InputPartition] =
    ConcatJsonFiles.list(path)
      .map(f => ConcatJsonPartition(f): InputPartition).toArray

  override def createReaderFactory(): PartitionReaderFactory =
    new ConcatJsonReaderFactory()
}

/** Streaming form of the source (MICRO_BATCH_READ): the offset is the
  * SET of files already ingested (serialized as a JSON array), so each
  * micro-batch reads exactly the files that appeared since the last —
  * no ordering or naming assumptions on arrivals, the same
  * one-partition-per-file shape as the batch scan, and replayable
  * batches (start/end offsets pin the file set) for at-least-once
  * recovery under checkpointing. Unbounded concatenated-JSON ingestion
  * was the reference's whole json mode (jsonstreamer.go:40-46).
  *
  * Scope: suited to bounded backlogs and rotating directories — the
  * offset carries every file ever ingested, so a weeks-long tail of a
  * busy directory grows the offset log without bound (the built-in
  * file source behind StreamOps.concatJsonStream keeps a compacted
  * seen-files log instead; the CLI's follow mode uses that wrapper).
  */
class ConcatJsonMicroBatchStream(path: String,
    maxFilesPerTrigger: Option[Int] = None)
    extends org.apache.spark.sql.connector.read.streaming.MicroBatchStream
    with org.apache.spark.sql.connector.read.streaming
      .SupportsAdmissionControl {
  import org.apache.spark.sql.connector.read.streaming.{Offset, ReadLimit, ReadMaxFiles}

  private val mapper = new com.fasterxml.jackson.databind.ObjectMapper()

  case class FilesOffset(files: Set[String]) extends Offset {
    override def json(): String =
      mapper.writeValueAsString(files.toArray.sorted)
  }

  override def initialOffset(): Offset = FilesOffset(Set.empty)

  override def latestOffset(): Offset =
    FilesOffset(ConcatJsonFiles.list(path).toSet)

  /** B1-style admission control: cap how many newly arrived files one
    * micro-batch admits (`maxFilesPerTrigger`, matching the built-in
    * file sources' knob) so a backlog drains in bounded batches
    * instead of one giant catch-up batch.
    */
  override def getDefaultReadLimit: ReadLimit =
    maxFilesPerTrigger.map(ReadLimit.maxFiles)
      .getOrElse(ReadLimit.allAvailable())

  override def latestOffset(start: Offset, limit: ReadLimit): Offset = {
    val seen = start.asInstanceOf[FilesOffset].files
    val now = ConcatJsonFiles.list(path)
    limit match {
      case mf: ReadMaxFiles =>
        val admitted = now.filterNot(seen).take(mf.maxFiles())
        FilesOffset(seen ++ admitted)
      case _ => FilesOffset(now.toSet)
    }
  }

  override def deserializeOffset(json: String): Offset =
    FilesOffset(mapper.readValue(json, classOf[Array[String]]).toSet)

  override def planInputPartitions(start: Offset, end: Offset)
      : Array[InputPartition] = {
    val seen = start.asInstanceOf[FilesOffset].files
    val now = end.asInstanceOf[FilesOffset].files
    (now -- seen).toArray.sorted
      .map(f => ConcatJsonPartition(f): InputPartition)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ConcatJsonReaderFactory()

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class ConcatJsonPartition(file: String) extends InputPartition

class ConcatJsonReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] = {
    val file = partition.asInstanceOf[ConcatJsonPartition].file
    new PartitionReader[InternalRow] {
      private val values = JsonValueSplitter
        .split(new String(Files.readAllBytes(Paths.get(file)), "UTF-8"))
        .iterator
      private var current: String = _
      override def next(): Boolean = {
        if (values.hasNext) { current = values.next(); true } else false
      }
      override def get(): InternalRow =
        InternalRow(UTF8String.fromString(current))
      override def close(): Unit = ()
    }
  }
}
