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

/** DataSource V2 batch source for *concatenated* JSON value streams —
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
    java.util.EnumSet.of(TableCapability.BATCH_READ)
  override def newScanBuilder(options: CaseInsensitiveStringMap)
      : ScanBuilder = new ConcatJsonScanBuilder(path)
}

class ConcatJsonScanBuilder(path: String) extends ScanBuilder with Scan
    with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = ConcatJsonSource.schema
  override def toBatch: Batch = this

  override def planInputPartitions(): Array[InputPartition] = {
    val p = Paths.get(path)
    // skip Hadoop sidecar/hidden files (_SUCCESS, .*.crc) like the
    // built-in file sources do — a binary .crc would otherwise leak
    // garbage tokens into the stream
    def visible(f: Path): Boolean = {
      val n = f.getFileName.toString
      !n.startsWith("_") && !n.startsWith(".")
    }
    val files: Seq[Path] =
      if (Files.isDirectory(p)) {
        val stream = Files.list(p)
        try stream.iterator().asScala
          .filter(f => Files.isRegularFile(f) && visible(f))
          .toSeq.sortBy(_.toString)
        finally stream.close() // directory fd leaks at GC otherwise
      } else Seq(p)
    files.map(f => ConcatJsonPartition(f.toString): InputPartition).toArray
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ConcatJsonReaderFactory()
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
