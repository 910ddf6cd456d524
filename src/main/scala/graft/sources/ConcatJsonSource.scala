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
import java.io.BufferedInputStream
import java.nio.channels.{Channels, FileChannel}
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
  * Scale shape: large files fan out across tasks via speculative
  * offset splits that resync on newline boundaries (so one giant
  * json-mode stream is NOT one task at 100 TB). Soundness contract:
  * individual values must not contain RAW newline bytes — guaranteed
  * for machine-emitted log streams, since RFC 8259 forbids unescaped
  * control characters inside strings and compact marshalers (the
  * reference's Go `json.Marshal`) never pretty-print — so every 0x0A
  * in the stream sits BETWEEN top-level values and is a valid resync
  * point (the same invariant Hadoop's text splits rely on). Readers
  * use the text-split handshake: a reader owns the lines that start in
  * (start, end] (start=0 additionally owns the first line), reading
  * through a line that straddles its end and discarding the partial
  * line before its first newline. Values inside a line may still be
  * space-separated — JsonValueSplitter separates them.
  *
  * Pretty-printed (multi-line-value) inputs: pass `multiline=true` —
  * oversized files then get a one-pass planning scan (the same
  * string-aware depth machine, streamed) that records top-level
  * value-start offsets, and readers receive EXACT value-aligned
  * ranges, so pretty-printed files fan out across tasks too (small
  * files stay one partition with no planning I/O). A resync reader
  * that lands inside a nested value without the option trips a loud
  * corruption guard (unmatched closers / separators at top level)
  * instead of emitting garbage.
  * `splitSize` overrides the split size; by default it mirrors
  * Spark's file-source sizing — totalBytes/defaultParallelism clamped
  * to [1 MiB, spark.sql.files.maxPartitionBytes] — so a small local
  * file still fans out across cores while 100 TB reads use
  * maxPartitionBytes-sized splits.
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
    Option(options.get("maxFilesPerTrigger")).map(_.toInt),
    Option(options.get("splitSize")).map(_.toLong),
    Option(options.get("multiline")).exists(_.toBoolean))
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

object ConcatJsonSplits {
  /** Default split size, mirroring FilePartition sizing: spread the
    * total bytes over the cluster's parallelism, clamped so tiny
    * inputs don't produce confetti splits and huge ones respect
    * maxPartitionBytes.
    */
  def defaultSplitSize(totalBytes: Long): Long = {
    val (maxPB, par) =
      scala.util.Try {
        val s = org.apache.spark.sql.SparkSession.active
        (s.sessionState.conf.filesMaxPartitionBytes,
          s.sparkContext.defaultParallelism.toLong)
      }.getOrElse((128L << 20, 1L))
    math.max(1L << 20, math.min(maxPB, totalBytes / math.max(par, 1L) + 1))
  }

  def plan(files: Seq[String], splitSize: Option[Long],
      multiline: Boolean): Array[InputPartition] = {
    // Files.size at planning time: in the micro-batch stream a file
    // can vanish (log rotation) between offset commit and a
    // crash-recovery replay of that batch — name the scenario instead
    // of surfacing a bare NoSuchFileException from deep in planning.
    // spark.sql.files.ignoreMissingFiles is honored like the built-in
    // file sources honor it for exactly this list-then-read race:
    // when set, the vanished file is skipped with a warning and the
    // loud failure stays the default.
    val ignoreMissing = scala.util.Try(
      org.apache.spark.sql.SparkSession.active.sessionState.conf
        .ignoreMissingFiles).getOrElse(false)
    val sized = files.flatMap { f =>
      try Some((f, Files.size(Paths.get(f))))
      catch {
        case e: java.nio.file.NoSuchFileException if ignoreMissing =>
          org.slf4j.LoggerFactory.getLogger(getClass).warn(
            s"concat-json: skipping vanished file '$f' " +
              "(spark.sql.files.ignoreMissingFiles=true)")
          None
        case e: java.nio.file.NoSuchFileException =>
          val ex = new java.io.FileNotFoundException(
            s"concat-json: '$f' vanished before its split was planned. " +
              "If this is a streaming checkpoint recovery, a committed " +
              "offset references a since-rotated/deleted file; restore " +
              "the file, start from a fresh checkpoint, or set " +
              "spark.sql.files.ignoreMissingFiles=true to skip it.")
          ex.initCause(e)
          throw ex
      }
    }
    val target =
      splitSize.getOrElse(defaultSplitSize(sized.map(_._2).sum))
    // Pretty-printed values span newlines, so speculative resync can't
    // apply — instead a planning pass runs the string-aware depth
    // machine over each oversized multiline file and records top-level
    // value-start offsets ~target apart. Splits are then EXACT
    // value-aligned ranges: every reader parses only whole values, no
    // handshake, no corruption guard needed. Scans are clamped to the
    // size SNAPSHOT taken above (a concurrent append must not move
    // partition ends past it) and run CONCURRENTLY on the driver —
    // still driver-side I/O paid before tasks launch (the honest cost
    // of exact boundaries; a distributed first-pass job is the next
    // step if directories of many oversized pretty files show up),
    // but each file is strictly cheaper than the single task that
    // would otherwise scan AND parse it alone.
    val multilineBig = sized.filter { case (_, sz) =>
      multiline && sz > target }
    // Scan one file's boundaries, clamped to its size snapshot. None
    // = the file vanished mid-scan; the POLICY decision (skip vs fail)
    // stays on the driver so it is uniform across both scan paths.
    def scanOne(f: String, sz: Long): Option[Seq[Long]] =
      try Some(graft.ops.JsonValueSplitter
        .boundariesOfFile(f, target, limitBytes = sz))
      catch { case _: java.nio.file.NoSuchFileException => None }
    def applyMissingPolicy(f: String, bs: Option[Seq[Long]])
        : Option[Seq[Long]] = bs match {
      case Some(_) => bs
      case None if ignoreMissing =>
        org.slf4j.LoggerFactory.getLogger(getClass).warn(
          s"concat-json: skipping file '$f' that vanished before its " +
            "boundary scan (spark.sql.files.ignoreMissingFiles=true)")
        None
      case None =>
        throw new java.io.FileNotFoundException(
          s"concat-json: '$f' vanished between sizing and its " +
            "multiline boundary scan. If this is a streaming " +
            "checkpoint recovery, a committed offset references a " +
            "since-rotated/deleted file; restore the file, start from " +
            "a fresh checkpoint, or set " +
            "spark.sql.files.ignoreMissingFiles=true to skip it.")
    }
    // Few oversized files: concurrent scans on the driver. MANY (the
    // directory-of-large-pretty-files case): a first-pass Spark job —
    // one task per file — so boundary I/O runs where the cluster's
    // aggregate bandwidth is, and only the (tiny) offset lists come
    // back to the driver. Threshold 4 keeps single-file reads free of
    // job-scheduling latency.
    val boundariesByFile: Map[String, Option[Seq[Long]]] =
      if (multilineBig.isEmpty) Map.empty
      else if (multilineBig.size >= 4 &&
          scala.util.Try(org.apache.spark.sql.SparkSession.active)
            .isSuccess) {
        val sc = org.apache.spark.sql.SparkSession.active.sparkContext
        sc.parallelize(multilineBig, multilineBig.size)
          .map { case (f, sz) => f -> scanOne(f, sz) }
          .collect().toMap
          .map { case (f, bs) => f -> applyMissingPolicy(f, bs) }
      } else {
        import scala.concurrent.{Await, ExecutionContext, Future}
        import scala.concurrent.duration.Duration
        implicit val ec: ExecutionContext = ExecutionContext.global
        Await.result(Future.traverse(multilineBig) { case (f, sz) =>
          Future(f -> applyMissingPolicy(f, scanOne(f, sz)))
        }, Duration.Inf).toMap
      }
    sized.flatMap { case (f, size) =>
      if (size <= target)
        Seq(ConcatJsonPartition(f, 0L, size, splitFile = false))
      else if (multiline) {
        boundariesByFile(f) match {
          case None => Seq.empty // vanished, ignoreMissingFiles=true
          case Some(bs) =>
            (bs :+ size).sliding(2).map { case Seq(b, e) =>
              ConcatJsonPartition(f, b, e, splitFile = false, exact = true)
            }.toSeq
        }
      } else {
        val n = ((size + target - 1) / target).toInt
        (0 until n).map(i => ConcatJsonPartition(f, i.toLong * target,
          math.min((i + 1).toLong * target, size), splitFile = true))
      }
    }.map(p => p: InputPartition).toArray
  }
}

class ConcatJsonScanBuilder(path: String,
    maxFilesPerTrigger: Option[Int] = None,
    splitSize: Option[Long] = None,
    multiline: Boolean = false) extends ScanBuilder with Scan
    with Batch {
  override def build(): Scan = this
  override def readSchema(): StructType = ConcatJsonSource.schema
  override def toBatch: Batch = this

  override def toMicroBatchStream(checkpointLocation: String)
      : org.apache.spark.sql.connector.read.streaming.MicroBatchStream =
    new ConcatJsonMicroBatchStream(path, maxFilesPerTrigger, splitSize,
      multiline)

  override def planInputPartitions(): Array[InputPartition] =
    ConcatJsonSplits.plan(ConcatJsonFiles.list(path), splitSize, multiline)

  override def createReaderFactory(): PartitionReaderFactory =
    new ConcatJsonReaderFactory()
}

/** Streaming form of the source (MICRO_BATCH_READ): the offset is the
  * SET of files already ingested (serialized as a JSON array), so each
  * micro-batch reads exactly the files that appeared since the last —
  * no ordering or naming assumptions on arrivals, the same offset
  * splitting as the batch scan within each admitted file, and
  * replayable batches (start/end offsets pin the file set) for
  * at-least-once recovery under checkpointing. Unbounded
  * concatenated-JSON ingestion was the reference's whole json mode
  * (jsonstreamer.go:40-46).
  *
  * Scope: suited to bounded backlogs and rotating directories — the
  * offset carries every file ever ingested, so a weeks-long tail of a
  * busy directory grows the offset log without bound (the built-in
  * file source behind StreamOps.concatJsonStream keeps a compacted
  * seen-files log instead; the CLI's follow mode uses that wrapper).
  */
class ConcatJsonMicroBatchStream(path: String,
    maxFilesPerTrigger: Option[Int] = None,
    splitSize: Option[Long] = None,
    multiline: Boolean = false)
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
    ConcatJsonSplits.plan((now -- seen).toSeq.sorted, splitSize, multiline)
  }

  override def createReaderFactory(): PartitionReaderFactory =
    new ConcatJsonReaderFactory()

  override def commit(end: Offset): Unit = ()
  override def stop(): Unit = ()
}

case class ConcatJsonPartition(file: String, start: Long, end: Long,
    splitFile: Boolean, exact: Boolean = false) extends InputPartition

class ConcatJsonReaderFactory extends PartitionReaderFactory {
  override def createReader(partition: InputPartition)
      : PartitionReader[InternalRow] =
    new ConcatJsonPartitionReader(
      partition.asInstanceOf[ConcatJsonPartition])
}

/** Reader for one (file, start, end) split. Streams bytes from `start`
  * with the text-split handshake (see source scaladoc): discard to the
  * first newline when start > 0, then consume whole lines while the
  * line START offset is ≤ `end` — the final line may extend past `end`
  * (its tail is discarded by the next split's resync, never read
  * twice). Memory is bounded by one line, not the split.
  *
  * Whole-file partitions (`splitFile = false` — small or
  * multiline=true files) bypass the line scanner and split values over
  * the full content, so pretty-printed values spanning newlines stay
  * intact there.
  */
class ConcatJsonPartitionReader(p: ConcatJsonPartition)
    extends PartitionReader[InternalRow] {

  // the line scanner's channel exists only for split files; the
  // whole-file path reads via readAllBytes below and would otherwise
  // hold an fd it never touches
  private val channel: Option[FileChannel] =
    if (p.splitFile) Some(FileChannel.open(Paths.get(p.file))) else None
  private val in: BufferedInputStream = channel.map(ch =>
    new BufferedInputStream(
      Channels.newInputStream(ch.position(p.start)), 1 << 16)).orNull
  private var pos: Long = p.start
  private var linesDone = false
  private var current: String = _
  private var pending: Iterator[String] =
    if (p.splitFile) Iterator.empty
    else if (p.exact) {
      // exact value-aligned range from the multiline planning scan:
      // read [start, end) and split whole values over it — memory is
      // bounded by the split size, not the file
      linesDone = true
      require(p.end - p.start <= Int.MaxValue.toLong,
        s"concat-json: exact split larger than 2 GiB in ${p.file}")
      val ch = FileChannel.open(Paths.get(p.file))
      try {
        val buf = java.nio.ByteBuffer.allocate((p.end - p.start).toInt)
        ch.position(p.start)
        while (buf.hasRemaining && ch.read(buf) >= 0) {}
        JsonValueSplitter
          .split(new String(buf.array(), 0, buf.position(), "UTF-8"))
          .iterator
      } finally ch.close()
    } else {
      linesDone = true
      JsonValueSplitter
        .split(new String(Files.readAllBytes(Paths.get(p.file)), "UTF-8"))
        .iterator
    }

  // resync: the partial line before the first newline belongs to the
  // split that contains its start (line-split readers only — exact
  // splits are value-aligned already)
  if (p.splitFile && p.start > 0) {
    var b = in.read()
    pos += (if (b >= 0) 1 else 0)
    while (b >= 0 && b != '\n') {
      b = in.read()
      if (b >= 0) pos += 1
    }
    if (b < 0) linesDone = true
  }

  /** Next line (without terminator), or None at split end / EOF. */
  private def nextLine(): Option[String] = {
    if (linesDone || pos > p.end) { linesDone = true; return None }
    val buf = new java.io.ByteArrayOutputStream(256)
    var b = in.read()
    if (b < 0) { linesDone = true; return None }
    while (b >= 0 && b != '\n') {
      buf.write(b)
      pos += 1
      b = in.read()
    }
    if (b == '\n') pos += 1 else linesDone = true
    Some(new String(buf.toByteArray, "UTF-8"))
  }

  /** Corruption guard for split files: a resync point inside a nested
    * (pretty-printed) value surfaces as separators or unmatched
    * closers at top level — fail loudly instead of emitting garbage.
    *
    * Soundness is JOB-level, not row-level: rows a reader emitted
    * before its guard fires are garbage fragments, and a short split
    * landing inside a pretty-printed array can emit bare-element
    * fragments without itself reaching a closer — failure relies on a
    * sibling split of the same file landing on a closer/separator and
    * tripping ITS guard, which aborts the job, so no fragment is ever
    * returned from an action or committed by an ATOMIC sink (file/table
    * sinks commit only on job success). foreachBatch is weaker: a user
    * function writing to a non-atomic external sink can persist partial
    * side effects from fragments before a sibling split's guard aborts
    * the job — there, soundness additionally depends on the user
    * function being idempotent/transactional (the same caveat Spark's
    * own foreachBatch docs carry). The guard is a misuse backstop, not
    * the contract: pretty-printed inputs must pass multiline=true per
    * the source scaladoc.
    */
  private def guard(v: String): String = {
    if (p.splitFile && v.nonEmpty &&
        (v.head == '}' || v.head == ']' || v.head == ':' || v.head == ','))
      throw new IllegalStateException(
        s"concat-json: split resync landed inside a multi-line JSON " +
          s"value (token '${v.take(20)}' in ${p.file}); values must " +
          "not contain raw newlines — set option multiline=true to " +
          "split pretty-printed files on exact value boundaries instead")
    v
  }

  override def next(): Boolean = {
    while (!pending.hasNext) {
      nextLine() match {
        case Some(line) => pending = JsonValueSplitter.split(line).iterator
        case None => return false
      }
    }
    current = guard(pending.next())
    true
  }

  override def get(): InternalRow =
    InternalRow(UTF8String.fromString(current))

  override def close(): Unit = channel.foreach(_.close())
}
