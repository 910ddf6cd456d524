package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference engine's whole transform surface (SURVEY.md §2a),
  * re-expressed as composable `DataFrame => DataFrame` combinators over
  * Spark built-ins so every stage stays inside whole-stage codegen and
  * Catalyst can push/prune/fold across them.
  *
  * Reference semantics citations (into /root/reference/):
  *  - F1 empty-line filter      linestreamer.go:86
  *  - F2 null-value filter      jsonstreamer.go:48
  *  - P1 wrap-line-as-JSON      linestreamer.go:92-98 (key flag main.go:68)
  *  - P2 add-entry enrichment   linestreamer.go:41-45, jsonstreamer.go:49-56
  *  - P3 canonical re-marshal   jsonstreamer.go:58-62 (Go sorts map keys)
  *  - P4 identity projection    linestreamer.go:89-90
  *  - K1 partition-key column   linestreamer.go:100-103, hostid.go:22-78
  *  - C1 format resolution      main.go:86-99
  */
object Transforms {

  // ---------------------------------------------------------------- F1
  /** Drop zero-length lines (linestreamer.go:86). */
  def dropEmptyLines(col: String = "value")(df: DataFrame): DataFrame =
    df.filter(length(df(col)) > 0)

  // ---------------------------------------------------------------- F2
  /** Drop records whose JSON payload is a top-level `null`
    * (jsonstreamer.go:48). Works on a string JSON column: SQL NULL or
    * the literal "null" document are both dropped.
    */
  def dropNullJson(col: String = "value")(df: DataFrame): DataFrame =
    df.filter(df(col).isNotNull && trim(df(col)) =!= "null")

  // ---------------------------------------------------------------- P1
  /** Wrap a raw line as a one-field JSON object
    * `{outputKey: line, ...entries}` (linestreamer.go:92-98). `entries`
    * are the --add-entry constants (P2); in the reference's line mode the
    * wrapped key always sorts with the entry keys because Go marshals
    * maps key-sorted — we reproduce that by sorting the struct fields.
    */
  def wrapLine(
      outputKey: String = "LogEntry",
      entries: Seq[(String, String)] = Nil,
      col: String = "value",
      out: String = "record")(df: DataFrame): DataFrame = {
    val fields: Seq[(String, Column)] =
      ((outputKey -> df(col)) +: entries.map { case (k, v) => k -> lit(v) })
        .sortBy(_._1)
    df.withColumn(out, to_json(struct(fields.map { case (k, c) => c.as(k) }: _*)))
  }

  // ---------------------------------------------------------------- P2
  /** Merge constant entries into a struct column, overwriting colliding
    * keys (jsonstreamer.go:52-54 overwrite semantics). Output keeps
    * fields key-sorted to match Go's canonical marshal order (P3).
    */
  def addEntries(entries: Seq[(String, String)], col: String = "payload")(
      df: DataFrame): DataFrame = {
    val schema = df.schema(col).dataType
      .asInstanceOf[org.apache.spark.sql.types.StructType]
    val overwritten = entries.toMap
    val kept = schema.fieldNames.toSeq.filterNot(overwritten.contains)
      .map(f => f -> (df(col).getField(f): Column))
    val added = entries.map { case (k, v) => k -> (lit(v): Column) }
    val fields = (kept ++ added).sortBy(_._1)
    df.withColumn(col, struct(fields.map { case (k, c) => c.as(k) }: _*))
  }

  // ---------------------------------------------------------------- P3
  /** Canonicalize a JSON object string: parse to a map and re-marshal
    * with key-sorted entries — byte-parity with Go's `json.Marshal` of a
    * `map[string]interface{}` (jsonstreamer.go:58-62). Values are kept
    * as doubles (Go decodes every JSON number as float64, SURVEY §1.2).
    */
  def canonicalJson(col: String, out: String, valueType: String = "double")(
      df: DataFrame): DataFrame = {
    val parsed = from_json(df(col), s"map<string,$valueType>",
      Map.empty[String, String])
    val sorted = map_from_entries(array_sort(map_entries(parsed)))
    df.withColumn(out, to_json(sorted))
  }

  // ---------------------------------------------------------------- P4
  /** Identity projection — raw line bytes pass through untouched
    * (linestreamer.go:89-90). Exists so pipelines can express
    * `--output-format string` explicitly.
    */
  def identityLine(col: String = "value")(df: DataFrame): DataFrame =
    df.select(df(col))

  // ---------------------------------------------------------------- K1
  /** Attach the constant per-process partition key column
    * (linestreamer.go:100-103). The key value is resolved driver-side
    * once (graft.HostId mirrors hostid.go's fallback chain) and becomes
    * a foldable literal — zero per-row cost after codegen.
    */
  def withPartitionKey(key: String, col: String = "partition_key")(
      df: DataFrame): DataFrame =
    df.withColumn(col, lit(key))

  // ---------------------------------------------------------------- C1
  /** Input format (main.go:79-91) and `auto` output-format folding
    * (main.go:93-99): line→string, json→json.
    */
  sealed trait Format
  case object LineFormat extends Format
  case object JsonFormat extends Format
  sealed trait OutputFormat
  case object StringOutput extends OutputFormat
  case object JsonOutput extends OutputFormat

  def resolveOutputFormat(in: Format, out: Option[OutputFormat]): OutputFormat =
    out.getOrElse(in match {
      case LineFormat => StringOutput
      case JsonFormat => JsonOutput
    })

  /** Parse repeated `--add-entry K=V` arguments. Duplicate keys are a
    * configuration error (main.go:115-118), rejected at parse time —
    * not silently last-wins (that overwrite semantic applies only to
    * payload-vs-entry collisions, P2, not entry-vs-entry).
    */
  def parseAddEntries(args: Seq[String])
      : Either[String, Seq[(String, String)]] = {
    val parsed = args.map { a =>
      a.split("=", 2) match {
        case Array(k, v) if k.nonEmpty => Right(k -> v)
        case _ => Left(s"invalid --add-entry '$a': expected KEY=VALUE")
      }
    }
    parsed.collectFirst { case Left(e) => Left(e) }.getOrElse {
      val entries = parsed.collect { case Right(kv) => kv }
      val dups = entries.groupBy(_._1).filter(_._2.size > 1).keys
      if (dups.nonEmpty)
        Left(s"duplicate --add-entry key(s): ${dups.mkString(", ")}")
      else Right(entries)
    }
  }
}
