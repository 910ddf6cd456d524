package graft.queries

import graft.{Q, Tables}
import graft.ops.Transforms
import org.apache.spark.sql.functions._

/** The reference's own operator surface (SURVEY.md §2a) expressed as
  * oracle-checkable batch queries over the driver tables. `documents
  * .text` stands in for the stdin line stream; `events.props` for the
  * JSON-value stream. The streaming twins live in graft.streaming.
  */
object LogOps {

  def queries: Map[String, Q] = Map(
    // F1 + P1 + P2 + K1: the full line-mode pipeline
    // (`--format line --output-format json --add-entry LogFile=ErrorLog`).
    "ref_line_pipeline" -> ((s, d) => {
      import s.implicits._
      val lines = Tables.load(s, d, "documents")
        .select($"doc_id", $"text".as("value"))
      val piped =
        (Transforms.dropEmptyLines() _)
          .andThen(Transforms.wrapLine(
            outputKey = "LogEntry",
            entries = Seq("LogFile" -> "ErrorLog")))
          .andThen(Transforms.withPartitionKey("host-test"))
          .apply(lines)
      piped.select($"doc_id", $"record", $"partition_key").orderBy($"doc_id")
    }),

    // F2 + P2 + P3: json-mode pipeline — skip nulls, enrich with
    // overwrite, re-marshal canonicalized (key-sorted, numbers as
    // doubles per Go float64 decoding).
    "ref_json_pipeline" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.load(s, d, "events")
        .select($"event_id", $"props".as("value"))
      val piped =
        (Transforms.dropNullJson() _)
          .andThen(Transforms.canonicalJson("value", "payload_map"))
          .apply(ev)
      // enrichment on the parsed struct form, overwrite semantics:
      // add-entry k=0 overwrites the payload's k (jsonstreamer.go:52-54)
      val parsed = piped
        .withColumn("payload",
          from_json($"value", lit("struct<k:double>")))
      (Transforms.addEntries(Seq("LogFile" -> "AccessLog"), "payload") _)
        .apply(parsed)
        .select($"event_id",
          to_json($"payload").as("record"),
          $"payload_map".as("canonical"),
          // full-fidelity canonicalizer (nested-capable Expression);
          // must agree with the schema-based path on flat payloads
          graft.functions.CanonicalizeJson.canonicalize_json($"value")
            .as("canonical_full"))
        .orderBy($"event_id")
    }),

    // P2 overwrite-on-collision in isolation: the add-entry key wins
    // over the payload's existing key.
    "ref_addentry_overwrite" -> ((s, d) => {
      import s.implicits._
      val parsed = Tables.load(s, d, "events")
        .select($"event_id",
          from_json($"props", lit("struct<k:double>")).as("payload"))
      (Transforms.addEntries(Seq("k" -> "overwritten"), "payload") _)
        .apply(parsed)
        .select($"event_id", $"payload.k".as("k"))
        .orderBy($"event_id")
    }),

    // S2 through the custom DataSource V2: events.props re-serialized
    // as a concatenated JSON value stream, read back via the
    // `concat-json` source, parsed and aggregated — the reference's
    // json-mode input path inside the oracle gate.
    "ref_concat_json_source" -> ((s, d) => {
      import s.implicits._
      // per-process scratch (isolated from concurrent sessions,
      // removed on JVM exit, overwrite keeps it bounded within a run)
      val tmp = graft.ScratchDir.path("cjsrc")
      Tables.load(s, d, "events").select($"props").coalesce(1)
        .write.mode("overwrite").text(tmp)
      s.read.format("concat-json").load(tmp)
        // the source splits large files on speculative value
        // boundaries; spread only kicks in when the scan still has
        // fewer splits than the session parallelism
        .transform(Tables.spread)
        .select(get_json_object($"value", "$.k").cast("double").as("k"))
        .groupBy((floor($"k" / 10) * 10).cast("long").as("k_bucket"))
        .agg(count(lit(1)).as("n"), round(sum($"k"), 2).as("sum_k"))
        .orderBy($"k_bucket")
    }),

    // P4: identity projection (line mode, --output-format string).
    "ref_identity" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "documents")
        .select($"doc_id", $"text".as("value"))
        .transform(Transforms.dropEmptyLines())
        .orderBy($"doc_id")
    }))

  def oracles: Map[String, String] = Map(
    "ref_line_pipeline" ->
      """SELECT doc_id,
         json_object('LogEntry', text, 'LogFile', 'ErrorLog') AS record,
         'host-test' AS partition_key
         FROM documents WHERE length(text) > 0 ORDER BY doc_id""",
    "ref_json_pipeline" ->
      """SELECT event_id,
         json_object('LogFile', 'AccessLog',
                     'k', CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS record,
         json_object('k', CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS canonical,
         json_object('k', CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS canonical_full
         FROM events
         WHERE props IS NOT NULL AND trim(props) <> 'null'
         ORDER BY event_id""",
    "ref_addentry_overwrite" ->
      """SELECT event_id, 'overwritten' AS k FROM events ORDER BY event_id""",
    "ref_identity" ->
      """SELECT doc_id, text AS value FROM documents
         WHERE length(text) > 0 ORDER BY doc_id""",
    "ref_concat_json_source" ->
      """SELECT CAST(floor(CAST(json_extract_string(props, '$.k') AS DOUBLE) / 10) * 10 AS BIGINT) AS k_bucket,
         count(*) AS n,
         round(sum(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 2) AS sum_k
         FROM events GROUP BY 1 ORDER BY 1""")
}
