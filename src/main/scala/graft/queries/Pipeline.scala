package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.functions._

/** End-to-end training-data preparation pipeline — the composition the
  * LLM-pipeline operators exist for: quality-filter → exact-dedup
  * (keep lowest doc_id) → attach embeddings → emit training rows.
  * One query so the whole flow is plan-optimized together: the quality
  * predicates push into the scan, the dedup is one digest shuffle, the
  * embedding attach broadcasts.
  */
object Pipeline {

  def queries: Map[String, Q] = Map(
    // Deterministic train/test split — the leakage-safe way to split a
    // training corpus: the split is a pure function of content (first
    // hex digit of md5), so re-runs, incremental batches, and other
    // engines agree row-for-row with no stored split table. 12/16
    // buckets → train, 4/16 → held out. Row-local, scan-shaped; the
    // lexicographic hex compare is numeric order ('0'<'9'<'a'<'f').
    "pipeline_split" -> ((s, d) => {
      import s.implicits._
      val bucket = substring(md5($"text"), 1, 1)
      Tables.load(s, d, "documents")
        .withColumn("split",
          when(bucket < lit("c"), lit("train")).otherwise(lit("test")))
        .groupBy($"lang", $"split")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_chars").as("sum_chars"))
        .orderBy($"lang", $"split")
    }),
    "pipeline_training_prep" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.load(s, d, "documents")
      val embs = Tables.load(s, d, "embeddings")
      val scored = docs
        .withColumn("t", split(lower($"text"), "\\s+"))
        .withColumn("ttr",
          size(array_distinct($"t")).cast("double") /
            size($"t").cast("double"))
        .filter($"n_chars" >= 200 && $"ttr" >= 0.3)
      val deduped = scored
        .withColumn("digest", md5($"text"))
        .withColumn("keeper",
          min($"doc_id").over(
            org.apache.spark.sql.expressions.Window.partitionBy($"digest")))
        .filter($"doc_id" === $"keeper")
      deduped
        .join(broadcast(embs), deduped("doc_id") === embs("vec_id"))
        .select($"doc_id", $"lang", $"source", $"n_chars", $"ttr",
          $"label", size($"embedding").cast("long").as("emb_dim"))
        .orderBy($"doc_id")
    }))

  def oracles: Map[String, String] = Map(
    "pipeline_split" ->
      """SELECT lang,
           CASE WHEN substring(md5(text), 1, 1) < 'c'
                THEN 'train' ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM documents GROUP BY 1, 2 ORDER BY lang, split""",
    "pipeline_training_prep" ->
      """WITH scored AS (
           SELECT doc_id, lang, source, n_chars, text,
             CAST(len(list_distinct(string_split_regex(lower(text), '\s+'))) AS DOUBLE) /
             CAST(len(string_split_regex(lower(text), '\s+')) AS DOUBLE) AS ttr
           FROM documents
           WHERE n_chars >= 200),
         filtered AS (SELECT * FROM scored WHERE ttr >= 0.3),
         deduped AS (
           SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS keeper
           FROM filtered)
         SELECT d.doc_id, d.lang, d.source, d.n_chars, d.ttr, e.label,
           CAST(len(e.embedding) AS BIGINT) AS emb_dim
         FROM deduped d JOIN embeddings e ON d.doc_id = e.vec_id
         WHERE d.doc_id = d.keeper
         ORDER BY d.doc_id""")
}
