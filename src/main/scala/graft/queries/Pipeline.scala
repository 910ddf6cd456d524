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
