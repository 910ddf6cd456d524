package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Round-16 frontier (batch 6): LLM-training data ops, second set —
  * maximum-inner-product search (the ANN scoring mode recommender /
  * reward-model retrieval uses where vector MAGNITUDE carries signal
  * cosine throws away), score-calibration measurement (reliability
  * table + expected calibration error of a deterministic classifier
  * score), and soft-dedup loss weighting (down-weight near-duplicate
  * training documents by 1/cluster-size instead of dropping them —
  * the dedup policy that keeps coverage while removing duplication
  * bias).
  *
  * Reference note: the reference engine (`/root/reference/`, a Go log
  * forwarder — SURVEY.md §1) has no analytics surface; these extend
  * the LLM-pipeline families (SURVEY §2c). House disciplines: the
  * index-ordered left-fold dot product (codegen expression, DuckDB
  * list_reduce replay — the ann_bruteforce contract), exact integer
  * calibration bins (the bin index is integer arithmetic, never a
  * float floor), bounded folds only, and reuse of the audited
  * dedup_clusters closure for the weight denominator.
  */
object LlmFrontier2 {

  /** DuckDB twin of the [[graft.functions.VectorFunctions.dot_product]]
    * left fold (the numerator of Similarity.cosSql).
    */
  private def dotSql(a: String, b: String): String =
    s"""list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
         list_transform(range(1, len($a) + 1),
           i -> CAST($a[i] AS DOUBLE) * CAST($b[i] AS DOUBLE))),
         (x, y) -> x + y)"""

  def queries: Map[String, Q] = Map(

    // Maximum-inner-product search: top-10 by ⟨q, x⟩ — NOT cosine.
    // MIPS is its own retrieval mode (recommenders score user×item
    // affinity, reward models score unnormalized logits; normalizing
    // away magnitude changes the answer — the spec pins a query where
    // the MIPS and cosine rankings genuinely differ... statistically:
    // rankings are asserted against the brute-force re-derivation).
    // Plan: the ann_bruteforce skeleton verbatim — eval-tier query
    // side broadcast, corpus side a scan, the fused codegen
    // DotProduct expression (one loop, no norm work at all),
    // WindowGroupLimit partial top-k. The classic MIPS-to-NN
    // reduction (augment with √(M²−|x|²) and cosine-search) is the
    // documented 100-TB candidate path on the existing LSH tier.
    "ann_mips" -> ((s, d) => {
      val e = Tables.load(s, d, "embeddings")
      // fixed-size eval tier (matryoshka's cap): ≤1000 queries at any
      // corpus size — the truth scan stays LINEAR in the corpus
      val q = e.filter(col("vec_id") % 100 === 0 &&
          col("vec_id") < 100000)
        .select(col("vec_id").as("q_id"), col("embedding").as("q_emb"))
      val w = Window.partitionBy(col("q_id"))
        .orderBy(desc("dot"), col("vec_id"))
      e.crossJoin(broadcast(q))
        .filter(col("vec_id") =!= col("q_id"))
        .withColumn("dot", graft.functions.VectorFunctions
          .dot_product(col("q_emb"), col("embedding")))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter(col("rank") <= 10)
        .select(col("q_id"), col("rank"), col("vec_id"), col("dot"))
        .orderBy(col("q_id"), col("rank"))
    }),

    // Score calibration: does the en-stopword ratio behave as a
    // calibrated P(lang = en)? Reliability table over 10 equal-width
    // confidence bins + the expected calibration error — the
    // measurement that decides whether a quality/filter score can be
    // thresholded by probability or needs recalibration (every
    // classifier-filtered corpus should ship one). Determinism: the
    // bin index is EXACT integer arithmetic ((10·hits) div total,
    // clamped to 9 — never a float floor), per-bin confidence is
    // micro-averaged from exact token sums (Σhits/Σtotal — ONE IEEE
    // divide per bin, no per-doc float fold), accuracy n_pos/n
    // likewise, and the ECE fold runs over the bin-sorted ≤10-row
    // panel (enum-bounded collect, CollectGuardSpec). One row-local
    // scoring pass + one ≤10-cell groupBy; nothing else shuffles.
    "pipeline_calibration" -> ((s, d) => {
      import s.implicits._
      val en = graft.text.TextAnalysis.stopwords.toMap.apply("en")
      val bins = Tables.spread(Tables.load(s, d, "documents"))
        .select($"doc_id", $"lang",
          split(lower($"text"), "\\s+").as("t"))
        .select(
          size($"t").cast("long").as("total"),
          size(filter($"t", x => x.isInCollection(en))).cast("long")
            .as("hits"),
          when($"lang" === "en", 1L).otherwise(0L).as("y"))
        .select(least(expr("(10 * hits) div total"), lit(9L)).as("bin"),
          $"total", $"hits", $"y")
        .groupBy($"bin")
        .agg(count(lit(1)).as("n_docs"), sum($"y").as("n_pos"),
          sum($"hits").as("sum_hits"), sum($"total").as("sum_total"))
      val ece = bins.groupBy()
        .agg(sum($"n_docs").as("n_all"),
          sort_array(collect_list(struct($"bin", $"n_docs", $"n_pos",
            $"sum_hits", $"sum_total"))).as("cs"))
        .select($"n_all", expr(
          """aggregate(cs, cast(0.0 as double), (acc, c) ->
             acc + cast(c.n_docs as double) / cast(n_all as double)
                 * abs(cast(c.n_pos as double) / cast(c.n_docs as double)
                       - cast(c.sum_hits as double)
                         / cast(c.sum_total as double)))""").as("e"))
      bins.crossJoin(broadcast(ece))
        .select($"bin", $"n_docs", $"n_pos",
          Tables.nz(round($"sum_hits".cast("double") /
            $"sum_total".cast("double"), 6)).as("confidence"),
          Tables.nz(round($"n_pos".cast("double") /
            $"n_docs".cast("double"), 6)).as("accuracy"),
          Tables.nz(round($"e", 6)).as("ece"))
        .orderBy($"bin")
    }),

    // Temporal token-distribution drift: Jensen–Shannon divergence
    // between the first- and second-half (ingest order = doc_id, the
    // text_ngram_novelty convention) token distributions over the
    // top-500 vocabulary + one OOV bucket — "did the crawl shift",
    // the drift monitor a curation pipeline runs per ingest batch
    // (text_divergence reads BETWEEN SOURCES; this is its time-axis
    // twin, and JS is symmetric + bounded by ln 2 where KL is
    // neither). Plan: one (token, half) rollup, a TakeOrdered top-500
    // pick (count desc, token asc — deterministic), the OOV bucket
    // from exact total-minus-top sums, and the JS fold over the
    // 501-cell token-sorted panel (k-bounded collect,
    // CollectGuardSpec) with q200's +0.5 Laplace smoothing so zero
    // cells stay finite on both engines identically.
    "text_token_drift" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.spread(Tables.load(s, d, "documents"))
      // integer `div`, not double `/`+cast (ADVICE r16): the oracle
      // halves with `// 2`, and doc_ids past 2^53 would round
      // differently through the double path
      val mid = Tables.load(s, d, "documents")
        .agg(expr("max(doc_id) div 2").as("m"))
      val tok = docs.crossJoin(broadcast(mid))
        .select(explode(split(lower($"text"), "\\s+")).as("token"),
          when($"doc_id" <= $"m", 1L).otherwise(0L).as("f"))
        .groupBy($"token")
        .agg(sum($"f").as("nf"), sum(lit(1L) - $"f").as("ns"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val tot = tok.agg(sum($"nf").as("n1"), sum($"ns").as("n2"))
      val top = tok.orderBy(($"nf" + $"ns").desc, $"token".asc)
        .limit(500)
      val oov = top.agg(sum($"nf").as("tf"), sum($"ns").as("ts"))
        .crossJoin(broadcast(tot))
        .select(lit("~other~").as("token"),
          ($"n1" - $"tf").as("nf"), ($"n2" - $"ts").as("ns"))
      top.unionByName(oov)
        .groupBy()
        .agg(count(lit(1)).as("n_cells"),
          sort_array(collect_list(struct($"token", $"nf", $"ns")))
            .as("cs"))
        .crossJoin(broadcast(tot))
        .withColumn("js", expr(
          """aggregate(cs, cast(0.0 as double), (acc, c) ->
             acc + 0.5 * ((cast(c.nf as double) + 0.5)
                          / (cast(n1 as double) + 250.5))
                 * ln(((cast(c.nf as double) + 0.5)
                       / (cast(n1 as double) + 250.5))
                      / (0.5 * ((cast(c.nf as double) + 0.5)
                                / (cast(n1 as double) + 250.5)
                                + (cast(c.ns as double) + 0.5)
                                  / (cast(n2 as double) + 250.5))))
                 + 0.5 * ((cast(c.ns as double) + 0.5)
                          / (cast(n2 as double) + 250.5))
                 * ln(((cast(c.ns as double) + 0.5)
                       / (cast(n2 as double) + 250.5))
                      / (0.5 * ((cast(c.nf as double) + 0.5)
                                / (cast(n1 as double) + 250.5)
                                + (cast(c.ns as double) + 0.5)
                                  / (cast(n2 as double) + 250.5)))))"""))
        .select($"n1".as("n_first_tokens"), $"n2".as("n_second_tokens"),
          $"n_cells",
          Tables.nz(round($"js", 6)).as("js_divergence"),
          Tables.nz(round(sqrt(greatest($"js", lit(0.0))), 6))
            .as("js_distance"))
    }),

    // Soft-dedup loss weights: every training document keeps flowing,
    // but near-duplicate cluster members are down-weighted to
    // 1/cluster-size so each CONTENT contributes one unit of loss
    // regardless of how many copies crawled in — the drop-free
    // alternative to dedup_exact's keeper policy (and the weighting
    // several production corpora apply instead of hard dedup).
    // Plan: the audited dedup_clusters closure (banded candidates →
    // posting-join verify → distributed min-label propagation)
    // provides (component, member); cluster sizes are a
    // component-keyed count; documents LEFT join the membership
    // (non-members are singletons, weight 1). The weight is ONE
    // IEEE divide of exact longs. Scale rides the dedup_clusters
    // audit; the joins beyond it are doc-keyed.
    "pipeline_soft_dedup_weights" -> ((s, d) => {
      import s.implicits._
      val clus = graft.dedup.Dedup.dupClusters(s, d)
        .select($"doc_id", $"component")
      val sizes = clus.groupBy($"component").agg(count(lit(1)).as("cn"))
      Tables.load(s, d, "documents").select($"doc_id")
        .join(clus.join(broadcast(sizes), Seq("component")),
          Seq("doc_id"), "left")
        .select($"doc_id",
          coalesce($"component", $"doc_id").as("cluster_id"),
          coalesce($"cn", lit(1L)).as("cluster_size"),
          Tables.nz(round(lit(1.0) /
            coalesce($"cn", lit(1L)).cast("double"), 6))
            .as("loss_weight"))
        .orderBy($"doc_id")
    }))

  def oracles: Map[String, String] = Map(

    "ann_mips" ->
      s"""WITH q AS (
           SELECT vec_id AS q_id, embedding AS q_emb
           FROM embeddings
           WHERE vec_id % 100 = 0 AND vec_id < 100000),
         scored AS (
           SELECT q.q_id, e.vec_id,
             ${dotSql("q.q_emb", "e.embedding")} AS dot
           FROM embeddings e CROSS JOIN q
           WHERE e.vec_id <> q.q_id),
         ranked AS (
           SELECT q_id, vec_id, dot,
             row_number() OVER (PARTITION BY q_id
               ORDER BY dot DESC, vec_id) AS rank
           FROM scored)
         SELECT q_id, CAST(rank AS BIGINT) AS rank, vec_id, dot
         FROM ranked WHERE rank <= 10 ORDER BY q_id, rank""",

    "pipeline_calibration" -> {
      val en = graft.text.TextAnalysis.stopwords.toMap.apply("en")
        .map(w => s"'$w'").mkString(", ")
      s"""WITH scored AS (
           SELECT CAST(len(t) AS BIGINT) AS total,
             CAST(len(list_filter(t, x -> x IN ($en))) AS BIGINT)
               AS hits,
             CASE WHEN lang = 'en' THEN 1 ELSE 0 END AS y
           FROM (SELECT lang,
                   string_split_regex(lower(text), '\\s+') AS t
                 FROM documents)),
         bins AS (
           SELECT least((10 * hits) // total, 9) AS bin,
             CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(y) AS BIGINT) AS n_pos,
             CAST(sum(hits) AS BIGINT) AS sum_hits,
             CAST(sum(total) AS BIGINT) AS sum_total
           FROM scored GROUP BY 1),
         ece AS (
           SELECT n_all,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(cs, c ->
                 CAST(c.n_docs AS DOUBLE) / CAST(n_all AS DOUBLE)
                 * abs(CAST(c.n_pos AS DOUBLE)
                         / CAST(c.n_docs AS DOUBLE)
                       - CAST(c.sum_hits AS DOUBLE)
                         / CAST(c.sum_total AS DOUBLE)))),
               (a, b) -> a + b) AS e
           FROM (
             SELECT CAST(sum(n_docs) AS BIGINT) AS n_all,
               list({'bin': bin, 'n_docs': n_docs, 'n_pos': n_pos,
                 'sum_hits': sum_hits, 'sum_total': sum_total}
                 ORDER BY bin) AS cs
             FROM bins))
         SELECT CAST(b.bin AS BIGINT) AS bin, b.n_docs, b.n_pos,
           round(CAST(b.sum_hits AS DOUBLE)
             / CAST(b.sum_total AS DOUBLE), 6) + 0.0 AS confidence,
           round(CAST(b.n_pos AS DOUBLE)
             / CAST(b.n_docs AS DOUBLE), 6) + 0.0 AS accuracy,
           round(e.e, 6) + 0.0 AS ece
         FROM bins b, ece e ORDER BY bin"""
    },

    "text_token_drift" ->
      """WITH mid AS (
           SELECT max(doc_id) // 2 AS m FROM documents),
         tok AS (
           SELECT token,
             CAST(sum(CASE WHEN doc_id <= m THEN 1 ELSE 0 END)
               AS BIGINT) AS nf,
             CAST(sum(CASE WHEN doc_id > m THEN 1 ELSE 0 END)
               AS BIGINT) AS ns
           FROM (SELECT doc_id,
                   unnest(string_split_regex(lower(text), '\s+'))
                     AS token
                 FROM documents), mid
           GROUP BY 1),
         tot AS (
           SELECT CAST(sum(nf) AS BIGINT) AS n1,
             CAST(sum(ns) AS BIGINT) AS n2
           FROM tok),
         top AS (
           SELECT token, nf, ns FROM tok
           ORDER BY (nf + ns) DESC, token LIMIT 500),
         cells AS (
           SELECT token, nf, ns FROM top
           UNION ALL
           SELECT '~other~' AS token,
             (SELECT n1 FROM tot) - CAST(sum(nf) AS BIGINT) AS nf,
             (SELECT n2 FROM tot) - CAST(sum(ns) AS BIGINT) AS ns
           FROM top),
         panel AS (
           SELECT CAST(count(*) AS BIGINT) AS n_cells,
             list({'token': token, 'nf': nf, 'ns': ns}
               ORDER BY token) AS cs
           FROM cells),
         js AS (
           SELECT n_cells, n1, n2,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(cs, c ->
                 0.5 * ((CAST(c.nf AS DOUBLE) + 0.5)
                        / (CAST(n1 AS DOUBLE) + 250.5))
                 * ln(((CAST(c.nf AS DOUBLE) + 0.5)
                       / (CAST(n1 AS DOUBLE) + 250.5))
                      / (0.5 * ((CAST(c.nf AS DOUBLE) + 0.5)
                                / (CAST(n1 AS DOUBLE) + 250.5)
                                + (CAST(c.ns AS DOUBLE) + 0.5)
                                  / (CAST(n2 AS DOUBLE) + 250.5))))
                 + 0.5 * ((CAST(c.ns AS DOUBLE) + 0.5)
                          / (CAST(n2 AS DOUBLE) + 250.5))
                 * ln(((CAST(c.ns AS DOUBLE) + 0.5)
                       / (CAST(n2 AS DOUBLE) + 250.5))
                      / (0.5 * ((CAST(c.nf AS DOUBLE) + 0.5)
                                / (CAST(n1 AS DOUBLE) + 250.5)
                                + (CAST(c.ns AS DOUBLE) + 0.5)
                                  / (CAST(n2 AS DOUBLE) + 250.5)))))),
               (a, b) -> a + b) AS js
           FROM panel, tot)
         SELECT n1 AS n_first_tokens, n2 AS n_second_tokens, n_cells,
           round(js, 6) + 0.0 AS js_divergence,
           round(sqrt(greatest(js, CAST(0.0 AS DOUBLE))), 6) + 0.0
             AS js_distance
         FROM js""",

    "pipeline_soft_dedup_weights" ->
      s"""WITH clus AS (
           ${graft.dedup.Dedup.oracles("dedup_clusters")}),
         sizes AS (
           SELECT component, CAST(count(*) AS BIGINT) AS cn
           FROM clus GROUP BY 1)
         SELECT d.doc_id,
           COALESCE(c.component, d.doc_id) AS cluster_id,
           COALESCE(s.cn, 1) AS cluster_size,
           round(1.0 / CAST(COALESCE(s.cn, 1) AS DOUBLE), 6) + 0.0
             AS loss_weight
         FROM documents d
         LEFT JOIN clus c ON c.doc_id = d.doc_id
         LEFT JOIN sizes s ON s.component = c.component
         ORDER BY d.doc_id""")
}
