package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.catalyst.expressions.aggregate.{CollectList, CollectSet}
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan

/** Board-wide unbounded-collect discipline (r11 verdict item #2) —
  * the collect_list twin of [[WindowGuardSpec]].
  *
  * A `collect_list`/`collect_set` aggregate buffers its ENTIRE group
  * in one executor's memory: it is exactly the aggregation shape that
  * produced both r10 scale-killers (`pipeline_epoch_order` buffered
  * corpus/4 docs per shard; `q155_funnel_latency` buffered a week's
  * latencies per group) — each safe at sf0.1, each an OOM at the
  * 100 TB target. Per-site reasoning caught those two only after a
  * verdict flagged them; this spec makes the discipline mechanical:
  * it walks the OPTIMIZED logical plan of every registered query
  * (subqueries included) and fails on any CollectList/CollectSet
  * aggregate function, unless the query is on the whitelist below —
  * and each whitelist entry documents the bound that keeps the
  * buffered group small at ANY corpus size (a per-document token
  * list, an enum-bounded domain, a post-limit frame, a count-table
  * row…). The whitelist is checked the other way too: an entry whose
  * query no longer plans a collect is STALE and fails, so the list
  * cannot rot into a blanket exemption.
  *
  * What counts as a bound (the categories below annotate each entry):
  *  - doc-bounded: group = one document's tokens/shingles — scales
  *    with max document length, a data CONTRACT (documents are
  *    KB-scale), never with corpus row count;
  *  - enum-bounded: group domain is a literal/enum grid (event
  *    types, buckets, epochs × shards, k subspaces…);
  *  - k-bounded: a top-k / limit / WindowGroupLimit runs BEFORE the
  *    collect, so the collected frame is ≤ k rows;
  *  - count-table: input is a count-of-counts / domain-sized
  *    aggregate (bounded by distinct values, not rows);
  *  - pair-bounded: group = per-key adjacency/posting truncated by
  *    an explicit rank filter upstream.
  */
class CollectGuardSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** query name → documented bound for every collect the optimized
    * plan retains. Source comments at each site carry the same
    * rationale.
    */
  private val whitelist: Map[String, String] = Map(
    // --- d-bounded: group = one (cell, …) key, list = per-dimension
    // moments, size = embedding dim (fixed model property)
    "ann_ivf" -> "per-centroid-cell dim-moment list, size = d",
    "ann_pq" -> "per-(subspace, cell) dim-moment list, size = d/m",
    "emb_drift" -> "per-half dim-moment list, size = d",
    "emb_label_centroids" -> "per-label dim-moment list, size = d",
    "emb_outliers" -> "corpus-mean dim-moment list, size = d",
    "emb_effective_dim" ->
      "one global covariance list, size = d(d+1)/2 = 2016 keys",
    "emb_cka" ->
      "one global covariance list, size = d(d+1)/2 + d (d-bounded)",
    // --- doc-bounded: group = one document; buffer scales with max
    // document length (KB-scale data contract), never corpus rows
    "pipeline_bpe_encode" ->
      "per-doc (word-pos, toks) chunks reassembled in doc order",
    "pipeline_tokenizer_fertility" ->
      "per-doc (word-pos, toks) chunks (Bpe.encode shared path)",
    "text_zipf_rank_score" ->
      "per-doc token-rank list (ranks ride PrefixSum upstream)",
    "text_entropy" ->
      "per-doc distinct-token count list (doc-length-bounded)",
    // --- enum-bounded: the group domain is a literal/enum grid
    "pipeline_mixture_grid" ->
      "per-language mixture rows (lang enum)",
    "pipeline_temperature_mix" ->
      "per-language mixture rows (lang enum)",
    "q103_hour_entropy" -> "per-type hour counts, <= 24 cells",
    "q106_benford" -> "per-group leading-digit counts, 9 cells",
    "q119_mutual_information" ->
      "type x weekday cell grid, 5x7 = 35 cells + marginals",
    "q130_effect_sizes" -> "type x weekday obs grid, 35 cells",
    "q92_chi_square" -> "type x weekday obs grid, 35 cells",
    "q160_entropy_rate" ->
      "per-state transition rows (event-type enum squared)",
    "q168_fdr_bh" ->
      "one-row BH panel, <= |event types| (p, type) structs",
    "q91_source_overlap" -> "per-token source set (source enum)",
    "text_source_purity" -> "per-source lang histogram (lang enum)",
    "pipeline_reweight_ess" ->
      "per-lang count panel (lang enum, <= |langs| rows)",
    "text_burrows_delta" ->
      "per-token source panel (source enum) + per-pair top-50 word fold (k-bounded)",
    // --- k-bounded: an explicit top-k / rank filter / limit runs
    // BEFORE the collect
    "pipeline_vocab_encode" -> "top-1000-bounded vocabulary list",
    "q156_hill_tail" -> "rank <= 65 WindowGroupLimit before collect",
    "text_inverted_index" ->
      "posting truncated to rank <= 20 per term before collect",
    "text_zipf_fit" -> "rank <= 100 filter per lang before collect",
    "ann_mmr" ->
      "per-query top-50 candidate list (rank <= 50 WindowGroupLimit before collect)",
    // --- surfaced by the cached-subtree walk (the collects were
    // always there, persisted mid-build; bounds documented at sites)
    "dedup_prefix_filter" ->
      "per-doc (df, shingle) list for the canonical prefix order - doc-length-bounded",
    "pipeline_split_leakage" ->
      "per-doc (df, shingle) list (Dedup.prefixFilter shared path) - doc-length-bounded",
    "dedup_tfidf_cosine" ->
      "per-term posting truncated to rn <= maxDf+1 BEFORE collect (df-capped)",
    // r20: the query-stage walk (stages materialize now that the
    // persisted frames fill eagerly) surfaced two collects that were
    // always there behind caches
    "ann_hybrid_rrf" ->
      "per-term posting (lexicalTopK reuses tfidfTermWeights) - df-capped like dedup_tfidf_cosine",
    "emb_pq_distortion" ->
      "per-(subspace, cell) dim-moment list, size = d/m (ann_pq's shared codebook build)",
    "q72_triangle_count" ->
      "oriented adjacency lists, per-row O(arboricity*degree) by the lower-(deg,id) orientation",
    "q109_clustering_coeff" ->
      "oriented adjacency lists (triangleCountsWithDeg shared kernel)",
    // --- frame-bounded: window collect over an explicit ROWS frame
    "q102_rolling_median" -> "rowsBetween(-4, 0) frame, 5 rows",
    "q169_conformal_interval" ->
      "per-type 14-day calibration score list (fixed window)",
    // --- count-table / domain-sized aggregate input
    "q120_survival_km" ->
      "months-bounded risk table, <= span/30 rows",
    "q136_retention_halflife" ->
      "month-offset rate curve, <= span/30 rows",
    "q152_lorenz_deciles" -> "10-row decile aggregate",
    "q166_logrank_churn" -> "month x arm grid, <= 2*span/30 rows",
    "text_heaps_fit" -> "10-row corpus-order checkpoint curve",
    // --- span-bounded: input is the DAILY (or coarser) series —
    // calendar-sized, independent of corpus row count
    "q107_ema" ->
      "per-customer order history (TPC-H tens-of-orders contract)",
    "q114_holt_forecast" -> "per-type daily series, span days",
    "q117_runs_test" -> "per-type daily series, span days",
    "q176_durbin_watson" ->
      "per-type daily residual series, span days (q160-style fold)",
    "q178_kruskal_wallis" -> "weekday enum panel, <= 7 rows",
    "q187_ljung_box" -> "per-type 7-lag rho panel (lag literal grid)",
    "q191_tukey_hsd" -> "weekday enum panel, <= 7 rows",
    "q192_bartlett" -> "weekday enum panel, <= 7 rows",
    "q198_g_test" -> "cell table, event-type enum x 7 weekdays",
    "q206_cmh" -> "per-stratum 2x2 panel, region enum (5 rows)",
    "q211_newey_west" -> "per-lag autocovariance panel, 8-lag literal grid",
    "pipeline_calibration" -> "calibration-bin panel, <= 10 rows (integer decile grid)",
    "text_token_drift" -> "top-500+OOV vocab panel, <= 501 rows (k-bounded before the fold)",
    "q199_cronbach_alpha" ->
      "per-item moment panel, bounded by the event-type enum",
    "q200_psi" -> "decile x half count cells, <= 10 rows",
    "q202_nelson_aalen" ->
      "months-bounded risk table (q120's frame, <= span/30 rows)",
    "q223_rmst" ->
      "months-bounded risk table (q120's frame, <= span/30 rows)",
    "q219_hurst" ->
      ("per-block <= 64-element list + per-m block panel (<= hours/8 "
        + "rows) — both span-bounded on the hourly grid"),
    "q188_mood_median" -> "segment enum panel, <= |segments| rows",
    "q189_cramers_v" ->
      "contingency cell grids, key-domain-bounded (25x50 max)",
    "q224_ansari_bradley" ->
      "50-cell quantity panel (l_quantity in 1..50, value-domain-bounded)",
    "q179_weekday_anova" -> "weekday enum panel, <= 7 rows",
    "q181_levene_bf" -> "weekday enum panel, <= 7 rows",
    "q182_welch_anova" -> "weekday enum panel, <= 7 rows",
    "q183_friedman" -> "weekday rank-sum panel, <= 7 rows",
    "q141_theil_sen" ->
      "pairwise slopes of the daily series, span^2/2 per type",
    "q142_bootstrap_ci" -> "one list of B=200 bootstrap means",
    // --- behavior-bounded: group = one user session / one customer
    "q42_seq_match" ->
      "per-session event list (30-min gap rule bounds a session)",
    "q45_session_paths" ->
      "per-session event list (30-min gap rule bounds a session)",
    // --- degree-capped: deg <= 64 pre-join before the neighbor
    // collect (fixed this round — the cap used to run AFTER)
    "q108_link_prediction" ->
      "wedge-center adjacency, deg <= 64 pre-filtered",
    "q144_adamic_adar" ->
      "wedge-center adjacency, 2 <= deg <= 64 pre-filtered")

  test("no registered query plans an unbounded collect aggregate") {
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    val clean = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val root = df.queryExecution.optimizedPlan
      val plans: Seq[LogicalPlan] = root +: root.subqueriesAll
      // a query that persists MID-BUILD (ann_mmr's materialization
      // barrier) optimizes to an InMemoryRelation leaf that hides the
      // collect inside its cached PHYSICAL plan — recurse into it so
      // the discipline cannot be dodged by caching
      def exprCollects(es: Seq[org.apache.spark.sql.catalyst
          .expressions.Expression]): Seq[String] =
        es.flatMap(_.collect {
          case c: CollectList => s"collect_list(${c.child.sql})"
          case c: CollectSet => s"collect_set(${c.child.sql})"
        })
      def physCollects(p: org.apache.spark.sql.execution.SparkPlan)
          : Seq[String] = p.flatMap {
        // AQE wraps the cached plan in a CHILDLESS adaptive node —
        // recurse through its current physical plan
        case a: org.apache.spark.sql.execution.adaptive
            .AdaptiveSparkPlanExec => physCollects(a.executedPlan)
        // an EXECUTED adaptive plan (r20: queries now eagerly fill
        // their persisted frames, so cachedPlan arrives materialized)
        // wraps each materialized stage in a LEAF QueryStageExec —
        // recurse into the stage's plan or the collect hides there
        case q: org.apache.spark.sql.execution.adaptive
            .QueryStageExec => physCollects(q.plan)
        // nested caches: a cached plan can scan ANOTHER cached frame
        case s: org.apache.spark.sql.execution.columnar
            .InMemoryTableScanExec => physCollects(s.relation.cachedPlan)
        case n => exprCollects(n.expressions)
      }
      val collects = plans.flatMap(p => p.flatMap {
        case imr: org.apache.spark.sql.execution.columnar
            .InMemoryRelation => physCollects(imr.cachedPlan)
        case node => exprCollects(node.expressions)
      })
      if (collects.nonEmpty) {
        if (!whitelist.contains(name))
          offenders += s"$name: ${collects.distinct.mkString("; ")}"
      } else if (whitelist.contains(name)) clean += name
      spark.catalog.clearCache()
    }
    assert(offenders.isEmpty,
      s"collect aggregate outside the whitelist:\n  " +
        offenders.mkString("\n  "))
    assert(clean.isEmpty,
      s"stale whitelist entries (no collect planned):\n  " +
        clean.mkString("\n  "))
  }
}
