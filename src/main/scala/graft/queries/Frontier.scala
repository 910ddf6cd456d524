package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.{Q, Tables}

/** Round-10 operator additions — the frontier batch on top of the
  * r1–r9 board (time-series changepoints, robust regression, the
  * Poisson bootstrap, as-of-nearest joins, cohort triangles, code
  * detection, mixture grids, embedding isotropy).
  *
  * Reference note: the reference engine (`/root/reference/`, a
  * Go log forwarder — see SURVEY.md §1) has no analytics surface;
  * these are training-data-pipeline / analytics extensions in the
  * same spirit as the Insights/Pipeline families. Every op keeps the
  * house disciplines: exact integer domains until one final IEEE
  * assembly, Tables.nz on signable float outputs, domain-bounded
  * windows only, and a DuckDB oracle that replays the identical
  * arithmetic.
  */
object Frontier {

  def queries: Map[String, Q] = Map(

    // Offline changepoint detection (CUSUM argmax, one split) on the
    // daily value series per event type — "which day did the metric
    // regime change": the batch twin of the streaming cusumDrift
    // monitor, and the first diagnostic run on a metric before a
    // diff-in-diff (q135) picks its treatment window. EXACT integer
    // statistic: with cum_t = Σ_{i≤t} v_i and tot = Σ v_i, the
    // centered CUSUM n·cum_t − t·tot equals n²·(classic deviation
    // sum) — same argmax, zero floats. Split candidates t ∈ [1, n−1]
    // (a split after the last day is no split), tie → earliest day.
    // Scale: the corpus-sized pass is the daily rollup (map-side
    // combined); everything after runs on type×day rows (domain-
    // bounded), and the per-type window is ≤ span-days wide.
    "q140_changepoint" -> ((s, d) => {
      import s.implicits._
      val daily = Tables.load(s, d, "events")
        .select($"event_type", to_date($"ts").as("day"),
          round($"value" * 100).cast("long").as("cents"))
        .groupBy($"event_type", $"day").agg(sum($"cents").as("v"))
      val w = Window.partitionBy($"event_type").orderBy($"day")
      val wAll = Window.partitionBy($"event_type")
      val scored = daily
        .withColumn("t", row_number().over(w).cast("long"))
        .withColumn("cum", sum($"v").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("n", count(lit(1)).over(wAll))
        .withColumn("tot", sum($"v").over(wAll))
        .filter($"t" < $"n")
        .withColumn("s_abs", abs($"n" * $"cum" - $"t" * $"tot"))
      scored
        .groupBy($"event_type")
        .agg(max($"n").as("n_days"),
          max_by(struct($"day", $"t", $"cum", $"s_abs"),
            struct($"s_abs", $"t" * -1)).as("best"),
          max($"tot").as("tot"))
        .select($"event_type", $"n_days",
          date_format($"best.day", "yyyy-MM-dd").as("cp_day"),
          $"best.s_abs".as("s_abs"),
          expr("best.cum div best.t").as("pre_mean_cents"),
          expr("(tot - best.cum) div (n_days - best.t)")
            .as("post_mean_cents"))
        .orderBy($"event_type")
    }),

    // Theil–Sen slope per event type — the ROBUST trend estimate next
    // to q110's Mann–Kendall direction test (median of all pairwise
    // slopes; a single outlier day cannot drag it the way it drags the
    // q114/q107 least-squares-ish fits). Pair enumeration is
    // span-days² per type — DOMAIN-bounded (days, not rows), the same
    // budget q110 already spends; slopes are one exact-int difference
    // divide; the median is lower-median element selection from the
    // per-type sorted slope list (q117's med discipline — the list is
    // pair-of-days-sized, never corpus-sized).
    "q141_theil_sen" -> ((s, d) => {
      import s.implicits._
      val daily = Tables.load(s, d, "events")
        .select($"event_type", to_date($"ts").as("day"),
          round($"value" * 100).cast("long").as("cents"))
        .groupBy($"event_type", $"day").agg(sum($"cents").as("v"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val a = daily.select($"event_type", $"day".as("d1"), $"v".as("v1"))
      val b = daily.select($"event_type", $"day".as("d2"), $"v".as("v2"))
      a.join(b, Seq("event_type")).filter($"d1" < $"d2")
        .select($"event_type",
          (($"v2" - $"v1").cast("double") /
            datediff($"d2", $"d1").cast("double")).as("slope"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_pairs"),
          sort_array(collect_list($"slope")).as("sl"))
        .select($"event_type", $"n_pairs",
          Tables.nz(round(expr(
            "element_at(sl, CAST((size(sl) + 1) div 2 AS INT))"), 4))
            .as("sen_slope"))
        .orderBy($"event_type")
    }),

    // Poisson bootstrap CI for mean customer spend — THE bootstrap
    // that works at 100 TB: classic resampling needs n draws per
    // replicate (a shuffle of B·n rows); the Poisson(1) approximation
    // gives every row an independent per-replicate weight, so all B
    // replicates ride ONE pass over the data as a B-way explode +
    // map-side-combined rollup (Chamandy et al., "Estimating
    // Uncertainty for Massive Data Streams", Google 2012). Weights
    // are DETERMINISTIC — md5(custkey:rep) first 8 hex digits
    // compared lexicographically against the Poisson(1) CDF
    // thresholds (lowercase fixed-width hex compare == numeric
    // compare; md5 is the house cross-engine RNG) — so both engines
    // replay identical draws. Replicate means are exact-int sums with
    // ONE final divide; the 95% CI is order-statistic selection (rank
    // 3 / rank 98 of 100 sorted replicate means).
    "q142_bootstrap_ci" -> ((s, d) => {
      import s.implicits._
      val cust = Tables.load(s, d, "orders")
        .groupBy($"o_custkey")
        .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
      val reps = cust
        .select($"o_custkey", $"cents",
          explode(sequence(lit(1), lit(100))).as("rep"))
        .withColumn("h", substring(
          md5(concat($"o_custkey".cast("string"), lit(":"),
            $"rep".cast("string"))), 1, 8))
        .withColumn("w",
          when($"h" < "5e2d58d8", 0L)
            .when($"h" < "bc5ab1b1", 1L)
            .when($"h" < "eb715e1d", 2L)
            .when($"h" < "fb239797", 3L)
            .when($"h" < "ff1025f5", 4L)
            .otherwise(5L))
        .groupBy($"rep")
        .agg(sum($"w").as("n_eff"), sum($"w" * $"cents").as("sum_eff"))
        .select(($"sum_eff".cast("double") / $"n_eff".cast("double"))
          .as("mean_r"))
      val point = cust.agg(count(lit(1)).as("n"),
        sum($"cents").as("tot"))
      reps.agg(sort_array(collect_list($"mean_r")).as("ms"))
        .crossJoin(broadcast(point))
        .select(lit(100L).as("n_reps"), $"n",
          Tables.nz(round($"tot".cast("double") / $"n".cast("double"),
            4)).as("mean_cents"),
          Tables.nz(round(expr("element_at(ms, 3)"), 4)).as("ci_lo"),
          Tables.nz(round(expr("element_at(ms, 98)"), 4)).as("ci_hi"))
    }),

    // As-of NEAREST join: each purchase matched to its nearest view
    // by the same user in EITHER time direction (tie → the earlier
    // view) — completing the as-of family (q69 backward, q70
    // forward). One per-user exchange+sort serves both directions:
    // last(view ts, ignoreNulls) over the preceding frame and
    // first(...) over the following frame on the SAME window spec, so
    // Spark plans a single sort. Micros stay integer end to end.
    "q145_asof_nearest" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.load(s, d, "events")
        .filter($"event_type".isin("purchase", "view"))
        .select($"event_id", $"user_id", $"event_type",
          unix_micros($"ts").as("t"))
      val w = Window.partitionBy($"user_id").orderBy($"t", $"event_id")
      val vt = when($"event_type" === "view", $"t")
      val marked = ev
        .withColumn("prev_v", last(vt, ignoreNulls = true).over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .withColumn("next_v", first(vt, ignoreNulls = true).over(
          w.rowsBetween(Window.currentRow, Window.unboundedFollowing)))
      marked.filter($"event_type" === "purchase" &&
          ($"prev_v".isNotNull || $"next_v".isNotNull))
        .withColumn("nearest",
          when($"prev_v".isNull, $"next_v")
            .when($"next_v".isNull, $"prev_v")
            .when($"t" - $"prev_v" <= $"next_v" - $"t", $"prev_v")
            .otherwise($"next_v"))
        .select($"event_id", $"user_id", $"t".as("purchase_us"),
          $"nearest".as("view_us"),
          ($"nearest" - $"t").as("diff_us"),
          when($"nearest" <= $"t", "before").otherwise("after")
            .as("side"))
        .orderBy($"event_id")
    }),

    // Cohort retention triangle: customers cohorted by first-order
    // month, activity tracked by month offset 0..12 — the classic
    // layout every retention dashboard draws, and the longitudinal
    // base under q133's two-period migration matrix. Month math is
    // exact integers ((Δyear)·12 + Δmonth on date_trunc'd months);
    // rates are integer milli against the offset-0 cohort size (which
    // equals the cohort's distinct-customer count by construction).
    // Scale: one (custkey → first month) aggregate, one distinct
    // (custkey, month) rollup, one broadcast-sized cohort-size join.
    "q146_retention_triangle" -> ((s, d) => {
      import s.implicits._
      val o = Tables.load(s, d, "orders")
        .select($"o_custkey",
          date_trunc("month", $"o_orderdate").as("m"))
      val first = o.groupBy($"o_custkey").agg(min($"m").as("cm"))
      val activity = o.distinct()
        .join(first, Seq("o_custkey"))
        .withColumn("offset",
          ((year($"m") - year($"cm")) * 12 +
            (month($"m") - month($"cm"))).cast("long"))
        .filter($"offset" <= 12)
      // counts feeds BOTH the report and the offset-0 size lookup —
      // without the persist the whole orders scan + first-month agg
      // runs twice (plan audit, round 10). The frame is
      // cohort×offset-sized: a safe cache at any corpus scale.
      val counts = activity.groupBy($"cm", $"offset")
        .agg(countDistinct($"o_custkey").as("n_active"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val size0 = counts.filter($"offset" === 0)
        .select($"cm", $"n_active".as("cohort_n"))
      counts.join(broadcast(size0), Seq("cm"))
        .select(date_format($"cm", "yyyy-MM").as("cohort_month"),
          $"offset", $"n_active", $"cohort_n",
          expr("n_active * 1000 div cohort_n").as("retention_milli"))
        .orderBy($"cohort_month", $"offset")
    }),

    // Code-likeness detector over the document corpus — the
    // text-quality gate LLM pipelines run to ROUTE code into its own
    // mixture bucket (or out of a prose-only corpus). Features are
    // pure character frequencies (brace/semicolon/equals density per
    // 1000 chars) computed with the length-of-replace trick — exact
    // integers, no regex engine in the loop, identical on any engine;
    // the threshold is a declared constant. Rides the scan projection
    // (one pass, no shuffle before the per-doc row).
    "text_code_detect" -> ((s, d) => {
      import s.implicits._
      def cnt(ch: String): Column =
        (length($"text") - length(regexp_replace($"text",
          java.util.regex.Pattern.quote(ch), ""))).cast("long")
      Tables.load(s, d, "documents")
        .select($"doc_id", $"n_chars",
          (cnt("{") + cnt("}")).as("n_braces"),
          cnt(";").as("n_semis"),
          cnt("=").as("n_eqs"))
        .withColumn("score_milli", expr(
          "(n_braces + n_semis + n_eqs) * 1000 div n_chars"))
        .withColumn("is_code",
          when($"score_milli" >= 15, 1L).otherwise(0L))
        .orderBy($"doc_id")
    }),

    // Temperature-mixture GRID: pipeline_temperature_mix swept over
    // τ ∈ {0, 0.3, 0.5, 0.7, 1.0} — the table a mixture tuning run
    // actually reads (τ=1 is proportional sampling, τ=0 uniform; the
    // elbow between them is a data-dependent choice someone has to
    // SEE). Per-τ normalization reuses the sorted-fold discipline
    // (both engines accumulate the identical IEEE sequence over the
    // lang-sorted list); the grid is taus × langs — constant-sized,
    // broadcast-joined onto the one corpus-scale token count.
    "pipeline_mixture_grid" -> ((s, d) => {
      import s.implicits._
      val langs = Tables.spread(Tables.load(s, d, "documents"))
        .select($"lang",
          size(split($"text", "\\s+")).cast("long").as("n_tok"))
        .groupBy($"lang").agg(sum($"n_tok").as("n_tokens"))
      val tot = langs.agg(sum($"n_tokens").as("tot"))
      val taus = Seq(0L, 300L, 500L, 700L, 1000L)
      val withP = langs.crossJoin(broadcast(tot))
        .crossJoin(broadcast(
          s.range(1).select(explode(
            array(taus.map(lit): _*)).as("tau_milli"))))
        .select($"tau_milli", $"lang", $"n_tokens",
          ($"n_tokens".cast("double") / $"tot".cast("double")).as("p"))
        .withColumn("pa",
          pow($"p", $"tau_milli".cast("double") / lit(1000.0)))
      withP
        .groupBy($"tau_milli")
        .agg(sort_array(collect_list(struct($"lang", $"n_tokens",
          $"p", $"pa"))).as("arr"))
        .select($"tau_milli", explode($"arr").as("r"),
          expr("""aggregate(arr, CAST(0.0 AS DOUBLE),
            (a, x) -> a + x.pa)""").as("sum_pa"))
        .select($"tau_milli", $"r.lang".as("lang"),
          $"r.n_tokens".as("n_tokens"),
          Tables.nz(round($"r.p", 6)).as("p"),
          Tables.nz(round($"r.pa" / $"sum_pa", 6)).as("w"))
        .orderBy($"tau_milli", $"lang")
    }),

    // Running top-k leaderboard: the top-3 parts by CUMULATIVE
    // revenue as of each month — "who was winning when", the
    // longitudinal twin of q7's static top-k. A part with no sales in
    // a month must still hold its cumulative rank, so the part×month
    // grid densifies against the month spine (q104's gap-fill
    // pattern) BEFORE the running sum; both windows ride the
    // dimension-scale rollup (parts × ~span-months), never the fact
    // table, and the corpus-sized pass is one map-side-combined
    // (part, month) rollup.
    "q147_running_topk" -> ((s, d) => {
      import s.implicits._
      // discounted revenue in exact 1e-4-dollar units (the q1/q3
      // integer idiom: cents × (100 − disc%) — no double product
      // near a rounding boundary)
      val rev = Tables.load(s, d, "lineitem")
        .select($"l_partkey".as("pk"),
          date_trunc("month", $"l_shipdate").as("m"),
          (round($"l_extendedprice" * 100).cast("long") *
            (lit(100L) - round($"l_discount" * 100).cast("long")))
            .as("e4"))
        .groupBy($"pk", $"m").agg(sum($"e4").as("rev"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // eager fill (r20, the kmv discipline): months/parts/grid are
      // three concurrent leaf consumers — unfilled they raced to run
      // the fact-scale lineitem rollup up to three times
      rev.count()
      val months = rev.select($"m").distinct()
      val parts = rev.select($"pk").distinct()
      val grid = parts.crossJoin(months)
        .join(rev, Seq("pk", "m"), "left")
        .select($"pk", $"m", coalesce($"rev", lit(0L)).as("rev"))
      val wc = Window.partitionBy($"pk").orderBy($"m")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wr = Window.partitionBy($"m")
        .orderBy($"cum".desc, $"pk")
      grid.withColumn("cum", sum($"rev").over(wc))
        .withColumn("rank", row_number().over(wr).cast("long"))
        .filter($"rank" <= 3 && $"cum" > 0)
        .select(date_format($"m", "yyyy-MM").as("month"), $"rank",
          $"pk".as("partkey"), $"cum".as("cum_revenue_e4"))
        .orderBy($"month", $"rank")
    }),

    // Schema/feed drift monitor: total-variation distance between the
    // categorical value distributions of the first and second half of
    // the order stream (split at the span midpoint) — "did the feed
    // change shape between ingest epochs", the relational twin of
    // emb_drift/text_divergence. TVD stays EXACT integer end to end:
    // with per-half counts c1, c2 and totals n1, n2,
    // TVD_milli = Σ|c1·n2 − c2·n1|·1000 / (2·n1·n2) — one common
    // denominator, no float sums. Per-column rollups are category-
    // bounded; the union of three audited columns is a constant-width
    // report.
    "q148_schema_drift" -> ((s, d) => {
      import s.implicits._
      val o = Tables.load(s, d, "orders")
      val mid = o.agg(((min(unix_micros($"o_orderdate")) +
          max(unix_micros($"o_orderdate"))) / 2).as("mid"))
      val halved = o.crossJoin(broadcast(mid))
        .withColumn("half",
          when(unix_micros($"o_orderdate") < $"mid", 1L).otherwise(2L))
        .select($"half",
          $"o_orderstatus".as("c_status"),
          $"o_orderpriority".as("c_priority"),
          floor($"o_totalprice" / 1000).cast("long").cast("string")
            .as("c_price_bucket"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      def tvd(colName: String, out: String) = {
        val cnt = halved.groupBy(col(colName).as("cat"), $"half")
          .agg(count(lit(1)).as("c"))
          .groupBy($"cat")
          .agg(sum(when($"half" === 1, $"c").otherwise(0L)).as("c1"),
            sum(when($"half" === 2, $"c").otherwise(0L)).as("c2"))
        val tot = cnt.agg(sum($"c1").as("n1"), sum($"c2").as("n2"),
          count(lit(1)).as("n_cats"))
        cnt.crossJoin(broadcast(tot))
          .agg(max($"n1").as("n1"), max($"n2").as("n2"),
            max($"n_cats").as("n_cats"),
            sum(abs($"c1" * $"n2" - $"c2" * $"n1")).as("num"))
          .select(lit(out).as("col_name"), $"n1", $"n2", $"n_cats",
            expr("num * 1000 div (2 * n1 * n2)").as("tvd_milli"))
      }
      tvd("c_status", "o_orderstatus")
        .unionAll(tvd("c_priority", "o_orderpriority"))
        .unionAll(tvd("c_price_bucket", "price_bucket_1k"))
        .orderBy($"col_name")
    }),

    // Flesch reading-ease per language (corpus means of the per-doc
    // score) — the readability gate a curation pipeline runs next to
    // text_quality. Sentence and "syllable" counts are engine-exact:
    // sentences = terminal-punctuation occurrences via the
    // length-of-replace trick (floor 1), syllables ≈ vowel GROUPS
    // (collapse [aeiou]+ to one marker, count markers) — the standard
    // proxy, and a pure regexp both engines evaluate identically.
    // Per-doc scores quantize to exact milli and aggregate as longs
    // (no float-sum shuffle); one final divide per language.
    "text_readability" -> ((s, d) => {
      import s.implicits._
      def occurrences(c: Column, ch: String): Column =
        (length(c) - length(regexp_replace(c,
          java.util.regex.Pattern.quote(ch), ""))).cast("long")
      val t = lower($"text")
      val scored = Tables.spread(Tables.load(s, d, "documents"))
        .select($"doc_id", $"lang",
          size(split(t, "\\s+")).cast("long").as("w"),
          greatest(occurrences($"text", ".") +
            occurrences($"text", "!") +
            occurrences($"text", "?"), lit(1L)).as("sent"),
          occurrences(
            regexp_replace(t, "[aeiou]+", "V"), "V").as("syl"))
        .withColumn("flesch_milli",
          floor((lit(206.835) -
            lit(1.015) * ($"w".cast("double") / $"sent".cast("double")) -
            lit(84.6) * ($"syl".cast("double") / $"w".cast("double")))
            * 1000).cast("long"))
      scored.groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), sum($"w").as("n_words"),
          sum($"sent").as("n_sentences"), sum($"syl").as("n_syllables"),
          sum($"flesch_milli").as("sum_flesch"))
        .select($"lang", $"n_docs", $"n_words", $"n_sentences",
          $"n_syllables",
          expr("sum_flesch div n_docs").as("mean_flesch_milli"))
        .orderBy($"lang")
    }),

    // Weighted sampling WITHOUT replacement (Efraimidis–Spirakis
    // A-Res): key = u^(1/w) with u deterministic per doc (md5 — the
    // house cross-engine RNG, parsed to a 32-bit uniform via an
    // exact hex fold), keep the top-k keys — the distributed-standard
    // way to draw a length-weighted sample in ONE pass with a
    // top-k reduce (no global sort, no rejection loop). Selection
    // compares raw doubles computed identically on both engines;
    // the reported key is display-rounded only.
    "pipeline_weighted_sample" -> ((s, d) => {
      import s.implicits._
      val u = expr(
        """(aggregate(sequence(1, 8), CAST(0 AS BIGINT),
             (acc, i) -> acc * 16 +
               (instr('0123456789abcdef',
                  substring(md5(concat('ws42:', CAST(doc_id AS STRING))),
                    i, 1)) - 1)) + 1)""")
        .cast("double") / lit(4294967297.0)
      // orderBy+limit FIRST (TakeOrderedAndProject — per-partition
      // top-k, no global sort); the rank window then runs on the
      // 50-row result, not the corpus (plan audit, round 10)
      val keyed = Tables.load(s, d, "documents")
        .select($"doc_id", $"n_chars",
          pow(u, lit(1.0) / $"n_chars".cast("double")).as("key"))
        .orderBy($"key".desc, $"doc_id")
        .limit(50)
      val w = Window.orderBy($"key".desc, $"doc_id")
      keyed.withColumn("rank", row_number().over(w).cast("long"))
        .select($"rank", $"doc_id", $"n_chars",
          Tables.nz(round($"key", 6)).as("sample_key"))
        .orderBy($"rank")
    }),

    // Dataset version diff: the snapshot vs its CDC-applied successor
    // (pipeline_cdc_apply's output), reconciled per language — the
    // release-notes table a corpus refresh publishes (how many docs
    // appeared / vanished / changed content between training-set
    // versions). A FULL OUTER join on doc_id classifies every key;
    // "changed" compares content digests, so the diff never ships
    // text through the shuffle — ids, langs, and two md5s only.
    "pipeline_dataset_diff" -> ((s, d) => {
      import s.implicits._
      val before = Tables.load(s, d, "documents")
        .select($"doc_id", $"lang".as("lang_b"),
          md5($"text").as("dig_b"))
      val after = Pipeline.queries("pipeline_cdc_apply")(s, d)
        .select($"doc_id", $"lang".as("lang_a"),
          $"digest".as("dig_a"))
      before.join(after, Seq("doc_id"), "full_outer")
        .select(coalesce($"lang_b", $"lang_a").as("lang"),
          when($"dig_b".isNull, "added")
            .when($"dig_a".isNull, "removed")
            .when($"dig_a" =!= $"dig_b", "changed")
            .otherwise("same").as("status"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_keys"),
          sum(when($"status" === "added", 1L).otherwise(0L))
            .as("n_added"),
          sum(when($"status" === "removed", 1L).otherwise(0L))
            .as("n_removed"),
          sum(when($"status" === "changed", 1L).otherwise(0L))
            .as("n_changed"),
          sum(when($"status" === "same", 1L).otherwise(0L))
            .as("n_same"))
        .orderBy($"lang")
    }),

    // Seasonally-adjusted anomaly days: |residual| > 3σ over q127's
    // decomposition — q33's z-test moved PAST trend and weekday
    // seasonality, so a busy-Monday spike no longer pages anyone but
    // a genuinely off-pattern day does. The comparison is the q33
    // cross-multiplied EXACT integer form ((n·r − Σr)² > 4·(n·Σr² −
    // (Σr)²), 2σ — the decomposition already absorbs trend and
    // weekday structure, so the residual band is tight and 2σ is the
    // operating point that actually fires on well-behaved series) — no float threshold to flip cross-engine; per-type
    // moments broadcast back onto the domain-bounded component table.
    "q154_seasonal_anomaly_days" -> ((s, d) => {
      import s.implicits._
      val comp = Insights.queries("q127_seasonal_decompose")(s, d)
        .select($"event_type", $"day", $"cents", $"residual".as("r"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val m = comp.groupBy($"event_type")
        .agg(count(lit(1)).as("n"), sum($"r").as("sr"),
          sum($"r" * $"r").as("srr"))
      comp.join(broadcast(m), Seq("event_type"))
        .filter(($"n" * $"r" - $"sr") * ($"n" * $"r" - $"sr") >
          lit(4L) * ($"n" * $"srr" - $"sr" * $"sr"))
        .select($"event_type",
          date_format($"day", "yyyy-MM-dd").as("day"),
          $"cents", $"r".as("residual"),
          when($"n" * $"r" - $"sr" > 0, 1L).otherwise(-1L).as("side"))
        .orderBy($"event_type", $"day")
    }),

    // Language-ID confusion matrix + per-label recall — the accuracy
    // certification for text_langid's stopword classifier against the
    // corpus labels (an eval table, the text twin of ann_recall_eval:
    // never ship a classifier whose confusion you haven't looked at).
    // Pure composition of the oracle-exact langid output; label-pair-
    // bounded rollup, exact milli recall against the label total.
    "text_lang_confusion" -> ((s, d) => {
      import s.implicits._
      val pred = graft.text.TextAnalysis.queries("text_langid")(s, d)
        .select($"labeled_lang", $"predicted_lang")
      val cells = pred.groupBy($"labeled_lang", $"predicted_lang")
        .agg(count(lit(1)).as("n"))
      val totals = cells.groupBy($"labeled_lang")
        .agg(sum($"n").as("n_label"))
      cells.join(broadcast(totals), Seq("labeled_lang"))
        .select($"labeled_lang", $"predicted_lang", $"n", $"n_label",
          expr("n * 1000 div n_label").as("share_milli"))
        .orderBy($"labeled_lang", $"predicted_lang")
    }),

    // Packing-efficiency policy table: for each candidate context
    // length, how many chunks the corpus tiles into and how much of
    // the chunk budget is PADDING — the table that picks the context
    // length / packing strategy before a pipeline_pack run commits
    // (padding is pure wasted compute at training time). Exact
    // integers end to end: ceil-div chunk counts, chunk·ctx − tokens
    // padding, milli waste against the chunk budget; the 4-row ctx
    // grid broadcasts over one token-count scan.
    "pipeline_pack_efficiency" -> ((s, d) => {
      import s.implicits._
      val toks = Tables.spread(Tables.load(s, d, "documents"))
        .select(size(split($"text", "\\s+")).cast("long").as("tok"))
      val ctxs = s.range(1).select(explode(array(
        lit(256L), lit(512L), lit(1024L), lit(2048L))).as("ctx"))
      toks.crossJoin(broadcast(ctxs))
        .select($"ctx", $"tok",
          expr("(tok + ctx - 1) div ctx").as("chunks"))
        .groupBy($"ctx")
        .agg(count(lit(1)).as("n_docs"), sum($"tok").as("n_tokens"),
          sum($"chunks").as("n_chunks"),
          sum($"chunks" * $"ctx" - $"tok").as("n_padding"))
        .select($"ctx", $"n_docs", $"n_tokens", $"n_chunks",
          $"n_padding",
          expr("n_padding * 1000 div (n_chunks * ctx)")
            .as("waste_milli"))
        .orderBy($"ctx")
    }),

    // Shipping-SLA attainment per order priority: the fraction of
    // line items shipped within 30/60/90 days of the order date —
    // the operational twin of q44's billing views (is URGENT actually
    // faster). Fact-to-fact equi-join on orderkey (never broadcast —
    // the q81 discipline), exact day diffs, three conditional counts,
    // milli rates; output is priority-bounded.
    "q153_shipping_sla" -> ((s, d) => {
      import s.implicits._
      val li = Tables.load(s, d, "lineitem")
        .select($"l_orderkey", to_date($"l_shipdate").as("sd"))
      val o = Tables.load(s, d, "orders")
        .select($"o_orderkey", $"o_orderpriority",
          to_date($"o_orderdate").as("od"))
      li.join(o, $"l_orderkey" === $"o_orderkey")
        .select($"o_orderpriority", datediff($"sd", $"od").as("lag"))
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_items"),
          sum(when($"lag" <= 30, 1L).otherwise(0L)).as("w30"),
          sum(when($"lag" <= 60, 1L).otherwise(0L)).as("w60"),
          sum(when($"lag" <= 90, 1L).otherwise(0L)).as("w90"))
        .select($"o_orderpriority", $"n_items",
          expr("w30 * 1000 div n_items").as("within_30d_milli"),
          expr("w60 * 1000 div n_items").as("within_60d_milli"),
          expr("w90 * 1000 div n_items").as("within_90d_milli"))
        .orderBy($"o_orderpriority")
    }),

    // Per-shot frame-sampling budget: what switching mm_frame_sample
    // from uniform stride-8 to 4-frames-per-shot (over mm_scene_cut's
    // boundaries) costs or saves in decode budget per asset — the
    // table that justifies running the scene detector at all. Pure
    // composition of the oracle-exact scene-cut output; all integer.
    "mm_shot_budget" -> ((s, d) => {
      import s.implicits._
      graft.multimodal.Multimodal.queries("mm_scene_cut")(s, d)
        .select($"doc_id", $"n_frames",
          expr("n_frames div 8").as("uniform_frames"),
          least(($"n_cuts" + 1L) * 4L, $"n_frames").as("shot_frames"))
        .withColumn("delta_frames",
          $"shot_frames" - $"uniform_frames")
        .orderBy($"doc_id")
    }),

    // Seasonal/trend STRENGTH (Hyndman's F_s/F_t) per event type —
    // one number each for "how seasonal / how trended is this
    // metric", computed from q127's exact-integer decomposition
    // components: F_s = max(0, 1 − Var(resid)/Var(v − trend)),
    // F_t = max(0, 1 − Var(resid)/Var(v − seasonal)). Variances stay
    // in the exact n·Σx² − (Σx)² integer form (one IEEE divide per
    // strength at display); the input is the type×day component
    // table, so everything after q127's rollup is domain-bounded.
    "q151_seasonality_strength" -> ((s, d) => {
      import s.implicits._
      val comp = Insights.queries("q127_seasonal_decompose")(s, d)
        .select($"event_type",
          $"residual".as("r"),
          ($"cents" - $"trend").as("dt"),
          ($"cents" - $"seasonal").as("ds"))
      comp.groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          sum($"r").as("sr"), sum($"r" * $"r").as("srr"),
          sum($"dt").as("st"), sum($"dt" * $"dt").as("stt"),
          sum($"ds").as("ss"), sum($"ds" * $"ds").as("sss"))
        .select($"event_type", $"n",
          Tables.nz(round(greatest(lit(0.0),
            lit(1.0) -
              ($"n".cast("double") * $"srr".cast("double") -
                $"sr".cast("double") * $"sr".cast("double")) /
              ($"n".cast("double") * $"stt".cast("double") -
                $"st".cast("double") * $"st".cast("double"))), 4))
            .as("f_seasonal"),
          Tables.nz(round(greatest(lit(0.0),
            lit(1.0) -
              ($"n".cast("double") * $"srr".cast("double") -
                $"sr".cast("double") * $"sr".cast("double")) /
              ($"n".cast("double") * $"sss".cast("double") -
                $"ss".cast("double") * $"ss".cast("double"))), 4))
            .as("f_trend"))
        .orderBy($"event_type")
    }),

    // 13-gram novelty curve: per document (in doc_id ingest order),
    // the fraction of its 13-grams never seen in any EARLIER
    // document — the marginal-novelty signal a continual-crawl
    // curation run reads to decide when a source is exhausted
    // (novelty → 0 means new documents are recombinations). First
    // occurrence is a gram-keyed min(doc_id) — one shuffle of
    // (gram, id) longs on the shared PolyHash basis; novelty is an
    // exact milli ratio.
    "text_ngram_novelty" -> ((s, d) => {
      import s.implicits._
      val grams = Tables.spread(Tables.load(s, d, "documents"))
        .select($"doc_id",
          graft.dedup.Dedup.tokenHashes(
            split(lower($"text"), "\\s+")).as("th"))
        .select($"doc_id", explode(gram13(col("th"))).as("g"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // eager fill (r20): the firstSeen agg and the join probe side
      // are concurrent leaves racing to run the 13-gram hash kernel
      grams.count()
      val firstSeen = grams.groupBy($"g").agg(min($"doc_id").as("fd"))
      grams.join(firstSeen, Seq("g"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when($"fd" === $"doc_id", 1L).otherwise(0L))
            .as("n_novel"))
        .select($"doc_id", $"n_grams", $"n_novel",
          expr("n_novel * 1000 div n_grams").as("novelty_milli"))
        .orderBy($"doc_id")
    }),

    // Duplicated-13-gram share — the C4/RefinedWeb quality signal
    // text_ngram_novelty does NOT measure: novelty is first-seen in
    // INGEST ORDER (source exhaustion), while this is order-free
    // document frequency — what fraction of a doc's distinct 13-grams
    // appear in ≥2 documents (boilerplate / template / near-dup
    // contamination a doc-level dedup misses). Same shared PolyHash
    // gram basis (no n-gram strings exist), one (gram → df) rollup
    // joined back, exact integer milli. Scale: identical shape to
    // novelty (probed −0.20 family); the df table is gram-keyed and
    // map-side combined.
    "text_dup_ngram_share" -> ((s, d) => {
      import s.implicits._
      val grams = Tables.spread(Tables.load(s, d, "documents"))
        .select($"doc_id",
          graft.dedup.Dedup.tokenHashes(
            split(lower($"text"), "\\s+")).as("th"))
        .select($"doc_id", explode(gram13(col("th"))).as("g"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      // eager fill (r20): df agg + join probe side raced (novelty's
      // reasoning — same kernel, same shape)
      grams.count()
      val df = grams.groupBy($"g").agg(count(lit(1)).as("df"))
      grams.join(df, Seq("g"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(when($"df" >= 2L, 1L).otherwise(0L)).as("n_dup"))
        .select($"doc_id", $"n_grams", $"n_dup",
          expr("n_dup * 1000 div n_grams").as("dup_milli"))
        .orderBy($"doc_id")
    }),

    // Lorenz curve deciles of customer spend — the table behind
    // q79's Gini scalar (which 10% of customers carry which share of
    // revenue). Global spend ranks ride PrefixSum's two-pass
    // distributed scan (never a global row_number window); the
    // decile rollup is 10 rows, and cumulative shares are exact
    // integer milli off a 10-row sorted fold.
    "q152_lorenz_deciles" -> ((s, d) => {
      import s.implicits._
      val cust = Tables.load(s, d, "orders")
        .groupBy($"o_custkey")
        .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
      val n = cust.count() // driver scalar (pagerank discipline)
      val ranked = graft.ops.PrefixSum.runningTotal(
        cust.withColumn("one", lit(1L)),
        Seq($"cents", $"o_custkey"), $"one", "rk")
      val dec = ranked
        .withColumn("decile", expr(s"(rk - 1) * 10 div ${n}L + 1"))
        .groupBy($"decile")
        .agg(count(lit(1)).as("n_cust"), sum($"cents").as("spend"))
      dec.agg(sort_array(collect_list(struct($"decile", $"n_cust",
          $"spend"))).as("arr"))
        .select(explode(expr(
          """transform(arr, (x, i) -> struct(
               x.decile AS decile, x.n_cust AS n_cust,
               x.spend AS spend,
               aggregate(slice(arr, 1, i + 1), CAST(0 AS BIGINT),
                 (a, y) -> a + y.spend) AS cum_spend,
               aggregate(arr, CAST(0 AS BIGINT),
                 (a, y) -> a + y.spend) AS total))""")).as("r"))
        .select($"r.decile".as("decile"), $"r.n_cust".as("n_cust"),
          $"r.spend".as("spend_cents"),
          $"r.cum_spend".as("cum_spend_cents"),
          expr("r.cum_spend * 1000 div r.total").as("cum_share_milli"))
        .orderBy($"decile")
    }),

    // Tokenizer fertility per language — BPE tokens per word, THE
    // number that decides whether a tokenizer taxes a language
    // (fertility ≫ 1 for a lang means its documents cost
    // proportionally more context budget; the mixture weights in
    // pipeline_temperature_mix/mixture_grid are wrong if computed in
    // words when training bills in tokens). Pure composition: the
    // oracle-exact bpe_encode per-doc counts joined back to the
    // language column, exact-integer milli ratio per language.
    "pipeline_tokenizer_fertility" -> ((s, d) => {
      import s.implicits._
      val enc = graft.text.Bpe.queries("pipeline_bpe_encode")(s, d)
        .select($"doc_id", $"n_words", $"n_bpe_tokens")
      val langs = Tables.load(s, d, "documents")
        .select($"doc_id", $"lang")
      enc.join(langs, Seq("doc_id"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_words").as("n_words"),
          sum($"n_bpe_tokens").as("n_bpe_tokens"))
        .select($"lang", $"n_docs", $"n_words", $"n_bpe_tokens",
          expr("n_bpe_tokens * 1000 div n_words")
            .as("fertility_milli"))
        .orderBy($"lang")
    }),

    // Price elasticity per part segment: the OLS slope of quantity on
    // discount (does a deeper discount move more units) — cov/var on
    // the exact integer grids (qty in units·100, discount in %), the
    // q43 moment discipline with a regression assembly instead of a
    // correlation one. Segments are the part-key mod-8 buckets (the
    // fixture has no category column); one map-side-combined rollup,
    // one 8-row assembly. Width audit (r11 verdict item #4): unlike
    // q100's data-dependent degree products, x and y are VALUE-
    // domain-bounded (discount ≤ 10 pct-units, quantity ≤ 5000
    // centi-units), so the largest partial Σxy ≤ 5·10⁴·rows — the
    // long ceiling lands at ~1.8e14 lineitem rows ≈ sf 30M, three
    // orders past the 100 TB target. Longs are safe by bound; no
    // escalation wired.
    "q149_price_elasticity" -> ((s, d) => {
      import s.implicits._
      elasticitySlopes(Tables.load(s, d, "lineitem")
        .select(($"l_partkey" % 8).as("segment"),
          round($"l_discount" * 100).cast("long").as("x"),
          round($"l_quantity" * 100).cast("long").as("y")))
    }),

    // Duplicate-invoice detector: order pairs by the SAME customer
    // with the IDENTICAL total landing within 2 days — the classic
    // double-billing / replayed-feed DQ probe on top of q81's
    // row-level audits (which can never see a CROSS-row anomaly).
    // The self-join keys on (custkey, exact cents) — equality keys,
    // so the pair space is bounded by per-(cust, amount) multiplicity
    // (overwhelmingly 1), never a date-range blowup; the ±2-day
    // filter is a residual predicate on the tiny matched set. The
    // audited feed is orders plus a DETERMINISTIC replayed slice
    // (orderkey % 97 == 0 re-submitted next-day under a shifted key)
    // — the fixtures ship a clean feed, so the double-billing event
    // is derived, the pipeline_cdc_apply changelog discipline; the
    // detector must recover exactly that slice.
    "q150_duplicate_invoice" -> ((s, d) => {
      import s.implicits._
      val base = Tables.load(s, d, "orders")
        .select($"o_orderkey", $"o_custkey",
          round($"o_totalprice" * 100).cast("long").as("cents"),
          to_date($"o_orderdate").as("day"))
      val replayed = base.filter($"o_orderkey" % 97 === 0)
        .select(($"o_orderkey" + 1000000000L).as("o_orderkey"),
          $"o_custkey", $"cents", date_add($"day", 1).as("day"))
      val o = base.unionByName(replayed)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val a = o.select($"o_custkey", $"cents",
        $"o_orderkey".as("k1"), $"day".as("d1"))
      val b = o.select($"o_custkey", $"cents",
        $"o_orderkey".as("k2"), $"day".as("d2"))
      a.join(b, Seq("o_custkey", "cents"))
        .filter($"k1" < $"k2" &&
          abs(datediff($"d2", $"d1")) <= 2)
        .select($"o_custkey", $"cents", $"k1", $"k2",
          datediff($"d2", $"d1").cast("long").as("gap_days"))
        .orderBy($"o_custkey", $"k1", $"k2")
    }),

    // 2-hop reach per node (friend-of-friend audience size) on the
    // part co-occurrence graph — the influence-radius read the
    // centrality family (q62/q138) ranks but never SIZES. Exact
    // distinct |N≤2(v)|, with the house wedge-cap discipline
    // (q108/q72): paths THROUGH a hub of degree > 64 are excluded
    // and the cap is part of the declared semantics — at 100 TB an
    // uncapped Σdeg² wedge enumeration is the canonical graph
    // scale-killer, and hub-mediated reach saturates to "everyone"
    // anyway (it carries no ranking information). 1-hop edges are
    // never capped. Shuffles: the wedge join on the center key, one
    // distinct, one count — all (long, long) rows.
    "q143_2hop_reach" -> ((s, d) => {
      import s.implicits._
      val e = Graph.coOccurrencePairCounts(s, d).select($"a", $"b")
        .persist(StorageLevel.MEMORY_AND_DISK)
      val sym = e.select(explode(array(
          struct($"a".as("src"), $"b".as("dst")),
          struct($"b".as("src"), $"a".as("dst")))).as("x"))
        .select($"x.src", $"x.dst")
        .persist(StorageLevel.MEMORY_AND_DISK)
      val ctr = sym.groupBy($"src").agg(count(lit(1)).as("dc"))
        .filter($"dc" <= 64).select($"src")
      val twoHop = sym.join(ctr, Seq("src"))
        .select($"src".as("mid"), $"dst".as("v"))
        .join(sym.select($"src".as("mid"), $"dst".as("w")), Seq("mid"))
        .filter($"v" =!= $"w")
        .select($"v", $"w")
      // orderBy+limit first (TakeOrderedAndProject), rank window on
      // the 100-row result only — the reach table is node-sized and
      // a global-rank window over it would single-task the sort
      val reach = sym.select($"src".as("v"), $"dst".as("w"))
        .unionAll(twoHop)
        .distinct()
        .groupBy($"v").agg(count(lit(1)).as("reach"))
        .orderBy($"reach".desc, $"v")
        .limit(100)
      val w = Window.orderBy($"reach".desc, $"v")
      reach.withColumn("rank", row_number().over(w).cast("long"))
        .select($"rank", $"v".as("node"), $"reach")
        .orderBy($"rank")
    }),

    // Adamic–Adar link prediction — q108's common-neighbor ranking
    // with the weight every practitioner actually uses (rare shared
    // neighbors count more: Σ_z 1/ln(deg z)). The per-center weight
    // quantizes to floor(1e6/ln(deg)) BEFORE the wedge explode, so
    // the score is an EXACT integer sum (no float-sum shuffle — the
    // emb_isotropy discipline); same wedge cap and non-edge anti-join
    // as q108.
    "q144_adamic_adar" -> ((s, d) => {
      import s.implicits._
      val e = Graph.coOccurrencePairCounts(s, d).select($"a", $"b")
        .persist(StorageLevel.MEMORY_AND_DISK)
      val sym = e.select(explode(array(
          struct($"a".as("src"), $"b".as("dst")),
          struct($"b".as("src"), $"a".as("dst")))).as("x"))
        .select($"x.src", $"x.dst")
      // degree cap BEFORE the neighbor collect (r11 CollectGuard
      // discipline, same as q108): sym has no duplicate (src,dst),
      // so the degree pre-join equals the old post-collect size
      // filter and the buffer is ≤ 64 rows by construction
      val deg = sym.groupBy($"src").agg(count(lit(1)).as("dc"))
      val wedges = sym
        .join(deg.filter($"dc" >= 2 && $"dc" <= 64).select($"src"),
          Seq("src"))
        .groupBy($"src")
        .agg(sort_array(collect_set($"dst")).as("ns"))
        .withColumn("wq",
          floor(lit(1000000.0) / log(size($"ns").cast("double")))
            .cast("long"))
        .select(explode(expr(
          """flatten(transform(ns, (x, i) ->
             transform(slice(ns, i + 2, size(ns)),
               y -> struct(x AS a, y AS b))))""")).as("w"), $"wq")
        .groupBy($"w.a".as("a"), $"w.b".as("b"))
        .agg(count(lit(1)).as("cn"), sum($"wq").as("aa_micro"))
      wedges.join(e, Seq("a", "b"), "left_anti")
        .select($"a", $"b", $"cn", $"aa_micro",
          Tables.nz(round($"aa_micro".cast("double") / 1e6, 4))
            .as("aa_score"))
        .orderBy(desc("aa_score"), $"a", $"b").limit(50)
    }),

    // 13-gram decontamination audit — the GPT-3-style n-gram overlap
    // check between the training corpus and a held-out eval set
    // (Brown et al. 2020 appendix C): a training document sharing ANY
    // 13-gram with an eval document is flagged, with the hit count as
    // severity. The eval set here is the deterministic doc_id % 50
    // slice (the fixtures ship no second corpus — same derivation
    // discipline as pipeline_cdc_apply's changelog). 13-gram HASHES
    // ride the dedup family's PolyHash token basis (two seeded 13-term
    // folds, packed) — no 13-gram strings exist anywhere; the eval
    // gram set is distinct-small by construction (eval sets are tiny
    // at any corpus scale) and broadcasts onto the train-side explode.
    "pipeline_contamination_ngram" -> ((s, d) => {
      import s.implicits._
      val grams = Tables.spread(Tables.load(s, d, "documents"))
        .select($"doc_id",
          graft.dedup.Dedup.tokenHashes(
            split(lower($"text"), "\\s+")).as("th"))
        .select($"doc_id", explode(gram13(col("th"))).as("g"))
      val evalGrams = grams.filter($"doc_id" % 50 === 0)
        .select($"g").distinct()
      val train = grams.filter($"doc_id" % 50 =!= 0)
      train
        .join(broadcast(evalGrams.withColumn("hit", lit(1L))),
          Seq("g"), "left")
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_grams"),
          sum(coalesce($"hit", lit(0L))).as("n_hits"))
        .filter($"n_hits" > 0)
        .select($"doc_id", $"n_grams", $"n_hits")
        .orderBy($"doc_id")
    }),

    // Embedding isotropy probe: mean (signed and absolute) cosine
    // over the deterministic consecutive-id pair chain — a collapsed
    // (anisotropic) embedding space shows mean |cos| ≫ 0 while a
    // healthy one sits near 0 (Ethayarajh 2019's observation, reduced
    // to a one-pass health number next to emb_effective_dim). The
    // pair chain is a SELF-JOIN on vec_id+1 (co-partitioned hash
    // join — never a global-sort window); per-pair cosines quantize
    // to the 1e-9 grid and sum EXACTLY as longs (map-side combined),
    // so the mean is one final divide — no float-sum shuffle.
    "emb_isotropy" -> ((s, d) => {
      import s.implicits._
      val e = Tables.spread(Tables.load(s, d, "embeddings"))
        .select($"vec_id", $"embedding")
      val nxt = e.select(($"vec_id" - 1).as("vec_id"),
        $"embedding".as("emb_b"))
      e.join(nxt, Seq("vec_id"))
        .select(floor(graft.dedup.Dedup.cosine($"embedding", $"emb_b")
          * 1e9).cast("long").as("q"))
        .agg(count(lit(1)).as("n_pairs"), sum($"q").as("sq"),
          sum(abs($"q")).as("saq"), max(abs($"q")).as("mx"))
        .select($"n_pairs",
          Tables.nz(round($"sq".cast("double") / 1e9 /
            $"n_pairs".cast("double"), 6)).as("mean_cos"),
          Tables.nz(round($"saq".cast("double") / 1e9 /
            $"n_pairs".cast("double"), 6)).as("mean_abs_cos"),
          Tables.nz(round($"mx".cast("double") / 1e9, 6))
            .as("max_abs_cos"))
    }))

  /** Distinct 13-gram hashes from a materialized token-hash array —
    * the [[graft.dedup.Dedup.hashedShingles]] combine widened to 13
    * terms (two seeded polynomial folds mod M, packed s1·M + s2).
    * Docs under 13 tokens have no 13-grams.
    */
  private def gram13(th: Column): Column = {
    val M = graft.functions.PolyHash.M
    def fold(b: Long): String =
      (0 until 13).foldLeft("7") { (acc, k) =>
        s"(($acc * $b + element_at(th, CAST(i + $k AS INT))) % $M)"
      }
    when(size(th) >= 13,
      array_distinct(expr(
        s"""transform(sequence(1, size(th) - 12),
            i -> ${fold(graft.functions.PolyHash.B1)} * $M +
                 ${fold(graft.functions.PolyHash.B2)})""")))
      .otherwise(array().cast("array<bigint>"))
  }

  /** SQL twin of [[gram13]] over a `tokl(doc_id, th)` CTE. */
  private def gram13Sql: String = {
    val M = graft.functions.PolyHash.M
    def fold(b: Long): String =
      (0 until 13).foldLeft("CAST(7 AS BIGINT)") { (acc, k) =>
        s"(($acc * $b + th[i + $k]) % $M)"
      }
    s"""CASE WHEN len(th) >= 13 THEN
         list_distinct(list_transform(range(1, len(th) - 11),
           i -> ${fold(graft.functions.PolyHash.B1)} * $M +
                ${fold(graft.functions.PolyHash.B2)}))
       ELSE CAST([] AS BIGINT[]) END"""
  }

  /** q149's per-segment OLS rollup, factored so MomentWidthSpec can
    * pin the documented width bound. Input: one row per observation
    * with long columns (segment, x, y). Moments stay EXACT longs —
    * no escalation wired, by VALUE-domain bound (r11 verdict item
    * #4): x ≤ 10 pct-units and y ≤ 5000 centi-units in production,
    * so the largest partial Σxy ≤ 5·10⁴·rows and the long ceiling
    * lands at ~1.8e14 lineitem rows ≈ sf 30M, three orders past the
    * 100 TB target. Past the ceiling the ANSI sum fails LOUD
    * (spec-pinned), never wraps silently.
    */
  private[queries] def elasticitySlopes(t: DataFrame): DataFrame = {
    val s = t.sparkSession
    import s.implicits._
    t.groupBy($"segment")
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"),
        sum($"y").as("sy"), sum($"x" * $"x").as("sxx"),
        sum($"x" * $"y").as("sxy"))
      .select($"segment", $"n",
        Tables.nz(round(
          ($"n".cast("double") * $"sxy".cast("double") -
            $"sx".cast("double") * $"sy".cast("double")) /
          ($"n".cast("double") * $"sxx".cast("double") -
            $"sx".cast("double") * $"sx".cast("double")), 6))
          .as("slope_centi_units_per_pct"))
      .orderBy($"segment")
  }

  def oracles: Map[String, String] = Map(

    "q147_running_topk" ->
      """WITH rev AS (
           SELECT l_partkey AS pk,
             date_trunc('month', l_shipdate) AS m,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
               (100 - CAST(round(l_discount * 100) AS BIGINT)))
               AS BIGINT) AS rev
           FROM lineitem GROUP BY 1, 2),
         months AS (SELECT DISTINCT m FROM rev),
         parts AS (SELECT DISTINCT pk FROM rev),
         grid AS (
           SELECT p.pk, mo.m, coalesce(r.rev, 0) AS rev
           FROM parts p CROSS JOIN months mo
           LEFT JOIN rev r ON r.pk = p.pk AND r.m = mo.m),
         cum AS (
           SELECT pk, m,
             CAST(sum(rev) OVER (PARTITION BY pk ORDER BY m
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum
           FROM grid),
         rk AS (
           SELECT m, pk, cum,
             CAST(row_number() OVER (PARTITION BY m
               ORDER BY cum DESC, pk) AS BIGINT) AS rank
           FROM cum)
         SELECT strftime(m, '%Y-%m') AS month, rank, pk AS partkey,
           cum AS cum_revenue_e4
         FROM rk WHERE rank <= 3 AND cum > 0
         ORDER BY month, rank""",

    "q148_schema_drift" -> {
      def tvd(sel: String, out: String): String =
        s"""(WITH cnt AS (
             SELECT $sel AS cat,
               CAST(sum(CASE WHEN half = 1 THEN 1 ELSE 0 END)
                 AS BIGINT) AS c1,
               CAST(sum(CASE WHEN half = 2 THEN 1 ELSE 0 END)
                 AS BIGINT) AS c2
             FROM halved GROUP BY 1),
           tot AS (
             SELECT CAST(sum(c1) AS BIGINT) AS n1,
               CAST(sum(c2) AS BIGINT) AS n2,
               CAST(count(*) AS BIGINT) AS n_cats
             FROM cnt)
           SELECT '$out' AS col_name, tot.n1, tot.n2, tot.n_cats,
             CAST(CAST(sum(abs(c1 * tot.n2 - c2 * tot.n1)) AS BIGINT)
               * 1000 // (2 * tot.n1 * tot.n2) AS BIGINT) AS tvd_milli
           FROM cnt, tot GROUP BY tot.n1, tot.n2, tot.n_cats)"""
      s"""WITH mid AS (
           SELECT (min(epoch_us(o_orderdate)) +
             max(epoch_us(o_orderdate))) // 2 AS mid
           FROM orders),
         halved AS (
           SELECT CASE WHEN epoch_us(o_orderdate) < mid THEN 1
                       ELSE 2 END AS half,
             o_orderstatus AS c_status,
             o_orderpriority AS c_priority,
             CAST(CAST(floor(o_totalprice / 1000) AS BIGINT)
               AS VARCHAR) AS c_price_bucket
           FROM orders, mid)
         SELECT * FROM (
           ${tvd("c_status", "o_orderstatus")}
           UNION ALL ${tvd("c_priority", "o_orderpriority")}
           UNION ALL ${tvd("c_price_bucket", "price_bucket_1k")})
         ORDER BY col_name"""
    },

    "text_readability" ->
      """WITH f AS (
           SELECT doc_id, lang,
             CAST(len(string_split_regex(lower(text), '\s+'))
               AS BIGINT) AS w,
             greatest(
               CAST(length(text) - length(replace(text, '.', ''))
                 + length(text) - length(replace(text, '!', ''))
                 + length(text) - length(replace(text, '?', ''))
                 AS BIGINT), 1) AS sent,
             CAST(length(regexp_replace(lower(text), '[aeiou]+', 'V',
                 'g')) -
               length(replace(regexp_replace(lower(text), '[aeiou]+',
                 'V', 'g'), 'V', '')) AS BIGINT) AS syl
           FROM documents),
         scored AS (
           SELECT lang, w, sent, syl,
             CAST(floor((206.835 -
               1.015 * (CAST(w AS DOUBLE) / CAST(sent AS DOUBLE)) -
               84.6 * (CAST(syl AS DOUBLE) / CAST(w AS DOUBLE)))
               * 1000) AS BIGINT) AS fm
           FROM f)
         SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(w) AS BIGINT) AS n_words,
           CAST(sum(sent) AS BIGINT) AS n_sentences,
           CAST(sum(syl) AS BIGINT) AS n_syllables,
           CAST(CAST(sum(fm) AS BIGINT) // count(*) AS BIGINT)
             AS mean_flesch_milli
         FROM scored GROUP BY lang ORDER BY lang""",

    "pipeline_weighted_sample" ->
      """WITH keyed AS (
           SELECT doc_id, n_chars,
             pow(
               CAST(list_reduce(list_prepend(CAST(0 AS BIGINT),
                 list_transform(range(1, 9), i ->
                   CAST(strpos('0123456789abcdef',
                     substring(md5('ws42:' || CAST(doc_id AS VARCHAR)),
                       CAST(i AS INT), 1)) - 1 AS BIGINT))),
                 (acc, x) -> acc * 16 + x) + 1 AS DOUBLE)
               / 4294967297.0,
               1.0 / CAST(n_chars AS DOUBLE)) AS key
           FROM documents),
         rk AS (
           SELECT CAST(row_number() OVER (ORDER BY key DESC, doc_id)
             AS BIGINT) AS rank, doc_id, n_chars, key
           FROM keyed)
         SELECT rank, doc_id, n_chars,
           round(key, 6) + 0.0 AS sample_key
         FROM rk WHERE rank <= 50 ORDER BY rank""",

    "pipeline_dataset_diff" -> {
      s"""WITH applied AS (
           SELECT * FROM (
             ${Pipeline.oracles("pipeline_cdc_apply")}
           ) cdc),
         bef AS (
           SELECT doc_id, lang AS lang_b, md5(text) AS dig_b
           FROM documents),
         j AS (
           SELECT coalesce(b.lang_b, a.lang) AS lang,
             CASE WHEN b.doc_id IS NULL THEN 'added'
                  WHEN a.doc_id IS NULL THEN 'removed'
                  WHEN a.digest <> b.dig_b THEN 'changed'
                  ELSE 'same' END AS status
           FROM bef b FULL OUTER JOIN applied a
             ON a.doc_id = b.doc_id)
         SELECT lang, CAST(count(*) AS BIGINT) AS n_keys,
           CAST(sum(CASE WHEN status = 'added' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_added,
           CAST(sum(CASE WHEN status = 'removed' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_removed,
           CAST(sum(CASE WHEN status = 'changed' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_changed,
           CAST(sum(CASE WHEN status = 'same' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_same
         FROM j GROUP BY lang ORDER BY lang"""
    },

    "q154_seasonal_anomaly_days" -> {
      s"""WITH comp AS (
           SELECT event_type, day, cents, residual AS r
           FROM (
             ${Insights.oracles("q127_seasonal_decompose")}
           ) q127),
         m AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(r) AS BIGINT) AS sr,
             CAST(sum(r * r) AS BIGINT) AS srr
           FROM comp GROUP BY 1)
         SELECT c.event_type, strftime(c.day, '%Y-%m-%d') AS day,
           c.cents, c.r AS residual,
           CAST(CASE WHEN m.n * c.r - m.sr > 0 THEN 1 ELSE -1 END
             AS BIGINT) AS side
         FROM comp c JOIN m ON m.event_type = c.event_type
         WHERE (m.n * c.r - m.sr) * (m.n * c.r - m.sr) >
           4 * (m.n * m.srr - m.sr * m.sr)
         ORDER BY c.event_type, day"""
    },

    "text_lang_confusion" -> {
      s"""WITH pred AS (
           SELECT labeled_lang, predicted_lang FROM (
             ${graft.text.TextAnalysis.oracles("text_langid")}
           ) li),
         cells AS (
           SELECT labeled_lang, predicted_lang,
             CAST(count(*) AS BIGINT) AS n
           FROM pred GROUP BY 1, 2),
         totals AS (
           SELECT labeled_lang, CAST(sum(n) AS BIGINT) AS n_label
           FROM cells GROUP BY 1)
         SELECT c.labeled_lang, c.predicted_lang, c.n, t.n_label,
           CAST(c.n * 1000 // t.n_label AS BIGINT) AS share_milli
         FROM cells c JOIN totals t
           ON t.labeled_lang = c.labeled_lang
         ORDER BY c.labeled_lang, c.predicted_lang"""
    },

    "pipeline_pack_efficiency" ->
      """WITH toks AS (
           SELECT CAST(len(string_split_regex(text, '\s+')) AS BIGINT)
             AS tok
           FROM documents),
         ctxs AS (SELECT CAST(unnest([256, 512, 1024, 2048]) AS BIGINT)
                  AS ctx),
         x AS (
           SELECT c.ctx, t.tok, (t.tok + c.ctx - 1) // c.ctx AS chunks
           FROM toks t CROSS JOIN ctxs c),
         g AS (
           SELECT ctx, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(tok) AS BIGINT) AS n_tokens,
             CAST(sum(chunks) AS BIGINT) AS n_chunks,
             CAST(sum(chunks * ctx - tok) AS BIGINT) AS n_padding
           FROM x GROUP BY 1)
         SELECT ctx, n_docs, n_tokens, n_chunks, n_padding,
           CAST(n_padding * 1000 // (n_chunks * ctx) AS BIGINT)
             AS waste_milli
         FROM g ORDER BY ctx""",

    "q153_shipping_sla" ->
      """WITH j AS (
           SELECT o.o_orderpriority,
             date_diff('day', CAST(o.o_orderdate AS DATE),
               CAST(l.l_shipdate AS DATE)) AS lag
           FROM lineitem l JOIN orders o
             ON l.l_orderkey = o.o_orderkey)
         SELECT o_orderpriority, CAST(count(*) AS BIGINT) AS n_items,
           CAST(CAST(sum(CASE WHEN lag <= 30 THEN 1 ELSE 0 END)
             AS BIGINT) * 1000 // count(*) AS BIGINT)
             AS within_30d_milli,
           CAST(CAST(sum(CASE WHEN lag <= 60 THEN 1 ELSE 0 END)
             AS BIGINT) * 1000 // count(*) AS BIGINT)
             AS within_60d_milli,
           CAST(CAST(sum(CASE WHEN lag <= 90 THEN 1 ELSE 0 END)
             AS BIGINT) * 1000 // count(*) AS BIGINT)
             AS within_90d_milli
         FROM j GROUP BY 1 ORDER BY 1""",

    "mm_shot_budget" -> {
      s"""WITH sc AS (
           SELECT * FROM (
             ${graft.multimodal.Multimodal.oracles("mm_scene_cut")}
           ) x)
         SELECT doc_id, n_frames,
           CAST(n_frames // 8 AS BIGINT) AS uniform_frames,
           CAST(least((n_cuts + 1) * 4, n_frames) AS BIGINT)
             AS shot_frames,
           CAST(least((n_cuts + 1) * 4, n_frames) - n_frames // 8
             AS BIGINT) AS delta_frames
         FROM sc ORDER BY doc_id"""
    },

    "q151_seasonality_strength" -> {
      s"""WITH comp AS (
           SELECT event_type, residual AS r,
             cents - trend AS dt, cents - seasonal AS ds
           FROM (
             ${Insights.oracles("q127_seasonal_decompose")}
           ) q127),
         m AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(r) AS BIGINT) AS sr,
             CAST(sum(r * r) AS BIGINT) AS srr,
             CAST(sum(dt) AS BIGINT) AS st,
             CAST(sum(dt * dt) AS BIGINT) AS stt,
             CAST(sum(ds) AS BIGINT) AS ss,
             CAST(sum(ds * ds) AS BIGINT) AS sss
           FROM comp GROUP BY 1)
         SELECT event_type, n,
           round(greatest(CAST(0.0 AS DOUBLE),
             1.0 - (CAST(n AS DOUBLE) * CAST(srr AS DOUBLE) -
                 CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE)) /
               (CAST(n AS DOUBLE) * CAST(stt AS DOUBLE) -
                 CAST(st AS DOUBLE) * CAST(st AS DOUBLE))), 4) + 0.0
             AS f_seasonal,
           round(greatest(CAST(0.0 AS DOUBLE),
             1.0 - (CAST(n AS DOUBLE) * CAST(srr AS DOUBLE) -
                 CAST(sr AS DOUBLE) * CAST(sr AS DOUBLE)) /
               (CAST(n AS DOUBLE) * CAST(sss AS DOUBLE) -
                 CAST(ss AS DOUBLE) * CAST(ss AS DOUBLE))), 4) + 0.0
             AS f_trend
         FROM m ORDER BY event_type"""
    },

    "text_ngram_novelty" -> {
      s"""WITH tokl AS (
           SELECT doc_id,
             list_transform(string_split_regex(lower(text), '\\s+'),
               t -> ${graft.dedup.Dedup.tokSql("t")}) AS th
           FROM documents),
         grams AS (
           SELECT doc_id, unnest($gram13Sql) AS g FROM tokl),
         fs AS (SELECT g, min(doc_id) AS fd FROM grams GROUP BY 1)
         SELECT gr.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN fs.fd = gr.doc_id THEN 1 ELSE 0 END)
             AS BIGINT) AS n_novel,
           CAST(CAST(sum(CASE WHEN fs.fd = gr.doc_id THEN 1 ELSE 0
             END) AS BIGINT) * 1000 // count(*) AS BIGINT)
             AS novelty_milli
         FROM grams gr JOIN fs ON fs.g = gr.g
         GROUP BY gr.doc_id ORDER BY gr.doc_id"""
    },

    "text_dup_ngram_share" -> {
      s"""WITH tokl AS (
           SELECT doc_id,
             list_transform(string_split_regex(lower(text), '\\s+'),
               t -> ${graft.dedup.Dedup.tokSql("t")}) AS th
           FROM documents),
         grams AS (
           SELECT doc_id, unnest($gram13Sql) AS g FROM tokl),
         df AS (SELECT g, CAST(count(*) AS BIGINT) AS df
                FROM grams GROUP BY 1)
         SELECT gr.doc_id,
           CAST(count(*) AS BIGINT) AS n_grams,
           CAST(sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_dup,
           CAST(CAST(sum(CASE WHEN df.df >= 2 THEN 1 ELSE 0
             END) AS BIGINT) * 1000 // count(*) AS BIGINT)
             AS dup_milli
         FROM grams gr JOIN df ON df.g = gr.g
         GROUP BY gr.doc_id ORDER BY gr.doc_id"""
    },

    "q152_lorenz_deciles" ->
      """WITH cust AS (
           SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS cents
           FROM orders GROUP BY 1),
         rk AS (
           SELECT cents,
             CAST(row_number() OVER (ORDER BY cents, o_custkey)
               AS BIGINT) AS rk,
             (SELECT CAST(count(*) AS BIGINT) FROM cust) AS n
           FROM cust),
         dec AS (
           SELECT (rk - 1) * 10 // n + 1 AS decile,
             CAST(count(*) AS BIGINT) AS n_cust,
             CAST(sum(cents) AS BIGINT) AS spend
           FROM rk GROUP BY 1),
         cum AS (
           SELECT decile, n_cust, spend,
             CAST(sum(spend) OVER (ORDER BY decile
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_spend,
             CAST(sum(spend) OVER () AS BIGINT) AS total
           FROM dec)
         SELECT decile, n_cust, spend AS spend_cents,
           cum_spend AS cum_spend_cents,
           CAST(cum_spend * 1000 // total AS BIGINT)
             AS cum_share_milli
         FROM cum ORDER BY decile""",

    "pipeline_tokenizer_fertility" -> {
      s"""WITH enc AS (
           SELECT * FROM (
             ${graft.text.Bpe.oracles("pipeline_bpe_encode")}
           ) e),
         lg AS (SELECT doc_id, lang FROM documents)
         SELECT lg.lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(enc.n_words) AS BIGINT) AS n_words,
           CAST(sum(enc.n_bpe_tokens) AS BIGINT) AS n_bpe_tokens,
           CAST(CAST(sum(enc.n_bpe_tokens) AS BIGINT) * 1000 //
             CAST(sum(enc.n_words) AS BIGINT) AS BIGINT)
             AS fertility_milli
         FROM enc JOIN lg ON lg.doc_id = enc.doc_id
         GROUP BY lg.lang ORDER BY lg.lang"""
    },

    "q149_price_elasticity" ->
      """WITH t AS (
           SELECT l_partkey % 8 AS segment,
             CAST(round(l_discount * 100) AS BIGINT) AS x,
             CAST(round(l_quantity * 100) AS BIGINT) AS y
           FROM lineitem),
         m AS (
           SELECT segment, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx,
             CAST(sum(y) AS BIGINT) AS sy,
             CAST(sum(x * x) AS BIGINT) AS sxx,
             CAST(sum(x * y) AS BIGINT) AS sxy
           FROM t GROUP BY 1)
         SELECT segment, n,
           round(
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
               CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
             (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
               CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6) + 0.0
             AS slope_centi_units_per_pct
         FROM m ORDER BY segment""",

    "q150_duplicate_invoice" ->
      """WITH base AS (
           SELECT o_orderkey, o_custkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(o_orderdate AS DATE) AS day
           FROM orders),
         o AS (
           SELECT * FROM base
           UNION ALL
           SELECT o_orderkey + 1000000000, o_custkey, cents,
             day + 1
           FROM base WHERE o_orderkey % 97 = 0)
         SELECT a.o_custkey, a.cents, a.o_orderkey AS k1,
           b.o_orderkey AS k2,
           CAST(date_diff('day', a.day, b.day) AS BIGINT) AS gap_days
         FROM o a JOIN o b
           ON a.o_custkey = b.o_custkey AND a.cents = b.cents
             AND a.o_orderkey < b.o_orderkey
         WHERE abs(date_diff('day', a.day, b.day)) <= 2
         ORDER BY a.o_custkey, k1, k2""",

    "q143_2hop_reach" ->
      """WITH li AS (
           SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
           FROM lineitem),
         e AS MATERIALIZED (
           SELECT DISTINCT x.pk AS a, y.pk AS b
           FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk),
         sym AS MATERIALIZED (
           SELECT a AS src, b AS dst FROM e
           UNION ALL SELECT b, a FROM e),
         ctr AS (SELECT src FROM sym GROUP BY src
                 HAVING count(*) <= 64),
         two AS (
           SELECT s1.dst AS v, s2.dst AS w
           FROM sym s1
           JOIN ctr c ON c.src = s1.src
           JOIN sym s2 ON s2.src = s1.src
           WHERE s1.dst <> s2.dst),
         reach AS (
           SELECT v, CAST(count(*) AS BIGINT) AS reach FROM (
             SELECT DISTINCT v, w FROM (
               SELECT src AS v, dst AS w FROM sym
               UNION ALL SELECT v, w FROM two))
           GROUP BY v),
         ranked AS (
           SELECT CAST(row_number() OVER (ORDER BY reach DESC, v)
             AS BIGINT) AS rank, v AS node, reach
           FROM reach)
         SELECT rank, node, reach FROM ranked
         WHERE rank <= 100 ORDER BY rank""",

    "q144_adamic_adar" ->
      """WITH li AS MATERIALIZED (
           SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
           FROM lineitem),
         e AS MATERIALIZED (
           SELECT DISTINCT x.pk AS a, y.pk AS b
           FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk),
         sym AS MATERIALIZED (SELECT a AS src, b AS dst FROM e
                 UNION ALL SELECT b, a FROM e),
         ctr AS MATERIALIZED (
           SELECT src, CAST(count(*) AS BIGINT) AS deg FROM sym
           GROUP BY src HAVING count(*) BETWEEN 2 AND 64),
         wq AS MATERIALIZED (
           SELECT src,
             CAST(floor(1000000.0 / ln(CAST(deg AS DOUBLE)))
               AS BIGINT) AS wq
           FROM ctr),
         cn AS MATERIALIZED (
           SELECT s1.dst AS a, s2.dst AS b,
             CAST(count(*) AS BIGINT) AS cn,
             CAST(sum(w.wq) AS BIGINT) AS aa_micro
           FROM sym s1
           JOIN sym s2 ON s1.src = s2.src AND s1.dst < s2.dst
           JOIN wq w ON w.src = s1.src
           GROUP BY 1, 2),
         ne AS MATERIALIZED (
           SELECT cn.a, cn.b, cn.cn, cn.aa_micro
           FROM cn LEFT JOIN e ON e.a = cn.a AND e.b = cn.b
           WHERE e.a IS NULL)
         SELECT a, b, cn, aa_micro,
           round(CAST(aa_micro AS DOUBLE) / 1000000.0, 4) + 0.0
             AS aa_score
         FROM ne ORDER BY aa_score DESC, a, b LIMIT 50""",

    "pipeline_contamination_ngram" -> {
      s"""WITH tokl AS (
           SELECT doc_id,
             list_transform(string_split_regex(lower(text), '\\s+'),
               t -> ${graft.dedup.Dedup.tokSql("t")}) AS th
           FROM documents),
         grams AS (
           SELECT doc_id, unnest($gram13Sql) AS g FROM tokl),
         ev AS (SELECT DISTINCT g FROM grams WHERE doc_id % 50 = 0),
         tr AS (SELECT doc_id, g FROM grams WHERE doc_id % 50 <> 0),
         agg AS (
           SELECT tr.doc_id,
             CAST(count(*) AS BIGINT) AS n_grams,
             CAST(sum(CASE WHEN ev.g IS NOT NULL THEN 1 ELSE 0 END)
               AS BIGINT) AS n_hits
           FROM tr LEFT JOIN ev ON ev.g = tr.g
           GROUP BY tr.doc_id)
         SELECT doc_id, n_grams, n_hits FROM agg
         WHERE n_hits > 0 ORDER BY doc_id"""
    },

    "q140_changepoint" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS v
           FROM events GROUP BY 1, 2),
         scored AS (
           SELECT event_type, day,
             CAST(row_number() OVER w AS BIGINT) AS t,
             CAST(sum(v) OVER (PARTITION BY event_type ORDER BY day
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
               AS n,
             CAST(sum(v) OVER (PARTITION BY event_type) AS BIGINT)
               AS tot
           FROM daily
           WINDOW w AS (PARTITION BY event_type ORDER BY day)),
         cand AS (
           SELECT *, abs(n * cum - t * tot) AS s_abs FROM scored
           WHERE t < n),
         best AS (
           SELECT event_type, n AS n_days, day, t, cum, tot, s_abs,
             row_number() OVER (PARTITION BY event_type
               ORDER BY s_abs DESC, t) AS rn
           FROM cand)
         SELECT event_type, n_days,
           strftime(day, '%Y-%m-%d') AS cp_day,
           CAST(s_abs AS BIGINT) AS s_abs,
           CAST(cum // t AS BIGINT) AS pre_mean_cents,
           CAST((tot - cum) // (n_days - t) AS BIGINT)
             AS post_mean_cents
         FROM best WHERE rn = 1 ORDER BY event_type""",

    "q141_theil_sen" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS v
           FROM events GROUP BY 1, 2),
         p AS (
           SELECT a.event_type,
             CAST(b.v - a.v AS DOUBLE) /
               CAST(date_diff('day', a.day, b.day) AS DOUBLE) AS slope
           FROM daily a JOIN daily b
             ON a.event_type = b.event_type AND a.day < b.day),
         g AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_pairs,
             list_sort(list(slope)) AS sl
           FROM p GROUP BY 1)
         SELECT event_type, n_pairs,
           round(sl[CAST((len(sl) + 1) // 2 AS INT)], 4) + 0.0
             AS sen_slope
         FROM g ORDER BY event_type""",

    "q142_bootstrap_ci" ->
      """WITH cust AS (
           SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS cents
           FROM orders GROUP BY 1),
         reps AS (
           SELECT c.o_custkey, c.cents, r.rep,
             substring(md5(CAST(c.o_custkey AS VARCHAR) || ':' ||
               CAST(r.rep AS VARCHAR)), 1, 8) AS h
           FROM cust c
           CROSS JOIN (SELECT unnest(range(1, 101)) AS rep) r),
         wts AS (
           SELECT rep, cents,
             CASE WHEN h < '5e2d58d8' THEN 0
                  WHEN h < 'bc5ab1b1' THEN 1
                  WHEN h < 'eb715e1d' THEN 2
                  WHEN h < 'fb239797' THEN 3
                  WHEN h < 'ff1025f5' THEN 4
                  ELSE 5 END AS w
           FROM reps),
         mr AS (
           SELECT rep,
             CAST(CAST(sum(w * cents) AS BIGINT) AS DOUBLE) /
             CAST(CAST(sum(w) AS BIGINT) AS DOUBLE) AS mean_r
           FROM wts GROUP BY rep),
         ms AS (SELECT list_sort(list(mean_r)) AS ms FROM mr),
         pt AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS tot
           FROM cust)
         SELECT CAST(100 AS BIGINT) AS n_reps, n,
           round(CAST(tot AS DOUBLE) / CAST(n AS DOUBLE), 4) + 0.0
             AS mean_cents,
           round(ms[3], 4) + 0.0 AS ci_lo,
           round(ms[98], 4) + 0.0 AS ci_hi
         FROM ms, pt""",

    "q145_asof_nearest" ->
      """WITH ev AS (
           SELECT event_id, user_id, event_type, epoch_us(ts) AS t
           FROM events WHERE event_type IN ('purchase', 'view')),
         marked AS (
           SELECT event_id, user_id, event_type, t,
             last_value(CASE WHEN event_type = 'view' THEN t END
               IGNORE NULLS) OVER (PARTITION BY user_id
                 ORDER BY t, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS prev_v,
             first_value(CASE WHEN event_type = 'view' THEN t END
               IGNORE NULLS) OVER (PARTITION BY user_id
                 ORDER BY t, event_id
                 ROWS BETWEEN CURRENT ROW AND UNBOUNDED FOLLOWING)
               AS next_v
           FROM ev)
         SELECT event_id, user_id, t AS purchase_us,
           CASE WHEN prev_v IS NULL THEN next_v
                WHEN next_v IS NULL THEN prev_v
                WHEN t - prev_v <= next_v - t THEN prev_v
                ELSE next_v END AS view_us,
           CASE WHEN prev_v IS NULL THEN next_v
                WHEN next_v IS NULL THEN prev_v
                WHEN t - prev_v <= next_v - t THEN prev_v
                ELSE next_v END - t AS diff_us,
           CASE WHEN (CASE WHEN prev_v IS NULL THEN next_v
                WHEN next_v IS NULL THEN prev_v
                WHEN t - prev_v <= next_v - t THEN prev_v
                ELSE next_v END) <= t
             THEN 'before' ELSE 'after' END AS side
         FROM marked
         WHERE event_type = 'purchase'
           AND (prev_v IS NOT NULL OR next_v IS NOT NULL)
         ORDER BY event_id""",

    "q146_retention_triangle" ->
      """WITH o AS (
           SELECT o_custkey, date_trunc('month', o_orderdate) AS m
           FROM orders),
         fst AS (SELECT o_custkey, min(m) AS cm FROM o GROUP BY 1),
         act AS (
           SELECT DISTINCT o.o_custkey, f.cm,
             CAST((year(o.m) - year(f.cm)) * 12 +
               (month(o.m) - month(f.cm)) AS BIGINT) AS "offset"
           FROM o JOIN fst f ON f.o_custkey = o.o_custkey
           WHERE (year(o.m) - year(f.cm)) * 12 +
             (month(o.m) - month(f.cm)) <= 12),
         counts AS (
           SELECT cm, "offset",
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS n_active
           FROM act GROUP BY 1, 2),
         s0 AS (
           SELECT cm, n_active AS cohort_n FROM counts
           WHERE "offset" = 0)
         SELECT strftime(c.cm, '%Y-%m') AS cohort_month,
           c."offset" AS "offset", c.n_active, s0.cohort_n,
           CAST(c.n_active * 1000 // s0.cohort_n AS BIGINT)
             AS retention_milli
         FROM counts c JOIN s0 ON s0.cm = c.cm
         ORDER BY cohort_month, "offset"""",

    "text_code_detect" ->
      """WITH f AS (
           SELECT doc_id, n_chars,
             CAST(length(text) - length(replace(text, '{', ''))
               + length(text) - length(replace(text, '}', ''))
               AS BIGINT) AS n_braces,
             CAST(length(text) - length(replace(text, ';', ''))
               AS BIGINT) AS n_semis,
             CAST(length(text) - length(replace(text, '=', ''))
               AS BIGINT) AS n_eqs
           FROM documents)
         SELECT doc_id, n_chars, n_braces, n_semis, n_eqs,
           CAST((n_braces + n_semis + n_eqs) * 1000 // n_chars
             AS BIGINT) AS score_milli,
           CAST(CASE WHEN (n_braces + n_semis + n_eqs) * 1000
             // n_chars >= 15 THEN 1 ELSE 0 END AS BIGINT) AS is_code
         FROM f ORDER BY doc_id""",

    "pipeline_mixture_grid" ->
      """WITH langs AS (
           SELECT lang,
             CAST(sum(len(string_split_regex(text, '\s+'))) AS BIGINT)
               AS n_tokens
           FROM documents GROUP BY 1),
         tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot
                 FROM langs),
         taus AS (SELECT unnest([0, 300, 500, 700, 1000]) AS tau_milli),
         withp AS (
           SELECT CAST(t.tau_milli AS BIGINT) AS tau_milli, l.lang,
             l.n_tokens,
             CAST(l.n_tokens AS DOUBLE) / CAST(tot.tot AS DOUBLE) AS p,
             pow(CAST(l.n_tokens AS DOUBLE) / CAST(tot.tot AS DOUBLE),
               CAST(t.tau_milli AS DOUBLE) / 1000.0) AS pa
           FROM langs l, tot, taus t),
         one AS (
           SELECT tau_milli,
             list({'lang': lang, 'n_tokens': n_tokens, 'p': p,
               'pa': pa} ORDER BY lang) AS arr
           FROM withp GROUP BY 1),
         x AS (
           SELECT tau_milli, unnest(arr) AS r,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(arr, x -> x.pa)), (a, b) -> a + b)
               AS sum_pa
           FROM one)
         SELECT tau_milli, r.lang AS lang, r.n_tokens AS n_tokens,
           round(r.p, 6) + 0.0 AS p,
           round(r.pa / sum_pa, 6) + 0.0 AS w
         FROM x ORDER BY tau_milli, lang""",

    "emb_isotropy" -> {
      val cos = graft.sim.Similarity.cosSql("a.embedding", "b.embedding")
      s"""WITH q AS (
           SELECT CAST(floor($cos * 1000000000.0) AS BIGINT) AS q
           FROM embeddings a JOIN embeddings b
             ON b.vec_id = a.vec_id + 1),
         m AS (
           SELECT CAST(count(*) AS BIGINT) AS n_pairs,
             CAST(sum(q) AS BIGINT) AS sq,
             CAST(sum(abs(q)) AS BIGINT) AS saq,
             CAST(max(abs(q)) AS BIGINT) AS mx
           FROM q)
         SELECT n_pairs,
           round(CAST(sq AS DOUBLE) / 1000000000.0 /
             CAST(n_pairs AS DOUBLE), 6) + 0.0 AS mean_cos,
           round(CAST(saq AS DOUBLE) / 1000000000.0 /
             CAST(n_pairs AS DOUBLE), 6) + 0.0 AS mean_abs_cos,
           round(CAST(mx AS DOUBLE) / 1000000000.0, 6) + 0.0
             AS max_abs_cos
         FROM m"""
    })
}
