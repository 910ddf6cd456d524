package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Round-11 frontier (batch 9): Markov steady-state of the event
  * chain, its entropy rate, and the length-filter policy sweep.
  *
  * Reference note: the reference engine (`/root/reference/`, a Go log
  * forwarder — SURVEY.md §1) has no analytics surface; these extend
  * the Insights/Pipeline families under the house disciplines — exact
  * integer domains until one final IEEE assembly, `Tables.nz` on
  * signable float outputs, sorted-array transcendental folds, driver
  * iteration only on enum-bounded matrices (Bpe.learn discipline),
  * and DuckDB oracles replaying the identical arithmetic.
  */
object Frontier3 {

  def queries: Map[String, Q] = Map(

    // Markov steady-state of the event-type chain — where the session
    // process SPENDS its time in the long run, the summary q40's raw
    // transition counts can't give (a state can be rare as a source
    // yet absorb most long-run mass). Transitions ride q40's exact
    // per-user lead window; the row-stochastic matrix is enum²-BOUNDED
    // (≤|event types|² rows) so the fixed 4 power rounds from the
    // uniform vector run DRIVER-LOCAL (the Bpe.learn / emb_pc2
    // split: corpus passes distributed, tiny iteration local).
    // Determinism: matvec folds ascending over source states in
    // doubles, each round floor-quantized to 1e-9 — the DuckDB oracle
    // unrolls the identical rounds (list_reduce ORDER BY src).
    // obs_share is the EMPIRICAL source-state mass (exact longs, one
    // IEEE divide); steady_pi − obs_share is the burn-in gap.
    "q159_markov_steady" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val trans = Tables.load(s, d, "events")
        .withColumn("next_type", lead($"event_type", 1).over(w))
        .filter($"next_type".isNotNull)
        .groupBy($"event_type".as("src"), $"next_type".as("dst"))
        .agg(count(lit(1)).as("n"))
        .as[(String, String, Long)].collect() // enum²-bounded
      val states = trans.flatMap(t => Seq(t._1, t._2)).distinct.sorted
      val idx = states.zipWithIndex.toMap
      val k = states.length
      val nMat = Array.ofDim[Long](k, k)
      trans.foreach { case (a, b, n) => nMat(idx(a))(idx(b)) = n }
      val rowTot = nMat.map(_.sum)
      val total = rowTot.sum
      // v' = v P, ascending source fold, 1e-9 floor quantize/round
      var v = Array.fill(k)(1.0 / k)
      for (_ <- 1 to 4) {
        val u = Array.tabulate(k) { j =>
          var acc = 0.0
          var i = 0
          while (i < k) {
            if (rowTot(i) > 0L && nMat(i)(j) > 0L)
              acc += v(i) * (nMat(i)(j).toDouble / rowTot(i).toDouble)
            i += 1
          }
          acc
        }
        v = u.map(x => math.floor(x * 1.0e9) / 1.0e9)
      }
      states.zipWithIndex.map { case (st, i) =>
        (st, rowTot(i), v(i)) }.toSeq
        .toDF("state", "n_out", "pi")
        .select($"state", $"n_out",
          Tables.nz(round($"n_out".cast("double") / total.toDouble, 6))
            .as("obs_share"),
          Tables.nz(round($"pi", 6)).as("steady_pi"))
        .orderBy($"state")
    }),

    // First-order entropy rate of the event chain — HOW PREDICTABLE
    // the next event is given the current one, the sequence-structure
    // number neither q103's hour entropy nor q119's field MI sees.
    // Per source state: H(dst|src) as a transcendental fold over the
    // dst-SORTED (dst, n) struct array (q106's discipline — one
    // deterministic IEEE association order); the global rate
    // Σ π(src)·H(·|src) and the zeroth-order entropy H₀ fold over the
    // src-sorted per-state table inside a ONE-ROW aggregate, joined
    // back via crossJoin(broadcast) — never a partition-less window.
    // Everything upstream is exact longs; predictability_gain
    // 1 − H_rate/H₀ is the "how much does knowing the current state
    // help" headline (0 = memoryless stream).
    "q160_entropy_rate" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val perSrc = Tables.load(s, d, "events")
        .withColumn("next_type", lead($"event_type", 1).over(w))
        .filter($"next_type".isNotNull)
        .groupBy($"event_type".as("state"), $"next_type".as("dst"))
        .agg(count(lit(1)).as("n"))
        .groupBy($"state")
        .agg(sum($"n").as("n_out"),
          sort_array(collect_list(struct($"dst", $"n"))).as("arr"))
        .select($"state", $"n_out",
          expr("""aggregate(arr, CAST(0.0 AS DOUBLE), (a, x) ->
               a - (CAST(x.n AS DOUBLE) / CAST(n_out AS DOUBLE)) *
                 ln(CAST(x.n AS DOUBLE) / CAST(n_out AS DOUBLE)))""")
            .as("h_raw"))
      val glob = perSrc
        .agg(sum($"n_out").as("tot"),
          sort_array(collect_list(struct($"state", $"n_out", $"h_raw")))
            .as("g"))
        .select($"tot",
          expr("""aggregate(g, CAST(0.0 AS DOUBLE), (a, x) ->
               a + (CAST(x.n_out AS DOUBLE) / CAST(tot AS DOUBLE)) *
                 x.h_raw)""").as("h_rate_raw"),
          expr("""aggregate(g, CAST(0.0 AS DOUBLE), (a, x) ->
               a - (CAST(x.n_out AS DOUBLE) / CAST(tot AS DOUBLE)) *
                 ln(CAST(x.n_out AS DOUBLE) / CAST(tot AS DOUBLE)))""")
            .as("h0_raw"))
      perSrc.crossJoin(broadcast(glob))
        .select($"state", $"n_out",
          Tables.nz(round($"h_raw", 4)).as("h_cond"),
          Tables.nz(round($"h_rate_raw", 4)).as("h_rate"),
          Tables.nz(round($"h0_raw", 4)).as("h0"),
          Tables.nz(round(
            when($"h0_raw" === 0.0, lit(0.0))
              .otherwise(lit(1.0) - $"h_rate_raw" / $"h0_raw"), 4))
            .as("predictability_gain"))
        .orderBy($"state")
    }),

    // Supplier lead-time reliability — per supplier: order-to-ship
    // lag (l_shipdate − o_orderdate), the ≤30-day fill rate, and
    // exact p50/p90 lag via ops.Quantiles' count-table pass (the lag
    // value domain is DAYS — tiny — so per-group state is
    // domain-sized, never row-sized). The supply-chain twin of
    // q153's priority-level SLA: q153 rates the ORDER pipeline, this
    // rates each SUPPLIER — the table a procurement re-negotiation
    // reads. One fact-fact orderkey shuffle join (q153/q81's
    // no-broadcast discipline) + the Quantiles scan; exact integer
    // days and milli rates throughout.
    "q161_supplier_leadtime" -> ((s, d) => {
      import s.implicits._
      val li = Tables.load(s, d, "lineitem")
        .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
        .join(Tables.load(s, d, "orders")
          .select($"o_orderkey", $"o_orderdate"),
          $"l_orderkey" === $"o_orderkey")
        .select($"l_suppkey",
          datediff($"l_shipdate", $"o_orderdate").cast("long")
            .as("lag_days"))
      // r19 optimization (guide §1.2): the fact-fact join used to run
      // TWICE (once into the fill-rate rollup, once into the quantile
      // pass). One (suppkey, lag) count table — domain-sized, lag is
      // DAYS — now feeds both: the fill counters are sums over it and
      // the quantiles ride exactByGroupCounts on the same persisted
      // frame. Values unchanged (same counts, same rank arithmetic).
      val counts = li.groupBy($"l_suppkey", $"lag_days".as("__qv"))
        .agg(count(lit(1)).as("__qc"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val base = counts.groupBy($"l_suppkey")
        .agg(sum($"__qc").as("n_items"),
          sum(when($"__qv" <= 30L, $"__qc").otherwise(0L))
            .as("n_fast"))
      val qs = graft.ops.Quantiles.exactByGroupCounts(counts,
        "l_suppkey", Seq("p50_lag_days" -> 0.5,
          "p90_lag_days" -> 0.9)).drop("n")
      base.join(qs, Seq("l_suppkey"))
        .select($"l_suppkey", $"n_items",
          expr("n_fast * 1000 div n_items").as("within30_milli"),
          $"p50_lag_days", $"p90_lag_days")
        .orderBy($"l_suppkey")
    }),

    // Hapax ratio — per-language lexical richness: the share of word
    // TYPES occurring exactly once in that language's sub-corpus.
    // Hapax mass is the vocabulary frontier (Heaps' growth lives in
    // the hapax tail), and a collapsing hapax share flags template/
    // boilerplate corpora that stopped teaching the tokenizer new
    // words — the type-level companion to text_heaps_fit (growth
    // curve) and text_dup_ngram_share (gram-level duplication). One
    // (lang, token) map-side-combined rollup; everything after is
    // type-table-bounded; exact milli.
    "text_hapax_ratio" -> ((s, d) => {
      import s.implicits._
      Tables.spread(Tables.load(s, d, "documents"))
        .select($"lang",
          explode(split(lower($"text"), "\\s+")).as("token"))
        .groupBy($"lang", $"token").agg(count(lit(1)).as("c"))
        .groupBy($"lang")
        .agg(sum($"c").as("n_tokens"),
          count(lit(1)).as("n_types"),
          sum(when($"c" === 1L, 1L).otherwise(0L)).as("n_hapax"))
        .select($"lang", $"n_tokens", $"n_types", $"n_hapax",
          expr("n_hapax * 1000 div n_types").as("hapax_type_milli"),
          expr("n_types * 1000 div n_tokens").as("ttr_milli"))
        .orderBy($"lang")
    }),

    // Sampler seed-stability audit — how much does the A-Res weighted
    // sample (pipeline_weighted_sample) change under a different RNG
    // seed? Large overlap = the weights dominate (the sample is
    // basically deterministic top-weight), tiny overlap = the seed
    // dominates (any single sample is noise) — the number that says
    // whether downstream evals on one sample generalize. Three seeded
    // top-50 draws (same exact hex-fold uniforms, TakeOrdered each),
    // membership flags reduced in ONE aggregate over the ≤150-row
    // union — pairwise overlaps and Jaccard milli, all exact ints.
    "pipeline_seed_variance" -> ((s, d) => {
      import s.implicits._
      def draw(seed: String) = {
        val u = expr(
          s"""(aggregate(sequence(1, 8), CAST(0 AS BIGINT),
               (acc, i) -> acc * 16 +
                 (instr('0123456789abcdef',
                    substring(md5(concat('$seed:',
                      CAST(doc_id AS STRING))), i, 1)) - 1)) + 1)""")
          .cast("double") / lit(4294967297.0)
        Tables.load(s, d, "documents")
          .select($"doc_id", $"n_chars",
            pow(u, lit(1.0) / $"n_chars".cast("double")).as("key"))
          .orderBy($"key".desc, $"doc_id").limit(50)
          .select($"doc_id", lit(seed).as("seed"))
      }
      val all = draw("ws42").unionAll(draw("ws43"))
        .unionAll(draw("ws44"))
      all.groupBy($"doc_id")
        .agg(max(when($"seed" === "ws42", 1L).otherwise(0L)).as("a"),
          max(when($"seed" === "ws43", 1L).otherwise(0L)).as("b"),
          max(when($"seed" === "ws44", 1L).otherwise(0L)).as("c"))
        .agg(sum($"a" * $"b").as("ov_ab"),
          sum($"a" * $"c").as("ov_ac"),
          sum($"b" * $"c").as("ov_bc"),
          // per-draw sizes derived from the data (ADVICE r11): a
          // corpus smaller than the LIMIT yields draws of n_docs
          // rows, so the Jaccard denominator is |A|+|B|−|A∩B|, not
          // the hardcoded 100−ov; k reports the realized draw size
          sum($"a").as("ka"), sum($"b").as("kb"), sum($"c").as("kc"))
        // nullif on the union size: both draws empty (possible only
        // on an empty corpus, where the sums are NULL anyway, but the
        // guard keeps the div total under ANSI — same degenerate-
        // corpus symmetry as emb_abtt's vv=0 projection)
        .select($"ka".as("k"), $"ov_ab", $"ov_ac", $"ov_bc",
          expr("ov_ab * 1000 div nullif(ka + kb - ov_ab, 0)")
            .as("jac_ab_milli"),
          expr("ov_ac * 1000 div nullif(ka + kc - ov_ac, 0)")
            .as("jac_ac_milli"),
          expr("ov_bc * 1000 div nullif(kb + kc - ov_bc, 0)")
            .as("jac_bc_milli"))
    }),

    // Log-rank churn test — does the BUILDING segment churn on a
    // DIFFERENT clock than everyone else? q120's Kaplan–Meier curve
    // describes one population; the log-rank statistic is the
    // standard two-sample comparison on censored time-to-event data
    // (the hypothesis test behind "segment A retains better").
    // Same churn/censoring rule as q120 (90-day horizon, 30-day
    // months); per month: at-risk and churn counts per arm from a
    // DENSE month×arm grid (reverse cumulative over the
    // months-bounded risk table, window PARTITIONED by arm);
    // hypergeometric E/V per month assemble in doubles row-local;
    // the global χ² folds over the month-SORTED struct array in a
    // one-row aggregate, joined back via crossJoin(broadcast).
    "q166_logrank_churn" -> ((s, d) => {
      import s.implicits._
      val maxd = Tables.load(s, d, "orders")
        .agg(max(to_date($"o_orderdate")).as("maxd"))
      val cust = Tables.load(s, d, "orders")
        .join(broadcast(Tables.load(s, d, "customer")
          .select($"c_custkey", $"c_mktsegment")),
          $"o_custkey" === $"c_custkey")
        .select($"o_custkey", $"c_mktsegment",
          to_date($"o_orderdate").as("day"))
        .groupBy($"o_custkey")
        .agg(min($"day").as("first"), max($"day").as("last"),
          first($"c_mktsegment").as("seg"))
        .crossJoin(broadcast(maxd))
        .select(
          when($"seg" === "BUILDING", "A").otherwise("B").as("arm"),
          (datediff($"maxd", $"last") > 90).as("churned"),
          expr("""CAST(CASE WHEN datediff(maxd, last) > 90
                  THEN datediff(last, first) div 30
                  ELSE datediff(maxd, first) div 30 END AS BIGINT)""")
            .as("t"))
      val byMonth = cust.groupBy($"arm", $"t")
        .agg(sum(when($"churned", 1L).otherwise(0L)).as("d"),
          count(lit(1)).as("e"))
      val tmax = byMonth.agg(max($"t").as("tm"))
      val dense = tmax
        .select(explode(sequence(lit(0L), $"tm")).as("t"))
        .crossJoin(broadcast(Seq("A", "B").toDF("arm")))
        .join(byMonth, Seq("arm", "t"), "left")
        .select($"arm", $"t", coalesce($"d", lit(0L)).as("d"),
          coalesce($"e", lit(0L)).as("e"))
      // at risk at t = customers whose event/censor month >= t:
      // reverse cumulative of month totals, per arm (months-bounded)
      val wRev = Window.partitionBy($"arm").orderBy($"t")
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
      val risk = dense
        .withColumn("n_at_risk", sum($"e").over(wRev))
      val wide = risk.groupBy($"t")
        .agg(max(when($"arm" === "A", $"n_at_risk")).as("na"),
          max(when($"arm" === "B", $"n_at_risk")).as("nb"),
          max(when($"arm" === "A", $"d")).as("da"),
          max(when($"arm" === "B", $"d")).as("db"))
        .filter($"da" + $"db" > 0L && $"na" + $"nb" > 0L)
        .withColumn("ea",
          ($"da" + $"db").cast("double") * $"na".cast("double") /
            ($"na" + $"nb").cast("double"))
        .withColumn("v", when($"na" + $"nb" <= 1L, lit(0.0))
          .otherwise(
            ($"da" + $"db").cast("double") *
              ($"na".cast("double") / ($"na" + $"nb").cast("double")) *
              (lit(1.0) - $"na".cast("double") /
                ($"na" + $"nb").cast("double")) *
              (($"na" + $"nb" - $"da" - $"db").cast("double") /
                ($"na" + $"nb" - 1L).cast("double"))))
      val glob = wide
        .agg(sort_array(collect_list(struct($"t", $"da", $"ea", $"v")))
          .as("g"))
        .select(
          expr("""aggregate(g, CAST(0.0 AS DOUBLE), (a, x) ->
               a + (CAST(x.da AS DOUBLE) - x.ea))""").as("o_minus_e"),
          expr("""aggregate(g, CAST(0.0 AS DOUBLE), (a, x) ->
               a + x.v)""").as("vsum"))
        .select($"o_minus_e",
          when($"vsum" === 0.0, lit(0.0))
            .otherwise($"o_minus_e" * $"o_minus_e" / $"vsum")
            .as("chi2"))
      wide.crossJoin(broadcast(glob))
        .select($"t", $"na", $"nb", $"da", $"db",
          Tables.nz(round($"ea", 4)).as("e_a"),
          Tables.nz(round($"o_minus_e", 4)).as("o_minus_e_a"),
          Tables.nz(round($"chi2", 4)).as("logrank_chi2"))
        .orderBy($"t")
    }),

    // Tukey median polish of the (event type × day-of-week) revenue
    // grid — the robust two-way decomposition: cell = row effect +
    // column effect + residual, fitted by alternating row/column
    // MEDIAN sweeps (2 full sweeps, the textbook budget). Where
    // q127's mean decomposition chases outliers, the polish residual
    // table IS the outlier report ("Tuesday errors are structurally
    // off beyond what Tuesday and errors explain"). Everything is
    // exact integers: cell values are LOWER MEDIANS of daily cent
    // sums (ops.Quantiles count-table pass over a composite key —
    // never a per-group sort), the polish runs driver-local on the
    // ≤|enum|×7 grid (bytes), and the oracle unrolls the identical
    // four half-sweeps as CTEs. dow is an explicit epoch-anchored
    // formula (0 = Monday) — no engine dayofweek() convention leaks.
    "q165_median_polish" -> ((s, d) => {
      import s.implicits._
      val daily = Tables.load(s, d, "events")
        .select($"event_type", to_date($"ts").as("day"),
          round($"value" * 100).cast("long").as("cents"))
        .groupBy($"event_type", $"day").agg(sum($"cents").as("v"))
        .select(concat($"event_type", lit("\u0001"),
          pmod(datediff($"day", lit("1970-01-05")), lit(7))
            .cast("string")).as("key"), $"v")
      val cells = graft.ops.Quantiles.exactByGroup(daily, "key",
          $"v", Seq("med" -> 0.5))
        .select($"key", $"med").as[(String, Long)].collect()
        .map { case (k, m) =>
          val Array(t, w) = k.split("\u0001"); (t, w.toLong, m) }
        .sortBy(t => (t._1, t._2)) // enum×7-bounded
      val types = cells.map(_._1).distinct.sorted
      val dows = cells.map(_._2).distinct.sorted
      val grid = scala.collection.mutable.Map[(String, Long), Long]()
      cells.foreach { case (t, w, m) => grid((t, w)) = m }
      def lowerMedian(xs: Seq[Long]): Long =
        xs.sorted.apply((xs.length + 1) / 2 - 1)
      val rowEff = scala.collection.mutable.Map[String, Long]()
        .withDefaultValue(0L)
      val colEff = scala.collection.mutable.Map[Long, Long]()
        .withDefaultValue(0L)
      for (_ <- 1 to 2) {
        types.foreach { t =>
          val pres = dows.filter(w => grid.contains((t, w)))
          val m = lowerMedian(pres.map(w => grid((t, w))))
          rowEff(t) += m
          pres.foreach(w => grid((t, w)) -= m)
        }
        dows.foreach { w =>
          val pres = types.filter(t => grid.contains((t, w)))
          val m = lowerMedian(pres.map(t => grid((t, w))))
          colEff(w) += m
          pres.foreach(t => grid((t, w)) -= m)
        }
      }
      cells.map { case (t, w, m) =>
        (t, w, m, rowEff(t), colEff(w), grid((t, w))) }.toSeq
        .toDF("event_type", "dow", "cell_cents", "row_eff_cents",
          "col_eff_cents", "resid_cents")
        .orderBy($"event_type", $"dow")
    }),

    // Laspeyres / Paasche price index per brand — "did prices move,
    // holding the basket fixed": H1→H2 unit-price relatives weighted
    // by H1 (Laspeyres) and H2 (Paasche) quantities, the two classic
    // index-number bounds. Unit prices are truncated exact cents
    // (Σ extprice div Σ qty per part-half); indexes are exact milli
    // off integer Σ p·q cross-products — parts present in BOTH
    // halves only (matched-model rule). Long Σ p·q holds to ~10¹⁴
    // part-halves; past that the q25 decimal(38,0) escalation
    // applies. One lineitem⋈part join + a (brand, part, half)
    // rollup; brand table is enum-bounded.
    "q164_price_index" -> ((s, d) => {
      import s.implicits._
      val li = Tables.load(s, d, "lineitem")
        .select($"l_partkey", $"l_shipdate", $"l_quantity",
          round($"l_extendedprice" * 100).cast("long").as("cents"))
      val bounds = li.agg(min($"l_shipdate").as("d0"),
        max($"l_shipdate").as("d1"))
      val ph = li.crossJoin(broadcast(bounds))
        .select($"l_partkey",
          when(datediff($"l_shipdate", $"d0") * 2 <
            datediff($"d1", $"d0"), 1L).otherwise(2L).as("half"),
          $"l_quantity".cast("long").as("qty"), $"cents")
        .groupBy($"l_partkey", $"half")
        .agg(sum($"qty").as("sq"), sum($"cents").as("sc"))
        .filter($"sq" > 0L)
        .select($"l_partkey", $"half", $"sq",
          expr("sc div sq").as("p"))
      val wide = ph.groupBy($"l_partkey")
        .agg(max(when($"half" === 1L, $"p")).as("p1"),
          max(when($"half" === 2L, $"p")).as("p2"),
          max(when($"half" === 1L, $"sq")).as("q1"),
          max(when($"half" === 2L, $"sq")).as("q2"))
        .filter($"p1".isNotNull && $"p2".isNotNull)
      wide
        .join(Tables.load(s, d, "part")
          .select($"p_partkey", $"p_brand"), $"l_partkey" === $"p_partkey")
        .groupBy($"p_brand")
        .agg(count(lit(1)).as("n_parts"),
          sum($"p2" * $"q1").as("l_num"), sum($"p1" * $"q1").as("l_den"),
          sum($"p2" * $"q2").as("p_num"), sum($"p1" * $"q2").as("p_den"))
        .select($"p_brand", $"n_parts",
          expr("l_num * 1000 div l_den").as("laspeyres_milli"),
          expr("p_num * 1000 div p_den").as("paasche_milli"))
        .orderBy($"p_brand")
    }),

    // Dedup survivorship bias — does exact dedup SKEW the corpus
    // mixture? Removing non-first copies is only mix-neutral if
    // duplication is uniform across strata; scraped corpora duplicate
    // some languages far more. Reports per language: docs before vs
    // after digest dedup (keep-min-doc_id, the pipeline_split
    // discipline) and the milli share shift — the number that decides
    // whether the post-dedup mixture needs re-weighting
    // (pipeline_budget_mix's input). One digest rollup + a lang
    // rollup; shares divide on broadcast one-row totals.
    "pipeline_dedup_bias" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.load(s, d, "documents")
        .select($"doc_id", $"lang", md5($"text").as("digest"))
      val keep = docs.groupBy($"digest")
        .agg(min($"doc_id").as("keep_id"))
      val flagged = docs.join(keep, Seq("digest"))
        .select($"lang", ($"doc_id" === $"keep_id").as("kept"))
      val perLang = flagged.groupBy($"lang")
        .agg(count(lit(1)).as("n_before"),
          sum(when($"kept", 1L).otherwise(0L)).as("n_after"))
      val tot = perLang.agg(sum($"n_before").as("tb"),
        sum($"n_after").as("ta"))
      perLang.crossJoin(broadcast(tot))
        .select($"lang", $"n_before", $"n_after",
          expr("n_before * 1000 div tb").as("share_before_milli"),
          expr("n_after * 1000 div ta").as("share_after_milli"))
        .withColumn("shift_milli",
          $"share_after_milli" - $"share_before_milli")
        .orderBy($"lang")
    }),

    // Growth accounting — decomposes per-segment revenue change
    // between the two halves of the date span (q133's split rule)
    // into the three levers every growth review argues about:
    // customers × orders-per-customer × order value. Sequential
    // substitution on TRUNCATED per-unit rates (per-customer revenue,
    // per-order value, order frequency in milli) keeps every product
    // inside long range at any corpus scale — and the `resid_cents`
    // column carries the exact remainder ΔR − Σ contributions, so the
    // decomposition is verifiable instead of approximately-summing.
    // All exact integer cents; one orders⋈customer broadcast join +
    // a (segment, half) rollup.
    "q163_growth_accounting" -> ((s, d) => {
      import s.implicits._
      val o = Tables.load(s, d, "orders")
        .join(broadcast(Tables.load(s, d, "customer")
          .select($"c_custkey", $"c_mktsegment")),
          $"o_custkey" === $"c_custkey")
        .select($"c_mktsegment".as("segment"), $"o_custkey",
          to_date($"o_orderdate").as("day"),
          round($"o_totalprice" * 100).cast("long").as("cents"))
      val bounds = o.agg(min($"day").as("d0"), max($"day").as("d1"))
      val per = o.crossJoin(broadcast(bounds))
        .select($"segment", $"o_custkey",
          when(datediff($"day", $"d0") * 2 < datediff($"d1", $"d0"),
            1L).otherwise(2L).as("half"), $"cents")
      val agg = per.groupBy($"segment", $"half")
        .agg(countDistinct($"o_custkey").as("c"),
          count(lit(1)).as("o"), sum($"cents").as("r"))
      agg.groupBy($"segment")
        .agg(max(when($"half" === 1L, $"c")).as("c1"),
          max(when($"half" === 2L, $"c")).as("c2"),
          max(when($"half" === 1L, $"o")).as("o1"),
          max(when($"half" === 2L, $"o")).as("o2"),
          max(when($"half" === 1L, $"r")).as("r1"),
          max(when($"half" === 2L, $"r")).as("r2"))
        .filter($"c1".isNotNull && $"c2".isNotNull)
        .select($"segment", $"r1", $"r2",
          ($"r2" - $"r1").as("delta_cents"),
          expr("(c2 - c1) * (r1 div c1)").as("cust_contrib_cents"),
          expr("""c2 * (o2 * 1000 div c2 - o1 * 1000 div c1)
               * (r1 div o1) div 1000""").as("freq_contrib_cents"),
          expr("o2 * (r2 div o2 - r1 div o1)").as("value_contrib_cents"))
        .withColumn("resid_cents",
          $"delta_cents" - $"cust_contrib_cents" -
            $"freq_contrib_cents" - $"value_contrib_cents")
        .orderBy($"segment")
    }),

    // Forecast model-selection backtest — holds out the LAST 7 days
    // of each event type's daily revenue series and scores three
    // forecasters on them: naive (last train value), seasonal-naive
    // (value 7 days earlier — q94's predictor), and the truncating
    // train mean. The winner table is what picks the production
    // forecaster; q94/q114 score ONE method in-sample, this compares
    // methods out-of-sample. Series are gap-filled on the q157 spine
    // (span×|enum| grid — data-size-independent) so every predictor
    // is defined; errors are exact |cents| longs, MAE an exact
    // truncating div, and the winner an array_min over (mae, name)
    // structs (the mm_aspect argmin idiom — deterministic tie-break).
    "q162_forecast_backtest" -> ((s, d) => {
      import s.implicits._
      val daily = Tables.load(s, d, "events")
        .select($"event_type", to_date($"ts").as("day"),
          round($"value" * 100).cast("long").as("cents"))
        .groupBy($"event_type", $"day").agg(sum($"cents").as("v"))
      val span = daily.agg(min($"day").as("d0"), max($"day").as("d1"))
        .select($"d0", $"d1",
          datediff($"d1", $"d0").cast("long").as("dmax"))
      val types = daily.select($"event_type").distinct()
      val grid = span
        .select(explode(sequence($"d0", $"d1")).as("day"), $"d0",
          $"dmax")
        .crossJoin(broadcast(types))
        .join(daily, Seq("event_type", "day"), "left")
        .select($"event_type",
          datediff($"day", $"d0").cast("long").as("di"), $"dmax",
          coalesce($"v", lit(0L)).as("v"))
      val train = grid.filter($"di" <= $"dmax" - 7L)
      val trainAgg = train.groupBy($"event_type")
        .agg(max_by($"v", $"di").as("last_v"),
          expr("sum(v) div count(1)").as("mean_v"))
      val lag7 = grid.select($"event_type", ($"di" + 7L).as("di"),
        $"v".as("v7"))
      grid.filter($"di" > $"dmax" - 7L)
        .join(lag7, Seq("event_type", "di"))
        .join(broadcast(trainAgg), Seq("event_type"))
        .groupBy($"event_type")
        .agg(expr("sum(abs(v - last_v)) div 7").as("mae_naive"),
          expr("sum(abs(v - v7)) div 7").as("mae_snaive"),
          expr("sum(abs(v - mean_v)) div 7").as("mae_mean"))
        .select($"event_type", $"mae_naive", $"mae_snaive",
          $"mae_mean",
          expr("""array_min(array(
               struct(mae_naive AS m, 'naive' AS f),
               struct(mae_snaive AS m, 'snaive' AS f),
               struct(mae_mean AS m, 'mean' AS f))).f""")
            .as("best_method"))
        .orderBy($"event_type")
    }),

    // Mixture-realization audit — pipeline_interleave publishes the
    // deterministic per-language interleaving ORDER; this audits what
    // a consumer actually SEES: at each corpus decile of that order,
    // the realized per-language share vs the plan's target weights
    // (en 4:1), and the deviation. The number that catches "the mix
    // is right overall but epoch-front-loaded" — target drift as
    // languages exhaust IS the signal. Global positions ride
    // ops.PrefixSum (never a global row_number window); decile
    // boundary sizes derive from the driver row-count scalar by the
    // same integer formula both engines replay; per-language
    // cumulatives are a 10-row-per-language window (bounded).
    "pipeline_mix_realized" -> ((s, d) => {
      import s.implicits._
      val wLang = Window.partitionBy($"lang").orderBy($"doc_id")
      val mult = when($"lang" === "en", lit(1L)).otherwise(lit(4L))
      val docs = Tables.load(s, d, "documents")
        .select($"doc_id", $"lang")
        .withColumn("rn", row_number().over(wLang).cast("long"))
        .withColumn("vtime", (lit(2L) * $"rn" - 1L) * mult)
      val pos = graft.ops.PrefixSum.runningTotal(docs,
        Seq($"vtime", $"lang", $"doc_id"), lit(1L), "pos")
      val n = Tables.load(s, d, "documents").count() // driver scalar
      // closed form, not a loop over n: pos ≤ cum_n(k) ⇔ its decile
      // ≤ k, with cum_n(k) = ceil(k·n/10) — O(1) at any corpus size
      val cumN = (1 to 10).map(k => (k.toLong, (k * n + 9) / 10))
      val counts = pos
        .withColumn("ck", expr(s"(pos - 1) * 10 div ${n}L + 1"))
        .groupBy($"ck", $"lang").agg(count(lit(1)).as("c"))
      val wCum = Window.partitionBy($"lang").orderBy($"ck")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val langs = docs.select($"lang").distinct()
        .as[String].collect().sorted // enum-bounded
      val sumW = langs.map(l => if (l == "en") 4L else 1L).sum
      val ckDf = cumN.toDF("ck", "cum_n")
      // dense decile×lang grid: a language with no docs in bucket k
      // must still report its cumulative there (sparse cells would
      // silently drop exhausted languages from later deciles)
      val dense = ckDf.crossJoin(broadcast(langs.toSeq.toDF("lang")))
        .join(counts, Seq("ck", "lang"), "left")
        .withColumn("c", coalesce($"c", lit(0L)))
      dense
        .withColumn("cum_docs", sum($"c").over(wCum))
        .select($"ck".as("decile"), $"lang", $"cum_docs",
          expr("cum_docs * 1000 div cum_n").as("realized_milli"),
          expr(s"""(CASE WHEN lang = 'en' THEN 4L ELSE 1L END)
               * 1000 div ${sumW}L""").as("target_milli"))
        .withColumn("dev_milli",
          abs($"realized_milli" - $"target_milli"))
        .orderBy($"decile", $"lang")
    }),

    // Source purity — per ingest source: language count, dominant
    // language and its share, and the language-mix entropy (nats,
    // sorted-struct fold — q106 discipline). The stratum-balance
    // read pipeline_dataset_card's volume table doesn't give: a
    // "clean" source is low-entropy, a scraped mixed-language one
    // flags for split-by-langid treatment before training. One
    // (source, lang) rollup — both dimensions enum-bounded.
    "text_source_purity" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "documents")
        .groupBy($"source", $"lang").agg(count(lit(1)).as("c"))
        .groupBy($"source")
        .agg(sum($"c").as("n_docs"),
          count(lit(1)).as("n_langs"),
          min_by($"lang", struct((-$"c").as("nc"), $"lang"))
            .as("top_lang"),
          max($"c").as("top_c"),
          sort_array(collect_list(struct($"lang", $"c"))).as("arr"))
        .select($"source", $"n_docs", $"n_langs", $"top_lang",
          expr("top_c * 1000 div n_docs").as("top_lang_milli"),
          Tables.nz(round(expr(
            """aggregate(arr, CAST(0.0 AS DOUBLE), (a, x) ->
               a - (CAST(x.c AS DOUBLE) / CAST(n_docs AS DOUBLE)) *
                 ln(CAST(x.c AS DOUBLE) / CAST(n_docs AS DOUBLE)))"""),
            4)).as("lang_entropy"))
        .orderBy($"source")
    }),

    // Length-filter policy sweep — the retention table a curation
    // round reads BEFORE committing a token-count filter (the
    // pipeline_pack_efficiency stance applied to the quality gate):
    // docs/tokens kept per (min_tokens, max_tokens) candidate cell.
    // The corpus pass is ONE map-side-combined rollup to the
    // token-count HISTOGRAM (value-domain-sized, the ops.Quantiles
    // count-table discipline); the 20-cell literal grid then joins
    // the broadcast histogram — corpus size never multiplies the
    // grid. Shares are exact integer milli.
    "pipeline_filter_sweep" -> ((s, d) => {
      import s.implicits._
      val hist = Tables.load(s, d, "documents")
        .select(size(split(lower($"text"), "\\s+")).cast("long")
          .as("t"))
        .groupBy($"t").agg(count(lit(1)).as("nd"))
      val tot = hist.agg(sum($"nd").as("tot_docs"),
        sum($"t" * $"nd").as("tot_toks"))
      val grid = Seq(1L, 8L, 16L, 32L, 64L)
        .flatMap(mn => Seq(128L, 256L, 512L, 1024L).map(mx => (mn, mx)))
        .toDF("min_tokens", "max_tokens")
      grid.join(broadcast(hist),
          $"t" >= $"min_tokens" && $"t" <= $"max_tokens", "left")
        .groupBy($"min_tokens", $"max_tokens")
        .agg(coalesce(sum($"nd"), lit(0L)).as("docs_kept"),
          coalesce(sum($"t" * $"nd"), lit(0L)).as("tokens_kept"))
        .crossJoin(broadcast(tot))
        .select($"min_tokens", $"max_tokens", $"docs_kept",
          $"tokens_kept",
          expr("docs_kept * 1000 div tot_docs").as("docs_share_milli"),
          expr("tokens_kept * 1000 div tot_toks")
            .as("tokens_share_milli"))
        .orderBy($"min_tokens", $"max_tokens")
    }))

  def oracles: Map[String, String] = Map(

    "q159_markov_steady" -> {
      // the fold MUST be an ordered list_reduce, not sum(): double
      // summation order is unspecified for sum, and the Scala side
      // folds ascending over source states
      def round0(vprev: String, out: String): String =
        s"""$out AS MATERIALIZED (
             SELECT st.j,
               floor(coalesce((
                 SELECT list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                     list(v.val * (CAST(p.n AS DOUBLE) /
                       CAST(rt.tot AS DOUBLE)) ORDER BY p.i)),
                   (a, b) -> a + b)
                 FROM p
                 JOIN rt ON rt.i = p.i
                 JOIN $vprev v ON v.j = p.i
                 WHERE p.j = st.j), 0.0)
                 * 1000000000.0) / 1000000000.0 AS val
             FROM states st)"""
      s"""WITH o AS (
           SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS next_type
           FROM events),
         tr AS (
           SELECT event_type AS src, next_type AS dst,
             CAST(count(*) AS BIGINT) AS n
           FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2),
         states AS MATERIALIZED (
           SELECT s AS state,
             CAST(row_number() OVER (ORDER BY s) AS BIGINT) AS j
           FROM (SELECT DISTINCT src AS s FROM tr
                 UNION SELECT DISTINCT dst FROM tr)),
         p AS MATERIALIZED (
           SELECT si.j AS i, sj.j AS j, t.n
           FROM tr t
           JOIN states si ON si.state = t.src
           JOIN states sj ON sj.state = t.dst),
         rt AS MATERIALIZED (
           SELECT i, CAST(sum(n) AS BIGINT) AS tot FROM p GROUP BY 1),
         k AS (SELECT CAST(count(*) AS BIGINT) AS k FROM states),
         tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM tr),
         v0 AS (SELECT j, 1.0 / (SELECT k FROM k) AS val FROM states),
         ${round0("v0", "v1")},
         ${round0("v1", "v2")},
         ${round0("v2", "v3")},
         ${round0("v3", "v4")}
         SELECT st.state, coalesce(rt.tot, 0) AS n_out,
           round(CAST(coalesce(rt.tot, 0) AS DOUBLE) /
             CAST(tot.total AS DOUBLE), 6) + 0.0 AS obs_share,
           round(v4.val, 6) + 0.0 AS steady_pi
         FROM states st
         LEFT JOIN rt ON rt.i = st.j
         JOIN v4 ON v4.j = st.j, tot
         ORDER BY st.state"""
    },

    "q160_entropy_rate" ->
      """WITH o AS (
           SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS next_type
           FROM events),
         tr AS (
           SELECT event_type AS state, next_type AS dst,
             CAST(count(*) AS BIGINT) AS n
           FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2),
         rowt AS (
           SELECT state, CAST(sum(n) AS BIGINT) AS n_out
           FROM tr GROUP BY 1),
         per AS MATERIALIZED (
           SELECT t.state, CAST(max(r.n_out) AS BIGINT) AS n_out,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(-(CAST(t.n AS DOUBLE) / CAST(r.n_out AS DOUBLE)) *
                 ln(CAST(t.n AS DOUBLE) / CAST(r.n_out AS DOUBLE))
                 ORDER BY t.dst)),
               (a, b) -> a + b) AS h_raw
           FROM tr t JOIN rowt r ON r.state = t.state
           GROUP BY t.state),
         tt AS (SELECT CAST(sum(n_out) AS BIGINT) AS tot FROM per),
         gl AS MATERIALIZED (
           SELECT tt.tot,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list((CAST(n_out AS DOUBLE) /
                 CAST(tt.tot AS DOUBLE)) * h_raw
                 ORDER BY state)), (a, b) -> a + b) AS h_rate_raw,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(-(CAST(n_out AS DOUBLE) /
                 CAST(tt.tot AS DOUBLE)) *
                 ln(CAST(n_out AS DOUBLE) /
                   CAST(tt.tot AS DOUBLE))
                 ORDER BY state)), (a, b) -> a + b) AS h0_raw
           FROM per, tt GROUP BY tt.tot)
         SELECT p.state, p.n_out,
           round(p.h_raw, 4) + 0.0 AS h_cond,
           round(g.h_rate_raw, 4) + 0.0 AS h_rate,
           round(g.h0_raw, 4) + 0.0 AS h0,
           round(CASE WHEN g.h0_raw = 0 THEN 0.0
             ELSE 1.0 - g.h_rate_raw / g.h0_raw END, 4) + 0.0
             AS predictability_gain
         FROM per p, gl g ORDER BY p.state""",

    "q161_supplier_leadtime" ->
      """WITH li AS (
           SELECT l.l_suppkey,
             CAST(date_diff('day', o.o_orderdate, l.l_shipdate)
               AS BIGINT) AS lag_days
           FROM lineitem l JOIN orders o
             ON l.l_orderkey = o.o_orderkey),
         base AS (
           SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(CASE WHEN lag_days <= 30 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_fast
           FROM li GROUP BY 1),
         r AS (
           SELECT l_suppkey, lag_days,
             row_number() OVER (PARTITION BY l_suppkey
               ORDER BY lag_days) AS rn,
             count(*) OVER (PARTITION BY l_suppkey) AS n
           FROM li),
         q AS (
           SELECT l_suppkey,
             min(CASE WHEN rn = CAST(floor(0.5 * (n - 1)) AS BIGINT)
               + 1 THEN lag_days END) AS p50_lag_days,
             min(CASE WHEN rn = CAST(floor(0.9 * (n - 1)) AS BIGINT)
               + 1 THEN lag_days END) AS p90_lag_days
           FROM r GROUP BY 1)
         SELECT b.l_suppkey, b.n_items,
           CAST(b.n_fast * 1000 // b.n_items AS BIGINT)
             AS within30_milli,
           q.p50_lag_days, q.p90_lag_days
         FROM base b JOIN q ON q.l_suppkey = b.l_suppkey
         ORDER BY b.l_suppkey""",

    "text_hapax_ratio" ->
      """WITH tok AS (
           SELECT lang,
             unnest(string_split_regex(lower(text), '\s+')) AS token
           FROM documents),
         tc AS (
           SELECT lang, token, CAST(count(*) AS BIGINT) AS c
           FROM tok GROUP BY 1, 2),
         agg AS (
           SELECT lang, CAST(sum(c) AS BIGINT) AS n_tokens,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(CASE WHEN c = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_hapax
           FROM tc GROUP BY 1)
         SELECT lang, n_tokens, n_types, n_hapax,
           CAST(n_hapax * 1000 // n_types AS BIGINT)
             AS hapax_type_milli,
           CAST(n_types * 1000 // n_tokens AS BIGINT) AS ttr_milli
         FROM agg ORDER BY lang""",

    "pipeline_seed_variance" -> {
      def draw(seed: String, out: String): String =
        s"""$out AS (
             SELECT doc_id FROM (
               SELECT doc_id,
                 pow(CAST((list_reduce(list_prepend(CAST(0 AS BIGINT),
                   list_transform(range(1, 9), i ->
                     CAST(strpos('0123456789abcdef',
                       substr(md5('$seed:' || CAST(doc_id AS VARCHAR)),
                         CAST(i AS INT), 1)) - 1 AS BIGINT))),
                   (acc, x) -> acc * 16 + x) + 1) AS DOUBLE)
                   / 4294967297.0,
                   1.0 / CAST(n_chars AS DOUBLE)) AS key
               FROM documents) s
             ORDER BY key DESC, doc_id LIMIT 50)"""
      s"""WITH ${draw("ws42", "sa")},
         ${draw("ws43", "sb")},
         ${draw("ws44", "sc")},
         u AS (
           SELECT doc_id, 'a' AS s FROM sa
           UNION ALL SELECT doc_id, 'b' FROM sb
           UNION ALL SELECT doc_id, 'c' FROM sc),
         fl AS (
           SELECT doc_id,
             max(CASE WHEN s = 'a' THEN 1 ELSE 0 END) AS a,
             max(CASE WHEN s = 'b' THEN 1 ELSE 0 END) AS b,
             max(CASE WHEN s = 'c' THEN 1 ELSE 0 END) AS c
           FROM u GROUP BY 1),
         ov AS (
           SELECT CAST(sum(a * b) AS BIGINT) AS ov_ab,
             CAST(sum(a * c) AS BIGINT) AS ov_ac,
             CAST(sum(b * c) AS BIGINT) AS ov_bc,
             CAST(sum(a) AS BIGINT) AS ka,
             CAST(sum(b) AS BIGINT) AS kb,
             CAST(sum(c) AS BIGINT) AS kc
           FROM fl)
         SELECT ka AS k, ov_ab, ov_ac, ov_bc,
           CAST(ov_ab * 1000 // nullif(ka + kb - ov_ab, 0) AS BIGINT)
             AS jac_ab_milli,
           CAST(ov_ac * 1000 // nullif(ka + kc - ov_ac, 0) AS BIGINT)
             AS jac_ac_milli,
           CAST(ov_bc * 1000 // nullif(kb + kc - ov_bc, 0) AS BIGINT)
             AS jac_bc_milli
         FROM ov"""
    },

    "q166_logrank_churn" ->
      """WITH md AS (SELECT max(o_orderdate) AS maxd FROM orders),
         cust AS (
           SELECT o.o_custkey,
             CASE WHEN min(c.c_mktsegment) = 'BUILDING'
               THEN 'A' ELSE 'B' END AS arm,
             min(o.o_orderdate) AS first, max(o.o_orderdate) AS last
           FROM orders o JOIN customer c
             ON o.o_custkey = c.c_custkey
           GROUP BY 1),
         cc AS (
           SELECT arm,
             CAST(CASE WHEN date_diff('day', last, m.maxd) > 90
               THEN date_diff('day', first, last) // 30
               ELSE date_diff('day', first, m.maxd) // 30 END
               AS BIGINT) AS t,
             CASE WHEN date_diff('day', last, m.maxd) > 90
               THEN 1 ELSE 0 END AS churned
           FROM cust, md m),
         bm AS (
           SELECT arm, t, CAST(sum(churned) AS BIGINT) AS d,
             CAST(count(*) AS BIGINT) AS e
           FROM cc GROUP BY 1, 2),
         tm AS (SELECT max(t) AS tm FROM bm),
         dense AS (
           SELECT a.arm, CAST(g.t AS BIGINT) AS t,
             coalesce(b.d, 0) AS d, coalesce(b.e, 0) AS e
           FROM (SELECT unnest(range(0, tm + 1)) AS t FROM tm) g
           CROSS JOIN (SELECT unnest(['A', 'B']) AS arm) a
           LEFT JOIN bm b ON b.arm = a.arm AND b.t = g.t),
         risk AS (
           SELECT arm, t, d,
             CAST(sum(e) OVER (PARTITION BY arm ORDER BY t DESC
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS n_at_risk
           FROM dense),
         wide AS (
           SELECT t,
             max(CASE WHEN arm = 'A' THEN n_at_risk END) AS na,
             max(CASE WHEN arm = 'B' THEN n_at_risk END) AS nb,
             max(CASE WHEN arm = 'A' THEN d END) AS da,
             max(CASE WHEN arm = 'B' THEN d END) AS db
           FROM risk GROUP BY 1),
         w2 AS (
           SELECT t, na, nb, da, db,
             CAST(da + db AS DOUBLE) * CAST(na AS DOUBLE)
               / CAST(na + nb AS DOUBLE) AS ea,
             CASE WHEN na + nb <= 1 THEN 0.0 ELSE
               CAST(da + db AS DOUBLE) *
                 (CAST(na AS DOUBLE) / CAST(na + nb AS DOUBLE)) *
                 (1.0 - CAST(na AS DOUBLE) / CAST(na + nb AS DOUBLE)) *
                 (CAST(na + nb - da - db AS DOUBLE)
                   / CAST(na + nb - 1 AS DOUBLE)) END AS v
           FROM wide
           WHERE da + db > 0 AND na + nb > 0),
         gl AS (
           SELECT
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(CAST(da AS DOUBLE) - ea ORDER BY t)),
               (a, b) -> a + b) AS o_minus_e,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(v ORDER BY t)), (a, b) -> a + b) AS vsum
           FROM w2)
         SELECT w.t, w.na, w.nb, w.da, w.db,
           round(w.ea, 4) + 0.0 AS e_a,
           round(g.o_minus_e, 4) + 0.0 AS o_minus_e_a,
           round(CASE WHEN g.vsum = 0 THEN 0.0
             ELSE g.o_minus_e * g.o_minus_e / g.vsum END, 4) + 0.0
             AS logrank_chi2
         FROM w2 w, gl g ORDER BY w.t""",


    "q165_median_polish" -> {
      // lower median of `v` grouped by $grp over $src
      def med(src: String, grp: String, out: String): String =
        s"""$out AS (
             SELECT $grp, ls[CAST((len(ls) + 1) // 2 AS INT)] AS m
             FROM (SELECT $grp, list_sort(list(v)) AS ls
                   FROM $src GROUP BY 1) g)"""
      s"""WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS v
           FROM events GROUP BY 1, 2),
         dw AS (
           SELECT event_type,
             ((date_diff('day', DATE '1970-01-05', day) % 7) + 7) % 7
               AS dow,
             v
           FROM daily),
         cells AS (
           SELECT event_type, CAST(dow AS BIGINT) AS dow,
             ls[CAST((len(ls) + 1) // 2 AS INT)] AS v
           FROM (SELECT event_type, dow, list_sort(list(v)) AS ls
                 FROM dw GROUP BY 1, 2) g),
         ${med("cells", "event_type", "rm1")},
         r1 AS (
           SELECT c.event_type, c.dow, c.v - rm1.m AS v
           FROM cells c JOIN rm1 USING (event_type)),
         ${med("r1", "dow", "cm1")},
         r2 AS (
           SELECT r.event_type, r.dow, r.v - cm1.m AS v
           FROM r1 r JOIN cm1 USING (dow)),
         ${med("r2", "event_type", "rm2")},
         r3 AS (
           SELECT r.event_type, r.dow, r.v - rm2.m AS v
           FROM r2 r JOIN rm2 USING (event_type)),
         ${med("r3", "dow", "cm2")},
         r4 AS (
           SELECT r.event_type, r.dow, r.v - cm2.m AS v
           FROM r3 r JOIN cm2 USING (dow))
         SELECT c.event_type, c.dow, c.v AS cell_cents,
           rm1.m + rm2.m AS row_eff_cents,
           cm1.m + cm2.m AS col_eff_cents,
           r4.v AS resid_cents
         FROM cells c
         JOIN rm1 ON rm1.event_type = c.event_type
         JOIN rm2 ON rm2.event_type = c.event_type
         JOIN cm1 ON cm1.dow = c.dow
         JOIN cm2 ON cm2.dow = c.dow
         JOIN r4 ON r4.event_type = c.event_type AND r4.dow = c.dow
         ORDER BY c.event_type, c.dow"""
    },

    "q164_price_index" ->
      """WITH li AS (
           SELECT l_partkey, l_shipdate,
             CAST(l_quantity AS BIGINT) AS qty,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS cents
           FROM lineitem),
         b AS (SELECT min(l_shipdate) AS d0, max(l_shipdate) AS d1
               FROM li),
         ph AS (
           SELECT l_partkey,
             CASE WHEN date_diff('day', b.d0, li.l_shipdate) * 2
               < date_diff('day', b.d0, b.d1) THEN 1 ELSE 2 END
               AS half,
             qty, cents
           FROM li, b),
         pp AS (
           SELECT l_partkey, half, CAST(sum(qty) AS BIGINT) AS sq,
             CAST(CAST(sum(cents) AS BIGINT) // sum(qty) AS BIGINT)
               AS p
           FROM ph GROUP BY 1, 2 HAVING sum(qty) > 0),
         wide AS (
           SELECT l_partkey,
             max(CASE WHEN half = 1 THEN p END) AS p1,
             max(CASE WHEN half = 2 THEN p END) AS p2,
             max(CASE WHEN half = 1 THEN sq END) AS q1,
             max(CASE WHEN half = 2 THEN sq END) AS q2
           FROM pp GROUP BY 1),
         agg AS (
           SELECT pt.p_brand, CAST(count(*) AS BIGINT) AS n_parts,
             CAST(sum(w.p2 * w.q1) AS BIGINT) AS l_num,
             CAST(sum(w.p1 * w.q1) AS BIGINT) AS l_den,
             CAST(sum(w.p2 * w.q2) AS BIGINT) AS p_num,
             CAST(sum(w.p1 * w.q2) AS BIGINT) AS p_den
           FROM wide w JOIN part pt ON pt.p_partkey = w.l_partkey
           WHERE w.p1 IS NOT NULL AND w.p2 IS NOT NULL
           GROUP BY 1)
         SELECT p_brand, n_parts,
           CAST(l_num * 1000 // l_den AS BIGINT) AS laspeyres_milli,
           CAST(p_num * 1000 // p_den AS BIGINT) AS paasche_milli
         FROM agg ORDER BY p_brand""",

    "pipeline_dedup_bias" ->
      """WITH docs AS (
           SELECT doc_id, lang, md5(text) AS digest FROM documents),
         keep AS (
           SELECT digest, min(doc_id) AS keep_id
           FROM docs GROUP BY 1),
         fl AS (
           SELECT d.lang, d.doc_id = k.keep_id AS kept
           FROM docs d JOIN keep k ON k.digest = d.digest),
         pl AS (
           SELECT lang, CAST(count(*) AS BIGINT) AS n_before,
             CAST(sum(CASE WHEN kept THEN 1 ELSE 0 END) AS BIGINT)
               AS n_after
           FROM fl GROUP BY 1),
         t AS (SELECT CAST(sum(n_before) AS BIGINT) AS tb,
                 CAST(sum(n_after) AS BIGINT) AS ta FROM pl)
         SELECT lang, n_before, n_after,
           CAST(n_before * 1000 // tb AS BIGINT) AS share_before_milli,
           CAST(n_after * 1000 // ta AS BIGINT) AS share_after_milli,
           CAST(n_after * 1000 // ta - n_before * 1000 // tb
             AS BIGINT) AS shift_milli
         FROM pl, t ORDER BY lang""",

    "q163_growth_accounting" ->
      """WITH o AS (
           SELECT c.c_mktsegment AS segment, o.o_custkey,
             o.o_orderdate AS day,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
           FROM orders o JOIN customer c
             ON o.o_custkey = c.c_custkey),
         b AS (SELECT min(day) AS d0, max(day) AS d1 FROM o),
         per AS (
           SELECT segment, o_custkey,
             CASE WHEN date_diff('day', b.d0, o.day) * 2
               < date_diff('day', b.d0, b.d1) THEN 1 ELSE 2 END
               AS half,
             cents
           FROM o, b),
         agg AS (
           SELECT segment, half,
             CAST(count(DISTINCT o_custkey) AS BIGINT) AS c,
             CAST(count(*) AS BIGINT) AS o,
             CAST(sum(cents) AS BIGINT) AS r
           FROM per GROUP BY 1, 2),
         w AS (
           SELECT segment,
             max(CASE WHEN half = 1 THEN c END) AS c1,
             max(CASE WHEN half = 2 THEN c END) AS c2,
             max(CASE WHEN half = 1 THEN o END) AS o1,
             max(CASE WHEN half = 2 THEN o END) AS o2,
             max(CASE WHEN half = 1 THEN r END) AS r1,
             max(CASE WHEN half = 2 THEN r END) AS r2
           FROM agg GROUP BY 1),
         k AS (
           SELECT segment, r1, r2, r2 - r1 AS delta_cents,
             (c2 - c1) * (r1 // c1) AS cust_contrib_cents,
             c2 * (o2 * 1000 // c2 - o1 * 1000 // c1)
               * (r1 // o1) // 1000 AS freq_contrib_cents,
             o2 * (r2 // o2 - r1 // o1) AS value_contrib_cents
           FROM w WHERE c1 IS NOT NULL AND c2 IS NOT NULL)
         SELECT segment, r1, r2, delta_cents,
           CAST(cust_contrib_cents AS BIGINT) AS cust_contrib_cents,
           CAST(freq_contrib_cents AS BIGINT) AS freq_contrib_cents,
           CAST(value_contrib_cents AS BIGINT) AS value_contrib_cents,
           CAST(delta_cents - cust_contrib_cents - freq_contrib_cents
             - value_contrib_cents AS BIGINT) AS resid_cents
         FROM k ORDER BY segment""",

    "q162_forecast_backtest" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS v
           FROM events GROUP BY 1, 2),
         span AS (
           SELECT min(day) AS d0, max(day) AS d1,
             CAST(date_diff('day', min(day), max(day)) AS BIGINT)
               AS dmax
           FROM daily),
         days AS (
           SELECT unnest(generate_series(d0, d1,
             INTERVAL 1 DAY))::DATE AS day, d0, dmax
           FROM span),
         types AS (SELECT DISTINCT event_type FROM daily),
         grid AS (
           SELECT t.event_type,
             CAST(date_diff('day', dy.d0, dy.day) AS BIGINT) AS di,
             dy.dmax, coalesce(d.v, 0) AS v
           FROM days dy CROSS JOIN types t
           LEFT JOIN daily d
             ON d.event_type = t.event_type AND d.day = dy.day),
         ta AS (
           SELECT event_type,
             max_by(v, di) AS last_v,
             CAST(CAST(sum(v) AS BIGINT) // count(*) AS BIGINT)
               AS mean_v
           FROM grid WHERE di <= dmax - 7 GROUP BY 1),
         lag7 AS (
           SELECT event_type, di + 7 AS di, v AS v7 FROM grid),
         e AS (
           SELECT g.event_type,
             CAST(sum(abs(g.v - t.last_v)) // 7 AS BIGINT)
               AS mae_naive,
             CAST(sum(abs(g.v - l.v7)) // 7 AS BIGINT) AS mae_snaive,
             CAST(sum(abs(g.v - t.mean_v)) // 7 AS BIGINT)
               AS mae_mean
           FROM grid g
           JOIN lag7 l ON l.event_type = g.event_type AND l.di = g.di
           JOIN ta t ON t.event_type = g.event_type
           WHERE g.di > g.dmax - 7
           GROUP BY 1)
         SELECT event_type, mae_naive, mae_snaive, mae_mean,
           list_min([
             {'m': mae_naive, 'f': 'naive'},
             {'m': mae_snaive, 'f': 'snaive'},
             {'m': mae_mean, 'f': 'mean'}]).f AS best_method
         FROM e ORDER BY event_type""",

    "pipeline_mix_realized" ->
      """WITH docs AS (
           SELECT doc_id, lang,
             CAST(row_number() OVER (PARTITION BY lang
               ORDER BY doc_id) AS BIGINT) AS rn,
             CASE WHEN lang = 'en' THEN 1 ELSE 4 END AS mult
           FROM documents),
         pos AS (
           SELECT lang,
             CAST(row_number() OVER (ORDER BY (2 * rn - 1) * mult,
               lang, doc_id) AS BIGINT) AS pos
           FROM docs),
         nn AS (SELECT CAST(count(*) AS BIGINT) AS n FROM documents),
         counts AS (
           SELECT (pos - 1) * 10 // n + 1 AS ck, lang,
             CAST(count(*) AS BIGINT) AS c
           FROM pos, nn GROUP BY 1, 2),
         dense AS (
           SELECT g.ck, l.lang, coalesce(c.c, 0) AS c
           FROM (SELECT unnest(range(1, 11)) AS ck) g
           CROSS JOIN (SELECT DISTINCT lang FROM documents) l
           LEFT JOIN counts c ON c.ck = g.ck AND c.lang = l.lang),
         cum AS (
           SELECT ck, lang,
             CAST(sum(c) OVER (PARTITION BY lang ORDER BY ck
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum_docs
           FROM dense),
         sw AS (
           SELECT CAST(sum(CASE WHEN lang = 'en' THEN 4 ELSE 1 END)
             AS BIGINT) AS sumw
           FROM (SELECT DISTINCT lang FROM documents)),
         o AS (
           SELECT cum.ck AS decile, cum.lang, cum.cum_docs,
             CAST(cum.cum_docs * 1000 // ((cum.ck * nn.n + 9) // 10)
               AS BIGINT) AS realized_milli,
             CAST((CASE WHEN cum.lang = 'en' THEN 4 ELSE 1 END)
               * 1000 // sw.sumw AS BIGINT) AS target_milli
           FROM cum, nn, sw)
         SELECT decile, lang, cum_docs, realized_milli, target_milli,
           abs(realized_milli - target_milli) AS dev_milli
         FROM o ORDER BY decile, lang""",

    "text_source_purity" ->
      """WITH sl AS (
           SELECT source, lang, CAST(count(*) AS BIGINT) AS c
           FROM documents GROUP BY 1, 2),
         st AS (
           SELECT source, CAST(sum(c) AS BIGINT) AS n_docs
           FROM sl GROUP BY 1),
         tp AS (
           SELECT source, lang AS top_lang FROM (
             SELECT source, lang,
               row_number() OVER (PARTITION BY source
                 ORDER BY c DESC, lang) AS rn
             FROM sl) r WHERE rn = 1),
         agg AS (
           SELECT s.source, CAST(max(t.n_docs) AS BIGINT) AS n_docs,
             CAST(count(*) AS BIGINT) AS n_langs,
             min(p.top_lang) AS top_lang,
             CAST(max(s.c) AS BIGINT) AS top_c,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(-(CAST(s.c AS DOUBLE) / CAST(t.n_docs AS DOUBLE)) *
                 ln(CAST(s.c AS DOUBLE) / CAST(t.n_docs AS DOUBLE))
                 ORDER BY s.lang)), (a, b) -> a + b) AS h
           FROM sl s
           JOIN st t ON t.source = s.source
           JOIN tp p ON p.source = s.source
           GROUP BY s.source)
         SELECT source, n_docs, n_langs, top_lang,
           CAST(top_c * 1000 // n_docs AS BIGINT) AS top_lang_milli,
           round(h, 4) + 0.0 AS lang_entropy
         FROM agg ORDER BY source""",

    "pipeline_filter_sweep" ->
      """WITH hist AS (
           SELECT CAST(len(string_split_regex(lower(text), '\s+'))
             AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS nd
           FROM documents GROUP BY 1),
         tot AS (
           SELECT CAST(sum(nd) AS BIGINT) AS tot_docs,
             CAST(sum(t * nd) AS BIGINT) AS tot_toks
           FROM hist),
         grid AS (
           SELECT mn.mn AS min_tokens, mx.mx AS max_tokens
           FROM (SELECT unnest([1, 8, 16, 32, 64]) AS mn) mn
           CROSS JOIN (SELECT unnest([128, 256, 512, 1024]) AS mx) mx),
         agg AS (
           SELECT g.min_tokens, g.max_tokens,
             CAST(coalesce(sum(h.nd), 0) AS BIGINT) AS docs_kept,
             CAST(coalesce(sum(h.t * h.nd), 0) AS BIGINT)
               AS tokens_kept
           FROM grid g
           LEFT JOIN hist h
             ON h.t >= g.min_tokens AND h.t <= g.max_tokens
           GROUP BY 1, 2)
         SELECT CAST(min_tokens AS BIGINT) AS min_tokens,
           CAST(max_tokens AS BIGINT) AS max_tokens,
           docs_kept, tokens_kept,
           CAST(docs_kept * 1000 // tot_docs AS BIGINT)
             AS docs_share_milli,
           CAST(tokens_kept * 1000 // tot_toks AS BIGINT)
             AS tokens_share_milli
         FROM agg, tot ORDER BY min_tokens, max_tokens""")
}
