package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, ScratchDir, Tables}

/** Round-13 frontier (batch 2): lead-lag cross-correlation, the
  * Benjamini–Hochberg multiple-testing gate, and split-conformal
  * forecast intervals.
  *
  * Reference note: the reference engine (`/root/reference/`, a Go log
  * forwarder — SURVEY.md §1) has no analytics surface; these extend
  * the Insights/Frontier families under the house disciplines —
  * exact integer domains until one final IEEE assembly, decimal(38,0)
  * moments where 64-bit squares can overflow (q157 discipline),
  * `Tables.nz` on signable float outputs, bounded collects only
  * (CollectGuardSpec-annotated), and DuckDB oracles replaying the
  * identical arithmetic.
  */
object Frontier4 {

  // q180 state-dir uniquifier — monotone per JVM, so repeated bench/
  // gate invocations never replay onto a previous run's state
  private val ivmRun = new java.util.concurrent.atomic.AtomicLong(0L)

  def queries: Map[String, Q] = Map(

    // Lead-lag cross-correlation between two segments' daily revenue
    // series at lags −7..+7 — "does BUILDING demand lead MACHINERY
    // demand, and by how many days". q157 tracks CONTEMPORANEOUS
    // co-movement in a rolling window; this shifts one whole series
    // against the other and reports the lag that maximizes Pearson
    // correlation (the classic CCF read, Box–Jenkins ch. 11). Both
    // series live on the gap-filled order-date spine (span-bounded —
    // data-size-independent after the daily rollup), so the 15-lag
    // pair frame is ≤ span×15 rows at any corpus size. Moments are
    // decimal(38,0) (q157 discipline: a daily cent sum past 2^31 —
    // real at 100 TB — overflows 64-bit squared sums); Pearson
    // assembles once per lag in doubles (cross-multiplied form,
    // zero-variance → NULL). best_lag is the deterministic argmax
    // (max corr, ties → smallest lag) attached via one-row broadcast.
    "q167_xcorr_leadlag" -> ((s, d) => {
      import s.implicits._
      val dec = "decimal(38,0)"
      val segs = Seq("BUILDING", "MACHINERY")
      val daily = Tables.load(s, d, "orders")
        .join(broadcast(Tables.load(s, d, "customer")
          .select($"c_custkey", $"c_mktsegment")
          .filter($"c_mktsegment".isin(segs: _*))),
          $"o_custkey" === $"c_custkey")
        .select($"c_mktsegment".as("seg"),
          to_date($"o_orderdate").as("day"),
          round($"o_totalprice" * 100).cast("long").as("cents"))
        .groupBy($"seg", $"day").agg(sum($"cents").as("v"))
      val span = daily.agg(min($"day").as("d0"), max($"day").as("d1"))
      val grid = span
        .select(explode(sequence($"d0", $"d1")).as("day"), $"d0")
        .crossJoin(broadcast(segs.toDF("seg")))
        .join(daily, Seq("seg", "day"), "left")
        .select($"seg", datediff($"day", $"d0").cast("long").as("di"),
          coalesce($"v", lit(0L)).cast(dec).as("v"))
      val xg = grid.filter($"seg" === "BUILDING")
        .select($"di", $"v".as("x"))
      val yg = grid.filter($"seg" === "MACHINERY")
        .select($"di".as("ydi"), $"v".as("y"))
      val lags = s.range(1).select(
        explode(sequence(lit(-7L), lit(7L))).as("lag"))
      val pr = xg.crossJoin(broadcast(lags))
        .join(yg, $"ydi" === $"di" + $"lag")
      val m = pr.groupBy($"lag").agg(
        count(lit(1)).cast(dec).as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"),
        sum(($"x" * $"y").cast(dec)).as("sxy"),
        sum(($"x" * $"x").cast(dec)).as("sxx"),
        sum(($"y" * $"y").cast(dec)).as("syy"))
      val c = m.select($"lag", $"n".cast("long").as("n_days"),
        when(($"n" * $"sxx" - $"sx" * $"sx") === 0 ||
             ($"n" * $"syy" - $"sy" * $"sy") === 0,
          lit(null).cast("double"))
          .otherwise(
            ($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
              sqrt(($"n" * $"sxx" - $"sx" * $"sx").cast("double") *
                ($"n" * $"syy" - $"sy" * $"sy").cast("double")))
          .as("raw"))
      val best = c.filter($"raw".isNotNull)
        .agg(max(struct($"raw", (-$"lag").as("nl"))).as("b"))
        .select((-$"b.nl").as("best_lag"))
      c.crossJoin(broadcast(best))
        .select($"lag", $"n_days",
          Tables.nz(round($"raw", 6)).as("xcorr"), $"best_lag")
        .orderBy($"lag")
    }),

    // Benjamini–Hochberg FDR gate over the per-event-type A/B panel —
    // the multiple-testing correction every experiment dashboard
    // needs once it reports MORE than one metric (q123 reads a single
    // z-test; five uncorrected 5%-level tests false-positive ~23% of
    // the time). Arms are the q123 parity split; per type, conversion
    // = user emitted ≥ 3 events of that type; the z statistic
    // assembles the four exact counts in q123's fixed IEEE
    // expression. p = 2(1−Φ(|z|)) via the Abramowitz–Stegun 26.2.17
    // polynomial (|err| < 7.5e-8) — computed IN-ENGINE on both sides
    // (the house ln-fold discipline: never driver-side libm vs
    // engine libm). The BH step runs in a one-row aggregate over the
    // ENUM-BOUNDED type panel (collect_list whitelisted): sort p
    // ascending, k* = max{k : p_k ≤ k·α/m}, discover ranks ≤ k*.
    // Degenerate arms (all/none convert) yield NULL z and drop out
    // of m — the gate must survive a one-sided corpus.
    "q168_fdr_bh" -> ((s, d) => {
      import s.implicits._
      val perUserType = Tables.load(s, d, "events")
        .groupBy($"user_id", $"event_type")
        .agg(count(lit(1)).as("n_ev"))
        .select($"event_type", ($"user_id" % 2 === 0).as("grp_a"),
          when($"n_ev" >= 3, 1L).otherwise(0L).as("conv"))
      val arms = Tables.load(s, d, "events")
        .select($"user_id").distinct()
        .agg(sum(when($"user_id" % 2 === 0, 1L).otherwise(0L))
          .as("na"),
          sum(when($"user_id" % 2 =!= 0, 1L).otherwise(0L)).as("nb"))
      val perType = perUserType.groupBy($"event_type")
        .agg(sum(when($"grp_a", $"conv").otherwise(0L)).as("ca"),
          sum(when(!$"grp_a", $"conv").otherwise(0L)).as("cb"))
        .crossJoin(broadcast(arms))
        .withColumn("z", when($"ca" + $"cb" > 0 &&
            $"ca" + $"cb" < $"na" + $"nb" && $"na" > 0 && $"nb" > 0,
          ($"ca".cast("double") / $"na".cast("double") -
            $"cb".cast("double") / $"nb".cast("double")) /
            sqrt((($"ca" + $"cb").cast("double") /
                ($"na" + $"nb").cast("double")) *
              (lit(1.0) - ($"ca" + $"cb").cast("double") /
                ($"na" + $"nb").cast("double")) *
              (lit(1.0) / $"na".cast("double") +
                lit(1.0) / $"nb".cast("double")))))
        .withColumn("az", abs($"z"))
        .withColumn("t", lit(1.0) / (lit(1.0) + lit(0.2316419) * $"az"))
        .withColumn("p_raw", expr(
          """2.0 * (exp(-az * az / 2.0) / 2.5066282746310002) *
             (t * (0.319381530 + t * (-0.356563782 + t *
               (1.781477937 + t * (-1.821255978 + t *
                 1.330274429)))))"""))
      // BH over the enum-bounded panel: one-row agg, ≤|event types|
      // entries (CollectGuardSpec: enum-bounded)
      val bh = perType.filter($"p_raw".isNotNull)
        .agg(sort_array(collect_list(struct($"p_raw", $"event_type")))
          .as("vals"))
        .select($"vals", size($"vals").cast("long").as("m_tests"),
          when(size($"vals") === 0, lit(0L)).otherwise(expr(
            """array_max(zip_with(vals, sequence(1, size(vals)),
               (x, k) -> IF(x.p_raw <= CAST(k AS DOUBLE) * 0.05 /
                 CAST(size(vals) AS DOUBLE), CAST(k AS BIGINT),
                 CAST(0 AS BIGINT))))""")).as("kstar"))
      perType.crossJoin(broadcast(bh))
        .select($"event_type", $"ca".as("conv_a"), $"cb".as("conv_b"),
          Tables.nz(round($"z", 4)).as("z_stat"),
          Tables.nz(round($"p_raw", 6)).as("p_value"),
          when($"p_raw".isNotNull,
            array_position($"vals", struct($"p_raw", $"event_type"))
              .cast("long")).as("p_rank"),
          $"m_tests",
          when($"p_raw".isNotNull &&
            array_position($"vals", struct($"p_raw", $"event_type"))
              <= $"kstar", 1L).otherwise(0L).as("discovered"))
        .orderBy($"event_type")
    }),

    // Split-conformal prediction intervals for the seasonal-naive
    // forecaster — the DISTRIBUTION-FREE guarantee layer on top of
    // q94/q162's point forecasts: calibrate |v − v(t−7)| on a
    // held-out 14-day window, take the ⌈(n+1)(1−α)⌉-th smallest
    // score as q̂ (α = 0.2), and audit empirical coverage of
    // v(t−7) ± q̂ on the final 7 test days (Vovk's split-conformal
    // recipe; finite-sample valid for exchangeable residuals).
    // Series ride the q162 gap-filled spine (span×|enum| — bounded);
    // scores are exact |cents| longs; q̂ is an order statistic over
    // the 14-element per-type calibration list (CollectGuardSpec:
    // frame-bounded); coverage reports as exact milli-units.
    "q169_conformal_interval" -> ((s, d) => {
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
      val lag7 = grid.select($"event_type", ($"di" + 7L).as("di"),
        $"v".as("v7"))
      val scored = grid.filter($"di" >= 7L)
        .join(lag7, Seq("event_type", "di"))
        .select($"event_type", $"di", $"dmax",
          abs($"v" - $"v7").as("score"))
      // per-type 14-element calibration list (frame-bounded)
      val cal = scored
        .filter($"di" > $"dmax" - 21L && $"di" <= $"dmax" - 7L)
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_cal"),
          sort_array(collect_list($"score")).as("ls"))
        .select($"event_type", $"n_cal",
          when($"n_cal" > 0, element_at($"ls",
            ((($"n_cal" + 1L) * 4L + 4L) / 5L).cast("int")))
            .as("q_hat_cents"))
      scored.filter($"di" > $"dmax" - 7L)
        .join(cal, Seq("event_type"))
        .groupBy($"event_type")
        .agg(first($"n_cal").as("n_cal"),
          first($"q_hat_cents").as("q_hat_cents"),
          count(lit(1)).as("n_test"),
          sum(when($"score" <= $"q_hat_cents", 1L).otherwise(0L))
            .as("n_covered"))
        .select($"event_type", $"n_cal", $"q_hat_cents", $"n_test",
          $"n_covered",
          expr("n_covered * 1000 div n_test").as("coverage_milli"))
        .orderBy($"event_type")
    }),

    // Kendall tau-b between the two segments' daily revenue series —
    // the CONCORDANCE companion of q167's Pearson CCF on the SAME
    // series pair: counts agreeing/disagreeing day-pair directions
    // instead of products, so one $50M outlier day can move it by at
    // most 1/n0 (q126's robustness argument, lifted from ranks to
    // pairs). Naive Kendall is O(rows²) and does NOT scale over a
    // corpus-sized frame; this one is EXACT AND BOUNDED because the
    // pair space is the gap-filled DAY GRID (span²/2 pairs at any
    // corpus size — the q167 spine discipline). Every count is an
    // exact long off one triangular self-join; tie corrections enter
    // via the textbook tau-b denominator; one final IEEE assembly.
    "q170_kendall_tau" -> ((s, d) => {
      import s.implicits._
      val segs = Seq("BUILDING", "MACHINERY")
      val daily = Tables.load(s, d, "orders")
        .join(broadcast(Tables.load(s, d, "customer")
          .select($"c_custkey", $"c_mktsegment")
          .filter($"c_mktsegment".isin(segs: _*))),
          $"o_custkey" === $"c_custkey")
        .select($"c_mktsegment".as("seg"),
          to_date($"o_orderdate").as("day"),
          round($"o_totalprice" * 100).cast("long").as("cents"))
        .groupBy($"seg", $"day").agg(sum($"cents").as("v"))
      val span = daily.agg(min($"day").as("d0"), max($"day").as("d1"))
      val grid = span
        .select(explode(sequence($"d0", $"d1")).as("day"), $"d0")
        .crossJoin(broadcast(segs.toDF("seg")))
        .join(daily, Seq("seg", "day"), "left")
        .select($"seg", datediff($"day", $"d0").cast("long").as("di"),
          coalesce($"v", lit(0L)).as("v"))
      val xy = grid.groupBy($"di")
        .agg(max(when($"seg" === "BUILDING", $"v")).as("x"),
          max(when($"seg" === "MACHINERY", $"v")).as("y"))
      val a = xy.select($"di".as("ai"), $"x".as("xa"), $"y".as("ya"))
      val b = xy.select($"di".as("bi"), $"x".as("xb"), $"y".as("yb"))
      val pairs = a.join(b, $"ai" < $"bi")
        .select(
          (($"xa" - $"xb") > 0 && ($"ya" - $"yb") > 0 ||
           ($"xa" - $"xb") < 0 && ($"ya" - $"yb") < 0).as("conc"),
          (($"xa" - $"xb") > 0 && ($"ya" - $"yb") < 0 ||
           ($"xa" - $"xb") < 0 && ($"ya" - $"yb") > 0).as("disc"),
          ($"xa" === $"xb").as("tx"), ($"ya" === $"yb").as("ty"))
      pairs.agg(
          count(lit(1)).as("n0"),
          sum(when($"conc", 1L).otherwise(0L)).as("nc"),
          sum(when($"disc", 1L).otherwise(0L)).as("nd"),
          sum(when($"tx", 1L).otherwise(0L)).as("tied_x"),
          sum(when($"ty", 1L).otherwise(0L)).as("tied_y"))
        .select($"n0", $"nc", $"nd", $"tied_x", $"tied_y",
          Tables.nz(round(
            when(($"n0" - $"tied_x") === 0 || ($"n0" - $"tied_y") === 0,
              lit(null).cast("double"))
              .otherwise(($"nc" - $"nd").cast("double") /
                sqrt(($"n0" - $"tied_x").cast("double") *
                  ($"n0" - $"tied_y").cast("double"))), 6))
            .as("tau_b"))
    }),

    // Mann–Whitney rank-sum test between URGENT and LOW order prices
    // — the DISTRIBUTION-FREE "is one group systematically larger"
    // readout on the exact frame q125's KS test already audits for
    // shape (KS asks "any difference anywhere"; U asks "stochastic
    // dominance" — the pair every analyst runs together). Average
    // ranks under ties ride q126's ×2-scaled count-table idiom (one
    // PrefixSum over DISTINCT cents — value-domain-bounded, never a
    // global row_number); the rank sum and the tie-correction term
    // Σ(t³−t) accumulate as decimal(38,0) over the value table (t and
    // rank2 are corpus-magnitude, their cubes/products overflow long
    // exactly when the corpus is big enough to care); U, the normal
    // mean/variance and z assemble once in doubles: u1 = u1x2/2
    // where u1x2 = 2·U₁ stays an exact decimal integer even under
    // tied (half-integer) average ranks — the one double division is
    // the display cast, identical IEEE on both engines.
    "q171_mann_whitney" -> ((s, d) => {
      import s.implicits._
      val dec = "decimal(38,0)"
      val o = Tables.load(s, d, "orders")
        .filter($"o_orderpriority".isin("1-URGENT", "5-LOW"))
        .select(round($"o_totalprice" * 100).cast("long").as("cents"),
          ($"o_orderpriority" === "1-URGENT").as("isa"))
      val byVal = o.groupBy($"cents")
        .agg(sum(when($"isa", 1L).otherwise(0L)).as("k1"),
          count(lit(1)).as("t"))
      val ranked = graft.ops.PrefixSum.runningTotal(byVal,
          Seq($"cents"), $"t", "cum")
        .select($"k1", $"t",
          (lit(2L) * $"cum" - $"t" + 1L).cast(dec).as("rank2"))
      ranked.agg(
          sum($"k1").cast(dec).as("n1d"),
          sum($"t" - $"k1").cast(dec).as("n2d"),
          sum(($"k1".cast(dec) * $"rank2").cast(dec)).as("r1x2"),
          sum(($"t".cast(dec) * $"t" * $"t" - $"t").cast(dec))
            .as("tie3"))
        // u1x2 = 2·U₁ — exact even under tied (half-integer) ranks
        .withColumn("nd", $"n1d" + $"n2d")
        .withColumn("u1x2",
          ($"r1x2" - $"n1d" * ($"n1d" + 1)).cast(dec))
        .select(
          $"n1d".cast("long").as("n1"), $"n2d".cast("long").as("n2"),
          ($"u1x2".cast("double") / 2.0).as("u1"),
          Tables.nz(round(
            when($"n1d" === 0 || $"n2d" === 0 || $"nd" < 2 ||
                $"tie3" === ($"nd" + 1) * $"nd" * ($"nd" - 1),
              lit(null).cast("double"))
              .otherwise(
                (($"u1x2" - $"n1d" * $"n2d").cast("double") / 2.0) /
                sqrt(($"n1d" * $"n2d").cast("double") / 12.0 *
                  (($"nd" + 1).cast("double") -
                    $"tie3".cast("double") /
                      ($"nd" * ($"nd" - 1)).cast("double")))), 4))
            .as("z_stat"))
    }),

    // Yuen's trimmed-mean test between URGENT and LOW order prices —
    // the ROBUST location test completing the q125/q171 panel (KS:
    // any difference; U: stochastic dominance; Yuen: trimmed-mean
    // difference that a 1% price-glitch tail cannot move — the
    // heavy-tail case where Student's t silently loses power).
    // Rank-based 20% trimming runs EXACTLY on the count table (one
    // rollup over DISTINCT cents — value-domain-bounded): each value
    // cell contributes max(0, min(cum, n−r) − max(cum−cnt, r))
    // occurrences to the trimmed sum, the winsorized tails re-enter
    // at the exact boundary order statistics x_(r+1)/x_(n−r), and
    // the winsorized SS n·Σw² − (Σw)² stays decimal(38,0) to the
    // 100 TB magnitude. Yuen's d_g = SSw/(n·h·(h−1)) and the final
    // t assemble once in doubles (h = n − 2r).
    "q172_yuen_trimmed" -> ((s, d) => {
      import s.implicits._
      val dec = "decimal(38,0)"
      val o = Tables.load(s, d, "orders")
        .filter($"o_orderpriority".isin("1-URGENT", "5-LOW"))
        .select(
          when($"o_orderpriority" === "1-URGENT", "urgent")
            .otherwise("low").as("grp"),
          round($"o_totalprice" * 100).cast("long").as("cents"))
      val byVal = o.groupBy($"grp", $"cents")
        .agg(count(lit(1)).as("cnt"))
      val ns = byVal.groupBy($"grp").agg(sum($"cnt").as("n"))
        .withColumn("r", expr("n div 5"))
        .withColumn("h", $"n" - lit(2L) * $"r")
      val wCum = org.apache.spark.sql.expressions.Window
        .partitionBy($"grp").orderBy($"cents")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      val cells = byVal
        .withColumn("cum", sum($"cnt").over(wCum))
        .join(broadcast(ns), Seq("grp"))
        .withColumn("c_mid",
          greatest(lit(0L), least($"cum", $"n" - $"r") -
            greatest($"cum" - $"cnt", $"r")))
      val bounds = cells.groupBy($"grp")
        .agg(min(when($"cum" >= $"r" + 1L, $"cents")).as("xlo"),
          min(when($"cum" >= $"n" - $"r", $"cents")).as("xhi"))
      val per = cells.groupBy($"grp")
        .agg(min($"n").as("n"), min($"r").as("r"), min($"h").as("h"),
          sum(($"c_mid".cast(dec) * $"cents").cast(dec)).as("tsum"),
          sum(($"c_mid".cast(dec) * $"cents" * $"cents").cast(dec))
            .as("tsq"))
        .join(broadcast(bounds), Seq("grp"))
        .withColumn("wsum", ($"tsum" + $"r".cast(dec) *
          ($"xlo".cast(dec) + $"xhi".cast(dec))).cast(dec))
        .withColumn("wsq", ($"tsq" + $"r".cast(dec) *
          ($"xlo".cast(dec) * $"xlo" + $"xhi".cast(dec) * $"xhi"))
          .cast(dec))
        .withColumn("ssw",
          ($"n".cast(dec) * $"wsq" - $"wsum" * $"wsum").cast(dec))
      per.agg(
          max(when($"grp" === "urgent", $"n")).as("n1"),
          max(when($"grp" === "low", $"n")).as("n2"),
          max(when($"grp" === "urgent", $"h")).as("h1"),
          max(when($"grp" === "low", $"h")).as("h2"),
          max(when($"grp" === "urgent", $"tsum")).as("ts1"),
          max(when($"grp" === "low", $"tsum")).as("ts2"),
          max(when($"grp" === "urgent", $"ssw")).as("ssw1"),
          max(when($"grp" === "low", $"ssw")).as("ssw2"))
        .select($"n1", $"n2", $"h1", $"h2",
          Tables.nz(round($"ts1".cast("double") /
            $"h1".cast("double"), 4)).as("tmean_urgent"),
          Tables.nz(round($"ts2".cast("double") /
            $"h2".cast("double"), 4)).as("tmean_low"),
          Tables.nz(round(
            when($"h1" < 2 || $"h2" < 2 ||
                ($"ssw1" === 0 && $"ssw2" === 0),
              lit(null).cast("double"))
              .otherwise(
                ($"ts1".cast("double") / $"h1".cast("double") -
                 $"ts2".cast("double") / $"h2".cast("double")) /
                sqrt($"ssw1".cast("double") /
                    ($"n1".cast("double") * $"h1".cast("double") *
                      ($"h1" - 1).cast("double")) +
                  $"ssw2".cast("double") /
                    ($"n2".cast("double") * $"h2".cast("double") *
                      ($"h2" - 1).cast("double")))),
            4)).as("t_yuen"))
    }),

    // OLS influence diagnostics of the per-type daily revenue trend —
    // WHICH days bend the fitted line (q141 fits the robust slope;
    // q149 the elasticity; neither says "day 217 alone moved the
    // trend"). The regression runs on the gap-filled COMPLETE day
    // grid in the ×2-centered design u = 2t−(n−1), so Σu = 0 EXACTLY
    // and every OLS quantity is a ratio of exact decimal(38,0)
    // moments: residual e = (v·n·Σu² − Σv·Σu² − n·Σuv·u)/(n·Σu²),
    // leverage h = 1/n + u²/Σu², SSE·(n·Σu²) = n·Σu²·Σvv −
    // Σv²·Σu² − n·(Σuv)² — one IEEE assembly per day. Reports the
    // days with Cook's D > 4/n (the textbook screen; output is
    // influential-days-bounded). Widths: the (Σuv)² term caps the
    // exact domain near daily cent sums ~8e11 × span 2400
    // (≈ sf 100 events) — documented, MomentWidthSpec-pinned.
    "q173_ols_influence" -> ((s, d) =>
      olsInfluence(Tables.load(s, d, "events"))),

    // Jarque–Bera normality screen of each type's daily revenue —
    // the distribution-shape gate the q173 diagnostics assume: OLS
    // t/F reads are only calibrated if residual/level noise is
    // near-Gaussian, and JB is the standard omnibus (skewness² +
    // excess-kurtosis²) test. Runs on the gap-filled daily grid
    // (span-bounded after one corpus rollup). Raw power sums Σc..Σc⁴
    // are decimal(38,0) over INTEGER-PIVOT-CENTERED cents c = v − p
    // (p = round(mean) — an agreed exact integer on both engines),
    // which kills the cancellation that raw Σv⁴ assembly would hit
    // and keeps the exact domain at |c| ≲ 4.5e8 cents of daily
    // deviation (≈ sf100 events; MomentWidthSpec pins past-long
    // exactness — c⁴ overflows int64 at |c| > 55k cents, so decimal
    // is load-bearing even at sf0.01). Central moments and JB
    // assemble once per type in doubles; p-value is the closed-form
    // χ²(2) tail exp(−JB/2) — in-engine on both sides.
    "q174_jarque_bera" -> ((s, d) =>
      jarqueBera(Tables.load(s, d, "events"))),

    // Partial correlation of the BUILDING and MACHINERY daily revenue
    // series CONTROLLING for the total market — "do the two segments
    // co-move beyond what the shared market tide explains". q167's
    // CCF reads their raw co-movement; a common driver (seasonality,
    // promotions) inflates it — the first-order partial
    // r_xy·z = (r_xy − r_xz·r_yz)/√((1−r_xz²)(1−r_yz²)) removes the
    // linear effect of the total. All three series live on the
    // gap-filled order-date spine (span-bounded after one corpus
    // rollup); the three Pearson terms assemble from one shared set
    // of decimal(38,0) moments in q167's cross-multiplied shape.
    // Degenerate guards: any zero-variance series → NULL r's; a
    // perfectly-explained pair (|r·z| = 1) → NULL partial.
    "q175_partial_corr" -> ((s, d) => {
      import s.implicits._
      val dec = "decimal(38,0)"
      val segs = Seq("BUILDING", "MACHINERY")
      val o = Tables.load(s, d, "orders")
        .join(broadcast(Tables.load(s, d, "customer")
          .select($"c_custkey", $"c_mktsegment")),
          $"o_custkey" === $"c_custkey")
        .select($"c_mktsegment".as("seg"),
          to_date($"o_orderdate").as("day"),
          round($"o_totalprice" * 100).cast("long").as("cents"))
      val daily = o.groupBy($"day").agg(
        sum(when($"seg" === "BUILDING", $"cents").otherwise(0L))
          .as("xv"),
        sum(when($"seg" === "MACHINERY", $"cents").otherwise(0L))
          .as("yv"),
        sum($"cents").as("zv"))
      val span = daily.agg(min($"day").as("d0"), max($"day").as("d1"))
      val grid = span
        .select(explode(sequence($"d0", $"d1")).as("day"))
        .join(daily, Seq("day"), "left")
        .select(coalesce($"xv", lit(0L)).cast(dec).as("x"),
          coalesce($"yv", lit(0L)).cast(dec).as("y"),
          coalesce($"zv", lit(0L)).cast(dec).as("z"))
      val m = grid.agg(count(lit(1)).cast(dec).as("n"),
        sum($"x").as("sx"), sum($"y").as("sy"), sum($"z").as("sz"),
        sum(($"x" * $"x").cast(dec)).as("sxx"),
        sum(($"y" * $"y").cast(dec)).as("syy"),
        sum(($"z" * $"z").cast(dec)).as("szz"),
        sum(($"x" * $"y").cast(dec)).as("sxy"),
        sum(($"x" * $"z").cast(dec)).as("sxz"),
        sum(($"y" * $"z").cast(dec)).as("syz"))
      def corr2(sab: String, a: String, b: String) = {
        val (saa, sbb) = (s"s$a$a", s"s$b$b")
        val (sa, sb) = (s"s$a", s"s$b")
        when((col("n") * col(saa) - col(sa) * col(sa)) === 0 ||
             (col("n") * col(sbb) - col(sb) * col(sb)) === 0,
          lit(null).cast("double"))
          .otherwise(
            (col("n") * col(sab) - col(sa) * col(sb)).cast("double") /
              sqrt((col("n") * col(saa) - col(sa) * col(sa))
                  .cast("double") *
                (col("n") * col(sbb) - col(sb) * col(sb))
                  .cast("double")))
      }
      m.select($"n".cast("long").as("n_days"),
          corr2("sxy", "x", "y").as("rxy"),
          corr2("sxz", "x", "z").as("rxz"),
          corr2("syz", "y", "z").as("ryz"))
        .select($"n_days",
          Tables.nz(round($"rxy", 6)).as("r_xy"),
          Tables.nz(round($"rxz", 6)).as("r_xz"),
          Tables.nz(round($"ryz", 6)).as("r_yz"),
          Tables.nz(round(
            when($"rxy".isNull || $"rxz".isNull || $"ryz".isNull ||
                (lit(1.0) - $"rxz" * $"rxz") *
                  (lit(1.0) - $"ryz" * $"ryz") <= 0.0,
              lit(null).cast("double"))
              .otherwise(($"rxy" - $"rxz" * $"ryz") /
                sqrt((lit(1.0) - $"rxz" * $"rxz") *
                  (lit(1.0) - $"ryz" * $"ryz"))), 6))
            .as("r_partial"))
    }),

    // Durbin–Watson serial-correlation screen of the q173 trend
    // residuals — the OTHER classical OLS diagnostic: influence asks
    // "which day bent the line", DW asks "are the errors even
    // independent" (positively autocorrelated residuals make every
    // q173/q141 trend SE overconfident). Rides the SAME
    // olsResidualGrid frame as q173 (one shared derivation — the
    // q101/q158 LPA-sharing lesson applied at birth). Each residual
    // e_t is the exact-decimal ratio esc/(n·Σu²) assembled
    // identically on both engines; DW = Σ(e_t−e_{t−1})²/Σe_t² and
    // ρ₁ = Σe_t·e_{t−1}/Σe_t² fold the span-bounded per-type daily
    // series in DAY ORDER (sorted-array IEEE folds, the q160
    // discipline — a groupBy SUM of doubles would be
    // order-nondeterministic across engines).
    "q176_durbin_watson" -> ((s, d) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"event_type").orderBy($"day")
      val terms = olsResidualGrid(Tables.load(s, d, "events"))
        .select($"event_type", $"day", $"n", $"e")
        .withColumn("ep", lag($"e", 1).over(w))
        .select($"event_type", $"day", $"n",
          ($"e" * $"e").as("e2"),
          coalesce((($"e" - $"ep") * ($"e" - $"ep")), lit(0.0))
            .as("d2"),
          coalesce($"e" * $"ep", lit(0.0)).as("cr"))
      terms.groupBy($"event_type")
        .agg(min($"n").as("n_days"),
          sort_array(collect_list(struct($"day", $"e2", $"d2",
            $"cr"))).as("arr"))
        .select($"event_type", $"n_days",
          expr("""aggregate(arr, CAST(0.0 AS DOUBLE),
               (a, x) -> a + x.e2)""").as("se2"),
          expr("""aggregate(arr, CAST(0.0 AS DOUBLE),
               (a, x) -> a + x.d2)""").as("sd2"),
          expr("""aggregate(arr, CAST(0.0 AS DOUBLE),
               (a, x) -> a + x.cr)""").as("scr"))
        .select($"event_type", $"n_days",
          Tables.nz(round(
            when($"se2" === 0.0, lit(null).cast("double"))
              .otherwise($"sd2" / $"se2"), 5)).as("dw"),
          Tables.nz(round(
            when($"se2" === 0.0, lit(null).cast("double"))
              .otherwise($"scr" / $"se2"), 5)).as("rho1"))
        .orderBy($"event_type")
    }),

    // Simpson diversity of each language's token distribution —
    // λ = Σnᵢ(nᵢ−1)/(N(N−1)), the probability two tokens drawn
    // without replacement are the SAME type, and 1/λ the "effective
    // vocabulary" (how many equally-common types would look like
    // this corpus). The concentration companion of text_hapax_ratio
    // (type frontier) and text_zipf_rank_score (rank law): hapax
    // reads the tail, Simpson the head — a boilerplate-flooded
    // corpus shows λ spiking while TTR still looks healthy. One
    // (lang, token) map-side-combined rollup; numerator and
    // denominator decimal(38,0) (Σnᵢ² passes long at ~3e9 tokens per
    // language — real at 100 TB), one IEEE ratio.
    "text_simpson_diversity" -> ((s, d) => {
      import s.implicits._
      val dec = "decimal(38,0)"
      Tables.spread(Tables.load(s, d, "documents"))
        .select($"lang",
          explode(split(lower($"text"), "\\s+")).as("token"))
        .groupBy($"lang", $"token").agg(count(lit(1)).as("c"))
        .groupBy($"lang")
        .agg(sum($"c").cast(dec).as("n_tok"),
          count(lit(1)).as("n_types"),
          sum(($"c".cast(dec) * ($"c" - 1L)).cast(dec)).as("num"))
        .select($"lang", $"n_tok".cast("long").as("n_tokens"),
          $"n_types",
          Tables.nz(round(
            when($"n_tok" < 2, lit(null).cast("double"))
              .otherwise($"num".cast("double") /
                ($"n_tok" * ($"n_tok" - 1)).cast("double")), 6))
            .as("simpson"),
          Tables.nz(round(
            when($"n_tok" < 2 || $"num" === 0,
              lit(null).cast("double"))
              .otherwise(($"n_tok" * ($"n_tok" - 1)).cast("double") /
                $"num".cast("double")), 4)).as("inv_simpson"))
        .orderBy($"lang")
    }),

    // Cohen's kappa between two length "raters" on the documents
    // table — chance-corrected agreement, the metric behind every
    // labeling-QA dashboard ("my two quality heuristics agree 85% of
    // the time" is meaningless when the marginals already force 80%).
    // Rater A buckets by stored n_chars, rater B by tokenizer output
    // (whitespace token count): their kappa is exactly the
    // stored-metadata-vs-recomputed drift read that q148_schema_drift
    // does for schemas, applied to annotations. The 3×3 contingency
    // is enum-bounded after one corpus pass; κ = (N·diag − Σrᵢcᵢ)/
    // (N² − Σrᵢcᵢ) assembles from exact decimal(38,0) products (row
    // marginal products pass long at ~3e9 docs — real at 100 TB).
    "q177_cohens_kappa" -> ((s, d) => {
      import s.implicits._
      val dec = "decimal(38,0)"
      val ntok = size(split(lower($"text"), "\\s+"))
      val cell = Tables.spread(Tables.load(s, d, "documents"))
        .select(
          when($"n_chars" < 200L, "short")
            .when($"n_chars" < 1000L, "medium")
            .otherwise("long").as("ra"),
          when(ntok < 40, "short")
            .when(ntok < 200, "medium")
            .otherwise("long").as("rb"))
        .groupBy($"ra", $"rb").agg(count(lit(1)).as("c"))
      val m = cell.agg(sum($"c").cast(dec).as("n"),
        sum(when($"ra" === $"rb", $"c").otherwise(0L)).cast(dec)
          .as("diag"))
      val rowm = cell.groupBy($"ra").agg(sum($"c").as("rn"))
      val colm = cell.groupBy($"rb").agg(sum($"c").as("cn"))
      val pen = rowm.join(colm, $"ra" === $"rb")
        .agg(coalesce(sum(($"rn".cast(dec) * $"cn").cast(dec)),
          lit(0).cast(dec)).as("pen"))
      m.crossJoin(pen)
        .select($"n".cast("long").as("n_docs"),
          Tables.nz(round(
            when($"n" === 0, lit(null).cast("double"))
              .otherwise($"diag".cast("double") / $"n".cast("double")),
            6)).as("p_observed"),
          Tables.nz(round(
            when($"n" === 0, lit(null).cast("double"))
              .otherwise($"pen".cast("double") /
                ($"n" * $"n").cast("double")), 6)).as("p_expected"),
          Tables.nz(round(
            when(($"n" * $"n" - $"pen") === 0,
              lit(null).cast("double"))
              .otherwise(($"n" * $"diag" - $"pen").cast("double") /
                ($"n" * $"n" - $"pen").cast("double")), 6))
            .as("kappa"))
    }),

    // Kruskal–Wallis rank ANOVA of order price across the 7 weekdays
    // — the k-sample generalization of q171's two-sample U: "does
    // price distribution differ by weekday AT ALL" (the omnibus
    // q165's median polish decomposes but never tests). Rides the
    // q126/q171 ×2-scaled count-table rank idiom: one rollup over
    // DISTINCT cents (value-domain-bounded), PrefixSum average ranks,
    // per-group rank sums as decimal(38,0) (2R_g ~ N² passes long at
    // ~3e9 orders). H assembles over the ≤7-row weekday panel in one
    // sorted-array fold (CollectGuard: enum-bounded); tie correction
    // 1 − Σ(t³−t)/(N³−N) exact-decimal; p-value via the CLOSED-FORM
    // even-dof χ²(6) survival exp(−h/2)(1+q+q²/2) — in-engine both
    // sides, only emitted when all 7 weekdays are present (dof = 6).
    "q178_kruskal_wallis" -> ((s, d) => {
      import s.implicits._
      val dec = "decimal(38,0)"
      val o = Tables.load(s, d, "orders")
        .select(round($"o_totalprice" * 100).cast("long").as("cents"),
          pmod(datediff(to_date($"o_orderdate"), lit("1970-01-05")),
            lit(7)).cast("long").as("wd"))
      val bv = o.groupBy($"cents", $"wd").agg(count(lit(1)).as("c"))
      val tv = o.groupBy($"cents").agg(count(lit(1)).as("t"))
      val ranked = graft.ops.PrefixSum.runningTotal(tv,
          Seq($"cents"), $"t", "cum")
        .select($"cents",
          (lit(2L) * $"cum" - $"t" + 1L).cast(dec).as("rank2"))
      val grp = bv.join(ranked, Seq("cents"))
        .groupBy($"wd")
        .agg(sum($"c").as("ng"),
          sum(($"c".cast(dec) * $"rank2").cast(dec)).as("rg2"))
      val glob = tv.agg(sum($"t").cast(dec).as("n"),
        sum(($"t".cast(dec) * $"t" * $"t" - $"t").cast(dec))
          .as("tie3"))
      val panel = grp.agg(count(lit(1)).as("n_groups"),
          sort_array(collect_list(struct($"wd", $"ng", $"rg2")))
            .as("arr"))
        .crossJoin(broadcast(glob))
        .withColumn("nd", $"n".cast("double"))
        .withColumn("sterm", expr(
          """aggregate(arr, CAST(0.0 AS DOUBLE), (a, x) ->
             a + (CAST(x.rg2 AS DOUBLE) / 2.0 *
               (CAST(x.rg2 AS DOUBLE) / 2.0)) /
               CAST(x.ng AS DOUBLE))"""))
        .withColumn("h",
          when($"n_groups" < 2 || $"n" < 2, lit(null).cast("double"))
            .otherwise(lit(12.0) / ($"nd" * ($"nd" + lit(1.0))) *
              $"sterm" - lit(3.0) * ($"nd" + lit(1.0))))
        .withColumn("corr",
          lit(1.0) - $"tie3".cast("double") /
            ($"n" * $"n" * $"n" - $"n").cast("double"))
        .withColumn("htc",
          when($"h".isNull || $"corr" === 0.0,
            lit(null).cast("double"))
            .otherwise($"h" / $"corr"))
      panel.select($"n".cast("long").as("n_orders"), $"n_groups",
          Tables.nz(round($"h", 4)).as("h_stat"),
          Tables.nz(round($"htc", 4)).as("h_tie_corr"),
          Tables.nz(round(
            when($"n_groups" =!= 7 || $"htc".isNull,
              lit(null).cast("double"))
              .otherwise(exp(-$"htc" / lit(2.0)) *
                (lit(1.0) + $"htc" / lit(2.0) +
                  ($"htc" / lit(2.0)) * ($"htc" / lit(2.0)) /
                    lit(2.0))), 6)).as("p_value"))
    }),

    // One-way ANOVA F of order price across weekdays — the parametric
    // companion the q178 omnibus reads against (KW tests rank
    // dominance; F tests mean shifts under equal-variance normality).
    // SSB/SSW assemble from exact decimal(38,0) group moments (Σv,
    // Σv², n per weekday: v² passes long at order prices ≥ $30M —
    // decimal from birth); the Σ(s_g²/n_g) term folds over the
    // ≤7-row weekday panel in weekday order (one sorted-array IEEE
    // fold, CollectGuard-annotated), F and η² assemble once.
    "q179_weekday_anova" -> ((s, d) => {
      import s.implicits._
      val dec = "decimal(38,0)"
      val o = Tables.load(s, d, "orders")
        .select(round($"o_totalprice" * 100).cast("long").as("v"),
          pmod(datediff(to_date($"o_orderdate"), lit("1970-01-05")),
            lit(7)).cast("long").as("wd"))
      val grp = o.groupBy($"wd")
        .agg(count(lit(1)).as("ng"),
          sum($"v".cast(dec)).as("sg"),
          sum(($"v".cast(dec) * $"v").cast(dec)).as("sgg"))
      val panel = grp.agg(count(lit(1)).as("k"),
          sum($"ng").cast(dec).as("n"),
          sum($"sg").cast(dec).as("sv"),
          sum($"sgg").cast(dec).as("svv"),
          sort_array(collect_list(struct($"wd", $"ng", $"sg")))
            .as("arr"))
        .withColumn("sbterm", expr(
          """aggregate(arr, CAST(0.0 AS DOUBLE), (a, x) ->
             a + (CAST(x.sg AS DOUBLE) * CAST(x.sg AS DOUBLE)) /
               CAST(x.ng AS DOUBLE))"""))
        .withColumn("nd", $"n".cast("double"))
        .withColumn("ssb", $"sbterm" -
          $"sv".cast("double") * $"sv".cast("double") / $"nd")
        .withColumn("ssw", $"svv".cast("double") - $"sbterm")
        .withColumn("sst", $"svv".cast("double") -
          $"sv".cast("double") * $"sv".cast("double") / $"nd")
      panel.select($"n".cast("long").as("n_orders"),
          $"k".as("n_groups"),
          Tables.nz(round(
            when($"k" < 2 || $"n" <= $"k".cast(dec) ||
                $"ssw" <= 0.0, lit(null).cast("double"))
              .otherwise(($"ssb" / ($"k" - 1L).cast("double")) /
                ($"ssw" / ($"nd" - $"k".cast("double")))), 4))
            .as("f_stat"),
          Tables.nz(round(
            when($"sst" <= 0.0, lit(null).cast("double"))
              .otherwise($"ssb" / $"sst"), 6)).as("eta_sq"))
    }),

    // Brown–Forsythe (median-based Levene) homogeneity-of-variance
    // test across weekdays — the assumption check q179's classic F
    // silently makes (equal group variances): one-way ANOVA on the
    // absolute deviations from each group's median. Group medians are
    // the house lower median (Quantiles.exactByGroup p=0.5 — the
    // exact count-table order statistic q80_mad uses, rank
    // floor(0.5(n−1))+1), broadcast back as a ≤7-row frame, so the
    // deviations stay integral longs and the ANOVA-on-deviations
    // reuses q179's exact decimal(38,0) moment shape verbatim.
    "q181_levene_bf" -> ((s, d) => {
      import s.implicits._
      val dec = "decimal(38,0)"
      val o = Tables.load(s, d, "orders")
        .select(round($"o_totalprice" * 100).cast("long").as("cents"),
          pmod(datediff(to_date($"o_orderdate"), lit("1970-01-05")),
            lit(7)).cast("long").as("wd"))
      val med = graft.ops.Quantiles.exactByGroup(o, "wd", $"cents",
        Seq("med_cents" -> 0.5))
      val dev = o.join(broadcast(med.drop("n")), Seq("wd"))
        .select($"wd", abs($"cents" - $"med_cents").as("v"))
      val grp = dev.groupBy($"wd")
        .agg(count(lit(1)).as("ng"),
          sum($"v".cast(dec)).as("sg"),
          sum(($"v".cast(dec) * $"v").cast(dec)).as("sgg"))
      val panel = grp.agg(count(lit(1)).as("k"),
          sum($"ng").cast(dec).as("n"),
          sum($"sg").cast(dec).as("sv"),
          sum($"sgg").cast(dec).as("svv"),
          sort_array(collect_list(struct($"wd", $"ng", $"sg")))
            .as("arr"))
        .withColumn("sbterm", expr(
          """aggregate(arr, CAST(0.0 AS DOUBLE), (a, x) ->
             a + (CAST(x.sg AS DOUBLE) * CAST(x.sg AS DOUBLE)) /
               CAST(x.ng AS DOUBLE))"""))
        .withColumn("nd", $"n".cast("double"))
        .withColumn("ssb", $"sbterm" -
          $"sv".cast("double") * $"sv".cast("double") / $"nd")
        .withColumn("ssw", $"svv".cast("double") - $"sbterm")
      panel.select($"n".cast("long").as("n_orders"),
          $"k".as("n_groups"),
          Tables.nz(round(
            when($"k" < 2 || $"n" <= $"k".cast(dec) ||
                $"ssw" <= 0.0, lit(null).cast("double"))
              .otherwise(($"ssb" / ($"k" - 1L).cast("double")) /
                ($"ssw" / ($"nd" - $"k".cast("double")))), 4))
            .as("f_bf"))
    }),

    // Welch's heteroscedastic one-way ANOVA on the same weekday frame
    // — the robust companion that stays valid exactly when q181 says
    // q179's equal-variance assumption fails. Assembles ENTIRELY from
    // q179's exact decimal group moments (n, Σv, Σv² per weekday):
    // per-group mean and variance become weights w_g = n_g/s²_g, and
    // the Welch F* and Satterthwaite dof fold over the ≤7-row enum
    // panel in weekday order (four chained IEEE folds — W, weighted
    // mean, between-term, correction term — each deterministic).
    "q182_welch_anova" -> ((s, d) => {
      import s.implicits._
      val dec = "decimal(38,0)"
      val o = Tables.load(s, d, "orders")
        .select(round($"o_totalprice" * 100).cast("long").as("v"),
          pmod(datediff(to_date($"o_orderdate"), lit("1970-01-05")),
            lit(7)).cast("long").as("wd"))
      val grp = o.groupBy($"wd")
        .agg(count(lit(1)).as("ng"),
          sum($"v".cast(dec)).as("sg"),
          sum(($"v".cast(dec) * $"v").cast(dec)).as("sgg"))
      val panel = grp.agg(count(lit(1)).as("k"),
          sum($"ng").cast(dec).as("n"),
          min($"ng").as("min_ng"),
          // a zero-variance group makes w_g = n/0: Inf/NaN outputs,
          // and double-div-by-zero semantics differ across DuckDB
          // versions — guard on min per-group variance > 0 (r14
          // ADVICE; min_ng >= 2 alone does not cover it)
          min(($"sgg".cast("double") -
              $"sg".cast("double") * $"sg".cast("double") /
                $"ng".cast("double")) /
            ($"ng".cast("double") - 1.0)).as("min_s2"),
          sort_array(collect_list(struct($"wd", $"ng", $"sg", $"sgg")))
            .as("arr"))
        // per-group w_g = n_g / s²_g with s²_g the unbiased variance
        // off the exact moments; folds below all run in wd order
        .withColumn("warr", expr(
          """transform(arr, x -> named_struct(
             'w', CAST(x.ng AS DOUBLE) /
               ((CAST(x.sgg AS DOUBLE) -
                 CAST(x.sg AS DOUBLE) * CAST(x.sg AS DOUBLE) /
                   CAST(x.ng AS DOUBLE)) /
                (CAST(x.ng AS DOUBLE) - 1.0)),
             'yb', CAST(x.sg AS DOUBLE) / CAST(x.ng AS DOUBLE),
             'ng', CAST(x.ng AS DOUBLE)))"""))
        .withColumn("bigw", expr(
          """aggregate(warr, CAST(0.0 AS DOUBLE),
             (a, x) -> a + x.w)"""))
        .withColumn("ybw", expr(
          """aggregate(warr, CAST(0.0 AS DOUBLE),
             (a, x) -> a + x.w * x.yb)""") / $"bigw")
        .withColumn("aterm", expr(
          """aggregate(warr, CAST(0.0 AS DOUBLE),
             (a, x) -> a + x.w * (x.yb - ybw) * (x.yb - ybw))""") /
          ($"k" - 1L).cast("double"))
        .withColumn("bterm", expr(
          """aggregate(warr, CAST(0.0 AS DOUBLE),
             (a, x) -> a + (1.0 - x.w / bigw) * (1.0 - x.w / bigw) /
               (x.ng - 1.0))"""))
        .withColumn("kd", $"k".cast("double"))
      panel.select($"n".cast("long").as("n_orders"),
          $"k".as("n_groups"),
          Tables.nz(round(
            when($"k" < 2 || $"min_ng" < 2L || !($"min_s2" > 0.0),
              lit(null).cast("double"))
              .otherwise($"aterm" /
                (lit(1.0) + lit(2.0) * ($"kd" - 2.0) /
                  ($"kd" * $"kd" - 1.0) * $"bterm")), 4))
            .as("f_welch"),
          Tables.nz(round(
            when($"k" < 2 || $"min_ng" < 2L || !($"min_s2" > 0.0) ||
              $"bterm" === 0.0,
              lit(null).cast("double"))
              .otherwise(($"kd" * $"kd" - 1.0) /
                (lit(3.0) * $"bterm")), 2)).as("dof2"))
    }),

    // Friedman blocked rank test: do weekdays differ CONSISTENTLY
    // month after month? Blocks = calendar months (only complete
    // blocks with all 7 weekdays), treatments = weekdays, observation
    // = the month×weekday revenue total. The (month, weekday) rollup
    // is span-bounded (months × 7 cells at ANY corpus size), ranks
    // within each 7-cell block are exact ×2-scaled average tied ranks
    // (2·cnt_lt + cnt_eq + 1 — rank() + an equality-count window,
    // both over 7-row partitions), and χ²_F assembles from the
    // ≤7-row per-weekday rank sums in one wd-ordered fold.
    // Uncorrected-for-ties form (documented: observations are
    // month-level cent sums — exact integer ties are measure-zero,
    // and both engines compute identical average ranks either way);
    // p via the closed χ²(6) survival (k−1 = 6, even) when k = 7.
    "q183_friedman" -> ((s, d) => {
      import s.implicits._
      val dec = "decimal(38,0)"
      val cells = Tables.load(s, d, "orders")
        .select((year(to_date($"o_orderdate")) * 12 +
            month(to_date($"o_orderdate"))).cast("long").as("m"),
          pmod(datediff(to_date($"o_orderdate"), lit("1970-01-05")),
            lit(7)).cast("long").as("wd"),
          round($"o_totalprice" * 100).cast("long").as("cents"))
        .groupBy($"m", $"wd")
        .agg(sum($"cents".cast(dec)).as("v"))
      val full = cells
        .withColumn("nw", count(lit(1))
          .over(Window.partitionBy($"m")))
        .filter($"nw" === 7)
      val wLt = Window.partitionBy($"m").orderBy($"v")
      val wEq = Window.partitionBy($"m", $"v")
      val ranked = full
        .withColumn("rk", rank().over(wLt).cast("long"))
        .withColumn("ceq", count(lit(1)).over(wEq).cast("long"))
        .withColumn("rank2", lit(2L) * ($"rk" - 1L) + $"ceq" + 1L)
      val rj = ranked.groupBy($"wd")
        .agg(sum($"rank2").as("r2j"), count(lit(1)).as("b"))
      val panel = rj.agg(count(lit(1)).as("k"),
          max($"b").as("b"),
          sort_array(collect_list(struct($"wd", $"r2j"))).as("arr"))
        .withColumn("sr2", expr(
          """aggregate(arr, CAST(0.0 AS DOUBLE), (a, x) ->
             a + (CAST(x.r2j AS DOUBLE) / 2.0) *
               (CAST(x.r2j AS DOUBLE) / 2.0))"""))
        .withColumn("bd", $"b".cast("double"))
        .withColumn("kd", $"k".cast("double"))
        .withColumn("chi2", lit(12.0) /
          ($"bd" * $"kd" * ($"kd" + 1.0)) * $"sr2" -
          lit(3.0) * $"bd" * ($"kd" + 1.0))
      panel.select($"b".as("n_blocks"), $"k".as("n_groups"),
          Tables.nz(round(when($"b" < 2L, lit(null).cast("double"))
            .otherwise($"chi2"), 4)).as("chi2_f"),
          Tables.nz(round(
            when($"k" =!= 7L || $"b" < 2L, lit(null).cast("double"))
              .otherwise(exp(-$"chi2" / lit(2.0)) *
                (lit(1.0) + $"chi2" / lit(2.0) +
                  ($"chi2" / lit(2.0)) * ($"chi2" / lit(2.0)) /
                    lit(2.0))), 6)).as("p_value"))
    }),

    // IVM parity twin of the streaming CUSUM monitor (r13 verdict
    // item #8): the corpus is replayed through the PRODUCTION
    // foreachBatch state machinery — StreamOps.cusumDriftBatch's
    // swap-renamed parquet state, fed three chronological delta
    // batches — and the served snapshot (cusumDriftSnapshot =
    // Mining.cusumOverDaily over the merged state) is what the
    // oracle hashes. The oracle recomputes q84's CUSUM directly over
    // the full table, so the hash match IS the proof that
    // merge(merge(partial(b1), partial(b2)), partial(b3)) ==
    // recompute(full) — the q64 IVM contract, extended to the
    // streaming sink's on-disk state path. State is domain-bounded
    // (types × days rows, never event-sized); the fact table is
    // scanned once per delta, exactly as a micro-batch would.
    "q180_cusum_ivm" -> ((s, d) => {
      import s.implicits._
      val daily = Tables.load(s, d, "events")
        .select($"event_type",
          datediff(to_date($"ts"), lit("2024-01-01")).cast("long")
            .as("day"),
          round($"value" * 100).cast("long").as("cents"))
      // fresh state per invocation (replay on existing state would
      // double-count), but under the ScratchDir root so the JVM
      // shutdown hook reclaims it — a bench retry loop must not leak
      // one parquet state tree per call into /tmp (r14 ADVICE). The
      // snapshot below reads the parquet lazily, so cleanup has to be
      // at-exit, not eager.
      val stateDir = ScratchDir.path(
        s"cusum_ivm_${ivmRun.incrementAndGet()}") + "/state"
      // three chronological micro-batches (thirds of the year) —
      // each write goes through the torn-restart-safe swap-rename
      Seq($"day" < 120L, $"day" >= 120L && $"day" < 240L,
        $"day" >= 240L).zipWithIndex.foreach { case (pred, i) =>
        graft.streaming.StreamOps.cusumDriftBatch(stateDir)(
          daily.filter(pred), i.toLong)
      }
      graft.streaming.StreamOps.cusumDriftSnapshot(s, stateDir)
    }),

    // IVM parity twin of the streaming lateness monitor (r14 verdict
    // item #3 — the q180 pattern applied to the next stateful op):
    // the events table is replayed in ARRIVAL order (event_id —
    // q124's arrival proxy) through the PRODUCTION
    // StreamOps.latenessMonitorBatch swap-renamed parquet state as
    // three consecutive micro-batches, and the served
    // latenessSnapshot is what the oracle hashes. The oracle
    // recomputes q124's audit directly over the full table, so the
    // hash match proves the cross-batch high-watermark chain —
    // greatest(prior hwm, within-batch running hwm) — charges
    // lateness identically to the single-pass window, including
    // events older than a PREVIOUS batch's max. State stays per-user
    // compact (5 longs/user); the fact table is scanned once per
    // delta, exactly as a micro-batch would.
    "q184_lateness_ivm" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.load(s, d, "events")
        .select($"user_id", $"event_id", unix_micros($"ts").as("us"))
      val stateDir = ScratchDir.path(
        s"lateness_ivm_${ivmRun.incrementAndGet()}") + "/state"
      // arrival-order thirds off one bounded scalar (max event_id) —
      // batches MUST partition by arrival order or the replay would
      // tell a different story than the audit it mirrors
      val cut = ev.agg(max($"event_id")).first.getLong(0)
      Seq($"event_id" <= cut / 3,
        $"event_id" > cut / 3 && $"event_id" <= 2 * cut / 3,
        $"event_id" > 2 * cut / 3).zipWithIndex.foreach {
        case (pred, i) =>
          graft.streaming.StreamOps.latenessMonitorBatch(stateDir)(
            ev.filter(pred), i.toLong)
      }
      graft.streaming.StreamOps.latenessSnapshot(s, stateDir)
    }),

    // Streaming parity twin for the window-close leaderboard — and
    // the first driver-visible row that runs the PRODUCTION
    // transformWithState path end-to-end (q180/q184 replay foreachBatch
    // parquet state; this one drives the real state store). The events
    // table is staged as three chronological parquet files (weekly
    // windows, day-split at 120/240 — NOT window-aligned, so the
    // boundary windows accumulate MapState across micro-batches) plus
    // two far-future sentinel files whose only job is advancing the
    // watermark past every real window end (wm trails data by one
    // batch, hence two). A file-source stream with maxFilesPerTrigger=1
    // replays them in mtime order through windowTopKStream (RocksDB
    // state, event-time timers, append mode) into a parquet sink; the
    // oracle recomputes every window's top-3 from the table in one
    // pass, so the hash match certifies close-once exact leaderboards
    // over the real streaming runtime. Zero-delay watermark is safe by
    // construction: the day-ordered split means no batch carries an
    // event older than a prior batch's max.
    "q185_topk_ivm" -> ((s, d) => {
      import s.implicits._
      val weekMs = 604800000L
      val ev = Tables.load(s, d, "events")
        .select($"event_type", $"ts",
          datediff(to_date($"ts"), lit("2024-01-01")).cast("long")
            .as("day"))
      val root = ScratchDir.path(
        s"topk_ivm_${ivmRun.incrementAndGet()}")
      // epoch-pinned sentinels (2025-06-01/02 UTC) — tz-free longs so
      // the staged bytes are identical on any JVM default zone
      def sentinel(ms: Long): DataFrame = s.range(1)
        .select(lit("drain").as("event_type"),
          timestamp_millis(lit(ms)).as("ts"))
      // shared staging harness (mtime IS the replay order; writes
      // overlap from a driver pool — see Replay.stageBatches)
      val staging = Replay.stageBatches(root, Seq(
        ev.filter($"day" < 120L),
        ev.filter($"day" >= 120L && $"day" < 240L),
        ev.filter($"day" >= 240L),
        sentinel(1748736000000L), sentinel(1748822400000L))
        .map(_.select($"event_type", $"ts")))
      // RocksDB provider + pinned replay confs — the shared harness
      // discipline (see Replay.withRocksDb: 4 state partitions,
      // changelog checkpointing, no-data micro-batches off; the
      // sentinel pair above guarantees every REAL window closes
      // inside a data batch, so the trailing no-data batch this drops
      // could only have emitted 'drain' rows the read-back filters)
      Replay.withRocksDb(s) {
        val src = s.readStream.schema("event_type STRING, ts TIMESTAMP")
          .option("maxFilesPerTrigger", "1").parquet(staging)
          .as[graft.streaming.StreamOps.WinEvent]
        val q = graft.streaming.StreamOps
          .windowTopKStream(src, weekMs, "0 seconds", k = 3)
          .writeStream.format("parquet")
          .option("path", s"$root/out")
          .option("checkpointLocation", s"$root/ckpt")
          .outputMode("append")
          .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
          .start()
        q.awaitTermination()
      }
      // sentinel windows never close (nothing advances wm past them)
      // — the filter is belt-and-braces documentation of the exclusion
      s.read.parquet(s"$root/out")
        .filter($"window_start" < 1740000000000L)
        .select($"window_start", $"rank", $"event_type", $"n")
    }))

  /** q173's body behind a frame seam, so MomentWidthSpec can feed a
    * synthetic corpus whose daily cent sums overflow 64-bit squares
    * (the q157 rollingCorr discipline). All moments decimal(38,0);
    * the (Σuv)² term in SSE·(n·Σu²) caps the exact domain near
    * daily cents ~8e11 × span 2400 (≈ sf 100 of the events table) —
    * far past the board's probe range; past it, the q25 detect-then-
    * escalate pass is the documented remedy.
    */
  private[queries] def olsInfluence(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val dec = "decimal(38,0)"
    olsResidualGrid(events)
        .withColumn("hlev", lit(1.0) / $"n".cast("double") +
          ($"u" * $"u").cast("double") / $"su2".cast("double"))
        .withColumn("s2", $"sse_sc".cast("double") /
          ($"n".cast(dec) * $"su2").cast("double") /
          ($"n" - 2L).cast("double"))
        .withColumn("cook_d",
          when($"s2" === 0.0, lit(null).cast("double"))
            .otherwise($"e" * $"e" * $"hlev" /
              (lit(2.0) * $"s2" *
                (lit(1.0) - $"hlev") * (lit(1.0) - $"hlev"))))
        .filter($"cook_d" > lit(4.0) / $"n".cast("double"))
        .select($"event_type",
          date_format($"day", "yyyy-MM-dd").as("day"), $"v",
          Tables.nz(round($"e", 4)).as("residual"),
          Tables.nz(round($"hlev", 6)).as("leverage"),
          Tables.nz(round($"cook_d", 6)).as("cook_d"))
        .orderBy($"event_type", $"day")
  }

  /** q174's body behind a frame seam, so MomentWidthSpec can feed a
    * synthetic corpus whose centered daily cents overflow 64-bit
    * fourth powers (|c| > 55k cents ⇒ c⁴ > Long.MaxValue — decimal
    * is load-bearing even at sf0.01). Exact domain: Σc⁴ < 10³⁸ ⇒
    * |c| ≲ 4.5e8 cents of daily deviation (≈ sf100 events); past it
    * the q25 detect-then-escalate pass is the documented remedy.
    */
  private[queries] def jarqueBera(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val dec = "decimal(38,0)"
    val daily = events
        .select($"event_type", to_date($"ts").as("day"),
          round($"value" * 100).cast("long").as("cents"))
        .groupBy($"event_type", $"day").agg(sum($"cents").as("v"))
      val span = daily.agg(min($"day").as("d0"), max($"day").as("d1"))
      val types = daily.select($"event_type").distinct()
      val grid = span
        .select(explode(sequence($"d0", $"d1")).as("day"),
          (datediff($"d1", $"d0") + 1).cast("long").as("n"))
        .crossJoin(broadcast(types))
        .join(daily, Seq("event_type", "day"), "left")
        .select($"event_type", $"n", coalesce($"v", lit(0L)).as("v"))
      val piv = grid.groupBy($"event_type")
        .agg(min($"n").as("n"), sum($"v".cast(dec)).as("s1"))
        .select($"event_type",
          round($"s1".cast("double") / $"n".cast("double"))
            .cast("long").as("piv"))
      val mom = grid.join(broadcast(piv), Seq("event_type"))
        .withColumn("c", ($"v" - $"piv").cast(dec))
        .groupBy($"event_type")
        .agg(min($"n").as("n_days"), min($"piv").as("piv"),
          sum($"c").as("s1"),
          sum(($"c" * $"c").cast(dec)).as("s2"),
          sum(($"c" * $"c" * $"c").cast(dec)).as("s3"),
          sum(($"c" * $"c" * $"c" * $"c").cast(dec)).as("s4"))
      val a = mom
        .withColumn("nd", $"n_days".cast("double"))
        .withColumn("m1", $"s1".cast("double") / $"nd")
        .withColumn("r2", $"s2".cast("double") / $"nd")
        .withColumn("r3", $"s3".cast("double") / $"nd")
        .withColumn("r4", $"s4".cast("double") / $"nd")
        .withColumn("m2", $"r2" - $"m1" * $"m1")
        .withColumn("m3", $"r3" - lit(3.0) * $"m1" * $"r2" +
          lit(2.0) * $"m1" * $"m1" * $"m1")
        .withColumn("m4", $"r4" - lit(4.0) * $"m1" * $"r3" +
          lit(6.0) * $"m1" * $"m1" * $"r2" -
          lit(3.0) * $"m1" * $"m1" * $"m1" * $"m1")
        .withColumn("skew",
          when($"m2" === 0.0, lit(null).cast("double"))
            .otherwise($"m3" / (sqrt($"m2") * $"m2")))
        .withColumn("exk",
          when($"m2" === 0.0, lit(null).cast("double"))
            .otherwise($"m4" / ($"m2" * $"m2") - lit(3.0)))
        .withColumn("jb", $"nd" / lit(6.0) *
          ($"skew" * $"skew" + $"exk" * $"exk" / lit(4.0)))
      a.select($"event_type", $"n_days",
          Tables.nz(round($"piv".cast("double") + $"m1", 2))
            .as("mean_cents"),
          Tables.nz(round($"skew", 5)).as("skewness"),
          Tables.nz(round($"exk", 5)).as("ex_kurtosis"),
          Tables.nz(round($"jb", 4)).as("jb_stat"),
          Tables.nz(round(exp(-$"jb" / lit(2.0)), 6)).as("p_value"))
        .orderBy($"event_type")
  }

  /** The shared per-type OLS residual frame q173 and q176 both read:
    * the gap-filled complete day grid in the ×2-centered design
    * (u = 2t−(n−1), Σu = 0 exactly), its decimal(38,0) moments, the
    * scaled residual esc = v·n·Σu² − Σv·Σu² − n·Σuv·u, and the IEEE
    * residual e = esc/(n·Σu²) — extracted verbatim from q173 (same
    * expression tree, same plan) so the Durbin–Watson pass reuses the
    * frame instead of replaying it in divergent form.
    */
  private[queries] def olsResidualGrid(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val dec = "decimal(38,0)"
    val daily = events
        .select($"event_type", to_date($"ts").as("day"),
          round($"value" * 100).cast("long").as("cents"))
        .groupBy($"event_type", $"day").agg(sum($"cents").as("v"))
      val span = daily.agg(min($"day").as("d0"), max($"day").as("d1"))
      val types = daily.select($"event_type").distinct()
      val grid = span
        .select(explode(sequence($"d0", $"d1")).as("day"), $"d0",
          (datediff($"d1", $"d0") + 1).cast("long").as("n"))
        .crossJoin(broadcast(types))
        .join(daily, Seq("event_type", "day"), "left")
        .select($"event_type", $"day", $"n",
          datediff($"day", $"d0").cast("long").as("t"),
          coalesce($"v", lit(0L)).as("v"))
        .withColumn("u", (lit(2L) * $"t" - ($"n" - 1L)).cast(dec))
      val mom = grid.groupBy($"event_type")
        .agg(min($"n").as("n"),
          sum(($"u" * $"u").cast(dec)).as("su2"),
          sum(($"u" * $"v").cast(dec)).as("suv"),
          sum($"v".cast(dec)).as("sv"),
          sum(($"v".cast(dec) * $"v").cast(dec)).as("svv"))
        .withColumn("sse_sc",
          ($"n".cast(dec) * $"su2" * $"svv" -
            $"sv" * $"sv" * $"su2" -
            $"n".cast(dec) * $"suv" * $"suv").cast(dec))
      grid.join(broadcast(mom.drop("n")), Seq("event_type"))
        .withColumn("esc",
          ($"v".cast(dec) * $"n" * $"su2" - $"sv" * $"su2" -
            $"n".cast(dec) * $"suv" * $"u").cast(dec))
        .withColumn("e", $"esc".cast("double") /
          ($"n".cast(dec) * $"su2").cast("double"))
  }

  def oracles: Map[String, String] = Map(

    "q167_xcorr_leadlag" ->
      """WITH cust AS (
           SELECT c_custkey, c_mktsegment FROM customer
           WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
         daily AS (
           SELECT c.c_mktsegment AS seg, o.o_orderdate AS day,
             CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS v
           FROM orders o JOIN cust c ON o.o_custkey = c.c_custkey
           GROUP BY 1, 2),
         span AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
         days AS (
           SELECT unnest(generate_series(d0, d1,
             INTERVAL 1 DAY))::DATE AS day, d0
           FROM span),
         grid AS (
           SELECT s.seg,
             CAST(date_diff('day', dy.d0, dy.day) AS BIGINT) AS di,
             coalesce(d.v, 0) AS v
           FROM days dy
           CROSS JOIN (SELECT unnest(['BUILDING', 'MACHINERY'])
             AS seg) s
           LEFT JOIN daily d ON d.seg = s.seg AND d.day = dy.day),
         xg AS (SELECT di, v AS x FROM grid WHERE seg = 'BUILDING'),
         yg AS (SELECT di, v AS y FROM grid WHERE seg = 'MACHINERY'),
         lags AS (SELECT CAST(unnest(range(-7, 8)) AS BIGINT) AS lag),
         pr AS (
           SELECT l.lag, x.x, y.y
           FROM lags l JOIN xg x ON TRUE
           JOIN yg y ON y.di = x.di + l.lag),
         m AS (
           -- moments stay HUGEINT (the decimal(38,0) twin of the
           -- Spark side): BIGINT products overflow exactly when a
           -- daily cent sum passes 2^31
           SELECT lag, CAST(count(*) AS HUGEINT) AS n,
             CAST(sum(x) AS HUGEINT) AS sx,
             CAST(sum(y) AS HUGEINT) AS sy,
             sum(CAST(x AS HUGEINT) * y) AS sxy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(y AS HUGEINT) * y) AS syy
           FROM pr GROUP BY 1),
         c AS (
           SELECT lag, CAST(n AS BIGINT) AS n_days,
             CASE WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
               THEN NULL
               ELSE CAST(n * sxy - sx * sy AS DOUBLE) /
                 sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
                   CAST(n * syy - sy * sy AS DOUBLE)) END AS raw
           FROM m),
         best AS (
           SELECT lag AS best_lag FROM c WHERE raw IS NOT NULL
           ORDER BY raw DESC, lag LIMIT 1)
         SELECT c.lag, c.n_days, round(c.raw, 6) + 0.0 AS xcorr,
           b.best_lag
         FROM c LEFT JOIN best b ON TRUE ORDER BY c.lag""",

    "q168_fdr_bh" ->
      """WITH put AS (
           SELECT event_type,
             user_id % 2 = 0 AS grp_a,
             CASE WHEN count(*) >= 3 THEN 1 ELSE 0 END AS conv
           FROM events GROUP BY event_type, user_id),
         arms AS (
           SELECT
             CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS na,
             CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS nb
           FROM (SELECT DISTINCT user_id FROM events)),
         pt AS (
           SELECT p.event_type,
             CAST(sum(CASE WHEN p.grp_a THEN p.conv ELSE 0 END)
               AS BIGINT) AS ca,
             CAST(sum(CASE WHEN NOT p.grp_a THEN p.conv ELSE 0 END)
               AS BIGINT) AS cb,
             min(a.na) AS na, min(a.nb) AS nb
           FROM put p, arms a GROUP BY 1),
         pz AS (
           SELECT event_type, ca, cb,
             CASE WHEN ca + cb > 0 AND ca + cb < na + nb
               AND na > 0 AND nb > 0 THEN
               (CAST(ca AS DOUBLE) / CAST(na AS DOUBLE) -
                CAST(cb AS DOUBLE) / CAST(nb AS DOUBLE)) /
               sqrt((CAST(ca + cb AS DOUBLE) /
                   CAST(na + nb AS DOUBLE)) *
                 (1.0 - CAST(ca + cb AS DOUBLE) /
                   CAST(na + nb AS DOUBLE)) *
                 (1.0 / CAST(na AS DOUBLE) +
                  1.0 / CAST(nb AS DOUBLE)))
               END AS z
           FROM pt),
         pp AS (
           SELECT event_type, ca, cb, z, abs(z) AS az,
             1.0 / (1.0 + 0.2316419 * abs(z)) AS t
           FROM pz),
         pv AS (
           SELECT event_type, ca, cb, z,
             2.0 * (exp(-az * az / 2.0) / 2.5066282746310002) *
               (t * (0.319381530 + t * (-0.356563782 + t *
                 (1.781477937 + t * (-1.821255978 + t *
                   1.330274429))))) AS p_raw
           FROM pp),
         rk AS (
           SELECT event_type, p_raw,
             CAST(row_number() OVER (ORDER BY p_raw, event_type)
               AS BIGINT) AS rk
           FROM pv WHERE p_raw IS NOT NULL),
         mm AS (SELECT CAST(count(*) AS BIGINT) AS m FROM rk),
         ks AS (
           SELECT coalesce(max(CASE WHEN r.p_raw <=
               CAST(r.rk AS DOUBLE) * 0.05 / CAST(m.m AS DOUBLE)
               THEN r.rk ELSE 0 END), 0) AS kstar
           FROM rk r, mm m)
         SELECT v.event_type, v.ca AS conv_a, v.cb AS conv_b,
           round(v.z, 4) + 0.0 AS z_stat,
           round(v.p_raw, 6) + 0.0 AS p_value,
           r.rk AS p_rank, m.m AS m_tests,
           CAST(CASE WHEN r.rk IS NOT NULL AND r.rk <= k.kstar
             THEN 1 ELSE 0 END AS BIGINT) AS discovered
         FROM pv v
         LEFT JOIN rk r ON r.event_type = v.event_type, mm m, ks k
         ORDER BY v.event_type""",

    "q169_conformal_interval" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS v
           FROM events GROUP BY 1, 2),
         span AS (
           SELECT d0, d1,
             CAST(date_diff('day', d0, d1) AS BIGINT) AS dmax
           FROM (SELECT min(day) AS d0, max(day) AS d1 FROM daily)),
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
         scored AS (
           SELECT g.event_type, g.di, g.dmax,
             abs(g.v - l.v) AS score
           FROM grid g JOIN grid l
             ON l.event_type = g.event_type AND l.di = g.di - 7
           WHERE g.di >= 7),
         cal AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_cal,
             list_sort(list(score)) AS ls
           FROM scored
           WHERE di > dmax - 21 AND di <= dmax - 7
           GROUP BY 1),
         q AS (
           SELECT event_type, n_cal,
             CASE WHEN n_cal > 0 THEN
               ls[CAST(((n_cal + 1) * 4 + 4) // 5 AS INT)]
               END AS q_hat_cents
           FROM cal)
         SELECT s.event_type, q.n_cal, q.q_hat_cents,
           CAST(count(*) AS BIGINT) AS n_test,
           CAST(sum(CASE WHEN s.score <= q.q_hat_cents
             THEN 1 ELSE 0 END) AS BIGINT) AS n_covered,
           CAST(sum(CASE WHEN s.score <= q.q_hat_cents
             THEN 1 ELSE 0 END) * 1000 // count(*) AS BIGINT)
             AS coverage_milli
         FROM scored s JOIN q ON q.event_type = s.event_type
         WHERE s.di > s.dmax - 7
         GROUP BY 1, 2, 3 ORDER BY 1""",

    "q170_kendall_tau" ->
      """WITH cust AS (
           SELECT c_custkey, c_mktsegment FROM customer
           WHERE c_mktsegment IN ('BUILDING', 'MACHINERY')),
         daily AS (
           SELECT c.c_mktsegment AS seg, o.o_orderdate AS day,
             CAST(sum(CAST(round(o.o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS v
           FROM orders o JOIN cust c ON o.o_custkey = c.c_custkey
           GROUP BY 1, 2),
         span AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
         days AS (
           SELECT unnest(generate_series(d0, d1,
             INTERVAL 1 DAY))::DATE AS day, d0
           FROM span),
         grid AS (
           SELECT s.seg,
             CAST(date_diff('day', dy.d0, dy.day) AS BIGINT) AS di,
             coalesce(d.v, 0) AS v
           FROM days dy
           CROSS JOIN (SELECT unnest(['BUILDING', 'MACHINERY'])
             AS seg) s
           LEFT JOIN daily d ON d.seg = s.seg AND d.day = dy.day),
         xy AS (
           SELECT di,
             max(CASE WHEN seg = 'BUILDING' THEN v END) AS x,
             max(CASE WHEN seg = 'MACHINERY' THEN v END) AS y
           FROM grid GROUP BY 1),
         pr AS (
           SELECT
             (a.x - b.x > 0 AND a.y - b.y > 0 OR
              a.x - b.x < 0 AND a.y - b.y < 0) AS conc,
             (a.x - b.x > 0 AND a.y - b.y < 0 OR
              a.x - b.x < 0 AND a.y - b.y > 0) AS disc,
             a.x = b.x AS tx, a.y = b.y AS ty
           FROM xy a JOIN xy b ON a.di < b.di),
         agg AS (
           SELECT CAST(count(*) AS BIGINT) AS n0,
             CAST(sum(CASE WHEN conc THEN 1 ELSE 0 END) AS BIGINT)
               AS nc,
             CAST(sum(CASE WHEN disc THEN 1 ELSE 0 END) AS BIGINT)
               AS nd,
             CAST(sum(CASE WHEN tx THEN 1 ELSE 0 END) AS BIGINT)
               AS tied_x,
             CAST(sum(CASE WHEN ty THEN 1 ELSE 0 END) AS BIGINT)
               AS tied_y
           FROM pr)
         SELECT n0, nc, nd, tied_x, tied_y,
           round(CASE WHEN n0 - tied_x = 0 OR n0 - tied_y = 0
             THEN NULL
             ELSE CAST(nc - nd AS DOUBLE) /
               sqrt(CAST(n0 - tied_x AS DOUBLE) *
                 CAST(n0 - tied_y AS DOUBLE)) END, 6) + 0.0 AS tau_b
         FROM agg""",

    "q171_mann_whitney" ->
      """WITH o AS (
           SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderpriority = '1-URGENT' AS isa
           FROM orders
           WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
         bv AS (
           SELECT cents,
             CAST(sum(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT)
               AS k1,
             CAST(count(*) AS BIGINT) AS t
           FROM o GROUP BY 1),
         rk AS (
           SELECT k1, t,
             CAST(2 * sum(t) OVER (ORDER BY cents
               ROWS UNBOUNDED PRECEDING) - t + 1 AS HUGEINT)
               AS rank2
           FROM bv),
         agg AS (
           SELECT CAST(sum(k1) AS HUGEINT) AS n1d,
             CAST(sum(t - k1) AS HUGEINT) AS n2d,
             sum(CAST(k1 AS HUGEINT) * rank2) AS r1x2,
             sum(CAST(t AS HUGEINT) * t * t - t) AS tie3
           FROM rk),
         u AS (
           SELECT n1d, n2d, n1d + n2d AS nd,
             r1x2 - n1d * (n1d + 1) AS u1x2, tie3
           FROM agg)
         SELECT CAST(n1d AS BIGINT) AS n1, CAST(n2d AS BIGINT) AS n2,
           CAST(u1x2 AS DOUBLE) / 2.0 AS u1,
           round(CASE WHEN n1d = 0 OR n2d = 0 OR nd < 2
               OR tie3 = (nd + 1) * nd * (nd - 1) THEN NULL
             ELSE (CAST(u1x2 - n1d * n2d AS DOUBLE) / 2.0) /
               sqrt(CAST(n1d * n2d AS DOUBLE) / 12.0 *
                 (CAST(nd + 1 AS DOUBLE) -
                  CAST(tie3 AS DOUBLE) /
                    CAST(nd * (nd - 1) AS DOUBLE))) END, 4) + 0.0
             AS z_stat
         FROM u""",

    "q172_yuen_trimmed" ->
      """WITH o AS (
           SELECT CASE WHEN o_orderpriority = '1-URGENT'
               THEN 'urgent' ELSE 'low' END AS grp,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders
           WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
         bv AS (
           SELECT grp, cents, CAST(count(*) AS BIGINT) AS cnt
           FROM o GROUP BY 1, 2),
         ns AS (
           SELECT grp, CAST(sum(cnt) AS BIGINT) AS n,
             CAST(sum(cnt) // 5 AS BIGINT) AS r
           FROM bv GROUP BY 1),
         cells AS (
           SELECT b.grp, b.cents, b.cnt,
             CAST(sum(b.cnt) OVER (PARTITION BY b.grp ORDER BY b.cents
               ROWS UNBOUNDED PRECEDING) AS BIGINT) AS cum,
             s.n, s.r, s.n - 2 * s.r AS h
           FROM bv b JOIN ns s ON s.grp = b.grp),
         c2 AS (
           SELECT *,
             greatest(0, least(cum, n - r) - greatest(cum - cnt, r))
               AS c_mid
           FROM cells),
         bounds AS (
           SELECT grp,
             min(CASE WHEN cum >= r + 1 THEN cents END) AS xlo,
             min(CASE WHEN cum >= n - r THEN cents END) AS xhi
           FROM c2 GROUP BY 1),
         per AS (
           SELECT grp, min(n) AS n, min(r) AS r, min(h) AS h,
             sum(CAST(c_mid AS HUGEINT) * cents) AS tsum,
             sum(CAST(c_mid AS HUGEINT) * cents * cents) AS tsq
           FROM c2 GROUP BY 1),
         pw AS (
           SELECT p.grp, p.n, p.h, p.tsum,
             p.tsum + CAST(p.r AS HUGEINT) * (b.xlo + b.xhi) AS wsum,
             p.tsq + CAST(p.r AS HUGEINT) *
               (CAST(b.xlo AS HUGEINT) * b.xlo +
                CAST(b.xhi AS HUGEINT) * b.xhi) AS wsq
           FROM per p JOIN bounds b ON b.grp = p.grp),
         pv AS (
           SELECT grp, n, h, tsum,
             CAST(n AS HUGEINT) * wsq - wsum * wsum AS ssw
           FROM pw),
         wide AS (
           SELECT
             max(CASE WHEN grp = 'urgent' THEN n END) AS n1,
             max(CASE WHEN grp = 'low' THEN n END) AS n2,
             max(CASE WHEN grp = 'urgent' THEN h END) AS h1,
             max(CASE WHEN grp = 'low' THEN h END) AS h2,
             max(CASE WHEN grp = 'urgent' THEN tsum END) AS ts1,
             max(CASE WHEN grp = 'low' THEN tsum END) AS ts2,
             max(CASE WHEN grp = 'urgent' THEN ssw END) AS ssw1,
             max(CASE WHEN grp = 'low' THEN ssw END) AS ssw2
           FROM pv)
         SELECT n1, n2, h1, h2,
           round(CAST(ts1 AS DOUBLE) / CAST(h1 AS DOUBLE), 4) + 0.0
             AS tmean_urgent,
           round(CAST(ts2 AS DOUBLE) / CAST(h2 AS DOUBLE), 4) + 0.0
             AS tmean_low,
           round(CASE WHEN h1 < 2 OR h2 < 2
               OR (ssw1 = 0 AND ssw2 = 0) THEN NULL
             ELSE (CAST(ts1 AS DOUBLE) / CAST(h1 AS DOUBLE) -
                   CAST(ts2 AS DOUBLE) / CAST(h2 AS DOUBLE)) /
               sqrt(CAST(ssw1 AS DOUBLE) /
                   (CAST(n1 AS DOUBLE) * CAST(h1 AS DOUBLE) *
                    CAST(h1 - 1 AS DOUBLE)) +
                 CAST(ssw2 AS DOUBLE) /
                   (CAST(n2 AS DOUBLE) * CAST(h2 AS DOUBLE) *
                    CAST(h2 - 1 AS DOUBLE))) END, 4) + 0.0
             AS t_yuen
         FROM wide""",

    "q173_ols_influence" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS v
           FROM events GROUP BY 1, 2),
         span AS (
           SELECT d0, d1,
             CAST(date_diff('day', d0, d1) + 1 AS BIGINT) AS n
           FROM (SELECT min(day) AS d0, max(day) AS d1 FROM daily)),
         days AS (
           SELECT unnest(generate_series(d0, d1,
             INTERVAL 1 DAY))::DATE AS day, d0, n
           FROM span),
         types AS (SELECT DISTINCT event_type FROM daily),
         grid AS (
           SELECT t.event_type, dy.day, dy.n,
             CAST(date_diff('day', dy.d0, dy.day) AS BIGINT) AS t,
             coalesce(d.v, 0) AS v
           FROM days dy CROSS JOIN types t
           LEFT JOIN daily d
             ON d.event_type = t.event_type AND d.day = dy.day),
         g2 AS (
           SELECT event_type, day, n, v,
             CAST(2 * t - (n - 1) AS HUGEINT) AS u
           FROM grid),
         mom AS (
           SELECT event_type,
             sum(u * u) AS su2,
             sum(u * v) AS suv,
             CAST(sum(v) AS HUGEINT) AS sv,
             sum(CAST(v AS HUGEINT) * v) AS svv
           FROM g2 GROUP BY 1),
         m2 AS (
           SELECT g.event_type, g.day, g.n, g.v, g.u,
             m.su2, m.suv, m.sv,
             CAST(g.n AS HUGEINT) * m.su2 * m.svv -
               m.sv * m.sv * m.su2 -
               CAST(g.n AS HUGEINT) * m.suv * m.suv AS sse_sc
           FROM g2 g JOIN mom m ON m.event_type = g.event_type),
         rows_ AS (
           SELECT event_type, day, n, v,
             CAST(CAST(v AS HUGEINT) * n * su2 - sv * su2 -
               CAST(n AS HUGEINT) * suv * u AS DOUBLE) /
               CAST(CAST(n AS HUGEINT) * su2 AS DOUBLE) AS e,
             1.0 / CAST(n AS DOUBLE) +
               CAST(u * u AS DOUBLE) / CAST(su2 AS DOUBLE) AS hlev,
             CAST(sse_sc AS DOUBLE) /
               CAST(CAST(n AS HUGEINT) * su2 AS DOUBLE) /
               CAST(n - 2 AS DOUBLE) AS s2
           FROM m2),
         ck AS (
           SELECT event_type, day, n, v, e, hlev,
             CASE WHEN s2 = 0.0 THEN NULL
               ELSE e * e * hlev /
                 (2.0 * s2 * (1.0 - hlev) * (1.0 - hlev)) END
               AS cook_d
           FROM rows_)
         SELECT event_type, strftime(day, '%Y-%m-%d') AS day, v,
           round(e, 4) + 0.0 AS residual,
           round(hlev, 6) + 0.0 AS leverage,
           round(cook_d, 6) + 0.0 AS cook_d
         FROM ck
         WHERE cook_d > 4.0 / CAST(n AS DOUBLE)
         ORDER BY event_type, day""",

    "q174_jarque_bera" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS v
           FROM events GROUP BY 1, 2),
         span AS (
           SELECT d0, d1,
             CAST(date_diff('day', d0, d1) + 1 AS BIGINT) AS n
           FROM (SELECT min(day) AS d0, max(day) AS d1 FROM daily)),
         days AS (
           SELECT unnest(generate_series(d0, d1,
             INTERVAL 1 DAY))::DATE AS day, n
           FROM span),
         types AS (SELECT DISTINCT event_type FROM daily),
         grid AS (
           SELECT t.event_type, dy.n, coalesce(d.v, 0) AS v
           FROM days dy CROSS JOIN types t
           LEFT JOIN daily d
             ON d.event_type = t.event_type AND d.day = dy.day),
         piv AS (
           SELECT event_type,
             CAST(round(CAST(sum(CAST(v AS HUGEINT)) AS DOUBLE) /
               CAST(min(n) AS DOUBLE)) AS BIGINT) AS piv
           FROM grid GROUP BY 1),
         cen AS (
           SELECT g.event_type, g.n, p.piv,
             CAST(g.v - p.piv AS HUGEINT) AS c
           FROM grid g JOIN piv p ON p.event_type = g.event_type),
         mom AS (
           SELECT event_type, min(n) AS n_days, min(piv) AS piv,
             sum(c) AS s1, sum(c * c) AS s2,
             sum(c * c * c) AS s3, sum(c * c * c * c) AS s4
           FROM cen GROUP BY 1),
         a AS (
           SELECT event_type, n_days, piv,
             CAST(n_days AS DOUBLE) AS nd,
             CAST(s1 AS DOUBLE) / CAST(n_days AS DOUBLE) AS m1,
             CAST(s2 AS DOUBLE) / CAST(n_days AS DOUBLE) AS r2,
             CAST(s3 AS DOUBLE) / CAST(n_days AS DOUBLE) AS r3,
             CAST(s4 AS DOUBLE) / CAST(n_days AS DOUBLE) AS r4
           FROM mom),
         b AS (
           SELECT event_type, n_days, piv, nd, m1,
             r2 - m1 * m1 AS m2,
             r3 - 3.0 * m1 * r2 + 2.0 * m1 * m1 * m1 AS m3,
             r4 - 4.0 * m1 * r3 + 6.0 * m1 * m1 * r2 -
               3.0 * m1 * m1 * m1 * m1 AS m4
           FROM a),
         c2 AS (
           SELECT event_type, n_days, piv, nd, m1, m2,
             CASE WHEN m2 = 0.0 THEN NULL
               ELSE m3 / (sqrt(m2) * m2) END AS skew,
             CASE WHEN m2 = 0.0 THEN NULL
               ELSE m4 / (m2 * m2) - 3.0 END AS exk
           FROM b),
         j AS (
           SELECT event_type, n_days, piv, m1, skew, exk,
             nd / 6.0 * (skew * skew + exk * exk / 4.0) AS jb
           FROM c2)
         SELECT event_type, n_days,
           round(CAST(piv AS DOUBLE) + m1, 2) + 0.0 AS mean_cents,
           round(skew, 5) + 0.0 AS skewness,
           round(exk, 5) + 0.0 AS ex_kurtosis,
           round(jb, 4) + 0.0 AS jb_stat,
           round(exp(-jb / 2.0), 6) + 0.0 AS p_value
         FROM j ORDER BY event_type""",

    "q175_partial_corr" ->
      """WITH o AS (
           SELECT c.c_mktsegment AS seg, o.o_orderdate AS day,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
           FROM orders o JOIN customer c
             ON o.o_custkey = c.c_custkey),
         daily AS (
           SELECT day,
             CAST(sum(CASE WHEN seg = 'BUILDING' THEN cents
               ELSE 0 END) AS BIGINT) AS xv,
             CAST(sum(CASE WHEN seg = 'MACHINERY' THEN cents
               ELSE 0 END) AS BIGINT) AS yv,
             CAST(sum(cents) AS BIGINT) AS zv
           FROM o GROUP BY 1),
         span AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
         days AS (
           SELECT unnest(generate_series(d0, d1,
             INTERVAL 1 DAY))::DATE AS day
           FROM span),
         grid AS (
           SELECT CAST(coalesce(d.xv, 0) AS HUGEINT) AS x,
             CAST(coalesce(d.yv, 0) AS HUGEINT) AS y,
             CAST(coalesce(d.zv, 0) AS HUGEINT) AS z
           FROM days dy LEFT JOIN daily d ON d.day = dy.day),
         m AS (
           SELECT CAST(count(*) AS HUGEINT) AS n,
             sum(x) AS sx, sum(y) AS sy, sum(z) AS sz,
             sum(x * x) AS sxx, sum(y * y) AS syy,
             sum(z * z) AS szz, sum(x * y) AS sxy,
             sum(x * z) AS sxz, sum(y * z) AS syz
           FROM grid),
         r AS (
           SELECT CAST(n AS BIGINT) AS n_days,
             CASE WHEN (n * sxx - sx * sx) = 0 OR
                 (n * syy - sy * sy) = 0 THEN NULL
               ELSE CAST(n * sxy - sx * sy AS DOUBLE) /
                 sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
                   CAST(n * syy - sy * sy AS DOUBLE)) END AS rxy,
             CASE WHEN (n * sxx - sx * sx) = 0 OR
                 (n * szz - sz * sz) = 0 THEN NULL
               ELSE CAST(n * sxz - sx * sz AS DOUBLE) /
                 sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
                   CAST(n * szz - sz * sz AS DOUBLE)) END AS rxz,
             CASE WHEN (n * syy - sy * sy) = 0 OR
                 (n * szz - sz * sz) = 0 THEN NULL
               ELSE CAST(n * syz - sy * sz AS DOUBLE) /
                 sqrt(CAST(n * syy - sy * sy AS DOUBLE) *
                   CAST(n * szz - sz * sz AS DOUBLE)) END AS ryz
           FROM m)
         SELECT n_days,
           round(rxy, 6) + 0.0 AS r_xy,
           round(rxz, 6) + 0.0 AS r_xz,
           round(ryz, 6) + 0.0 AS r_yz,
           round(CASE WHEN rxy IS NULL OR rxz IS NULL OR
               ryz IS NULL OR
               (1.0 - rxz * rxz) * (1.0 - ryz * ryz) <= 0.0
               THEN NULL
             ELSE (rxy - rxz * ryz) /
               sqrt((1.0 - rxz * rxz) * (1.0 - ryz * ryz)) END, 6)
             + 0.0 AS r_partial
         FROM r""",

    "q176_durbin_watson" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS v
           FROM events GROUP BY 1, 2),
         span AS (
           SELECT d0, d1,
             CAST(date_diff('day', d0, d1) + 1 AS BIGINT) AS n
           FROM (SELECT min(day) AS d0, max(day) AS d1 FROM daily)),
         days AS (
           SELECT unnest(generate_series(d0, d1,
             INTERVAL 1 DAY))::DATE AS day, d0, n
           FROM span),
         types AS (SELECT DISTINCT event_type FROM daily),
         grid AS (
           SELECT t.event_type, dy.day, dy.n,
             CAST(date_diff('day', dy.d0, dy.day) AS BIGINT) AS t,
             coalesce(d.v, 0) AS v
           FROM days dy CROSS JOIN types t
           LEFT JOIN daily d
             ON d.event_type = t.event_type AND d.day = dy.day),
         g2 AS (
           SELECT event_type, day, n, v,
             CAST(2 * t - (n - 1) AS HUGEINT) AS u
           FROM grid),
         mom AS (
           SELECT event_type,
             sum(u * u) AS su2,
             sum(u * v) AS suv,
             CAST(sum(v) AS HUGEINT) AS sv
           FROM g2 GROUP BY 1),
         rows_ AS (
           SELECT g.event_type, g.day, g.n,
             CAST(CAST(g.v AS HUGEINT) * g.n * m.su2 - m.sv * m.su2 -
               CAST(g.n AS HUGEINT) * m.suv * g.u AS DOUBLE) /
               CAST(CAST(g.n AS HUGEINT) * m.su2 AS DOUBLE) AS e
           FROM g2 g JOIN mom m ON m.event_type = g.event_type),
         lg AS (
           SELECT event_type, day, n, e,
             lag(e) OVER (PARTITION BY event_type
               ORDER BY day) AS ep
           FROM rows_),
         t AS (
           SELECT event_type, day, n, e * e AS e2,
             coalesce((e - ep) * (e - ep), 0.0) AS d2,
             coalesce(e * ep, 0.0) AS cr
           FROM lg),
         f AS (
           SELECT event_type, min(n) AS n_days,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(e2 ORDER BY day)), (a, x) -> a + x) AS se2,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(d2 ORDER BY day)), (a, x) -> a + x) AS sd2,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(cr ORDER BY day)), (a, x) -> a + x) AS scr
           FROM t GROUP BY 1)
         SELECT event_type, n_days,
           round(CASE WHEN se2 = 0.0 THEN NULL
             ELSE sd2 / se2 END, 5) + 0.0 AS dw,
           round(CASE WHEN se2 = 0.0 THEN NULL
             ELSE scr / se2 END, 5) + 0.0 AS rho1
         FROM f ORDER BY event_type""",

    "text_simpson_diversity" ->
      """WITH tok AS (
           SELECT lang,
             unnest(string_split_regex(lower(text), '\s+')) AS token
           FROM documents),
         tc AS (
           SELECT lang, token, CAST(count(*) AS BIGINT) AS c
           FROM tok GROUP BY 1, 2),
         agg AS (
           SELECT lang, CAST(sum(c) AS HUGEINT) AS n_tok,
             CAST(count(*) AS BIGINT) AS n_types,
             CAST(sum(CAST(c AS HUGEINT) * (c - 1)) AS HUGEINT)
               AS num
           FROM tc GROUP BY 1)
         SELECT lang, CAST(n_tok AS BIGINT) AS n_tokens, n_types,
           round(CASE WHEN n_tok < 2 THEN NULL
             ELSE CAST(num AS DOUBLE) /
               CAST(n_tok * (n_tok - 1) AS DOUBLE) END, 6) + 0.0
             AS simpson,
           round(CASE WHEN n_tok < 2 OR num = 0 THEN NULL
             ELSE CAST(n_tok * (n_tok - 1) AS DOUBLE) /
               CAST(num AS DOUBLE) END, 4) + 0.0 AS inv_simpson
         FROM agg ORDER BY lang""",

    "q177_cohens_kappa" ->
      """WITH r AS (
           SELECT
             CASE WHEN n_chars < 200 THEN 'short'
               WHEN n_chars < 1000 THEN 'medium'
               ELSE 'long' END AS ra,
             CASE WHEN len(string_split_regex(lower(text), '\s+'))
                 < 40 THEN 'short'
               WHEN len(string_split_regex(lower(text), '\s+'))
                 < 200 THEN 'medium'
               ELSE 'long' END AS rb
           FROM documents),
         cell AS (
           SELECT ra, rb, CAST(count(*) AS BIGINT) AS c
           FROM r GROUP BY 1, 2),
         m AS (
           SELECT CAST(sum(c) AS HUGEINT) AS n,
             CAST(sum(CASE WHEN ra = rb THEN c ELSE 0 END)
               AS HUGEINT) AS diag
           FROM cell),
         rowm AS (
           SELECT ra, CAST(sum(c) AS BIGINT) AS rn
           FROM cell GROUP BY 1),
         colm AS (
           SELECT rb, CAST(sum(c) AS BIGINT) AS cn
           FROM cell GROUP BY 1),
         pen AS (
           SELECT coalesce(CAST(sum(CAST(rn AS HUGEINT) * cn)
             AS HUGEINT), 0) AS pen
           FROM rowm JOIN colm ON colm.rb = rowm.ra)
         SELECT CAST(n AS BIGINT) AS n_docs,
           round(CASE WHEN n = 0 THEN NULL
             ELSE CAST(diag AS DOUBLE) / CAST(n AS DOUBLE) END, 6)
             + 0.0 AS p_observed,
           round(CASE WHEN n = 0 THEN NULL
             ELSE CAST(pen AS DOUBLE) / CAST(n * n AS DOUBLE) END, 6)
             + 0.0 AS p_expected,
           round(CASE WHEN n * n - pen = 0 THEN NULL
             ELSE CAST(n * diag - pen AS DOUBLE) /
               CAST(n * n - pen AS DOUBLE) END, 6) + 0.0 AS kappa
         FROM m, pen""",

    "q178_kruskal_wallis" ->
      """WITH o AS (
           SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(((date_diff('day', DATE '1970-01-05',
               o_orderdate) % 7) + 7) % 7 AS BIGINT) AS wd
           FROM orders),
         bv AS (
           SELECT cents, wd, CAST(count(*) AS BIGINT) AS c
           FROM o GROUP BY 1, 2),
         tv AS (
           SELECT cents, CAST(count(*) AS BIGINT) AS t
           FROM o GROUP BY 1),
         rk AS (
           SELECT cents,
             CAST(2 * sum(t) OVER (ORDER BY cents
               ROWS UNBOUNDED PRECEDING) - t + 1 AS HUGEINT)
               AS rank2
           FROM tv),
         grp AS (
           SELECT b.wd, CAST(sum(b.c) AS BIGINT) AS ng,
             sum(CAST(b.c AS HUGEINT) * r.rank2) AS rg2
           FROM bv b JOIN rk r ON r.cents = b.cents GROUP BY 1),
         gtot AS (
           SELECT CAST(sum(t) AS HUGEINT) AS n,
             CAST(sum(CAST(t AS HUGEINT) * t * t - t) AS HUGEINT)
               AS tie3
           FROM tv),
         panel AS (
           SELECT CAST(count(*) AS BIGINT) AS n_groups,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list((CAST(rg2 AS DOUBLE) / 2.0 *
                 (CAST(rg2 AS DOUBLE) / 2.0)) / CAST(ng AS DOUBLE)
                 ORDER BY wd)),
               (a, x) -> a + x) AS sterm
           FROM grp),
         a AS (
           SELECT p.n_groups, p.sterm, g.n, g.tie3,
             CAST(g.n AS DOUBLE) AS nd
           FROM panel p, gtot g),
         b AS (
           SELECT n_groups, n,
             CASE WHEN n_groups < 2 OR n < 2 THEN NULL
               ELSE 12.0 / (nd * (nd + 1.0)) * sterm -
                 3.0 * (nd + 1.0) END AS h,
             1.0 - CAST(tie3 AS DOUBLE) /
               CAST(n * n * n - n AS DOUBLE) AS corr
           FROM a),
         c AS (
           SELECT n_groups, n, h,
             CASE WHEN h IS NULL OR corr = 0.0 THEN NULL
               ELSE h / corr END AS htc
           FROM b)
         SELECT CAST(n AS BIGINT) AS n_orders, n_groups,
           round(h, 4) + 0.0 AS h_stat,
           round(htc, 4) + 0.0 AS h_tie_corr,
           round(CASE WHEN n_groups <> 7 OR htc IS NULL THEN NULL
             ELSE exp(-htc / 2.0) * (1.0 + htc / 2.0 +
               (htc / 2.0) * (htc / 2.0) / 2.0) END, 6) + 0.0
             AS p_value
         FROM c""",

    "q179_weekday_anova" ->
      """WITH o AS (
           SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
             CAST(((date_diff('day', DATE '1970-01-05',
               o_orderdate) % 7) + 7) % 7 AS BIGINT) AS wd
           FROM orders),
         grp AS (
           SELECT wd, CAST(count(*) AS BIGINT) AS ng,
             CAST(sum(CAST(v AS HUGEINT)) AS HUGEINT) AS sg,
             sum(CAST(v AS HUGEINT) * v) AS sgg
           FROM o GROUP BY 1),
         panel AS (
           SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(ng) AS HUGEINT) AS n,
             CAST(sum(sg) AS HUGEINT) AS sv,
             CAST(sum(sgg) AS HUGEINT) AS svv,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list((CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)) /
                 CAST(ng AS DOUBLE) ORDER BY wd)),
               (a, x) -> a + x) AS sbterm
           FROM grp),
         a AS (
           SELECT k, n, CAST(n AS DOUBLE) AS nd, sbterm,
             sbterm - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) /
               CAST(n AS DOUBLE) AS ssb,
             CAST(svv AS DOUBLE) - sbterm AS ssw,
             CAST(svv AS DOUBLE) - CAST(sv AS DOUBLE) *
               CAST(sv AS DOUBLE) / CAST(n AS DOUBLE) AS sst
           FROM panel)
         SELECT CAST(n AS BIGINT) AS n_orders, k AS n_groups,
           round(CASE WHEN k < 2 OR n <= k OR ssw <= 0.0 THEN NULL
             ELSE (ssb / CAST(k - 1 AS DOUBLE)) /
               (ssw / (nd - CAST(k AS DOUBLE))) END, 4) + 0.0
             AS f_stat,
           round(CASE WHEN sst <= 0.0 THEN NULL
             ELSE ssb / sst END, 6) + 0.0 AS eta_sq
         FROM a""",

    // The house lower median (q80's rank floor(0.5(n-1))+1) replayed
    // per weekday, then q179's exact-moment ANOVA on the deviations.
    "q181_levene_bf" ->
      """WITH o AS MATERIALIZED (
           SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(((date_diff('day', DATE '1970-01-05',
               o_orderdate) % 7) + 7) % 7 AS BIGINT) AS wd
           FROM orders),
         r1 AS MATERIALIZED (
           SELECT wd, cents,
             row_number() OVER (PARTITION BY wd ORDER BY cents) AS rn,
             count(*) OVER (PARTITION BY wd) AS n
           FROM o),
         med AS MATERIALIZED (
           SELECT wd,
             min(CASE WHEN rn = CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1
                      THEN cents END) AS med_cents
           FROM r1 GROUP BY wd),
         dev AS MATERIALIZED (
           SELECT o.wd, abs(o.cents - m.med_cents) AS v
           FROM o JOIN med m ON m.wd = o.wd),
         grp AS MATERIALIZED (
           SELECT wd, CAST(count(*) AS BIGINT) AS ng,
             CAST(sum(CAST(v AS HUGEINT)) AS HUGEINT) AS sg,
             sum(CAST(v AS HUGEINT) * v) AS sgg
           FROM dev GROUP BY 1),
         panel AS (
           SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(ng) AS HUGEINT) AS n,
             CAST(sum(sg) AS HUGEINT) AS sv,
             CAST(sum(sgg) AS HUGEINT) AS svv,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list((CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)) /
                 CAST(ng AS DOUBLE) ORDER BY wd)),
               (a, x) -> a + x) AS sbterm
           FROM grp),
         a AS (
           SELECT k, n, CAST(n AS DOUBLE) AS nd, sbterm,
             sbterm - CAST(sv AS DOUBLE) * CAST(sv AS DOUBLE) /
               CAST(n AS DOUBLE) AS ssb,
             CAST(svv AS DOUBLE) - sbterm AS ssw
           FROM panel)
         SELECT CAST(n AS BIGINT) AS n_orders, k AS n_groups,
           round(CASE WHEN k < 2 OR n <= k OR ssw <= 0.0 THEN NULL
             ELSE (ssb / CAST(k - 1 AS DOUBLE)) /
               (ssw / (nd - CAST(k AS DOUBLE))) END, 4) + 0.0
             AS f_bf
         FROM a""",

    // Welch's F* and Satterthwaite dof assembled from the same exact
    // moments in the same wd-ordered fold sequence (W, weighted mean,
    // between-term, correction term).
    "q182_welch_anova" ->
      """WITH o AS MATERIALIZED (
           SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
             CAST(((date_diff('day', DATE '1970-01-05',
               o_orderdate) % 7) + 7) % 7 AS BIGINT) AS wd
           FROM orders),
         grp AS MATERIALIZED (
           SELECT wd, CAST(count(*) AS BIGINT) AS ng,
             CAST(sum(CAST(v AS HUGEINT)) AS HUGEINT) AS sg,
             sum(CAST(v AS HUGEINT) * v) AS sgg
           FROM o GROUP BY 1),
         w AS MATERIALIZED (
           SELECT wd, ng,
             (CAST(sgg AS DOUBLE) -
                 CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) /
                   CAST(ng AS DOUBLE)) /
                (CAST(ng AS DOUBLE) - 1.0) AS s2g,
             CAST(ng AS DOUBLE) /
               ((CAST(sgg AS DOUBLE) -
                 CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE) /
                   CAST(ng AS DOUBLE)) /
                (CAST(ng AS DOUBLE) - 1.0)) AS wg,
             CAST(sg AS DOUBLE) / CAST(ng AS DOUBLE) AS yb,
             CAST(ng AS DOUBLE) AS ngd
           FROM grp),
         s1 AS MATERIALIZED (
           SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(min(ng) AS BIGINT) AS min_ng,
             CAST(min(s2g) AS DOUBLE) AS min_s2,
             (SELECT CAST(sum(ng) AS BIGINT) FROM grp) AS n,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(wg ORDER BY wd)), (a, x) -> a + x) AS bigw,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(wg * yb ORDER BY wd)), (a, x) -> a + x) AS swyb
           FROM w),
         s2 AS MATERIALIZED (
           SELECT k, min_ng, min_s2, n, bigw, swyb / bigw AS ybw,
             CAST(k AS DOUBLE) AS kd
           FROM s1),
         s3 AS (
           SELECT s2.k, s2.min_ng, s2.min_s2, s2.n, s2.kd,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(w.wg * (w.yb - s2.ybw) * (w.yb - s2.ybw)
                 ORDER BY w.wd)), (a, x) -> a + x) /
               (s2.kd - 1.0) AS aterm,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list((1.0 - w.wg / s2.bigw) * (1.0 - w.wg / s2.bigw) /
                 (w.ngd - 1.0) ORDER BY w.wd)),
               (a, x) -> a + x) AS bterm
           FROM w, s2
           GROUP BY s2.k, s2.min_ng, s2.min_s2, s2.n, s2.kd,
             s2.ybw, s2.bigw)
         SELECT n AS n_orders, k AS n_groups,
           round(CASE WHEN k < 2 OR min_ng < 2
               OR NOT (min_s2 > 0.0) THEN NULL
             ELSE aterm / (1.0 + 2.0 * (kd - 2.0) /
               (kd * kd - 1.0) * bterm) END, 4) + 0.0 AS f_welch,
           round(CASE WHEN k < 2 OR min_ng < 2
               OR NOT (min_s2 > 0.0) OR bterm = 0.0
             THEN NULL
             ELSE (kd * kd - 1.0) / (3.0 * bterm) END, 2) + 0.0
             AS dof2
         FROM s3""",

    // The same x2-scaled average tied ranks (rank() + equality-count
    // windows over 7-row blocks), rank sums, and chi2 assembly.
    "q183_friedman" ->
      """WITH cells AS MATERIALIZED (
           SELECT (year(o_orderdate) * 12 + month(o_orderdate)) AS m,
             CAST(((date_diff('day', DATE '1970-01-05',
               o_orderdate) % 7) + 7) % 7 AS BIGINT) AS wd,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
               AS HUGEINT) AS v
           FROM orders GROUP BY 1, 2),
         full_b AS MATERIALIZED (
           SELECT * FROM (
             SELECT m, wd, v,
               count(*) OVER (PARTITION BY m) AS nw
             FROM cells) WHERE nw = 7),
         ranked AS MATERIALIZED (
           SELECT m, wd,
             2 * (rank() OVER (PARTITION BY m ORDER BY v) - 1) +
               count(*) OVER (PARTITION BY m, v) + 1 AS rank2
           FROM full_b),
         rj AS MATERIALIZED (
           SELECT wd, CAST(sum(rank2) AS BIGINT) AS r2j,
             CAST(count(*) AS BIGINT) AS b
           FROM ranked GROUP BY 1),
         panel AS (
           SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(max(b) AS BIGINT) AS b,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list((CAST(r2j AS DOUBLE) / 2.0) *
                 (CAST(r2j AS DOUBLE) / 2.0) ORDER BY wd)),
               (a, x) -> a + x) AS sr2
           FROM rj),
         a AS (
           SELECT b, k, CAST(b AS DOUBLE) AS bd,
             CAST(k AS DOUBLE) AS kd, sr2,
             12.0 / (CAST(b AS DOUBLE) * CAST(k AS DOUBLE) *
               (CAST(k AS DOUBLE) + 1.0)) * sr2 -
               3.0 * CAST(b AS DOUBLE) * (CAST(k AS DOUBLE) + 1.0)
               AS chi2
           FROM panel)
         SELECT b AS n_blocks, k AS n_groups,
           round(CASE WHEN b < 2 THEN NULL ELSE chi2 END, 4) + 0.0
             AS chi2_f,
           round(CASE WHEN k <> 7 OR b < 2 THEN NULL
             ELSE exp(-chi2 / 2.0) * (1.0 + chi2 / 2.0 +
               (chi2 / 2.0) * (chi2 / 2.0) / 2.0) END, 6) + 0.0
             AS p_value
         FROM a""",

    // The IVM proof: the oracle recomputes the CUSUM DIRECTLY over
    // the full events table (q84's oracle replayed verbatim) while
    // the Spark side merged three on-disk state batches — a hash
    // match certifies merge == recompute through the real sink path.
    "q180_cusum_ivm" ->
      """WITH daily AS (
           SELECT event_type,
             CAST(datediff('day', DATE '2024-01-01',
                 CAST(ts AS DATE)) AS BIGINT) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS x
           FROM events GROUP BY 1, 2),
         stats AS (
           SELECT event_type, day, x,
             count(*) OVER (PARTITION BY event_type) AS n_days,
             sum(x) OVER (PARTITION BY event_type) AS tot
           FROM daily),
         c AS (
           SELECT event_type, day, n_days,
             sum(n_days * x - tot)
               OVER (PARTITION BY event_type ORDER BY day
                     ROWS UNBOUNDED PRECEDING) AS cum
           FROM stats),
         s AS (
           SELECT event_type, day, n_days,
             cum - least(min(cum) OVER (PARTITION BY event_type
               ORDER BY day ROWS UNBOUNDED PRECEDING), 0) AS cusum
           FROM c),
         r AS (
           SELECT event_type, day, n_days, cusum,
             row_number() OVER (PARTITION BY event_type
               ORDER BY cusum DESC, day) AS rn
           FROM s)
         SELECT event_type, CAST(n_days AS BIGINT) AS n_days,
           CAST(cusum AS BIGINT) AS peak_cusum, day AS peak_day
         FROM r WHERE rn = 1 ORDER BY event_type""",

    // The IVM proof, lateness edition: the oracle is q124's audit
    // recomputed in one pass over the full table while the Spark
    // side merged three swap-renamed per-user state batches — the
    // hash match certifies the cross-batch hwm chain == the global
    // arrival-order running max.
    "q184_lateness_ivm" ->
      """WITH e AS (
           SELECT user_id, event_id,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us
           FROM events),
         h AS (
           SELECT us,
             max(us) OVER (PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS hwm
           FROM e),
         l AS (
           SELECT CASE WHEN hwm IS NOT NULL AND us < hwm
                  THEN hwm - us ELSE 0 END AS late_us
           FROM h)
         SELECT CAST(count(*) AS BIGINT) AS n_events,
           CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_late,
           CAST(max(late_us) AS BIGINT) AS max_late_us,
           CAST(sum(late_us) //
             greatest(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END), 1)
             AS BIGINT) AS mean_late_us,
           round(CAST(sum(CASE WHEN late_us > 0 THEN 1 ELSE 0 END)
               AS DOUBLE) / CAST(count(*) AS DOUBLE), 6) AS late_share
         FROM l""",

    // The streaming-parity proof: every epoch-aligned weekly window's
    // exact top-3 (count desc, name tiebreak) recomputed in one batch
    // pass — what the transformWithState replay must emit once per
    // closed window, with cross-batch MapState merged exactly.
    "q185_topk_ivm" ->
      """WITH e AS (
           SELECT event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) // 1000 AS ms
           FROM events),
         w AS (
           SELECT event_type, ms - ms % 604800000 AS window_start
           FROM e),
         c AS (
           SELECT window_start, event_type,
             CAST(count(*) AS BIGINT) AS n
           FROM w GROUP BY 1, 2),
         r AS (
           SELECT window_start, event_type, n,
             row_number() OVER (PARTITION BY window_start
               ORDER BY n DESC, event_type) AS rk
           FROM c)
         SELECT CAST(window_start AS BIGINT) AS window_start,
           CAST(rk AS BIGINT) AS rank, event_type, n
         FROM r WHERE rk <= 3""")
}
