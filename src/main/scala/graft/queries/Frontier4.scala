package graft.queries

import org.apache.spark.sql.functions._

import graft.{Q, Tables}

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
    }))

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
         GROUP BY 1, 2, 3 ORDER BY 1""")
}
