package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Round-16 frontier (batch 5): the risk & time-series econometrics
  * panel on the daily revenue series — the (augmented-less)
  * Dickey–Fuller unit-root test (is daily spend mean-reverting or a
  * random walk), the Lo–MacKinlay variance-ratio statistic (the
  * aggregation-consistency read on the same question), value-at-risk
  * + expected shortfall of day-over-day changes (the tail-risk
  * numbers every ops dashboard wants under q84's CUSUM), and the
  * Newey–West HAC long-run variance (the autocorrelation-robust
  * standard error that q123's z-test silently assumes away).
  *
  * Reference note: the reference engine (`/root/reference/`, a Go log
  * forwarder — SURVEY.md §1) has no analytics surface; these extend
  * the Frontier time-series family. Shared machinery: ONE daily panel
  * (events → groupBy(day), span-bounded at any corpus size), lag
  * pairing by day-keyed self-joins (q132's no-imputation discipline),
  * exact integer/decimal moments, fixed IEEE assembly over one (or
  * enum-bounded) aggregate rows, DuckDB oracles replaying identical
  * arithmetic.
  */
object Frontier8 {

  private val dec = "decimal(38,0)"

  /** Daily spend panel: one row per observed day, exact cents. */
  private def dailySpend(s: SparkSession, d: String): DataFrame = {
    import s.implicits._
    Tables.load(s, d, "events")
      .select(to_date($"ts").as("day"),
        round($"value" * 100).cast("long").as("cents"))
      .groupBy($"day").agg(sum($"cents").as("y"))
  }

  /** SQL twin of [[dailySpend]]. */
  private val dailySql =
    """SELECT CAST(ts AS DATE) AS day,
         CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS y
       FROM events GROUP BY 1"""

  def queries: Map[String, Q] = Map(

    // Dickey–Fuller test (constant, no augmentation): regress the
    // day-over-day CHANGE on the lagged LEVEL — β near 0 means a unit
    // root (shocks persist), β < 0 mean reversion; the t-statistic
    // β/se(β) is what the DF critical values grade. The trend-side
    // complement of q110's Mann–Kendall (which tests monotone drift,
    // not persistence). Plan: the q205 skeleton — daily panel, lag-1
    // self-join, one aggregate of exact moments (decimal second
    // moments), one fixed IEEE assembly including the OLS residual
    // variance. Degenerate guards → NULL.
    "q208_adf" -> ((s, d) => {
      import s.implicits._
      val daily = dailySpend(s, d)
      val pairs = daily.select($"day", $"y")
        .join(daily.select(expr("date_add(day, 1)").as("day"),
          $"y".as("u")), Seq("day"))
        .select(($"y" - $"u").as("dy"), $"u")
      pairs.agg(count(lit(1)).as("n"),
          sum($"u").as("su"), sum($"dy").as("sd"),
          sum($"u".cast(dec) * $"u").as("suu"),
          sum($"u".cast(dec) * $"dy").as("sud"),
          sum($"dy".cast(dec) * $"dy").as("sdd"))
        .withColumn("nd", $"n".cast("double"))
        .withColumn("cuu", $"suu".cast("double") -
          $"su".cast("double") * $"su".cast("double") / $"nd")
        .withColumn("cud", $"sud".cast("double") -
          $"su".cast("double") * $"sd".cast("double") / $"nd")
        .withColumn("cdd", $"sdd".cast("double") -
          $"sd".cast("double") * $"sd".cast("double") / $"nd")
        .withColumn("beta", when($"cuu" <= 0.0,
          lit(null).cast("double")).otherwise($"cud" / $"cuu"))
        .withColumn("rss", $"cdd" - $"beta" * $"cud")
        .select($"n".as("n_pairs"),
          Tables.nz(round($"beta", 6)).as("beta"),
          Tables.nz(round(($"sd".cast("double") / $"nd" -
            $"beta" * $"su".cast("double") / $"nd") / 100.0, 4))
            .as("alpha_drift_dollars"),
          Tables.nz(round(when($"rss" <= 0.0,
              lit(null).cast("double"))
            .otherwise($"beta" /
              sqrt($"rss" / ($"nd" - 2.0) / $"cuu")), 4))
            .as("df_t_stat"))
    }),

    // Lo–MacKinlay variance ratio VR(q) = Var(q-day sum)/(q·Var(1-day))
    // for q ∈ {2, 4, 8}, overlapping windows, with the homoskedastic
    // z-statistic z = (VR−1)/√(2(2q−1)(q−1)/(3qn)). VR ≈ 1 is the
    // random-walk signature; VR > 1 positive persistence, < 1 mean
    // reversion — the multi-horizon twin of q208's single-β read.
    // Plan: the daily panel exploded by the (q, offset) literal grid
    // (≤ 14 offsets), grouped back to overlapping q-day window sums
    // (kept only when all q days exist — no-imputation), then one
    // moment aggregate per q (3 rows out) with exact decimal sums;
    // the base 1-day variance is a 1-row broadcast. Window sums of
    // cents stay exact longs; squares go decimal.
    "q209_variance_ratio" -> ((s, d) => {
      import s.implicits._
      val daily = dailySpend(s, d)
      val base = daily.agg(count(lit(1)).as("n1"),
        sum($"y").as("s1"), sum($"y".cast(dec) * $"y").as("s11"))
      val wins = daily
        .select($"day", $"y",
          explode(expr("array(2, 4, 8)")).as("q"))
        .select($"day", $"q", $"y",
          explode(expr("sequence(0, q - 1)")).as("off"))
        .withColumn("anchor", expr("date_add(day, off)"))
        .groupBy($"q", $"anchor")
        .agg(count(lit(1)).as("k"), sum($"y").as("w"))
        .filter($"k" === $"q")
      wins.groupBy($"q".cast("long").as("q"))
        .agg(count(lit(1)).as("n_windows"),
          sum($"w").as("sw"), sum($"w".cast(dec) * $"w").as("sww"))
        .crossJoin(broadcast(base))
        .withColumn("varq",
          ($"sww".cast("double") - $"sw".cast("double") *
            $"sw".cast("double") / $"n_windows".cast("double")) /
            $"n_windows".cast("double"))
        .withColumn("var1",
          ($"s11".cast("double") - $"s1".cast("double") *
            $"s1".cast("double") / $"n1".cast("double")) /
            $"n1".cast("double"))
        .withColumn("vr", when($"var1" <= 0.0,
            lit(null).cast("double"))
          .otherwise($"varq" / ($"q".cast("double") * $"var1")))
        .select($"q", $"n_windows",
          Tables.nz(round($"vr", 4)).as("vr"),
          Tables.nz(round(($"vr" - 1.0) /
            sqrt(lit(2.0) * (lit(2.0) * $"q".cast("double") - 1.0) *
              ($"q".cast("double") - 1.0) /
              (lit(3.0) * $"q".cast("double") *
                $"n_windows".cast("double"))), 4)).as("z_stat"))
        .orderBy($"q")
    }),

    // Value-at-risk + expected shortfall of day-over-day revenue
    // changes: VaR₉₅ is the 5th percentile of Δspend (one
    // percentile_cont row — the q197/q206 parity pattern), ES₉₅ the
    // exact mean of the changes at or below it (tail cents sum stays
    // an exact long; ONE final divide). The severity companion to
    // q84's CUSUM (which flags WHEN a shift happens; VaR/ES say how
    // bad the bad days are). Plan: lag-1 self-join on the panel, the
    // 1-row percentile broadcast back over it, one conditional
    // aggregate. Nothing beyond the daily rollup shuffles.
    "q210_var_es" -> ((s, d) => {
      import s.implicits._
      val daily = dailySpend(s, d)
      val chg = daily.select($"day", $"y")
        .join(daily.select(expr("date_add(day, 1)").as("day"),
          $"y".as("u")), Seq("day"))
        .select(($"y" - $"u").as("dy"))
      val v = chg.agg(
        expr("percentile_cont(0.05) WITHIN GROUP (ORDER BY dy)")
          .as("var95c"))
      chg.crossJoin(broadcast(v))
        .agg(count(lit(1)).as("n_changes"),
          sum(when($"dy".cast("double") <= $"var95c", 1L)
            .otherwise(0L)).as("n_tail"),
          sum(when($"dy".cast("double") <= $"var95c", $"dy")
            .otherwise(0L)).as("tail_cents"),
          first($"var95c").as("var95c"))
        .select($"n_changes", $"n_tail",
          Tables.nz(round($"var95c" / 100.0, 4)).as("var95_dollars"),
          Tables.nz(round(when($"n_tail" === 0L,
              lit(null).cast("double"))
            .otherwise($"tail_cents".cast("double") /
              $"n_tail".cast("double") / 100.0), 4))
            .as("es95_dollars"))
    }),

    // Engle's ARCH-LM test (lag 1): does today's squared revenue
    // change predict tomorrow's — volatility CLUSTERING, the
    // second-moment memory q208 (level persistence) and q132 (level
    // autocorrelation) cannot see; significant LM says variance-
    // sensitive monitors (q210's VaR) need conditional, not
    // unconditional, variance. Plan: the q205/q208 skeleton on the
    // SQUARED lag pairs. Exactness: Δ² is computed in decimal and
    // floor-divided by 10⁴ (cents²→hundredth-dollars², the identical
    // truncation both engines replay) so its squares stay inside
    // decimal(38,0)/HUGEINT through sf100; LM = n·R² with
    // R² = c_uy²/(c_uu·c_yy), one fixed IEEE expression.
    "q215_arch_lm" -> ((s, d) => {
      import s.implicits._
      val daily = dailySpend(s, d)
      val sq = daily.select($"day", $"y")
        .join(daily.select(expr("date_add(day, 1)").as("day"),
          $"y".as("u0")), Seq("day"))
        // `div` is the INTEGRAL divide (yields a long) — the exact
        // truncation DuckDB's `//` on HUGEINT replays
        .select(expr(
          s"(cast(y - u0 as $dec) * (y - u0)) div 10000").as("e2"),
          $"day")
      val pairs = sq.select($"day", $"e2".as("ey"))
        .join(sq.select(expr("date_add(day, 1)").as("day"),
          $"e2".as("eu")), Seq("day"))
      pairs.agg(count(lit(1)).as("n"),
          sum($"ey".cast(dec)).as("sy"), sum($"eu".cast(dec)).as("su"),
          sum($"ey".cast(dec) * $"ey").as("syy"),
          sum($"eu".cast(dec) * $"eu").as("suu"),
          sum($"ey".cast(dec) * $"eu").as("syu"))
        .withColumn("nd", $"n".cast("double"))
        .withColumn("cyy", $"syy".cast("double") -
          $"sy".cast("double") * $"sy".cast("double") / $"nd")
        .withColumn("cuu", $"suu".cast("double") -
          $"su".cast("double") * $"su".cast("double") / $"nd")
        .withColumn("cyu", $"syu".cast("double") -
          $"sy".cast("double") * $"su".cast("double") / $"nd")
        .withColumn("r2", when($"cuu" <= 0.0 || $"cyy" <= 0.0,
            lit(null).cast("double"))
          .otherwise($"cyu" * $"cyu" / ($"cuu" * $"cyy")))
        .select($"n".as("n_pairs"),
          Tables.nz(round($"r2", 6)).as("r2"),
          Tables.nz(round($"nd" * $"r2", 4)).as("arch_lm"))
    }),

    // Minimum detectable effect: for each event type, the absolute
    // and relative per-user effect a two-arm test could detect at
    // α = 0.05 (two-sided) / 80 % power if HALF the users were
    // treated — the experiment-sizing read that turns q123's
    // after-the-fact z-test into a design tool ("is this segment big
    // enough to test in"). MDE = (z₀.₉₇₅ + z₀.₈)·√(2σ²/(n/2)) with
    // the z's as shared literal constants (no inverse-CDF divergence
    // risk — both engines read the same doubles). σ² is the
    // population variance of per-user total value from exact
    // decimal moments (one user rollup, one per-type moment row);
    // the assembly is a fixed IEEE expression.
    "q216_mde" -> ((s, d) => {
      import s.implicits._
      val per = Tables.load(s, d, "events")
        .select($"event_type", $"user_id",
          round($"value" * 100).cast("long").as("cents"))
        .groupBy($"event_type", $"user_id")
        .agg(sum($"cents").as("x"))
      per.groupBy($"event_type")
        .agg(count(lit(1)).as("n_users"), sum($"x").as("sx"),
          sum($"x".cast(dec) * $"x").as("sxx"))
        .withColumn("nd", $"n_users".cast("double"))
        .withColumn("mu", $"sx".cast("double") / $"nd")
        .withColumn("sig2", $"sxx".cast("double") / $"nd" -
          $"mu" * $"mu")
        // one shared literal (z_0.975 + z_0.8 = 2.801585), NOT a sum
        // of two literals — a Scala-side float add could differ from
        // the oracle's parsed constant by an ulp
        .withColumn("mde_cents",
          lit(2.801585) *
            sqrt(lit(2.0) * $"sig2" / ($"nd" / 2.0)))
        .select($"event_type", $"n_users",
          Tables.nz(round($"mu" / 100.0, 4)).as("mean_dollars"),
          Tables.nz(round($"mde_cents" / 100.0, 4)).as("mde_dollars"),
          Tables.nz(round(when($"mu" <= 0.0,
              lit(null).cast("double"))
            .otherwise($"mde_cents" / $"mu"), 6)).as("mde_relative"))
        .orderBy($"event_type")
    }),

    // Upper-tail dependence of daily (spend, volume): given a
    // top-decile spend day, how often is volume ALSO top-decile —
    // the λ_U estimator P(Y > q_Y | X > q_X) at u = 0.9. Pearson
    // (q43) reads average co-movement; tail dependence reads the
    // co-movement of EXTREMES, which is what capacity planning and
    // incident correlation actually ask (under independence the
    // conditional rate would be 0.1; the output exposes that
    // baseline implicitly via the marginal counts). Plan: the daily
    // panel, the two 0.9-quantiles in ONE percentile_cont row
    // broadcast back (q197/q206 pattern), one conditional aggregate
    // of exact counts, one final IEEE divide.
    "q214_tail_dependence" -> ((s, d) => {
      import s.implicits._
      val daily = Tables.load(s, d, "events")
        .select(to_date($"ts").as("day"),
          round($"value" * 100).cast("long").as("cents"))
        .groupBy($"day")
        .agg(sum($"cents").as("y"), count(lit(1)).as("v"))
      val qs = daily.agg(
        expr("percentile_cont(0.9) WITHIN GROUP (ORDER BY y)")
          .as("qy"),
        expr("percentile_cont(0.9) WITHIN GROUP (ORDER BY v)")
          .as("qv"))
      daily.crossJoin(broadcast(qs))
        .agg(count(lit(1)).as("n_days"),
          sum(when($"y".cast("double") > $"qy", 1L).otherwise(0L))
            .as("n_tail_spend"),
          sum(when($"v".cast("double") > $"qv", 1L).otherwise(0L))
            .as("n_tail_volume"),
          sum(when($"y".cast("double") > $"qy" &&
            $"v".cast("double") > $"qv", 1L).otherwise(0L))
            .as("n_joint"))
        .select($"n_days", $"n_tail_spend", $"n_tail_volume",
          $"n_joint",
          Tables.nz(round(when($"n_tail_spend" === 0L,
              lit(null).cast("double"))
            .otherwise($"n_joint".cast("double") /
              $"n_tail_spend".cast("double")), 4)).as("lambda_u"))
    }),

    // Newey–West HAC long-run variance of daily spend (Bartlett
    // kernel, L = 7 lags): γ₀ + 2Σ w_l·γ_l with w_l = 1 − l/(L+1),
    // where γ_l uses the GLOBAL mean and the 1/N convention — the
    // autocorrelation-robust denominator that turns a naive mean
    // standard error into one that survives the weekly seasonality
    // q151 measures. Plan: the panel lag-joined against itself for
    // l ∈ 0..7 (one explode over the lag literal grid), per-lag exact
    // moments (8 rows), the global-mean row broadcast, and the
    // Bartlett fold over the lag-sorted 8-row panel (enum-bounded
    // collect, CollectGuardSpec entry). Dollars² display units.
    "q211_newey_west" -> ((s, d) => {
      import s.implicits._
      val daily = dailySpend(s, d)
      val g = daily.agg(count(lit(1)).as("nn"), sum($"y").as("sy"))
      val lagged = daily
        .select($"day", $"y", explode(expr("sequence(0, 7)")).as("l"))
        .withColumn("day2", expr("date_add(day, l)"))
        .select($"l".cast("long").as("l"), $"day2", $"y".as("u"))
        .join(daily.select($"day".as("day2"), $"y"), Seq("day2"))
      val perLag = lagged.groupBy($"l")
        .agg(count(lit(1)).as("np"), sum($"y").as("syl"),
          sum($"u").as("sul"), sum($"y".cast(dec) * $"u").as("syu"))
      perLag.crossJoin(broadcast(g))
        .withColumn("mu", $"sy".cast("double") / $"nn".cast("double"))
        .withColumn("gam",
          ($"syu".cast("double") - $"mu" *
            ($"syl".cast("double") + $"sul".cast("double")) +
            $"np".cast("double") * $"mu" * $"mu") /
            $"nn".cast("double"))
        .groupBy()
        .agg(first($"nn").as("n_days"),
          sort_array(collect_list(struct($"l", $"gam"))).as("cs"))
        .withColumn("gamma0", expr(
          "aggregate(cs, cast(0.0 as double), (acc, c) -> " +
            "acc + CASE WHEN c.l = 0 THEN c.gam ELSE 0.0 END)"))
        .withColumn("lrv", expr(
          """aggregate(cs, cast(0.0 as double), (acc, c) ->
             acc + CASE WHEN c.l = 0 THEN c.gam
               ELSE 2.0 * (1.0 - cast(c.l as double) / 8.0) * c.gam
               END)"""))
        .select($"n_days",
          Tables.nz(round($"gamma0" / 10000.0, 4))
            .as("gamma0_dollars2"),
          Tables.nz(round($"lrv" / 10000.0, 4))
            .as("longrun_var_dollars2"),
          Tables.nz(round(
            sqrt(greatest($"lrv", lit(0.0)) /
              $"n_days".cast("double")) / 100.0, 4))
            .as("nw_se_mean_dollars"))
    }))

  def oracles: Map[String, String] = Map(

    "q208_adf" ->
      s"""WITH daily AS ($dailySql),
         pairs AS (
           SELECT t.y - p.y AS dy, p.y AS u
           FROM daily t JOIN daily p ON t.day = p.day + 1),
         m AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
             sum(CAST(u AS HUGEINT)) AS su,
             sum(CAST(dy AS HUGEINT)) AS sd,
             sum(CAST(u AS HUGEINT) * u) AS suu,
             sum(CAST(u AS HUGEINT) * dy) AS sud,
             sum(CAST(dy AS HUGEINT) * dy) AS sdd
           FROM pairs),
         cm AS (
           SELECT n, CAST(n AS DOUBLE) AS nd,
             CAST(suu AS DOUBLE) - CAST(su AS DOUBLE)
               * CAST(su AS DOUBLE) / CAST(n AS DOUBLE) AS cuu,
             CAST(sud AS DOUBLE) - CAST(su AS DOUBLE)
               * CAST(sd AS DOUBLE) / CAST(n AS DOUBLE) AS cud,
             CAST(sdd AS DOUBLE) - CAST(sd AS DOUBLE)
               * CAST(sd AS DOUBLE) / CAST(n AS DOUBLE) AS cdd,
             CAST(sd AS DOUBLE) AS sdm, CAST(su AS DOUBLE) AS sum_u
           FROM m),
         fit AS (
           SELECT n, nd, sdm, sum_u, cud,
             CASE WHEN cuu <= 0.0 THEN NULL
               ELSE cud / cuu END AS beta,
             cuu, cdd
           FROM cm),
         fin AS (
           SELECT n, nd, sdm, sum_u, beta, cuu,
             cdd - beta * cud AS rss
           FROM fit)
         SELECT n AS n_pairs,
           round(beta, 6) + 0.0 AS beta,
           round((sdm / nd - beta * sum_u / nd) / 100.0, 4) + 0.0
             AS alpha_drift_dollars,
           round(CASE WHEN rss <= 0.0 THEN NULL
             ELSE beta / sqrt(rss / (nd - 2.0) / cuu) END, 4) + 0.0
             AS df_t_stat
         FROM fin""",

    "q209_variance_ratio" ->
      s"""WITH daily AS ($dailySql),
         base AS (
           SELECT CAST(count(*) AS BIGINT) AS n1,
             sum(CAST(y AS HUGEINT)) AS s1,
             sum(CAST(y AS HUGEINT) * y) AS s11
           FROM daily),
         wins AS (
           SELECT q, anchor,
             CAST(count(*) AS BIGINT) AS k,
             CAST(sum(y) AS BIGINT) AS w
           FROM (
             SELECT g.q, d.day + CAST(o.off AS INTEGER) AS anchor, d.y
             FROM daily d
             CROSS JOIN (SELECT unnest([2, 4, 8]) AS q) g
             CROSS JOIN (SELECT unnest(range(0, 8)) AS off) o
             WHERE o.off < g.q) x
           GROUP BY 1, 2
           HAVING count(*) = q),
         m AS (
           SELECT CAST(q AS BIGINT) AS q,
             CAST(count(*) AS BIGINT) AS n_windows,
             sum(CAST(w AS HUGEINT)) AS sw,
             sum(CAST(w AS HUGEINT) * w) AS sww
           FROM wins GROUP BY 1),
         v AS (
           SELECT q, n_windows,
             (CAST(sww AS DOUBLE) - CAST(sw AS DOUBLE)
               * CAST(sw AS DOUBLE) / CAST(n_windows AS DOUBLE))
               / CAST(n_windows AS DOUBLE) AS varq,
             (CAST(s11 AS DOUBLE) - CAST(s1 AS DOUBLE)
               * CAST(s1 AS DOUBLE) / CAST(n1 AS DOUBLE))
               / CAST(n1 AS DOUBLE) AS var1
           FROM m, base),
         r AS (
           SELECT q, n_windows,
             CASE WHEN var1 <= 0.0 THEN NULL
               ELSE varq / (CAST(q AS DOUBLE) * var1) END AS vr
           FROM v)
         SELECT q, n_windows, round(vr, 4) + 0.0 AS vr,
           round((vr - 1.0) /
             sqrt(2.0 * (2.0 * CAST(q AS DOUBLE) - 1.0)
               * (CAST(q AS DOUBLE) - 1.0) /
               (3.0 * CAST(q AS DOUBLE)
                * CAST(n_windows AS DOUBLE))), 4) + 0.0 AS z_stat
         FROM r ORDER BY q""",

    "q210_var_es" ->
      s"""WITH daily AS ($dailySql),
         chg AS (
           SELECT t.y - p.y AS dy
           FROM daily t JOIN daily p ON t.day = p.day + 1),
         v AS (
           SELECT percentile_cont(0.05) WITHIN GROUP (ORDER BY dy)
             AS var95c
           FROM chg),
         agg AS (
           SELECT CAST(count(*) AS BIGINT) AS n_changes,
             CAST(sum(CASE WHEN CAST(dy AS DOUBLE) <= var95c
               THEN 1 ELSE 0 END) AS BIGINT) AS n_tail,
             CAST(sum(CASE WHEN CAST(dy AS DOUBLE) <= var95c
               THEN dy ELSE 0 END) AS BIGINT) AS tail_cents,
             any_value(var95c) AS var95c
           FROM chg, v)
         SELECT n_changes, n_tail,
           round(var95c / 100.0, 4) + 0.0 AS var95_dollars,
           round(CASE WHEN n_tail = 0 THEN NULL
             ELSE CAST(tail_cents AS DOUBLE)
                  / CAST(n_tail AS DOUBLE) / 100.0 END, 4) + 0.0
             AS es95_dollars
         FROM agg""",

    "q215_arch_lm" ->
      s"""WITH daily AS ($dailySql),
         sq AS (
           SELECT t.day,
             (CAST(t.y - p.y AS HUGEINT) * (t.y - p.y)) // 10000
               AS e2
           FROM daily t JOIN daily p ON t.day = p.day + 1),
         pairs AS (
           SELECT t.e2 AS ey, p.e2 AS eu
           FROM sq t JOIN sq p ON t.day = p.day + 1),
         m AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
             sum(CAST(ey AS HUGEINT)) AS sy,
             sum(CAST(eu AS HUGEINT)) AS su,
             sum(CAST(ey AS HUGEINT) * ey) AS syy,
             sum(CAST(eu AS HUGEINT) * eu) AS suu,
             sum(CAST(ey AS HUGEINT) * eu) AS syu
           FROM pairs),
         cm AS (
           SELECT n, CAST(n AS DOUBLE) AS nd,
             CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
               * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS cyy,
             CAST(suu AS DOUBLE) - CAST(su AS DOUBLE)
               * CAST(su AS DOUBLE) / CAST(n AS DOUBLE) AS cuu,
             CAST(syu AS DOUBLE) - CAST(sy AS DOUBLE)
               * CAST(su AS DOUBLE) / CAST(n AS DOUBLE) AS cyu
           FROM m),
         r AS (
           SELECT n, nd,
             CASE WHEN cuu <= 0.0 OR cyy <= 0.0 THEN NULL
               ELSE cyu * cyu / (cuu * cyy) END AS r2
           FROM cm)
         SELECT n AS n_pairs,
           round(r2, 6) + 0.0 AS r2,
           round(nd * r2, 4) + 0.0 AS arch_lm
         FROM r""",

    "q216_mde" ->
      """WITH per AS (
           SELECT event_type, user_id,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS x
           FROM events GROUP BY 1, 2),
         m AS (
           SELECT event_type,
             CAST(count(*) AS BIGINT) AS n_users,
             sum(CAST(x AS HUGEINT)) AS sx,
             sum(CAST(x AS HUGEINT) * x) AS sxx
           FROM per GROUP BY 1),
         a AS (
           SELECT event_type, n_users,
             CAST(n_users AS DOUBLE) AS nd,
             CAST(sx AS DOUBLE) / CAST(n_users AS DOUBLE) AS mu,
             CAST(sxx AS DOUBLE) / CAST(n_users AS DOUBLE)
               - (CAST(sx AS DOUBLE) / CAST(n_users AS DOUBLE))
                 * (CAST(sx AS DOUBLE) / CAST(n_users AS DOUBLE))
               AS sig2
           FROM m),
         b AS (
           SELECT event_type, n_users, mu,
             2.801585 * sqrt(2.0 * sig2 / (nd / 2.0)) AS mde_cents
           FROM a)
         SELECT event_type, n_users,
           round(mu / 100.0, 4) + 0.0 AS mean_dollars,
           round(mde_cents / 100.0, 4) + 0.0 AS mde_dollars,
           round(CASE WHEN mu <= 0.0 THEN NULL
             ELSE mde_cents / mu END, 6) + 0.0 AS mde_relative
         FROM b ORDER BY event_type""",

    "q214_tail_dependence" ->
      s"""WITH daily AS (
           SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS y,
             CAST(count(*) AS BIGINT) AS v
           FROM events GROUP BY 1),
         qs AS (
           SELECT
             percentile_cont(0.9) WITHIN GROUP (ORDER BY y) AS qy,
             percentile_cont(0.9) WITHIN GROUP (ORDER BY v) AS qv
           FROM daily),
         agg AS (
           SELECT CAST(count(*) AS BIGINT) AS n_days,
             CAST(sum(CASE WHEN CAST(y AS DOUBLE) > qy
               THEN 1 ELSE 0 END) AS BIGINT) AS n_tail_spend,
             CAST(sum(CASE WHEN CAST(v AS DOUBLE) > qv
               THEN 1 ELSE 0 END) AS BIGINT) AS n_tail_volume,
             CAST(sum(CASE WHEN CAST(y AS DOUBLE) > qy
               AND CAST(v AS DOUBLE) > qv
               THEN 1 ELSE 0 END) AS BIGINT) AS n_joint
           FROM daily, qs)
         SELECT n_days, n_tail_spend, n_tail_volume, n_joint,
           round(CASE WHEN n_tail_spend = 0 THEN NULL
             ELSE CAST(n_joint AS DOUBLE)
                  / CAST(n_tail_spend AS DOUBLE) END, 4) + 0.0
             AS lambda_u
         FROM agg""",

    "q211_newey_west" ->
      s"""WITH daily AS ($dailySql),
         g AS (
           SELECT CAST(count(*) AS BIGINT) AS nn,
             sum(CAST(y AS HUGEINT)) AS sy
           FROM daily),
         perlag AS (
           SELECT l,
             CAST(count(*) AS BIGINT) AS np,
             sum(CAST(t.y AS HUGEINT)) AS syl,
             sum(CAST(p.y AS HUGEINT)) AS sul,
             sum(CAST(t.y AS HUGEINT) * p.y) AS syu
           FROM (SELECT unnest(range(0, 8)) AS l) ls
           JOIN daily p ON TRUE
           JOIN daily t ON t.day = p.day + CAST(ls.l AS INTEGER)
           GROUP BY 1),
         gam AS (
           SELECT CAST(l AS BIGINT) AS l, nn,
             (CAST(syu AS DOUBLE)
              - (CAST(sy AS DOUBLE) / CAST(nn AS DOUBLE))
                * (CAST(syl AS DOUBLE) + CAST(sul AS DOUBLE))
              + CAST(np AS DOUBLE)
                * (CAST(sy AS DOUBLE) / CAST(nn AS DOUBLE))
                * (CAST(sy AS DOUBLE) / CAST(nn AS DOUBLE)))
             / CAST(nn AS DOUBLE) AS gam
           FROM perlag, g),
         one AS (
           SELECT any_value(nn) AS n_days,
             list({'l': l, 'gam': gam} ORDER BY l) AS cs
           FROM gam),
         folds AS (
           SELECT n_days,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(cs, c ->
                 CASE WHEN c.l = 0 THEN c.gam ELSE CAST(0.0 AS DOUBLE)
                 END)), (a, b) -> a + b) AS gamma0,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(cs, c ->
                 CASE WHEN c.l = 0 THEN c.gam
                   ELSE 2.0 * (1.0 - CAST(c.l AS DOUBLE) / 8.0) * c.gam
                 END)), (a, b) -> a + b) AS lrv
           FROM one)
         SELECT n_days,
           round(gamma0 / 10000.0, 4) + 0.0 AS gamma0_dollars2,
           round(lrv / 10000.0, 4) + 0.0 AS longrun_var_dollars2,
           round(sqrt(greatest(lrv, CAST(0.0 AS DOUBLE))
             / CAST(n_days AS DOUBLE)) / 100.0, 4) + 0.0
             AS nw_se_mean_dollars
         FROM folds""")
}
