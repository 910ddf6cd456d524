package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Round-16 frontier (batch 3): the distribution-distance and
  * causal-inference panel — Wasserstein-1 (earth-mover) distance and
  * the energy distance between the two halves of the observation
  * span (the distribution-shift metrics that READ a drift once
  * q200_psi has flagged one), lag-1 Granger causality (does event
  * volume predict next-day spend beyond spend's own memory), the
  * Cochran–Mantel–Haenszel stratified association test (q92's χ²
  * made confounder-aware), and a sharp regression-discontinuity
  * estimator at the account-balance cutoff (the design-based causal
  * read next to q135_diff_in_diff and q201_cuped).
  *
  * Reference note: the reference engine (`/root/reference/`, a Go log
  * forwarder — SURVEY.md §1) has no analytics surface; these extend
  * the Frontier families under the house disciplines — exact integer
  * domains until one final IEEE assembly (decimal(38,0) where 64-bit
  * products can overflow), order-deterministic double folds only over
  * enum-bounded frames, `Tables.nz` on signable float outputs,
  * bounded collects only, and DuckDB oracles replaying the identical
  * arithmetic.
  *
  * The scale centerpiece is [[supportCdf]]: both distances integrate
  * |CDF| expressions over the SUPPORT table (distinct price cents —
  * bounded by the PRICE DOMAIN, ~10⁷ values, never by corpus rows),
  * with the cumulative counts riding ops.PrefixSum's two-pass
  * distributed scan instead of a partition-less window, and the
  * neighbor gap from a rank self-join instead of a lead(). Every
  * integral term is an exact decimal(38,0) product, so the Σ is
  * partition-order-independent and the single final divide is the
  * only IEEE step.
  */
object Frontier7 {

  private val dec = "decimal(38,0)"
  private val HalfShift = 2147483648L // 2^31

  /** Support-table CDF scaffold shared by q203/q204: per distinct
    * cents value, the first/second-half cumulative counts (cf, cs),
    * the rank in value order, and the gap to the next support value.
    *
    * Shape: one groupBy(cents) reduces the corpus scan to the
    * domain-bounded support table; TWO PrefixSum scans over it (one
    * for the value rank, one for the packed cumulative pair) — each a
    * range shuffle of the support table only; one rank self-join for
    * the neighbor gap. The (cf, cs) pair rides ONE prefix scan by
    * packing nf·2³¹ + ns into a single long: the packed running total
    * is cumF·2³¹ + cumS exactly while each half holds < 2³¹ rows
    * (~2.1e9 — beyond sf1000), and cum ≤ N₁·2³¹ + N₂ < 2⁶³ so the
    * long never wraps. The max-rank row has no successor and is
    * dropped by the inner join — the integral has no mass past the
    * last support point (both CDFs are 1 there).
    */
  private def supportCdf(s: SparkSession, d: String)
      : (DataFrame, DataFrame) = {
    import s.implicits._
    val ev = Tables.load(s, d, "orders")
      .select(round($"o_totalprice" * 100).cast("long").as("cents"),
        to_date($"o_orderdate").as("day"))
    val span = ev.agg(min($"day").as("d0"), max($"day").as("d1"))
      .select(expr("date_add(d0, CAST(datediff(d1, d0) div 2 AS INT))")
        .as("mid"))
    val sup = ev.crossJoin(broadcast(span))
      .groupBy($"cents")
      .agg(sum(when($"day" <= $"mid", 1L).otherwise(0L)).as("nf"),
        sum(when($"day" > $"mid", 1L).otherwise(0L)).as("ns"))
    val tot = sup.agg(sum($"nf").as("n1"), sum($"ns").as("n2"),
      count(lit(1)).as("n_support"))
    // one multi-value scan (r19): rank and packed cumulative share
    // the cents order — was two chained range shuffles
    val cur = graft.ops.PrefixSum.runningTotals(sup, Seq($"cents"),
        Seq(lit(1L) -> "rnk",
          ($"nf" * HalfShift + $"ns") -> "cum"))
      .select($"cents", $"rnk",
        expr(s"cum div $HalfShift").as("cf"),
        ($"cum" % HalfShift).as("cs"))
    val nxt = cur.select(($"rnk" - 1L).as("rnk"),
      $"cents".as("next_cents"))
    val terms = cur.join(nxt, Seq("rnk"))
      .withColumn("gap", $"next_cents" - $"cents")
    (terms, tot)
  }

  def queries: Map[String, Q] = Map(

    // Wasserstein-1 (earth-mover) distance between the first- and
    // second-half order-price distributions: W₁ = ∫|F₁ − F₂| dv —
    // "how many dollars does a unit of probability mass move",
    // the drift metric with units (q200_psi is dimensionless; q125's
    // KS is sup-norm). Exactness: the integrand is
    // |cf·N₂ − cs·N₁|·gap in decimal(38,0) (common denominator
    // N₁·N₂ factored out), so the distributed Σ commutes; ONE final
    // IEEE divide by N₁·N₂·100 lands dollars. 100 TB shape: see
    // supportCdf — everything after the first groupBy is
    // support-table-sized (price-domain-bounded).
    "q203_wasserstein" -> ((s, d) => {
      import s.implicits._
      val (terms, tot) = supportCdf(s, d)
      terms
        .crossJoin(broadcast(tot))
        .select((abs($"cf".cast(dec) * $"n2" - $"cs".cast(dec) * $"n1")
          * $"gap".cast(dec)).as("term"))
        .agg(sum($"term").as("area"))
        .crossJoin(broadcast(tot))
        .select($"n1".as("n_first"), $"n2".as("n_second"), $"n_support",
          Tables.nz(round($"area".cast("double") /
            ($"n1".cast("double") * $"n2".cast("double") * 100.0), 6))
            .as("w1_dollars"))
    }),

    // Energy distance between the same two halves: D² = 2E|X−Y| −
    // E|X−X'| − E|Y−Y'| — the distribution-shift metric that is zero
    // IFF the distributions are equal (W₁ shares that; energy
    // additionally powers the energy two-sample TEST and kernel MMD
    // with kernel −|x−y|). Each expectation is a CDF integral on the
    // same support scaffold: E|X−X'| = 2Σ cf(N₁−cf)·gap / N₁²,
    // E|X−Y| = Σ [cf(N₂−cs) + cs(N₁−cf)]·gap / N₁N₂ (the V-statistic
    // population form — the oracle replays the same convention). All
    // three Σ are exact decimal; the assembly is one fixed IEEE
    // expression per output. Same 100-TB shape as q203.
    "q204_energy_distance" -> ((s, d) => {
      import s.implicits._
      val (terms, tot) = supportCdf(s, d)
      terms
        .crossJoin(broadcast(tot))
        .select(
          ($"cf".cast(dec) * ($"n1" - $"cf") * $"gap".cast(dec))
            .as("txx"),
          ($"cs".cast(dec) * ($"n2" - $"cs") * $"gap".cast(dec))
            .as("tyy"),
          (($"cf".cast(dec) * ($"n2" - $"cs")
            + $"cs".cast(dec) * ($"n1" - $"cf")) * $"gap".cast(dec))
            .as("txy"))
        .agg(sum($"txx").as("axx"), sum($"tyy").as("ayy"),
          sum($"txy").as("axy"))
        .crossJoin(broadcast(tot))
        .withColumn("exy", $"axy".cast("double") /
          ($"n1".cast("double") * $"n2".cast("double") * 100.0))
        .withColumn("exx", lit(2.0) * $"axx".cast("double") /
          ($"n1".cast("double") * $"n1".cast("double") * 100.0))
        .withColumn("eyy", lit(2.0) * $"ayy".cast("double") /
          ($"n2".cast("double") * $"n2".cast("double") * 100.0))
        .select($"n1".as("n_first"), $"n2".as("n_second"),
          Tables.nz(round($"exy", 6)).as("e_xy_dollars"),
          Tables.nz(round($"exx", 6)).as("e_xx_dollars"),
          Tables.nz(round($"eyy", 6)).as("e_yy_dollars"),
          Tables.nz(round(sqrt(greatest(lit(0.0),
            lit(2.0) * $"exy" - $"exx" - $"eyy")), 6))
            .as("energy_dist"))
    }),

    // Lag-1 Granger causality: does yesterday's event VOLUME predict
    // today's event SPEND beyond spend's own one-day memory? F-test
    // of the restricted AR(1) (spend_t ~ spend_{t−1}) against the
    // unrestricted model adding volume_{t−1} — the temporal-direction
    // read q167_xcorr_leadlag (symmetric correlation) cannot give.
    // Plan: events reduce to the span-bounded daily panel (one
    // groupBy(day)); the lag pairing is a day-keyed self-join on that
    // panel (q132's no-imputation discipline — both endpoints must
    // exist); one global aggregate carries ten exact moments
    // (decimal(38,0): daily-cents squares cross 2⁶³ past ~10⁹-cent
    // days × span); both OLS closed forms and the F-statistic are
    // fixed IEEE expressions over the one moment row. Degenerate
    // guards (zero variance, singular normal matrix, zero RSS_u) →
    // NULL, replayed identically by the oracle.
    "q205_granger" -> ((s, d) => {
      import s.implicits._
      val daily = Tables.load(s, d, "events")
        .select(to_date($"ts").as("day"),
          round($"value" * 100).cast("long").as("cents"))
        .groupBy($"day")
        .agg(sum($"cents").as("spend"), count(lit(1)).as("vol"))
      val pairs = daily.select($"day", $"spend".as("y"))
        .join(daily.select(expr("date_add(day, 1)").as("day"),
          $"spend".as("u"), $"vol".as("w")), Seq("day"))
      val m = pairs.agg(count(lit(1)).as("n"),
        sum($"y").as("sy"), sum($"u").as("su"), sum($"w").as("sw"),
        sum($"y".cast(dec) * $"y").as("syy"),
        sum($"u".cast(dec) * $"u").as("suu"),
        sum($"w".cast(dec) * $"w").as("sww"),
        sum($"y".cast(dec) * $"u").as("syu"),
        sum($"y".cast(dec) * $"w").as("syw"),
        sum($"u".cast(dec) * $"w").as("suw"))
      m.withColumn("nd", $"n".cast("double"))
        .withColumn("cyy", $"syy".cast("double") -
          $"sy".cast("double") * $"sy".cast("double") / $"nd")
        .withColumn("cuu", $"suu".cast("double") -
          $"su".cast("double") * $"su".cast("double") / $"nd")
        .withColumn("cww", $"sww".cast("double") -
          $"sw".cast("double") * $"sw".cast("double") / $"nd")
        .withColumn("cyu", $"syu".cast("double") -
          $"sy".cast("double") * $"su".cast("double") / $"nd")
        .withColumn("cyw", $"syw".cast("double") -
          $"sy".cast("double") * $"sw".cast("double") / $"nd")
        .withColumn("cuw", $"suw".cast("double") -
          $"su".cast("double") * $"sw".cast("double") / $"nd")
        .withColumn("rss_r", when($"cuu" <= 0.0,
            lit(null).cast("double"))
          .otherwise($"cyy" - $"cyu" * $"cyu" / $"cuu"))
        .withColumn("det", $"cuu" * $"cww" - $"cuw" * $"cuw")
        .withColumn("b_ar", when($"det" <= 0.0,
            lit(null).cast("double"))
          .otherwise(($"cww" * $"cyu" - $"cuw" * $"cyw") / $"det"))
        .withColumn("b_vol", when($"det" <= 0.0,
            lit(null).cast("double"))
          .otherwise(($"cuu" * $"cyw" - $"cuw" * $"cyu") / $"det"))
        .withColumn("rss_u",
          $"cyy" - $"b_ar" * $"cyu" - $"b_vol" * $"cyw")
        .select($"n".as("n_pairs"),
          Tables.nz(round($"b_ar", 6)).as("beta_ar"),
          Tables.nz(round($"b_vol", 6)).as("beta_vol"),
          Tables.nz(round(when($"rss_u" <= 0.0,
              lit(null).cast("double"))
            .otherwise(($"rss_r" - $"rss_u") /
              ($"rss_u" / ($"nd" - 3.0))), 4)).as("f_stat"))
    }),

    // Cochran–Mantel–Haenszel test: is "second-half order" associated
    // with "above-median price" AFTER stratifying by region — the
    // confounder-aware form of q92's independence χ² (a region whose
    // customers both order late and order big would confound the
    // marginal table; CMH pools the WITHIN-stratum evidence). Plus
    // the Mantel–Haenszel pooled odds ratio. Plan: the global median
    // is one percentile_cont row broadcast back (q197 parity
    // pattern); the dim chain is nation/region broadcast joins; the
    // 2×2-per-stratum panel is one groupBy(region) of conditional
    // sums (map-side combined, 5 rows out); the E/Var/OR terms fold
    // in region-sorted order (enum-bounded collect — 5 regions by
    // schema contract, whitelisted in CollectGuardSpec), with the
    // Var numerator r1·r0·c1·c0 in decimal(38,0) (crosses 2⁶³ past
    // ~50 k-order strata). χ²_CMH carries the standard −0.5
    // continuity correction.
    "q206_cmh" -> ((s, d) => {
      import s.implicits._
      val ev0 = Tables.load(s, d, "orders")
        .select($"o_custkey",
          round($"o_totalprice" * 100).cast("long").as("cents"),
          to_date($"o_orderdate").as("day"))
      val span = ev0.agg(min($"day").as("d0"), max($"day").as("d1"))
        .select(expr("date_add(d0, CAST(datediff(d1, d0) div 2 AS INT))")
          .as("mid"))
      val med = ev0.agg(
        expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY cents)")
          .as("medc"))
      val cust = Tables.load(s, d, "customer")
        .select($"c_custkey", $"c_nationkey")
      val nat = Tables.load(s, d, "nation")
        .select($"n_nationkey", $"n_regionkey")
      val reg = Tables.load(s, d, "region")
        .select($"r_regionkey", $"r_name")
      val cells = ev0.crossJoin(broadcast(span))
        .crossJoin(broadcast(med))
        .join(cust, $"o_custkey" === $"c_custkey")
        .join(broadcast(nat), $"c_nationkey" === $"n_nationkey")
        .join(broadcast(reg), $"n_regionkey" === $"r_regionkey")
        .select($"r_name",
          when($"day" > $"mid", 1L).otherwise(0L).as("expo"),
          when($"cents" > $"medc", 1L).otherwise(0L).as("hi"))
        .groupBy($"r_name")
        .agg(sum($"expo" * $"hi").as("a"),
          sum($"expo" * (lit(1L) - $"hi")).as("b"),
          sum((lit(1L) - $"expo") * $"hi").as("c"),
          sum((lit(1L) - $"expo") * (lit(1L) - $"hi")).as("dd"))
      cells
        .groupBy()
        .agg(count(lit(1)).as("n_strata"), sum($"a").as("sum_a"),
          sort_array(collect_list(struct($"r_name", $"a", $"b",
            $"c", $"dd"))).as("cs"))
        .withColumn("sum_e", expr(
          """aggregate(cs, cast(0.0 as double), (acc, t) ->
             acc + cast(t.a + t.b as double) * cast(t.a + t.c as double)
                 / cast(t.a + t.b + t.c + t.dd as double))"""))
        .withColumn("sum_v", expr(
          s"""aggregate(cs, cast(0.0 as double), (acc, t) ->
             acc + cast(cast(t.a + t.b as $dec) * (t.c + t.dd)
                        * (t.a + t.c) * (t.b + t.dd) as double)
                 / (cast(t.a + t.b + t.c + t.dd as double)
                    * cast(t.a + t.b + t.c + t.dd as double)
                    * cast(t.a + t.b + t.c + t.dd - 1 as double)))"""))
        .withColumn("sum_ad", expr(
          """aggregate(cs, cast(0.0 as double), (acc, t) ->
             acc + cast(t.a as double) * cast(t.dd as double)
                 / cast(t.a + t.b + t.c + t.dd as double))"""))
        .withColumn("sum_bc", expr(
          """aggregate(cs, cast(0.0 as double), (acc, t) ->
             acc + cast(t.b as double) * cast(t.c as double)
                 / cast(t.a + t.b + t.c + t.dd as double))"""))
        .select($"n_strata", $"sum_a",
          Tables.nz(round($"sum_e", 4)).as("sum_expected"),
          Tables.nz(round(when($"sum_v" <= 0.0,
              lit(null).cast("double"))
            .otherwise({
              val z = abs($"sum_a".cast("double") - $"sum_e") - 0.5
              z * z / $"sum_v"
            }), 4)).as("cmh_chi2"),
          Tables.nz(round(when($"sum_bc" <= 0.0,
              lit(null).cast("double"))
            .otherwise($"sum_ad" / $"sum_bc"), 4)).as("mh_odds_ratio"))
    }),

    // Sharp regression discontinuity at the zero-balance cutoff: do
    // customers just above c_acctbal = 0 spend differently from those
    // just below? Local linear fits on each side of the cutoff within
    // a ±$1000 bandwidth; the effect is the difference of the two
    // fitted values AT the cutoff (the intercepts, since the running
    // variable is centered there). The design-based causal companion
    // to q135_diff_in_diff (parallel trends) and q201_cuped (variance
    // reduction) — RDD needs neither, only continuity at the cutoff.
    // Plan: one custkey rollup of orders (spend, zero-filled for
    // never-ordered customers via the left join from customer), the
    // bandwidth filter pushes into the customer scan, one global
    // aggregate of per-side conditional moments (decimal(38,0): the
    // Σ bal·spend product crosses 2⁶³ past ~10⁷ customers), two
    // closed-form OLS lines as fixed IEEE expressions. No window, no
    // collect, nothing beyond the custkey rollup shuffles.
    "q207_rdd" -> ((s, d) => {
      import s.implicits._
      val spend = Tables.load(s, d, "orders")
        .groupBy($"o_custkey")
        .agg(sum(round($"o_totalprice" * 100).cast("long")).as("sp"))
      val c = Tables.load(s, d, "customer")
        .select($"c_custkey",
          round($"c_acctbal" * 100).cast("long").as("bal"))
        .filter(abs($"bal") <= 100000L)
        .join(spend, $"c_custkey" === $"o_custkey", "left")
        .select($"bal", coalesce($"sp", lit(0L)).as("sp"),
          when($"bal" >= 0L, 1L).otherwise(0L).as("r"))
      val m = c.agg(
        sum($"r").as("n_r"), sum(lit(1L) - $"r").as("n_l"),
        sum($"r" * $"bal").as("sb_r"),
        sum((lit(1L) - $"r") * $"bal").as("sb_l"),
        sum($"r" * $"sp").as("ss_r"),
        sum((lit(1L) - $"r") * $"sp").as("ss_l"),
        sum($"r".cast(dec) * $"bal" * $"bal").as("sbb_r"),
        sum((lit(1L) - $"r").cast(dec) * $"bal" * $"bal").as("sbb_l"),
        sum($"r".cast(dec) * $"bal" * $"sp").as("sbs_r"),
        sum((lit(1L) - $"r").cast(dec) * $"bal" * $"sp").as("sbs_l"))
      def side(sfx: String): DataFrame => DataFrame = df => df
        .withColumn(s"cbb_$sfx", col(s"sbb_$sfx").cast("double") -
          col(s"sb_$sfx").cast("double") * col(s"sb_$sfx").cast("double")
            / col(s"n_$sfx").cast("double"))
        .withColumn(s"cbs_$sfx", col(s"sbs_$sfx").cast("double") -
          col(s"sb_$sfx").cast("double") * col(s"ss_$sfx").cast("double")
            / col(s"n_$sfx").cast("double"))
        .withColumn(s"slope_$sfx", when(col(s"cbb_$sfx") <= 0.0,
            lit(null).cast("double"))
          .otherwise(col(s"cbs_$sfx") / col(s"cbb_$sfx")))
        .withColumn(s"icept_$sfx",
          (col(s"ss_$sfx").cast("double") / col(s"n_$sfx").cast("double")
            - col(s"slope_$sfx") * col(s"sb_$sfx").cast("double")
              / col(s"n_$sfx").cast("double")) / 100.0)
      m.transform(side("l")).transform(side("r"))
        .select($"n_l".as("n_left"), $"n_r".as("n_right"),
          Tables.nz(round($"slope_l", 6)).as("slope_left"),
          Tables.nz(round($"slope_r", 6)).as("slope_right"),
          Tables.nz(round($"icept_l", 4)).as("limit_left_dollars"),
          Tables.nz(round($"icept_r", 4)).as("limit_right_dollars"),
          Tables.nz(round($"icept_r" - $"icept_l", 4))
            .as("rdd_effect_dollars"))
    }))

  def oracles: Map[String, String] = Map(

    "q203_wasserstein" ->
      """WITH ev AS (
           SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(o_orderdate AS DATE) AS day
           FROM orders),
         span AS (
           SELECT d0 + CAST((d1 - d0) // 2 AS INTEGER) AS mid
           FROM (SELECT min(day) AS d0, max(day) AS d1 FROM ev)),
         sup AS (
           SELECT cents,
             CAST(sum(CASE WHEN day <= mid THEN 1 ELSE 0 END)
               AS BIGINT) AS nf,
             CAST(sum(CASE WHEN day > mid THEN 1 ELSE 0 END)
               AS BIGINT) AS ns
           FROM ev, span GROUP BY 1),
         tot AS (
           SELECT CAST(sum(nf) AS BIGINT) AS n1,
             CAST(sum(ns) AS BIGINT) AS n2,
             CAST(count(*) AS BIGINT) AS n_support
           FROM sup),
         cur AS (
           SELECT cents,
             CAST(sum(nf) OVER (ORDER BY cents) AS BIGINT) AS cf,
             CAST(sum(ns) OVER (ORDER BY cents) AS BIGINT) AS cs,
             lead(cents) OVER (ORDER BY cents) AS nc
           FROM sup),
         area AS (
           SELECT sum(abs(CAST(cf AS HUGEINT) * n2
                          - CAST(cs AS HUGEINT) * n1)
                      * (nc - cents)) AS a
           FROM cur, tot WHERE nc IS NOT NULL)
         SELECT n1 AS n_first, n2 AS n_second, n_support,
           round(CAST(a AS DOUBLE) /
             (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) * 100.0), 6)
             + 0.0 AS w1_dollars
         FROM area, tot""",

    "q204_energy_distance" ->
      """WITH ev AS (
           SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(o_orderdate AS DATE) AS day
           FROM orders),
         span AS (
           SELECT d0 + CAST((d1 - d0) // 2 AS INTEGER) AS mid
           FROM (SELECT min(day) AS d0, max(day) AS d1 FROM ev)),
         sup AS (
           SELECT cents,
             CAST(sum(CASE WHEN day <= mid THEN 1 ELSE 0 END)
               AS BIGINT) AS nf,
             CAST(sum(CASE WHEN day > mid THEN 1 ELSE 0 END)
               AS BIGINT) AS ns
           FROM ev, span GROUP BY 1),
         tot AS (
           SELECT CAST(sum(nf) AS BIGINT) AS n1,
             CAST(sum(ns) AS BIGINT) AS n2
           FROM sup),
         cur AS (
           SELECT cents,
             CAST(sum(nf) OVER (ORDER BY cents) AS BIGINT) AS cf,
             CAST(sum(ns) OVER (ORDER BY cents) AS BIGINT) AS cs,
             lead(cents) OVER (ORDER BY cents) AS nc
           FROM sup),
         area AS (
           SELECT
             sum(CAST(cf AS HUGEINT) * (n1 - cf) * (nc - cents))
               AS axx,
             sum(CAST(cs AS HUGEINT) * (n2 - cs) * (nc - cents))
               AS ayy,
             sum((CAST(cf AS HUGEINT) * (n2 - cs)
                  + CAST(cs AS HUGEINT) * (n1 - cf)) * (nc - cents))
               AS axy
           FROM cur, tot WHERE nc IS NOT NULL),
         e AS (
           SELECT n1, n2,
             CAST(axy AS DOUBLE) /
               (CAST(n1 AS DOUBLE) * CAST(n2 AS DOUBLE) * 100.0)
               AS exy,
             2.0 * CAST(axx AS DOUBLE) /
               (CAST(n1 AS DOUBLE) * CAST(n1 AS DOUBLE) * 100.0)
               AS exx,
             2.0 * CAST(ayy AS DOUBLE) /
               (CAST(n2 AS DOUBLE) * CAST(n2 AS DOUBLE) * 100.0)
               AS eyy
           FROM area, tot)
         SELECT n1 AS n_first, n2 AS n_second,
           round(exy, 6) + 0.0 AS e_xy_dollars,
           round(exx, 6) + 0.0 AS e_xx_dollars,
           round(eyy, 6) + 0.0 AS e_yy_dollars,
           round(sqrt(greatest(CAST(0.0 AS DOUBLE),
             2.0 * exy - exx - eyy)), 6) + 0.0 AS energy_dist
         FROM e""",

    "q205_granger" ->
      """WITH daily AS (
           SELECT CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS spend,
             CAST(count(*) AS BIGINT) AS vol
           FROM events GROUP BY 1),
         pairs AS (
           SELECT t.spend AS y, p.spend AS u, p.vol AS w
           FROM daily t
           JOIN daily p ON t.day = p.day + 1),
         m AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
             sum(CAST(y AS HUGEINT)) AS sy,
             sum(CAST(u AS HUGEINT)) AS su,
             sum(CAST(w AS HUGEINT)) AS sw,
             sum(CAST(y AS HUGEINT) * y) AS syy,
             sum(CAST(u AS HUGEINT) * u) AS suu,
             sum(CAST(w AS HUGEINT) * w) AS sww,
             sum(CAST(y AS HUGEINT) * u) AS syu,
             sum(CAST(y AS HUGEINT) * w) AS syw,
             sum(CAST(u AS HUGEINT) * w) AS suw
           FROM pairs),
         cm AS (
           SELECT n, CAST(n AS DOUBLE) AS nd,
             CAST(syy AS DOUBLE) - CAST(sy AS DOUBLE)
               * CAST(sy AS DOUBLE) / CAST(n AS DOUBLE) AS cyy,
             CAST(suu AS DOUBLE) - CAST(su AS DOUBLE)
               * CAST(su AS DOUBLE) / CAST(n AS DOUBLE) AS cuu,
             CAST(sww AS DOUBLE) - CAST(sw AS DOUBLE)
               * CAST(sw AS DOUBLE) / CAST(n AS DOUBLE) AS cww,
             CAST(syu AS DOUBLE) - CAST(sy AS DOUBLE)
               * CAST(su AS DOUBLE) / CAST(n AS DOUBLE) AS cyu,
             CAST(syw AS DOUBLE) - CAST(sy AS DOUBLE)
               * CAST(sw AS DOUBLE) / CAST(n AS DOUBLE) AS cyw,
             CAST(suw AS DOUBLE) - CAST(su AS DOUBLE)
               * CAST(sw AS DOUBLE) / CAST(n AS DOUBLE) AS cuw
           FROM m),
         fit AS (
           SELECT n, nd, cyy, cyu, cyw,
             CASE WHEN cuu <= 0.0 THEN NULL
               ELSE cyy - cyu * cyu / cuu END AS rss_r,
             cuu * cww - cuw * cuw AS det,
             CASE WHEN cuu * cww - cuw * cuw <= 0.0 THEN NULL
               ELSE (cww * cyu - cuw * cyw)
                    / (cuu * cww - cuw * cuw) END AS b_ar,
             CASE WHEN cuu * cww - cuw * cuw <= 0.0 THEN NULL
               ELSE (cuu * cyw - cuw * cyu)
                    / (cuu * cww - cuw * cuw) END AS b_vol
           FROM cm),
         fin AS (
           SELECT n, nd, b_ar, b_vol, rss_r,
             cyy - b_ar * cyu - b_vol * cyw AS rss_u
           FROM fit)
         SELECT n AS n_pairs,
           round(b_ar, 6) + 0.0 AS beta_ar,
           round(b_vol, 6) + 0.0 AS beta_vol,
           round(CASE WHEN rss_u <= 0.0 THEN NULL
             ELSE (rss_r - rss_u) / (rss_u / (nd - 3.0)) END, 4)
             + 0.0 AS f_stat
         FROM fin""",

    "q206_cmh" ->
      """WITH ev AS (
           SELECT o_custkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(o_orderdate AS DATE) AS day
           FROM orders),
         span AS (
           SELECT d0 + CAST((d1 - d0) // 2 AS INTEGER) AS mid
           FROM (SELECT min(day) AS d0, max(day) AS d1 FROM ev)),
         med AS (
           SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY cents)
             AS medc
           FROM ev),
         cells AS (
           SELECT r.r_name,
             CAST(sum(expo * hi) AS BIGINT) AS a,
             CAST(sum(expo * (1 - hi)) AS BIGINT) AS b,
             CAST(sum((1 - expo) * hi) AS BIGINT) AS c,
             CAST(sum((1 - expo) * (1 - hi)) AS BIGINT) AS dd
           FROM (
             SELECT o_custkey,
               CASE WHEN day > mid THEN 1 ELSE 0 END AS expo,
               CASE WHEN cents > medc THEN 1 ELSE 0 END AS hi
             FROM ev, span, med) x
           JOIN customer cu ON x.o_custkey = cu.c_custkey
           JOIN nation n ON cu.c_nationkey = n.n_nationkey
           JOIN region r ON n.n_regionkey = r.r_regionkey
           GROUP BY 1),
         one AS (
           SELECT CAST(count(*) AS BIGINT) AS n_strata,
             CAST(sum(a) AS BIGINT) AS sum_a,
             list({'r_name': r_name, 'a': a, 'b': b, 'c': c, 'dd': dd}
               ORDER BY r_name) AS cs
           FROM cells),
         folds AS (
           SELECT n_strata, sum_a,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(cs, t ->
                 CAST(t.a + t.b AS DOUBLE) * CAST(t.a + t.c AS DOUBLE)
                 / CAST(t.a + t.b + t.c + t.dd AS DOUBLE))),
               (x, y) -> x + y) AS sum_e,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(cs, t ->
                 CAST(CAST(t.a + t.b AS HUGEINT) * (t.c + t.dd)
                      * (t.a + t.c) * (t.b + t.dd) AS DOUBLE)
                 / (CAST(t.a + t.b + t.c + t.dd AS DOUBLE)
                    * CAST(t.a + t.b + t.c + t.dd AS DOUBLE)
                    * CAST(t.a + t.b + t.c + t.dd - 1 AS DOUBLE)))),
               (x, y) -> x + y) AS sum_v,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(cs, t ->
                 CAST(t.a AS DOUBLE) * CAST(t.dd AS DOUBLE)
                 / CAST(t.a + t.b + t.c + t.dd AS DOUBLE))),
               (x, y) -> x + y) AS sum_ad,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(cs, t ->
                 CAST(t.b AS DOUBLE) * CAST(t.c AS DOUBLE)
                 / CAST(t.a + t.b + t.c + t.dd AS DOUBLE))),
               (x, y) -> x + y) AS sum_bc
           FROM one)
         SELECT n_strata, sum_a,
           round(sum_e, 4) + 0.0 AS sum_expected,
           round(CASE WHEN sum_v <= 0.0 THEN NULL
             ELSE (abs(CAST(sum_a AS DOUBLE) - sum_e) - 0.5)
                  * (abs(CAST(sum_a AS DOUBLE) - sum_e) - 0.5)
                  / sum_v END, 4) + 0.0 AS cmh_chi2,
           round(CASE WHEN sum_bc <= 0.0 THEN NULL
             ELSE sum_ad / sum_bc END, 4) + 0.0 AS mh_odds_ratio
         FROM folds""",

    "q207_rdd" ->
      """WITH spend AS (
           SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS sp
           FROM orders GROUP BY 1),
         c AS (
           SELECT CAST(round(c_acctbal * 100) AS BIGINT) AS bal,
             COALESCE(sp, 0) AS sp,
             CASE WHEN round(c_acctbal * 100) >= 0 THEN 1 ELSE 0 END
               AS r
           FROM customer LEFT JOIN spend ON c_custkey = o_custkey
           WHERE abs(CAST(round(c_acctbal * 100) AS BIGINT))
             <= 100000),
         m AS (
           SELECT
             CAST(sum(r) AS BIGINT) AS n_r,
             CAST(sum(1 - r) AS BIGINT) AS n_l,
             sum(CAST(r AS HUGEINT) * bal) AS sb_r,
             sum(CAST(1 - r AS HUGEINT) * bal) AS sb_l,
             sum(CAST(r AS HUGEINT) * sp) AS ss_r,
             sum(CAST(1 - r AS HUGEINT) * sp) AS ss_l,
             sum(CAST(r AS HUGEINT) * bal * bal) AS sbb_r,
             sum(CAST(1 - r AS HUGEINT) * bal * bal) AS sbb_l,
             sum(CAST(r AS HUGEINT) * bal * sp) AS sbs_r,
             sum(CAST(1 - r AS HUGEINT) * bal * sp) AS sbs_l
           FROM c),
         f AS (
           SELECT n_l, n_r,
             CAST(sbb_l AS DOUBLE) - CAST(sb_l AS DOUBLE)
               * CAST(sb_l AS DOUBLE) / CAST(n_l AS DOUBLE) AS cbb_l,
             CAST(sbs_l AS DOUBLE) - CAST(sb_l AS DOUBLE)
               * CAST(ss_l AS DOUBLE) / CAST(n_l AS DOUBLE) AS cbs_l,
             CAST(sbb_r AS DOUBLE) - CAST(sb_r AS DOUBLE)
               * CAST(sb_r AS DOUBLE) / CAST(n_r AS DOUBLE) AS cbb_r,
             CAST(sbs_r AS DOUBLE) - CAST(sb_r AS DOUBLE)
               * CAST(ss_r AS DOUBLE) / CAST(n_r AS DOUBLE) AS cbs_r,
             sb_l, ss_l, sb_r, ss_r
           FROM m),
         g AS (
           SELECT n_l, n_r, sb_l, ss_l, sb_r, ss_r,
             CASE WHEN cbb_l <= 0.0 THEN NULL
               ELSE cbs_l / cbb_l END AS slope_l,
             CASE WHEN cbb_r <= 0.0 THEN NULL
               ELSE cbs_r / cbb_r END AS slope_r
           FROM f),
         h AS (
           SELECT n_l, n_r, slope_l, slope_r,
             (CAST(ss_l AS DOUBLE) / CAST(n_l AS DOUBLE)
              - slope_l * CAST(sb_l AS DOUBLE) / CAST(n_l AS DOUBLE))
               / 100.0 AS icept_l,
             (CAST(ss_r AS DOUBLE) / CAST(n_r AS DOUBLE)
              - slope_r * CAST(sb_r AS DOUBLE) / CAST(n_r AS DOUBLE))
               / 100.0 AS icept_r
           FROM g)
         SELECT n_l AS n_left, n_r AS n_right,
           round(slope_l, 6) + 0.0 AS slope_left,
           round(slope_r, 6) + 0.0 AS slope_right,
           round(icept_l, 4) + 0.0 AS limit_left_dollars,
           round(icept_r, 4) + 0.0 AS limit_right_dollars,
           round(icept_r - icept_l, 4) + 0.0 AS rdd_effect_dollars
         FROM h""")
}
