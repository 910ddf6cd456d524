package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Round-16 frontier (batch 2): the experiment-and-distribution-shift
  * panel — McNemar's paired test, the G-test (log-likelihood-ratio
  * independence, the χ² twin that is additive across partitions),
  * Cronbach's alpha reliability, the population-stability index (the
  * score-drift metric model monitors read), CUPED variance reduction
  * (the covariate-adjustment every experimentation platform runs),
  * and the Nelson–Aalen cumulative-hazard estimator (q120's
  * Kaplan–Meier sibling).
  *
  * Reference note: the reference engine (`/root/reference/`, a Go log
  * forwarder — SURVEY.md §1) has no analytics surface; these extend
  * the Frontier families under the house disciplines — exact integer
  * domains until one final IEEE assembly (decimal(38,0) where 64-bit
  * products can overflow), order-deterministic double folds
  * (sort_array + `aggregate` HOF, mirrored by DuckDB's ordered
  * `list(...)` + `list_reduce` — the q92 discipline), `Tables.nz` on
  * signable float outputs, bounded collects only, and DuckDB oracles
  * replaying the identical arithmetic.
  */
object Frontier6 {

  private val dec = "decimal(38,0)"

  def queries: Map[String, Q] = Map(

    // McNemar's test with continuity correction — did the SET of
    // heavy users shift between the first and second half of the
    // observation span? Per half, a user is "heavy" when their event
    // count exceeds that half's cross-user median; the paired design
    // (each user is their own control) is what the two-proportion
    // z-test (q123) cannot give: only the DISCORDANT users (heavy in
    // exactly one half) carry signal, χ²_cc = (|b−c|−1)²/(b+c).
    // 100 TB shape: one groupBy(user) carrying two exact count sums,
    // the two medians are ONE percentile_cont row broadcast back
    // (q188/q194-proven parity), then a single global reduce of four
    // exact longs; the statistic is one IEEE expression over them.
    // Degenerate guard: no discordant users → NULL.
    "q197_mcnemar" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.load(s, d, "events")
        .select($"user_id", to_date($"ts").as("day"))
      val span = ev.agg(min($"day").as("d0"), max($"day").as("d1"))
        .select(expr("date_add(d0, CAST(datediff(d1, d0) div 2 AS INT))")
          .as("mid"))
      val cnts = ev.crossJoin(broadcast(span))
        .groupBy($"user_id")
        .agg(sum(when($"day" <= $"mid", 1L).otherwise(0L)).as("cf"),
          sum(when($"day" > $"mid", 1L).otherwise(0L)).as("cs"))
      val med = cnts.agg(
        expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY cf)")
          .as("mf"),
        expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY cs)")
          .as("ms"))
      val per = cnts.crossJoin(broadcast(med))
        .select(when($"cf" > $"mf", 1L).otherwise(0L).as("f"),
          when($"cs" > $"ms", 1L).otherwise(0L).as("snd"))
      per.agg(count(lit(1)).as("n_users"),
          sum($"f" * $"snd").as("n_both"),
          sum($"f" * (lit(1L) - $"snd")).as("n_first_only"),
          sum((lit(1L) - $"f") * $"snd").as("n_second_only"))
        .select($"n_users", $"n_both", $"n_first_only",
          $"n_second_only",
          Tables.nz(round(
            when($"n_first_only" + $"n_second_only" === 0L,
              lit(null).cast("double"))
              .otherwise({
                val dd = abs($"n_first_only" - $"n_second_only") - 1L
                (dd * dd).cast("double") /
                  ($"n_first_only" + $"n_second_only").cast("double")
              }), 4)).as("mcnemar_chi2"))
    }),

    // G-test of independence (event_type × weekday) — the
    // log-likelihood-ratio twin of q92's Pearson χ²: G = 2·Σ O·ln(O·N
    // /(R·C)). Statistically it is the test that ADDS across disjoint
    // partitions of the data (Pearson's does not decompose), which is
    // exactly the property a sharded 100-TB scan wants: per-shard G
    // values sum to the global G when the cell table is the union.
    // Plan: one cells groupBy, row/col margins as partitioned windows
    // over the cell table (types×7-bounded), one global fold over the
    // (type, wd)-sorted cell array — every count exact long, each
    // term a fixed IEEE expression, summed in one deterministic
    // left-fold order on both engines.
    "q198_g_test" -> ((s, d) => {
      import s.implicits._
      val cells = Tables.load(s, d, "events")
        .select($"event_type",
          pmod(datediff(to_date($"ts"), lit("1970-01-05")),
            lit(7)).cast("long").as("wd"))
        .groupBy($"event_type", $"wd").agg(count(lit(1)).as("obs"))
      val wr = Window.partitionBy($"event_type")
      val wc = Window.partitionBy($"wd")
      cells
        .withColumn("row_n", sum($"obs").over(wr))
        .withColumn("col_n", sum($"obs").over(wc))
        .groupBy()
        .agg(sum($"obs").as("n"),
          countDistinct($"event_type").as("n_types"),
          countDistinct($"wd").as("n_wds"),
          sort_array(collect_list(struct($"event_type", $"wd",
            $"obs", $"row_n", $"col_n"))).as("cs"))
        .select($"n",
          (($"n_types" - 1) * ($"n_wds" - 1)).as("dof"),
          Tables.nz(round(expr(
            """2.0 * aggregate(cs, cast(0.0 as double), (acc, c) ->
               acc + cast(c.obs as double) *
                 ln((cast(n as double) * cast(c.obs as double)) /
                    (cast(c.row_n as double)
                     * cast(c.col_n as double))))"""), 4))
            .as("g_stat"))
    }),

    // Cronbach's alpha — internal-consistency reliability of the
    // event-type "items": does per-user activity across types move
    // together (one latent engagement trait) or independently?
    // α = k/(k−1)·(1 − Σᵢσ²ᵢ/σ²_total) with population variances over
    // the full user universe. The zero-fill trick that keeps it one
    // pass: users missing an item contribute x=0, which leaves Σx and
    // Σx² untouched — so per-item moments come straight off the
    // (user, type) count table with NO grid fill, and the item panel
    // is a k-bounded sorted fold. Per-user totals are one more
    // groupBy; everything is exact (decimal(38,0) squares) until the
    // final assembly.
    "q199_cronbach_alpha" -> ((s, d) => {
      import s.implicits._
      val x = Tables.load(s, d, "events")
        .groupBy($"user_id", $"event_type")
        .agg(count(lit(1)).as("x"))
      val items = x.groupBy($"event_type")
        .agg(sum($"x".cast(dec)).as("si"),
          sum(($"x".cast(dec) * $"x").cast(dec)).as("qi"))
        .agg(count(lit(1)).as("k"),
          sort_array(collect_list(struct($"event_type", $"si",
            $"qi"))).as("arr"))
      val users = x.groupBy($"user_id")
        .agg(sum($"x").as("t"))
        .agg(count(lit(1)).as("n"),
          sum($"t".cast(dec)).as("st"),
          sum(($"t".cast(dec) * $"t").cast(dec)).as("qt"))
      users.crossJoin(broadcast(items))
        .withColumn("nd", $"n".cast("double"))
        .withColumn("sum_item_var", expr(
          """aggregate(arr, cast(0.0 as double), (acc, it) ->
             acc + (cast(it.qi as double) / nd
                    - (cast(it.si as double) / nd)
                      * (cast(it.si as double) / nd)))"""))
        .withColumn("total_var",
          $"qt".cast("double") / $"nd" -
            ($"st".cast("double") / $"nd") *
              ($"st".cast("double") / $"nd"))
        .select($"n".as("n_users"), $"k".as("k_items"),
          Tables.nz(round($"sum_item_var", 4)).as("sum_item_var"),
          Tables.nz(round($"total_var", 4)).as("total_var"),
          Tables.nz(round(
            when($"k" < 2L || $"total_var" <= 0.0,
              lit(null).cast("double"))
              .otherwise(($"k".cast("double") /
                ($"k".cast("double") - 1.0)) *
                (lit(1.0) - $"sum_item_var" / $"total_var")), 4))
            .as("cronbach_alpha"))
    }),

    // Population-stability index — the score-drift metric every model
    // monitor reads: bucket order values into deciles defined on the
    // POOLED distribution (exact-cents percentile_cont boundaries,
    // q188/q194-proven parity, one 1-row broadcast), count each half
    // of the date span per bucket, PSI = Σ(p−q)·ln(p/q) with the
    // documented +0.5/bucket Laplace smoothing (+5.0 on the
    // denominator for 10 buckets) so empty cells stay finite and both
    // engines smooth identically. The bucket index is a SUM OF NINE
    // COMPARISONS against broadcast boundaries — no global sort, no
    // ntile window; counts reduce in one groupBy(bucket, half) over
    // ≤20 cells; the fold is bucket-sorted and 10-bounded.
    "q200_psi" -> ((s, d) => {
      import s.implicits._
      val o = Tables.load(s, d, "orders")
        .select(round($"o_totalprice" * 100).cast("long").as("cents"),
          to_date($"o_orderdate").as("day"))
      // r19 optimization (guide §1.2/§4): the nine decile boundaries
      // and the span midpoint come out of ONE aggregate pass —
      // percentile(cents, array(...)) keeps a single value buffer
      // where nine separate percentile_cont calls each buffered the
      // full column (9× the boxed map updates and buffer shuffle),
      // and folding min/max(day) into the same agg drops a second
      // orders scan + serial broadcast job. Value-identical: Spark
      // resolves percentile_cont(p) to the exact Percentile
      // aggregate, so each array element is the same interpolated
      // double the old per-p calls produced (oracle re-proven).
      val pre = o.agg(min($"day").as("d0"), max($"day").as("d1"),
          expr("percentile(cents, array(0.1, 0.2, 0.3, 0.4, 0.5, " +
            "0.6, 0.7, 0.8, 0.9))").as("bsa"))
        .select(
          expr("date_add(d0, CAST(datediff(d1, d0) div 2 AS INT))")
            .as("mid") +:
          (1 to 9).map(j => element_at($"bsa", j).as(s"b$j")): _*)
      val bucketed = o.crossJoin(broadcast(pre))
        .select(
          (1 to 9).map(j => when($"cents" > col(s"b$j"), 1L)
            .otherwise(0L)).reduce(_ + _).as("bucket"),
          when($"day" > $"mid", 1L).otherwise(0L).as("h"))
      val cellCounts = bucketed.groupBy($"bucket")
        .agg(sum(lit(1L) - $"h").as("nf"), sum($"h").as("ns"))
      cellCounts
        .agg(sum($"nf").as("n_first"), sum($"ns").as("n_second"),
          count(lit(1)).as("n_buckets"),
          sort_array(collect_list(struct($"bucket", $"nf", $"ns")))
            .as("arr"))
        .select($"n_first", $"n_second", $"n_buckets",
          Tables.nz(round(expr(
            """aggregate(arr, cast(0.0 as double), (acc, c) ->
               acc + ((cast(c.nf as double) + 0.5)
                        / (cast(n_first as double) + 5.0)
                      - (cast(c.ns as double) + 0.5)
                        / (cast(n_second as double) + 5.0))
                   * ln(((cast(c.nf as double) + 0.5)
                          / (cast(n_first as double) + 5.0))
                        / ((cast(c.ns as double) + 0.5)
                           / (cast(n_second as double) + 5.0))))"""),
            6)).as("psi"))
    }),

    // CUPED variance reduction — the covariate adjustment every
    // experimentation platform applies before reading an A/B metric:
    // Y = second-half spend, X = first-half spend (the pre-period
    // covariate), deterministic arm assignment custkey mod 2,
    // θ = cov(X,Y)/var(X) pooled, adjusted diff = Δ(Ȳ − θX̄), and the
    // variance-reduction factor is ρ²(X,Y). One groupBy(custkey)
    // builds the (x, y) panel, one global aggregate carries the nine
    // exact moments (decimal(38,0) — Σx·y crosses 2^63 near 10⁶
    // customers × (10⁷ cents)²), and every output is a fixed IEEE
    // expression over them. Guards: zero pre-period or post-period
    // variance → NULL θ/ρ².
    "q201_cuped" -> ((s, d) => {
      import s.implicits._
      val per = Tables.load(s, d, "orders")
        .select($"o_custkey",
          round($"o_totalprice" * 100).cast("long").as("cents"),
          to_date($"o_orderdate").as("day"))
      val span = per.agg(min($"day").as("d0"), max($"day").as("d1"))
        .select(expr("date_add(d0, CAST(datediff(d1, d0) div 2 AS INT))")
          .as("mid"))
      val cust = per.crossJoin(broadcast(span))
        .groupBy($"o_custkey")
        .agg(sum(when($"day" <= $"mid", $"cents").otherwise(0L))
          .as("x"),
          sum(when($"day" > $"mid", $"cents").otherwise(0L)).as("y"))
        .withColumn("treat", pmod($"o_custkey", lit(2L)))
      val m = cust.agg(
        count(lit(1)).as("n"),
        sum(when($"treat" === 1L, 1L).otherwise(0L)).as("n1"),
        sum(when($"treat" === 0L, 1L).otherwise(0L)).as("n0"),
        sum(when($"treat" === 1L, $"x".cast(dec)).otherwise(lit(0).cast(dec))).as("sx1"),
        sum(when($"treat" === 0L, $"x".cast(dec)).otherwise(lit(0).cast(dec))).as("sx0"),
        sum(when($"treat" === 1L, $"y".cast(dec)).otherwise(lit(0).cast(dec))).as("sy1"),
        sum(when($"treat" === 0L, $"y".cast(dec)).otherwise(lit(0).cast(dec))).as("sy0"),
        sum(($"x".cast(dec) * $"y").cast(dec)).as("sxy"),
        sum(($"x".cast(dec) * $"x").cast(dec)).as("sxx"),
        sum(($"y".cast(dec) * $"y").cast(dec)).as("syy"))
        .withColumn("nd", $"n".cast("double"))
        .withColumn("mx", ($"sx1".cast(dec) + $"sx0").cast("double") / $"nd")
        .withColumn("my", ($"sy1".cast(dec) + $"sy0").cast("double") / $"nd")
        .withColumn("covxy",
          $"sxy".cast("double") / $"nd" - $"mx" * $"my")
        .withColumn("varx",
          $"sxx".cast("double") / $"nd" - $"mx" * $"mx")
        .withColumn("vary",
          $"syy".cast("double") / $"nd" - $"my" * $"my")
        .withColumn("theta",
          when($"varx" <= 0.0, lit(null).cast("double"))
            .otherwise($"covxy" / $"varx"))
      m.select($"n1".as("n_treat"), $"n0".as("n_ctrl"),
          Tables.nz(round(
            $"sy1".cast("double") / $"n1".cast("double") -
              $"sy0".cast("double") / $"n0".cast("double"), 4))
            .as("diff_raw_cents"),
          Tables.nz(round($"theta", 6)).as("theta"),
          Tables.nz(round(
            ($"sy1".cast("double") / $"n1".cast("double") -
              $"theta" * ($"sx1".cast("double") / $"n1".cast("double"))) -
            ($"sy0".cast("double") / $"n0".cast("double") -
              $"theta" * ($"sx0".cast("double") / $"n0".cast("double"))),
            4)).as("diff_cuped_cents"),
          Tables.nz(round(
            when($"varx" <= 0.0 || $"vary" <= 0.0,
              lit(null).cast("double"))
              .otherwise($"covxy" * $"covxy" / ($"varx" * $"vary")),
            4)).as("rho2"))
    }),

    // Nelson–Aalen cumulative hazard — q120's estimator sibling on
    // the SAME churn risk table: H(t) = Σ_{s≤t} dₛ/nₛ (the additive
    // hazard read; KM multiplies survival factors, NA sums hazard
    // increments — at scale the increments are partition-additive),
    // plus the Breslow survival S = exp(−H) so the two curves sit
    // side by side. The risk table is months-bounded (≤ span/30 rows
    // at any corpus size — the q120 whitelist stance for its reverse
    // cumulative window); the per-row hazard prefix is a fold over
    // the month-sorted slice, IEEE add order identical on both
    // engines.
    "q202_nelson_aalen" -> ((s, d) => {
      import s.implicits._
      val maxd = Tables.load(s, d, "orders")
        .agg(max(to_date($"o_orderdate")).as("maxd"))
      val cust = Tables.load(s, d, "orders")
        .select($"o_custkey", to_date($"o_orderdate").as("day"))
        .groupBy($"o_custkey")
        .agg(min($"day").as("first"), max($"day").as("last"))
        .crossJoin(broadcast(maxd))
        .select(
          (datediff($"maxd", $"last") > 90).as("churned"),
          expr("""CAST(CASE WHEN datediff(maxd, last) > 90
                  THEN datediff(last, first) div 30
                  ELSE datediff(maxd, first) div 30 END AS BIGINT)""")
            .as("t"))
      val byMonth = cust.groupBy($"t")
        .agg(sum(when($"churned", 1L).otherwise(0L)).as("d"),
          sum(when($"churned", 0L).otherwise(1L)).as("c"))
      // months-bounded frame: the whole-frame window below runs over
      // ≤ span/30 rows (the q120 bounded-table stance)
      val risk = byMonth
        .withColumn("n_at_risk",
          sum($"d" + $"c").over(Window.orderBy($"t").rowsBetween(
            Window.currentRow, Window.unboundedFollowing)))
      risk
        .agg(sort_array(collect_list(struct($"t", $"d", $"c",
          $"n_at_risk"))).as("arr"))
        .select($"arr", posexplode($"arr").as(Seq("pos", "r")))
        .withColumn("haz", expr(
          """aggregate(slice(arr, 1, pos + 1), CAST(0.0 AS DOUBLE),
             (a, x) -> a + cast(x.d as double)
                           / cast(x.n_at_risk as double))"""))
        .select($"r.t".as("t"), $"r.n_at_risk".as("n_at_risk"),
          $"r.d".as("n_churned"), $"r.c".as("n_censored"),
          round($"haz", 6).as("cum_hazard"),
          round(exp(-$"haz"), 6).as("s_breslow"))
        .orderBy($"t")
    }))

  private val spanSql =
    """span AS (
         SELECT d0 + CAST((d1 - d0) // 2 AS INTEGER) AS mid
         FROM (SELECT min(day) AS d0, max(day) AS d1 FROM ev))"""

  def oracles: Map[String, String] = Map(

    "q197_mcnemar" ->
      s"""WITH ev AS (
           SELECT user_id, CAST(ts AS DATE) AS day FROM events),
         $spanSql,
         cnts AS (
           SELECT user_id,
             CAST(sum(CASE WHEN day <= mid THEN 1 ELSE 0 END)
               AS BIGINT) AS cf,
             CAST(sum(CASE WHEN day > mid THEN 1 ELSE 0 END)
               AS BIGINT) AS cs
           FROM ev, span GROUP BY 1),
         med AS (
           SELECT percentile_cont(0.5) WITHIN GROUP (ORDER BY cf)
               AS mf,
             percentile_cont(0.5) WITHIN GROUP (ORDER BY cs) AS ms
           FROM cnts),
         per AS (
           SELECT CAST(CASE WHEN cf > mf THEN 1 ELSE 0 END AS BIGINT)
               AS f,
             CAST(CASE WHEN cs > ms THEN 1 ELSE 0 END AS BIGINT)
               AS snd
           FROM cnts, med),
         agg AS (
           SELECT CAST(count(*) AS BIGINT) AS n_users,
             CAST(sum(f * snd) AS BIGINT) AS n_both,
             CAST(sum(f * (1 - snd)) AS BIGINT) AS n_first_only,
             CAST(sum((1 - f) * snd) AS BIGINT) AS n_second_only
           FROM per)
         SELECT n_users, n_both, n_first_only, n_second_only,
           round(CASE WHEN n_first_only + n_second_only = 0 THEN NULL
             ELSE CAST((abs(n_first_only - n_second_only) - 1)
                       * (abs(n_first_only - n_second_only) - 1)
                    AS DOUBLE)
                  / CAST(n_first_only + n_second_only AS DOUBLE)
             END, 4) + 0.0 AS mcnemar_chi2
         FROM agg""",

    "q198_g_test" ->
      """WITH cells AS (
           SELECT event_type,
             CAST(((date_diff('day', DATE '1970-01-05',
               CAST(ts AS DATE)) % 7) + 7) % 7 AS BIGINT) AS wd,
             CAST(count(*) AS BIGINT) AS obs
           FROM events GROUP BY 1, 2),
         rowc AS (SELECT event_type, CAST(sum(obs) AS BIGINT) AS row_n
                  FROM cells GROUP BY 1),
         colc AS (SELECT wd, CAST(sum(obs) AS BIGINT) AS col_n
                  FROM cells GROUP BY 1),
         tot AS (SELECT CAST(sum(obs) AS BIGINT) AS n,
                   CAST(count(DISTINCT event_type) AS BIGINT)
                     AS n_types,
                   CAST(count(DISTINCT wd) AS BIGINT) AS n_wds
                 FROM cells),
         j AS (
           SELECT c.event_type, c.wd,
             CAST(c.obs AS DOUBLE) *
               ln((CAST(t.n AS DOUBLE) * CAST(c.obs AS DOUBLE)) /
                  (CAST(r.row_n AS DOUBLE)
                   * CAST(l.col_n AS DOUBLE))) AS term
           FROM cells c
           JOIN rowc r ON c.event_type = r.event_type
           JOIN colc l ON c.wd = l.wd
           CROSS JOIN tot t)
         SELECT t.n, (t.n_types - 1) * (t.n_wds - 1) AS dof,
           round(2.0 * list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             (SELECT list(term ORDER BY event_type, wd) FROM j)),
             (a, b) -> a + b), 4) + 0.0 AS g_stat
         FROM tot t""",

    "q199_cronbach_alpha" ->
      """WITH x AS (
           SELECT user_id, event_type, CAST(count(*) AS BIGINT) AS x
           FROM events GROUP BY 1, 2),
         items AS (
           SELECT CAST(count(*) AS BIGINT) AS k,
             list({'event_type': event_type, 'si': si, 'qi': qi}
               ORDER BY event_type) AS arr
           FROM (SELECT event_type,
                   sum(CAST(x AS HUGEINT)) AS si,
                   sum(CAST(x AS HUGEINT) * x) AS qi
                 FROM x GROUP BY 1)),
         users AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
             sum(CAST(t AS HUGEINT)) AS st,
             sum(CAST(t AS HUGEINT) * t) AS qt
           FROM (SELECT user_id, CAST(sum(x) AS BIGINT) AS t
                 FROM x GROUP BY 1)),
         panel AS (
           SELECT n, k, CAST(n AS DOUBLE) AS nd,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(arr, it ->
                 CAST(it.qi AS DOUBLE) / CAST(n AS DOUBLE)
                 - (CAST(it.si AS DOUBLE) / CAST(n AS DOUBLE))
                   * (CAST(it.si AS DOUBLE) / CAST(n AS DOUBLE)))),
               (a, b) -> a + b) AS sum_item_var,
             CAST(qt AS DOUBLE) / CAST(n AS DOUBLE)
               - (CAST(st AS DOUBLE) / CAST(n AS DOUBLE))
                 * (CAST(st AS DOUBLE) / CAST(n AS DOUBLE))
               AS total_var
           FROM users, items)
         SELECT n AS n_users, k AS k_items,
           round(sum_item_var, 4) + 0.0 AS sum_item_var,
           round(total_var, 4) + 0.0 AS total_var,
           round(CASE WHEN k < 2 OR total_var <= 0.0 THEN NULL
             ELSE (CAST(k AS DOUBLE) / (CAST(k AS DOUBLE) - 1.0))
                  * (1.0 - sum_item_var / total_var) END, 4) + 0.0
             AS cronbach_alpha
         FROM panel""",

    "q200_psi" ->
      """WITH ev AS (
           SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(o_orderdate AS DATE) AS day
           FROM orders),
         span AS (
           SELECT d0 + CAST((d1 - d0) // 2 AS INTEGER) AS mid
           FROM (SELECT min(day) AS d0, max(day) AS d1 FROM ev)),
         bs AS (
           SELECT
             percentile_cont(0.1) WITHIN GROUP (ORDER BY cents) AS b1,
             percentile_cont(0.2) WITHIN GROUP (ORDER BY cents) AS b2,
             percentile_cont(0.3) WITHIN GROUP (ORDER BY cents) AS b3,
             percentile_cont(0.4) WITHIN GROUP (ORDER BY cents) AS b4,
             percentile_cont(0.5) WITHIN GROUP (ORDER BY cents) AS b5,
             percentile_cont(0.6) WITHIN GROUP (ORDER BY cents) AS b6,
             percentile_cont(0.7) WITHIN GROUP (ORDER BY cents) AS b7,
             percentile_cont(0.8) WITHIN GROUP (ORDER BY cents) AS b8,
             percentile_cont(0.9) WITHIN GROUP (ORDER BY cents) AS b9
           FROM ev),
         bucketed AS (
           SELECT
             CAST(CASE WHEN cents > b1 THEN 1 ELSE 0 END
               + CASE WHEN cents > b2 THEN 1 ELSE 0 END
               + CASE WHEN cents > b3 THEN 1 ELSE 0 END
               + CASE WHEN cents > b4 THEN 1 ELSE 0 END
               + CASE WHEN cents > b5 THEN 1 ELSE 0 END
               + CASE WHEN cents > b6 THEN 1 ELSE 0 END
               + CASE WHEN cents > b7 THEN 1 ELSE 0 END
               + CASE WHEN cents > b8 THEN 1 ELSE 0 END
               + CASE WHEN cents > b9 THEN 1 ELSE 0 END AS BIGINT)
               AS bucket,
             CAST(CASE WHEN day > mid THEN 1 ELSE 0 END AS BIGINT)
               AS h
           FROM ev, span, bs),
         cellcounts AS (
           SELECT bucket, CAST(sum(1 - h) AS BIGINT) AS nf,
             CAST(sum(h) AS BIGINT) AS ns
           FROM bucketed GROUP BY 1),
         agg AS (
           SELECT CAST(sum(nf) AS BIGINT) AS n_first,
             CAST(sum(ns) AS BIGINT) AS n_second,
             CAST(count(*) AS BIGINT) AS n_buckets,
             list({'bucket': bucket, 'nf': nf, 'ns': ns}
               ORDER BY bucket) AS arr
           FROM cellcounts)
         SELECT n_first, n_second, n_buckets,
           round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(arr, c ->
               ((CAST(c.nf AS DOUBLE) + 0.5)
                  / (CAST(n_first AS DOUBLE) + 5.0)
                - (CAST(c.ns AS DOUBLE) + 0.5)
                  / (CAST(n_second AS DOUBLE) + 5.0))
               * ln(((CAST(c.nf AS DOUBLE) + 0.5)
                      / (CAST(n_first AS DOUBLE) + 5.0))
                    / ((CAST(c.ns AS DOUBLE) + 0.5)
                       / (CAST(n_second AS DOUBLE) + 5.0))))),
             (a, b) -> a + b), 6) + 0.0 AS psi
         FROM agg""",

    "q201_cuped" ->
      """WITH per AS (
           SELECT o_custkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(o_orderdate AS DATE) AS day
           FROM orders),
         span AS (
           SELECT d0 + CAST((d1 - d0) // 2 AS INTEGER) AS mid
           FROM (SELECT min(day) AS d0, max(day) AS d1 FROM per)),
         cust AS (
           SELECT o_custkey,
             CAST(sum(CASE WHEN day <= mid THEN cents ELSE 0 END)
               AS BIGINT) AS x,
             CAST(sum(CASE WHEN day > mid THEN cents ELSE 0 END)
               AS BIGINT) AS y,
             CAST(((o_custkey % 2) + 2) % 2 AS BIGINT) AS treat
           FROM per, span GROUP BY o_custkey),
         m AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN treat = 1 THEN 1 ELSE 0 END)
               AS BIGINT) AS n1,
             CAST(sum(CASE WHEN treat = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n0,
             sum(CASE WHEN treat = 1 THEN CAST(x AS HUGEINT)
               ELSE 0 END) AS sx1,
             sum(CASE WHEN treat = 0 THEN CAST(x AS HUGEINT)
               ELSE 0 END) AS sx0,
             sum(CASE WHEN treat = 1 THEN CAST(y AS HUGEINT)
               ELSE 0 END) AS sy1,
             sum(CASE WHEN treat = 0 THEN CAST(y AS HUGEINT)
               ELSE 0 END) AS sy0,
             sum(CAST(x AS HUGEINT) * y) AS sxy,
             sum(CAST(x AS HUGEINT) * x) AS sxx,
             sum(CAST(y AS HUGEINT) * y) AS syy
           FROM cust),
         m2 AS (
           SELECT *, CAST(n AS DOUBLE) AS nd,
             CAST(sx1 + sx0 AS DOUBLE) / CAST(n AS DOUBLE) AS mx,
             CAST(sy1 + sy0 AS DOUBLE) / CAST(n AS DOUBLE) AS my
           FROM m),
         m3 AS (
           SELECT *,
             CAST(sxy AS DOUBLE) / nd - mx * my AS covxy,
             CAST(sxx AS DOUBLE) / nd - mx * mx AS varx,
             CAST(syy AS DOUBLE) / nd - my * my AS vary
           FROM m2),
         m4 AS (
           SELECT *, CASE WHEN varx <= 0.0 THEN NULL
             ELSE covxy / varx END AS theta
           FROM m3)
         SELECT n1 AS n_treat, n0 AS n_ctrl,
           round(CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                 - CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE), 4) + 0.0
             AS diff_raw_cents,
           round(theta, 6) + 0.0 AS theta,
           round((CAST(sy1 AS DOUBLE) / CAST(n1 AS DOUBLE)
                  - theta * (CAST(sx1 AS DOUBLE) / CAST(n1 AS DOUBLE)))
                 - (CAST(sy0 AS DOUBLE) / CAST(n0 AS DOUBLE)
                    - theta * (CAST(sx0 AS DOUBLE)
                               / CAST(n0 AS DOUBLE))), 4) + 0.0
             AS diff_cuped_cents,
           round(CASE WHEN varx <= 0.0 OR vary <= 0.0 THEN NULL
             ELSE covxy * covxy / (varx * vary) END, 4) + 0.0 AS rho2
         FROM m4""",

    "q202_nelson_aalen" ->
      """WITH maxd AS (
           SELECT max(CAST(o_orderdate AS DATE)) AS maxd FROM orders),
         cust AS (
           SELECT o_custkey, min(CAST(o_orderdate AS DATE)) AS first,
             max(CAST(o_orderdate AS DATE)) AS last
           FROM orders GROUP BY 1),
         ev AS (
           SELECT (maxd - last) > 90 AS churned,
             CAST(CASE WHEN (maxd - last) > 90
                  THEN (last - first) // 30
                  ELSE (maxd - first) // 30 END AS BIGINT) AS t
           FROM cust, maxd),
         bymonth AS (
           SELECT t,
             CAST(sum(CASE WHEN churned THEN 1 ELSE 0 END) AS BIGINT)
               AS d,
             CAST(sum(CASE WHEN churned THEN 0 ELSE 1 END) AS BIGINT)
               AS c
           FROM ev GROUP BY 1),
         risk AS (
           SELECT t, d, c,
             CAST(sum(d + c) OVER (ORDER BY t DESC) AS BIGINT)
               AS n_at_risk
           FROM bymonth),
         one AS (
           SELECT list({'t': t, 'd': d, 'c': c, 'n': n_at_risk}
             ORDER BY t) AS arr
           FROM risk)
         SELECT arr[i].t AS t, arr[i].n AS n_at_risk,
           arr[i].d AS n_churned, arr[i].c AS n_censored,
           round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(arr[1:i], x ->
               CAST(x.d AS DOUBLE) / CAST(x.n AS DOUBLE))),
             (a, b) -> a + b), 6) AS cum_hazard,
           round(exp(-list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(arr[1:i], x ->
               CAST(x.d AS DOUBLE) / CAST(x.n AS DOUBLE))),
             (a, b) -> a + b)), 6) AS s_breslow
         FROM one, unnest(range(1, len(arr) + 1)) AS u(i)
         ORDER BY t""")
}
