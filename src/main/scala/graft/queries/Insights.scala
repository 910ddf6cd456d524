package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Round-9 time-series / distribution-quality operators: bounded-frame
  * rolling medians, calendar gap-fill densification, hour-of-day
  * entropy, decile gains tables, and Benford first-digit audits.
  *
  * The reference (`/root/reference/`, a record-at-a-time log
  * forwarder — SURVEY.md §2a) has none of this surface; these are §2c
  * extension rows from the monitoring/eval side of a curation
  * pipeline: "is this feed's daily volume gap-free", "how bursty is
  * each event type over the day", "how concentrated is spend across
  * customer deciles", "do the amounts obey Benford or were they
  * synthesized".
  *
  * Scale discipline shared by the five: the only windows are
  * per-partition-key or provably-constant-frame (a 5-row rolling
  * frame; a 10-row decile table); every transcendental fold runs over
  * a per-group SORTED array so the IEEE accumulation order is
  * engine-independent (text_entropy discipline); all money stays in
  * exact integer cents with floats only as final single-divide
  * displays.
  */
object Insights {

  def queries: Map[String, Q] = Map[String, Q](

    // Exact rolling median of each customer's last 5 order totals —
    // the bounded-frame order statistic Spark has no native window
    // function for. collect_list over a ROWS BETWEEN 4 PRECEDING
    // frame keeps the array ≤5 elements by construction (never
    // group-sized), sort_array + element_at picks the lower median in
    // exact integer cents — no percentile_approx, no global sort; the
    // shuffle is the per-customer window partition only.
    "q102_rolling_median" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey").rowsBetween(-4, 0)
      Tables.load(s, d, "orders")
        .select($"o_orderkey", $"o_custkey",
          $"o_orderdate",
          round($"o_totalprice" * 100).cast("long").as("cents"))
        .withColumn("win", sort_array(collect_list($"cents").over(w)))
        .select($"o_orderkey", $"o_custkey", $"cents",
          expr("element_at(win, CAST((size(win) + 1) div 2 AS INT))")
            .as("med5_cents"))
        .orderBy($"o_orderkey")
    }),

    // Hour-of-day entropy per event type — "is this event diurnal or
    // uniform": Shannon entropy of the 24-bucket hour histogram.
    // The ln fold rides the text_entropy discipline: per-type counts
    // collected into a SORTED array and folded row-locally in array
    // order, so both engines accumulate the identical IEEE sequence;
    // round(4) absorbs the ln ulp gap. One (type, hour) partial-agg
    // shuffle; the per-type array is ≤24 elements.
    "q103_hour_entropy" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "events")
        .select($"event_type", hour($"ts").cast("long").as("h"))
        .groupBy($"event_type", $"h").agg(count(lit(1)).as("c"))
        .groupBy($"event_type")
        .agg(sum($"c").as("n_events"), count(lit(1)).as("n_hours"),
          sort_array(collect_list($"c")).as("cs"))
        .select($"event_type", $"n_events", $"n_hours",
          round(log($"n_events".cast("double")) -
            expr("aggregate(cs, CAST(0.0 AS DOUBLE), " +
              "(a, x) -> a + x * ln(x))") /
              $"n_events", 4).as("hour_entropy"))
        .orderBy($"event_type")
    }),

    // Calendar gap-fill: zero-filled daily order volume per priority
    // over the full span — the densification every time-series
    // consumer (forecasting, anomaly detection) needs before lag
    // features. The day spine is sequence(min, max) off a ONE-ROW
    // aggregate (driver never holds it), cross-joined with the
    // enum-sized priority dim under a broadcast; observed days left-
    // join in. Spine size is span × |enum| — calendar-bounded, not
    // data-bounded, at any corpus scale.
    "q104_gap_fill" -> ((s, d) => {
      import s.implicits._
      val o = Tables.load(s, d, "orders")
        .select($"o_orderpriority".as("prio"),
          to_date($"o_orderdate").as("day"),
          round($"o_totalprice" * 100).cast("long").as("cents"))
      val daily = o.groupBy($"prio", $"day")
        .agg(count(lit(1)).as("n_orders"), sum($"cents").as("cents"))
      val days = o.agg(min($"day").as("d0"), max($"day").as("d1"))
        .select(explode(sequence($"d0", $"d1")).as("day"))
      val prios = o.select($"prio").distinct()
      days.crossJoin(broadcast(prios))
        .join(daily, Seq("prio", "day"), "left")
        // TIMESTAMP display cast: the driver's pandas compare reads
        // Spark DATE as object vs DuckDB DATE as datetime64 (q57
        // precedent) — the value is unchanged
        .select($"prio", $"day".cast("timestamp").as("day"),
          coalesce($"n_orders", lit(0L)).as("n_orders"),
          coalesce($"cents", lit(0L)).as("cents"))
        .orderBy($"prio", $"day")
    }),

    // Decile gains table (model-lift shape): customers ranked by
    // total spend, split into 10 arithmetic deciles, cumulative share
    // of spend per decile — "the top 10% carry X% of revenue". The
    // global rank rides PrefixSum's two-pass distributed scan (no
    // single-task window over the customer table); the only
    // whole-frame window left is over the 10-ROW decile aggregate,
    // constant-sized at any corpus scale. Shares are single divides
    // of exact long cents.
    "q105_gains_table" -> ((s, d) => {
      import s.implicits._
      val cust = Tables.load(s, d, "orders")
        .groupBy($"o_custkey")
        .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
      val ranked = graft.ops.PrefixSum.runningTotal(
        cust.withColumn("one", lit(1L)),
        Seq($"cents".desc, $"o_custkey"), $"one", "rn")
      val tot = cust.agg(count(lit(1)).as("n_cust"),
        sum($"cents").as("tot_cents"))
      val byDecile = ranked.crossJoin(broadcast(tot))
        .withColumn("decile", expr("(rn - 1) * 10 div n_cust"))
        .groupBy($"decile")
        .agg(count(lit(1)).as("n_cust"), sum($"cents").as("cents"),
          max($"tot_cents").as("tot"))
      val w10 = Window.orderBy($"decile")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      byDecile // 10 rows — the global window is constant-sized
        .withColumn("cum_cents", sum($"cents").over(w10))
        .select($"decile", $"n_cust", $"cents", $"cum_cents",
          round($"cum_cents".cast("double") /
            $"tot".cast("double"), 4).as("cum_share"))
        .orderBy($"decile")
    }),

    // Benford first-digit audit per order priority: chi-square
    // statistic of the observed leading-digit distribution of order
    // totals against Benford's log10(1 + 1/d) — the classic
    // fabricated-data detector. Digit histograms are enum-sized
    // (9 cells per priority); the transcendental fold runs over the
    // digit-SORTED struct array row-locally (both engines accumulate
    // the same 9-term IEEE sequence, q107-entropy discipline).
    "q106_benford" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "orders")
        .select($"o_orderpriority".as("prio"),
          substring(round($"o_totalprice" * 100).cast("long")
            .cast("string"), 1, 1).cast("long").as("digit"))
        .groupBy($"prio", $"digit").agg(count(lit(1)).as("c"))
        .groupBy($"prio")
        .agg(sum($"c").as("n"),
          sort_array(collect_list(struct($"digit", $"c"))).as("dc"))
        .select($"prio", $"n",
          round(expr(
            """aggregate(dc, CAST(0.0 AS DOUBLE), (a, x) ->
               a + pow(x.c / n - ln(1.0 + 1.0 / x.digit) / ln(10.0), 2)
                 / (ln(1.0 + 1.0 / x.digit) / ln(10.0)))""") * $"n",
            4).as("chi2"))
        .orderBy($"prio")
    }),

    // Exponential moving average of each customer's order totals
    // (alpha = 0.2), seeded at the first order — the smoothing pass a
    // spend-trend feature needs. Per-customer order counts are
    // TPC-H-bounded (tens), so the per-group sorted array is small by
    // construction; the fold runs in array order on both engines
    // (first-element seed, then s·0.8 + 0.2·x — DuckDB's list_reduce
    // seeding semantics replicated exactly), rounded at 4 for the
    // display. One groupBy shuffle, no windows.
    "q107_ema" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "orders")
        .select($"o_custkey",
          struct($"o_orderdate", $"o_orderkey",
            round($"o_totalprice" * 100).cast("long").as("cents"))
            .as("r"))
        .groupBy($"o_custkey")
        .agg(count(lit(1)).as("n_orders"),
          sort_array(collect_list($"r")).as("rs"))
        .select($"o_custkey", $"n_orders",
          round(expr(
            """aggregate(slice(rs, 2, size(rs) - 1),
               CAST(element_at(rs, 1).cents AS DOUBLE),
               (s, x) -> s * 0.8 + 0.2 * CAST(x.cents AS DOUBLE))"""),
            4).as("ema_cents"))
        .orderBy($"o_custkey")
    }),

  )

  def oracles: Map[String, String] = Map(

    // Independent formulation: DuckDB's list() window aggregate over
    // the same 5-row frame.
    "q102_rolling_median" ->
      """WITH o AS (
           SELECT o_orderkey, o_custkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             list_sort(list(CAST(round(o_totalprice * 100) AS BIGINT))
               OVER (PARTITION BY o_custkey
                     ORDER BY o_orderdate, o_orderkey
                     ROWS BETWEEN 4 PRECEDING AND CURRENT ROW)) AS win
           FROM orders)
         SELECT o_orderkey, o_custkey, cents,
           win[(len(win) + 1) // 2] AS med5_cents
         FROM o ORDER BY o_orderkey""",

    "q103_hour_entropy" ->
      """WITH h AS (
           SELECT event_type, CAST(hour(ts) AS BIGINT) AS h
           FROM events),
         c AS (SELECT event_type, h, count(*) AS c FROM h GROUP BY 1, 2),
         g AS (
           SELECT event_type, CAST(sum(c) AS BIGINT) AS n_events,
             count(*) AS n_hours, list_sort(list(c)) AS cs
           FROM c GROUP BY 1)
         SELECT event_type, n_events, n_hours,
           round(ln(CAST(n_events AS DOUBLE)) -
             list_reduce(list_transform(cs, x -> x * ln(x)),
               (a, b) -> a + b) / n_events, 4) AS hour_entropy
         FROM g ORDER BY event_type""",

    "q104_gap_fill" ->
      """WITH o AS (
           SELECT o_orderpriority AS prio,
             CAST(o_orderdate AS DATE) AS day,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
         daily AS (
           SELECT prio, day, CAST(count(*) AS BIGINT) AS n_orders,
             CAST(sum(cents) AS BIGINT) AS cents
           FROM o GROUP BY 1, 2),
         span AS (SELECT min(day) AS d0, max(day) AS d1 FROM o),
         days AS (
           SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
             CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
           FROM span),
         prios AS (SELECT DISTINCT prio FROM o)
         SELECT p.prio, CAST(dd.day AS TIMESTAMP) AS day,
           coalesce(dl.n_orders, 0) AS n_orders,
           coalesce(dl.cents, 0) AS cents
         FROM days dd CROSS JOIN prios p
         LEFT JOIN daily dl ON dl.prio = p.prio AND dl.day = dd.day
         ORDER BY p.prio, dd.day""",

    // Independent formulation: the single-sort row_number window
    // (the shape PrefixSum replaces on the Spark side).
    "q105_gains_table" ->
      """WITH cust AS (
           SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS cents
           FROM orders GROUP BY 1),
         r AS (
           SELECT cents,
             CAST(row_number() OVER (ORDER BY cents DESC, o_custkey)
               AS BIGINT) AS rn,
             CAST(count(*) OVER () AS BIGINT) AS n_cust,
             CAST(sum(cents) OVER () AS BIGINT) AS tot
           FROM cust),
         d AS (
           SELECT (rn - 1) * 10 // n_cust AS decile,
             CAST(count(*) AS BIGINT) AS n_cust,
             CAST(sum(cents) AS BIGINT) AS cents,
             CAST(max(tot) AS BIGINT) AS tot
           FROM r GROUP BY 1)
         SELECT decile, n_cust, cents,
           CAST(sum(cents) OVER (ORDER BY decile) AS BIGINT)
             AS cum_cents,
           round(CAST(sum(cents) OVER (ORDER BY decile) AS DOUBLE) /
             CAST(tot AS DOUBLE), 4) AS cum_share
         FROM d ORDER BY decile""",

    "q106_benford" ->
      """WITH o AS (
           SELECT o_orderpriority AS prio,
             CAST(substr(CAST(CAST(round(o_totalprice * 100) AS BIGINT)
               AS VARCHAR), 1, 1) AS BIGINT) AS digit
           FROM orders),
         c AS (SELECT prio, digit, count(*) AS c FROM o GROUP BY 1, 2),
         g AS (
           SELECT prio, CAST(sum(c) AS BIGINT) AS n,
             list_sort(list({'digit': digit, 'c': c})) AS dc
           FROM c GROUP BY 1)
         SELECT prio, n,
           round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(dc, x ->
               pow(x.c / n - ln(1.0 + 1.0 / x.digit) / ln(10.0), 2) /
                 (ln(1.0 + 1.0 / x.digit) / ln(10.0)))),
             (a, b) -> a + b) * n, 4) AS chi2
         FROM g ORDER BY prio""",

    // DuckDB's list_reduce seeds with the FIRST element natively —
    // the Spark side replicates that seeding with an explicit
    // element_at init over the tail slice.
    "q107_ema" ->
      """WITH o AS (
           SELECT o_custkey,
             {'d': o_orderdate, 'k': o_orderkey,
              'cents': CAST(round(o_totalprice * 100) AS BIGINT)} AS r
           FROM orders),
         g AS (
           SELECT o_custkey, CAST(count(*) AS BIGINT) AS n_orders,
             list_sort(list(r)) AS rs
           FROM o GROUP BY 1)
         SELECT o_custkey, n_orders,
           round(list_reduce(
             list_transform(rs, x -> CAST(x.cents AS DOUBLE)),
             (s, x) -> s * 0.8 + 0.2 * x), 4) AS ema_cents
         FROM g ORDER BY o_custkey""",

  )
}
