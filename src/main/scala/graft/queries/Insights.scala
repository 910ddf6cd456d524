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

    // Mann–Kendall trend test per event type: S = Σ_{i<j} sign(x_j −
    // x_i) over the daily value series, τ = S / C(n,2) — the
    // distribution-free "is this metric drifting" monitor that needs
    // no normality assumption (the complement of q84's CUSUM, which
    // assumes a known reference mean). The pair expansion runs on the
    // (type, day) DAILY aggregate — a domain-bounded table (|types| ×
    // span days), so the self-join is days²-bounded per type, never
    // event-sized. Signs are exact integer comparisons on summed
    // cents; τ is one IEEE divide, round(4) for display.
    "q110_trend_mk" -> ((s, d) => {
      import s.implicits._
      val daily = Tables.load(s, d, "events")
        .select($"event_type", to_date($"ts").as("day"),
          round($"value" * 100).cast("long").as("cents"))
        .groupBy($"event_type", $"day").agg(sum($"cents").as("v"))
      val n = daily.groupBy($"event_type")
        .agg(count(lit(1)).as("n_days"))
      val a = daily.select($"event_type", $"day".as("d1"),
        $"v".as("v1"))
      val b = daily.select($"event_type", $"day".as("d2"),
        $"v".as("v2"))
      a.join(b, Seq("event_type")).filter($"d1" < $"d2")
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_pairs"),
          sum(when($"v2" > $"v1", 1L).when($"v2" < $"v1", -1L)
            .otherwise(0L)).as("s_stat"))
        .join(broadcast(n), Seq("event_type"))
        .select($"event_type", $"n_days", $"n_pairs", $"s_stat",
          Tables.nz(round($"s_stat".cast("double") /
            $"n_pairs".cast("double"), 4)).as("tau"))
        .orderBy($"event_type")
    }),

    // Trailing-7-day rolling distinct users per calendar day (the
    // WAU-shaped engagement curve next to q96's monthly stickiness).
    // Exact rolling COUNT DISTINCT is the classic scale trap — a
    // range self-join explodes, and distinct doesn't decompose over
    // windows. The linear shape: each distinct (user, day) activity
    // row COVERS the 7 report days it contributes to (one sequence
    // explode — activity is user·day-sized, ≪ events), distinct
    // (user, report_day) collapses multi-active users, and the count
    // is a map-side-combinable groupBy. The calendar spine rides
    // q104's one-row-aggregate sequence; zero-activity days surface
    // as 0 (partial windows at the span head are kept — standard
    // trailing-window semantics).
    "q111_rolling_dau" -> ((s, d) => {
      import s.implicits._
      val act = Tables.load(s, d, "events")
        .select($"user_id", to_date($"ts").as("day")).distinct()
        // feeds three consumers: bounds, same-day counts, coverage
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val spine = act.agg(min($"day").as("d0"), max($"day").as("d1"))
        .select(explode(sequence($"d0", $"d1")).as("day"))
      val dau1 = act.groupBy($"day").agg(count(lit(1)).as("dau"))
      val dau7 = act
        .select($"user_id",
          explode(sequence($"day", date_add($"day", 6))).as("day"))
        .distinct()
        .groupBy($"day").agg(count(lit(1)).as("dau7"))
      spine.join(dau1, Seq("day"), "left")
        .join(dau7, Seq("day"), "left")
        .select($"day".cast("timestamp").as("day"),
          coalesce($"dau", lit(0L)).as("dau"),
          coalesce($"dau7", lit(0L)).as("dau7"))
        .orderBy($"day")
    }),

    // Join-key skew profile: per candidate shuffle key, the frequency
    // distribution stats that decide salting / broadcast / AQE-skew
    // choices BEFORE a 100 TB run — n_keys, median and p99 and max
    // key frequency, top-key share. The load-bearing trick: the
    // stats come from the COUNT-OF-COUNTS table (frequency → #keys),
    // which is bounded by the number of DISTINCT multiplicities —
    // tiny at any corpus scale — so the only global window runs over
    // that bounded frame (the q105 "10-row table" stance), never
    // over keys. Median = ⌈n/2⌉-th smallest frequency, p99 = the
    // frequency where the cumulative key count first reaches 99%
    // (exact integer cross-multiplication, no percentile float);
    // shares/ratios are single IEEE divides.
    "q112_skew_profile" -> ((s, d) => {
      import s.implicits._
      def prof(df: org.apache.spark.sql.DataFrame, key: String,
          label: String): org.apache.spark.sql.DataFrame = {
        val cc = df.groupBy(col(key).as("k"))
          .agg(count(lit(1)).as("f"))
          .groupBy($"f").agg(count(lit(1)).as("nk"))
        val w = org.apache.spark.sql.expressions.Window.orderBy($"f")
          .rowsBetween(org.apache.spark.sql.expressions.Window
            .unboundedPreceding, 0)
        cc.withColumn("cumk", sum($"nk").over(w))
          .withColumn("n_rows", sum($"f" * $"nk").over())
          .withColumn("n_keys", sum($"nk").over())
          .withColumn("max_f", max($"f").over())
          .agg(
            max($"n_rows").as("n_rows"), max($"n_keys").as("n_keys"),
            min(when($"cumk" * 2 >= $"n_keys", $"f")).as("med_freq"),
            min(when($"cumk" * 100 >= $"n_keys" * 99, $"f"))
              .as("p99_freq"),
            max($"max_f").as("max_freq"))
          .select(lit(label).as("key_name"), $"n_rows", $"n_keys",
            $"med_freq", $"p99_freq", $"max_freq",
            round($"max_freq".cast("double") /
              $"n_rows".cast("double"), 6).as("top_share"),
            round($"max_freq".cast("double") /
              $"med_freq".cast("double"), 4).as("skew_ratio"))
      }
      val li = Tables.load(s, d, "lineitem")
      val ev = Tables.load(s, d, "events")
      prof(li, "l_partkey", "lineitem.l_partkey")
        .unionAll(prof(li, "l_suppkey", "lineitem.l_suppkey"))
        .unionAll(prof(Tables.load(s, d, "orders"), "o_custkey",
          "orders.o_custkey"))
        .unionAll(prof(ev, "user_id", "events.user_id"))
        .unionAll(prof(ev, "event_type", "events.event_type"))
        .orderBy($"key_name")
    }),

    // Consecutive-day activity streaks per user — the classic
    // gaps-and-islands pattern (day_index − row_number is constant
    // within a run), the habit-formation read next to q95/q96. All
    // windows are per-user (high cardinality — they scale); day
    // indexes are exact epoch-day integers on both engines.
    "q113_streaks" -> ((s, d) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"di")
      Tables.load(s, d, "events")
        .select($"user_id",
          datediff(to_date($"ts"), lit("1970-01-01").cast("date"))
            .cast("long").as("di"))
        .distinct()
        .withColumn("grp", $"di" - row_number().over(w))
        .groupBy($"user_id", $"grp").agg(count(lit(1)).as("len"))
        .groupBy($"user_id")
        .agg(sum($"len").as("n_active_days"),
          count(lit(1)).as("n_streaks"),
          max($"len").as("max_streak"))
        .orderBy($"user_id")
    }),

    // Holt double exponential smoothing (α=0.2, β=0.3) of daily
    // revenue per event type — the trend-aware upgrade of q107's EMA
    // and the forecaster q94's seasonal-naive baseline competes
    // against. Two-state recursion (level, trend) telescopes through
    // NOTHING — it must fold — so it rides the q107 discipline
    // extended to a STRUCT accumulator: the (type, day) daily table
    // is domain-bounded, each type's series collects into one sorted
    // array, and both engines fold the identical IEEE sequence
    // (Spark `aggregate` with a named_struct state ≡ DuckDB
    // list_reduce over prepended struct state; the new-level
    // expression is repeated verbatim inside the trend update on
    // both sides, so even its rounding is shared). Seed l₀=x₀, t₀=0.
    "q114_holt_forecast" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "events")
        .select($"event_type", to_date($"ts").as("day"),
          round($"value" * 100).cast("long").as("cents"))
        .groupBy($"event_type", $"day").agg(sum($"cents").as("v"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_days"),
          expr("transform(sort_array(collect_list(struct(day, v))), " +
            "x -> CAST(x.v AS DOUBLE))").as("vs"))
        .select($"event_type", $"n_days",
          expr(
            """aggregate(slice(vs, 2, size(vs) - 1),
               named_struct('l', element_at(vs, 1),
                            't', CAST(0.0 AS DOUBLE)),
               (a, x) -> named_struct(
                 'l', 0.2 * x + 0.8 * (a.l + a.t),
                 't', 0.3 * ((0.2 * x + 0.8 * (a.l + a.t)) - a.l)
                      + 0.7 * a.t))""").as("st"))
        .select($"event_type", $"n_days",
          round($"st.l", 4).as("level"),
          round($"st.t", 4).as("trend"),
          round($"st.l" + $"st.t", 4).as("forecast_next"))
        .orderBy($"event_type")
    }),

    // Functional-dependency audit over a fixed candidate set — the
    // data-profiling read (does A determine B) that decides which
    // "dimension" columns are safe denormalization targets and which
    // FK chains are real. Per candidate (A → B): #distinct A,
    // #distinct (A,B), #violating A values (those with >1 distinct
    // B), holds = zero violations. Each pair is one
    // groupBy(A).agg(countDistinct(B)) — two map-side-combinable
    // exchanges over the scan, never a join; the CANDIDATES are
    // enumerated (8 pairs), not mined — full lattice discovery is
    // exponential and out of scope (documented, TANE-family territory).
    "q115_fd_discovery" -> ((s, d) => {
      import s.implicits._
      def fd(table: String, a: String, b: String): org.apache.spark.sql
          .DataFrame =
        Tables.load(s, d, table)
          .groupBy(col(a).as("k"))
          .agg(countDistinct(col(b)).as("nb"))
          .agg(count(lit(1)).as("n_det"), sum($"nb").as("n_pairs"),
            sum(when($"nb" > 1, 1L).otherwise(0L)).as("n_violating"))
          .select(lit(s"$table.$a -> $table.$b").as("fd"),
            $"n_det", $"n_pairs", $"n_violating",
            ($"n_violating" === 0L).as("holds"))
      // r20 (guide §1.2/§2.4): the two o_orderkey candidates shared
      // the SAME determinant, so their two full orders scans + two
      // groupBy(o_orderkey) exchanges fuse into one pass (two
      // countDistinct buffers over one exchange; the Expand rewrite
      // duplicates rows map-side, so shuffled bytes match the old two
      // branches while the scan + agg pipeline runs once). Row values
      // are identical by construction — each fd's (n_det, n_pairs,
      // n_violating) is computed from its own countDistinct exactly
      // as the unfused branch did.
      val okFused = Tables.load(s, d, "orders")
        .groupBy($"o_orderkey".as("k"))
        .agg(countDistinct($"o_custkey").as("nb1"),
          countDistinct($"o_orderstatus").as("nb2"))
        .agg(count(lit(1)).as("n_det"),
          sum($"nb1").as("p1"),
          sum(when($"nb1" > 1, 1L).otherwise(0L)).as("v1"),
          sum($"nb2").as("p2"),
          sum(when($"nb2" > 1, 1L).otherwise(0L)).as("v2"))
        .select(explode(array(
          struct(lit("orders.o_orderkey -> orders.o_custkey").as("fd"),
            $"n_det", $"p1".as("n_pairs"), $"v1".as("n_violating")),
          struct(
            lit("orders.o_orderkey -> orders.o_orderstatus").as("fd"),
            $"n_det", $"p2".as("n_pairs"), $"v2".as("n_violating"))))
          .as("r"))
        .select($"r.fd", $"r.n_det", $"r.n_pairs", $"r.n_violating",
          ($"r.n_violating" === 0L).as("holds"))
      okFused
        .unionAll(fd("orders", "o_custkey", "o_orderpriority"))
        .unionAll(fd("lineitem", "l_orderkey", "l_suppkey"))
        .unionAll(fd("lineitem", "l_partkey", "l_suppkey"))
        .unionAll(fd("customer", "c_custkey", "c_mktsegment"))
        .unionAll(fd("customer", "c_nationkey", "c_mktsegment"))
        .unionAll(fd("nation", "n_nationkey", "n_regionkey"))
        .orderBy($"fd")
    }),

    // Wald–Wolfowitz runs test per event type — "is daily revenue a
    // random sequence or does it trend/cluster": the sign sequence
    // (above/below the type's exact median, ties dropped — the
    // standard treatment) should alternate like coin flips; too few
    // runs means clustering, too many means oscillation. Completes
    // the statistical-audit family (q92 chi-square, q106 Benford,
    // q110 Mann–Kendall). Everything lives on the day-ordered
    // domain-bounded array: median is the lower median of the
    // value-sorted copy (exact longs), runs/pos/neg are integer array
    // folds, and z is one fixed IEEE assembly of the exact counts
    // (q100 discipline), round(4).
    "q117_runs_test" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "events")
        .select($"event_type", to_date($"ts").as("day"),
          round($"value" * 100).cast("long").as("cents"))
        .groupBy($"event_type", $"day").agg(sum($"cents").as("v"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n_days"),
          expr("transform(sort_array(collect_list(struct(day, v))), " +
            "x -> x.v)").as("vs"),
          expr("sort_array(collect_list(v))").as("sorted"))
        .select($"event_type", $"n_days",
          expr("element_at(sorted, CAST((size(sorted) + 1) div 2 " +
            "AS INT))").as("med"), $"vs")
        .select($"event_type", $"n_days", $"med",
          expr("filter(transform(vs, v -> CASE WHEN v > med THEN 1 " +
            "WHEN v < med THEN -1 ELSE 0 END), s -> s != 0)")
            .as("signs"))
        .select($"event_type", $"n_days", $"med",
          size($"signs").cast("long").as("n"),
          expr("CAST(size(filter(signs, s -> s = 1)) AS BIGINT)")
            .as("n_pos"),
          expr("CAST(size(filter(signs, s -> s = -1)) AS BIGINT)")
            .as("n_neg"),
          // degenerate guard (r9 advice): with <2 signs (a type with
          // ≤2 days or all values tied at the median) sequence(2, n)
          // counts DOWN — [2,1,0] — and element_at(signs, 0) throws
          // INVALID_INDEX_OF_ZERO, where the oracle's range(2, n+1)
          // is simply empty (n_runs = 1). Mirror the oracle's
          // empty-range semantics explicitly.
          expr("CASE WHEN size(signs) < 2 THEN CAST(1 AS BIGINT) " +
            "ELSE CAST(size(filter(sequence(2, size(signs)), i -> " +
            "element_at(signs, i) != element_at(signs, i - 1))) " +
            "+ 1 AS BIGINT) END").as("n_runs"))
        .select($"event_type", $"n_days", $"med", $"n_pos", $"n_neg",
          $"n_runs",
          round(
            ($"n_runs".cast("double") -
              (lit(1.0) + lit(2.0) * ($"n_pos" * $"n_neg")
                .cast("double") / $"n".cast("double"))) /
            sqrt(lit(2.0) * ($"n_pos" * $"n_neg").cast("double") *
              (lit(2.0) * ($"n_pos" * $"n_neg").cast("double") -
                $"n".cast("double")) /
              ($"n".cast("double") * $"n".cast("double") *
                ($"n".cast("double") - lit(1.0)))), 4).as("z_stat"))
        .orderBy($"event_type")
    }),

    // Herfindahl–Hirschman supplier-concentration index per nation —
    // the antitrust-style "is this market one supplier in a trench
    // coat" read, completing the concentration family (q79 Gini,
    // q47 Pareto, q98 ABC). The float trap is Σ share² (a fold of
    // squared divides); instead HHI = Σ cᵢ² / (Σ cᵢ)² — squares
    // summed EXACTLY in decimal(38,0) (cents² overflows BIGINT at
    // corpus scale, the q92 discipline), one fixed IEEE
    // divide-of-casts at display. Supplier dim broadcasts onto the
    // lineitem scan; everything after the (nation, supplier) rollup
    // is nation-sized.
    "q118_hhi_concentration" -> ((s, d) => {
      import s.implicits._
      val li = Tables.load(s, d, "lineitem")
        .select($"l_suppkey",
          round($"l_extendedprice" * 100).cast("long").as("cents"))
      val sup = Tables.load(s, d, "supplier")
        .select($"s_suppkey", $"s_nationkey")
      val bySupp = li.join(broadcast(sup), $"l_suppkey" === $"s_suppkey")
        .groupBy($"s_nationkey", $"l_suppkey")
        .agg(sum($"cents").as("c"))
      val byNation = bySupp.groupBy($"s_nationkey")
        .agg(count(lit(1)).as("n_suppliers"), sum($"c").as("tot"),
          sum($"c".cast("decimal(38,0)") * $"c".cast("decimal(38,0)"))
            .as("sumsq"),
          max($"c").as("top_c"))
      byNation
        .join(broadcast(Tables.load(s, d, "nation")
          .select($"n_nationkey", $"n_name")),
          $"s_nationkey" === $"n_nationkey")
        .select($"n_name".as("nation"), $"n_suppliers", $"tot",
          round($"sumsq".cast("double") /
            ($"tot".cast("double") * $"tot".cast("double")), 6)
            .as("hhi"),
          round($"top_c".cast("double") / $"tot".cast("double"), 6)
            .as("top_share"))
        .orderBy($"nation")
    }),

    // Mutual information between event type and day-of-week — the
    // information-theoretic companion of q92's chi-square (chi² asks
    // "is there association"; MI asks "how many nats does knowing
    // the weekday buy"), plus both marginal entropies and the
    // uncertainty coefficient MI/min(H). Every transcendental fold
    // runs over a deterministically SORTED enum-sized array
    // (5 types × 7 days → 35 cells; text_entropy discipline), so both
    // engines accumulate the identical IEEE sequence; counts are
    // exact longs off one map-side-combined cell aggregate.
    "q119_mutual_information" -> ((s, d) => {
      import s.implicits._
      val cells = Tables.load(s, d, "events")
        .select($"event_type".as("e"),
          dayofweek(to_date($"ts")).cast("long").as("w"))
        .groupBy($"e", $"w").agg(count(lit(1)).as("n_ew"))
      val me = cells.groupBy($"e").agg(sum($"n_ew").as("n_e"))
      val mw = cells.groupBy($"w").agg(sum($"n_ew").as("n_w"))
      val miRow = cells
        .join(broadcast(me), Seq("e")).join(broadcast(mw), Seq("w"))
        .agg(sum($"n_ew").as("n_events"), count(lit(1)).as("n_cells"),
          sort_array(collect_list(struct($"e", $"w", $"n_ew", $"n_e",
            $"n_w"))).as("cs"))
        .select($"n_events", $"n_cells", expr(
          """aggregate(cs, CAST(0.0 AS DOUBLE), (a, x) ->
             a + (CAST(x.n_ew AS DOUBLE) / CAST(n_events AS DOUBLE)) *
                 ln(CAST(x.n_ew AS DOUBLE) * CAST(n_events AS DOUBLE) /
                    (CAST(x.n_e AS DOUBLE) * CAST(x.n_w AS DOUBLE))))""")
          .as("mi"))
      def hRow(m: org.apache.spark.sql.DataFrame, key: String,
          cnt: String, out: String) =
        m.agg(sum(col(cnt)).as("tot"),
          sort_array(collect_list(struct(col(key), col(cnt))))
            .as("ms"))
          .select(expr(
            s"""-aggregate(ms, CAST(0.0 AS DOUBLE), (a, x) ->
               a + (CAST(x.$cnt AS DOUBLE) / CAST(tot AS DOUBLE)) *
                   ln(CAST(x.$cnt AS DOUBLE) / CAST(tot AS DOUBLE)))""")
            .as(out))
      miRow.crossJoin(hRow(me, "e", "n_e", "h_type"))
        .crossJoin(hRow(mw, "w", "n_w", "h_dow"))
        .select($"n_events", $"n_cells", round($"mi", 4).as("mi_nats"),
          round($"h_type", 4).as("h_type"),
          round($"h_dow", 4).as("h_dow"),
          round($"mi" / least($"h_type", $"h_dow"), 4)
            .as("uncertainty"))
    }),

    // Kaplan–Meier churn survival curve: S(t) = Π_{s ≤ t} (1 − dₛ/nₛ)
    // over months since first order, censoring customers still active
    // near the dataset horizon (last order within 90 days of max
    // date) — the time-to-churn read behind retention planning, and
    // the survival-analysis family's entry next to q38's cohort
    // retention. The risk table is MONTHS-bounded (tiny at any corpus
    // scale): at-risk counts are a reverse cumulative sum over it,
    // and the survival product is a per-row fold over the
    // month-sorted factor array slice (NOT exp(Σln) — the fold's IEEE
    // multiply sequence is identical on both engines, q107
    // discipline). Customer-level reduction is one groupBy.
    "q120_survival_km" -> ((s, d) => {
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
      // ≤ span/30 rows (the q105 bounded-table stance)
      val risk = byMonth
        .withColumn("n_at_risk",
          sum($"d" + $"c").over(Window.orderBy($"t").rowsBetween(
            Window.currentRow, Window.unboundedFollowing)))
        .withColumn("factor",
          lit(1.0) - $"d".cast("double") / $"n_at_risk".cast("double"))
      risk
        .agg(sort_array(collect_list(struct($"t", $"d", $"c",
          $"n_at_risk", $"factor"))).as("arr"))
        .select($"arr", posexplode($"arr").as(Seq("pos", "r")))
        .select($"r.t".as("t"), $"r.n_at_risk".as("n_at_risk"),
          $"r.d".as("n_churned"), $"r.c".as("n_censored"),
          round(expr(
            """aggregate(slice(arr, 1, pos + 1), CAST(1.0 AS DOUBLE),
               (a, x) -> a * x.factor)"""), 6).as("survival"))
        .orderBy($"t")
    }),

    // Sequential-pattern support (PrefixSpan's first level): for every
    // ordered event-type pair (a → b), how many users exhibit SOME
    // a-occurrence before SOME b-occurrence — the "what follows what"
    // read behind next-action models, one level deeper than q40's
    // ADJACENT transitions. The trick that keeps it linear: "∃ a
    // before b" ⟺ min_ts(a) < max_ts(b), so the whole corpus reduces
    // to the (user, type, min_ts, max_ts) frame (users × |types|,
    // domain-bounded) and the pair expansion is a user-keyed
    // self-join of that frame — never a raw-event join.
    "q121_seq_support" -> ((s, d) => {
      import s.implicits._
      val spans = Tables.load(s, d, "events")
        .groupBy($"user_id", $"event_type")
        .agg(min($"ts").as("mn"), max($"ts").as("mx"))
        // feeds both sides of the user-keyed pair join
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val nUsers = spans.select($"user_id").distinct()
        .agg(count(lit(1)).as("n_users"))
      spans.select($"user_id", $"event_type".as("a"), $"mn")
        .join(spans.select($"user_id", $"event_type".as("b"), $"mx"),
          Seq("user_id"))
        .filter($"a" =!= $"b" && $"mn" < $"mx")
        .groupBy($"a", $"b").agg(count(lit(1)).as("n_support"))
        .crossJoin(broadcast(nUsers))
        .select($"a", $"b", $"n_support",
          round($"n_support".cast("double") /
            $"n_users".cast("double"), 4).as("support"))
        .orderBy($"a", $"b")
    }),

    // Growth accounting with resurrection: each active (user, day) is
    // NEW (first day), RETURNING (previous activity ≤ 7 days back) or
    // RESURRECTED (gap > 7 days) — the decomposition growth teams
    // read daily (q95's new/returning plus the churn-recovery class).
    // One per-user lag window over the distinct-activity table
    // (user·day-sized, ≪ events; high-cardinality partitions — they
    // scale), then a days-bounded rollup.
    "q122_resurrected" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"day")
      Tables.load(s, d, "events")
        .select($"user_id", to_date($"ts").as("day")).distinct()
        .withColumn("prev", lag($"day", 1).over(w))
        .select($"day",
          when($"prev".isNull, lit("new"))
            .when(datediff($"day", $"prev") <= 7, lit("returning"))
            .otherwise(lit("resurrected")).as("cls"))
        .groupBy($"day")
        .agg(count(lit(1)).as("n_active"),
          sum(when($"cls" === "new", 1L).otherwise(0L)).as("n_new"),
          sum(when($"cls" === "returning", 1L).otherwise(0L))
            .as("n_returning"),
          sum(when($"cls" === "resurrected", 1L).otherwise(0L))
            .as("n_resurrected"))
        .select($"day".cast("timestamp").as("day"), $"n_active",
          $"n_new", $"n_returning", $"n_resurrected")
        .orderBy($"day")
    }),

    // Two-proportion z-test — the A/B-test readout (the most-run
    // statistical test in industry): does the treatment group convert
    // differently. Groups are planted deterministically (user_id
    // parity), conversion = user emitted ≥1 purchase event; the z
    // statistic assembles the four exact counts in one fixed IEEE
    // expression (q100 discipline), round(4). Everything reduces to
    // a user-level boolean in one map-side combine.
    "q123_ab_ztest" -> ((s, d) => {
      import s.implicits._
      // "conversion" = a heavy purchaser (≥ 15 purchase events): the
      // all-users-purchase degenerate pool (p̂ = 1 → zero variance →
      // ANSI divide-by-zero) is exactly why the guard below exists —
      // a real A/B readout must survive degenerate groups
      val users = Tables.load(s, d, "events")
        .groupBy($"user_id")
        .agg(sum(when($"event_type" === "purchase", 1L).otherwise(0L))
          .as("n_purch"))
        .select(($"user_id" % 2 === 0).as("grp_a"),
          when($"n_purch" >= 15, 1L).otherwise(0L).as("conv"))
      users.agg(
          sum(when($"grp_a", 1L).otherwise(0L)).as("n_a"),
          sum(when($"grp_a", $"conv").otherwise(0L)).as("conv_a"),
          sum(when(!$"grp_a", 1L).otherwise(0L)).as("n_b"),
          sum(when(!$"grp_a", $"conv").otherwise(0L)).as("conv_b"))
        .select($"n_a", $"conv_a", $"n_b", $"conv_b",
          round($"conv_a".cast("double") / $"n_a".cast("double"), 6)
            .as("p_a"),
          round($"conv_b".cast("double") / $"n_b".cast("double"), 6)
            .as("p_b"),
          when($"conv_a" + $"conv_b" > 0 &&
               $"conv_a" + $"conv_b" < $"n_a" + $"n_b",
            round(
              ($"conv_a".cast("double") / $"n_a".cast("double") -
               $"conv_b".cast("double") / $"n_b".cast("double")) /
              sqrt(
                (($"conv_a" + $"conv_b").cast("double") /
                  ($"n_a" + $"n_b").cast("double")) *
                (lit(1.0) - ($"conv_a" + $"conv_b").cast("double") /
                  ($"n_a" + $"n_b").cast("double")) *
                (lit(1.0) / $"n_a".cast("double") +
                 lit(1.0) / $"n_b".cast("double"))), 4))
            .as("z_stat"))
    }),

    // Out-of-order-arrival audit: how late do events arrive relative
    // to their arrival order (event_id as the arrival proxy) — THE
    // number that sizes `withWatermark` before a streaming job ships:
    // the watermark delay must cover the observed lateness tail or
    // the state store drops data. Per-user running event-time max
    // over arrival order (high-cardinality partitions — they scale),
    // lateness = running_max − ts in exact µs, then one global
    // rollup: late share, max and mean lateness.
    "q124_out_of_order_audit" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      Tables.load(s, d, "events")
        .select($"user_id", $"event_id",
          unix_micros($"ts").as("us"))
        .withColumn("hwm", max($"us").over(w))
        .select(
          when($"hwm".isNotNull && $"us" < $"hwm", $"hwm" - $"us")
            .otherwise(lit(0L)).as("late_us"))
        .agg(count(lit(1)).as("n_events"),
          sum(when($"late_us" > 0, 1L).otherwise(0L)).as("n_late"),
          max($"late_us").as("max_late_us"),
          sum($"late_us").as("sum_late_us"))
        .select($"n_events", $"n_late", $"max_late_us",
          expr("sum_late_us div greatest(n_late, 1)")
            .as("mean_late_us"),
          round($"n_late".cast("double") / $"n_events".cast("double"),
            6).as("late_share"))
    }),

    // Two-sample Kolmogorov–Smirnov: D = sup |F₁ − F₂| between
    // urgent- and low-priority order-value distributions — the
    // distribution-level A/B test q123's proportion z can't see
    // (same conversion rate, different shape). Step CDFs change only
    // at support points, so the sup is attained on the distinct-value
    // table: cumulative counts ride PrefixSum's distributed scan
    // (value-domain table, never a row sort), and the maximization
    // runs on |c₁·n₂ − c₂·n₁| — EXACT LONGS, so the argmax (with
    // min-value tie-break) never touches a float; D itself is one
    // IEEE divide at display.
    "q125_two_sample_ks" -> ((s, d) => {
      import s.implicits._
      val o = Tables.load(s, d, "orders")
        .filter($"o_orderpriority".isin("1-URGENT", "5-LOW"))
        .select(round($"o_totalprice" * 100).cast("long").as("cents"),
          ($"o_orderpriority" === "1-URGENT").as("isa"))
      val ns = o.agg(sum(when($"isa", 1L).otherwise(0L)).as("n1"),
        sum(when(!$"isa", 1L).otherwise(0L)).as("n2"))
      // the statistic TELESCOPES: c₁·n₂ − c₂·n₁ at value v is the
      // running sum of per-value k₁·n₂ − k₂·n₁ — so ONE PrefixSum
      // pass carries the whole thing (the two-cumulative first cut
      // paid the range shuffle twice: 5.4 → 2.9 s)
      val byVal = o.groupBy($"cents")
        .agg(sum(when($"isa", 1L).otherwise(0L)).as("k1"),
          sum(when(!$"isa", 1L).otherwise(0L)).as("k2"))
        .crossJoin(broadcast(ns))
        .select($"cents", ($"k1" * $"n2" - $"k2" * $"n1").as("v"),
          $"n1", $"n2")
      val diffs = graft.ops.PrefixSum.runningTotal(byVal,
          Seq($"cents"), $"v", "cumv")
        .select($"cents", abs($"cumv").as("dnum"), $"n1", $"n2")
        // feeds the max AND the argmax join
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val mx = diffs.agg(max($"dnum").as("d_num"))
      diffs.join(broadcast(mx), $"dnum" === $"d_num")
        .groupBy($"d_num")
        .agg(max($"n1").as("n1"), max($"n2").as("n2"),
          min($"cents").as("at_cents"))
        .select($"n1", $"n2", $"d_num", $"at_cents",
          round($"d_num".cast("double") /
            ($"n1".cast("double") * $"n2".cast("double")), 6)
            .as("ks_d"))
    }),

    // Spearman rank correlation between customer spend and order
    // count — the monotone-association companion of q43's Pearson
    // (outlier-robust, the curve need not be linear). Average ranks
    // under ties carried as EXACT ×2-scaled integers
    // (avg2 = 2·cum − cnt + 1 off the distinct-value cumulative —
    // PrefixSum's distributed scan, never a global row_number), then
    // q43's fixed IEEE moment assembly on the scaled ranks (the ×2
    // cancels in ρ). At corpus scale the rank³-order moments take the
    // q25 decimal escalation — documented.
    "q126_spearman" -> ((s, d) => {
      import s.implicits._
      val cust = Tables.load(s, d, "orders")
        .groupBy($"o_custkey")
        .agg(sum(round($"o_totalprice" * 100).cast("long")).as("x"),
          count(lit(1)).as("y"))
        // feeds both rank joins
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      def ranks2(c: String, out: String) = {
        val byVal = cust.groupBy(col(c).as("v"))
          .agg(count(lit(1)).as("cnt"))
        graft.ops.PrefixSum.runningTotal(byVal, Seq(col("v")),
          col("cnt"), "cum")
          .select(col("v").as(c),
            (lit(2L) * col("cum") - col("cnt") + 1L).as(out))
      }
      spearmanFromScaledRanks(cust.join(ranks2("x", "rx"), Seq("x"))
        .join(ranks2("y", "ry"), Seq("y")))
    }),

    // Additive seasonal decomposition (STL-lite) of daily event value
    // per type: value = trend (7-day centered moving average) +
    // weekday seasonal (day-of-week mean deviation from the grand
    // mean) + residual — the decomposition behind q94's baseline and
    // q33's anomaly gate, made explicit so the residual IS the
    // deseasonalized anomaly signal. Everything stays in exact
    // integers: every "mean" is a floor div of exact long sums
    // (documented semantics), the MA window is a ±3-ROW frame on the
    // domain-bounded (type, day) table, and the dow means broadcast
    // back as an enum-sized join.
    "q127_seasonal_decompose" -> ((s, d) => {
      import s.implicits._
      val daily = Tables.load(s, d, "events")
        .select($"event_type", to_date($"ts").as("day"),
          round($"value" * 100).cast("long").as("cents"))
        .groupBy($"event_type", $"day").agg(sum($"cents").as("v"))
        // feeds the grand mean, dow means, and the MA window
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val grand = daily.groupBy($"event_type")
        .agg(expr("sum(v) div count(1)").as("gmean"))
      val dow = daily
        .select($"event_type", dayofweek($"day").cast("long").as("w"),
          $"v")
        .groupBy($"event_type", $"w")
        .agg(expr("sum(v) div count(1)").as("wmean"))
      daily
        .withColumn("trend",
          expr("sum(v) OVER (PARTITION BY event_type ORDER BY day " +
            "ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) div " +
            "count(1) OVER (PARTITION BY event_type ORDER BY day " +
            "ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)"))
        .withColumn("w", dayofweek($"day").cast("long"))
        .join(broadcast(dow), Seq("event_type", "w"))
        .join(broadcast(grand), Seq("event_type"))
        .select($"event_type", $"day".cast("timestamp").as("day"),
          $"v".as("cents"), $"trend",
          ($"wmean" - $"gmean").as("seasonal"),
          ($"v" - $"trend" - ($"wmean" - $"gmean")).as("residual"))
        .orderBy($"event_type", $"day")
    }),

    // Bounce-rate by landing action: of the 30-minute gap sessions
    // (q15's sessionization made session-grained), how many end after
    // a single event, split by the session's FIRST event type — the
    // engagement read behind every landing-page report. Session ids
    // are (user, running new-session count) off one per-user window
    // pass (high-cardinality partitions); the rest is two
    // enum-bounded aggregates. Exact counts, one display divide.
    "q128_bounce_rate" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val sess = Tables.load(s, d, "events")
        .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(w))
        .withColumn("new_sess",
          when($"prev_us".isNull ||
            unix_micros($"ts") - $"prev_us" > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .withColumn("sess_id", sum($"new_sess").over(
          Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
            .rowsBetween(Window.unboundedPreceding, 0)))
      sess.groupBy($"user_id", $"sess_id")
        .agg(count(lit(1)).as("n_events"),
          min(struct($"ts", $"event_id", $"event_type")).as("first"))
        .select($"first.event_type".as("landing"), $"n_events")
        .groupBy($"landing")
        .agg(count(lit(1)).as("n_sessions"),
          sum(when($"n_events" === 1L, 1L).otherwise(0L))
            .as("n_bounce"),
          sum($"n_events").as("n_events"))
        .select($"landing", $"n_sessions", $"n_bounce", $"n_events",
          round($"n_bounce".cast("double") /
            $"n_sessions".cast("double"), 6).as("bounce_rate"))
        .orderBy($"landing")
    }),

    // Contingency effect sizes: q92's chi-square carried through to
    // the numbers that are actually comparable across tables —
    // Cramér's V (chi²/(n·(min(r,c)−1)), the standardized [0,1]
    // association strength), φ, and Pearson's contingency
    // coefficient. "Significant" at 100 TB is meaningless (any
    // association is significant at n = 10¹¹); the EFFECT SIZE is
    // the decision number, which is why this is its own operator.
    // chi² replays q92's decimal-exact sorted fold; the effect sizes
    // are fixed IEEE expressions of (raw chi², n), round(4).
    "q130_effect_sizes" -> ((s, d) => {
      import s.implicits._
      val cells = Tables.load(s, d, "events")
        .select($"event_type", dayofweek(to_date($"ts")).cast("long")
          .as("dow"))
        .groupBy($"event_type", $"dow").agg(count(lit(1)).as("obs"))
      val wr = Window.partitionBy($"event_type")
      val wc = Window.partitionBy($"dow")
      cells
        .withColumn("row_n", sum($"obs").over(wr))
        .withColumn("col_n", sum($"obs").over(wc))
        .groupBy()
        .agg(sum($"obs").as("n"),
          countDistinct($"event_type").as("n_types"),
          countDistinct($"dow").as("n_dows"),
          sort_array(collect_list(struct($"event_type", $"dow",
            $"obs", $"row_n", $"col_n"))).as("cs"))
        .withColumn("chi2_raw", expr(
          """aggregate(cs, cast(0.0 as double), (acc, c) ->
             acc + cast(cast(n as decimal(38,0)) * c.obs
                        - cast(c.row_n as decimal(38,0)) * c.col_n
                        as double)
                 * cast(cast(n as decimal(38,0)) * c.obs
                        - cast(c.row_n as decimal(38,0)) * c.col_n
                        as double)
                 / (cast(n as double) * c.row_n * c.col_n))"""))
        .select($"n", $"n_types", $"n_dows",
          round($"chi2_raw", 4).as("chi2"),
          round(sqrt($"chi2_raw" / ($"n".cast("double") *
            (least($"n_types", $"n_dows") - 1).cast("double"))), 4)
            .as("cramers_v"),
          round(sqrt($"chi2_raw" / $"n".cast("double")), 4).as("phi"),
          round(sqrt($"chi2_raw" / ($"chi2_raw" +
            $"n".cast("double"))), 4).as("contingency_c"))
    }),

    // Lagged autocorrelation (ACF, lags 1–7) of daily value per event
    // type — "how much does today predict tomorrow / next week": the
    // memory-length read that picks q94's seasonal lag and sizes
    // q127's MA window. Defined as the lagged-pair Pearson (both
    // endpoints must exist — no imputation), computed per (type, lag)
    // from exact long moments with the q43 fixed-IEEE assembly. The
    // lag join runs on the domain-bounded daily table (|types| ×
    // span), never on events.
    "q132_acf" -> ((s, d) => {
      import s.implicits._
      val daily = Tables.load(s, d, "events")
        .select($"event_type", to_date($"ts").as("day"),
          round($"value" * 100).cast("long").as("cents"))
        .groupBy($"event_type", $"day").agg(sum($"cents").as("v"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val lags = daily.select($"event_type", $"day", $"v".as("v1"),
          explode(sequence(lit(1), lit(7))).as("lag"))
        .withColumn("day2", date_add($"day", $"lag"))
      lags.join(daily.select($"event_type", $"day".as("day2"),
          $"v".as("v2")), Seq("event_type", "day2"))
        .groupBy($"event_type", $"lag".cast("long").as("lag"))
        .agg(count(lit(1)).as("n"), sum($"v1").as("sx"),
          sum($"v2").as("sy"), sum($"v1" * $"v1").as("sxx"),
          sum($"v2" * $"v2").as("syy"), sum($"v1" * $"v2").as("sxy"))
        .select($"event_type", $"lag", $"n",
          Tables.nz(round(
            ($"n".cast("double") * $"sxy".cast("double") -
             $"sx".cast("double") * $"sy".cast("double")) /
            (sqrt($"n".cast("double") * $"sxx".cast("double") -
               $"sx".cast("double") * $"sx".cast("double")) *
             sqrt($"n".cast("double") * $"syy".cast("double") -
               $"sy".cast("double") * $"sy".cast("double"))), 4))
            .as("acf"))
        .orderBy($"event_type", $"lag")
    }),

    // Spend-segment migration matrix: customers terciled by spend in
    // each half of the date span, transitions counted (with segment 0
    // = inactive that period) — q83's RFM made LONGITUDINAL: "are
    // high-value customers churning or are low-value ones upgrading"
    // is a question about the OFF-DIAGONAL mass, invisible to any
    // single-period segmentation. Per-period ranks ride PrefixSum's
    // global (period, spend) scan minus a 2-row period-offset
    // broadcast (q79's discipline — a window partitioned by period
    // would put half the corpus in one task); terciles are exact
    // integer arithmetic; the matrix is ≤ 4×4.
    "q133_rfm_migration" -> ((s, d) => {
      import s.implicits._
      val o = Tables.load(s, d, "orders")
        .select($"o_custkey", to_date($"o_orderdate").as("day"),
          round($"o_totalprice" * 100).cast("long").as("cents"))
      val bounds = o.agg(min($"day").as("d0"), max($"day").as("d1"))
      val per = o.crossJoin(broadcast(bounds))
        .select($"o_custkey",
          when(datediff($"day", $"d0") * 2 < datediff($"d1", $"d0"),
            1L).otherwise(2L).as("period"), $"cents")
        .groupBy($"period", $"o_custkey")
        .agg(sum($"cents").as("spend"))
        // feeds the rank scan AND the per-period counts
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val ranked = graft.ops.PrefixSum.runningTotal(
        per.withColumn("one", lit(1L)),
        Seq($"period", $"spend".desc, $"o_custkey"), $"one", "grn")
      val w2 = Window.orderBy($"period")
        .rowsBetween(Window.unboundedPreceding, -1)
      val offs = per.groupBy($"period").agg(count(lit(1)).as("n_p"))
        // 2 rows — the global window is constant-sized
        .withColumn("off", coalesce(sum($"n_p").over(w2), lit(0L)))
      val seg = ranked.join(broadcast(offs), Seq("period"))
        .select($"period", $"o_custkey",
          expr("(grn - off - 1) * 3 div n_p + 1").as("seg"))
      seg.filter($"period" === 1)
        .select($"o_custkey", $"seg".as("s1"))
        .join(seg.filter($"period" === 2)
          .select($"o_custkey", $"seg".as("s2")),
          Seq("o_custkey"), "full_outer")
        .select(coalesce($"s1", lit(0L)).as("seg_p1"),
          coalesce($"s2", lit(0L)).as("seg_p2"))
        .groupBy($"seg_p1", $"seg_p2")
        .agg(count(lit(1)).as("n_customers"))
        .orderBy($"seg_p1", $"seg_p2")
    }),

    // Wilson score interval (95%) for the repeat-buyer share per
    // market segment — the CORRECT small-n proportion CI (the naive
    // Wald interval collapses to zero width at p̂∈{0,1} and escapes
    // [0,1]; Wilson does neither), the error bar that belongs on
    // every q123-style rate before anyone acts on it. Exact (n, k)
    // counts per segment; the interval is one fixed IEEE assembly of
    // those two longs with z = 1.96 (shared literal), round(6).
    "q134_wilson_ci" -> ((s, d) => {
      import s.implicits._
      val z = lit(1.96)
      val counts = Tables.load(s, d, "orders")
        .groupBy($"o_custkey").agg(count(lit(1)).as("n_orders"))
        .join(Tables.load(s, d, "customer")
          .select($"c_custkey", $"c_mktsegment"),
          $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n"),
          sum(when($"n_orders" >= 15, 1L).otherwise(0L)).as("k"))
      val nD = $"n".cast("double")
      val p = $"k".cast("double") / nD
      val z2 = z * z
      val denom = lit(1.0) + z2 / nD
      val center = (p + z2 / (lit(2.0) * nD)) / denom
      val half = z * sqrt(p * (lit(1.0) - p) / nD +
        z2 / (lit(4.0) * nD * nD)) / denom
      counts.select($"c_mktsegment", $"n", $"k",
        round(p, 6).as("p_hat"),
        round(center - half, 6).as("ci_lo"),
        round(center + half, 6).as("ci_hi"))
        .orderBy($"c_mktsegment")
    }),

    // Difference-in-differences: the causal-inference workhorse —
    // (treat_post − treat_pre) − (control_post − control_pre) strips
    // both the group baseline and the common time trend from an
    // effect estimate, which is why it, not the raw post-period gap,
    // is the number experiments without randomized assignment report.
    // Cells: planted treatment (user parity) × date halves; per-cell
    // exact (Σcents, n) in one map-side combine; the four means and
    // the DiD are one fixed IEEE assembly, round(4).
    "q135_diff_in_diff" -> ((s, d) => {
      import s.implicits._
      val e = Tables.load(s, d, "events")
        .select($"user_id", to_date($"ts").as("day"),
          round($"value" * 100).cast("long").as("cents"))
      val bounds = e.agg(min($"day").as("d0"), max($"day").as("d1"))
      val cells = e.crossJoin(broadcast(bounds))
        .select(($"user_id" % 2 === 0).as("treat"),
          (datediff($"day", $"d0") * 2 >= datediff($"d1", $"d0"))
            .as("post"), $"cents")
        .groupBy($"treat", $"post")
        .agg(count(lit(1)).as("n"), sum($"cents").as("s"))
      def cell(t: Boolean, p: Boolean, c: String) =
        max(when($"treat" === t && $"post" === p, col(c))).as(s"${c}_${
          if (t) "t" else "c"}${if (p) "2" else "1"}")
      val one = cells.agg(
        cell(true, false, "n"), cell(true, false, "s"),
        cell(true, true, "n"), cell(true, true, "s"),
        cell(false, false, "n"), cell(false, false, "s"),
        cell(false, true, "n"), cell(false, true, "s"))
      def m(s0: String, n0: String) =
        col(s0).cast("double") / col(n0).cast("double")
      one.select($"n_t1", $"n_t2", $"n_c1", $"n_c2",
        round(m("s_t1", "n_t1"), 4).as("mean_treat_pre"),
        round(m("s_t2", "n_t2"), 4).as("mean_treat_post"),
        round(m("s_c1", "n_c1"), 4).as("mean_ctrl_pre"),
        round(m("s_c2", "n_c2"), 4).as("mean_ctrl_post"),
        round((m("s_t2", "n_t2") - m("s_t1", "n_t1")) -
          (m("s_c2", "n_c2") - m("s_c1", "n_c1")), 4).as("did_cents"))
    }),

    // Retention half-life: pooled weekly retention (active users at
    // offset w / users OBSERVABLE at offset w — right-censoring
    // handled like q120) fit to exp decay, half-life = −ln2/slope —
    // q38's retention triangle compressed to the single number a
    // growth model consumes. At-risk counts are a cumulative over
    // the weeks-bounded cohort table; the OLS runs over the
    // offset-sorted rate array (zipf/heaps fold discipline); offset 0
    // (rate ≡ 1 by construction) is excluded from the fit.
    "q136_retention_halflife" -> ((s, d) => {
      import s.implicits._
      val act0 = Tables.load(s, d, "events")
        .select($"user_id", to_date($"ts").as("day"))
      val d0row = act0.agg(min($"day").as("d0"))
      val act = act0.crossJoin(broadcast(d0row))
        .select($"user_id",
          expr("CAST(datediff(day, d0) div 7 AS BIGINT)").as("week"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val fw = act.groupBy($"user_id").agg(min($"week").as("fw"))
      val maxW = act.agg(max($"week").as("maxw"))
      val active = act.join(fw, Seq("user_id"))
        .select(($"week" - $"fw").as("offset"), $"user_id").distinct()
        .groupBy($"offset").agg(count(lit(1)).as("n_active"))
      val cohorts = fw.groupBy($"fw").agg(count(lit(1)).as("c"))
      // at-risk at offset w = users with fw <= maxw - w, for EVERY
      // offset 0..maxw: offset spine × cohort table, both
      // weeks-bounded (a cumulative keyed only on existing cohort
      // weeks misses offsets between them — the first cut's bug when
      // every user lands in cohort week 0)
      val spine = maxW
        .select(explode(sequence(lit(0L), $"maxw")).as("offset"),
          $"maxw")
      val cum = spine.crossJoin(broadcast(cohorts))
        .filter($"fw" <= $"maxw" - $"offset")
        .groupBy($"offset").agg(sum($"c").as("n_at_risk"))
      val curve = active.join(cum, Seq("offset"))
        .select($"offset", $"n_at_risk", $"n_active",
          ($"n_active".cast("double") / $"n_at_risk".cast("double"))
            .as("rate"))
      def fold(term: String): String =
        s"aggregate(filter(arr, p -> p.offset >= 1), " +
          s"CAST(0.0 AS DOUBLE), (a, p) -> a + $term)"
      curve
        .agg(sort_array(collect_list(struct($"offset", $"n_at_risk",
          $"n_active", $"rate"))).as("arr"))
        .withColumn("k", expr(
          "CAST(size(filter(arr, p -> p.offset >= 1)) AS DOUBLE)"))
        .withColumn("sx", expr(fold("CAST(p.offset AS DOUBLE)")))
        .withColumn("sy", expr(fold("ln(p.rate)")))
        .withColumn("sxy", expr(fold(
          "CAST(p.offset AS DOUBLE) * ln(p.rate)")))
        .withColumn("sxx", expr(fold(
          "CAST(p.offset AS DOUBLE) * CAST(p.offset AS DOUBLE)")))
        .withColumn("slope",
          ($"k" * $"sxy" - $"sx" * $"sy") /
            ($"k" * $"sxx" - $"sx" * $"sx"))
        .select(explode($"arr").as("r"),
          round($"slope", 4).as("decay_slope"),
          round(when($"slope" < 0, -log(lit(2.0)) / $"slope"), 4)
            .as("halflife_weeks"))
        .select($"r.offset".as("offset"),
          $"r.n_at_risk".as("n_at_risk"),
          $"r.n_active".as("n_active"), round($"r.rate", 6).as("rate"),
          $"decay_slope", $"halflife_weeks")
        .orderBy($"offset")
    }),

    // Inter-purchase burstiness (Goh–Barabási B = (σ−μ)/(σ+μ)) of
    // order gaps per market segment: B → −1 is clockwork repurchase,
    // 0 is Poisson, → 1 is bursty binge-and-lapse — the temporal
    // texture behind q97's median cycle. Gaps from one per-customer
    // lag window (high-cardinality — scales); per-segment exact
    // moments; σ and B are one fixed IEEE assembly, round(4).
    "q137_interval_burstiness" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"day", $"o_orderkey")
      val gaps = Tables.load(s, d, "orders")
        .select($"o_custkey", $"o_orderkey",
          to_date($"o_orderdate").as("day"))
        .withColumn("prev", lag($"day", 1).over(w))
        .filter($"prev".isNotNull)
        .select($"o_custkey",
          datediff($"day", $"prev").cast("long").as("g"))
      gaps
        .join(Tables.load(s, d, "customer")
          .select($"c_custkey", $"c_mktsegment"),
          $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n"), sum($"g").as("sg"),
          sum($"g" * $"g").as("sgg"))
        .select($"c_mktsegment", $"n",
          round($"sg".cast("double") / $"n".cast("double"), 4)
            .as("mean_gap_days"),
          round(
            (sqrt(($"n".cast("double") * $"sgg".cast("double") -
               $"sg".cast("double") * $"sg".cast("double")) /
              ($"n".cast("double") * $"n".cast("double"))) -
             $"sg".cast("double") / $"n".cast("double")) /
            (sqrt(($"n".cast("double") * $"sgg".cast("double") -
               $"sg".cast("double") * $"sg".cast("double")) /
              ($"n".cast("double") * $"n".cast("double"))) +
             $"sg".cast("double") / $"n".cast("double")), 4)
            .as("burstiness"))
        .orderBy($"c_mktsegment")
    }),

    // Attribution-window sweep: click→purchase conversion coverage as
    // a function of the window length (1h, 6h, 1d, 3d, 7d) — the
    // POLICY read behind q37/q48's fixed-window attribution: where
    // the coverage curve flattens is where the window should end
    // (longer buys noise, not signal). One per-user carry-forward
    // running max (last click time) over the event stream, then each
    // purchase's click-lag explodes against the ENUM of window
    // lengths — never a time-range join. Exact micros; rates are
    // single display divides.
    "q139_attribution_window_sweep" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id")
        .orderBy($"us", $"event_id")
        .rowsBetween(Window.unboundedPreceding, -1)
      val lags = Tables.load(s, d, "events")
        .select($"user_id", $"event_id", $"event_type",
          unix_micros($"ts").as("us"))
        .withColumn("last_click",
          max(when($"event_type" === "click", $"us")).over(w))
        .filter($"event_type" === "purchase")
        .select(($"us" - $"last_click").as("lag_us"))
      val windows = Seq(("1h", 3600L), ("2_6h", 21600L),
        ("3_1d", 86400L), ("4_3d", 259200L), ("5_7d", 604800L))
      val wEnum = windows.map { case (n0, secs) =>
        struct(lit(n0).as("win"), lit(secs * 1000000L).as("w_us"))
      }
      lags.select($"lag_us",
          explode(array(wEnum: _*)).as("w"))
        .groupBy($"w.win".as("window"))
        .agg(count(lit(1)).as("n_purchases"),
          sum(when($"lag_us".isNotNull && $"lag_us" <= $"w.w_us", 1L)
            .otherwise(0L)).as("n_attributed"))
        .select($"window", $"n_purchases", $"n_attributed",
          round($"n_attributed".cast("double") /
            $"n_purchases".cast("double"), 6).as("coverage"))
        .orderBy($"window")
    }),

  )

  /** q126's moment pass + ρ assembly, factored so MomentWidthSpec
    * can drive it with ×2-scaled ranks past the 64-bit sum ceiling.
    * Input: one row per customer with long columns (rx, ry) — the
    * tie-averaged ranks ×2. Moments in decimal(38,0) (q25/q118
    * discipline, applied per the r9 advice instead of just
    * documented): Σrank² ≈ 4n³ overflows BIGINT past n ≈ 1.3e6
    * customers — corpus scale, not edge case. Products form in long
    * (safe to n ~ 1.5e9, the decimal bound documented at q92), sums
    * accumulate exactly in decimal; the final assembly casts to
    * double once. The ×2 scaling cancels in ρ.
    */
  private[queries] def spearmanFromScaledRanks(
      ranked: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val s = ranked.sparkSession
    import s.implicits._
    val dec = "decimal(38,0)"
    ranked
      .agg(count(lit(1)).as("n"),
        sum($"rx".cast(dec)).as("sx"),
        sum($"ry".cast(dec)).as("sy"),
        sum(($"rx" * $"rx").cast(dec)).as("sxx"),
        sum(($"ry" * $"ry").cast(dec)).as("syy"),
        sum(($"rx" * $"ry").cast(dec)).as("sxy"))
      .select($"n".as("n_cust"),
        Tables.nz(round(
          ($"n".cast("double") * $"sxy".cast("double") -
           $"sx".cast("double") * $"sy".cast("double")) /
          (sqrt($"n".cast("double") * $"sxx".cast("double") -
             $"sx".cast("double") * $"sx".cast("double")) *
           sqrt($"n".cast("double") * $"syy".cast("double") -
             $"sy".cast("double") * $"sy".cast("double"))), 4))
          .as("spearman_rho"))
  }

  /** One UNION ALL arm of the q112 oracle — the count-of-counts
    * cumulative formulation replayed per key column.
    */
  private def skewProfSql(table: String, col: String,
      label: String): String =
    s"""SELECT '$label' AS key_name, n_rows, n_keys, med_freq,
           p99_freq, max_freq,
           round(CAST(max_freq AS DOUBLE) / CAST(n_rows AS DOUBLE), 6)
             AS top_share,
           round(CAST(max_freq AS DOUBLE) / CAST(med_freq AS DOUBLE), 4)
             AS skew_ratio
         FROM (
           SELECT CAST(max(n_rows) AS BIGINT) AS n_rows,
             CAST(max(n_keys) AS BIGINT) AS n_keys,
             CAST(min(CASE WHEN cumk * 2 >= n_keys THEN f END)
               AS BIGINT) AS med_freq,
             CAST(min(CASE WHEN cumk * 100 >= n_keys * 99 THEN f END)
               AS BIGINT) AS p99_freq,
             CAST(max(max_f) AS BIGINT) AS max_freq
           FROM (
             SELECT f, sum(nk) OVER (ORDER BY f) AS cumk,
               sum(f * nk) OVER () AS n_rows,
               sum(nk) OVER () AS n_keys,
               max(f) OVER () AS max_f
             FROM (
               SELECT f, count(*) AS nk FROM (
                 SELECT $col, count(*) AS f FROM $table GROUP BY 1)
               GROUP BY 1)))"""

  def oracles: Map[String, String] = Map(

    "q110_trend_mk" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS v
           FROM events GROUP BY 1, 2),
         n AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
           FROM daily GROUP BY 1),
         p AS (
           SELECT a.event_type,
             CASE WHEN b.v > a.v THEN 1
                  WHEN b.v < a.v THEN -1 ELSE 0 END AS sg
           FROM daily a JOIN daily b
             ON a.event_type = b.event_type AND a.day < b.day)
         SELECT n.event_type, n.n_days,
           CAST(count(*) AS BIGINT) AS n_pairs,
           CAST(sum(sg) AS BIGINT) AS s_stat,
           round(CAST(sum(sg) AS DOUBLE) / CAST(count(*) AS DOUBLE), 4)
             + 0.0 AS tau
         FROM p JOIN n ON n.event_type = p.event_type
         GROUP BY n.event_type, n.n_days ORDER BY n.event_type""",

    // Independent formulation: the range join DuckDB can afford at
    // oracle scale (the Spark side uses the linear explode-cover).
    "q111_rolling_dau" ->
      """WITH act AS (
           SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
           FROM events),
         span AS (SELECT min(day) AS d0, max(day) AS d1 FROM act),
         days AS (
           SELECT CAST(unnest(generate_series(CAST(d0 AS TIMESTAMP),
             CAST(d1 AS TIMESTAMP), INTERVAL 1 DAY)) AS DATE) AS day
           FROM span),
         d1c AS (SELECT day, count(*) AS c FROM act GROUP BY 1)
         SELECT CAST(dd.day AS TIMESTAMP) AS day,
           CAST(coalesce(max(d1c.c), 0) AS BIGINT) AS dau,
           CAST(count(DISTINCT a.user_id) AS BIGINT) AS dau7
         FROM days dd
         LEFT JOIN act a
           ON a.day BETWEEN dd.day - 6 AND dd.day
         LEFT JOIN d1c ON d1c.day = dd.day
         GROUP BY dd.day ORDER BY day""",

    "q112_skew_profile" -> Seq(
      skewProfSql("lineitem", "l_partkey", "lineitem.l_partkey"),
      skewProfSql("lineitem", "l_suppkey", "lineitem.l_suppkey"),
      skewProfSql("orders", "o_custkey", "orders.o_custkey"),
      skewProfSql("events", "user_id", "events.user_id"),
      skewProfSql("events", "event_type", "events.event_type"))
      .mkString("", "\nUNION ALL\n", "\nORDER BY key_name"),

    "q113_streaks" ->
      """WITH act AS (
           SELECT DISTINCT user_id,
             CAST(CAST(ts AS DATE) - DATE '1970-01-01' AS BIGINT)
               AS di
           FROM events),
         g AS (
           SELECT user_id, di,
             di - row_number() OVER (PARTITION BY user_id
                                     ORDER BY di) AS grp
           FROM act),
         runs AS (
           SELECT user_id, grp, CAST(count(*) AS BIGINT) AS len
           FROM g GROUP BY 1, 2)
         SELECT user_id, CAST(sum(len) AS BIGINT) AS n_active_days,
           CAST(count(*) AS BIGINT) AS n_streaks,
           CAST(max(len) AS BIGINT) AS max_streak
         FROM runs GROUP BY user_id ORDER BY user_id""",

    // The recursion replayed as a RECURSIVE CTE stepping through the
    // day-indexed series (bounded: |types| x span days). NOT a
    // list_reduce struct fold: DuckDB v1.0.0's list_reduce MUTATES a
    // struct accumulator field-by-field -- from the second merge on,
    // the 't' expression sees the already-updated 'l' (verified with
    // a direct single-merge comparison) -- so a two-state fold cannot
    // be replayed with it. The CTE's per-step arithmetic is the
    // verbatim Spark lambda, same IEEE sequence.
    "q114_holt_forecast" ->
      """WITH RECURSIVE daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS v
           FROM events GROUP BY 1, 2),
         r AS (
           SELECT event_type, CAST(v AS DOUBLE) AS v,
             row_number() OVER (PARTITION BY event_type
                                ORDER BY day) AS rn
           FROM daily),
         n AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_days
           FROM daily GROUP BY 1),
         h AS (
           SELECT event_type, 1 AS step, v AS l,
             CAST(0.0 AS DOUBLE) AS t
           FROM r WHERE rn = 1
           UNION ALL
           SELECT h.event_type, h.step + 1,
             CAST(0.2 AS DOUBLE) * r.v
               + CAST(0.8 AS DOUBLE) * (h.l + h.t),
             CAST(0.3 AS DOUBLE) *
               ((CAST(0.2 AS DOUBLE) * r.v
                 + CAST(0.8 AS DOUBLE) * (h.l + h.t)) - h.l)
               + CAST(0.7 AS DOUBLE) * h.t
           FROM h JOIN r ON r.event_type = h.event_type
                        AND r.rn = h.step + 1)
         SELECT n.event_type, n.n_days,
           round(h.l, 4) AS level, round(h.t, 4) AS trend,
           round(h.l + h.t, 4) AS forecast_next
         FROM h JOIN n ON n.event_type = h.event_type
         WHERE h.step = n.n_days
         ORDER BY n.event_type""",

    "q136_retention_halflife" ->
      """WITH act0 AS (
           SELECT user_id, CAST(ts AS DATE) AS day FROM events),
         d0r AS (SELECT min(day) AS d0 FROM act0),
         act AS (
           SELECT DISTINCT user_id,
             CAST((day - d0) // 7 AS BIGINT) AS week
           FROM act0, d0r),
         fw AS (SELECT user_id, min(week) AS fw FROM act GROUP BY 1),
         mw AS (SELECT max(week) AS maxw FROM act),
         active AS (
           SELECT a.week - f.fw AS w_off,
             CAST(count(DISTINCT a.user_id) AS BIGINT) AS n_active
           FROM act a JOIN fw f ON f.user_id = a.user_id
           GROUP BY 1),
         cohorts AS (SELECT fw, CAST(count(*) AS BIGINT) AS c
                     FROM fw GROUP BY 1),
         spine AS (
           SELECT unnest(range(0, maxw + 1)) AS w_off, maxw FROM mw),
         cum AS (
           SELECT s.w_off, CAST(sum(c.c) AS BIGINT) AS n_at_risk
           FROM spine s JOIN cohorts c ON c.fw <= s.maxw - s.w_off
           GROUP BY 1),
         curve AS (
           SELECT a.w_off, c.n_at_risk, a.n_active,
             CAST(a.n_active AS DOUBLE) / CAST(c.n_at_risk AS DOUBLE)
               AS rate
           FROM active a JOIN cum c ON c.w_off = a.w_off),
         one AS (
           SELECT list({'offset': w_off, 'n_at_risk': n_at_risk,
             'n_active': n_active, 'rate': rate} ORDER BY w_off)
             AS arr
           FROM curve),
         fitted AS (
           SELECT arr,
             CAST(len(list_filter(arr, p -> p.offset >= 1)) AS DOUBLE)
               AS k,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(list_filter(arr, p -> p.offset >= 1),
                 p -> CAST(p.offset AS DOUBLE))), (a, b) -> a + b)
               AS sx,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(list_filter(arr, p -> p.offset >= 1),
                 p -> ln(p.rate))), (a, b) -> a + b) AS sy,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(list_filter(arr, p -> p.offset >= 1),
                 p -> CAST(p.offset AS DOUBLE) * ln(p.rate))),
               (a, b) -> a + b) AS sxy,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(list_filter(arr, p -> p.offset >= 1),
                 p -> CAST(p.offset AS DOUBLE) *
                      CAST(p.offset AS DOUBLE))), (a, b) -> a + b)
               AS sxx
           FROM one),
         sl AS (
           SELECT arr,
             (k * sxy - sx * sy) / (k * sxx - sx * sx) AS slope
           FROM fitted)
         SELECT r."offset" AS "offset", r.n_at_risk AS n_at_risk,
           r.n_active AS n_active, round(r.rate, 6) AS rate,
           round(slope, 4) AS decay_slope,
           round(CASE WHEN slope < 0 THEN -ln(CAST(2.0 AS DOUBLE))
             / slope END, 4) AS halflife_weeks
         FROM sl, unnest(arr) AS u(r)
         ORDER BY r."offset"""",

    "q139_attribution_window_sweep" ->
      """WITH e AS (
           SELECT user_id, event_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us
           FROM events),
         lagc AS (
           SELECT us - max(CASE WHEN event_type = 'click' THEN us END)
               OVER (PARTITION BY user_id ORDER BY us, event_id
                 ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING)
               AS lag_us,
             event_type
           FROM e),
         p AS (SELECT lag_us FROM lagc
               WHERE event_type = 'purchase'),
         wins AS (
           SELECT * FROM (VALUES ('1h', 3600), ('2_6h', 21600),
             ('3_1d', 86400), ('4_3d', 259200), ('5_7d', 604800))
             AS t(win, secs))
         SELECT w.win AS window,
           CAST(count(*) AS BIGINT) AS n_purchases,
           CAST(sum(CASE WHEN p.lag_us IS NOT NULL
               AND p.lag_us <= CAST(w.secs AS BIGINT) * 1000000
             THEN 1 ELSE 0 END) AS BIGINT) AS n_attributed,
           round(CAST(sum(CASE WHEN p.lag_us IS NOT NULL
               AND p.lag_us <= CAST(w.secs AS BIGINT) * 1000000
             THEN 1 ELSE 0 END) AS DOUBLE) / CAST(count(*) AS DOUBLE),
             6) AS coverage
         FROM p CROSS JOIN wins w
         GROUP BY w.win ORDER BY w.win""",

    "q137_interval_burstiness" ->
      """WITH gaps AS (
           SELECT o_custkey, day - prev AS g FROM (
             SELECT o_custkey, CAST(o_orderdate AS DATE) AS day,
               lag(CAST(o_orderdate AS DATE)) OVER (
                 PARTITION BY o_custkey
                 ORDER BY CAST(o_orderdate AS DATE), o_orderkey)
                 AS prev
             FROM orders)
           WHERE prev IS NOT NULL),
         m AS (
           SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(g) AS BIGINT) AS sg,
             CAST(sum(g * g) AS BIGINT) AS sgg
           FROM gaps JOIN customer c ON c.c_custkey = gaps.o_custkey
           GROUP BY 1)
         SELECT c_mktsegment, n,
           round(CAST(sg AS DOUBLE) / CAST(n AS DOUBLE), 4)
             AS mean_gap_days,
           round(
             (sqrt((CAST(n AS DOUBLE) * CAST(sgg AS DOUBLE) -
                CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)) /
               (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) -
              CAST(sg AS DOUBLE) / CAST(n AS DOUBLE)) /
             (sqrt((CAST(n AS DOUBLE) * CAST(sgg AS DOUBLE) -
                CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)) /
               (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) +
              CAST(sg AS DOUBLE) / CAST(n AS DOUBLE)), 4)
             AS burstiness
         FROM m ORDER BY c_mktsegment""",

    "q135_diff_in_diff" ->
      """WITH e AS (
           SELECT user_id % 2 = 0 AS treat, CAST(ts AS DATE) AS day,
             CAST(round(value * 100) AS BIGINT) AS cents
           FROM events),
         bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM e),
         cells AS (
           SELECT treat,
             (day - d0) * 2 >= (d1 - d0) AS post,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(cents) AS BIGINT) AS s
           FROM e, bounds GROUP BY 1, 2),
         one AS (
           SELECT
             max(CASE WHEN treat AND NOT post THEN n END) AS n_t1,
             max(CASE WHEN treat AND NOT post THEN s END) AS s_t1,
             max(CASE WHEN treat AND post THEN n END) AS n_t2,
             max(CASE WHEN treat AND post THEN s END) AS s_t2,
             max(CASE WHEN NOT treat AND NOT post THEN n END) AS n_c1,
             max(CASE WHEN NOT treat AND NOT post THEN s END) AS s_c1,
             max(CASE WHEN NOT treat AND post THEN n END) AS n_c2,
             max(CASE WHEN NOT treat AND post THEN s END) AS s_c2
           FROM cells)
         SELECT n_t1, n_t2, n_c1, n_c2,
           round(CAST(s_t1 AS DOUBLE) / CAST(n_t1 AS DOUBLE), 4)
             AS mean_treat_pre,
           round(CAST(s_t2 AS DOUBLE) / CAST(n_t2 AS DOUBLE), 4)
             AS mean_treat_post,
           round(CAST(s_c1 AS DOUBLE) / CAST(n_c1 AS DOUBLE), 4)
             AS mean_ctrl_pre,
           round(CAST(s_c2 AS DOUBLE) / CAST(n_c2 AS DOUBLE), 4)
             AS mean_ctrl_post,
           round((CAST(s_t2 AS DOUBLE) / CAST(n_t2 AS DOUBLE) -
                  CAST(s_t1 AS DOUBLE) / CAST(n_t1 AS DOUBLE)) -
                 (CAST(s_c2 AS DOUBLE) / CAST(n_c2 AS DOUBLE) -
                  CAST(s_c1 AS DOUBLE) / CAST(n_c1 AS DOUBLE)), 4)
             AS did_cents
         FROM one""",

    "q134_wilson_ci" ->
      """WITH cnts AS (
           SELECT c.c_mktsegment, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN o.n_orders >= 15 THEN 1 ELSE 0 END)
               AS BIGINT) AS k
           FROM (SELECT o_custkey, count(*) AS n_orders
                 FROM orders GROUP BY 1) o
           JOIN customer c ON c.c_custkey = o.o_custkey
           GROUP BY 1),
         w AS (
           SELECT c_mktsegment, n, k,
             CAST(k AS DOUBLE) / CAST(n AS DOUBLE) AS p,
             CAST(1.96 AS DOUBLE) * CAST(1.96 AS DOUBLE) AS z2,
             CAST(n AS DOUBLE) AS nd
           FROM cnts)
         SELECT c_mktsegment, n, k, round(p, 6) AS p_hat,
           round((p + z2 / (CAST(2.0 AS DOUBLE) * nd)) /
               (CAST(1.0 AS DOUBLE) + z2 / nd)
             - CAST(1.96 AS DOUBLE) *
               sqrt(p * (CAST(1.0 AS DOUBLE) - p) / nd +
                 z2 / (CAST(4.0 AS DOUBLE) * nd * nd)) /
               (CAST(1.0 AS DOUBLE) + z2 / nd), 6) AS ci_lo,
           round((p + z2 / (CAST(2.0 AS DOUBLE) * nd)) /
               (CAST(1.0 AS DOUBLE) + z2 / nd)
             + CAST(1.96 AS DOUBLE) *
               sqrt(p * (CAST(1.0 AS DOUBLE) - p) / nd +
                 z2 / (CAST(4.0 AS DOUBLE) * nd * nd)) /
               (CAST(1.0 AS DOUBLE) + z2 / nd), 6) AS ci_hi
         FROM w ORDER BY c_mktsegment""",

    "q133_rfm_migration" ->
      """WITH o AS (
           SELECT o_custkey, CAST(o_orderdate AS DATE) AS day,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
         bounds AS (SELECT min(day) AS d0, max(day) AS d1 FROM o),
         per AS (
           SELECT CASE WHEN (day - d0) * 2 < (d1 - d0) THEN 1 ELSE 2
             END AS period, o_custkey,
             CAST(sum(cents) AS BIGINT) AS spend
           FROM o, bounds GROUP BY 1, 2),
         r AS (
           SELECT period, o_custkey,
             CAST(row_number() OVER (PARTITION BY period
               ORDER BY spend DESC, o_custkey) AS BIGINT) AS rn,
             CAST(count(*) OVER (PARTITION BY period) AS BIGINT)
               AS n_p
           FROM per),
         seg AS (
           SELECT period, o_custkey, (rn - 1) * 3 // n_p + 1 AS seg
           FROM r),
         j AS (
           SELECT coalesce(a.seg, 0) AS seg_p1,
             coalesce(b.seg, 0) AS seg_p2
           FROM (SELECT * FROM seg WHERE period = 1) a
           FULL OUTER JOIN (SELECT * FROM seg WHERE period = 2) b
             ON b.o_custkey = a.o_custkey)
         SELECT CAST(seg_p1 AS BIGINT) AS seg_p1,
           CAST(seg_p2 AS BIGINT) AS seg_p2,
           CAST(count(*) AS BIGINT) AS n_customers
         FROM j GROUP BY 1, 2 ORDER BY 1, 2""",

    "q132_acf" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS v
           FROM events GROUP BY 1, 2),
         lagged AS (
           SELECT a.event_type, l.lag, a.v AS v1, b.v AS v2
           FROM daily a
           CROSS JOIN (SELECT unnest(range(1, 8)) AS lag) l
           JOIN daily b ON b.event_type = a.event_type
                       AND b.day = a.day + CAST(l.lag AS INTEGER)),
         m AS (
           SELECT event_type, CAST(lag AS BIGINT) AS lag,
             CAST(count(*) AS BIGINT) AS n,
             CAST(sum(v1) AS BIGINT) AS sx,
             CAST(sum(v2) AS BIGINT) AS sy,
             CAST(sum(v1 * v1) AS BIGINT) AS sxx,
             CAST(sum(v2 * v2) AS BIGINT) AS syy,
             CAST(sum(v1 * v2) AS BIGINT) AS sxy
           FROM lagged GROUP BY 1, 2)
         SELECT event_type, lag, n,
           round(
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
              CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
             (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
                CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
              sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
                CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4) + 0.0
             AS acf
         FROM m ORDER BY event_type, lag""",

    "q130_effect_sizes" ->
      """WITH cells AS (
           SELECT event_type,
             CAST(dayofweek(CAST(ts AS DATE)) + 1 AS BIGINT) AS dow,
             CAST(count(*) AS BIGINT) AS obs
           FROM events GROUP BY 1, 2),
         rowc AS (SELECT event_type, CAST(sum(obs) AS BIGINT) AS row_n
                  FROM cells GROUP BY 1),
         colc AS (SELECT dow, CAST(sum(obs) AS BIGINT) AS col_n
                  FROM cells GROUP BY 1),
         tot AS (SELECT CAST(sum(obs) AS BIGINT) AS n,
                   CAST(count(DISTINCT event_type) AS BIGINT)
                     AS n_types,
                   CAST(count(DISTINCT dow) AS BIGINT) AS n_dows
                 FROM cells),
         j AS (
           SELECT c.event_type, c.dow,
             CAST(CAST(t.n AS HUGEINT) * c.obs
                  - CAST(r.row_n AS HUGEINT) * l.col_n AS DOUBLE)
               * CAST(CAST(t.n AS HUGEINT) * c.obs
                  - CAST(r.row_n AS HUGEINT) * l.col_n AS DOUBLE)
               / (CAST(t.n AS DOUBLE) * r.row_n * l.col_n) AS term
           FROM cells c
           JOIN rowc r ON c.event_type = r.event_type
           JOIN colc l ON c.dow = l.dow
           CROSS JOIN tot t),
         x AS (
           SELECT t.n, t.n_types, t.n_dows,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               (SELECT list(term ORDER BY event_type, dow) FROM j)),
               (a, b) -> a + b) AS chi2_raw
           FROM tot t)
         SELECT n, n_types, n_dows, round(chi2_raw, 4) AS chi2,
           round(sqrt(chi2_raw / (CAST(n AS DOUBLE) *
             CAST(least(n_types, n_dows) - 1 AS DOUBLE))), 4)
             AS cramers_v,
           round(sqrt(chi2_raw / CAST(n AS DOUBLE)), 4) AS phi,
           round(sqrt(chi2_raw / (chi2_raw + CAST(n AS DOUBLE))), 4)
             AS contingency_c
         FROM x""",

    "q128_bounce_rate" ->
      """WITH e AS (
           SELECT user_id, event_id, event_type,
             epoch_us(CAST(ts AS TIMESTAMP)) AS us,
             CAST(ts AS TIMESTAMP) AS tsu
           FROM events),
         marked AS (
           SELECT user_id, event_id, event_type, us, tsu,
             CASE WHEN lag(us) OVER (PARTITION BY user_id
                    ORDER BY tsu, event_id) IS NULL
                    OR us - lag(us) OVER (PARTITION BY user_id
                         ORDER BY tsu, event_id) > 1800 * 1000000
                  THEN 1 ELSE 0 END AS new_sess
           FROM e),
         sess AS (
           SELECT user_id, event_id, event_type, tsu,
             CAST(sum(new_sess) OVER (PARTITION BY user_id
               ORDER BY tsu, event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS sess_id
           FROM marked),
         g AS (
           SELECT user_id, sess_id,
             CAST(count(*) AS BIGINT) AS n_events,
             min({'ts': tsu, 'event_id': event_id,
                  'event_type': event_type}).event_type AS landing
           FROM sess GROUP BY 1, 2)
         SELECT landing, CAST(count(*) AS BIGINT) AS n_sessions,
           CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
             AS BIGINT) AS n_bounce,
           CAST(sum(n_events) AS BIGINT) AS n_events,
           round(CAST(sum(CASE WHEN n_events = 1 THEN 1 ELSE 0 END)
               AS DOUBLE) / CAST(count(*) AS DOUBLE), 6)
             AS bounce_rate
         FROM g GROUP BY landing ORDER BY landing""",

    "q127_seasonal_decompose" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS v
           FROM events GROUP BY 1, 2),
         grand AS (
           SELECT event_type,
             CAST(sum(v) // count(*) AS BIGINT) AS gmean
           FROM daily GROUP BY 1),
         dw AS (
           SELECT event_type,
             CAST(dayofweek(day) + 1 AS BIGINT) AS w,
             CAST(sum(v) // count(*) AS BIGINT) AS wmean
           FROM daily GROUP BY 1, 2),
         tr AS (
           SELECT event_type, day, v,
             CAST(sum(v) OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING) //
               count(*) OVER (PARTITION BY event_type ORDER BY day
                 ROWS BETWEEN 3 PRECEDING AND 3 FOLLOWING)
               AS BIGINT) AS trend
           FROM daily)
         SELECT tr.event_type, CAST(tr.day AS TIMESTAMP) AS day,
           tr.v AS cents, tr.trend,
           CAST(dw.wmean - g.gmean AS BIGINT) AS seasonal,
           CAST(tr.v - tr.trend - (dw.wmean - g.gmean) AS BIGINT)
             AS residual
         FROM tr
         JOIN dw ON dw.event_type = tr.event_type
                AND dw.w = dayofweek(tr.day) + 1
         JOIN grand g ON g.event_type = tr.event_type
         ORDER BY tr.event_type, tr.day""",

    "q125_two_sample_ks" ->
      """WITH o AS (
           SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             o_orderpriority = '1-URGENT' AS isa
           FROM orders
           WHERE o_orderpriority IN ('1-URGENT', '5-LOW')),
         bv AS (
           SELECT cents,
             CAST(sum(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT)
               AS k1,
             CAST(sum(CASE WHEN NOT isa THEN 1 ELSE 0 END) AS BIGINT)
               AS k2
           FROM o GROUP BY 1),
         cum AS (
           SELECT cents,
             CAST(sum(k1) OVER (ORDER BY cents) AS BIGINT) AS c1,
             CAST(sum(k2) OVER (ORDER BY cents) AS BIGINT) AS c2
           FROM bv),
         ns AS (
           SELECT CAST(sum(CASE WHEN isa THEN 1 ELSE 0 END) AS BIGINT)
               AS n1,
             CAST(sum(CASE WHEN NOT isa THEN 1 ELSE 0 END) AS BIGINT)
               AS n2
           FROM o),
         diffs AS (
           SELECT cents, abs(c1 * n2 - c2 * n1) AS dnum, n1, n2
           FROM cum, ns),
         mx AS (SELECT max(dnum) AS d_num FROM diffs)
         SELECT CAST(max(n1) AS BIGINT) AS n1,
           CAST(max(n2) AS BIGINT) AS n2,
           CAST(d_num AS BIGINT) AS d_num,
           CAST(min(cents) AS BIGINT) AS at_cents,
           round(CAST(d_num AS DOUBLE) /
             (CAST(max(n1) AS DOUBLE) * CAST(max(n2) AS DOUBLE)), 6)
             AS ks_d
         FROM diffs JOIN mx ON dnum = d_num GROUP BY d_num""",

    "q126_spearman" ->
      """WITH cust AS (
           SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS x,
             CAST(count(*) AS BIGINT) AS y
           FROM orders GROUP BY 1),
         rx AS (
           SELECT v, 2 * cum - cnt + 1 AS r FROM (
             SELECT v, cnt,
               CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS cum
             FROM (SELECT x AS v, CAST(count(*) AS BIGINT) AS cnt
                   FROM cust GROUP BY 1))),
         ry AS (
           SELECT v, 2 * cum - cnt + 1 AS r FROM (
             SELECT v, cnt,
               CAST(sum(cnt) OVER (ORDER BY v) AS BIGINT) AS cum
             FROM (SELECT y AS v, CAST(count(*) AS BIGINT) AS cnt
                   FROM cust GROUP BY 1))),
         j AS (
           SELECT CAST(rx.r AS BIGINT) AS a, CAST(ry.r AS BIGINT) AS b
           FROM cust
           JOIN rx ON rx.v = cust.x
           JOIN ry ON ry.v = cust.y),
         m AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CAST(a AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sx,
             CAST(sum(CAST(b AS DECIMAL(38,0))) AS DECIMAL(38,0)) AS sy,
             CAST(sum(CAST(a * a AS DECIMAL(38,0))) AS DECIMAL(38,0))
               AS sxx,
             CAST(sum(CAST(b * b AS DECIMAL(38,0))) AS DECIMAL(38,0))
               AS syy,
             CAST(sum(CAST(a * b AS DECIMAL(38,0))) AS DECIMAL(38,0))
               AS sxy
           FROM j)
         SELECT n AS n_cust,
           round(
             (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE) -
              CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE)) /
             (sqrt(CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE) -
                CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)) *
              sqrt(CAST(n AS DOUBLE) * CAST(syy AS DOUBLE) -
                CAST(sy AS DOUBLE) * CAST(sy AS DOUBLE))), 4) + 0.0
             AS spearman_rho
         FROM m""",

    "q123_ab_ztest" ->
      """WITH u AS (
           SELECT user_id,
             CASE WHEN sum(CASE WHEN event_type = 'purchase' THEN 1
                      ELSE 0 END) >= 15 THEN 1 ELSE 0 END AS conv
           FROM events GROUP BY 1),
         g AS (
           SELECT CAST(sum(CASE WHEN user_id % 2 = 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_a,
             CAST(sum(CASE WHEN user_id % 2 = 0 THEN conv ELSE 0 END)
               AS BIGINT) AS conv_a,
             CAST(sum(CASE WHEN user_id % 2 <> 0 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_b,
             CAST(sum(CASE WHEN user_id % 2 <> 0 THEN conv ELSE 0 END)
               AS BIGINT) AS conv_b
           FROM u)
         SELECT n_a, conv_a, n_b, conv_b,
           round(CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE), 6)
             AS p_a,
           round(CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE), 6)
             AS p_b,
           CASE WHEN conv_a + conv_b > 0
                  AND conv_a + conv_b < n_a + n_b THEN
             round(
               (CAST(conv_a AS DOUBLE) / CAST(n_a AS DOUBLE) -
                CAST(conv_b AS DOUBLE) / CAST(n_b AS DOUBLE)) /
               sqrt(
                 (CAST(conv_a + conv_b AS DOUBLE) /
                   CAST(n_a + n_b AS DOUBLE)) *
                 (CAST(1.0 AS DOUBLE) -
                   CAST(conv_a + conv_b AS DOUBLE) /
                   CAST(n_a + n_b AS DOUBLE)) *
                 (CAST(1.0 AS DOUBLE) / CAST(n_a AS DOUBLE) +
                  CAST(1.0 AS DOUBLE) / CAST(n_b AS DOUBLE))), 4)
           END AS z_stat
         FROM g""",

    "q124_out_of_order_audit" ->
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

    "q121_seq_support" ->
      """WITH spans AS (
           -- CAST to µs TIMESTAMP: Spark reads the ns parquet at µs
           -- (Tables.load), so the mn < mx comparison must not run at
           -- ns on this side
           SELECT user_id, event_type,
             min(CAST(ts AS TIMESTAMP)) AS mn,
             max(CAST(ts AS TIMESTAMP)) AS mx
           FROM events GROUP BY 1, 2),
         nu AS (
           SELECT CAST(count(DISTINCT user_id) AS BIGINT) AS n_users
           FROM spans)
         SELECT a.event_type AS a, b.event_type AS b,
           CAST(count(*) AS BIGINT) AS n_support,
           round(CAST(count(*) AS DOUBLE) / CAST(max(n_users) AS DOUBLE),
             4) AS support
         FROM spans a
         JOIN spans b ON a.user_id = b.user_id
                     AND a.event_type <> b.event_type
                     AND a.mn < b.mx, nu
         GROUP BY 1, 2 ORDER BY a, b""",

    "q122_resurrected" ->
      """WITH act AS (
           SELECT DISTINCT user_id, CAST(ts AS DATE) AS day
           FROM events),
         cls AS (
           SELECT day,
             CASE WHEN prev IS NULL THEN 'new'
                  WHEN day - prev <= 7 THEN 'returning'
                  ELSE 'resurrected' END AS cls
           FROM (SELECT user_id, day,
                   lag(day) OVER (PARTITION BY user_id ORDER BY day)
                     AS prev
                 FROM act))
         SELECT CAST(day AS TIMESTAMP) AS day,
           CAST(count(*) AS BIGINT) AS n_active,
           CAST(sum(CASE WHEN cls = 'new' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_new,
           CAST(sum(CASE WHEN cls = 'returning' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_returning,
           CAST(sum(CASE WHEN cls = 'resurrected' THEN 1 ELSE 0 END)
             AS BIGINT) AS n_resurrected
         FROM cls GROUP BY day ORDER BY day""",

    // Same sorted-array folds; DuckDB's 0-based dayofweek shifted to
    // Spark's 1-based (q92 precedent).
    "q119_mutual_information" ->
      """WITH cells AS (
           SELECT event_type AS e,
             CAST(dayofweek(CAST(ts AS DATE)) + 1 AS BIGINT) AS w,
             CAST(count(*) AS BIGINT) AS n_ew
           FROM events GROUP BY 1, 2),
         me AS (SELECT e, CAST(sum(n_ew) AS BIGINT) AS n_e
                FROM cells GROUP BY 1),
         mw AS (SELECT w, CAST(sum(n_ew) AS BIGINT) AS n_w
                FROM cells GROUP BY 1),
         mi AS (
           SELECT CAST(sum(n_ew) AS BIGINT) AS n_events,
             CAST(count(*) AS BIGINT) AS n_cells,
             list({'e': c.e, 'w': c.w, 'n_ew': c.n_ew,
                   'n_e': me.n_e, 'n_w': mw.n_w}
               ORDER BY c.e, c.w) AS cs
           FROM cells c
           JOIN me ON me.e = c.e JOIN mw ON mw.w = c.w),
         mires AS (
           SELECT n_events, n_cells,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(cs, x ->
                 (CAST(x.n_ew AS DOUBLE) / CAST(n_events AS DOUBLE)) *
                 ln(CAST(x.n_ew AS DOUBLE) * CAST(n_events AS DOUBLE) /
                    (CAST(x.n_e AS DOUBLE) * CAST(x.n_w AS DOUBLE))))),
               (a, b) -> a + b) AS mi
           FROM mi),
         he AS (
           SELECT -list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(list({'k': e, 'n': n_e} ORDER BY e), x ->
                 (CAST(x.n AS DOUBLE) / CAST(tot AS DOUBLE)) *
                 ln(CAST(x.n AS DOUBLE) / CAST(tot AS DOUBLE)))),
               (a, b) -> a + b) AS h_type
           FROM me, (SELECT CAST(sum(n_e) AS BIGINT) AS tot FROM me)
           GROUP BY tot),
         hw AS (
           SELECT -list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(list({'k': w, 'n': n_w} ORDER BY w), x ->
                 (CAST(x.n AS DOUBLE) / CAST(tot AS DOUBLE)) *
                 ln(CAST(x.n AS DOUBLE) / CAST(tot AS DOUBLE)))),
               (a, b) -> a + b) AS h_dow
           FROM mw, (SELECT CAST(sum(n_w) AS BIGINT) AS tot FROM mw)
           GROUP BY tot)
         SELECT n_events, n_cells, round(mi, 4) AS mi_nats,
           round(h_type, 4) AS h_type, round(h_dow, 4) AS h_dow,
           round(mi / least(h_type, h_dow), 4) AS uncertainty
         FROM mires, he, hw""",

    // Identical risk table; the survival product is the same
    // month-sorted slice fold (scalar accumulator — safe in DuckDB's
    // list_reduce, unlike the struct state q114 documents).
    "q120_survival_km" ->
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
           SELECT list({'t': t, 'd': d, 'c': c, 'n': n_at_risk,
             'factor': CAST(1.0 AS DOUBLE) -
               CAST(d AS DOUBLE) / CAST(n_at_risk AS DOUBLE)}
             ORDER BY t) AS arr
           FROM risk)
         SELECT arr[i].t AS t, arr[i].n AS n_at_risk,
           arr[i].d AS n_churned, arr[i].c AS n_censored,
           round(list_reduce(list_prepend(CAST(1.0 AS DOUBLE),
             list_transform(arr[1:i], x -> x.factor)),
             (a, b) -> a * b), 6) AS survival
         FROM one, unnest(range(1, len(arr) + 1)) AS u(i)
         ORDER BY t""",

    "q118_hhi_concentration" ->
      """WITH bysupp AS (
           SELECT s.s_nationkey, l.l_suppkey,
             CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT))
               AS BIGINT) AS c
           FROM lineitem l JOIN supplier s
             ON s.s_suppkey = l.l_suppkey
           GROUP BY 1, 2),
         bynat AS (
           SELECT s_nationkey, CAST(count(*) AS BIGINT) AS n_suppliers,
             CAST(sum(c) AS BIGINT) AS tot,
             sum(CAST(c AS DECIMAL(38,0)) * CAST(c AS DECIMAL(38,0)))
               AS sumsq,
             CAST(max(c) AS BIGINT) AS top_c
           FROM bysupp GROUP BY 1)
         SELECT n.n_name AS nation, b.n_suppliers, b.tot,
           round(CAST(b.sumsq AS DOUBLE) /
             (CAST(b.tot AS DOUBLE) * CAST(b.tot AS DOUBLE)), 6)
             AS hhi,
           round(CAST(b.top_c AS DOUBLE) / CAST(b.tot AS DOUBLE), 6)
             AS top_share
         FROM bynat b JOIN nation n ON n.n_nationkey = b.s_nationkey
         ORDER BY nation""",

    // The identical array pipeline: list() ordered aggregates, sign
    // filter, run-boundary count over indices, the same fixed IEEE
    // z assembly.
    "q117_runs_test" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS v
           FROM events GROUP BY 1, 2),
         g AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS n_days,
             list(v ORDER BY day) AS vs,
             list(v ORDER BY v) AS sorted
           FROM daily GROUP BY 1),
         m AS (
           SELECT event_type, n_days, vs,
             sorted[(len(sorted) + 1) // 2] AS med
           FROM g),
         sg AS (
           SELECT event_type, n_days, med,
             list_filter(list_transform(vs, v ->
               CASE WHEN v > med THEN 1
                    WHEN v < med THEN -1 ELSE 0 END),
               s -> s != 0) AS signs
           FROM m),
         c AS (
           SELECT event_type, n_days, med,
             CAST(len(signs) AS BIGINT) AS n,
             CAST(len(list_filter(signs, s -> s = 1)) AS BIGINT)
               AS n_pos,
             CAST(len(list_filter(signs, s -> s = -1)) AS BIGINT)
               AS n_neg,
             CAST(len(list_filter(range(2, len(signs) + 1),
               i -> signs[i] != signs[i - 1])) + 1 AS BIGINT)
               AS n_runs
           FROM sg)
         SELECT event_type, n_days, med, n_pos, n_neg, n_runs,
           round(
             (CAST(n_runs AS DOUBLE) -
               (CAST(1.0 AS DOUBLE) + CAST(2.0 AS DOUBLE) *
                 CAST(n_pos * n_neg AS DOUBLE) / CAST(n AS DOUBLE))) /
             sqrt(CAST(2.0 AS DOUBLE) * CAST(n_pos * n_neg AS DOUBLE) *
               (CAST(2.0 AS DOUBLE) * CAST(n_pos * n_neg AS DOUBLE) -
                 CAST(n AS DOUBLE)) /
               (CAST(n AS DOUBLE) * CAST(n AS DOUBLE) *
                 (CAST(n AS DOUBLE) - CAST(1.0 AS DOUBLE)))), 4)
             AS z_stat
         FROM c ORDER BY event_type""",

    "q115_fd_discovery" -> Seq(
      ("orders", "o_orderkey", "o_custkey"),
      ("orders", "o_orderkey", "o_orderstatus"),
      ("orders", "o_custkey", "o_orderpriority"),
      ("lineitem", "l_orderkey", "l_suppkey"),
      ("lineitem", "l_partkey", "l_suppkey"),
      ("customer", "c_custkey", "c_mktsegment"),
      ("customer", "c_nationkey", "c_mktsegment"),
      ("nation", "n_nationkey", "n_regionkey"))
      .map { case (t, a, b) =>
        s"""SELECT '$t.$a -> $t.$b' AS fd,
              CAST(count(*) AS BIGINT) AS n_det,
              CAST(sum(nb) AS BIGINT) AS n_pairs,
              CAST(sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) AS BIGINT)
                AS n_violating,
              sum(CASE WHEN nb > 1 THEN 1 ELSE 0 END) = 0 AS holds
            FROM (SELECT $a, count(DISTINCT $b) AS nb
                  FROM $t GROUP BY 1)"""
      }.mkString("", "\nUNION ALL\n", "\nORDER BY fd"),

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
