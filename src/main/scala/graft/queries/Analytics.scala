package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Sequence / reshape / exact-statistics analytics (round 6, batch 2).
  *
  * The reference (`/root/reference/`, a single-stream log forwarder —
  * SURVEY.md §2a) has no relational surface at all; these are §2b/§2c
  * extension operators a warehouse user expects on event logs. Every
  * query follows the repo parity rules: integer/µs arithmetic where a
  * float fold order could flip a hash (q1/q25 precedent), explicit
  * (ts, event_id) tie-breaks in every window, and aliases matching the
  * DuckDB oracle column-for-column.
  */
object Analytics {

  /** 30-minute session gap in microseconds (shared with q15/q45). */
  private val SessionGapUs = 1800L * 1000000L

  def queries: Map[String, Q] = Map(

    // Unpivot / melt — wide measure columns to (measure, value) long
    // form, the reshape every metrics store and feature-table export
    // needs (inverse of q18_pivot). Spark's native unpivot produces
    // the long frame without a join or explode; the aggregate then
    // shrinks it map-side, so the wide→long blowup (4× rows) never
    // shuffles raw — only 4 partial-agg rows per task do. Sums ride
    // exact integer cents (decimal(38,0) against 100 TB overflow);
    // min/max are order-free so they stay in the native double.
    "q39_unpivot" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "lineitem")
        .select($"l_orderkey", $"l_linenumber", $"l_quantity",
          $"l_extendedprice", $"l_discount", $"l_tax")
        .unpivot(
          ids = Array($"l_orderkey", $"l_linenumber"),
          values = Array($"l_quantity", $"l_extendedprice",
            $"l_discount", $"l_tax"),
          variableColumnName = "measure",
          valueColumnName = "val")
        .withColumn("c",
          round($"val" * 100).cast("long").cast("decimal(38,0)"))
        .groupBy($"measure")
        .agg(count(lit(1)).as("n"),
          sum($"c").as("sum_c"),
          round(min($"val"), 2).as("vmin"),
          round(max($"val"), 2).as("vmax"))
        .select($"measure", $"n",
          round($"sum_c".cast("double") / 100, 2).as("total"),
          $"vmin", $"vmax")
        .orderBy($"measure")
    }),

    // Outer-join family closure: year-over-year revenue per customer
    // as a FULL OUTER join of two aggregated years — customers who
    // bought in only one year surface with a zero on the other side
    // (coalesce semantics), the churn/new-customer report shape. Both
    // inputs aggregate BEFORE the join (map-side combine on the fact
    // scan, then a customer-key join of two small frames); revenue is
    // exact integer cents. The same plan serves left/right outer as
    // filters of this result — full outer is the general member, so
    // it is the one registered.
    "q49_outer_join" -> ((s, d) => {
      import s.implicits._
      def rev(y: Int) = Tables.load(s, d, "orders")
        .filter(year($"o_orderdate") === y)
        .groupBy($"o_custkey")
        .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
      rev(1994).withColumnRenamed("cents", "c94")
        .join(rev(1995).withColumnRenamed("cents", "c95"),
          Seq("o_custkey"), "full_outer")
        .select($"o_custkey",
          round(coalesce($"c94", lit(0L)).cast("double") / 100, 2)
            .as("rev_1994"),
          round(coalesce($"c95", lit(0L)).cast("double") / 100, 2)
            .as("rev_1995"),
          round((coalesce($"c95", lit(0L)) - coalesce($"c94", lit(0L)))
            .cast("double") / 100, 2).as("delta"))
        .orderBy($"o_custkey")
    }),

    // Value-window family closure: first_value / nth_value /
    // last_value over the full-partition frame — the customer-timeline
    // report (first order, second order, latest order) in ONE window
    // pass over one customer exchange; the rn=1 filter collapses to a
    // single row per customer without a second aggregate.
    "q50_value_window" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy($"o_orderdate", $"o_orderkey")
      val wf = w.rowsBetween(Window.unboundedPreceding,
        Window.unboundedFollowing)
      Tables.load(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .withColumn("n_orders", count(lit(1)).over(wf).cast("long"))
        .withColumn("first_date", first($"o_orderdate").over(wf))
        .withColumn("second_date", nth_value($"o_orderdate", 2).over(wf))
        .withColumn("last_date", last($"o_orderdate").over(wf))
        .filter($"rn" === 1)
        .select($"o_custkey", $"n_orders", $"first_date",
          $"second_date", $"last_date")
        .orderBy($"o_custkey")
    }),

    // NATIVE batch session windows — the session_window operator
    // itself (SessionWindowing exec with session merging), not the
    // manual lag/gap formulation of q15 (kept as its cross-check
    // twin): per-user sessions close after a 30-minute idle gap, the
    // session range is [first event, last event + gap). Emitted
    // bounds ride exact epoch-µs integers. Oracle replays the merge
    // rule (new session when the gap is ≥ the timeout — Spark's
    // session end is exclusive) with a cumulative marker sum.
    "q52_session_window" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "events")
        .groupBy($"user_id", session_window($"ts", "30 minutes").as("sw"))
        .agg(count(lit(1)).as("n_events"))
        .select($"user_id",
          unix_micros($"sw.start").as("s_start_us"),
          unix_micros($"sw.end").as("s_end_us"),
          $"n_events")
        .orderBy($"user_id", $"s_start_us")
    }),

    // Null-safe equality (<=> / IS NOT DISTINCT FROM): the join
    // semantics where NULL keys MATCH each other instead of silently
    // dropping — what entity-resolution joins over incomplete keys
    // need (a plain equi-join discards every NULL-keyed row of both
    // sides). Planted NULL keys on both sides; the NULL group must
    // survive with the product of both sides' counts. Plans as an
    // EqualNullSafe hash join — still a hash-partitionable key, not
    // a nested loop.
    "q56_null_safe_join" -> ((s, d) => {
      import s.implicits._
      def keyed(m: Int) = Tables.load(s, d, "events")
        .withColumn("k",
          when($"event_id" % m === 0, lit(null).cast("long"))
            .otherwise($"event_id" % 50))
        .groupBy($"k").agg(count(lit(1)).as(s"n_$m"))
      keyed(5).as("a")
        .join(keyed(3).as("b"), $"a.k" <=> $"b.k")
        .select($"a.k".as("k"), $"n_5", $"n_3")
        .orderBy($"k")
    }),

    // ANSI error-handling surface: the try_* family. The engine runs
    // ANSI mode (overflow/bad-cast/zero-division THROW — the
    // correctness default), so the try_ forms are the per-expression
    // escape hatch a dirty-data pipeline needs: NULL on failure
    // instead of a dead job. Exercises try_divide (planted zero
    // denominators), try_cast (planted non-numeric strings),
    // try_add/try_multiply at long range boundaries (planted
    // overflow), and try_to_number. Row-local, scan-shaped.
    "q55_try_arith" -> ((s, d) => {
      import s.implicits._
      val denom = $"event_id" % 7 // 0 every 7th row
      val numStr = when($"event_id" % 5 === 0, lit("n/a"))
        .otherwise(($"event_id" * 3).cast("string"))
      val big = when($"event_id" % 11 === 0,
        lit(Long.MaxValue)).otherwise($"event_id")
      Tables.load(s, d, "events")
        .select(
          $"event_id",
          try_divide($"value", denom.cast("double")).as("safe_div"),
          numStr.try_cast("bigint").as("safe_cast"),
          try_add(big, lit(1L)).as("safe_add"),
          try_multiply(big, lit(2L)).as("safe_mul"),
          try_to_number(lpad(pmod($"event_id", lit(1000)).cast("string"),
            3, "0"), lit("999")).cast("long").as("safe_num"))
        .orderBy($"event_id")
    }),

    // VariantType surface — Spark 4's native semi-structured type
    // (the open-format successor to string-JSON columns; SURVEY §1.2's
    // dynamic-JSON row gets a typed binary encoding with pushdown-
    // friendly typed extraction instead of per-access string
    // parsing). parse_json → variant; typed variant_get paths; the
    // schema_of_variant introspection; is_variant_null. Augmented
    // with a deterministic per-row nested value (pure function of
    // event_id, replayed by the oracle) so nested paths and type
    // casts are exercised, not just the flat {"k": n} corpus shape.
    "q54_variant" -> ((s, d) => {
      import s.implicits._
      val payload = concat(lit("{\"meta\":{\"gen\":"),
        pmod($"event_id", lit(5)).cast("string"),
        lit(",\"tags\":[\"t"), pmod($"event_id", lit(3)).cast("string"),
        lit("\",\"x\"]},\"nul\":null,\"props\":"), $"props", lit("}"))
      val v = parse_json(payload)
      Tables.load(s, d, "events")
        .select(
          $"event_id",
          variant_get(v, "$.meta.gen", "bigint").as("gen"),
          variant_get(v, "$.meta.tags[0]", "string").as("tag0"),
          variant_get(v, "$.props.k", "bigint").as("k_val"),
          schema_of_variant(v).as("v_schema"),
          is_variant_null(variant_get(v, "$.nul", "variant"))
            .as("nul_is_vnull"),
          try_variant_get(v, "$.missing", "bigint").isNull
            .as("missing_is_null"))
        .orderBy($"event_id")
    }),

    // MapType surface (SURVEY §1.2: dynamic-key JSON objects map to
    // map<string,string>): from_json → map, then map_keys /
    // map_concat (constant-column enrichment in map space — P2's
    // typed cousin) / transform_values / element_at, emitted as
    // deterministic sorted k=v strings both engines can hash. All
    // row-local, scan-shaped.
    "q53_map_funcs" -> ((s, d) => {
      import org.apache.spark.sql.types.{MapType, StringType}
      import s.implicits._
      // Parse ONCE per row: `m`/`enriched` are materialized as columns
      // (CollapseProject keeps non-cheap aliases used more than once,
      // so JsonToStructs runs once, not once per consumer), and the
      // k=v rendering walks map_entries instead of element_at-ing the
      // map per key — the per-key lookup re-evaluated the WHOLE
      // enriched-map expression under the lambda (O(keys²) JSON
      // parses per row before this shape).
      Tables.load(s, d, "events")
        .withColumn("m", from_json($"props", MapType(StringType, StringType)))
        .withColumn("enriched", transform_values(
          map_concat($"m", map(lit("src"), $"event_type")),
          (_, v) => upper(v)))
        .select(
          $"event_id",
          size($"m").cast("long").as("n_entries"),
          array_join(array_sort(map_keys($"m")), ",").as("keys_sorted"),
          element_at($"m", "k").as("k_val"),
          array_join(
            transform(array_sort(map_entries($"enriched")),
              e => concat_ws("=", e.getField("key"), e.getField("value"))),
            "&").as("kv"))
        .orderBy($"event_id")
    }),

    // Table profiling — the ANALYZE/data-quality pass a warehouse
    // runs before anything else: per-column null count, distinct
    // count, min/max, in ONE scan (16 aggregates in a single
    // HashAggregate; the multi-distinct rides Spark's Expand, still
    // one pass over the data) melted into a per-column report from
    // the 1-row result. Money bounds stay on the 2dp grid.
    "q51_profile" -> ((s, d) => {
      import s.implicits._
      val one = Tables.load(s, d, "lineitem").agg(
        count(lit(1)).as("n"),
        sum(when($"l_quantity".isNull, 1L).otherwise(0L)).as("nn_q"),
        count_distinct($"l_quantity").as("nd_q"),
        round(min($"l_quantity"), 2).as("mn_q"),
        round(max($"l_quantity"), 2).as("mx_q"),
        sum(when($"l_extendedprice".isNull, 1L).otherwise(0L)).as("nn_p"),
        count_distinct($"l_extendedprice").as("nd_p"),
        round(min($"l_extendedprice"), 2).as("mn_p"),
        round(max($"l_extendedprice"), 2).as("mx_p"),
        sum(when($"l_discount".isNull, 1L).otherwise(0L)).as("nn_d"),
        count_distinct($"l_discount").as("nd_d"),
        round(min($"l_discount"), 2).as("mn_d"),
        round(max($"l_discount"), 2).as("mx_d"),
        sum(when($"l_tax".isNull, 1L).otherwise(0L)).as("nn_t"),
        count_distinct($"l_tax").as("nd_t"),
        round(min($"l_tax"), 2).as("mn_t"),
        round(max($"l_tax"), 2).as("mx_t"))
      def row(name: String, suffix: String) =
        one.select(lit(name).as("column"), $"n".as("n_rows"),
          col(s"nn_$suffix").as("n_null"), col(s"nd_$suffix").as("n_distinct"),
          col(s"mn_$suffix").as("vmin"), col(s"mx_$suffix").as("vmax"))
      row("l_discount", "d")
        .unionAll(row("l_extendedprice", "p"))
        .unionAll(row("l_quantity", "q"))
        .unionAll(row("l_tax", "t"))
        .orderBy($"column")
    }),

    // Markov transition matrix over per-user event sequences: for
    // every adjacent (event, next event) pair, how often does type A
    // lead to type B? One lead() window over a single user_id
    // exchange, then a 25-row aggregate — the window partitions by
    // the HIGH-cardinality key (users), so no task sees more than one
    // user's timeline at any corpus size; the (src,dst) key space is
    // |types|², tiny forever.
    "q40_path_transitions" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.load(s, d, "events")
        .withColumn("next_type", lead($"event_type", 1).over(w))
        .filter($"next_type".isNotNull)
        .groupBy($"event_type".as("src"), $"next_type".as("dst"))
        .agg(count(lit(1)).as("n"))
        .orderBy($"src", $"dst")
    }),

    // SCD type-2 build — collapse each user's event stream into
    // validity intervals of its "state" (event_type here standing in
    // for any tracked attribute): a row survives only when the state
    // CHANGES (lag filter), then valid_to chains from the next
    // surviving row's valid_from (lead). Both windows share one
    // user_id hash exchange + sort (Catalyst reuses the partitioning;
    // the second window runs on the post-filter subset). This is the
    // standard warehouse dimension-history operator — MERGE-free,
    // pure windows, scales with users not history depth.
    "q41_scd2" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.load(s, d, "events")
        .withColumn("prev_type", lag($"event_type", 1).over(w))
        .filter($"prev_type".isNull || $"prev_type" =!= $"event_type")
        .withColumn("valid_to", lead($"ts", 1).over(w))
        .select($"user_id", $"event_type".as("state"),
          $"ts".as("valid_from"), $"valid_to",
          $"valid_to".isNull.as("is_current"))
        .orderBy($"user_id", $"valid_from", $"state")
    }),

    // Sequence-pattern match (MATCH_RECOGNIZE-lite): compress each
    // user's ordered event stream to a one-char-per-event string and
    // run the funnel regexp v[^p]*c[^p]*p ("view, later click, later
    // purchase, no purchase in between") over it. The per-user path
    // is built by sorting the collected (ts, event_id, char) structs
    // INSIDE the aggregated array — array_sort of a group-local array,
    // not a window — so the only shuffle is the groupBy(user_id), with
    // map-side partial collect. Java and DuckDB regex semantics agree
    // on this character-class subset (both leftmost partial match).
    "q42_seq_match" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "events")
        .select($"user_id",
          struct($"ts", $"event_id",
            substring($"event_type", 1, 1).as("ch")).as("e"))
        .groupBy($"user_id")
        .agg(array_sort(collect_list($"e")).as("es"))
        .select($"user_id",
          array_join(transform($"es", e => e.getField("ch")), "")
            .as("path"))
        .select($"user_id",
          length($"path").cast("long").as("n_events"),
          $"path".rlike("v[^p]*c[^p]*p").as("converted"))
        .orderBy($"user_id")
    }),

    // Pairwise correlation matrix (quantity/price/discount) via EXACT
    // integer moments — the q25 discipline extended to the cross
    // terms: every sum is order-independent decimal(38,0) arithmetic
    // on integer cents, so both engines feed bit-identical integers
    // into one final double expression (corr itself is a fold-order-
    // dependent stream in both engines' native corr() — exactly the
    // flake q25 eliminated). ONE scan, ONE 1-row aggregate with
    // map-side partials, then a 3-row LocalRelation-shaped projection:
    // the whole matrix costs a single reduce at any corpus size.
    "q43_corr_matrix" -> ((s, d) => {
      import s.implicits._
      val dec = "decimal(38,0)"
      val t = Tables.load(s, d, "lineitem").select(
        round($"l_quantity" * 100).cast("long").cast(dec).as("q"),
        round($"l_extendedprice" * 100).cast("long").cast(dec).as("p"),
        round($"l_discount" * 100).cast("long").cast(dec).as("dd"))
      val m = t.agg(
        count(lit(1)).cast(dec).as("n"),
        sum($"q").as("sq"), sum($"p").as("sp"), sum($"dd").as("sd"),
        sum($"q" * $"q").as("sqq"), sum($"p" * $"p").as("spp"),
        sum($"dd" * $"dd").as("sdd"),
        sum($"q" * $"p").as("sqp"), sum($"q" * $"dd").as("sqd"),
        sum($"p" * $"dd").as("spd"))
      def pair(name: String, num: org.apache.spark.sql.Column,
          d1: org.apache.spark.sql.Column, d2: org.apache.spark.sql.Column) =
        m.select(lit(name).as("pair"),
          Tables.nz(round(num.cast("double") /
            sqrt(d1.cast("double") * d2.cast("double")), 4)).as("corr"))
      val vq = $"n" * $"sqq" - $"sq" * $"sq"
      val vp = $"n" * $"spp" - $"sp" * $"sp"
      val vd = $"n" * $"sdd" - $"sd" * $"sd"
      pair("quantity_price", $"n" * $"sqp" - $"sq" * $"sp", vq, vp)
        .unionAll(pair("quantity_discount",
          $"n" * $"sqd" - $"sq" * $"sd", vq, vd))
        .unionAll(pair("price_discount",
          $"n" * $"spd" - $"sp" * $"sd", vp, vd))
        .orderBy($"pair")
    }),

    // Time-weighted mean — each event's value holds until the next
    // event of the same type, so the mean weights by holding duration
    // (the billing/metrics-rollup operator sampled telemetry needs;
    // an unweighted avg over-counts bursts). All integer µs × cents
    // arithmetic in decimal(38,0); one lead() window partitioned by
    // event_type. SCALE NOTE: event_type is low-cardinality, so the
    // adjacent-difference window funnels each type through one task —
    // fine here, and the segmented two-level form (bucket by day,
    // chain bucket boundaries over the tiny per-day frame) is the
    // 100 TB path; twAdjacent/twSegmented below are proven equal in
    // AnalyticsSpec so the bench query keeps the oracle-simple shape.
    "q44_time_weighted" -> ((s, d) =>
      twAdjacent(Tables.load(s, d, "events"))),

    // Top-20 session paths: gap-sessionize (q15's 30-min rule), then
    // rank whole session shapes — THE product-analytics query behind
    // "what do users actually do in a visit". Session ids are a
    // running sum of gap flags over the same (user, ts) window sort
    // the lag needed (one exchange serves lag + cumsum); paths build
    // via group-local array_sort like q42 (no second window); the
    // final count lands on path strings whose cardinality is bounded
    // by real behavior, with a TakeOrdered(20) on top — never a full
    // sort of the path table.
    "q45_session_paths" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.load(s, d, "events")
        .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(w))
        .withColumn("new_s",
          when($"prev_us".isNull ||
            unix_micros($"ts") - $"prev_us" > SessionGapUs, 1L)
            .otherwise(0L))
        .withColumn("sess", sum($"new_s").over(
          w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
        .select($"user_id", $"sess",
          struct($"ts", $"event_id",
            substring($"event_type", 1, 1).as("ch")).as("e"))
        .groupBy($"user_id", $"sess")
        .agg(array_sort(collect_list($"e")).as("es"))
        .select(array_join(transform($"es", e => e.getField("ch")), ">")
          .as("path"))
        .groupBy($"path")
        .agg(count(lit(1)).as("n_sessions"))
        .orderBy(desc("n_sessions"), $"path")
        .limit(20)
    }),

    // Period-over-period growth: weekly count/revenue per type with
    // week-over-week deltas — the trend panel on every ops dashboard.
    // Weeks are integer days-since-epoch-anchor ÷ 7 (no ISO-week
    // truncation, the q38 rule). The lag window runs on the POST-AGG
    // frame (|types| × |weeks| rows), so the fact table never meets a
    // window — one scan, one partial-agg shuffle, then window costs
    // proportional to the report size. growth_pct divides two exact
    // integers in double, rounded once.
    "q46_wow_growth" -> ((s, d) => {
      import s.implicits._
      val w2 = Window.partitionBy($"event_type").orderBy($"wk")
      Tables.load(s, d, "events")
        .groupBy($"event_type",
          floor(datediff(to_date($"ts"), lit("2024-01-01").cast("date"))
            / 7).cast("long").as("wk"))
        .agg(count(lit(1)).as("n"),
          sum(round($"value" * 100).cast("long")).as("cents"))
        .withColumn("prev_n", lag($"n", 1).over(w2))
        .select($"event_type", $"wk", $"n",
          round($"cents".cast("double") / 100, 2).as("revenue"),
          $"prev_n",
          when($"prev_n" > 0,
            round(lit(100.0) * ($"n" - $"prev_n") / $"prev_n", 2))
            .as("growth_pct"))
        .orderBy($"event_type", $"wk")
    }),

    // Pareto / cumulative-share: which customers cover 80% of
    // revenue. The running total uses graft.ops.PrefixSum — the
    // two-pass distributed scan — NOT a partition-less window, which
    // would drag the whole customer frame through ONE task (the only
    // Spark shape that cannot scale past a single executor's memory).
    // Revenue ranks descend via the negated-cents range key; in_top80
    // cross-multiplies integers so no float threshold can flip at a
    // boundary. The scalar total is a driver long (one reduce), the
    // same driver-scalar discipline as k-means' centroids.
    "q47_pareto" -> ((s, d) => {
      import s.implicits._
      val r = Tables.load(s, d, "orders")
        .groupBy($"o_custkey")
        .agg(sum(round($"o_totalprice" * 100).cast("long")).as("cents"))
        .withColumn("neg", -$"cents")
      val total = r.agg(sum($"cents")).as[Long].head()
      graft.ops.PrefixSum
        .runningTotal(r, Seq($"neg", $"o_custkey"), $"cents", "cum")
        .select($"o_custkey".as("custkey"),
          round($"cents".cast("double") / 100, 2).as("revenue"),
          round($"cum".cast("double") / 100, 2).as("cum_revenue"),
          round($"cum".cast("double") / lit(total).cast("double"), 4)
            .as("cum_share"),
          (($"cum" - $"cents") * 5 < lit(total) * 4).as("in_top80"))
        .orderBy($"cum")
    }),

    // First-touch attribution: of q37's all-pairs (click, purchase)
    // matches, keep each purchase's EARLIEST qualifying click — a
    // min_by aggregate over the joined frame (map-side partials, no
    // window, no second shuffle past the purchase_id groupBy, which
    // AQE coalesces with the join's user_id exchange when user
    // cardinality dominates).
    "q48_first_touch" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.load(s, d, "events")
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"event_id".as("click_id"),
          $"ts".as("click_ts"))
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"event_id".as("purchase_id"),
          $"ts".as("purchase_ts"), $"value")
      clicks.join(purchases, "user_id")
        .filter($"click_ts" <= $"purchase_ts" &&
          $"click_ts" >= $"purchase_ts" - expr("interval 30 minutes"))
        .groupBy($"purchase_id")
        .agg(first($"user_id").as("user_id"),
          first($"purchase_ts").as("p_ts"), first($"value").as("value"),
          min_by(struct($"click_ts", $"click_id"),
            struct($"click_ts", $"click_id")).as("fc"))
        .select($"user_id", $"purchase_id",
          $"fc.click_id".as("first_click_id"),
          (unix_micros($"p_ts") - unix_micros($"fc.click_ts"))
            .as("lag_us"), $"value")
        .orderBy($"user_id", $"purchase_id")
    }),

    // Bitwise aggregation — per-user event-type presence encoded as a
    // bitmask via bit_or(1 << bit): the compact-set trick funnel and
    // audience queries pre-filter with (a 64-type universe folds to
    // one long; "did view AND purchase" is one AND against a literal
    // instead of two semi-joins). The type→bit dictionary derives
    // from sorted distinct types — enum-sized, the one place a
    // single-task window is fine — and broadcasts back. Map-side
    // bit_or partials collapse each task to ≤|users| longs; the mask
    // histogram is a second tiny aggregate. All-integer → oracle-exact.
    "q68_bitmask_agg" -> ((s, d) => {
      import s.implicits._
      val w = Window.orderBy($"event_type")
      val bits = Tables.load(s, d, "events")
        .select($"event_type").distinct()
        .withColumn("bit", row_number().over(w).cast("long") - 1L)
      // deterministic 1/29 thinning so the mask histogram is non-trivial on
      // the dense fixture (otherwise every user saturates every bit)
      val masks = Tables.load(s, d, "events")
        .filter(($"event_id" + $"user_id") % 29 === 0)
        .join(broadcast(bits), Seq("event_type"))
        .groupBy($"user_id")
        .agg(bit_or(expr("shiftleft(1L, cast(bit as int))")).as("mask"))
      masks.groupBy($"mask")
        .agg(count(lit(1)).as("n_users"))
        .withColumn("n_types", bit_count($"mask").cast("long"))
        .select($"mask", $"n_types", $"n_users")
        .orderBy($"mask")
    }),

    // Point-in-time dimension lookup — the composition the SCD2 build
    // (q41) exists for: attach to each fact (purchase) the dimension
    // state valid AT ITS TIMESTAMP (the user's tier, tracked from
    // signup events). The naive plan is facts ⋈ intervals on
    // `valid_from <= ts < valid_to` — an inequality join that
    // degenerates to a per-fact interval scan. This is the
    // single-shuffle formulation instead (q27's union+window trick
    // pointed at an SCD2 dim): collapse the tracked attribute to its
    // CHANGE rows (lag filter — the q41 machinery), union them with
    // the facts, and one ordered window per user carries the current
    // state forward onto every fact. ONE hash exchange on user_id, no
    // inequality join anywhere, and the window partitions by the
    // high-cardinality key. LEFT semantics: facts before any dim row
    // keep a NULL tier (the oracle's LEFT JOIN finds no interval).
    "q69_pit_lookup" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.load(s, d, "events")
      // dim source: signup events define the user's tier. Dedupe of
      // simultaneous signups (max event_id wins, like the oracle's
      // row_number DESC) and the SCD2 change-collapse share ONE
      // user_id exchange+sort: ordering by (ts, event_id DESC) puts
      // the winner first in each ts group, so "prev row has a
      // different ts" IS the dedupe — no separate (user_id, ts)
      // window pass over the dim side.
      val chgW = Window.partitionBy($"user_id")
        .orderBy($"ts", $"event_id".desc)
      val signups = ev.filter($"event_type" === "signup")
        .withColumn("tier", floor($"value" / 100).cast("long"))
        .withColumn("prev_ts", lag($"ts", 1).over(chgW))
        .filter($"prev_ts".isNull || $"prev_ts" =!= $"ts")
      // SCD2 collapse: a dim row survives only when the tier CHANGES
      // (same window spec → Catalyst reuses the exchange and sort)
      val dim = signups
        .withColumn("prev_tier", lag($"tier", 1).over(chgW))
        .filter($"prev_tier".isNull || $"prev_tier" =!= $"tier")
        .select($"user_id", $"ts", $"tier".as("mark_tier"),
          $"ts".as("mark_from"), lit(1).as("is_mark"),
          lit(null).cast("long").as("event_id"))
      val facts = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", lit(null).cast("long").as("mark_tier"),
          lit(null).cast("timestamp").as("mark_from"), lit(0).as("is_mark"),
          $"event_id")
      // marks sort before facts at equal ts (is_mark desc): a tier
      // change at exactly the purchase instant applies (>= semantics,
      // same boundary as the oracle's valid_from <= ts)
      val pitW = Window.partitionBy($"user_id")
        .orderBy($"ts", $"is_mark".desc)
        .rowsBetween(Window.unboundedPreceding, 0)
      dim.unionByName(facts)
        .withColumn("tier", last($"mark_tier", ignoreNulls = true).over(pitW))
        .withColumn("valid_from",
          last($"mark_from", ignoreNulls = true).over(pitW))
        .filter($"is_mark" === 0)
        .select($"event_id", $"user_id", $"ts", $"tier", $"valid_from")
        .orderBy($"event_id")
    }),

    // Incremental aggregate maintenance (IVM): the base corpus's
    // per-customer partial aggregates are MERGED with a delta batch's
    // partials — counts add, sums add, min/max fold — instead of
    // rescanning the base. The oracle computes the direct one-pass
    // aggregate over the full table, so the hash match IS the proof
    // that merge(partial(base), partial(delta)) == recompute(full).
    // At 100 TB this is the only affordable shape: yesterday's
    // partials are table-sized-in-groups (not in rows), and each new
    // batch touches only its own data. All-integer state; the derived
    // mean is exact integer division on both engines.
    "q64_incremental_agg" -> ((s, d) => {
      import s.implicits._
      val o = Tables.load(s, d, "orders")
        .select($"o_custkey",
          datediff(to_date($"o_orderdate"), lit("1992-01-01"))
            .cast("long").as("od"),
          round($"o_totalprice" * 100).cast("long").as("cents"))
      def partial(df: org.apache.spark.sql.DataFrame) =
        df.groupBy($"o_custkey").agg(
          count(lit(1)).as("n"), sum($"cents").as("c"),
          min($"od").as("lo"), max($"od").as("hi"))
      val cut = 1827L // days 1992-01-01 → 1997-01-01
      val base  = partial(o.filter($"od" <  cut))
      val delta = partial(o.filter($"od" >= cut))
      base.unionAll(delta)
        .groupBy($"o_custkey")
        .agg(sum($"n").as("n_orders"), sum($"c").as("cents"),
          min($"lo").as("first_day"), max($"hi").as("last_day"))
        .withColumn("avg_cents", expr("cents div n_orders"))
        .orderBy($"o_custkey")
    }))

  /** q44's oracle-shaped form: one lead() per event_type partition.
    * Exact-integer numerator/denominator; final division is the only
    * float op. Factored out so AnalyticsSpec can equate it with the
    * segmented scale form on the same input.
    */
  def twAdjacent(events: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val w = Window.partitionBy(col("event_type"))
      .orderBy(col("ts"), col("event_id"))
    events
      .withColumn("c", round(col("value") * 100).cast("long"))
      .withColumn("t", unix_micros(col("ts")))
      .withColumn("t_next", lead(col("t"), 1).over(w))
      .filter(col("t_next").isNotNull)
      .groupBy(col("event_type"))
      .agg(
        sum((col("c").cast(dec)) * (col("t_next") - col("t")).cast(dec))
          .as("num"),
        sum((col("t_next") - col("t")).cast(dec)).as("den"),
        count(lit(1)).as("n_intervals"))
      .select(col("event_type"),
        round(col("num").cast("double") / col("den").cast("double") / 100,
          4).as("tw_mean"),
        col("n_intervals"))
      .orderBy(col("event_type"))
  }

  /** q44's 100 TB form: adjacent differences INSIDE (type, day)
    * buckets — high-cardinality window partitions, so no single task
    * owns a whole type — plus a boundary chain over the tiny
    * (type, day) summary frame (last event of a bucket holds until
    * the first event of the next non-empty bucket). The two-level
    * split telescopes to exactly twAdjacent's sum; AnalyticsSpec
    * asserts equality row-for-row.
    */
  def twSegmented(events: DataFrame): DataFrame = {
    val dec = "decimal(38,0)"
    val e = events
      .withColumn("c", round(col("value") * 100).cast("long"))
      .withColumn("t", unix_micros(col("ts")))
      .withColumn("day", to_date(col("ts")))
    val wIn = Window.partitionBy(col("event_type"), col("day"))
      .orderBy(col("ts"), col("event_id"))
    // within-bucket adjacent intervals (exclude each bucket's last row)
    val inner = e
      .withColumn("t_next", lead(col("t"), 1).over(wIn))
      .filter(col("t_next").isNotNull)
      .groupBy(col("event_type"))
      .agg(sum(col("c").cast(dec) * (col("t_next") - col("t")).cast(dec))
          .as("num"),
        sum((col("t_next") - col("t")).cast(dec)).as("den"),
        count(lit(1)).as("n"))
    // per-bucket first/last markers → chain across buckets. max_by /
    // min_by keep this a plain aggregate (no second window over rows).
    val wDay = Window.partitionBy(col("event_type")).orderBy(col("day"))
    val edges = e.groupBy(col("event_type"), col("day"))
      .agg(min_by(struct(col("t")), struct(col("ts"), col("event_id")))
          .getField("t").as("first_t"),
        max_by(struct(col("t"), col("c")), struct(col("ts"), col("event_id")))
          .as("last"))
      .withColumn("next_first_t", lead(col("first_t"), 1).over(wDay))
      .filter(col("next_first_t").isNotNull)
      .groupBy(col("event_type"))
      .agg(sum(col("last.c").cast(dec) *
          (col("next_first_t") - col("last.t")).cast(dec)).as("num"),
        sum((col("next_first_t") - col("last.t")).cast(dec)).as("den"),
        count(lit(1)).as("n"))
    inner.unionAll(edges)
      .groupBy(col("event_type"))
      .agg(sum(col("num")).as("num"), sum(col("den")).as("den"),
        sum(col("n")).as("n_intervals"))
      .select(col("event_type"),
        round(col("num").cast("double") / col("den").cast("double") / 100,
          4).as("tw_mean"),
        col("n_intervals"))
      .orderBy(col("event_type"))
  }

  def oracles: Map[String, String] = Map(
    "q69_pit_lookup" ->
      """WITH s0 AS (
           SELECT user_id, ts, event_id,
             CAST(floor(value / 100) AS BIGINT) AS tier,
             row_number() OVER (PARTITION BY user_id, ts
                                ORDER BY event_id DESC) AS rn
           FROM events WHERE event_type = 'signup'),
         s1 AS (SELECT user_id, ts, tier FROM s0 WHERE rn = 1),
         chg AS (
           SELECT user_id, ts, tier,
             lag(tier) OVER (PARTITION BY user_id ORDER BY ts)
               AS prev_tier
           FROM s1),
         dim AS (
           SELECT user_id, ts AS valid_from, tier,
             lead(ts) OVER (PARTITION BY user_id ORDER BY ts)
               AS valid_to
           FROM chg WHERE prev_tier IS NULL OR prev_tier <> tier),
         f AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'purchase')
         SELECT f.event_id, f.user_id, f.ts, d.tier,
                CAST(d.valid_from AS TIMESTAMP) AS valid_from
         FROM f LEFT JOIN dim d
           ON f.user_id = d.user_id AND f.ts >= d.valid_from
              AND (d.valid_to IS NULL OR f.ts < d.valid_to)
         ORDER BY f.event_id""",
    "q68_bitmask_agg" ->
      """WITH bits AS (
           SELECT event_type,
             CAST(row_number() OVER (ORDER BY event_type) AS BIGINT) - 1
               AS bit
           FROM (SELECT DISTINCT event_type FROM events)),
         masks AS (
           SELECT e.user_id,
             CAST(bit_or(1 << b.bit) AS BIGINT) AS mask
           FROM events e JOIN bits b ON e.event_type = b.event_type
           WHERE (e.event_id + e.user_id) % 29 = 0
           GROUP BY 1)
         SELECT mask, CAST(bit_count(mask) AS BIGINT) AS n_types,
           count(*) AS n_users
         FROM masks GROUP BY 1 ORDER BY mask""",
    "q64_incremental_agg" ->
      """SELECT o_custkey,
           count(*) AS n_orders,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) AS BIGINT)
             AS cents,
           CAST(min(datediff('day', DATE '1992-01-01',
             CAST(o_orderdate AS DATE))) AS BIGINT) AS first_day,
           CAST(max(datediff('day', DATE '1992-01-01',
             CAST(o_orderdate AS DATE))) AS BIGINT) AS last_day,
           CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT)) // count(*)
             AS BIGINT) AS avg_cents
         FROM orders
         GROUP BY o_custkey
         ORDER BY o_custkey""",
    "q56_null_safe_join" ->
      """WITH a AS (
           SELECT CASE WHEN event_id % 5 = 0 THEN NULL
                       ELSE event_id % 50 END AS k,
             count(*) AS n_5
           FROM events GROUP BY 1),
         b AS (
           SELECT CASE WHEN event_id % 3 = 0 THEN NULL
                       ELSE event_id % 50 END AS k,
             count(*) AS n_3
           FROM events GROUP BY 1)
         SELECT a.k, a.n_5, b.n_3
         FROM a JOIN b ON a.k IS NOT DISTINCT FROM b.k
         ORDER BY a.k""",
    // try_* failures are replayed as explicit CASE NULLs over the
    // same planted failure rows (the oracle has no job to save)
    "q55_try_arith" ->
      """SELECT event_id,
           CASE WHEN event_id % 7 = 0 THEN NULL
                ELSE value / CAST(event_id % 7 AS DOUBLE) END AS safe_div,
           TRY_CAST(CASE WHEN event_id % 5 = 0 THEN 'n/a'
                ELSE CAST(event_id * 3 AS VARCHAR) END AS BIGINT)
             AS safe_cast,
           CASE WHEN event_id % 11 = 0 THEN NULL
                ELSE event_id + 1 END AS safe_add,
           CASE WHEN event_id % 11 = 0 THEN NULL
                ELSE event_id * 2 END AS safe_mul,
           CAST(event_id % 1000 AS BIGINT) AS safe_num
         FROM events ORDER BY event_id""",
    // the schema literal replays Spark's schema_of_variant formatting
    // for the (uniform) augmented shape — empirically pinned; a shape
    // drift in the corpus would fail the hash gate loudly
    "q54_variant" ->
      """SELECT event_id,
           CAST(event_id % 5 AS BIGINT) AS gen,
           't' || CAST(event_id % 3 AS VARCHAR) AS tag0,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k_val,
           'OBJECT<meta: OBJECT<gen: BIGINT, tags: ARRAY<STRING>>, ' ||
             'nul: VOID, props: OBJECT<k: BIGINT>>' AS v_schema,
           true AS nul_is_vnull,
           true AS missing_is_null
         FROM events ORDER BY event_id""",
    "q53_map_funcs" ->
      """SELECT event_id,
           CAST(len(json_keys(props)) AS BIGINT) AS n_entries,
           array_to_string(list_sort(json_keys(props)), ',')
             AS keys_sorted,
           json_extract_string(props, '$.k') AS k_val,
           array_to_string(list_transform(
             list_sort(json_keys(props) || ['src']),
             k -> k || '=' || upper(CASE WHEN k = 'src' THEN event_type
               ELSE json_extract_string(props, '$.' || k) END)), '&')
             AS kv
         FROM events ORDER BY event_id""",
    "q52_session_window" ->
      """WITH e AS (
           SELECT user_id, event_id, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS prev_us
           FROM events),
         m AS (
           SELECT user_id, us,
             CAST(sum(CASE WHEN prev_us IS NULL
                           OR us - prev_us >= 1800000000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS sess
           FROM e)
         SELECT user_id,
           CAST(min(us) AS BIGINT) AS s_start_us,
           CAST(max(us) + 1800000000 AS BIGINT) AS s_end_us,
           count(*) AS n_events
         FROM m GROUP BY user_id, sess
         ORDER BY user_id, s_start_us""",
    "q51_profile" ->
      """WITH one AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN l_quantity IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_q,
             CAST(count(DISTINCT l_quantity) AS BIGINT) AS nd_q,
             round(min(l_quantity), 2) AS mn_q, round(max(l_quantity), 2) AS mx_q,
             CAST(sum(CASE WHEN l_extendedprice IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_p,
             CAST(count(DISTINCT l_extendedprice) AS BIGINT) AS nd_p,
             round(min(l_extendedprice), 2) AS mn_p, round(max(l_extendedprice), 2) AS mx_p,
             CAST(sum(CASE WHEN l_discount IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_d,
             CAST(count(DISTINCT l_discount) AS BIGINT) AS nd_d,
             round(min(l_discount), 2) AS mn_d, round(max(l_discount), 2) AS mx_d,
             CAST(sum(CASE WHEN l_tax IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS nn_t,
             CAST(count(DISTINCT l_tax) AS BIGINT) AS nd_t,
             round(min(l_tax), 2) AS mn_t, round(max(l_tax), 2) AS mx_t
           FROM lineitem)
         SELECT 'l_discount' AS "column", n AS n_rows, nn_d AS n_null,
           nd_d AS n_distinct, mn_d AS vmin, mx_d AS vmax FROM one
         UNION ALL
         SELECT 'l_extendedprice', n, nn_p, nd_p, mn_p, mx_p FROM one
         UNION ALL
         SELECT 'l_quantity', n, nn_q, nd_q, mn_q, mx_q FROM one
         UNION ALL
         SELECT 'l_tax', n, nn_t, nd_t, mn_t, mx_t FROM one
         ORDER BY "column"""",
    "q50_value_window" ->
      """SELECT o_custkey, n_orders, first_date, second_date, last_date
         FROM (
           SELECT o_custkey,
             row_number() OVER w AS rn,
             CAST(count(*) OVER wf AS BIGINT) AS n_orders,
             first_value(o_orderdate) OVER wf AS first_date,
             nth_value(o_orderdate, 2) OVER wf AS second_date,
             last_value(o_orderdate) OVER wf AS last_date
           FROM orders
           WINDOW
             w AS (PARTITION BY o_custkey
                   ORDER BY o_orderdate, o_orderkey),
             wf AS (PARTITION BY o_custkey
                    ORDER BY o_orderdate, o_orderkey
                    ROWS BETWEEN UNBOUNDED PRECEDING
                    AND UNBOUNDED FOLLOWING))
         WHERE rn = 1 ORDER BY o_custkey""",
    "q49_outer_join" ->
      """WITH r94 AS (
           SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS c94
           FROM orders WHERE year(o_orderdate) = 1994 GROUP BY 1),
         r95 AS (
           SELECT o_custkey,
             CAST(sum(CAST(round(o_totalprice * 100) AS BIGINT))
               AS BIGINT) AS c95
           FROM orders WHERE year(o_orderdate) = 1995 GROUP BY 1)
         SELECT coalesce(r94.o_custkey, r95.o_custkey) AS o_custkey,
           round(CAST(coalesce(c94, 0) AS DOUBLE) / 100, 2) AS rev_1994,
           round(CAST(coalesce(c95, 0) AS DOUBLE) / 100, 2) AS rev_1995,
           round(CAST(coalesce(c95, 0) - coalesce(c94, 0) AS DOUBLE)
             / 100, 2) AS delta
         FROM r94 FULL OUTER JOIN r95 ON r94.o_custkey = r95.o_custkey
         ORDER BY o_custkey""",
    "q39_unpivot" ->
      """WITH t AS (
           SELECT measure, val, CAST(round(val * 100) AS BIGINT) AS c
           FROM (
             SELECT 'l_quantity' AS measure, l_quantity AS val
             FROM lineitem
             UNION ALL SELECT 'l_extendedprice', l_extendedprice
             FROM lineitem
             UNION ALL SELECT 'l_discount', l_discount FROM lineitem
             UNION ALL SELECT 'l_tax', l_tax FROM lineitem))
         SELECT measure, count(*) AS n,
           round(CAST(sum(c) AS DOUBLE) / 100, 2) AS total,
           round(min(val), 2) AS vmin, round(max(val), 2) AS vmax
         FROM t GROUP BY measure ORDER BY measure""",
    "q40_path_transitions" ->
      """WITH o AS (
           SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS next_type
           FROM events)
         SELECT event_type AS src, next_type AS dst, count(*) AS n
         FROM o WHERE next_type IS NOT NULL
         GROUP BY 1, 2 ORDER BY src, dst""",
    "q41_scd2" ->
      """WITH o AS (
           SELECT user_id, event_type, ts, event_id,
             lag(event_type) OVER w AS prev_type
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         changes AS (
           SELECT user_id, event_type, ts, event_id FROM o
           WHERE prev_type IS NULL OR prev_type <> event_type)
         SELECT user_id, event_type AS state,
           CAST(ts AS TIMESTAMP) AS valid_from,
           CAST(lead(ts) OVER w2 AS TIMESTAMP) AS valid_to,
           lead(ts) OVER w2 IS NULL AS is_current
         FROM changes
         WINDOW w2 AS (PARTITION BY user_id ORDER BY ts, event_id)
         ORDER BY user_id, valid_from, state""",
    "q42_seq_match" ->
      """WITH paths AS (
           SELECT user_id,
             string_agg(substr(event_type, 1, 1), ''
               ORDER BY ts, event_id) AS path
           FROM events GROUP BY user_id)
         SELECT user_id, CAST(length(path) AS BIGINT) AS n_events,
           regexp_matches(path, 'v[^p]*c[^p]*p') AS converted
         FROM paths ORDER BY user_id""",
    "q43_corr_matrix" ->
      """WITH t AS (
           SELECT CAST(round(l_quantity * 100) AS BIGINT) AS q,
             CAST(round(l_extendedprice * 100) AS BIGINT) AS p,
             CAST(round(l_discount * 100) AS BIGINT) AS d
           FROM lineitem),
         m AS (
           SELECT count(*) AS n,
             sum(q) AS sq, sum(p) AS sp, sum(d) AS sd,
             sum(q*q) AS sqq, sum(p*p) AS spp, sum(d*d) AS sdd,
             sum(q*p) AS sqp, sum(q*d) AS sqd, sum(p*d) AS spd
           FROM t)
         SELECT pair, round(num / sqrt(den1 * den2), 4) + 0.0 AS corr FROM (
           SELECT 'quantity_price' AS pair,
             CAST(n*sqp - sq*sp AS DOUBLE) AS num,
             CAST(n*sqq - sq*sq AS DOUBLE) AS den1,
             CAST(n*spp - sp*sp AS DOUBLE) AS den2 FROM m
           UNION ALL SELECT 'quantity_discount',
             CAST(n*sqd - sq*sd AS DOUBLE),
             CAST(n*sqq - sq*sq AS DOUBLE),
             CAST(n*sdd - sd*sd AS DOUBLE) FROM m
           UNION ALL SELECT 'price_discount',
             CAST(n*spd - sp*sd AS DOUBLE),
             CAST(n*spp - sp*sp AS DOUBLE),
             CAST(n*sdd - sd*sd AS DOUBLE) FROM m)
         ORDER BY pair""",
    "q44_time_weighted" ->
      """WITH o AS (
           SELECT event_type,
             CAST(round(value * 100) AS BIGINT) AS c,
             epoch_us(ts) AS t,
             lead(epoch_us(ts)) OVER (PARTITION BY event_type
               ORDER BY ts, event_id) AS t_next
           FROM events)
         SELECT event_type,
           round(CAST(sum(c * (t_next - t)) AS DOUBLE)
             / CAST(sum(t_next - t) AS DOUBLE) / 100, 4) AS tw_mean,
           count(*) AS n_intervals
         FROM o WHERE t_next IS NOT NULL
         GROUP BY event_type ORDER BY event_type""",
    "q45_session_paths" ->
      """WITH o AS (
           SELECT user_id, event_type, ts, event_id,
             CASE WHEN epoch_us(ts) - lag(epoch_us(ts)) OVER w
                    > 1800000000
                  OR lag(ts) OVER w IS NULL THEN 1 ELSE 0 END AS new_s
           FROM events
           WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
         s AS (
           SELECT user_id, event_type, ts, event_id,
             sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
               ROWS UNBOUNDED PRECEDING) AS sess
           FROM o),
         paths AS (
           SELECT user_id, sess,
             string_agg(substr(event_type, 1, 1), '>'
               ORDER BY ts, event_id) AS path
           FROM s GROUP BY user_id, sess)
         SELECT path, count(*) AS n_sessions
         FROM paths GROUP BY path
         ORDER BY n_sessions DESC, path LIMIT 20""",
    "q46_wow_growth" ->
      """WITH w AS (
           SELECT event_type,
             CAST(datediff('day', DATE '2024-01-01', CAST(ts AS DATE))
               // 7 AS BIGINT) AS wk,
             count(*) AS n,
             sum(CAST(round(value * 100) AS BIGINT)) AS cents
           FROM events GROUP BY 1, 2)
         SELECT event_type, wk, n,
           round(CAST(cents AS DOUBLE) / 100, 2) AS revenue,
           lag(n) OVER w2 AS prev_n,
           CASE WHEN lag(n) OVER w2 > 0 THEN
             round(100.0 * (n - lag(n) OVER w2) / lag(n) OVER w2, 2) END
             AS growth_pct
         FROM w WINDOW w2 AS (PARTITION BY event_type ORDER BY wk)
         ORDER BY event_type, wk""",
    "q47_pareto" ->
      """WITH r AS (
           SELECT o_custkey, sum(CAST(round(o_totalprice * 100)
             AS BIGINT)) AS cents
           FROM orders GROUP BY o_custkey),
         t AS (SELECT sum(cents) AS total FROM r),
         c AS (
           SELECT o_custkey, cents,
             sum(cents) OVER (ORDER BY cents DESC, o_custkey
               ROWS UNBOUNDED PRECEDING) AS cum
           FROM r)
         SELECT c.o_custkey AS custkey,
           round(CAST(cents AS DOUBLE) / 100, 2) AS revenue,
           round(CAST(cum AS DOUBLE) / 100, 2) AS cum_revenue,
           round(CAST(cum AS DOUBLE) / CAST(t.total AS DOUBLE), 4)
             AS cum_share,
           (cum - cents) * 5 < t.total * 4 AS in_top80
         FROM c, t ORDER BY cum""",
    "q48_first_touch" ->
      """WITH pairs AS (
           SELECT c.user_id, p.event_id AS purchase_id, p.ts AS p_ts,
             p.value, c.event_id AS click_id, c.ts AS c_ts
           FROM events c JOIN events p ON c.user_id = p.user_id
           WHERE c.event_type = 'click' AND p.event_type = 'purchase'
             AND c.ts <= p.ts AND c.ts >= p.ts - INTERVAL 30 MINUTE),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY purchase_id
             ORDER BY c_ts, click_id) AS rk
           FROM pairs)
         SELECT user_id, purchase_id, click_id AS first_click_id,
           epoch_us(p_ts) - epoch_us(c_ts) AS lag_us, value
         FROM r WHERE rk = 1
         ORDER BY user_id, purchase_id""")
}
