package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Relational operator coverage (SURVEY.md §2b): filter/project with
  * pushdown, joins of every flavor, hash aggregation, rollup/cube,
  * window functions, sort/top-k, set operations, distinct aggregation,
  * JSON scalar functions, time bucketing, and sessionization.
  *
  * Every query has a DuckDB oracle. Parity rules (SURVEY.md §7.4):
  * money aggregates are `round(_, 2)`; counts stay BIGINT in both
  * engines; int-width-changing functions (year) are cast explicitly;
  * every result is deterministically ordered.
  */
object Relational {

  def queries: Map[String, Q] = Map(

    // NOT IN vs NOT EXISTS under NULLs — the three-valued-logic
    // corner every migration hits: a single NULL in the subquery
    // makes `k NOT IN (...)` return ZERO rows (k <> NULL is UNKNOWN,
    // so no row can pass), while NOT EXISTS / the IS NOT NULL-guarded
    // NOT IN ignore it. Spark plans the unguarded form as a
    // NULL-AWARE ANTI JOIN (BroadcastHashJoin LeftAnti with
    // isNullAwareAntiJoin=true — broadcast-ONLY, no shuffled
    // fallback), so at 100 TB the guarded rewrite is not a style
    // choice but the only scalable plan; this query pins both
    // semantics side by side. The subquery scopes to supplier 1's
    // parts with a deterministically planted NULL (partkey % 97).
    "q116_null_aware_antijoin" -> ((s, d) => {
      Tables.load(s, d, "part").createOrReplaceTempView("part_naaj")
      Tables.load(s, d, "lineitem")
        .createOrReplaceTempView("lineitem_naaj")
      s.sql("""
        WITH sub AS (
          SELECT CASE WHEN l_partkey % 97 = 0 THEN NULL
                      ELSE l_partkey END AS pk
          FROM lineitem_naaj
          WHERE l_suppkey = 1 OR l_partkey % 97 = 0)
        SELECT
          (SELECT count(*) FROM part_naaj) AS n_parts,
          (SELECT count(*) FROM part_naaj
            WHERE p_partkey NOT IN (SELECT pk FROM sub)) AS n_not_in,
          (SELECT count(*) FROM part_naaj p
            WHERE NOT EXISTS (SELECT 1 FROM sub
                              WHERE sub.pk = p.p_partkey))
            AS n_not_exists,
          (SELECT count(*) FROM part_naaj
            WHERE p_partkey NOT IN (SELECT pk FROM sub
                                    WHERE pk IS NOT NULL))
            AS n_guarded""")
    }),

    // Spark 4 SQL UDF (CREATE FUNCTION ... RETURN expr) — the
    // user-extension surface that stays INSIDE Catalyst: the body is
    // inlined into the plan at analysis, so it folds, pushes down,
    // and codegens like any built-in (no JVM-closure black box, no
    // serialization wall — the opposite of a Scala UDF). The margin
    // formula runs on integer cents/percent so the UDF is exact and
    // the oracle can inline the identical arithmetic.
    "q65_sql_udf" -> ((s, d) => {
      import s.implicits._
      s.sql("""CREATE OR REPLACE TEMPORARY FUNCTION graft_margin_e4(
                 price DOUBLE, disc DOUBLE, tax DOUBLE) RETURNS BIGINT
               RETURN CAST(round(price * 100) AS BIGINT)
                 * (100 - CAST(round(disc * 100) AS BIGINT))
                 * (100 + CAST(round(tax * 100) AS BIGINT))""")
      Tables.load(s, d, "lineitem").createOrReplaceTempView("li_udf")
      s.sql("""SELECT l_returnflag,
                 count(*) AS n,
                 sum(graft_margin_e4(l_extendedprice, l_discount, l_tax))
                   AS margin_e4
               FROM li_udf
               WHERE graft_margin_e4(l_extendedprice, l_discount, l_tax)
                 > 0
               GROUP BY l_returnflag
               ORDER BY l_returnflag""")
    }),

    // Join-strategy hint surface — the optimizer-control escape hatch
    // for when the planner's default is wrong at cluster scale (a
    // "small" dim that isn't, a sort order worth reusing). Both dims
    // here are broadcast-sized, so the hints VISIBLY override the
    // default choice: supplier is forced through a shuffled hash join,
    // part through a sort-merge join (PlanGuardSpec asserts both exec
    // nodes; results are strategy-invariant, which the oracle proves).
    "q66_join_hints" -> ((s, d) => {
      import s.implicits._
      val li = Tables.load(s, d, "lineitem")
      val a = li
        .join(Tables.load(s, d, "supplier").hint("shuffle_hash"),
          $"l_suppkey" === $"s_suppkey")
        .groupBy($"s_nationkey".cast("long").as("k"))
        .agg(count(lit(1)).as("n"))
        .select(lit("supplier_nation").as("dim"), $"k", $"n")
      val b = li
        .join(Tables.load(s, d, "part").hint("merge"),
          $"l_partkey" === $"p_partkey")
        .groupBy($"p_size".cast("long").as("k"))
        .agg(count(lit(1)).as("n"))
        .select(lit("part_size").as("dim"), $"k", $"n")
      a.unionAll(b).orderBy($"dim", $"k")
    }),

    "q1_agg" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "lineitem")
        .groupBy($"l_returnflag", $"l_linestatus")
        .agg(
          round(sum($"l_quantity"), 2).as("sum_qty"),
          round(sum($"l_extendedprice"), 2).as("sum_base_price"),
          // product of 2dp values lands arbitrarily on the cent grid,
          // so round(sum(double), 2) can flip at a half-cent boundary
          // where engines' sums differ by ulps (bit q3 at sf0.1);
          // integer-cents sum is order-independent and exact. Plain
          // 2dp sums (qty, base price) sit ~1e-7 from a grid point —
          // no boundary to hit — and stay in the rounded form.
          (sum(round($"l_extendedprice" * 100).cast("long") *
            (lit(100L) - round($"l_discount" * 100).cast("long"))) /
            10000.0).as("sum_disc_price"),
          count(lit(1)).as("count_order"))
        .orderBy($"l_returnflag", $"l_linestatus")
    }),

    "q2_filter_project" -> ((s, d) => {
      import s.implicits._
      // Predicate + projection both reach the parquet scan
      // (PushedFilters / ReadSchema in the formatted plan).
      Tables.load(s, d, "part")
        .filter($"p_size" >= 30 && $"p_type" === "ECONOMY")
        .select($"p_partkey", $"p_name", $"p_brand", $"p_retailprice")
        .orderBy($"p_partkey")
    }),

    "q3_join_agg" -> ((s, d) => {
      import s.implicits._
      val c = Tables.load(s, d, "customer")
      val o = Tables.load(s, d, "orders")
      val l = Tables.load(s, d, "lineitem")
      // customer is the small side at every SF — broadcast it; the
      // orders⋈lineitem join shuffles on the shared orderkey.
      l.join(o, l("l_orderkey") === o("o_orderkey"))
        .join(broadcast(c), o("o_custkey") === c("c_custkey"))
        .filter(o("o_orderstatus") === "O")
        .groupBy(c("c_custkey"), c("c_name"))
        .agg(
          // exact integer-cents arithmetic: prices/discounts are 2dp
          // values, so round(x*100) recovers exact integers and the
          // revenue sum is a BIGINT sum — order-independent and
          // bit-identical across engines — with ONE final division.
          // The round(sum(double), 2) formulation flipped a cent at
          // sf0.1 where the float sum landed on a half-cent boundary
          // (Spark rounds the decimal string, DuckDB the raw double).
          (sum(round($"l_extendedprice" * 100).cast("long") *
            (lit(100L) - round($"l_discount" * 100).cast("long"))) /
            10000.0).as("revenue"),
          count(lit(1)).as("n_items"))
        .orderBy(desc("revenue"), $"c_custkey")
        .limit(100)
    }),

    "q4_semijoin" -> ((s, d) => {
      import s.implicits._
      val o = Tables.load(s, d, "orders")
      val bigLines = Tables.load(s, d, "lineitem")
        .filter($"l_quantity" >= 48).select($"l_orderkey")
      o.join(bigLines, o("o_orderkey") === bigLines("l_orderkey"), "left_semi")
        .groupBy($"o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .orderBy($"o_orderpriority")
    }),

    "q5_antijoin" -> ((s, d) => {
      import s.implicits._
      val c = Tables.load(s, d, "customer")
      val pending = Tables.load(s, d, "orders")
        .filter($"o_orderstatus" === "P").select($"o_custkey")
      c.join(pending, c("c_custkey") === pending("o_custkey"), "left_anti")
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n_customers"),
          round(sum($"c_acctbal"), 2).as("total_bal"))
        .orderBy($"c_mktsegment")
    }),

    "q6_window" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val w = Window.partitionBy($"o_custkey")
        .orderBy(desc("o_totalprice"), $"o_orderkey")
      Tables.load(s, d, "orders")
        .withColumn("rn", row_number().over(w))
        .withColumn("prev_price", lag($"o_totalprice", 1).over(w))
        .filter($"rn" <= 3)
        .select($"o_custkey", $"rn".cast("long").as("rn"), $"o_orderkey",
          $"o_totalprice",
          round(coalesce($"prev_price" - $"o_totalprice", lit(0.0)), 2)
            .as("gap_from_prev"))
        .orderBy($"o_custkey", $"rn")
    }),

    // RANGE-frame window: per-customer rolling 30-day revenue — the
    // value-based frame (rangeBetween on a day offset) where q6's
    // frames are row-based. Sum rides integer cents so both engines
    // fold exactly (q1 precedent); the frame key is integer days since
    // epoch, identical arithmetic cross-engine. Scale shape: one
    // hash-shuffle on o_custkey, per-partition sort, single window
    // pass — the same cost class as any partitioned window.
    "q30_rolling_window" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      val w = Window.partitionBy($"o_custkey").orderBy($"day")
        .rangeBetween(-29, Window.currentRow)
      Tables.load(s, d, "orders")
        .withColumn("day", datediff($"o_orderdate", lit("1970-01-01"))
          .cast("long"))
        .withColumn("cents", round($"o_totalprice" * 100).cast("long"))
        .withColumn("roll_cents", sum($"cents").over(w))
        .withColumn("n_in_window", count(lit(1)).over(w))
        .select($"o_custkey", $"o_orderkey", $"day",
          round($"roll_cents".cast("double") / 100, 2).as("rolling_30d"),
          $"n_in_window")
        .orderBy($"o_custkey", $"day", $"o_orderkey")
    }),

    "q7_topk" -> ((s, d) => {
      import s.implicits._
      // orderBy+limit => TakeOrderedAndProject: per-partition top-k then
      // a single driver merge — no full sort at scale.
      Tables.load(s, d, "orders")
        .select($"o_orderkey", $"o_custkey", $"o_totalprice")
        .orderBy(desc("o_totalprice"), $"o_orderkey")
        .limit(100)
    }),

    "q8_setops" -> ((s, d) => {
      import s.implicits._
      val custN = Tables.load(s, d, "customer")
        .select($"c_nationkey".as("nationkey")).distinct()
      val suppN = Tables.load(s, d, "supplier")
        .select($"s_nationkey".as("nationkey")).distinct()
      custN.intersect(suppN).withColumn("tag", lit("both"))
        .unionByName(custN.except(suppN).withColumn("tag", lit("cust_only")))
        .unionByName(suppN.except(custN).withColumn("tag", lit("supp_only")))
        .select($"tag", $"nationkey")
        .orderBy($"tag", $"nationkey")
    }),

    "q9_rollup" -> ((s, d) => {
      import s.implicits._
      val c = Tables.load(s, d, "customer")
      val n = Tables.load(s, d, "nation")
      val r = Tables.load(s, d, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .rollup($"r_name", $"n_name")
        .agg(round(sum($"c_acctbal"), 2).as("total_bal"),
          count(lit(1)).as("n_cust"))
        .orderBy(asc_nulls_first("r_name"), asc_nulls_first("n_name"))
    }),

    "q10_distinct" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "lineitem").agg(
        countDistinct($"l_partkey").as("n_parts"),
        countDistinct($"l_suppkey").as("n_supps"),
        countDistinct($"l_returnflag", $"l_linestatus").as("n_flag_status"),
        count(lit(1)).as("n_rows"))
    }),

    "q11_events_props" -> ((s, d) => {
      import s.implicits._
      // JSON scalar path: props is a raw JSON string column.
      Tables.load(s, d, "events")
        .withColumn("k", get_json_object($"props", "$.k").cast("double"))
        .groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          round(sum($"value"), 2).as("sum_value"),
          round(sum($"k"), 2).as("sum_k"),
          max($"k").as("max_k"))
        .orderBy($"event_type")
    }),

    "q12_time_window" -> ((s, d) => {
      import s.implicits._
      // Batch twin of the streaming tumbling window (graft.streaming):
      // 1-hour buckets over event time.
      Tables.load(s, d, "events")
        .withColumn("hour", date_trunc("hour", $"ts"))
        .groupBy($"hour", $"event_type")
        .agg(count(lit(1)).as("n"), round(sum($"value"), 2).as("sum_value"))
        .orderBy($"hour", $"event_type")
    }),

    "q13_dim_join" -> ((s, d) => {
      import s.implicits._
      val c = Tables.load(s, d, "customer")
      val n = Tables.load(s, d, "nation")
      val r = Tables.load(s, d, "region")
      c.join(broadcast(n), c("c_nationkey") === n("n_nationkey"))
        .join(broadcast(r), n("n_regionkey") === r("r_regionkey"))
        .groupBy($"r_name")
        .agg(count(lit(1)).as("n_customers"),
          round(sum($"c_acctbal"), 2).as("total_bal"))
        .orderBy($"r_name")
    }),

    "q14_cube" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "orders")
        .cube($"o_orderstatus", $"o_orderpriority")
        .agg(count(lit(1)).as("n"),
          round(sum($"o_totalprice"), 2).as("total"))
        .orderBy(asc_nulls_first("o_orderstatus"),
          asc_nulls_first("o_orderpriority"))
    }),

    "q15_sessionize" -> ((s, d) => {
      import org.apache.spark.sql.expressions.Window
      import s.implicits._
      // Gap-based sessionization (30 min) — the window-function batch
      // twin of streaming session_window.
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      Tables.load(s, d, "events")
        .withColumn("prev_us", lag(unix_micros($"ts"), 1).over(w))
        .withColumn("new_sess",
          when($"prev_us".isNull ||
            unix_micros($"ts") - $"prev_us" > 1800L * 1000000L, 1L)
            .otherwise(0L))
        .groupBy($"user_id")
        .agg(sum($"new_sess").as("n_sessions"), count(lit(1)).as("n_events"))
        .orderBy($"user_id")
    }),

    "q16_scalar_funcs" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "events")
        .select(
          $"event_id",
          upper($"event_type").as("type_u"),
          substring($"event_type", 1, 3).as("type3"),
          length($"event_type").cast("long").as("type_len"),
          year($"ts").cast("long").as("yr"),
          month($"ts").cast("long").as("mo"),
          dayofmonth($"ts").cast("long").as("dom"),
          round($"value" * 2.0, 2).as("value_doubled"),
          concat($"event_type", lit(":"), $"user_id").as("type_user"))
        .orderBy($"event_id")
    }),

    "q17_sql_exists" -> ((s, d) => {
      // SQL entry point: temp views + correlated EXISTS subquery
      // (Catalyst rewrites it to the same left-semi join as q4).
      Tables.load(s, d, "orders").createOrReplaceTempView("orders_v")
      Tables.load(s, d, "lineitem").createOrReplaceTempView("lineitem_v")
      s.sql("""
        SELECT o_orderpriority, count(*) AS n_orders
        FROM orders_v o
        WHERE EXISTS (SELECT 1 FROM lineitem_v l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_quantity >= 49)
        GROUP BY o_orderpriority ORDER BY o_orderpriority""")
    }),

    "q18_pivot" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "orders")
        .groupBy($"o_orderpriority")
        .pivot("o_orderstatus", Seq("F", "O", "P"))
        .agg(count(lit(1)))
        .na.fill(0L, Seq("F", "O", "P"))
        .orderBy($"o_orderpriority")
    }),

    "q19_scalar_subquery" -> ((s, d) => {
      Tables.load(s, d, "customer").createOrReplaceTempView("customer_v")
      s.sql("""
        SELECT c_mktsegment, count(*) AS n_above
        FROM customer_v
        WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer_v)
        GROUP BY c_mktsegment ORDER BY c_mktsegment""")
    }),

    "q26_multiset" -> ((s, d) => {
      import s.implicits._
      // multiset (bag) semantics: INTERSECT ALL / EXCEPT ALL keep
      // multiplicities — distinct operators from q8's set versions
      val li = Tables.load(s, d, "lineitem").select($"l_orderkey".as("k"))
      val oo = Tables.load(s, d, "orders").select($"o_orderkey".as("k"))
      li.exceptAll(oo).agg(count(lit(1)).as("n"))
        .withColumn("op", lit("except_all"))
        .unionByName(li.intersectAll(oo).agg(count(lit(1)).as("n"))
          .withColumn("op", lit("intersect_all")))
        .select($"op", $"n")
        .orderBy($"op")
    }),

    // Count-Min Sketch point estimates — the third sketch family next
    // to q29's HLL++/quantile sketches: frequency estimation in fixed
    // memory (eps·confidence-sized counter grid, merge-associative so
    // executors build partials and the driver merges — the 100 TB
    // shape for "how often does X occur" without a per-key shuffle).
    // Oracle (round 8, VERDICT r7 #7): in this regime the sketch is
    // EXACT, not approximate — eps 0.001 gives a 2719-wide grid at
    // depth 5, the key vocabulary is the handful of event types, and
    // the estimate is min-over-depth, so any key with one
    // collision-free row reports its true count. That makes the
    // plain GROUP BY count a hash-comparable oracle (the
    // text_heavy_hitters trick); ApproxAggSpec still pins the
    // general CMS guarantee (never undercounts, overcount ≤
    // eps·total) where collisions do occur.
    "q67_cms_freq" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.load(s, d, "events")
      val cms = ev.stat.countMinSketch(
        $"event_type", eps = 0.001, confidence = 0.99, seed = 42)
      val types = ev.select($"event_type").distinct()
        .orderBy($"event_type").as[String].collect()
      types.toSeq.map(t => (t, cms.estimateCount(t)))
        .toDF("event_type", "est_count")
        .orderBy($"event_type")
    }),

    "q29_approx_agg" -> ((s, d) => {
      import s.implicits._
      // Sketch aggregates — the only viable shapes for distincts and
      // quantiles at 100 TB: HyperLogLog++ (fixed ~kB state per group,
      // map-side mergeable — an exact distinct shuffles every key) and
      // the positional quantile sketch behind approx_percentile
      // (bounded state vs a full sort). Sketch OUTPUTS are
      // implementation-defined, so the registered row hashes the
      // sketch CONTRACT instead (r15 verdict item #3 — this row was
      // the board's last-but-one `no_oracle`): exact companions
      // (group size, exact distinct) plus bound-satisfaction booleans
      // computed Spark-side from exact rank/distinct passes. The
      // oracle recomputes the exact companions and asserts the
      // booleans as literal TRUE — a bound the sketch ever violates
      // flips a boolean and fails the hash gate loudly. The exact
      // passes exist only to make the contract hashable; the
      // production 100 TB shape is [[approxAggRaw]] (sketches only),
      // which ApproxAggSpec drives against its error bounds.
      val approx = approxAggRaw(s, d)
      val ev = Tables.load(s, d, "events")
      val exact = ev.groupBy($"event_type")
        .agg(countDistinct($"user_id").as("exact_users"))
      // rank positions of the returned quantile values: the sketch
      // guarantee is |rank(x) − p·n| ≤ eps·n with eps = 1/accuracy;
      // [lt+1, le] is x's rank interval under ties, checked against
      // the target ± (eps·n + 1) band
      val ranks = ev.select($"event_type", $"value")
        .join(broadcast(approx), Seq("event_type"))
        .groupBy($"event_type")
        .agg(
          sum(when($"value" < $"p50", 1L).otherwise(0L)).as("lt50"),
          sum(when($"value" <= $"p50", 1L).otherwise(0L)).as("le50"),
          sum(when($"value" < $"p95", 1L).otherwise(0L)).as("lt95"),
          sum(when($"value" <= $"p95", 1L).otherwise(0L)).as("le95"))
      val epsN = $"n".cast("double") * lit(1e-4) + lit(1.0)
      approx.join(exact, Seq("event_type"))
        .join(ranks, Seq("event_type"))
        .select($"event_type", $"n", $"exact_users",
          // 3 standard errors at rsd 5% / 1% (ApproxAggSpec's bands),
          // with an absolute floor of 2 for tiny groups
          (abs($"approx_users" - $"exact_users").cast("double") <=
            greatest(lit(2.0), lit(0.15) * $"exact_users"))
            .as("users_ok"),
          (abs($"approx_users_1pct" - $"exact_users").cast("double") <=
            greatest(lit(2.0), lit(0.03) * $"exact_users"))
            .as("users_1pct_ok"),
          (($"lt50" + 1).cast("double") <= lit(0.5) * $"n" + epsN &&
            $"le50".cast("double") >= lit(0.5) * $"n" - epsN)
            .as("p50_rank_ok"),
          (($"lt95" + 1).cast("double") <= lit(0.95) * $"n" + epsN &&
            $"le95".cast("double") >= lit(0.95) * $"n" - epsN)
            .as("p95_rank_ok"))
        .orderBy($"event_type")
    }),

    "q27_asof_join" -> ((s, d) => {
      import s.implicits._
      // As-of join — attach to each purchase the user's latest click
      // at-or-before it. Spark has no ASOF operator; the naive range
      // join is a per-row scan of the right side. This is the
      // single-shuffle formulation: union both sides, one window pass
      // per user carrying the last-seen mark forward — O(n log n) in
      // the partition, ONE shuffle on the join key, no inequality
      // join anywhere (DuckDB's native ASOF JOIN replays it exactly).
      val ev = Tables.load(s, d, "events")
      // ties on (user_id, ts) among clicks: keep max event_id, like
      // the oracle's row_number tie-break
      val clickW = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id", $"ts").orderBy($"event_id".desc)
      val clicks = ev.filter($"event_type" === "click")
        .withColumn("rn", row_number().over(clickW))
        .filter($"rn" === 1)
        .select($"user_id", $"ts", $"event_id".as("mark_id"),
          $"value".as("mark_value"), lit(1).as("is_mark"),
          lit(null).cast("long").as("event_id"),
          lit(null).cast("double").as("value"))
      val purchases = ev.filter($"event_type" === "purchase")
        .select($"user_id", $"ts", lit(null).cast("long").as("mark_id"),
          lit(null).cast("double").as("mark_value"), lit(0).as("is_mark"),
          $"event_id", $"value")
      // marks sort before purchases at equal ts (is_mark desc) so an
      // exactly-simultaneous click is visible to the purchase (>=)
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts", $"is_mark".desc)
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      clicks.unionByName(purchases)
        .withColumn("click_event_id",
          last($"mark_id", ignoreNulls = true).over(w))
        .withColumn("click_value",
          last($"mark_value", ignoreNulls = true).over(w))
        .filter($"is_mark" === 0 && $"click_event_id".isNotNull)
        .select($"event_id", $"user_id", $"ts",
          $"click_event_id", $"click_value")
        .orderBy($"event_id")
    }),

    // Forward as-of join — the symmetric twin of q27: attach to each
    // click the user's EARLIEST purchase at-or-after it (the
    // "time-to-conversion" lookup). Same single-shuffle union+window
    // formulation, mirrored: the window looks FORWARD
    // (rowsBetween(0, unboundedFollowing), first non-null mark), the
    // per-(user, ts) mark dedupe keeps MIN event_id, and probes sort
    // before marks at equal ts so a simultaneous purchase is visible
    // (>= boundary). ONE shuffle on user_id, no inequality join;
    // DuckDB's native forward ASOF (c.ts <= p.ts) replays it exactly.
    "q70_asof_forward" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.load(s, d, "events")
      // per-(user, ts) dedupe (min event_id) folded into a user_id
      // window ordered (ts, event_id ASC): the winner is the first
      // row of its ts group, detected by lag(ts) — one exchange for
      // the mark side instead of a separate (user_id, ts) pass
      val markW = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts", $"event_id".asc)
      val purchases = ev.filter($"event_type" === "purchase")
        .withColumn("prev_ts", lag($"ts", 1).over(markW))
        .filter($"prev_ts".isNull || $"prev_ts" =!= $"ts")
        .select($"user_id", $"ts", $"event_id".as("mark_id"),
          $"value".as("mark_value"), lit(1).as("is_mark"),
          lit(null).cast("long").as("event_id"))
      val clicks = ev.filter($"event_type" === "click")
        .select($"user_id", $"ts", lit(null).cast("long").as("mark_id"),
          lit(null).cast("double").as("mark_value"), lit(0).as("is_mark"),
          $"event_id")
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id").orderBy($"ts", $"is_mark".asc)
        .rowsBetween(0, org.apache.spark.sql.expressions.Window
          .unboundedFollowing)
      purchases.unionByName(clicks)
        .withColumn("purchase_event_id",
          first($"mark_id", ignoreNulls = true).over(w))
        .withColumn("purchase_value",
          first($"mark_value", ignoreNulls = true).over(w))
        .filter($"is_mark" === 0 && $"purchase_event_id".isNotNull)
        .select($"event_id", $"user_id", $"ts",
          $"purchase_event_id", $"purchase_value")
        .orderBy($"event_id")
    }),

    // Interpolated percentiles (percentile_cont parity) — q20 pins the
    // DISCRETE percentile (percentile_disc: a value from the data);
    // this row pins the INTERPOLATED form, where both engines compute
    // lower + (upper-lower)·frac at rank (n-1)·p. Cross-engine float
    // discipline: the input domain is integer cents and p ∈
    // {.25, .5, .75}, so every interpolation lands on an exact binary
    // fraction of integers — both engines feed identical doubles into
    // the final /100, which is the same IEEE op on both sides. Exact
    // percentiles need the full per-group sort (fine at any group
    // count — the sort is within the hash exchange); the 100 TB
    // unsorted-stream shape is q29's quantile sketch.
    "q71_percentile_cont" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "lineitem")
        .select($"l_returnflag",
          round($"l_extendedprice" * 100).cast("long").as("cents"))
        .groupBy($"l_returnflag")
        // r19 optimization (guide §1.2): one percentile(_, array(...))
        // buffer instead of three percentile_cont calls — Spark
        // resolves percentile_cont to the same exact Percentile
        // aggregate, so the three interpolated doubles are
        // bit-identical (oracle re-proven); the per-group value
        // buffer is built and shuffled once instead of three times
        .agg(expr("percentile(cents, array(0.25, 0.5, 0.75))").as("ps"),
          count(lit(1)).as("n"))
        .select($"l_returnflag",
          (element_at($"ps", 1) / 100).as("p25"),
          (element_at($"ps", 2) / 100).as("p50"),
          (element_at($"ps", 3) / 100).as("p75"),
          $"n")
        .orderBy($"l_returnflag")
    }),

    // Equi-DEPTH binning (feature bucketization for training
    // pipelines: every bucket holds the same row count, boundaries
    // follow the data). The tile over a UNIQUE sort key
    // (cents, custkey) is a pure row_number function — deterministic
    // on both engines — but an un-partitioned ntile() funnels the
    // table through ONE task, so the rank rides ops.PrefixSum's
    // two-pass distributed scan instead and the ntile arithmetic is
    // replayed row-locally from (rank, n): with q = n div k and
    // rem = n mod k, the first `rem` tiles hold q+1 rows — exactly
    // SQL ntile's fill rule, so the DuckDB ntile(8) oracle
    // hash-matches the window-free plan. n is one scalar row
    // cross-joined as a broadcast (the q31 bounds pattern).
    "q73_equidepth" -> ((s, d) => {
      import s.implicits._
      val c = Tables.load(s, d, "customer")
        .select($"c_custkey",
          round($"c_acctbal" * 100).cast("long").as("cents"))
      val ranked = graft.ops.PrefixSum.runningTotal(c,
        Seq($"cents", $"c_custkey"), lit(1L), "rn")
      val nRow = c.agg(count(lit(1)).as("n_rows"))
      ranked.crossJoin(broadcast(nRow))
        .withColumn("bucket",
          graft.ops.Quantiles.ntileFromRank("rn", "n_rows", 8))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"),
          min($"cents").as("lo_cents"),
          max($"cents").as("hi_cents"),
          sum($"cents").as("sum_cents"))
        .orderBy($"bucket")
    }),

    // Mode (most frequent value) per group with deterministic
    // tie-break — count per (segment, priority), keep the
    // row_number-1 row ordered by (count DESC, value). Two
    // map-side-combinable aggregates + a 25-row window; the scale
    // cost is the (segment, priority) count shuffle, bounded by the
    // key-domain product, never by rows.
    "q74_mode_by_segment" -> ((s, d) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"c_mktsegment")
        .orderBy($"n_orders".desc, $"o_orderpriority")
      Tables.load(s, d, "orders").select($"o_custkey", $"o_orderpriority")
        .join(Tables.load(s, d, "customer")
          .select($"c_custkey", $"c_mktsegment"),
          $"o_custkey" === $"c_custkey")
        .groupBy($"c_mktsegment", $"o_orderpriority")
        .agg(count(lit(1)).as("n_orders"))
        .withColumn("rk", row_number().over(w))
        .filter($"rk" === 1)
        .select($"c_mktsegment", $"o_orderpriority".as("modal_priority"),
          $"n_orders")
        .orderBy($"c_mktsegment")
    }),

    "q28_range_join" -> ((s, d) => {
      import s.implicits._
      // Range join, binned: events within 10 minutes after each error.
      // A raw interval predicate is a BroadcastNestedLoop O(n·m) scan;
      // binning both sides to 10-minute buckets turns it into an
      // equi-hash-join on the bin id (each error probes its bin and
      // the next — a window of length L needs ceil(L/bin)+1 probes),
      // with the exact interval re-checked inside the join. Shuffle is
      // on the bin key; per-bin fan-out is bounded by bin occupancy,
      // not table size. Round-8 (VERDICT r7 #5): the binned frame is
      // projected narrow and persisted so the error side and the
      // probe side share ONE scan, and the join is LEFT OUTER with
      // the interval predicate in the ON clause — zero-match errors
      // arrive as null probes and count 0 directly, removing the
      // former third scan + join-back entirely.
      val binUs = 600L * 1000 * 1000 // 10 min in microseconds
      val ev = Tables.load(s, d, "events")
        .select($"event_id", $"ts", $"event_type",
          floor(unix_micros($"ts") / binUs).as("bin"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val errors = ev.filter($"event_type" === "error")
        .select($"event_id", $"ts", $"bin")
        .withColumn("probe_bin", explode(array($"bin", $"bin" + 1)))
      val probe = ev.select($"event_id".as("x_id"), $"ts".as("x_ts"),
        $"bin".as("x_bin"))
      // each x lives in exactly one bin and the two probe bins are
      // distinct, so a matching (error, x) pair joins exactly once
      errors.join(probe,
          $"probe_bin" === $"x_bin" && $"x_ts" >= $"ts" &&
            $"x_ts" < $"ts" + expr("INTERVAL 10 MINUTES") &&
            $"x_id" =!= $"event_id", "left_outer")
        .groupBy($"event_id")
        .agg(sum(when($"x_id".isNotNull, 1L).otherwise(0L))
          .as("n_following"))
        .orderBy($"event_id")
    }),

    "q25_stats" -> ((s, d) => momentStats(Tables.load(s, d, "events"))),

    // JSON-lines WRITER coverage (the read side is exercised by the
    // reference-surface sources): parquet → NDJSON → schema'd
    // read-back → aggregate; integral-valued doubles + strings keep
    // text serialization lossless, and the oracle aggregates the
    // parquet source directly — completing the format matrix next to
    // q23 (CSV) and q24 (ORC).
    "q129_json_roundtrip" -> ((s, d) => {
      import s.implicits._
      val tmp = graft.ScratchDir.path("jsonrt")
      Tables.load(s, d, "customer")
        .select($"c_custkey", $"c_mktsegment", $"c_nationkey")
        .write.mode("overwrite").json(tmp)
      s.read
        .schema("c_custkey bigint, c_mktsegment string, " +
          "c_nationkey int")
        .json(tmp)
        .groupBy($"c_mktsegment")
        .agg(count(lit(1)).as("n"),
          countDistinct($"c_nationkey").as("n_nations"),
          sum($"c_custkey").as("key_sum"))
        .orderBy($"c_mktsegment")
    }),

    "q23_csv_roundtrip" -> ((s, d) => {
      import s.implicits._
      // CSV connector coverage: parquet → csv (header + explicit
      // schema read-back) → aggregate. Integral doubles + strings only
      // so text serialization is lossless; oracle aggregates the
      // parquet source directly.
      // per-process scratch (see ScratchDir): isolated + bounded
      val tmp = graft.ScratchDir.path("csv")
      Tables.load(s, d, "lineitem")
        .select($"l_orderkey", $"l_returnflag", $"l_quantity")
        // single writer task (one parquet split in) measured FASTER
        // than repartition-then-write at this size — the shuffle costs
        // more than parallel text serialization saves; at real scale
        // the scan has many splits and the writers parallelize anyway
        .write.mode("overwrite").option("header", "true").csv(tmp)
      s.read.option("header", "true")
        .schema("l_orderkey bigint, l_returnflag string, l_quantity double")
        .csv(tmp)
        .groupBy($"l_returnflag")
        .agg(count(lit(1)).as("n"), sum($"l_quantity").as("sum_qty"),
          countDistinct($"l_orderkey").as("n_orders"))
        .orderBy($"l_returnflag")
    }),

    "q24_orc_roundtrip" -> ((s, d) => {
      import s.implicits._
      // ORC connector coverage: full-fidelity binary roundtrip.
      // per-process scratch (see ScratchDir): isolated + bounded
      val tmp = graft.ScratchDir.path("orc")
      Tables.load(s, d, "orders")
        .select($"o_orderkey", $"o_orderstatus", $"o_totalprice")
        .write.mode("overwrite").orc(tmp)
      s.read.orc(tmp)
        .groupBy($"o_orderstatus")
        .agg(count(lit(1)).as("n"),
          round(sum($"o_totalprice"), 2).as("total"))
        .orderBy($"o_orderstatus")
    }),

    "q22_grouping_sets" -> ((s, d) => {
      // SQL GROUPING SETS with grouping() disambiguation of the
      // super-aggregate null rows
      Tables.load(s, d, "orders").createOrReplaceTempView("orders_gs")
      s.sql("""
        SELECT o_orderstatus, o_orderpriority,
          CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
          CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
          count(*) AS n, round(sum(o_totalprice), 2) AS total
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST,
          o_orderpriority NULLS FIRST""")
    }),

    "q21_array_funcs" -> ((s, d) => {
      import s.implicits._
      // array/higher-order function coverage over tokenized documents
      val t = split(lower($"text"), "\\s+")
      Tables.load(s, d, "documents")
        .select(
          $"doc_id",
          element_at(t, 1).as("first_tok"),
          element_at(t, -1).as("last_tok"),
          array_join(slice(t, 1, 3), "-").as("head3_joined"),
          size(array_distinct(t)).cast("long").as("n_distinct"),
          array_contains(t, "spark").as("has_spark"),
          size(filter(t, x => length(x) > 5)).cast("long").as("n_long_toks"),
          array_max(transform(t, x => length(x))).cast("long")
            .as("max_tok_len"))
        .orderBy($"doc_id")
    }),

    "q20_percentiles" -> ((s, d) => {
      import s.implicits._
      // exact percentiles at dyadic fractions: the (n-1)*p
      // interpolation lands on exactly-representable quarters, so
      // Spark and DuckDB produce identical doubles
      Tables.load(s, d, "lineitem")
        .groupBy($"l_returnflag")
        .agg(
          expr("percentile(l_quantity, 0.25)").as("p25"),
          expr("percentile(l_quantity, 0.5)").as("p50"),
          expr("percentile(l_quantity, 0.75)").as("p75"),
          min($"l_quantity").as("qmin"),
          max($"l_quantity").as("qmax"))
        .orderBy($"l_returnflag")
    }),

    // Time-series resample with gap fill: hourly event counts per
    // type, empty buckets materialized as zero rows. The grid is
    // generated, not scanned: one scalar agg finds the global bounds,
    // a broadcast cross with the distinct types seeds one row per
    // type, and sequence()+explode expands each to its hour range —
    // grid size is O(time_range × |types|), independent of the fact
    // table's row count, so the shape survives any corpus scale. (For
    // multi-year ranges the single sequence array per type would be
    // one fat task; split day×hour into a two-level explode then.)
    // The counts side is a plain pre-aggregated shuffle; AQE
    // broadcasts whichever post-agg side is small.
    "q31_resample" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.load(s, d, "events")
        .withColumn("hour", date_trunc("hour", $"ts"))
      val bounds = ev.agg(min($"hour").as("h0"), max($"hour").as("h1"))
      val grid = ev.select($"event_type").distinct()
        .crossJoin(broadcast(bounds))
        .select($"event_type",
          explode(sequence($"h0", $"h1", expr("interval 1 hour")))
            .as("hour"))
      val counts = ev.groupBy($"event_type", $"hour")
        .agg(count(lit(1)).as("cnt"),
          round(sum($"value"), 2).as("sv"))
      grid.join(counts, Seq("event_type", "hour"), "left")
        .select($"event_type", $"hour",
          coalesce($"cnt", lit(0L)).as("n"),
          coalesce($"sv", lit(0.0)).as("sum_value"))
        .orderBy($"event_type", $"hour")
    }),

    // Equi-width histogram on integer cents: bucket id is row-local
    // integer arithmetic (identical in both engines — no float-grid
    // boundary to flip), then one map-side-combinable count. The
    // histogram of a 100 TB column is the same two-stage agg.
    "q32_histogram" -> ((s, d) => {
      import s.implicits._
      val widthCents = 2500000L // $25k buckets over o_totalprice
      val b = (round($"o_totalprice" * 100).cast("long") / widthCents)
        .cast("long")
      Tables.load(s, d, "orders")
        .select(b.as("bucket"))
        .groupBy($"bucket")
        .agg(count(lit(1)).as("n"))
        .select($"bucket",
          round(($"bucket" * widthCents).cast("double") / 100, 2)
            .as("lo"),
          round((($"bucket" + 1) * widthCents).cast("double") / 100, 2)
            .as("hi"),
          $"n")
        .orderBy($"bucket")
    }),

    // Outlier detection: events more than 3 sample standard
    // deviations from their type's mean. The test stays EXACT
    // integer arithmetic — z² > 9 cross-multiplied to
    // (n·c − s1)²·(n−1) > 9·n·(n·s2 − s1²) — so there is no float
    // threshold for cross-engine ulp noise to flip (q25 precedent).
    // Round-8 shape change (VERDICT r7 #5): the quadratic is solved
    // ONCE per event_type into an integer cutoff interval — the
    // smallest cent value that is a high anomaly and the largest
    // that is a low one — on the driver with BigInt (the stats frame
    // is group-dimension-bounded, ≤ one row per type). The per-row
    // test is then two plain LONG comparisons against the broadcast
    // cutoffs instead of three per-row decimal(38,0) multiplies
    // (6.4 s → long-codegen). The stats partials themselves ride the
    // q25 try_sum long path with the same detected-overflow decimal
    // retry; the cutoff solve is BigInt-exact in either regime.
    "q33_log_anomaly" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.load(s, d, "events")
        .select($"event_id", $"event_type", $"value",
          round($"value" * 100).cast("long").as("c"))
      val longStats = ev.groupBy($"event_type")
        .agg(count(lit(1)).as("n"),
          try_sum($"c").as("s1"),
          try_sum(try_multiply($"c", $"c")).as("s2"),
          count($"c").as("nc"),
          sum(when($"c".isNotNull && try_multiply($"c", $"c").isNull,
            1L).otherwise(0L)).as("bad")).collect()
      val overflow = longStats.exists { r =>
        r.getAs[Long]("bad") > 0 || (r.getAs[Long]("nc") > 0 &&
          (r.isNullAt(r.fieldIndex("s1")) || r.isNullAt(r.fieldIndex("s2"))))
      }
      val stats: Seq[(String, BigInt, BigInt, BigInt)] =
        if (!overflow)
          longStats.toSeq.filter(r => r.getAs[Long]("nc") > 0).map(r =>
            (r.getString(0), BigInt(r.getAs[Long]("n")),
              BigInt(r.getAs[Long]("s1")), BigInt(r.getAs[Long]("s2"))))
        else {
          val dec = "decimal(38,0)"
          val cD = $"c".cast(dec)
          ev.groupBy($"event_type")
            .agg(count(lit(1)).cast(dec).as("n"),
              sum(cD).as("s1"), sum(cD * cD).as("s2"))
            .collect().toSeq
            .filter(r => !r.isNullAt(2) && !r.isNullAt(3)).map(r =>
              (r.getString(0), BigInt(r.getDecimal(1).toBigInteger),
                BigInt(r.getDecimal(2).toBigInteger),
                BigInt(r.getDecimal(3).toBigInteger)))
        }
      // exact integer cutoffs: smallest d = n·c − s1 > 0 with
      // d²·(n−1) > R, R = 9·n·(n·s2 − s1²); isqrt floor + local
      // ascent keeps the boundary bit-exact (no float sqrt)
      def isqrt(v: BigInt): BigInt =
        if (v < 2) v
        else {
          var x = BigInt(1) << ((v.bitLength + 1) / 2)
          var y = (x + v / x) >> 1
          while (y < x) { x = y; y = (x + v / x) >> 1 }
          x
        }
      val cutoffs = stats.filter(_._2 > 1).map { case (t, n, s1, s2) =>
        val r9 = 9 * n * (n * s2 - s1 * s1)
        var dMin = (isqrt(r9 / (n - 1)) - 1).max(1)
        while (dMin * dMin * (n - 1) <= r9) dMin += 1
        // high ⇔ n·c ≥ s1 + dMin ⇔ c ≥ ceil(...); low symmetric
        val hi = (s1 + dMin + n - 1) / n // ceil for positive n
        val lo0 = s1 - dMin
        val lo = if (lo0 >= 0) lo0 / n
          else -((-lo0 + n - 1) / n) // floor for negative numerators
        (t,
          if (hi.isValidLong) Some(hi.toLong) else None,
          if (lo.isValidLong) Some(lo.toLong) else None)
      }
      val cut = cutoffs.toDF("event_type", "hi_min", "lo_max")
      ev.join(broadcast(cut), "event_type")
        .filter(($"hi_min".isNotNull && $"c" >= $"hi_min") ||
          ($"lo_max".isNotNull && $"c" <= $"lo_max"))
        .select($"event_id", $"event_type", $"value",
          when($"c" >= $"hi_min", lit("high")).otherwise(lit("low"))
            .as("side"))
        .orderBy($"event_id")
    }),

    // Ranking-function family over one partitioned window: dense_rank
    // (gap-free), ntile (equi-depth quartiles), percent_rank and
    // cume_dist (exact rationals (rank−1)/(n−1), rank/n — integer
    // divisions both engines evaluate identically in double, so no
    // rounding guard needed). One hash exchange + per-partition sort
    // serves all four functions in a single Window pass.
    "q34_rank_funcs" -> ((s, d) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"o_orderpriority")
        .orderBy(desc("o_totalprice"), $"o_orderkey")
      Tables.load(s, d, "orders")
        .select($"o_orderpriority", $"o_orderkey", $"o_totalprice",
          dense_rank().over(w).cast("long").as("drank"),
          ntile(4).over(w).cast("long").as("quartile"),
          percent_rank().over(w).as("pct_rank"),
          cume_dist().over(w).as("cdist"))
        .orderBy($"o_orderpriority", desc("o_totalprice"), $"o_orderkey")
    }),

    // LATERAL correlated subquery — top-2 orders per customer via a
    // per-row dependent subquery with ORDER BY + LIMIT. Catalyst
    // decorrelates this (DecorrelateInnerQuery) into the same
    // window-partial top-k a hand-written row_number query produces —
    // declarative per-group logic with no per-row re-execution at any
    // scale. The SQL-surface twin of q6's DataFrame windows.
    "q35_lateral" -> ((s, d) => {
      Tables.load(s, d, "customer").createOrReplaceTempView("customer_lat")
      Tables.load(s, d, "orders").createOrReplaceTempView("orders_lat")
      s.sql("""
        SELECT c.c_custkey, c.c_name, t.o_orderkey, t.o_totalprice
        FROM customer_lat c JOIN LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders_lat
          WHERE o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""")
    }),

    // Funnel analysis: per-user view → click-after-view →
    // purchase-after-click progression, the conversion query behind
    // any event-log product dashboard. Three conditional window mins
    // over ONE user partition — the later stages reference the
    // earlier stage's timestamp, which Catalyst plans as consecutive
    // Window passes over a single hash exchange (no self-joins, no
    // re-scans). Timestamps compare at µs in both engines.
    "q36_funnel" -> ((s, d) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"user_id")
      Tables.load(s, d, "events")
        .withColumn("v_ts",
          min(when($"event_type" === "view", $"ts")).over(w))
        .withColumn("c_ts",
          min(when($"event_type" === "click" && $"ts" >= $"v_ts", $"ts"))
            .over(w))
        .withColumn("p_ts",
          min(when($"event_type" === "purchase" && $"ts" >= $"c_ts",
            $"ts")).over(w))
        .groupBy($"user_id")
        .agg(first($"v_ts").as("view_ts"), first($"c_ts").as("click_ts"),
          first($"p_ts").as("purchase_ts"))
        .select($"user_id", $"view_ts", $"click_ts", $"purchase_ts",
          (when($"purchase_ts".isNotNull, 3)
            .when($"click_ts".isNotNull, 2)
            .when($"view_ts".isNotNull, 1)
            .otherwise(0)).cast("long").as("stage"))
        .orderBy($"user_id")
    }),

    // Attribution join — every (click, purchase) pair for the same
    // user within a 30-minute window: the batch twin of
    // StreamOps.intervalJoinStream, giving the streaming operator an
    // oracle-checked reference semantics. The user_id equi-key makes
    // this a plain shuffled hash/merge join with the time bound as a
    // row-local post-filter — NOT an inequality join (no nested
    // loop): per-user event counts are bounded, so the filter runs on
    // co-partitioned, already-matched rows. Delta is exact integer
    // microseconds.
    "q37_attribution" -> ((s, d) => {
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
        .select($"user_id", $"purchase_id", $"click_id",
          (unix_micros($"purchase_ts") - unix_micros($"click_ts"))
            .as("lag_us"), $"value")
        .orderBy($"user_id", $"purchase_id", $"click_id")
    }),

    // Cohort retention: users bucketed by first-activity date, then
    // distinct-user counts per (cohort, weeks-since-cohort) — the
    // retention triangle. All time arithmetic is integer days/weeks
    // (no calendar-week truncation, whose ISO/locale rules differ
    // across engines). Shape: one groupBy for cohorts, a distinct on
    // (user, day) that collapses same-day repeats BEFORE the join,
    // then a shuffled join on user_id and a count-distinct agg — at
    // 100 TB the firsts frame is user-cardinality, co-partitioned
    // with activity on the same key (one exchange each side).
    "q38_retention" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.load(s, d, "events")
      val firsts = ev.groupBy($"user_id")
        .agg(min(to_date($"ts")).as("cohort"))
      val activity = ev.select($"user_id", to_date($"ts").as("day"))
        .distinct()
      activity.join(firsts, "user_id")
        .withColumn("week_off",
          floor(datediff($"day", $"cohort") / 7).cast("long"))
        // midnight-timestamp form: Spark DateType surfaces as python
        // date objects where DuckDB DATE arrives as datetime64 — the
        // driver's dtype compare needs both engines on timestamp
        .groupBy($"cohort".cast("timestamp").as("cohort"), $"week_off")
        .agg(countDistinct($"user_id").as("n_users"))
        .orderBy($"cohort", $"week_off")
    }))

  /** q25's aggregation, factored out so the overflow spec can run it
    * on synthetic magnitudes. Statistical aggregates via EXACT integer
    * moments: value is a 2dp double (→ cents) and k is integral, so
    * every sum is order-independent integer arithmetic — both engines
    * then evaluate the identical float expression on identical inputs,
    * and the final round(_, 2) has no cross-engine ulp noise to flip
    * at a half-way boundary (streaming stddev/corr accumulate in
    * fold-order-dependent doubles, the same latent flake the q1/q3
    * revenue sums hit at sf0.1).
    *
    * Width guard: the moments accumulate as LONGS with try_* overflow
    * detection, retrying the whole pass in decimal(38,0) only when a
    * product or sum actually overflowed (n·c² ≈ 2e16 at sf0.1 — the
    * long domain holds until ~sf100). DuckDB's side needs no change:
    * its sum(BIGINT) is already HUGEINT (128-bit), and both exact
    * integer domains cast to the same double. MomentWidthSpec drives
    * a magnitude where the long path provably overflows and asserts
    * the decimal retry still answers exactly.
    */
  /** q29's production shape: the sketch aggregates ALONE — HLL++ at
    * default and 1% rsd, positional quantile sketches at accuracy
    * 10000, plus the group count. Fixed ~kB state per group,
    * map-side mergeable, no exact-distinct shuffle anywhere. The
    * registered q29_approx_agg row wraps THIS frame with exact
    * companions + bound booleans so the driver can hash the sketch
    * contract; ApproxAggSpec drives the raw frame against the
    * HLL/percentile error bounds directly.
    */
  def approxAggRaw(s: org.apache.spark.sql.SparkSession, d: String)
      : org.apache.spark.sql.DataFrame = {
    import s.implicits._
    Tables.load(s, d, "events")
      .groupBy($"event_type")
      .agg(
        approx_count_distinct($"user_id").as("approx_users"),
        approx_count_distinct($"user_id", rsd = 0.01)
          .as("approx_users_1pct"),
        percentile_approx($"value", lit(0.5), lit(10000)).as("p50"),
        percentile_approx($"value", lit(0.95), lit(10000)).as("p95"),
        count(lit(1)).as("n"))
  }

  def momentStats(events: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val s = events.sparkSession
    val cL = round(col("value") * 100).cast("long")
    // floor BEFORE the integer cast: Spark's ANSI double→long cast
    // truncates while DuckDB's rounds — floor on both sides is the
    // parity rule (k is integral in the fixtures, but the contract
    // shouldn't depend on that)
    val kL = floor(get_json_object(col("props"), "$.k").cast("double"))
      .cast("long")
    // Moment partials accumulate as LONGS (whole-stage-codegen
    // primitive arithmetic), not decimal(38,0): the round-7 bench
    // showed per-row overflow-checked BigDecimal products cost 15×
    // (19.6 s for a single-pass aggregate — VERDICT r7 #4). Width
    // safety comes from DETECTION, not pre-widening: every product
    // and sum runs through try_multiply/try_sum, and per-sum
    // overflow counters distinguish "null because overflow" from
    // "null because the group's inputs were all null". cents² × rows
    // keeps the partials inside a long until ~sf100; past that the
    // one retry below pays the decimal cost — the fallback round-3
    // advice #7 intended, now actually the fallback.
    val tm = (a: Column, b: Column) => try_multiply(a, b)
    val overflowed = (p: Column, in: Column) =>
      sum(when(in.isNotNull && p.isNull, 1L).otherwise(0L))
    val partials = events
      .select(col("event_type"), cL.as("c"), kL.as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).as("n0"),
        try_sum(col("c")).as("s1"),
        try_sum(tm(col("c"), col("c"))).as("s2"),
        try_sum(col("k")).as("sk"),
        try_sum(tm(col("k"), col("k"))).as("skk"),
        try_sum(tm(col("c"), col("k"))).as("svk"),
        count(col("c")).as("nc"), count(col("k")).as("nk"),
        sum(when(col("c").isNotNull && col("k").isNotNull, 1L)
          .otherwise(0L)).as("nck"),
        overflowed(tm(col("c"), col("c")), col("c")).as("bad_cc"),
        overflowed(tm(col("k"), col("k")), col("k")).as("bad_kk"),
        sum(when(col("c").isNotNull && col("k").isNotNull &&
          tm(col("c"), col("k")).isNull, 1L).otherwise(0L)).as("bad_ck"))
      // driver holds one row per event_type — the GROUP dimension,
      // bounded by construction exactly like the query's own output
      .collect()
    def nullSum(r: org.apache.spark.sql.Row, sumCol: String,
        nonNullCnt: String): Boolean =
      r.isNullAt(r.fieldIndex(sumCol)) && r.getAs[Long](nonNullCnt) > 0
    val overflow = partials.exists { r =>
      r.getAs[Long]("bad_cc") > 0 || r.getAs[Long]("bad_kk") > 0 ||
        r.getAs[Long]("bad_ck") > 0 ||
        nullSum(r, "s1", "nc") || nullSum(r, "s2", "nc") ||
        nullSum(r, "sk", "nk") || nullSum(r, "skk", "nk") ||
        nullSum(r, "svk", "nck")
    }
    if (overflow) momentStatsDecimal(events)
    else {
      // finalize on a tiny re-created frame (one row per group) with
      // the SAME Spark expressions as the decimal path — identical
      // round()/sqrt() semantics, no hand-rolled driver rounding
      import s.implicits._
      momentFinalize(partials.toSeq.map { r =>
        (r.getString(0), r.getAs[Long]("n0"),
          Option(r.getAs[java.lang.Long]("s1")).map(_.longValue),
          Option(r.getAs[java.lang.Long]("s2")).map(_.longValue),
          Option(r.getAs[java.lang.Long]("sk")).map(_.longValue),
          Option(r.getAs[java.lang.Long]("skk")).map(_.longValue),
          Option(r.getAs[java.lang.Long]("svk")).map(_.longValue))
      }.toDF("event_type", "n0", "s1", "s2", "sk", "skk", "svk")
        .select(col("event_type"), col("n0").cast(MomentDec),
          col("s1").cast(MomentDec), col("s2").cast(MomentDec),
          col("sk").cast(MomentDec), col("skk").cast(MomentDec),
          col("svk").cast(MomentDec)))
    }
  }

  private val MomentDec = "decimal(38,0)"

  /** The pre-round-8 all-decimal moment pass — now the overflow
    * fallback only (sf≳100 magnitudes, MomentWidthSpec's regime).
    */
  private[queries] def momentStatsDecimal(
      events: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val c = round(col("value") * 100).cast("long").cast(MomentDec)
    val k = floor(get_json_object(col("props"), "$.k").cast("double"))
      .cast("long").cast(MomentDec)
    momentFinalize(events
      .select(col("event_type"), c.as("c"), k.as("k"))
      .groupBy(col("event_type"))
      .agg(count(lit(1)).cast(MomentDec).as("n0"),
        sum(col("c")).as("s1"), sum(col("c") * col("c")).as("s2"),
        sum(col("k")).as("sk"), sum(col("k") * col("k")).as("skk"),
        sum(col("c") * col("k")).as("svk")))
  }

  /** Shared final projection: exact decimal partials → rounded
    * doubles. Both the long fast path (via the tiny re-created
    * frame) and the decimal fallback flow through here, so the
    * engine-visible rounding semantics cannot diverge between them.
    */
  private def momentFinalize(partials: org.apache.spark.sql.DataFrame)
      : org.apache.spark.sql.DataFrame = {
    val varNum = (col("n0") * col("s2") - col("s1") * col("s1"))
      .cast("double")
    val kVarNum = (col("n0") * col("skk") - col("sk") * col("sk"))
      .cast("double")
    partials
      .select(col("event_type"),
        round(col("s1") / (col("n0") * 100.0), 2).as("mean_value"),
        // degenerate groups → NULL like the sample-stat functions
        // would return (n0=1 zeroes the Bessel denominator; a
        // constant-valued group zeroes a correlation factor)
        when(col("n0") > 1,
          round(sqrt(varNum / (col("n0") * (col("n0") - 1)) / 10000.0), 2))
          .as("sd_value"),
        when(col("n0") > 1,
          round(varNum / (col("n0") * (col("n0") - 1)) / 10000.0, 2))
          .as("var_value"),
        graft.Tables.nz(when(col("n0") > 1 && varNum > 0 && kVarNum > 0,
          round((col("n0") * col("svk") - col("sk") * col("s1"))
            .cast("double") /
            (sqrt(varNum) * sqrt(kVarNum)), 2)))
          .as("corr_vk"),
        col("n0").cast("long").as("n"))
      .orderBy(col("event_type"))
  }

  def oracles: Map[String, String] = Map(

    // The sketch-contract row (r15 #3): the oracle recomputes the
    // exact companions (group size, exact distinct users) and asserts
    // the Spark-side bound-satisfaction booleans as literal TRUE —
    // the sketches themselves are implementation-defined, but the
    // CONTRACT (HLL within 3σ of its rsd, quantiles within the
    // positional accuracy band) is engine-independent and any
    // violation flips a hashed boolean.
    "q29_approx_agg" ->
      """SELECT event_type,
           CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT user_id) AS BIGINT) AS exact_users,
           TRUE AS users_ok,
           TRUE AS users_1pct_ok,
           TRUE AS p50_rank_ok,
           TRUE AS p95_rank_ok
         FROM events GROUP BY event_type ORDER BY event_type""",

    // ANSI three-valued logic is engine-independent — the oracle runs
    // the identical four scalar subqueries.
    "q116_null_aware_antijoin" ->
      """WITH sub AS (
           SELECT CASE WHEN l_partkey % 97 = 0 THEN NULL
                       ELSE l_partkey END AS pk
           FROM lineitem
           WHERE l_suppkey = 1 OR l_partkey % 97 = 0)
         SELECT
           (SELECT count(*) FROM part) AS n_parts,
           (SELECT count(*) FROM part
             WHERE p_partkey NOT IN (SELECT pk FROM sub)) AS n_not_in,
           (SELECT count(*) FROM part p
             WHERE NOT EXISTS (SELECT 1 FROM sub
                               WHERE sub.pk = p.p_partkey))
             AS n_not_exists,
           (SELECT count(*) FROM part
             WHERE p_partkey NOT IN (SELECT pk FROM sub
                                     WHERE pk IS NOT NULL))
             AS n_guarded""",

    // exact-regime CMS: the counter grid dwarfs the event-type
    // vocabulary, so the sketch estimates ARE the exact counts (see
    // the query registration) and a plain GROUP BY hash-verifies them
    "q67_cms_freq" ->
      """SELECT event_type, CAST(count(*) AS BIGINT) AS est_count
         FROM events GROUP BY 1 ORDER BY 1""",

    "q66_join_hints" ->
      """SELECT 'supplier_nation' AS dim,
           CAST(s.s_nationkey AS BIGINT) AS k, count(*) AS n
         FROM lineitem l JOIN supplier s ON l.l_suppkey = s.s_suppkey
         GROUP BY 2
         UNION ALL
         SELECT 'part_size' AS dim,
           CAST(p.p_size AS BIGINT) AS k, count(*) AS n
         FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
         GROUP BY 2
         ORDER BY dim, k""",

    "q65_sql_udf" ->
      """WITH m AS (
           SELECT l_returnflag,
             CAST(round(l_extendedprice * 100) AS BIGINT)
               * (100 - CAST(round(l_discount * 100) AS BIGINT))
               * (100 + CAST(round(l_tax * 100) AS BIGINT)) AS margin
           FROM lineitem)
         SELECT l_returnflag, count(*) AS n,
           CAST(sum(margin) AS BIGINT) AS margin_e4
         FROM m WHERE margin > 0
         GROUP BY l_returnflag
         ORDER BY l_returnflag""",
    "q1_agg" ->
      """SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 2) AS sum_qty,
         round(sum(l_extendedprice), 2) AS sum_base_price,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                  (100 - CAST(round(l_discount * 100) AS BIGINT)))
              AS BIGINT) / 10000.0 AS sum_disc_price,
         count(*) AS count_order
         FROM lineitem GROUP BY l_returnflag, l_linestatus
         ORDER BY l_returnflag, l_linestatus""",
    "q2_filter_project" ->
      """SELECT p_partkey, p_name, p_brand, p_retailprice FROM part
         WHERE p_size >= 30 AND p_type = 'ECONOMY' ORDER BY p_partkey""",
    "q3_join_agg" ->
      """SELECT c_custkey, c_name,
         CAST(sum(CAST(round(l_extendedprice * 100) AS BIGINT) *
                  (100 - CAST(round(l_discount * 100) AS BIGINT)))
              AS BIGINT) / 10000.0 AS revenue,
         count(*) AS n_items
         FROM lineitem JOIN orders ON l_orderkey = o_orderkey
         JOIN customer ON o_custkey = c_custkey
         WHERE o_orderstatus = 'O'
         GROUP BY c_custkey, c_name
         ORDER BY revenue DESC, c_custkey LIMIT 100""",
    "q4_semijoin" ->
      """SELECT o_orderpriority, count(*) AS n_orders FROM orders
         WHERE o_orderkey IN (SELECT l_orderkey FROM lineitem WHERE l_quantity >= 48)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q5_antijoin" ->
      """SELECT c_mktsegment, count(*) AS n_customers,
         round(sum(c_acctbal), 2) AS total_bal
         FROM customer
         WHERE c_custkey NOT IN
           (SELECT o_custkey FROM orders WHERE o_orderstatus = 'P')
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q6_window" ->
      """SELECT o_custkey, rn, o_orderkey, o_totalprice,
         round(coalesce(prev_price - o_totalprice, 0.0), 2) AS gap_from_prev
         FROM (
           SELECT o_custkey, o_orderkey, o_totalprice,
             row_number() OVER w AS rn,
             lag(o_totalprice, 1) OVER w AS prev_price
           FROM orders
           WINDOW w AS (PARTITION BY o_custkey
                        ORDER BY o_totalprice DESC, o_orderkey))
         WHERE rn <= 3 ORDER BY o_custkey, rn""",
    "q30_rolling_window" ->
      """WITH t AS (
           SELECT o_custkey, o_orderkey,
             CAST(datediff('day', DATE '1970-01-01', o_orderdate) AS BIGINT)
               AS day,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders)
         SELECT o_custkey, o_orderkey, day,
           round(CAST(sum(cents) OVER w AS DOUBLE) / 100, 2) AS rolling_30d,
           CAST(count(*) OVER w AS BIGINT) AS n_in_window
         FROM t
         WINDOW w AS (PARTITION BY o_custkey ORDER BY day
                      RANGE BETWEEN 29 PRECEDING AND CURRENT ROW)
         ORDER BY o_custkey, day, o_orderkey""",
    "q7_topk" ->
      """SELECT o_orderkey, o_custkey, o_totalprice FROM orders
         ORDER BY o_totalprice DESC, o_orderkey LIMIT 100""",
    "q8_setops" ->
      """WITH cn AS (SELECT DISTINCT c_nationkey AS nationkey FROM customer),
            sn AS (SELECT DISTINCT s_nationkey AS nationkey FROM supplier)
         SELECT 'both' AS tag, nationkey FROM (SELECT nationkey FROM cn INTERSECT SELECT nationkey FROM sn)
         UNION ALL
         SELECT 'cust_only' AS tag, nationkey FROM (SELECT nationkey FROM cn EXCEPT SELECT nationkey FROM sn)
         UNION ALL
         SELECT 'supp_only' AS tag, nationkey FROM (SELECT nationkey FROM sn EXCEPT SELECT nationkey FROM cn)
         ORDER BY tag, nationkey""",
    "q9_rollup" ->
      """SELECT r_name, n_name, round(sum(c_acctbal), 2) AS total_bal,
         count(*) AS n_cust
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY ROLLUP(r_name, n_name)
         ORDER BY r_name NULLS FIRST, n_name NULLS FIRST""",
    "q10_distinct" ->
      """SELECT count(DISTINCT l_partkey) AS n_parts,
         count(DISTINCT l_suppkey) AS n_supps,
         count(DISTINCT (l_returnflag, l_linestatus)) AS n_flag_status,
         count(*) AS n_rows FROM lineitem""",
    "q11_events_props" ->
      """SELECT event_type, count(*) AS n,
         round(sum(value), 2) AS sum_value,
         round(sum(CAST(json_extract_string(props, '$.k') AS DOUBLE)), 2) AS sum_k,
         max(CAST(json_extract_string(props, '$.k') AS DOUBLE)) AS max_k
         FROM events GROUP BY event_type ORDER BY event_type""",
    "q12_time_window" ->
      """SELECT CAST(date_trunc('hour', ts) AS TIMESTAMP) AS hour, event_type,
         count(*) AS n, round(sum(value), 2) AS sum_value
         FROM events GROUP BY 1, 2 ORDER BY hour, event_type""",
    "q13_dim_join" ->
      """SELECT r_name, count(*) AS n_customers,
         round(sum(c_acctbal), 2) AS total_bal
         FROM customer JOIN nation ON c_nationkey = n_nationkey
         JOIN region ON n_regionkey = r_regionkey
         GROUP BY r_name ORDER BY r_name""",
    "q14_cube" ->
      """SELECT o_orderstatus, o_orderpriority, count(*) AS n,
         round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY CUBE(o_orderstatus, o_orderpriority)
         ORDER BY o_orderstatus NULLS FIRST, o_orderpriority NULLS FIRST""",
    "q15_sessionize" ->
      """WITH e AS (
           SELECT user_id, event_id, epoch_us(ts) AS us,
             lag(epoch_us(ts), 1) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_us
           FROM events)
         SELECT user_id,
           CAST(sum(CASE WHEN prev_us IS NULL OR us - prev_us > 1800000000 THEN 1 ELSE 0 END) AS BIGINT) AS n_sessions,
           count(*) AS n_events
         FROM e GROUP BY user_id ORDER BY user_id""",
    "q16_scalar_funcs" ->
      """SELECT event_id, upper(event_type) AS type_u,
         substr(event_type, 1, 3) AS type3,
         CAST(length(event_type) AS BIGINT) AS type_len,
         CAST(year(ts) AS BIGINT) AS yr,
         CAST(month(ts) AS BIGINT) AS mo,
         CAST(day(ts) AS BIGINT) AS dom,
         round(value * 2.0, 2) AS value_doubled,
         event_type || ':' || CAST(user_id AS VARCHAR) AS type_user
         FROM events ORDER BY event_id""",
    "q17_sql_exists" ->
      """SELECT o_orderpriority, count(*) AS n_orders FROM orders o
         WHERE EXISTS (SELECT 1 FROM lineitem l
                       WHERE l.l_orderkey = o.o_orderkey
                         AND l.l_quantity >= 49)
         GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q18_pivot" ->
      """SELECT o_orderpriority,
         count(CASE WHEN o_orderstatus = 'F' THEN 1 END) AS "F",
         count(CASE WHEN o_orderstatus = 'O' THEN 1 END) AS "O",
         count(CASE WHEN o_orderstatus = 'P' THEN 1 END) AS "P"
         FROM orders GROUP BY o_orderpriority ORDER BY o_orderpriority""",
    "q19_scalar_subquery" ->
      """SELECT c_mktsegment, count(*) AS n_above FROM customer
         WHERE c_acctbal > (SELECT avg(c_acctbal) FROM customer)
         GROUP BY c_mktsegment ORDER BY c_mktsegment""",
    "q26_multiset" ->
      """SELECT 'except_all' AS op,
           (SELECT count(*) FROM
             (SELECT l_orderkey FROM lineitem EXCEPT ALL
              SELECT o_orderkey FROM orders)) AS n
         UNION ALL
         SELECT 'intersect_all' AS op,
           (SELECT count(*) FROM
             (SELECT l_orderkey FROM lineitem INTERSECT ALL
              SELECT o_orderkey FROM orders)) AS n
         ORDER BY op""",
    "q27_asof_join" ->
      """WITH clicks AS (
           SELECT user_id, ts, event_id, value,
             row_number() OVER (PARTITION BY user_id, ts
                                ORDER BY event_id DESC) AS rn
           FROM events WHERE event_type = 'click'),
         c AS (SELECT user_id, ts, event_id AS click_event_id,
                      value AS click_value
               FROM clicks WHERE rn = 1),
         p AS (SELECT event_id, user_id, ts, value FROM events
               WHERE event_type = 'purchase')
         SELECT p.event_id, p.user_id, p.ts, c.click_event_id,
                c.click_value
         FROM p ASOF JOIN c
           ON p.user_id = c.user_id AND p.ts >= c.ts
         ORDER BY p.event_id""",
    "q70_asof_forward" ->
      """WITH p0 AS (
           SELECT user_id, ts, event_id, value,
             row_number() OVER (PARTITION BY user_id, ts
                                ORDER BY event_id ASC) AS rn
           FROM events WHERE event_type = 'purchase'),
         p AS (SELECT user_id, ts, event_id AS purchase_event_id,
                      value AS purchase_value
               FROM p0 WHERE rn = 1),
         c AS (SELECT event_id, user_id, ts FROM events
               WHERE event_type = 'click')
         SELECT c.event_id, c.user_id, c.ts, p.purchase_event_id,
                p.purchase_value
         FROM c ASOF JOIN p
           ON c.user_id = p.user_id AND c.ts <= p.ts
         ORDER BY c.event_id""",
    "q71_percentile_cont" ->
      """SELECT l_returnflag,
           quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT),
             0.25) / 100 AS p25,
           quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT),
             0.5) / 100 AS p50,
           quantile_cont(CAST(round(l_extendedprice * 100) AS BIGINT),
             0.75) / 100 AS p75,
           count(*) AS n
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q73_equidepth" ->
      """WITH t AS (
           SELECT c_custkey,
             CAST(round(c_acctbal * 100) AS BIGINT) AS cents
           FROM customer),
         b AS (
           SELECT cents,
             CAST(ntile(8) OVER (ORDER BY cents, c_custkey) AS BIGINT)
               AS bucket
           FROM t)
         SELECT bucket, CAST(count(*) AS BIGINT) AS n,
           min(cents) AS lo_cents, max(cents) AS hi_cents,
           CAST(sum(cents) AS BIGINT) AS sum_cents
         FROM b GROUP BY bucket ORDER BY bucket""",
    "q74_mode_by_segment" ->
      """WITH c AS (
           SELECT c.c_mktsegment, o.o_orderpriority,
             CAST(count(*) AS BIGINT) AS n_orders
           FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey
           GROUP BY 1, 2),
         r AS (
           SELECT *, row_number() OVER (PARTITION BY c_mktsegment
             ORDER BY n_orders DESC, o_orderpriority) AS rk
           FROM c)
         SELECT c_mktsegment, o_orderpriority AS modal_priority,
           n_orders
         FROM r WHERE rk = 1 ORDER BY c_mktsegment""",
    "q28_range_join" ->
      """SELECT e.event_id,
           CAST(count(x.event_id) AS BIGINT) AS n_following
         FROM events e LEFT JOIN events x
           ON x.ts >= e.ts AND x.ts < e.ts + INTERVAL 10 MINUTE
              AND x.event_id <> e.event_id
         WHERE e.event_type = 'error'
         GROUP BY e.event_id ORDER BY e.event_id""",
    "q25_stats" ->
      """WITH m AS (
           -- HUGEINT moments mirror the Spark side's decimal(38,0):
           -- BIGINT c*c overflows at the same magnitudes the widening
           -- exists for, and both 128-bit exact domains round to the
           -- identical DOUBLE below
           SELECT event_type, count(*) AS n0,
             sum(CAST(c AS HUGEINT)) AS s1,
             sum(CAST(c AS HUGEINT) * c) AS s2,
             sum(CAST(k AS HUGEINT)) AS sk,
             sum(CAST(k AS HUGEINT) * k) AS skk,
             sum(CAST(c AS HUGEINT) * k) AS svk
           FROM (SELECT event_type,
                   CAST(round(value * 100) AS BIGINT) AS c,
                   CAST(floor(CAST(json_extract_string(props, '$.k')
                        AS DOUBLE)) AS BIGINT) AS k
                 FROM events)
           GROUP BY event_type)
         SELECT event_type,
           round(CAST(s1 AS DOUBLE) / (n0 * 100.0), 2) AS mean_value,
           CASE WHEN n0 > 1 THEN
             round(sqrt(CAST(n0 * s2 - s1 * s1 AS DOUBLE) /
               (n0 * (n0 - 1)) / 10000.0), 2) END AS sd_value,
           CASE WHEN n0 > 1 THEN
             round(CAST(n0 * s2 - s1 * s1 AS DOUBLE) /
               (n0 * (n0 - 1)) / 10000.0, 2) END AS var_value,
           CASE WHEN n0 > 1 AND n0 * s2 - s1 * s1 > 0
                     AND n0 * skk - sk * sk > 0 THEN
             round(CAST(n0 * svk - s1 * sk AS DOUBLE) /
               (sqrt(CAST(n0 * s2 - s1 * s1 AS DOUBLE)) *
                sqrt(CAST(n0 * skk - sk * sk AS DOUBLE))), 2)
           END + 0.0 AS corr_vk,
           n0 AS n
         FROM m ORDER BY event_type""",
    "q129_json_roundtrip" ->
      """SELECT c_mktsegment, CAST(count(*) AS BIGINT) AS n,
           CAST(count(DISTINCT c_nationkey) AS BIGINT) AS n_nations,
           CAST(sum(c_custkey) AS BIGINT) AS key_sum
         FROM customer GROUP BY 1 ORDER BY 1""",

    "q23_csv_roundtrip" ->
      """SELECT l_returnflag, count(*) AS n, sum(l_quantity) AS sum_qty,
         count(DISTINCT l_orderkey) AS n_orders
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q24_orc_roundtrip" ->
      """SELECT o_orderstatus, count(*) AS n,
         round(sum(o_totalprice), 2) AS total
         FROM orders GROUP BY o_orderstatus ORDER BY o_orderstatus""",
    "q22_grouping_sets" ->
      """SELECT o_orderstatus, o_orderpriority,
         CAST(grouping(o_orderstatus) AS BIGINT) AS g_status,
         CAST(grouping(o_orderpriority) AS BIGINT) AS g_prio,
         count(*) AS n, round(sum(o_totalprice), 2) AS total
         FROM orders
         GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
         ORDER BY g_status, g_prio, o_orderstatus NULLS FIRST,
           o_orderpriority NULLS FIRST""",
    "q21_array_funcs" ->
      """WITH t AS (SELECT doc_id,
           string_split_regex(lower(text), '\s+') AS tk FROM documents)
         SELECT doc_id,
           tk[1] AS first_tok,
           tk[len(tk)] AS last_tok,
           array_to_string(tk[1:3], '-') AS head3_joined,
           CAST(len(list_distinct(tk)) AS BIGINT) AS n_distinct,
           list_contains(tk, 'spark') AS has_spark,
           CAST(len(list_filter(tk, x -> length(x) > 5)) AS BIGINT) AS n_long_toks,
           CAST(list_max(list_transform(tk, x -> length(x))) AS BIGINT) AS max_tok_len
         FROM t ORDER BY doc_id""",
    "q20_percentiles" ->
      """SELECT l_returnflag,
         quantile_cont(l_quantity, 0.25) AS p25,
         quantile_cont(l_quantity, 0.5) AS p50,
         quantile_cont(l_quantity, 0.75) AS p75,
         min(l_quantity) AS qmin, max(l_quantity) AS qmax
         FROM lineitem GROUP BY l_returnflag ORDER BY l_returnflag""",
    "q31_resample" ->
      """WITH b AS (
           SELECT CAST(date_trunc('hour', min(ts)) AS TIMESTAMP) AS h0,
                  CAST(date_trunc('hour', max(ts)) AS TIMESTAMP) AS h1
           FROM events),
         grid AS (
           SELECT t.event_type, g.h
           FROM (SELECT DISTINCT event_type FROM events) t
           CROSS JOIN (SELECT unnest(generate_series(h0, h1,
                         INTERVAL 1 HOUR)) AS h FROM b) g),
         c AS (
           SELECT event_type, CAST(date_trunc('hour', ts) AS TIMESTAMP) AS h,
             count(*) AS cnt, round(sum(value), 2) AS sv
           FROM events GROUP BY 1, 2)
         SELECT grid.event_type, CAST(grid.h AS TIMESTAMP) AS hour,
           coalesce(c.cnt, 0) AS n, coalesce(c.sv, 0.0) AS sum_value
         FROM grid LEFT JOIN c
           ON grid.event_type = c.event_type AND grid.h = c.h
         ORDER BY grid.event_type, grid.h""",
    "q32_histogram" ->
      """WITH t AS (
           SELECT CAST(round(o_totalprice * 100) AS BIGINT) // 2500000
             AS bucket FROM orders)
         SELECT bucket,
           round(CAST(bucket * 2500000 AS DOUBLE) / 100, 2) AS lo,
           round(CAST((bucket + 1) * 2500000 AS DOUBLE) / 100, 2) AS hi,
           count(*) AS n
         FROM t GROUP BY bucket ORDER BY bucket""",
    "q33_log_anomaly" ->
      """WITH e AS (
           SELECT event_id, event_type, value,
             CAST(round(value * 100) AS BIGINT) AS c
           FROM events),
         st AS (
           SELECT event_type, count(*) AS n, sum(c) AS s1,
             sum(c * c) AS s2
           FROM e GROUP BY event_type)
         SELECT e.event_id, e.event_type, e.value,
           CASE WHEN st.n * e.c > st.s1 THEN 'high' ELSE 'low' END AS side
         FROM e JOIN st ON e.event_type = st.event_type
         WHERE st.n > 1
           AND (st.n * e.c - st.s1) * (st.n * e.c - st.s1) * (st.n - 1)
             > 9 * st.n * (st.n * st.s2 - st.s1 * st.s1)
         ORDER BY e.event_id""",
    "q34_rank_funcs" ->
      """SELECT o_orderpriority, o_orderkey, o_totalprice,
         CAST(dense_rank() OVER w AS BIGINT) AS drank,
         CAST(ntile(4) OVER w AS BIGINT) AS quartile,
         percent_rank() OVER w AS pct_rank,
         cume_dist() OVER w AS cdist
         FROM orders
         WINDOW w AS (PARTITION BY o_orderpriority
                      ORDER BY o_totalprice DESC, o_orderkey)
         ORDER BY o_orderpriority, o_totalprice DESC, o_orderkey""",
    "q35_lateral" ->
      """SELECT c.c_custkey, c.c_name, t.o_orderkey, t.o_totalprice
         FROM customer c, LATERAL (
           SELECT o_orderkey, o_totalprice FROM orders
           WHERE o_custkey = c.c_custkey
           ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
         ORDER BY c.c_custkey, t.o_totalprice DESC, t.o_orderkey""",
    "q36_funnel" ->
      """WITH v AS (
           SELECT user_id,
             min(CASE WHEN event_type = 'view' THEN ts END) AS v_ts
           FROM events GROUP BY user_id),
         c AS (
           SELECT e.user_id, min(e.ts) AS c_ts
           FROM events e JOIN v ON e.user_id = v.user_id
           WHERE e.event_type = 'click' AND e.ts >= v.v_ts
           GROUP BY e.user_id),
         p AS (
           SELECT e.user_id, min(e.ts) AS p_ts
           FROM events e JOIN c ON e.user_id = c.user_id
           WHERE e.event_type = 'purchase' AND e.ts >= c.c_ts
           GROUP BY e.user_id),
         u AS (SELECT DISTINCT user_id FROM events)
         SELECT u.user_id,
           CAST(v.v_ts AS TIMESTAMP) AS view_ts,
           CAST(c.c_ts AS TIMESTAMP) AS click_ts,
           CAST(p.p_ts AS TIMESTAMP) AS purchase_ts,
           CAST(CASE WHEN p.p_ts IS NOT NULL THEN 3
                     WHEN c.c_ts IS NOT NULL THEN 2
                     WHEN v.v_ts IS NOT NULL THEN 1
                     ELSE 0 END AS BIGINT) AS stage
         FROM u LEFT JOIN v ON u.user_id = v.user_id
         LEFT JOIN c ON u.user_id = c.user_id
         LEFT JOIN p ON u.user_id = p.user_id
         ORDER BY u.user_id""",
    "q37_attribution" ->
      """SELECT c.user_id, p.event_id AS purchase_id,
         c.event_id AS click_id,
         epoch_us(p.ts) - epoch_us(c.ts) AS lag_us, p.value
         FROM events c JOIN events p
           ON c.user_id = p.user_id
         WHERE c.event_type = 'click' AND p.event_type = 'purchase'
           AND c.ts <= p.ts
           AND c.ts >= p.ts - INTERVAL 30 MINUTE
         ORDER BY c.user_id, purchase_id, click_id""",
    "q38_retention" ->
      """WITH firsts AS (
           SELECT user_id, min(CAST(ts AS DATE)) AS cohort
           FROM events GROUP BY user_id),
         activity AS (
           SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
         SELECT CAST(f.cohort AS TIMESTAMP) AS cohort,
           CAST(datediff('day', f.cohort, a.day) // 7 AS BIGINT)
             AS week_off,
           count(DISTINCT a.user_id) AS n_users
         FROM activity a JOIN firsts f ON a.user_id = f.user_id
         GROUP BY 1, 2 ORDER BY cohort, week_off""")
}
