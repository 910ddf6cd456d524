package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral guards for the round-6 batch-2 sequence/reshape
  * operators (q39–q45). The DuckDB gate proves cross-engine equality;
  * these pin the semantics that a passing hash alone wouldn't explain:
  * unpivot conserves rows and sums, the transition matrix's marginals
  * tie back to event counts, SCD2 intervals tile each user's timeline,
  * the sequence regexp agrees with the funnel operator's stage-3
  * verdict, the time-weighted mean sits inside the value envelope and
  * its segmented 100 TB form is EXACTLY the adjacent form, and session
  * paths count every session exactly once.
  */
class SequenceOpsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"
  private def q(name: String) = graft.SparkEntry.queries(name)(spark, sf)

  test("q39 unpivot: 4 measures, each with exactly |lineitem| rows") {
    val li = graft.Tables.load(spark, sf, "lineitem")
    val n = li.count()
    val out = q("q39_unpivot")
      .select($"measure", $"n", $"total").as[(String, Long, Double)]
      .collect().map { case (m, n1, t) => m -> (n1, t) }.toMap
    assert(out.keySet == Set("l_quantity", "l_extendedprice",
      "l_discount", "l_tax"))
    assert(out.values.forall(_._1 == n), "a measure lost rows in the melt")
    // spot-equate one melted sum against the wide-frame original
    val qty = li.agg(sum(round($"l_quantity" * 100).cast("long")))
      .as[Long].head() / 100.0
    assert(math.abs(out("l_quantity")._2 - qty) < 1e-6)
  }

  test("q40 transitions: marginals equal per-user event counts minus one") {
    val out = q("q40_path_transitions").as[(String, String, Long)].collect()
    val total = out.map(_._3).sum
    val events = graft.Tables.load(spark, sf, "events")
    val nUsers = events.select($"user_id").distinct().count()
    // every adjacent pair per user is exactly one transition
    assert(total == events.count() - nUsers)
  }

  test("q41 scd2: intervals tile each user's change timeline") {
    val rows = q("q41_scd2")
      .select($"user_id", $"valid_from".cast("long"),
        $"valid_to".cast("long"), $"is_current")
      .as[(Long, Long, Option[Long], Boolean)].collect()
    rows.groupBy(_._1).foreach { case (_, iv) =>
      val sorted = iv.sortBy(_._2)
      // exactly one open (current) interval per user, and it is last
      assert(sorted.count(_._4) == 1 && sorted.last._4)
      // each interval ends where the next begins — no gaps, no overlap
      sorted.sliding(2).foreach {
        case Array(a, b) => assert(a._3.contains(b._2))
        case _ =>
      }
    }
  }

  test("q42 sequence match agrees with q36 funnel stage 3") {
    val converted = q("q42_seq_match")
      .filter($"converted").select($"user_id").as[Long].collect().toSet
    val stage3 = q("q36_funnel")
      .filter($"stage" === 3).select($"user_id").as[Long].collect().toSet
    assert(converted == stage3,
      "regexp v[^p]*c[^p]*p must accept exactly the funnel's " +
        "view→click→purchase completers")
  }

  test("q43 corr matrix values are in [-1, 1] and match native corr") {
    val out = q("q43_corr_matrix").as[(String, Double)].collect().toMap
    assert(out.size == 3 && out.values.forall(v => v >= -1 && v <= 1))
    // the exact-moment form is the same statistic Spark's corr computes
    val native = graft.Tables.load(spark, sf, "lineitem")
      .agg(corr($"l_quantity", $"l_extendedprice")).as[Double].head()
    assert(math.abs(out("quantity_price") - native) < 1e-3)
  }

  test("q44 segmented (100 TB) time-weighted form equals adjacent form") {
    val ev = graft.Tables.load(spark, sf, "events")
    val a = Analytics.twAdjacent(ev).as[(String, Double, Long)]
      .collect().sortBy(_._1)
    val b = Analytics.twSegmented(ev).as[(String, Double, Long)]
      .collect().sortBy(_._1)
    assert(a.sameElements(b),
      "day-bucketed boundary chain must telescope to the exact " +
        "adjacent-interval sum")
    // weighted mean lies inside the value envelope
    val (lo, hi) = ev.agg(min($"value"), max($"value"))
      .as[(Double, Double)].head()
    assert(a.forall { case (_, m, _) => m >= lo - 1e-9 && m <= hi + 1e-9 })
  }

  test("q46 growth: weekly counts reconcile with total events") {
    val out = q("q46_wow_growth")
      .select($"event_type", $"n", $"growth_pct")
    val total = out.agg(sum($"n")).as[Long].head()
    assert(total == graft.Tables.load(spark, sf, "events").count())
    // growth is null exactly on each type's first week
    val nulls = out.filter($"growth_pct".isNull).count()
    val types = out.select($"event_type").distinct().count()
    assert(nulls == types)
  }

  test("q47 pareto: cumulative share is monotone and ends at 1.0") {
    val rows = q("q47_pareto")
      .select($"cum_share", $"in_top80").as[(Double, Boolean)].collect()
    assert(rows.last._1 == 1.0)
    assert(rows.sliding(2).forall {
      case Array(a, b) => a._1 <= b._1; case _ => true })
    // the 80% flag is a prefix: once false, never true again
    assert(!rows.dropWhile(_._2).exists(_._2))
    spark.catalog.clearCache()
  }

  test("q48 first touch picks the earliest click of q37's pairs") {
    val pairs = q("q37_attribution")
      .select($"purchase_id", $"click_id", $"lag_us")
      .as[(Long, Long, Long)].collect()
    // q37 lag_us = purchase - click, so earliest click = max lag
    val want = pairs.groupBy(_._1).view
      .mapValues(_.maxBy(p => (p._3, -p._2))._2).toMap
    val got = q("q48_first_touch")
      .select($"purchase_id", $"first_click_id")
      .as[(Long, Long)].collect().toMap
    assert(got == want)
  }

  test("q45 session paths: session total matches q15's session count") {
    val paths = q("q45_session_paths").as[(String, Long)].collect()
    assert(paths.nonEmpty && paths.length <= 20)
    // top-20 is a subset; totals bounded by the full session count
    val allSessions = q("q15_sessionize")
      .agg(sum($"n_sessions")).as[Long].head()
    assert(paths.map(_._2).sum <= allSessions)
    // descending count order with path tie-break
    paths.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._2 > b._2 || (a._2 == b._2 && a._1 < b._1))
      case _ =>
    }
  }
}
