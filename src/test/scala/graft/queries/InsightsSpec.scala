package graft.queries

import graft.SparkSpec

/** Independent semantic checks of the round-9 Insights queries at
  * sf0.001 — each re-derives the property with a driver-side brute
  * formulation (the MiningSpec discipline).
  */
class InsightsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("rolling median is the lower median of each trailing 5-frame") {
    val rows = Insights.queries("q102_rolling_median")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    // brute force: per customer, walk orders in (date, key) order
    val orders = graft.Tables.load(spark, sf, "orders")
      .selectExpr("o_custkey", "o_orderkey",
        "cast(o_orderdate as string) as dt",
        "cast(round(o_totalprice * 100) as long) as cents")
      .as[(Long, Long, String, Long)].collect()
    val expect = orders.groupBy(_._1).flatMap { case (_, os) =>
      val sorted = os.sortBy(o => (o._3, o._2))
      sorted.indices.map { i =>
        val win = sorted.slice(math.max(0, i - 4), i + 1)
          .map(_._4).sorted
        sorted(i)._2 -> win((win.length + 1) / 2 - 1)
      }
    }.toMap
    assert(rows.nonEmpty)
    rows.foreach { case (ok, _, _, med) =>
      assert(expect(ok) == med, s"order $ok")
    }
    spark.catalog.clearCache()
  }

  test("gap-fill emits a dense calendar per priority with zeros summing up") {
    val rows = Insights.queries("q104_gap_fill")(spark, sf)
      .selectExpr("prio", "cast(day as date) as day", "n_orders")
      .as[(String, java.sql.Date, Long)].collect()
    val byPrio = rows.groupBy(_._1)
    // all priorities share the global span -> identical day counts
    assert(byPrio.values.map(_.length).toSet.size == 1)
    byPrio.values.foreach { ds =>
      val days = ds.map(_._2.toLocalDate).sortBy(_.toEpochDay)
      days.sliding(2).foreach {
        case Array(a, b) => assert(b.toEpochDay - a.toEpochDay == 1,
          s"calendar gap between $a and $b")
        case _ =>
      }
    }
    // zero-filled rows exist and the nonzero mass equals the raw count
    val total = rows.map(_._3).sum
    val nOrders = graft.Tables.load(spark, sf, "orders").count()
    assert(total == nOrders)
    assert(rows.exists(_._3 == 0L))
    spark.catalog.clearCache()
  }

  test("gains table: deciles partition customers, cum_share ends at 1") {
    val rows = Insights.queries("q105_gains_table")(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.map(_._1).sameElements(0L until 10L))
    val nCust = graft.Tables.load(spark, sf, "orders")
      .select("o_custkey").distinct().count()
    assert(rows.map(_._2).sum == nCust)
    assert(math.abs(rows.last._5 - 1.0) < 1e-9)
    // spend-ranked: per-decile totals are non-increasing
    val cents = rows.map(_._3)
    cents.sliding(2).foreach {
      case Array(a, b) => assert(a >= b)
      case _ =>
    }
    spark.catalog.clearCache()
  }

  test("benford chi2 is non-negative and digit mass covers all orders") {
    val rows = Insights.queries("q106_benford")(spark, sf)
      .as[(String, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, _, chi2) => assert(chi2 >= 0.0) }
    assert(rows.map(_._2).sum ==
      graft.Tables.load(spark, sf, "orders").count())
    spark.catalog.clearCache()
  }

  test("EMA matches the driver-side first-seeded recursion") {
    val got = Insights.queries("q107_ema")(spark, sf)
      .as[(Long, Long, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val orders = graft.Tables.load(spark, sf, "orders")
      .selectExpr("o_custkey", "o_orderkey",
        "cast(o_orderdate as string) as dt",
        "cast(round(o_totalprice * 100) as long) as cents")
      .as[(Long, Long, String, Long)].collect()
    assert(got.nonEmpty)
    orders.groupBy(_._1).foreach { case (ck, os) =>
      val cs = os.sortBy(o => (o._3, o._2)).map(_._4.toDouble)
      val ema = cs.tail.foldLeft(cs.head)((s, x) => s * 0.8 + 0.2 * x)
      val (n, gotEma) = got(ck)
      assert(n == os.length, s"customer $ck order count")
      // round-4 display vs raw recursion: within half a grid step
      assert(math.abs(gotEma - ema) < 6e-5, s"customer $ck EMA")
    }
    spark.catalog.clearCache()
  }

  test("hour entropy is within [0, ln(buckets)] per event type") {
    val rows = Insights.queries("q103_hour_entropy")(spark, sf)
      .as[(String, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, _, nHours, h) =>
      assert(h >= -1e-9, s"$et entropy negative")
      assert(h <= math.log(nHours.toDouble) + 1e-6,
        s"$et entropy above ln($nHours)")
    }
    spark.catalog.clearCache()
  }
}
