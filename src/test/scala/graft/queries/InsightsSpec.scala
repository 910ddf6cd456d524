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

  test("Mann-Kendall S matches a brute-force pair walk per type") {
    val rows = Insights.queries("q110_trend_mk")(spark, sf)
      .as[(String, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val daily = graft.Tables.load(spark, sf, "events")
      .selectExpr("event_type", "cast(ts as date) as day",
        "cast(round(value * 100) as long) as cents")
      .groupBy($"event_type", $"day")
      .agg(org.apache.spark.sql.functions.sum($"cents").as("v"))
      .selectExpr("event_type", "cast(day as string)", "v")
      .as[(String, String, Long)].collect()
    val byType = daily.groupBy(_._1)
    rows.foreach { case (et, nDays, nPairs, s0, tau) =>
      val vs = byType(et).sortBy(_._2).map(_._3)
      assert(nDays == vs.length)
      var s = 0L; var p = 0L
      for (i <- vs.indices; j <- (i + 1) until vs.length) {
        p += 1
        s += java.lang.Long.signum(vs(j) - vs(i))
      }
      assert(nPairs == p && s0 == s, s"type $et")
      assert(math.abs(tau - s.toDouble / p) < 6e-5, s"tau $et")
    }
    spark.catalog.clearCache()
  }

  test("rolling 7-day DAU matches brute-force window counts") {
    val rows = Insights.queries("q111_rolling_dau")(spark, sf)
      .selectExpr("cast(day as date) as day", "dau", "dau7")
      .as[(java.sql.Date, Long, Long)].collect()
    assert(rows.nonEmpty)
    val act = graft.Tables.load(spark, sf, "events")
      .selectExpr("user_id", "cast(ts as date) as day").distinct()
      .as[(Long, java.sql.Date)].collect()
      .map { case (u, dt) => (u, dt.toLocalDate.toEpochDay) }
    val actSet = act.toSet
    val days = rows.map(_._1.toLocalDate.toEpochDay).sorted
    // dense calendar spine
    days.sliding(2).foreach {
      case Array(a, b) => assert(b - a == 1, "spine gap")
      case _ =>
    }
    rows.foreach { case (dt, dau, dau7) =>
      val d = dt.toLocalDate.toEpochDay
      val users = act.collect {
        case (u, ad) if ad <= d && ad >= d - 6 => u }.toSet
      assert(dau7 == users.size, s"day $dt dau7")
      assert(dau == act.count { case (u, ad) => ad == d }, s"day $dt dau")
      assert(actSet.size >= dau)
    }
    spark.catalog.clearCache()
  }

  test("streaks: islands decomposition conserves active days") {
    val rows = Insights.queries("q113_streaks")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val act = graft.Tables.load(spark, sf, "events")
      .selectExpr("user_id", "cast(ts as date) as day").distinct()
      .as[(Long, java.sql.Date)].collect()
      .groupBy(_._1)
      .map { case (u, ds) =>
        u -> ds.map(_._2.toLocalDate.toEpochDay).sorted }
    rows.foreach { case (u, nDays, nStreaks, maxStreak) =>
      val ds = act(u)
      // brute-force runs of consecutive days
      val runs = ds.foldLeft(List.empty[List[Long]]) {
        case (acc @ (run @ (h :: _)) :: rest, d) if d == h + 1 =>
          (d :: run) :: rest
        case (acc, d) => List(d) :: acc
      }.map(_.length.toLong)
      assert(nDays == ds.length, s"user $u days")
      assert(nStreaks == runs.length, s"user $u streaks")
      assert(maxStreak == runs.max, s"user $u max")
      assert(runs.sum == nDays, s"user $u conservation")
    }
    spark.catalog.clearCache()
  }

  test("skew profile stats match a direct per-column recompute") {
    val rows = Insights.queries("q112_skew_profile")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Double, Double)]
      .collect().map(r => r._1 -> r).toMap
    assert(rows.size == 5)
    def check(label: String, keys: Seq[Any]): Unit = {
      val freq = keys.groupBy(identity).map(_._2.size.toLong).toSeq
        .sorted
      val n = freq.sum
      val k = freq.length.toLong
      def cumFirst(p: Long => Boolean): Long = {
        var cum = 0L
        freq.find { f => cum += 1; p(cum) }.get
      }
      val (_, nRows, nKeys, med, p99, maxF, share, ratio) = rows(label)
      assert(nRows == n && nKeys == k, label)
      assert(maxF == freq.max, label)
      assert(med == cumFirst(c => 2 * c >= k), s"$label median")
      assert(p99 == cumFirst(c => 100 * c >= 99 * k), s"$label p99")
      assert(math.abs(share - maxF.toDouble / n) < 1e-5, label)
      assert(math.abs(ratio - maxF.toDouble / med) < 1e-3, label)
    }
    import org.apache.spark.sql.functions.col
    val li = graft.Tables.load(spark, sf, "lineitem")
    check("lineitem.l_partkey",
      li.select(col("l_partkey")).as[Long].collect().toSeq)
    check("lineitem.l_suppkey",
      li.select(col("l_suppkey")).as[Long].collect().toSeq)
    check("orders.o_custkey", graft.Tables.load(spark, sf, "orders")
      .select(col("o_custkey")).as[Long].collect().toSeq)
    val ev = graft.Tables.load(spark, sf, "events")
    check("events.user_id",
      ev.select(col("user_id")).as[Long].collect().toSeq)
    check("events.event_type",
      ev.select(col("event_type")).as[String].collect().toSeq)
    spark.catalog.clearCache()
  }

  test("Holt smoothing matches the driver-side two-state recursion") {
    val rows = Insights.queries("q114_holt_forecast")(spark, sf)
      .as[(String, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    val daily = graft.Tables.load(spark, sf, "events")
      .selectExpr("event_type", "cast(ts as date) as day",
        "cast(round(value * 100) as long) as cents")
      .groupBy($"event_type", $"day")
      .agg(org.apache.spark.sql.functions.sum($"cents").as("v"))
      .selectExpr("event_type", "cast(day as string)", "v")
      .as[(String, String, Long)].collect()
      .groupBy(_._1)
      .map { case (et, ds) => et -> ds.sortBy(_._2).map(_._3.toDouble) }
    rows.foreach { case (et, nDays, level, trend, fc) =>
      val vs = daily(et)
      assert(nDays == vs.length)
      var l = vs.head; var t = 0.0
      vs.tail.foreach { x =>
        val nl = 0.2 * x + 0.8 * (l + t)
        t = 0.3 * (nl - l) + 0.7 * t
        l = nl
      }
      assert(math.abs(level - l) < 1e-3, s"$et level")
      assert(math.abs(trend - t) < 1e-3, s"$et trend")
      assert(math.abs(fc - (l + t)) < 2e-3, s"$et forecast")
    }
    spark.catalog.clearCache()
  }

  test("FD discovery: PK dependencies hold, violation counts reconcile") {
    val rows = Insights.queries("q115_fd_discovery")(spark, sf)
      .as[(String, Long, Long, Long, Boolean)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows.size == 8)
    // key-determined FDs must hold by construction
    Seq("orders.o_orderkey -> orders.o_custkey",
      "orders.o_orderkey -> orders.o_orderstatus",
      "customer.c_custkey -> customer.c_mktsegment",
      "nation.n_nationkey -> nation.n_regionkey").foreach { fd =>
      val (_, nDet, nPairs, nViol, holds) = rows(fd)
      assert(holds && nViol == 0 && nPairs == nDet, fd)
    }
    // brute-force one non-trivial pair
    val li = graft.Tables.load(spark, sf, "lineitem")
      .selectExpr("l_partkey", "l_suppkey").as[(Long, Long)].collect()
    val byPart = li.groupBy(_._1).map { case (k, v) =>
      k -> v.map(_._2).distinct.length }
    val (_, nDet, nPairs, nViol, holds) =
      rows("lineitem.l_partkey -> lineitem.l_suppkey")
    assert(nDet == byPart.size)
    assert(nPairs == byPart.values.map(_.toLong).sum)
    assert(nViol == byPart.values.count(_ > 1))
    assert(holds == (nViol == 0))
    spark.catalog.clearCache()
  }

  test("null-aware anti join: NOT IN is empty, guarded == NOT EXISTS") {
    val row = graft.SparkEntry.queries("q116_null_aware_antijoin")(
      spark, sf).as[(Long, Long, Long, Long)].collect().head
    val (nParts, notIn, notExists, guarded) = row
    assert(nParts > 0)
    assert(notIn == 0L, "NULL in subquery must empty NOT IN")
    assert(notExists == guarded, "guarded NOT IN must equal NOT EXISTS")
    assert(notExists > 0L, "scoped subquery must leave non-matches")
    assert(notExists < nParts)
    spark.catalog.clearCache()
  }

  test("runs test matches a driver-side runs count and z assembly") {
    val rows = Insights.queries("q117_runs_test")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val daily = graft.Tables.load(spark, sf, "events")
      .selectExpr("event_type", "cast(ts as date) as day",
        "cast(round(value * 100) as long) as cents")
      .groupBy($"event_type", $"day")
      .agg(org.apache.spark.sql.functions.sum($"cents").as("v"))
      .selectExpr("event_type", "cast(day as string)", "v")
      .as[(String, String, Long)].collect().groupBy(_._1)
    rows.foreach { case (et, nDays, med, nPos, nNeg, nRuns, z) =>
      val vs = daily(et).sortBy(_._2).map(_._3)
      assert(nDays == vs.length)
      val sortedV = vs.sorted
      assert(med == sortedV((vs.length + 1) / 2 - 1), s"$et median")
      val signs = vs.map(v => java.lang.Long.signum(v - med))
        .filter(_ != 0)
      assert(nPos == signs.count(_ == 1) && nNeg == signs.count(_ == -1))
      val runs = 1 + signs.sliding(2).count {
        case Array(a, b) => a != b
        case _ => false
      }
      assert(nRuns == runs, s"$et runs")
      val n = signs.length.toDouble
      val p = (nPos * nNeg).toDouble
      val mu = 1.0 + 2.0 * p / n
      val s2 = 2.0 * p * (2.0 * p - n) / (n * n * (n - 1.0))
      assert(math.abs(z - (runs - mu) / math.sqrt(s2)) < 1e-3, s"$et z")
    }
    spark.catalog.clearCache()
  }

  test("HHI matches a direct recompute and sits in [1/n, 1]") {
    val rows = Insights.queries("q118_hhi_concentration")(spark, sf)
      .as[(String, Long, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    val bySupp = graft.Tables.load(spark, sf, "lineitem")
      .join(graft.Tables.load(spark, sf, "supplier"),
        $"l_suppkey" === $"s_suppkey")
      .selectExpr("s_nationkey",
        "l_suppkey", "cast(round(l_extendedprice * 100) as long) as c")
      .groupBy($"s_nationkey", $"l_suppkey")
      .agg(org.apache.spark.sql.functions.sum($"c").as("c"))
      .as[(Int, Long, Long)].collect().groupBy(_._1)
    val nations = graft.Tables.load(spark, sf, "nation")
      .selectExpr("n_nationkey", "n_name").as[(Int, String)]
      .collect().toMap
    rows.foreach { case (nation, nSupp, tot, hhi, topShare) =>
      val key = nations.find(_._2 == nation).get._1
      val cs = bySupp(key).map(_._3)
      assert(nSupp == cs.length && tot == cs.sum, nation)
      val want = cs.map(c => BigInt(c) * BigInt(c)).sum.toDouble /
        (tot.toDouble * tot.toDouble)
      assert(math.abs(hhi - want) < 1e-5, s"$nation hhi")
      assert(hhi >= 1.0 / nSupp - 1e-9 && hhi <= 1.0 + 1e-9, nation)
      assert(math.abs(topShare - cs.max.toDouble / tot) < 1e-5, nation)
    }
    spark.catalog.clearCache()
  }

  test("mutual information matches a driver recompute, 0 <= MI <= min(H)") {
    val (nEvents, nCells, mi, hT, hD, unc) =
      Insights.queries("q119_mutual_information")(spark, sf)
        .as[(Long, Long, Double, Double, Double, Double)]
        .collect().head
    val cells = graft.Tables.load(spark, sf, "events")
      .selectExpr("event_type", "cast(dayofweek(cast(ts as date)) as long) as w")
      .groupBy($"event_type", $"w").count()
      .as[(String, Long, Long)].collect()
    val n = cells.map(_._3).sum.toDouble
    assert(nEvents == n.toLong && nCells == cells.length)
    val pe = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum / n)
    val pw = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum / n)
    val wantMi = cells.map { case (e, w, c) =>
      (c / n) * math.log((c / n) / (pe(e) * pw(w)))
    }.sum
    def h(ps: Iterable[Double]) = -ps.map(p => p * math.log(p)).sum
    assert(math.abs(mi - wantMi) < 1e-3, "mi")
    assert(math.abs(hT - h(pe.values)) < 1e-3, "h_type")
    assert(math.abs(hD - h(pw.values)) < 1e-3, "h_dow")
    assert(mi >= -1e-9 && mi <= math.min(hT, hD) + 1e-6)
    assert(math.abs(unc - mi / math.min(hT, hD)) < 1e-3)
    spark.catalog.clearCache()
  }

  test("KM survival is non-increasing and conserves the cohort") {
    val rows = Insights.queries("q120_survival_km")(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    val nCust = graft.Tables.load(spark, sf, "orders")
      .select($"o_custkey").distinct().count()
    // events + censored tile the cohort exactly once
    assert(rows.map(r => r._3 + r._4).sum == nCust)
    // at-risk at the earliest month is the whole cohort
    assert(rows.head._2 == nCust)
    // survival starts <= 1 and never increases
    rows.map(_._5).sliding(2).foreach {
      case Array(a, b) => assert(b <= a + 1e-9, "survival increased")
      case _ =>
    }
    assert(rows.forall(r => r._5 >= -1e-9 && r._5 <= 1.0 + 1e-9))
    // direct recompute of the KM product
    var surv = 1.0
    rows.foreach { case (_, nRisk, d, _, got) =>
      surv *= 1.0 - d.toDouble / nRisk
      assert(math.abs(got - surv) < 1e-4)
    }
    spark.catalog.clearCache()
  }

  test("sequence support matches a brute-force exists-before check") {
    val rows = Insights.queries("q121_seq_support")(spark, sf)
      .as[(String, String, Long, Double)].collect()
    assert(rows.nonEmpty)
    val ev = graft.Tables.load(spark, sf, "events")
      .selectExpr("user_id", "event_type", "cast(ts as long) as t")
      .as[(Long, String, Long)].collect()
    val byUser = ev.groupBy(_._1)
    val users = byUser.keySet
    rows.foreach { case (a, b, n, support) =>
      val want = users.count { u =>
        val es = byUser(u)
        val as = es.filter(_._2 == a).map(_._3)
        val bs = es.filter(_._2 == b).map(_._3)
        as.nonEmpty && bs.nonEmpty && as.min < bs.max
      }
      assert(n == want, s"($a,$b)")
      assert(math.abs(support - n.toDouble / users.size) < 1e-4)
    }
    spark.catalog.clearCache()
  }

  test("resurrection decomposition conserves actives and users") {
    val rows = Insights.queries("q122_resurrected")(spark, sf)
      .selectExpr("cast(day as date)", "n_active", "n_new",
        "n_returning", "n_resurrected")
      .as[(java.sql.Date, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (d, act, nw, ret, res) =>
      assert(act == nw + ret + res, s"day $d")
    }
    val nUsers = graft.Tables.load(spark, sf, "events")
      .select($"user_id").distinct().count()
    assert(rows.map(_._3).sum == nUsers, "every user is new exactly once")
    spark.catalog.clearCache()
  }

  test("A/B z-test matches a driver recompute on the planted split") {
    val (nA, cA, nB, cB, pA, pB, z) =
      Insights.queries("q123_ab_ztest")(spark, sf)
        .as[(Long, Long, Long, Long, Double, Double, Option[Double])]
        .collect().head
    val purch = graft.Tables.load(spark, sf, "events")
      .filter($"event_type" === "purchase")
      .groupBy($"user_id").count()
      .as[(Long, Long)].collect().toMap
    val allUsers = graft.Tables.load(spark, sf, "events")
      .select($"user_id").distinct().as[Long].collect()
    val (a, b) = allUsers.partition(_ % 2 == 0)
    def conv(us: Array[Long]) =
      us.count(u => purch.getOrElse(u, 0L) >= 15).toLong
    assert(nA == a.length && nB == b.length)
    assert(cA == conv(a) && cB == conv(b))
    assert(math.abs(pA - cA.toDouble / nA) < 1e-5)
    if (cA + cB > 0 && cA + cB < nA + nB) {
      val p = (cA + cB).toDouble / (nA + nB)
      val want = (cA.toDouble / nA - cB.toDouble / nB) /
        math.sqrt(p * (1 - p) * (1.0 / nA + 1.0 / nB))
      assert(math.abs(z.get - want) < 1e-3)
    } else assert(z.isEmpty, "degenerate pool must yield NULL z")
    spark.catalog.clearCache()
  }

  test("out-of-order audit matches a brute-force lateness walk") {
    val (nEv, nLate, maxLate, meanLate, share) =
      Insights.queries("q124_out_of_order_audit")(spark, sf)
        .as[(Long, Long, Long, Long, Double)].collect().head
    val ev = graft.Tables.load(spark, sf, "events")
      .selectExpr("user_id", "event_id", "unix_micros(ts) as us")
      .as[(Long, Long, Long)].collect()
    assert(nEv == ev.length)
    var late = List.empty[Long]
    ev.groupBy(_._1).values.foreach { es =>
      var hwm = Long.MinValue
      es.sortBy(_._2).foreach { case (_, _, t) =>
        if (hwm != Long.MinValue && t < hwm) late ::= (hwm - t)
        hwm = math.max(hwm, t)
      }
    }
    assert(nLate == late.length)
    assert(maxLate == (if (late.isEmpty) 0L else late.max))
    assert(meanLate == (if (late.isEmpty) 0L
      else late.sum / late.length))
    assert(math.abs(share - nLate.toDouble / nEv) < 1e-5)
    spark.catalog.clearCache()
  }

  test("KS statistic matches a brute-force CDF sweep") {
    val (n1, n2, dNum, atCents, ksD) =
      Insights.queries("q125_two_sample_ks")(spark, sf)
        .as[(Long, Long, Long, Long, Double)].collect().head
    val vals = graft.Tables.load(spark, sf, "orders")
      .filter($"o_orderpriority".isin("1-URGENT", "5-LOW"))
      .selectExpr("cast(round(o_totalprice * 100) as long) as c",
        "o_orderpriority = '1-URGENT' as isa")
      .as[(Long, Boolean)].collect()
    val (a, b) = vals.partition(_._2)
    assert(n1 == a.length && n2 == b.length)
    val support = vals.map(_._1).distinct.sorted
    val sweeps = support.map { v =>
      val c1 = a.count(_._1 <= v).toLong
      val c2 = b.count(_._1 <= v).toLong
      (v, math.abs(c1 * n2 - c2 * n1))
    }
    val wantD = sweeps.map(_._2).max
    assert(dNum == wantD)
    assert(atCents == sweeps.filter(_._2 == wantD).map(_._1).min)
    assert(math.abs(ksD - wantD.toDouble / (n1.toDouble * n2)) < 1e-5)
    assert(ksD >= 0 && ksD <= 1.0)
    spark.catalog.clearCache()
  }

  test("Spearman rho matches a driver-side tied-rank recompute") {
    val (nCust, rho) = Insights.queries("q126_spearman")(spark, sf)
      .as[(Long, Double)].collect().head
    val cust = graft.Tables.load(spark, sf, "orders")
      .groupBy($"o_custkey")
      .agg(org.apache.spark.sql.functions
        .sum(org.apache.spark.sql.functions
          .round($"o_totalprice" * 100).cast("long")).as("x"),
        org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("y"))
      .as[(Long, Long, Long)].collect()
    assert(nCust == cust.length)
    def avgRanks(vs: Array[Long]): Map[Long, Double] = {
      val sorted = vs.sorted
      vs.distinct.map { v =>
        val lo = sorted.indexWhere(_ == v) + 1
        val hi = sorted.lastIndexWhere(_ == v) + 1
        v -> (lo + hi) / 2.0
      }.toMap
    }
    val rx = avgRanks(cust.map(_._2))
    val ry = avgRanks(cust.map(_._3))
    val pts = cust.map(c => (rx(c._2), ry(c._3)))
    val n = pts.length.toDouble
    val (sx, sy) = (pts.map(_._1).sum, pts.map(_._2).sum)
    val sxx = pts.map(p => p._1 * p._1).sum
    val syy = pts.map(p => p._2 * p._2).sum
    val sxy = pts.map(p => p._1 * p._2).sum
    val want = (n * sxy - sx * sy) /
      (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    assert(math.abs(rho - want) < 1e-3, s"rho $rho vs $want")
    assert(rho.abs <= 1.0 + 1e-9)
    spark.catalog.clearCache()
  }

  test("seasonal decomposition: identity holds, trend matches brute MA") {
    val rows = Insights.queries("q127_seasonal_decompose")(spark, sf)
      .selectExpr("event_type", "cast(day as date) as day", "cents",
        "trend", "seasonal", "residual")
      .as[(String, java.sql.Date, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    // additive identity is exact by construction
    rows.foreach { case (et, d, v, t, sn, r) =>
      assert(v == t + sn + r, s"$et $d identity")
    }
    // brute-force the centered MA per type
    rows.groupBy(_._1).values.foreach { series =>
      val byDay = series.sortBy(_._2.toLocalDate.toEpochDay)
      byDay.zipWithIndex.foreach { case ((et, d, _, t, _, _), i) =>
        val win = byDay.slice(math.max(0, i - 3),
          math.min(byDay.length, i + 4))
        assert(t == win.map(_._3).sum / win.length, s"$et $d trend")
      }
    }
    // seasonal components sum to ~0 over the dow means (floor-div
    // slack of at most 7 per type)
    rows.groupBy(_._1).values.foreach { series =>
      val dows = series.map(r =>
        (r._2.toLocalDate.getDayOfWeek.getValue, r._5)).distinct
      assert(math.abs(dows.map(_._2).sum) <=
        series.map(_._3).max, "seasonal mass implausible")
    }
    spark.catalog.clearCache()
  }

  test("bounce rate matches a driver-side sessionization walk") {
    val rows = Insights.queries("q128_bounce_rate")(spark, sf)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows.nonEmpty)
    val ev = graft.Tables.load(spark, sf, "events")
      .selectExpr("user_id", "event_id", "event_type",
        "unix_micros(ts) as us")
      .as[(Long, Long, String, Long)].collect()
    // driver sessionization: 30-min gaps in (ts, event_id) order
    val sessions = ev.groupBy(_._1).values.flatMap { es =>
      val sorted = es.sortBy(e => (e._4, e._2))
      val out = scala.collection.mutable.ListBuffer
        .empty[List[(Long, Long, String, Long)]]
      var cur = List.empty[(Long, Long, String, Long)]
      var prev = Long.MinValue
      sorted.foreach { e =>
        if (prev != Long.MinValue && e._4 - prev <= 1800L * 1000000L)
          cur = e :: cur
        else {
          if (cur.nonEmpty) out += cur
          cur = List(e)
        }
        prev = e._4
      }
      if (cur.nonEmpty) out += cur
      out
    }.toSeq
    val byLanding = sessions.groupBy(s =>
      s.minBy(e => (e._4, e._2))._3)
    rows.foreach { case (landing, (_, nS, nB, nE, rate)) =>
      val ss = byLanding(landing)
      assert(nS == ss.length, s"$landing sessions")
      assert(nB == ss.count(_.length == 1), s"$landing bounces")
      assert(nE == ss.map(_.length.toLong).sum, s"$landing events")
      assert(math.abs(rate - nB.toDouble / nS) < 1e-5)
    }
    assert(rows.values.map(_._4).sum == ev.length,
      "sessions tile the event stream")
    spark.catalog.clearCache()
  }

  test("effect sizes reconcile with q92's chi2 and their identities") {
    val (n, nT, nD, chi2, v, phi, c) =
      Insights.queries("q130_effect_sizes")(spark, sf)
        .as[(Long, Long, Long, Double, Double, Double, Double)]
        .collect().head
    // the chi2 replays q92's verified computation exactly
    val q92 = graft.SparkEntry.queries("q92_chi_square")(spark, sf)
      .as[(Long, Long, Double)].collect().head
    assert(q92._1 == n && math.abs(q92._3 - chi2) < 2e-4)
    // identities (on the rounded values, so loose tolerance)
    assert(math.abs(phi - math.sqrt(chi2 / n)) < 1e-3)
    assert(math.abs(v - math.sqrt(chi2 /
      (n * (math.min(nT, nD) - 1)))) < 1e-3)
    assert(math.abs(c - math.sqrt(chi2 / (chi2 + n))) < 1e-3)
    assert(v >= 0 && v <= 1 && c >= 0 && c < 1)
    spark.catalog.clearCache()
  }

  test("json roundtrip aggregate equals the direct parquet aggregate") {
    val got = graft.SparkEntry.queries("q129_json_roundtrip")(spark, sf)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    val want = graft.Tables.load(spark, sf, "customer")
      .groupBy($"c_mktsegment")
      .agg(org.apache.spark.sql.functions.count(
          org.apache.spark.sql.functions.lit(1)).as("n"),
        org.apache.spark.sql.functions.countDistinct($"c_nationkey")
          .as("nn"),
        org.apache.spark.sql.functions.sum($"c_custkey").as("ks"))
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq,
      "JSON writer/reader roundtrip lost rows or values")
    spark.catalog.clearCache()
  }

  test("ACF matches a driver-side lagged-Pearson recompute") {
    val rows = Insights.queries("q132_acf")(spark, sf)
      .as[(String, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    assert(rows.forall(r => r._4.abs <= 1.0 + 1e-9))
    val daily = graft.Tables.load(spark, sf, "events")
      .selectExpr("event_type", "cast(ts as date) as day",
        "cast(round(value * 100) as long) as cents")
      .groupBy($"event_type", $"day")
      .agg(org.apache.spark.sql.functions.sum($"cents").as("v"))
      .selectExpr("event_type", "cast(day as string)", "v")
      .as[(String, String, Long)].collect()
      .map(r => (r._1, java.time.LocalDate.parse(r._2).toEpochDay)
        -> r._3).toMap
    rows.foreach { case (et, lag, n, acf) =>
      val pairs = daily.collect {
        case ((e, d), v1) if e == et && daily.contains((e, d + lag)) =>
          (v1.toDouble, daily((e, d + lag)).toDouble)
      }.toSeq
      assert(n == pairs.length, s"$et lag $lag n")
      val k = pairs.length.toDouble
      val (sx, sy) = (pairs.map(_._1).sum, pairs.map(_._2).sum)
      val sxy = pairs.map(p => p._1 * p._2).sum
      val sxx = pairs.map(p => p._1 * p._1).sum
      val syy = pairs.map(p => p._2 * p._2).sum
      val want = (k * sxy - sx * sy) /
        (math.sqrt(k * sxx - sx * sx) * math.sqrt(k * syy - sy * sy))
      assert(math.abs(acf - want) < 1e-3, s"$et lag $lag")
    }
    spark.catalog.clearCache()
  }

  test("RFM migration matrix conserves customers and balances terciles") {
    val rows = Insights.queries("q133_rfm_migration")(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val nCust = graft.Tables.load(spark, sf, "orders")
      .select($"o_custkey").distinct().count()
    assert(rows.map(_._3).sum == nCust, "matrix covers every customer")
    // no (0,0) cell: a customer inactive in both periods has no orders
    assert(!rows.exists(r => r._1 == 0 && r._2 == 0))
    // terciles balance within integer slack per active period
    Seq(1, 2).foreach { p =>
      val bySeg = (1L to 3L).map { s =>
        rows.filter(r => (if (p == 1) r._1 else r._2) == s)
          .map(_._3).sum
      }
      assert(bySeg.max - bySeg.min <= 1, s"period $p terciles $bySeg")
    }
    spark.catalog.clearCache()
  }

  test("Wilson intervals bracket p-hat inside [0,1] and match driver math") {
    val rows = Insights.queries("q134_wilson_ci")(spark, sf)
      .as[(String, Long, Long, Double, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (seg, n, k, p, lo, hi) =>
      assert(lo >= 0.0 - 1e-9 && hi <= 1.0 + 1e-9, seg)
      assert(lo <= p + 1e-9 && p <= hi + 1e-9, s"$seg CI excludes p")
      val (nd, z) = (n.toDouble, 1.96)
      val ph = k.toDouble / n
      val denom = 1.0 + z * z / nd
      val center = (ph + z * z / (2 * nd)) / denom
      val half = z * math.sqrt(ph * (1 - ph) / nd +
        z * z / (4 * nd * nd)) / denom
      assert(math.abs(lo - (center - half)) < 1e-4, seg)
      assert(math.abs(hi - (center + half)) < 1e-4, seg)
      // Wilson never collapses: positive width even at p in {0,1}
      assert(hi - lo > 0.0, seg)
    }
    spark.catalog.clearCache()
  }

  test("DiD matches a driver recompute and strips the common trend") {
    val row = Insights.queries("q135_diff_in_diff")(spark, sf)
      .as[(Long, Long, Long, Long, Double, Double, Double, Double,
        Double)].collect().head
    val (nT1, nT2, nC1, nC2, mT1, mT2, mC1, mC2, did) = row
    val ev = graft.Tables.load(spark, sf, "events")
      .selectExpr("user_id % 2 = 0 as treat", "cast(ts as date) as day",
        "cast(round(value * 100) as long) as cents")
      .selectExpr("treat", "cast(day as string) as day", "cents")
      .as[(Boolean, String, Long)].collect()
    val days = ev.map(_._2).distinct.sorted
    val (d0, d1) = (java.time.LocalDate.parse(days.head).toEpochDay,
      java.time.LocalDate.parse(days.last).toEpochDay)
    def cell(t: Boolean, post: Boolean) = ev.filter { e =>
      val d = java.time.LocalDate.parse(e._2).toEpochDay
      e._1 == t && (((d - d0) * 2 >= (d1 - d0)) == post)
    }
    val (t1, t2, c1, c2) = (cell(true, false), cell(true, true),
      cell(false, false), cell(false, true))
    assert(nT1 == t1.length && nT2 == t2.length &&
      nC1 == c1.length && nC2 == c2.length)
    def mean(xs: Array[(Boolean, String, Long)]) =
      xs.map(_._3).sum.toDouble / xs.length
    assert(math.abs(mT1 - mean(t1)) < 1e-2)
    assert(math.abs(did - ((mean(t2) - mean(t1)) -
      (mean(c2) - mean(c1)))) < 1e-2)
    // parity groups share the distribution: DiD must be near zero
    // relative to the mean level (no planted effect exists)
    assert(math.abs(did) < mean(t1) * 0.2,
      s"spurious DiD $did at level ${mean(t1)}")
    spark.catalog.clearCache()
  }

  test("retention curve is censoring-correct; halflife matches OLS") {
    val rows = Insights.queries("q136_retention_halflife")(spark, sf)
      .as[(Long, Long, Long, Double, Double, Option[Double])]
      .collect().sortBy(_._1)
    assert(rows.nonEmpty)
    val act = graft.Tables.load(spark, sf, "events")
      .selectExpr("user_id", "cast(ts as date) as day")
      .selectExpr("user_id", "cast(day as string) as day")
      .as[(Long, String)].collect()
      .map { case (u, d) => (u, java.time.LocalDate.parse(d).toEpochDay) }
    val d0 = act.map(_._2).min
    val weeks = act.map { case (u, d) => (u, (d - d0) / 7) }.distinct
    val fw = weeks.groupBy(_._1).view.mapValues(_.map(_._2).min).toMap
    val maxW = weeks.map(_._2).max
    rows.foreach { case (off, atRisk, active, rate, _, _) =>
      val wantActive = weeks.count { case (u, w) => w - fw(u) == off }
      val wantRisk = fw.values.count(_ <= maxW - off)
      assert(active == wantActive, s"offset $off active")
      assert(atRisk == wantRisk, s"offset $off at-risk")
      assert(math.abs(rate - wantActive.toDouble / wantRisk) < 1e-5)
    }
    // offset 0 rate is 1 by construction (cohort week counts itself)
    assert(math.abs(rows.head._4 - 1.0) < 1e-9)
    // OLS on offsets >= 1 reproduces the reported slope
    val fit = rows.filter(_._1 >= 1)
      .map(r => (r._1.toDouble, math.log(r._4)))
    val k = fit.length.toDouble
    val (sx, sy) = (fit.map(_._1).sum, fit.map(_._2).sum)
    val sxy = fit.map(p => p._1 * p._2).sum
    val sxx = fit.map(p => p._1 * p._1).sum
    val slope = (k * sxy - sx * sy) / (k * sxx - sx * sx)
    assert(math.abs(rows.head._5 - slope) < 1e-3)
    rows.head._6.foreach { hl =>
      assert(math.abs(hl - (-math.log(2.0) / slope)) < 1e-2)
    }
    spark.catalog.clearCache()
  }

  test("burstiness matches driver moments and sits in (-1, 1)") {
    val rows = Insights.queries("q137_interval_burstiness")(spark, sf)
      .as[(String, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    val orders = graft.Tables.load(spark, sf, "orders")
      .join(graft.Tables.load(spark, sf, "customer"),
        $"o_custkey" === $"c_custkey")
      .selectExpr("c_mktsegment", "o_custkey", "o_orderkey",
        "cast(cast(o_orderdate as date) as string) as day")
      .as[(String, Long, Long, String)].collect()
    rows.foreach { case (seg, n, meanGap, b) =>
      val gaps = orders.filter(_._1 == seg).groupBy(_._2).values
        .flatMap { os =>
          val ds = os.sortBy(o => (o._4, o._3))
            .map(o => java.time.LocalDate.parse(o._4).toEpochDay)
          ds.sliding(2).collect { case Array(a, bb) =>
            (bb - a).toDouble }
        }.toSeq
      assert(n == gaps.length, seg)
      val mu = gaps.sum / gaps.length
      val sd = math.sqrt(gaps.map(g => g * g).sum / gaps.length -
        mu * mu)
      assert(math.abs(meanGap - mu) < 1e-2, seg)
      assert(math.abs(b - (sd - mu) / (sd + mu)) < 1e-3, seg)
      assert(b > -1.0 && b < 1.0, seg)
    }
    spark.catalog.clearCache()
  }

  test("attribution sweep is monotone and matches a driver lag walk") {
    val rows = Insights.queries("q139_attribution_window_sweep")(
      spark, sf).as[(String, Long, Long, Double)].collect()
      .sortBy(_._1)
    assert(rows.length == 5)
    // coverage is monotone non-decreasing in the window length
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(b._3 >= a._3 && b._4 >= a._4 - 1e-9, "not monotone")
      case _ =>
    }
    // all windows see the same purchase population
    assert(rows.map(_._2).distinct.length == 1)
    // driver recompute for the 1h window
    val ev = graft.Tables.load(spark, sf, "events")
      .selectExpr("user_id", "event_id", "event_type",
        "unix_micros(ts) as us")
      .as[(Long, Long, String, Long)].collect()
    var nP = 0L; var nAttr1h = 0L
    ev.groupBy(_._1).values.foreach { es =>
      var lastClick = Long.MinValue
      es.sortBy(e => (e._4, e._2)).foreach { e =>
        if (e._3 == "purchase") {
          nP += 1
          if (lastClick != Long.MinValue &&
            e._4 - lastClick <= 3600L * 1000000L) nAttr1h += 1
        }
        if (e._3 == "click") lastClick = math.max(lastClick, e._4)
      }
    }
    assert(rows.head._2 == nP && rows.head._3 == nAttr1h)
    spark.catalog.clearCache()
  }

  test("curriculum index is contiguous and difficulty-monotone") {
    val rows = graft.SparkEntry.queries("pipeline_curriculum")(spark, sf)
      .selectExpr("curriculum_idx", "n_tokens")
      .as[(Long, Long)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    assert(rows.map(_._1).toSeq == (1L to rows.length).toSeq)
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._2 <= b._2, s"difficulty inversion at ${a._1}")
      case _ =>
    }
    spark.catalog.clearCache()
  }
}
