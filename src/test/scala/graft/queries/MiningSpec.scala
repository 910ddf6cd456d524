package graft.queries

import graft.SparkSpec

/** Independent brute-force checks of the Mining queries at sf0.001 —
  * each re-derives the answer with the quadratic / single-sort shape
  * the distributed formulation exists to avoid, the same
  * cross-formulation discipline as GraphSpec's brute-force peel.
  */
class MiningSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("skyline rows are exactly the undominated (price, size) pairs") {
    val got = Mining.queries("q76_skyline")(spark, sf)
      .as[(Long, Long, Long)].collect()
    val all = graft.Tables.load(spark, sf, "part")
      .selectExpr("p_partkey",
        "cast(round(p_retailprice * 100) as long) as c",
        "cast(p_size as long) as sz")
      .as[(Long, Long, Long)].collect()
    val want = all.filter { case (_, c, sz) =>
      !all.exists { case (_, c2, sz2) =>
        c2 <= c && sz2 >= sz && (c2 < c || sz2 > sz) }
    }.map(_._1).sorted
    assert(got.map(_._1).sorted.sameElements(want))
    assert(got.nonEmpty)
    spark.catalog.clearCache()
  }

  test("winsorize thresholds are the sorted-multiset order statistics") {
    val got = Mining.queries("q77_winsorize")(spark, sf)
      .selectExpr("prio", "lo_cents", "hi_cents", "n")
      .as[(String, Long, Long, Long)].collect()
    val rows = graft.Tables.load(spark, sf, "orders")
      .selectExpr("o_orderpriority as prio",
        "cast(round(o_totalprice * 100) as long) as c")
      .as[(String, Long)].collect()
    got.foreach { case (prio, lo, hi, n) =>
      val xs = rows.filter(_._1 == prio).map(_._2).sorted
      assert(xs.length == n)
      assert(lo == xs(math.floor(0.05 * (xs.length - 1)).toInt))
      assert(hi == xs(math.floor(0.95 * (xs.length - 1)).toInt))
      // clamping bounds must bracket the bulk: at least 90% inside
      val inside = xs.count(x => x >= lo && x <= hi)
      assert(inside >= (0.9 * xs.length).toInt)
    }
    spark.catalog.clearCache()
  }

  test("lift recommendations are symmetric and support-pruned") {
    val got = Mining.queries("q78_lift_recs")(spark, sf)
      .selectExpr("src", "rec", "n_ab", "lift", "rnk")
      .as[(Long, Long, Long, Double, Long)].collect()
    assert(got.nonEmpty)
    // support floor holds, ranks are 1..5 and contiguous per src
    assert(got.forall(_._3 >= 3))
    got.groupBy(_._1).foreach { case (_, rs) =>
      assert(rs.map(_._5).sorted.sameElements(1L to rs.length))
      assert(rs.length <= 5)
    }
    // lift is order-symmetric: (a,b) and (b,a) carry the same score
    val score = got.map(r => ((r._1, r._2), r._4)).toMap
    score.foreach { case ((a, b), l) =>
      score.get((b, a)).foreach(l2 => assert(l2 == l))
    }
    spark.catalog.clearCache()
  }

  test("mad matches the sorted-array double-median definition") {
    val got = Mining.queries("q80_mad")(spark, sf)
      .selectExpr("seg", "n", "med_cents", "mad_cents")
      .as[(String, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val rows = graft.Tables.load(spark, sf, "customer")
      .selectExpr("c_mktsegment as seg",
        "cast(round(c_acctbal * 100) as long) as c")
      .as[(String, Long)].collect().groupBy(_._1)
    got.foreach { case (seg, n, med, mad) =>
      val xs = rows(seg).map(_._2).sorted
      assert(n == xs.length)
      def medOf(a: Array[Long]) =
        a.sorted.apply(math.floor(0.5 * (a.length - 1)).toInt)
      assert(med == medOf(xs))
      assert(mad == medOf(xs.map(x => math.abs(x - med))))
    }
    spark.catalog.clearCache()
  }

  test("dq audit counts match direct recomputation; clean data is clean") {
    val got = Mining.queries("q81_dq_audit")(spark, sf)
      .as[(String, Long, Long)].collect().map(r => r._1 -> (r._2, r._3))
      .toMap
    assert(got.size == 7)
    val orders = graft.Tables.load(spark, sf, "orders")
    assert(got("domain_order_total_positive")._1 == orders.count())
    // synthetic data satisfies FK integrity — the audit must agree
    assert(got("fk_orders_customer")._2 == 0)
    assert(got("fk_lineitem_orders")._2 == 0)
    assert(got("pk_customer_unique")._2 == 0)
    spark.catalog.clearCache()
  }

  test("rfm quintiles are balanced and codes well-formed") {
    val got = Mining.queries("q83_rfm")(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (code, n, _) =>
      val (r, f, m) = (code / 100, (code / 10) % 10, code % 10)
      assert(r >= 1 && r <= 5 && f >= 1 && f <= 5 && m >= 1 && m <= 5)
      assert(n > 0)
    }
    // each R quintile holds n/5 customers (±1 by ntile's fill rule)
    val total = got.map(_._2).sum
    val byR = got.groupBy(_._1 / 100).view.mapValues(_.map(_._2).sum)
    byR.values.foreach(c =>
      assert(math.abs(c - total / 5.0) <= 1.0, s"$byR"))
    spark.catalog.clearCache()
  }

  test("cusum peak equals the direct max(0, S+dev) recursion") {
    val got = Mining.queries("q84_cusum")(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val daily = graft.Tables.load(spark, sf, "events")
      .selectExpr("event_type",
        "cast(datediff(to_date(ts), '2024-01-01') as long) as day",
        "cast(round(value * 100) as long) as c")
      .groupBy("event_type", "day")
      .agg(org.apache.spark.sql.functions.sum($"c").as("x"))
      .as[(String, Long, Long)].collect().groupBy(_._1)
    got.foreach { case (et, nDays, peak, peakDay) =>
      val xs = daily(et).sortBy(_._2)
      assert(nDays == xs.length)
      val n = xs.length
      val tot = xs.map(_._3).sum
      var s = 0L
      var best = 0L
      var bestDay = Long.MaxValue
      xs.foreach { case (_, day, x) =>
        s = math.max(0L, s + (n * x - tot))
        if (s > best) { best = s; bestDay = day }
      }
      assert(peak == best, s"$et: $peak vs $best")
      assert(peakDay == bestDay)
    }
    spark.catalog.clearCache()
  }

  test("interval coverage equals the brute-force minute-set union") {
    val got = Mining.queries("q85_interval_coverage")(spark, sf)
      .as[(Long, Long, Long)].collect().map(r => r._1 -> r._3).toMap
    val ev = graft.Tables.load(spark, sf, "events")
      .selectExpr("user_id", "unix_micros(ts) as us")
      .as[(Long, Long)].collect().groupBy(_._1)
    val win = 600L * 1000000L
    ev.foreach { case (u, rows) =>
      // merge-by-hand on the sorted starts
      val starts = rows.map(_._2).sorted
      var covered = 0L
      var curS = starts.head
      var curE = starts.head + win
      starts.tail.foreach { t =>
        if (t <= curE) curE = math.max(curE, t + win)
        else { covered += curE - curS; curS = t; curE = t + win }
      }
      covered += curE - curS
      assert(got(u) == covered, s"user $u: ${got(u)} vs $covered")
    }
    spark.catalog.clearCache()
  }

  test("split leakage = jaccard pairs x md5 split, recomposed by hand") {
    val got = Pipeline.queries("pipeline_split_leakage")(spark, sf)
      .selectExpr("doc_a", "doc_b", "split_a", "split_b")
      .as[(Long, Long, String, String)].collect()
    def side(text: String): String = {
      val md = java.security.MessageDigest.getInstance("MD5")
      val hex = md.digest(text.getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      if (hex.charAt(0) < 'c') "train" else "test"
    }
    val txt = graft.Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "text").as[(Long, String)].collect().toMap
    // round 10: the detector runs the lossless prefix-filter generator
    // at J >= 1/2 (see Pipeline.scala) — recompose from the same
    val allPairs = graft.dedup.Dedup.prefixFilterPairs(spark, sf)
      .selectExpr("doc_a", "doc_b").as[(Long, Long)].collect()
    val want = allPairs.filter { case (a, b) =>
      side(txt(a)) != side(txt(b)) }.toSet
    assert(got.map(r => (r._1, r._2)).toSet == want)
    got.foreach { case (a, b, sa, sb) =>
      assert(sa != sb && side(txt(a)) == sa && side(txt(b)) == sb)
    }
    spark.catalog.clearCache()
  }

  test("attribution models conserve purchase value across channels") {
    val got = Mining.queries("q86_attribution_models")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    // every model distributes each attributed purchase's value once:
    // channel totals agree across first/last, and linear differs only
    // by the per-click div truncation (< n micro-units per purchase)
    val first = got.map(_._3).sum
    val last = got.map(_._4).sum
    val linear = got.map(_._5).sum
    assert(first == last)
    assert(linear <= first * 1000000L)
    assert(first * 1000000L - linear < got.map(_._2).sum * 1000000L)
    spark.catalog.clearCache()
  }

  test("iqr outliers match the brute-force Tukey fences") {
    val got = Mining.queries("q88_iqr_outliers")(spark, sf)
      .selectExpr("n_name", "n", "q1_cents", "q3_cents", "n_outliers")
      .as[(String, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val rows = graft.Tables.load(spark, sf, "customer")
      .join(graft.Tables.load(spark, sf, "nation"),
        $"c_nationkey" === $"n_nationkey")
      .selectExpr("n_name", "cast(round(c_acctbal * 100) as long) as c")
      .as[(String, Long)].collect().groupBy(_._1)
    got.foreach { case (nm, n, q1, q3, nOut) =>
      val xs = rows(nm).map(_._2).sorted
      assert(n == xs.length)
      assert(q1 == xs(math.floor(0.25 * (xs.length - 1)).toInt))
      assert(q3 == xs(math.floor(0.75 * (xs.length - 1)).toInt))
      val iqr = q3 - q1
      val want = xs.count(x =>
        2 * x < 2 * q1 - 3 * iqr || 2 * x > 2 * q3 + 3 * iqr)
      assert(nOut == want, s"$nm: $nOut vs $want")
    }
    spark.catalog.clearCache()
  }

  test("dataset card totals reconcile with the raw corpus") {
    val got = Mining.queries("pipeline_dataset_card")(spark, sf)
      .selectExpr("lang", "source", "n_docs", "n_tokens",
        "n_exact_dup_docs", "med_tokens")
      .as[(String, String, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val docs = graft.Tables.load(spark, sf, "documents")
      .selectExpr("lang", "source", "text",
        "cast(size(split(lower(text), '\\\\s+')) as long) as t")
      .as[(String, String, String, Long)].collect()
    assert(got.map(_._3).sum == docs.length)
    val digests = docs.groupBy(_._3).view.mapValues(_.length)
    got.foreach { case (lang, src, nDocs, nTok, nDup, med) =>
      val mine = docs.filter(r => r._1 == lang && r._2 == src)
      assert(nDocs == mine.length && nTok == mine.map(_._4).sum)
      assert(nDup == mine.count(r => digests(r._3) > 1))
      val xs = mine.map(_._4).sorted
      assert(med == xs(math.floor(0.5 * (xs.length - 1)).toInt))
    }
    spark.catalog.clearCache()
  }

  test("conversion lags are the sorted order statistics of first-click delays") {
    val got = Mining.queries("q89_conversion_lag")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val ev = graft.Tables.load(spark, sf, "events")
      .selectExpr("user_id", "event_id", "unix_micros(ts) as us",
        "event_type",
        "cast(get_json_object(props, '$.k') as long) % 5 as ch")
      .as[(Long, Long, Long, String, Long)].collect()
    val clicks = ev.filter(_._4 == "click")
    val lags = ev.filter(_._4 == "purchase").flatMap { p =>
      val qual = clicks.filter(c => c._1 == p._1 &&
        c._3 <= p._3 && c._3 >= p._3 - 1800L * 1000000L)
      if (qual.isEmpty) None
      else {
        val first = qual.minBy(c => (c._3, c._2))
        Some(first._5 -> (p._3 - first._3))
      }
    }.groupBy(_._1)
    got.foreach { case (ch, n, p50, p90) =>
      val xs = lags(ch).map(_._2).sorted
      assert(n == xs.length)
      assert(p50 == xs(math.floor(0.5 * (xs.length - 1)).toInt))
      assert(p90 == xs(math.floor(0.9 * (xs.length - 1)).toInt))
    }
    spark.catalog.clearCache()
  }

  test("source overlap equals brute-force token-set intersections") {
    val got = Mining.queries("q91_source_overlap")(spark, sf)
      .selectExpr("source_a", "source_b", "n_common", "na", "nb")
      .as[(String, String, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val vocab = graft.Tables.load(spark, sf, "documents")
      .selectExpr("source", "explode(split(lower(text), '\\\\s+')) as t")
      .distinct().as[(String, String)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    got.foreach { case (a, b, nc, na, nb) =>
      assert(a < b)
      assert(na == vocab(a).size && nb == vocab(b).size)
      assert(nc == (vocab(a) & vocab(b)).size, s"$a x $b")
    }
    // every unordered source pair with any overlap appears once
    val keys = vocab.keys.toSeq.sorted
    val wantPairs = (for {
      i <- keys.indices; j <- i + 1 until keys.length
      if (vocab(keys(i)) & vocab(keys(j))).nonEmpty
    } yield (keys(i), keys(j))).toSet
    assert(got.map(r => (r._1, r._2)).toSet == wantPairs)
    spark.catalog.clearCache()
  }

  test("chi-square matches a direct contingency-table recomputation") {
    val Array((n, dof, chi2)) =
      Mining.queries("q92_chi_square")(spark, sf)
        .as[(Long, Long, Double)].collect()
    val cells = graft.Tables.load(spark, sf, "events")
      .selectExpr("event_type",
        "cast(dayofweek(to_date(ts)) as long) as dow")
      .groupBy("event_type", "dow")
      .agg(org.apache.spark.sql.functions.count(
        org.apache.spark.sql.functions.lit(1)).as("obs"))
      .as[(String, Long, Long)].collect()
    assert(n == cells.map(_._3).sum)
    val types = cells.map(_._1).distinct.length
    val dows = cells.map(_._2).distinct.length
    assert(dof == (types - 1L) * (dows - 1L))
    val rowN = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum)
    val colN = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum)
    val want = cells.sortBy(c => (c._1, c._2)).map { case (t, d, o) =>
      val diff = (n * o - rowN(t) * colN(d)).toDouble
      diff * diff / (n.toDouble * rowN(t) * colN(d))
    }.foldLeft(0.0)(_ + _)
    assert(math.abs(chi2 - BigDecimal(want).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    assert(chi2 >= 0.0)
    spark.catalog.clearCache()
  }

  test("cohort ltv curves are monotone and conserve total revenue") {
    val got = Mining.queries("q93_cohort_ltv")(spark, sf)
      .selectExpr("cohort", "m_offset", "n_customers", "rev_cents",
        "cum_rev_cents")
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    // per cohort: cum is the running sum of rev and is monotone
    got.groupBy(_._1).foreach { case (_, rows) =>
      val sorted = rows.sortBy(_._2)
      var run = 0L
      sorted.foreach { r => run += r._4; assert(r._5 == run) }
    }
    // Σ rev over all cells == Σ order cents
    val total = graft.Tables.load(spark, sf, "orders")
      .selectExpr("cast(round(o_totalprice * 100) as long) as c")
      .as[Long].collect().sum
    assert(got.map(_._4).sum == total)
    // cohort sizes partition the customer base
    assert(got.groupBy(_._1).map(_._2.head._3).sum ==
      graft.Tables.load(spark, sf, "orders")
        .selectExpr("o_custkey").distinct().count())
    spark.catalog.clearCache()
  }

  test("seasonal-naive backtest matches a direct lag-7 recomputation") {
    val got = Mining.queries("q94_seasonal_naive")(spark, sf)
      .selectExpr("event_type", "n_scored", "sum_abs_err")
      .as[(String, Long, Long)].collect()
    assert(got.nonEmpty)
    val daily = graft.Tables.load(spark, sf, "events")
      .selectExpr("event_type",
        "cast(datediff(to_date(ts), '2024-01-01') as long) as day",
        "cast(round(value * 100) as long) as c")
      .groupBy("event_type", "day")
      .agg(org.apache.spark.sql.functions.sum($"c").as("x"))
      .as[(String, Long, Long)].collect()
      .groupBy(_._1).view
      .mapValues(_.map(r => r._2 -> r._3).toMap).toMap
    got.foreach { case (et, n, sae) =>
      val m = daily(et)
      val scored = m.keys.filter(d => m.contains(d - 7)).toSeq
      assert(n == scored.length)
      assert(sae == scored.map(d => math.abs(m(d) - m(d - 7))).sum)
    }
    spark.catalog.clearCache()
  }

  test("new-vs-returning decomposition conserves users and actives") {
    val got = Mining.queries("q95_new_returning")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    // per day: active = new + returning
    got.foreach { case (_, a, n, r) => assert(a == n + r) }
    // Σ new over all days = distinct users (each is new exactly once)
    val users = graft.Tables.load(spark, sf, "events")
      .selectExpr("user_id").distinct().count()
    assert(got.map(_._3).sum == users)
    // Σ active = |(user, day)| distinct pairs
    val pairs = graft.Tables.load(spark, sf, "events")
      .selectExpr("user_id",
        "cast(datediff(to_date(ts), '2024-01-01') as long) as day")
      .distinct().count()
    assert(got.map(_._2).sum == pairs)
    spark.catalog.clearCache()
  }

  test("stickiness bounds hold and slots reconcile with q95 actives") {
    val got = Mining.queries("q96_stickiness")(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    got.foreach { case (_, slots, mau, nDays, st) =>
      // each monthly user contributes 1..n_days active days
      assert(slots >= mau && slots <= mau * nDays)
      assert(st > 0.0 && st <= 1.0)
    }
    val daily = Mining.queries("q95_new_returning")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    assert(got.map(_._2).sum == daily.map(_._2).sum,
      "monthly user-day slots must equal the sum of daily actives")
    spark.catalog.clearCache()
  }

  test("repurchase gaps match a brute-force per-customer diff") {
    val got = Mining.queries("q97_repurchase_cycle")(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val orders = graft.Tables.load(spark, sf, "orders")
      .selectExpr("o_custkey",
        "cast(datediff(to_date(o_orderdate), '1992-01-01') as long) as od")
      .as[(Long, Long)].collect()
    val seg = graft.Tables.load(spark, sf, "customer")
      .selectExpr("c_custkey", "c_mktsegment")
      .as[(Long, String)].collect().toMap
    val gaps = orders.groupBy(_._1).toSeq.flatMap { case (cust, os) =>
      val ds = os.map(_._2).sorted
      ds.zip(ds.tail).map { case (a, b) => seg(cust) -> (b - a) }
    }.groupBy(_._1)
    got.foreach { case (sg, n, p50, p90) =>
      val xs = gaps(sg).map(_._2).sorted
      assert(n == xs.length)
      assert(p50 == xs(math.floor(0.5 * (xs.length - 1)).toInt))
      assert(p90 == xs(math.floor(0.9 * (xs.length - 1)).toInt))
    }
    spark.catalog.clearCache()
  }

  test("abc classes tile revenue at the 80/95 boundaries") {
    val got = Mining.queries("q98_abc_classification")(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet.subsetOf(Set("A", "B", "C")) && got.contains("A"))
    val rev = graft.Tables.load(spark, sf, "lineitem")
      .selectExpr("l_partkey",
        "cast(round(l_extendedprice * 100) as long) as c")
      .groupBy("l_partkey")
      .agg(org.apache.spark.sql.functions.sum($"c").as("r"))
      .as[(Long, Long)].collect()
    val total = rev.map(_._2).sum
    // brute-force classes over the (rev desc, key) order
    var cum = 0L
    val classes = rev.sortBy(r => (-r._2, r._1)).map { r =>
      cum += r._2
      if (cum * 100 <= total * 80) ("A", r._2)
      else if (cum * 100 <= total * 95) ("B", r._2)
      else ("C", r._2)
    }.groupBy(_._1)
    got.foreach { case (k, (_, n, cr, lo, hi)) =>
      val xs = classes(k).map(_._2)
      assert(n == xs.length && cr == xs.sum)
      assert(lo == xs.min && hi == xs.max)
    }
    assert(got.values.map(_._3).sum == total)
    spark.catalog.clearCache()
  }

  test("dup histogram tiles the corpus by digest multiplicity") {
    val got = Mining.queries("q99_dup_histogram")(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (cs, nc, nd) =>
      assert(cs >= 1 && nd == cs * nc)
    }
    val docs = graft.Tables.load(spark, sf, "documents")
      .selectExpr("md5(text) as dg").as[String].collect()
    assert(got.map(_._3).sum == docs.length)
    val want = docs.groupBy(identity).values.map(_.length.toLong)
      .groupBy(identity).view.mapValues(_.size.toLong).toMap
    assert(got.map(r => r._1 -> r._2).toMap == want)
    spark.catalog.clearCache()
  }

  test("gini matches the textbook sorted-rank formula per nation") {
    val got = Mining.queries("q79_gini")(spark, sf)
      .selectExpr("n_name", "n_customers", "revenue_cents", "gini")
      .as[(String, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    val rev = graft.Tables.load(spark, sf, "orders")
      .selectExpr("o_custkey",
        "cast(round(o_totalprice * 100) as long) as c")
      .groupBy("o_custkey").agg(org.apache.spark.sql.functions
        .sum($"c").as("x"))
    val cn = graft.Tables.load(spark, sf, "customer")
      .join(graft.Tables.load(spark, sf, "nation"),
        $"c_nationkey" === $"n_nationkey")
      .select($"c_custkey", $"n_name")
    val byNation = rev.join(cn, $"o_custkey" === $"c_custkey")
      .select($"n_name", $"o_custkey", $"x")
      .as[(String, Long, Long)].collect()
      .groupBy(_._1)
    got.foreach { case (name, n, tot, gini) =>
      val xs = byNation(name).sortBy(r => (r._3, r._2)).map(_._3)
      assert(xs.length == n && xs.sum == tot)
      val wsum = xs.zipWithIndex.map { case (x, i) => (i + 1) * x }.sum
      val want = BigDecimal(
        (2.0 * wsum - (n + 1.0) * tot) / (n.toDouble * tot))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(gini - want) < 1e-9, s"$name: $gini vs $want")
      assert(gini >= 0.0 && gini < 1.0)
    }
    spark.catalog.clearCache()
  }
}
