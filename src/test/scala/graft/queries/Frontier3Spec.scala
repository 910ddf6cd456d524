package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral specs for the round-11 batch-9 operators — independent
  * driver-side re-derivations at sf0.001 (the FrontierSpec pattern),
  * on top of the DuckDB hash gate.
  */
class Frontier3Spec extends SparkSpec {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  /** The shared literal transition replay: per-user event sequences
    * ordered by (ts, event_id), consecutive (cur, next) pairs.
    */
  private def transitions(): Map[(String, String), Long] = {
    val ev = graft.Tables.load(spark, sf, "events")
      .select($"user_id", $"event_type", unix_micros($"ts").as("t"),
        $"event_id")
      .as[(Long, String, Long, Long)].collect()
    ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val seq = rows.sortBy(r => (r._3, r._4)).map(_._2)
      seq.zip(seq.drop(1))
    }.groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
  }

  test("markov steady-state: exact 4-round replay from raw sequences") {
    val got = Frontier3.queries("q159_markov_steady")(spark, sf)
      .as[(String, Long, Double, Double)].collect().sortBy(_._1)
    val tr = transitions()
    val states =
      tr.keys.flatMap(p => Seq(p._1, p._2)).toSeq.distinct.sorted
    val k = states.length
    val n = Array.tabulate(k, k) { (i, j) =>
      tr.getOrElse((states(i), states(j)), 0L) }
    val rowTot = n.map(_.sum)
    val total = rowTot.sum
    var v = Array.fill(k)(1.0 / k)
    for (_ <- 1 to 4) {
      val u = Array.tabulate(k) { j =>
        var acc = 0.0
        for (i <- 0 until k)
          if (n(i)(j) > 0L)
            acc += v(i) * (n(i)(j).toDouble / rowTot(i).toDouble)
        acc
      }
      v = u.map(x => math.floor(x * 1.0e9) / 1.0e9)
    }
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.map(_._1).toSeq == states)
    got.foreach { case (st, nOut, obs, pi) =>
      val i = states.indexOf(st)
      assert(nOut == rowTot(i), s"$st n_out")
      assert(math.abs(obs - r6(rowTot(i).toDouble / total)) < 1e-9)
      assert(math.abs(pi - r6(v(i))) < 1e-9, s"$st steady_pi")
    }
    // a proper distribution (within quantization loss) that is NOT
    // just the observed shares — the iteration actually moved mass
    val piSum = got.map(_._4).sum
    assert(piSum > 0.99 && piSum < 1.01, s"pi sums to ~1: $piSum")
  }

  test("entropy rate: exact fold replay and information inequalities") {
    val got = Frontier3.queries("q160_entropy_rate")(spark, sf)
      .as[(String, Long, Double, Double, Double, Double)].collect()
    val tr = transitions()
    val bySrc = tr.groupBy(_._1._1)
    val rowTot = bySrc.map { case (s, m) => s -> m.values.sum }
    val total = rowTot.values.sum
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val hCond = bySrc.map { case (s, m) =>
      val nOut = rowTot(s)
      var acc = 0.0
      m.toSeq.sortBy(_._1._2).foreach { case (_, c) =>
        val p = c.toDouble / nOut.toDouble
        acc = acc - p * math.log(p)
      }
      s -> acc
    }
    var hRate = 0.0; var h0 = 0.0
    rowTot.toSeq.sortBy(_._1).foreach { case (s, nOut) =>
      val pi = nOut.toDouble / total.toDouble
      hRate = hRate + pi * hCond(s)
      h0 = h0 - pi * math.log(pi)
    }
    got.foreach { case (st, nOut, hc, hr, hz, gain) =>
      assert(nOut == rowTot(st), s"$st n_out")
      assert(math.abs(hc - r4(hCond(st))) < 1e-9, s"$st h_cond")
      assert(math.abs(hr - r4(hRate)) < 1e-9, "h_rate")
      assert(math.abs(hz - r4(h0)) < 1e-9, "h0")
      assert(math.abs(gain - r4(1.0 - hRate / h0)) < 1e-9, "gain")
      // information inequalities: 0 <= H <= ln k
      assert(hc >= 0.0 && hz >= 0.0 && hr >= 0.0)
      assert(hz <= math.log(rowTot.size.toDouble) + 1e-9)
    }
  }

  test("filter sweep: retention table matches a literal filter") {
    val got = Frontier3.queries("pipeline_filter_sweep")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val toks = graft.Tables.load(spark, sf, "documents")
      .select(size(split(lower($"text"), "\\s+")).cast("long"))
      .as[Long].collect()
    val totDocs = toks.length.toLong
    val totToks = toks.sum
    assert(got.length == 20, "5x4 grid")
    got.foreach { case (mn, mx, dk, tk, ds, ts) =>
      val kept = toks.filter(t => t >= mn && t <= mx)
      assert(dk == kept.length.toLong, s"($mn,$mx) docs")
      assert(tk == kept.sum, s"($mn,$mx) tokens")
      assert(ds == dk * 1000L / totDocs, s"($mn,$mx) doc share")
      assert(ts == tk * 1000L / totToks, s"($mn,$mx) token share")
    }
    // monotonicity: widening the window never loses documents
    val byMin = got.groupBy(_._1)
    byMin.values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      sorted.zip(sorted.drop(1)).foreach { case (a, b) =>
        assert(a._3 <= b._3, "docs monotone in max_tokens") }
    }
  }

  test("hapax ratio: exact per-language type accounting") {
    val got = Frontier3.queries("text_hapax_ratio")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    val toks = graft.Tables.load(spark, sf, "documents")
      .select($"lang", lower($"text")).as[(String, String)].collect()
      .flatMap { case (l, t) => t.split("\\s+").map(l -> _) }
    val byLang = toks.groupBy(_._1)
    assert(got.map(_._1).toSet == byLang.keySet)
    got.foreach { case (lang, nt, ty, hx, hm, ttr) =>
      val counts = byLang(lang).groupBy(_._2)
        .map { case (_, xs) => xs.length.toLong }
      assert(nt == counts.sum, s"$lang tokens")
      assert(ty == counts.size.toLong, s"$lang types")
      assert(hx == counts.count(_ == 1L).toLong, s"$lang hapax")
      assert(hm == hx * 1000L / ty && ttr == ty * 1000L / nt)
      assert(hx <= ty && ty <= nt, s"$lang accounting order")
    }
  }

  test("seed variance: overlaps reconcile with three literal draws") {
    val got = Frontier3.queries("pipeline_seed_variance")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long, Long)].collect()
    assert(got.length == 1)
    val (k, ab, ac, bc, jab, jac, jbc) = got.head
    assert(k == 50L)
    val docs = graft.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"n_chars".cast("long"))
      .as[(Long, Long)].collect()
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    def draw(seed: String): Set[Long] =
      docs.map { case (id, w) =>
        val u = (java.lang.Long.parseLong(
          md5hex(s"$seed:$id").take(8), 16) + 1L).toDouble /
          4294967297.0
        (id, math.pow(u, 1.0 / w.toDouble))
      }.sortBy { case (id, key) => (-key, id) }.take(50)
        .map(_._1).toSet
    val (sa, sb, sc) = (draw("ws42"), draw("ws43"), draw("ws44"))
    assert(ab == (sa & sb).size.toLong, "overlap ab")
    assert(ac == (sa & sc).size.toLong, "overlap ac")
    assert(bc == (sb & sc).size.toLong, "overlap bc")
    assert(jab == ab * 1000L / (100L - ab) &&
      jac == ac * 1000L / (100L - ac) &&
      jbc == bc * 1000L / (100L - bc), "jaccards")
  }

  test("logrank churn: counts, hypergeometric moments, chi2 replay") {
    val got = Frontier3.queries("q166_logrank_churn")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Double, Double, Double)]
      .collect().sortBy(_._1)
    assert(got.nonEmpty)
    val custs = graft.Tables.load(spark, sf, "orders")
      .join(graft.Tables.load(spark, sf, "customer")
        .select($"c_custkey", $"c_mktsegment"),
        $"o_custkey" === $"c_custkey")
      .select($"o_custkey", $"c_mktsegment",
        to_date($"o_orderdate").cast("string"))
      .as[(Long, String, String)].collect()
    val maxd = java.time.LocalDate.parse(custs.map(_._3).max)
    def days(a: java.time.LocalDate, b: java.time.LocalDate) =
      java.time.temporal.ChronoUnit.DAYS.between(a, b)
    // per customer: arm, event month, churned flag (q120's rule)
    val perCust = custs.groupBy(_._1).map { case (_, rs) =>
      val arm = if (rs.head._2 == "BUILDING") "A" else "B"
      val first = java.time.LocalDate.parse(rs.map(_._3).min)
      val last = java.time.LocalDate.parse(rs.map(_._3).max)
      val churned = days(last, maxd) > 90
      val t = if (churned) days(first, last) / 30
        else days(first, maxd) / 30
      (arm, t, churned)
    }.toSeq
    // at-risk and event counts per month per arm
    def atRisk(arm: String, t: Long) =
      perCust.count(c => c._1 == arm && c._2 >= t).toLong
    def events(arm: String, t: Long) =
      perCust.count(c => c._1 == arm && c._2 == t && c._3).toLong
    var oMinusE = 0.0; var vSum = 0.0
    got.foreach { case (t, na, nb, da, db, ea, _, _) =>
      assert(na == atRisk("A", t) && nb == atRisk("B", t), s"t$t risk")
      assert(da == events("A", t) && db == events("B", t), s"t$t ev")
      val n = na + nb; val dd = da + db
      val eaExp = dd.toDouble * na.toDouble / n.toDouble
      assert(math.abs(ea - BigDecimal(eaExp).setScale(4,
        BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9, s"t$t e_a")
      oMinusE += da.toDouble - eaExp
      if (n > 1)
        vSum += dd.toDouble * (na.toDouble / n.toDouble) *
          (1.0 - na.toDouble / n.toDouble) *
          ((n - dd).toDouble / (n - 1).toDouble)
    }
    val chi2 = if (vSum == 0.0) 0.0 else oMinusE * oMinusE / vSum
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(got.head._8 - r4(chi2)) < 1e-6, "chi2")
    assert(got.head._8 >= 0.0, "chi2 sign")
    assert(got.map(_._8).distinct.length == 1, "one global stat")
  }

  test("median polish: decomposition identity and sweep replay") {
    val got = Frontier3.queries("q165_median_polish")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    spark.catalog.clearCache() // Quantiles persists inside
    assert(got.nonEmpty)
    // identity: cell = row effect + col effect + residual, exactly
    got.foreach { case (t, w, cell, re, ce, res) =>
      assert(cell == re + ce + res, s"($t,$w) identity")
    }
    // literal replay: daily sums -> lower medians -> 2 full sweeps
    val daily = graft.Tables.load(spark, sf, "events")
      .select($"event_type", to_date($"ts").cast("string").as("day"),
        round($"value" * 100).cast("long").as("c"))
      .groupBy($"event_type", $"day").agg(sum($"c").as("v"))
      .as[(String, String, Long)].collect()
    val anchor = java.time.LocalDate.parse("1970-01-05")
    def lm(xs: Seq[Long]): Long = xs.sorted.apply((xs.size + 1) / 2 - 1)
    val cells = daily.groupBy { r =>
      val dow = java.lang.Math.floorMod(
        java.time.temporal.ChronoUnit.DAYS.between(
          anchor, java.time.LocalDate.parse(r._2)), 7L)
      (r._1, dow)
    }.map { case (k, rs) => k -> lm(rs.map(_._3).toSeq) }
    val types = cells.keys.map(_._1).toSeq.distinct.sorted
    val dows = cells.keys.map(_._2).toSeq.distinct.sorted
    val g = scala.collection.mutable.Map(cells.toSeq: _*)
    val rEff = scala.collection.mutable.Map[String, Long]()
      .withDefaultValue(0L)
    val cEff = scala.collection.mutable.Map[Long, Long]()
      .withDefaultValue(0L)
    for (_ <- 1 to 2) {
      types.foreach { t =>
        val pres = dows.filter(w => g.contains((t, w)))
        val m = lm(pres.map(w => g((t, w))))
        rEff(t) += m; pres.foreach(w => g((t, w)) -= m)
      }
      dows.foreach { w =>
        val pres = types.filter(t => g.contains((t, w)))
        val m = lm(pres.map(t => g((t, w))))
        cEff(w) += m; pres.foreach(t => g((t, w)) -= m)
      }
    }
    got.foreach { case (t, w, cell, re, ce, res) =>
      assert(cell == cells((t, w)), s"($t,$w) cell")
      assert(re == rEff(t) && ce == cEff(w), s"($t,$w) effects")
      assert(res == g((t, w)), s"($t,$w) residual")
    }
  }

  test("price index: exact matched-model Laspeyres/Paasche recompute") {
    val got = Frontier3.queries("q164_price_index")(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val li = graft.Tables.load(spark, sf, "lineitem")
      .join(graft.Tables.load(spark, sf, "part")
        .select($"p_partkey", $"p_brand"),
        $"l_partkey" === $"p_partkey")
      .select($"p_brand", $"l_partkey",
        to_date($"l_shipdate").cast("string"),
        $"l_quantity".cast("long"),
        round($"l_extendedprice" * 100).cast("long"))
      .as[(String, Long, String, Long, Long)].collect()
    val d0 = java.time.LocalDate.parse(li.map(_._3).min)
    val d1 = java.time.LocalDate.parse(li.map(_._3).max)
    val span = java.time.temporal.ChronoUnit.DAYS.between(d0, d1)
    def half(s: String): Long =
      if (java.time.temporal.ChronoUnit.DAYS
        .between(d0, java.time.LocalDate.parse(s)) * 2 < span) 1L
      else 2L
    val pp = li.groupBy(r => (r._2, half(r._3))).flatMap {
      case ((pk, h), rows) =>
        val sq = rows.map(_._4).sum
        if (sq > 0) Some((pk, h) -> (sq, rows.map(_._5).sum / sq))
        else None
    }
    val brandOf = li.map(r => r._2 -> r._1).toMap
    val matched = li.map(_._2).distinct.flatMap { pk =>
      (pp.get((pk, 1L)), pp.get((pk, 2L))) match {
        case (Some((q1, p1)), Some((q2, p2))) =>
          Some((brandOf(pk), p1, p2, q1, q2))
        case _ => None
      }
    }
    val byBrand = matched.groupBy(_._1)
    assert(got.map(_._1).toSet == byBrand.keySet)
    got.foreach { case (brand, n, lm, pm) =>
      val rows = byBrand(brand)
      assert(n == rows.length.toLong, s"$brand matched parts")
      val lNum = rows.map(r => r._3 * r._4).sum
      val lDen = rows.map(r => r._2 * r._4).sum
      val pNum = rows.map(r => r._3 * r._5).sum
      val pDen = rows.map(r => r._2 * r._5).sum
      assert(lm == lNum * 1000L / lDen, s"$brand laspeyres")
      assert(pm == pNum * 1000L / pDen, s"$brand paasche")
      // a price index near parity on stationary synthetic prices
      assert(lm > 500L && lm < 2000L, s"$brand index sanity $lm")
    }
  }

  test("dedup bias: shares conserve and shifts sum to ~zero") {
    val got = Frontier3.queries("pipeline_dedup_bias")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    val docs = graft.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"lang", md5($"text").as("dg"))
      .as[(Long, String, String)].collect()
    val keepIds = docs.groupBy(_._3).map(_._2.map(_._1).min).toSet
    val byLang = docs.groupBy(_._2)
    assert(got.map(_._1).toSet == byLang.keySet)
    val tb = docs.length.toLong
    val ta = keepIds.size.toLong
    got.foreach { case (lang, nb, na, sb, sa, sh) =>
      val rows = byLang(lang)
      assert(nb == rows.length.toLong, s"$lang before")
      assert(na == rows.count(r => keepIds(r._1)).toLong, s"$lang after")
      assert(sb == nb * 1000L / tb && sa == na * 1000L / ta, s"$lang shares")
      assert(sh == sa - sb, s"$lang shift")
    }
    assert(got.map(_._2).sum == tb && got.map(_._3).sum == ta,
      "totals conserve")
    // milli shares are floor-truncated, so each sums to (1000 - dust]
    assert(math.abs(got.map(_._6).sum) <= got.length.toLong,
      "shifts cancel to truncation dust")
  }

  test("growth accounting: decomposition reconciles exactly via resid") {
    val got = Frontier3.queries("q163_growth_accounting")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long, Long, Long)]
      .collect()
    assert(got.nonEmpty)
    val o = graft.Tables.load(spark, sf, "orders")
      .join(graft.Tables.load(spark, sf, "customer")
        .select($"c_custkey", $"c_mktsegment"),
        $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment", $"o_custkey",
        to_date($"o_orderdate").cast("string"),
        round($"o_totalprice" * 100).cast("long"))
      .as[(String, Long, String, Long)].collect()
    val d0 = java.time.LocalDate.parse(o.map(_._3).min)
    val d1 = java.time.LocalDate.parse(o.map(_._3).max)
    val span = java.time.temporal.ChronoUnit.DAYS.between(d0, d1)
    got.foreach { case (seg, r1, r2, dlt, cC, cF, cV, res) =>
      val rows = o.filter(_._1 == seg)
      val h1 = rows.filter(r => java.time.temporal.ChronoUnit.DAYS
        .between(d0, java.time.LocalDate.parse(r._3)) * 2 < span)
      val h2 = rows.filterNot(r => java.time.temporal.ChronoUnit.DAYS
        .between(d0, java.time.LocalDate.parse(r._3)) * 2 < span)
      val (c1, o1, rr1) =
        (h1.map(_._2).distinct.length.toLong, h1.length.toLong,
          h1.map(_._4).sum)
      val (c2, o2, rr2) =
        (h2.map(_._2).distinct.length.toLong, h2.length.toLong,
          h2.map(_._4).sum)
      assert(r1 == rr1 && r2 == rr2, s"$seg revenue")
      assert(dlt == rr2 - rr1, s"$seg delta")
      assert(cC == (c2 - c1) * (rr1 / c1), s"$seg customers lever")
      assert(cF == c2 * (o2 * 1000 / c2 - o1 * 1000 / c1) *
        (rr1 / o1) / 1000, s"$seg frequency lever")
      assert(cV == o2 * (rr2 / o2 - rr1 / o1), s"$seg value lever")
      // the decomposition RECONCILES: resid carries the exact dust
      assert(res == dlt - cC - cF - cV, s"$seg resid")
      // and the dust is small relative to revenue: the milli-
      // truncated frequency rate carries ≤ ~0.1% relative error, so
      // resid is orders below the revenue scale it decomposes
      assert(math.abs(res) <= math.max(rr1, rr2) / 100L,
        s"$seg resid magnitude |$res| vs revenue $rr1/$rr2")
    }
  }

  test("forecast backtest: exact MAEs and argmin winner") {
    val got = Frontier3.queries("q162_forecast_backtest")(spark, sf)
      .as[(String, Long, Long, Long, String)].collect()
    assert(got.nonEmpty)
    val daily = graft.Tables.load(spark, sf, "events")
      .select($"event_type", to_date($"ts").cast("string").as("day"),
        round($"value" * 100).cast("long").as("c"))
      .groupBy($"event_type", $"day").agg(sum($"c").as("v"))
      .as[(String, String, Long)].collect()
    val d0 = java.time.LocalDate.parse(daily.map(_._2).min)
    val d1 = java.time.LocalDate.parse(daily.map(_._2).max)
    val dmax = java.time.temporal.ChronoUnit.DAYS.between(d0, d1)
    val vmap = daily.map(r => (r._1, r._2) -> r._3).toMap
    got.foreach { case (et, mn, ms, mm, best) =>
      def v(di: Long): Long =
        vmap.getOrElse((et, d0.plusDays(di).toString), 0L)
      val trainDis = 0L to (dmax - 7)
      val lastV = v(dmax - 7)
      val meanV = trainDis.map(v).sum / trainDis.length
      val testDis = (dmax - 6) to dmax
      assert(mn == testDis.map(di => math.abs(v(di) - lastV)).sum / 7,
        s"$et naive")
      assert(ms == testDis.map(di => math.abs(v(di) - v(di - 7))).sum
        / 7, s"$et snaive")
      assert(mm == testDis.map(di => math.abs(v(di) - meanV)).sum / 7,
        s"$et mean")
      val expBest = Seq((mn, "naive"), (ms, "snaive"), (mm, "mean"))
        .minBy(identity)._2
      assert(best == expBest, s"$et winner")
    }
  }

  test("mix realized: deciles conserve, final decile is the corpus mix") {
    val got = Frontier3.queries("pipeline_mix_realized")(spark, sf)
      .as[(Long, String, Long, Long, Long, Long)].collect()
    spark.catalog.clearCache() // PrefixSum persists
    val docs = graft.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"lang").as[(Long, String)].collect()
    val n = docs.length.toLong
    // literal replay of the interleave order
    val order = docs.groupBy(_._2).toSeq.flatMap { case (lang, ds) =>
      val mult = if (lang == "en") 1L else 4L
      ds.map(_._1).sorted.zipWithIndex.map { case (id, i) =>
        ((2L * (i + 1) - 1L) * mult, lang, id)
      }
    }.sortBy(t => (t._1, t._2, t._3))
    val langOf = order.map(_._2)
    got.groupBy(_._1).foreach { case (ck, rows) =>
      val cumn = (ck * n + 9) / 10
      val pfx = langOf.take(cumn.toInt)
      rows.foreach { case (_, lang, cd, rm, tm, dev) =>
        assert(cd == pfx.count(_ == lang).toLong, s"d$ck $lang count")
        assert(rm == cd * 1000L / cumn, s"d$ck $lang realized")
        assert(dev == math.abs(rm - tm), s"d$ck $lang dev")
      }
      // conservation: decile prefix counts sum to the boundary
      assert(rows.map(_._3).sum == cumn, s"d$ck conserves")
    }
    // target shares sum to ~1000 across languages (integer floor)
    val t10 = got.filter(_._1 == 10L)
    assert(t10.map(_._5).sum <= 1000L &&
      t10.map(_._5).sum >= 1000L - t10.length)
  }

  test("source purity: entropy and dominance from a literal recompute") {
    val got = Frontier3.queries("text_source_purity")(spark, sf)
      .as[(String, Long, Long, String, Long, Double)].collect()
    val docs = graft.Tables.load(spark, sf, "documents")
      .select($"source", $"lang").as[(String, String)].collect()
    val bySrc = docs.groupBy(_._1)
    assert(got.map(_._1).toSet == bySrc.keySet)
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.foreach { case (src, nd, nl, top, tm, h) =>
      val langs = bySrc(src).groupBy(_._2)
        .map { case (l, xs) => l -> xs.length.toLong }
      assert(nd == langs.values.sum, s"$src docs")
      assert(nl == langs.size.toLong, s"$src langs")
      val expTop = langs.toSeq.minBy { case (l, c) => (-c, l) }
      assert(top == expTop._1 && tm == expTop._2 * 1000L / nd, s"$src top")
      var acc = 0.0
      langs.toSeq.sortBy(_._1).foreach { case (_, c) =>
        val p = c.toDouble / nd.toDouble
        acc = acc - p * math.log(p)
      }
      assert(math.abs(h - r4(acc)) < 1e-9, s"$src entropy")
      assert(h >= 0.0 && h <= math.log(nl.toDouble) + 1e-9)
    }
  }

  test("supplier lead-time: exact order statistics per supplier") {
    val got = Frontier3.queries("q161_supplier_leadtime")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    spark.catalog.clearCache() // PrefixSum persists inside Quantiles
    val li = graft.Tables.load(spark, sf, "lineitem")
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
      .join(graft.Tables.load(spark, sf, "orders")
        .select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .select($"l_suppkey",
        datediff($"l_shipdate", $"o_orderdate").cast("long"))
      .as[(Long, Long)].collect()
    val bySupp = li.groupBy(_._1)
    assert(got.keySet == bySupp.keySet)
    bySupp.foreach { case (sk, rows) =>
      val lags = rows.map(_._2).sorted
      val n = lags.length
      val (_, gn, w30, p50, p90) = got(sk)
      assert(gn == n.toLong, s"supplier $sk n")
      assert(w30 == lags.count(_ <= 30L) * 1000L / n, s"$sk fill")
      assert(p50 == lags(math.floor(0.5 * (n - 1)).toInt), s"$sk p50")
      assert(p90 == lags(math.floor(0.9 * (n - 1)).toInt), s"$sk p90")
      assert(p50 <= p90, s"$sk order statistics ordered")
    }
  }
}
