package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral specs for the round-13 batch-2 operators — independent
  * driver-side re-derivations at sf0.001 (the FrontierSpec pattern),
  * on top of the DuckDB hash gate.
  */
class Frontier4Spec extends SparkSpec {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  /** Daily cent series per event type on the gap-filled spine, as
    * (type → di → cents). Literal replay of the q162/q169 rollup.
    */
  private def dailyEventSeries(): (Map[String, Map[Long, Long]], Long) = {
    val rows = graft.Tables.load(spark, sf, "events")
      .select($"event_type", to_date($"ts").as("day"),
        round($"value" * 100).cast("long").as("cents"))
      .groupBy($"event_type", $"day").agg(sum($"cents").as("v"))
      .select($"event_type", $"day".cast("string"), $"v")
      .as[(String, String, Long)].collect()
    val days = rows.map(_._2).distinct.map(java.time.LocalDate.parse)
    val d0 = days.min(Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
    val d1 = days.max(Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
    val dmax = java.time.temporal.ChronoUnit.DAYS.between(d0, d1)
    val types = rows.map(_._1).distinct
    val sparse = rows.groupBy(_._1).map { case (t, rs) =>
      t -> rs.map(r => java.time.temporal.ChronoUnit.DAYS.between(
        d0, java.time.LocalDate.parse(r._2)) -> r._3).toMap
    }
    val full = types.map { t =>
      t -> (0L to dmax).map(di =>
        di -> sparse(t).getOrElse(di, 0L)).toMap
    }.toMap
    (full, dmax)
  }

  test("xcorr lead-lag: exact moment replay at every lag + argmax") {
    val got = Frontier4.queries("q167_xcorr_leadlag")(spark, sf)
      .as[(Long, Long, Option[Double], Long)].collect().sortBy(_._1)
    assert(got.length == 15, "one row per lag in -7..7")
    // independent series replay from raw orders
    val rows = graft.Tables.load(spark, sf, "orders")
      .join(graft.Tables.load(spark, sf, "customer"),
        $"o_custkey" === $"c_custkey")
      .filter($"c_mktsegment".isin("BUILDING", "MACHINERY"))
      .select($"c_mktsegment", to_date($"o_orderdate").cast("string"),
        round($"o_totalprice" * 100).cast("long"))
      .as[(String, String, Long)].collect()
    val days = rows.map(_._2).distinct.map(java.time.LocalDate.parse)
    val d0 = days.min(Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
    val d1 = days.max(Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
    val dmax = java.time.temporal.ChronoUnit.DAYS.between(d0, d1)
    def series(seg: String): Map[Long, Long] = {
      val sparse = rows.filter(_._1 == seg)
        .groupBy(r => java.time.temporal.ChronoUnit.DAYS.between(
          d0, java.time.LocalDate.parse(r._2)))
        .map { case (di, rs) => di -> rs.map(_._3).sum }
      (0L to dmax).map(di => di -> sparse.getOrElse(di, 0L)).toMap
    }
    val x = series("BUILDING")
    val y = series("MACHINERY")
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val expect = (-7L to 7L).map { lag =>
      val pairs = (0L to dmax).flatMap { di =>
        val yi = di + lag
        if (yi >= 0L && yi <= dmax) Some((x(di), y(yi))) else None
      }
      val n = BigInt(pairs.length)
      val sx = pairs.map(p => BigInt(p._1)).sum
      val sy = pairs.map(p => BigInt(p._2)).sum
      val sxy = pairs.map(p => BigInt(p._1) * BigInt(p._2)).sum
      val sxx = pairs.map(p => BigInt(p._1) * BigInt(p._1)).sum
      val syy = pairs.map(p => BigInt(p._2) * BigInt(p._2)).sum
      val vx = n * sxx - sx * sx
      val vy = n * syy - sy * sy
      val raw = if (vx == 0 || vy == 0) None
        else Some((n * sxy - sx * sy).toDouble /
          math.sqrt(vx.toDouble * vy.toDouble))
      (lag, pairs.length.toLong, raw)
    }
    got.zip(expect).foreach { case ((lag, nd, corr, _), (el, en, eraw)) =>
      assert(lag == el && nd == en, s"lag $lag n_days")
      (corr, eraw) match {
        case (Some(c), Some(e)) =>
          assert(math.abs(c - r6(e)) < 1e-9, s"lag $lag corr")
        case (None, None) =>
        case other => fail(s"lag $lag null mismatch: $other")
      }
    }
    val bestExpected = expect.filter(_._3.isDefined)
      .maxBy(e => (e._3.get, -e._1))._1
    assert(got.forall(_._4 == bestExpected), "best_lag on every row")
  }

  test("fdr bh: p-values valid, ranks are the p-order, BH prefix rule") {
    val got = Frontier4.queries("q168_fdr_bh")(spark, sf)
      .as[(String, Long, Long, Option[Double], Option[Double],
        Option[Long], Long, Long)].collect()
    assert(got.nonEmpty)
    val defined = got.filter(_._5.isDefined)
    assert(got.forall(_._7 == defined.length.toLong),
      "m_tests = count of defined p-values")
    defined.foreach { r =>
      assert(r._5.get > 0.0 && r._5.get <= 1.0, s"${r._1} p in (0,1]")
    }
    // ranks are exactly 1..m in ascending-p order
    val byRank = defined.sortBy(_._6.get)
    assert(byRank.map(_._6.get).toSeq == (1L to defined.length).toSeq)
    byRank.sliding(2).foreach {
      case Array(a, b) => assert(a._5.get <= b._5.get, "rank order")
      case _ =>
    }
    // discoveries form a prefix of the rank order, each satisfying
    // p_k <= k * alpha / m up to the reported rounding
    val m = defined.length.toDouble
    val discovered = defined.filter(_._8 == 1L)
    val maxDisc = if (discovered.isEmpty) 0L
      else discovered.map(_._6.get).max
    defined.foreach { r =>
      assert((r._8 == 1L) == (r._6.get <= maxDisc), s"${r._1} prefix")
    }
    discovered.foreach { r =>
      assert(r._5.get <= r._6.get * 0.05 / m + 1e-6,
        s"${r._1} BH inequality")
    }
    // undiscovered ranks above the cut must VIOLATE the BH bound at
    // their own rank only if no later rank re-qualifies — spot-check
    // the first undiscovered rank when the set is a strict prefix
    val undisc = defined.filter(r => r._8 == 0L)
    undisc.foreach { r =>
      assert(r._6.get > maxDisc, s"${r._1} not below the cut")
    }
  }

  /** Gap-filled daily cent series per segment from raw orders —
    * shared replay for the q167/q170 series pair.
    */
  private def segmentSeries(): (Map[Long, Long], Map[Long, Long], Long) = {
    val rows = graft.Tables.load(spark, sf, "orders")
      .join(graft.Tables.load(spark, sf, "customer"),
        $"o_custkey" === $"c_custkey")
      .filter($"c_mktsegment".isin("BUILDING", "MACHINERY"))
      .select($"c_mktsegment", to_date($"o_orderdate").cast("string"),
        round($"o_totalprice" * 100).cast("long"))
      .as[(String, String, Long)].collect()
    val days = rows.map(_._2).distinct.map(java.time.LocalDate.parse)
    val d0 = days.min(Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
    val d1 = days.max(Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
    val dmax = java.time.temporal.ChronoUnit.DAYS.between(d0, d1)
    def series(seg: String): Map[Long, Long] = {
      val sparse = rows.filter(_._1 == seg)
        .groupBy(r => java.time.temporal.ChronoUnit.DAYS.between(
          d0, java.time.LocalDate.parse(r._2)))
        .map { case (di, rs) => di -> rs.map(_._3).sum }
      (0L to dmax).map(di => di -> sparse.getOrElse(di, 0L)).toMap
    }
    (series("BUILDING"), series("MACHINERY"), dmax)
  }

  test("kendall tau-b: exact pair counts and tie-corrected assembly") {
    val got = Frontier4.queries("q170_kendall_tau")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Option[Double])].collect()
    assert(got.length == 1)
    val (n0, nc, nd, tx, ty, tau) = got.head match {
      case (a, b, c, dd, e, f) => (a, b, c, dd, e, f)
    }
    val (x, y, dmax) = segmentSeries()
    val n = dmax + 1
    assert(n0 == n * (n - 1) / 2, "n0 = n(n-1)/2")
    var (enc, end, etx, ety) = (0L, 0L, 0L, 0L)
    for (i <- 0L until n; j <- (i + 1) to dmax) {
      val dx = x(i) - x(j); val dy = y(i) - y(j)
      if (dx > 0 && dy > 0 || dx < 0 && dy < 0) enc += 1
      else if (dx > 0 && dy < 0 || dx < 0 && dy > 0) end += 1
      if (dx == 0) etx += 1
      if (dy == 0) ety += 1
    }
    assert((nc, nd, tx, ty) == ((enc, end, etx, ety)), "pair counts")
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    if (n0 - etx == 0 || n0 - ety == 0) assert(tau.isEmpty)
    else {
      val e = (enc - end).toDouble /
        math.sqrt((n0 - etx).toDouble * (n0 - ety).toDouble)
      assert(math.abs(tau.get - r6(e)) < 1e-9, "tau_b")
      assert(tau.get >= -1.0 && tau.get <= 1.0)
    }
  }

  test("mann-whitney: exact tied-rank U and tie-corrected z") {
    val got = Frontier4.queries("q171_mann_whitney")(spark, sf)
      .as[(Long, Long, Double, Option[Double])].collect()
    assert(got.length == 1)
    val (n1, n2, u1, z) = got.head match {
      case (a, b, c, dd) => (a, b, c, dd)
    }
    val vals = graft.Tables.load(spark, sf, "orders")
      .filter($"o_orderpriority".isin("1-URGENT", "5-LOW"))
      .select(round($"o_totalprice" * 100).cast("long"),
        ($"o_orderpriority" === "1-URGENT"))
      .as[(Long, Boolean)].collect()
    val en1 = vals.count(_._2).toLong
    val en2 = vals.length - en1
    assert(n1 == en1 && n2 == en2)
    // pooled average ranks under ties, ×2-scaled exact integers
    val byVal = vals.groupBy(_._1).toSeq.sortBy(_._1)
    var cum = 0L
    var r1x2 = BigInt(0)
    var tie3 = BigInt(0)
    byVal.foreach { case (_, vs) =>
      val t = vs.length.toLong
      val k1 = vs.count(_._2).toLong
      cum += t
      val rank2 = 2 * cum - t + 1
      r1x2 += BigInt(k1) * BigInt(rank2)
      tie3 += BigInt(t) * t * t - t
    }
    val u1x2 = r1x2 - BigInt(en1) * (en1 + 1)
    assert(u1 == u1x2.toDouble / 2.0, "u1 = u1x2/2")
    val nd = en1 + en2
    def r4(v: Double) = BigDecimal(v)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    if (en1 == 0 || en2 == 0 || nd < 2 ||
        tie3 == BigInt(nd + 1) * nd * (nd - 1)) assert(z.isEmpty)
    else {
      val ez = ((u1x2 - BigInt(en1) * en2).toDouble / 2.0) /
        math.sqrt(en1.toDouble * en2 / 12.0 *
          ((nd + 1).toDouble - tie3.toDouble / (nd.toDouble * (nd - 1))))
      assert(math.abs(z.get - r4(ez)) < 1e-9, s"z: ${z.get} vs $ez")
    }
  }

  test("yuen trimmed test: exact rank-based trim/winsorize replay") {
    val got = Frontier4.queries("q172_yuen_trimmed")(spark, sf)
      .as[(Long, Long, Long, Long, Double, Double, Option[Double])]
      .collect()
    assert(got.length == 1)
    val (n1, n2, h1, h2, tm1, tm2, t) = got.head match {
      case (a, b, c, dd, e, f, g) => (a, b, c, dd, e, f, g)
    }
    val vals = graft.Tables.load(spark, sf, "orders")
      .filter($"o_orderpriority".isin("1-URGENT", "5-LOW"))
      .select(round($"o_totalprice" * 100).cast("long"),
        ($"o_orderpriority" === "1-URGENT"))
      .as[(Long, Boolean)].collect()
    def r4(v: Double) = BigDecimal(v)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    // literal replay: sort, drop r = n/5 from each end, winsorize
    def grp(isa: Boolean): (Long, Long, Double, BigInt) = {
      val xs = vals.filter(_._2 == isa).map(_._1).sorted
      val n = xs.length
      val r = n / 5
      val h = n - 2 * r
      val trimmed = xs.slice(r, n - r)
      val tsum = trimmed.map(BigInt(_)).sum
      val wvals = Array.fill(r)(xs(r)) ++ trimmed ++
        Array.fill(r)(xs(n - r - 1))
      val wsum = wvals.map(BigInt(_)).sum
      val wsq = wvals.map(v => BigInt(v) * v).sum
      val ssw = BigInt(n) * wsq - wsum * wsum
      (n.toLong, h.toLong, tsum.toDouble / h, ssw)
    }
    val (en1, eh1, etm1, ssw1) = grp(true)
    val (en2, eh2, etm2, ssw2) = grp(false)
    assert((n1, n2, h1, h2) == ((en1, en2, eh1, eh2)))
    assert(math.abs(tm1 - r4(etm1)) < 1e-9, "trimmed mean urgent")
    assert(math.abs(tm2 - r4(etm2)) < 1e-9, "trimmed mean low")
    val et = (etm1 - etm2) / math.sqrt(
      ssw1.toDouble / (en1.toDouble * eh1 * (eh1 - 1)) +
      ssw2.toDouble / (en2.toDouble * eh2 * (eh2 - 1)))
    assert(math.abs(t.get - r4(et)) < 1e-9, s"t_yuen ${t.get} vs $et")
  }

  test("ols influence: flagged days match the closed-form replay") {
    val got = Frontier4.queries("q173_ols_influence")(spark, sf)
      .as[(String, String, Long, Double, Double, Double)].collect()
    val (series, dmax) = dailyEventSeries()
    val n = dmax + 1
    var expected = Vector.empty[(String, Long, Double, Double, Double)]
    series.toSeq.sortBy(_._1).foreach { case (tpe, s) =>
      val u = (0L until n).map(t => BigInt(2 * t - (n - 1)))
      val v = (0L until n).map(t => BigInt(s(t)))
      val su2 = u.map(x => x * x).sum
      val suv = u.zip(v).map { case (a, b) => a * b }.sum
      val sv = v.sum
      val svv = v.map(x => x * x).sum
      val sseSc = BigInt(n) * su2 * svv - sv * sv * su2 -
        BigInt(n) * suv * suv
      val nsu2 = (BigInt(n) * su2).toDouble
      val s2 = sseSc.toDouble / nsu2 / (n - 2).toDouble
      (0L until n).foreach { t =>
        val esc = BigInt(s(t)) * n * su2 - sv * su2 -
          BigInt(n) * suv * u(t.toInt)
        val e = esc.toDouble / nsu2
        val h = 1.0 / n + (u(t.toInt) * u(t.toInt)).toDouble /
          su2.toDouble
        if (s2 != 0.0) {
          val cd = e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h))
          if (cd > 4.0 / n) expected :+= ((tpe, t, e, h, cd))
        }
      }
    }
    assert(got.length == expected.length,
      s"${got.length} flagged vs ${expected.length}")
    def r(v: Double, sc: Int) = BigDecimal(v)
      .setScale(sc, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.zip(expected).foreach {
      case ((tpe, _, v, res, lev, cd), (etpe, et, ee, eh, ecd)) =>
        assert(tpe == etpe)
        assert(v == series(tpe)(et), s"$tpe day $et cents")
        assert(math.abs(res - r(ee, 4)) < 1e-9, s"$tpe residual")
        assert(math.abs(lev - r(eh, 6)) < 1e-9, s"$tpe leverage")
        assert(math.abs(cd - r(ecd, 6)) < 1e-9, s"$tpe cook_d")
    }
  }

  test("conformal: q-hat is the ceil((n+1)(1-a))-th score; coverage exact") {
    val got = Frontier4.queries("q169_conformal_interval")(spark, sf)
      .as[(String, Long, Option[Long], Long, Long, Long)].collect()
      .sortBy(_._1)
    val (series, dmax) = dailyEventSeries()
    assert(got.map(_._1).toSeq == series.keys.toSeq.sorted)
    got.foreach { case (t, nCal, qHat, nTest, nCov, covMilli) =>
      val s = series(t)
      val scores = (7L to dmax).map(di => di -> math.abs(s(di) - s(di - 7)))
      val cal = scores.filter { case (di, _) =>
        di > dmax - 21 && di <= dmax - 7 }.map(_._2)
      assert(nCal == cal.length.toLong, s"$t n_cal")
      val k = ((cal.length + 1) * 4 + 4) / 5
      val expQ = if (cal.isEmpty) None else Some(cal.sorted.apply(k - 1))
      assert(qHat == expQ, s"$t q_hat")
      val test = scores.filter(_._1 > dmax - 7).map(_._2)
      assert(nTest == test.length.toLong, s"$t n_test")
      val cov = expQ.map(q => test.count(_ <= q).toLong).getOrElse(0L)
      assert(nCov == cov, s"$t n_covered")
      assert(covMilli == cov * 1000 / test.length, s"$t coverage")
    }
  }

  test("jarque-bera: BigInt centered moments, closed-form chi2 tail") {
    val got = Frontier4.queries("q174_jarque_bera")(spark, sf)
      .as[(String, Long, Double, Option[Double], Option[Double],
        Option[Double], Option[Double])].collect().sortBy(_._1)
    val (series, dmax) = dailyEventSeries()
    assert(got.map(_._1).toSeq == series.keys.toSeq.sorted)
    def r(v: Double, p: Int) = BigDecimal(v)
      .setScale(p, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.foreach { case (t, nDays, mean, sk, ek, jb, pv) =>
      val vs = (0L to dmax).map(series(t))
      assert(nDays == dmax + 1, s"$t n_days")
      val s1raw = vs.map(BigInt(_)).sum
      val piv = math.round(s1raw.toDouble / nDays.toDouble)
      val cs = vs.map(v => BigInt(v - piv))
      val nd = nDays.toDouble
      val m1 = cs.sum.toDouble / nd
      val r2 = cs.map(c => c * c).sum.toDouble / nd
      val r3 = cs.map(c => c * c * c).sum.toDouble / nd
      val r4 = cs.map(c => c * c * c * c).sum.toDouble / nd
      val m2 = r2 - m1 * m1
      val m3 = r3 - 3.0 * m1 * r2 + 2.0 * m1 * m1 * m1
      val m4 = r4 - 4.0 * m1 * r3 + 6.0 * m1 * m1 * r2 -
        3.0 * m1 * m1 * m1 * m1
      assert(math.abs(mean - r(piv.toDouble + m1, 2)) < 1e-9, s"$t mean")
      if (m2 == 0.0) {
        assert(sk.isEmpty && ek.isEmpty && jb.isEmpty && pv.isEmpty)
      } else {
        val skew = m3 / (math.sqrt(m2) * m2)
        val exk = m4 / (m2 * m2) - 3.0
        val j = nd / 6.0 * (skew * skew + exk * exk / 4.0)
        assert(math.abs(sk.get - r(skew, 5)) < 1e-9, s"$t skew")
        assert(math.abs(ek.get - r(exk, 5)) < 1e-9, s"$t kurt")
        assert(math.abs(jb.get - r(j, 4)) < 1e-9, s"$t jb")
        assert(math.abs(pv.get - r(math.exp(-j / 2.0), 6)) < 1e-9,
          s"$t p")
      }
    }
  }

  test("partial corr: controlling the market total changes the read") {
    val got = Frontier4.queries("q175_partial_corr")(spark, sf)
      .as[(Long, Option[Double], Option[Double], Option[Double],
        Option[Double])].collect()
    assert(got.length == 1)
    val (nDays, rxy, rxz, ryz, rp) = got.head
    // independent replay: daily series from raw orders × customer
    val rows = graft.Tables.load(spark, sf, "orders")
      .join(graft.Tables.load(spark, sf, "customer"),
        $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment", to_date($"o_orderdate").cast("string"),
        round($"o_totalprice" * 100).cast("long"))
      .as[(String, String, Long)].collect()
    val days = rows.map(_._2).distinct.map(java.time.LocalDate.parse)
    val d0 = days.min(Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
    val d1 = days.max(Ordering.fromLessThan[java.time.LocalDate](_ isBefore _))
    val dmax = java.time.temporal.ChronoUnit.DAYS.between(d0, d1)
    assert(nDays == dmax + 1)
    def series(p: ((String, String, Long)) => Boolean): IndexedSeq[BigInt] = {
      val sparse = rows.filter(p)
        .groupBy(r => java.time.temporal.ChronoUnit.DAYS.between(
          d0, java.time.LocalDate.parse(r._2)))
        .map { case (di, rs) => di -> rs.map(r => BigInt(r._3)).sum }
      (0L to dmax).map(di => sparse.getOrElse(di, BigInt(0)))
    }
    val (xs, ys, zs) = (series(_._1 == "BUILDING"),
      series(_._1 == "MACHINERY"), series(_ => true))
    val n = BigInt(xs.length)
    def corr(a: IndexedSeq[BigInt], b: IndexedSeq[BigInt]): Option[Double] = {
      val (sa, sb) = (a.sum, b.sum)
      val saa = a.map(v => v * v).sum
      val sbb = b.map(v => v * v).sum
      val sab = a.zip(b).map { case (u, v) => u * v }.sum
      val (da, db) = (n * saa - sa * sa, n * sbb - sb * sb)
      if (da == 0 || db == 0) None
      else Some((n * sab - sa * sb).toDouble /
        math.sqrt(da.toDouble * db.toDouble))
    }
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    val (exy, exz, eyz) = (corr(xs, ys), corr(xs, zs), corr(ys, zs))
    assert(rxy.isDefined == exy.isDefined, "r_xy definedness")
    (rxy zip exy).foreach { case (g, e) =>
      assert(math.abs(g - r6(e)) < 1e-9, "r_xy") }
    (rxz zip exz).foreach { case (g, e) =>
      assert(math.abs(g - r6(e)) < 1e-9, "r_xz") }
    (ryz zip eyz).foreach { case (g, e) =>
      assert(math.abs(g - r6(e)) < 1e-9, "r_yz") }
    for (a <- exy; b <- exz; c <- eyz) {
      val den = (1.0 - b * b) * (1.0 - c * c)
      if (den > 0.0) {
        val ep = (a - b * c) / math.sqrt(den)
        assert(math.abs(rp.get - r6(ep)) < 1e-9, "r_partial")
        // the control must do SOMETHING on this corpus — but only
        // require the emitted (6-decimal) values to differ when the
        // independently replayed values differ at that precision:
        // a near-orthogonal market control could legitimately round
        // both to the same 6-decimal value (r13 advice — this was a
        // data-coincidence assertion before)
        if (r6(ep) != r6(a))
          assert(rp.get != rxy.get, "partial differs from raw")
      }
    }
  }

  test("durbin-watson: day-ordered fold replay of the OLS residuals") {
    val got = Frontier4.queries("q176_durbin_watson")(spark, sf)
      .as[(String, Long, Option[Double], Option[Double])].collect()
      .sortBy(_._1)
    val (series, dmax) = dailyEventSeries()
    assert(got.map(_._1).toSeq == series.keys.toSeq.sorted)
    def r5(v: Double) = BigDecimal(v)
      .setScale(5, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.foreach { case (t, nDays, dw, rho1) =>
      val n = dmax + 1
      assert(nDays == n, s"$t n_days")
      val vs = (0L to dmax).map(series(t))
      val us = (0L to dmax).map(di => BigInt(2 * di - (n - 1)))
      val su2 = us.map(u => u * u).sum
      val sv = vs.map(BigInt(_)).sum
      val suv = us.zip(vs).map { case (u, v) => u * v }.sum
      val es = (0L to dmax).map { di =>
        val esc = BigInt(vs(di.toInt)) * n * su2 - sv * su2 -
          BigInt(n) * suv * us(di.toInt)
        esc.toDouble / (BigInt(n) * su2).toDouble
      }
      // left fold in day order — the engine's sorted-array fold
      val se2 = es.map(e => e * e).foldLeft(0.0)(_ + _)
      val sd2 = (1 until es.length)
        .map(i => (es(i) - es(i - 1)) * (es(i) - es(i - 1)))
        .foldLeft(0.0)(_ + _)
      val scr = (1 until es.length).map(i => es(i) * es(i - 1))
        .foldLeft(0.0)(_ + _)
      if (se2 == 0.0) assert(dw.isEmpty && rho1.isEmpty, s"$t nulls")
      else {
        assert(math.abs(dw.get - r5(sd2 / se2)) < 1e-9, s"$t dw")
        assert(math.abs(rho1.get - r5(scr / se2)) < 1e-9, s"$t rho1")
        // textbook identity: dw ≈ 2(1 − rho1) up to end effects
        assert(math.abs(dw.get - 2.0 * (1.0 - rho1.get)) < 0.5,
          s"$t dw-rho identity")
      }
    }
  }

  test("simpson diversity: exact BigInt replay off the token counts") {
    val got = Frontier4.queries("text_simpson_diversity")(spark, sf)
      .as[(String, Long, Long, Option[Double], Option[Double])]
      .collect().sortBy(_._1)
    assert(got.nonEmpty)
    val counts = graft.Tables.spread(
        graft.Tables.load(spark, sf, "documents"))
      .select($"lang",
        explode(split(lower($"text"), "\\s+")).as("token"))
      .groupBy($"lang", $"token").agg(count(lit(1)).as("c"))
      .as[(String, String, Long)].collect()
      .groupBy(_._1).map { case (l, rs) => l -> rs.map(_._3) }
    assert(got.map(_._1).toSeq == counts.keys.toSeq.sorted)
    def r(v: Double, p: Int) = BigDecimal(v)
      .setScale(p, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.foreach { case (lang, nTok, nTypes, simp, inv) =>
      val cs = counts(lang).map(BigInt(_))
      assert(nTok == cs.sum.toLong, s"$lang n_tokens")
      assert(nTypes == cs.length.toLong, s"$lang n_types")
      val num = cs.map(c => c * (c - 1)).sum
      val den = cs.sum * (cs.sum - 1)
      if (cs.sum < 2) assert(simp.isEmpty)
      else {
        val e = num.toDouble / den.toDouble
        assert(math.abs(simp.get - r(e, 6)) < 1e-9, s"$lang simpson")
        // probability: λ ∈ [0, 1]
        assert(simp.get >= 0.0 && simp.get <= 1.0, s"$lang range")
        if (num != 0)
          assert(math.abs(inv.get - r(den.toDouble / num.toDouble, 4))
            < 1e-9, s"$lang inv")
      }
    }
  }

  test("cohens kappa: exact contingency replay of the two raters") {
    val got = Frontier4.queries("q177_cohens_kappa")(spark, sf)
      .as[(Long, Option[Double], Option[Double], Option[Double])]
      .collect()
    assert(got.length == 1)
    val (nDocs, po, pe, kappa) = got.head
    val docs = graft.Tables.spread(
        graft.Tables.load(spark, sf, "documents"))
      .select($"n_chars",
        size(split(lower($"text"), "\\s+")).cast("long").as("ntok"))
      .as[(Long, Long)].collect()
    assert(nDocs == docs.length.toLong)
    def bucketA(nc: Long) =
      if (nc < 200) "short" else if (nc < 1000) "medium" else "long"
    def bucketB(nt: Long) =
      if (nt < 40) "short" else if (nt < 200) "medium" else "long"
    val pairs = docs.map { case (nc, nt) => (bucketA(nc), bucketB(nt)) }
    val n = BigInt(pairs.length)
    val diag = BigInt(pairs.count { case (a, b) => a == b })
    val rowM = pairs.groupBy(_._1).map { case (k, v) => k -> BigInt(v.length) }
    val colM = pairs.groupBy(_._2).map { case (k, v) => k -> BigInt(v.length) }
    val pen = rowM.map { case (k, rn) =>
      rn * colM.getOrElse(k, BigInt(0)) }.sum
    def r6(v: Double) = BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(po.get - r6(diag.toDouble / n.toDouble)) < 1e-9)
    assert(math.abs(pe.get -
      r6(pen.toDouble / (n * n).toDouble)) < 1e-9)
    if (n * n - pen != 0)
      assert(math.abs(kappa.get -
        r6((n * diag - pen).toDouble / (n * n - pen).toDouble)) < 1e-9)
    // kappa ≤ po-style bound: chance-corrected agreement can't
    // exceed raw agreement
    assert(kappa.get <= po.get + 1e-12, "kappa <= p_observed")
  }

  /** (cents, weekday) pairs for every order — the shared input frame
    * of q178/q179, collected through the SAME Spark expressions the
    * queries use so the replay can't diverge on rounding.
    */
  private def orderCentsWeekday(): Array[(Long, Long)] =
    graft.Tables.load(spark, sf, "orders")
      .select(round($"o_totalprice" * 100).cast("long").as("cents"),
        pmod(datediff(to_date($"o_orderdate"), lit("1970-01-05")),
          lit(7)).cast("long").as("wd"))
      .as[(Long, Long)].collect()

  test("kruskal-wallis: BigInt tied-rank replay, chi2(6) tail") {
    val got = Frontier4.queries("q178_kruskal_wallis")(spark, sf)
      .as[(Long, Long, Option[Double], Option[Double], Option[Double])]
      .collect()
    assert(got.length == 1)
    val (nOrders, nGroups, hStat, hTie, pVal) = got.head
    val pairs = orderCentsWeekday()
    val n = BigInt(pairs.length)
    assert(nOrders == pairs.length.toLong)
    assert(nGroups == pairs.map(_._2).distinct.length.toLong)
    // exact tied average ranks over the value domain: for a distinct
    // cents value with count t ending at cumulative count cum,
    // 2×avgrank = 2·cum − t + 1 (integral — BigInt throughout)
    val byVal = pairs.groupBy(_._1).toSeq.sortBy(_._1)
    var cum = BigInt(0)
    val rank2 = byVal.map { case (v, rs) =>
      val t = BigInt(rs.length)
      cum += t
      v -> (2 * cum - t + 1)
    }.toMap
    val tie3 = byVal.map { case (_, rs) =>
      val t = BigInt(rs.length); t * t * t - t }.sum
    // per-weekday 2·R_g, exact
    val grp = pairs.groupBy(_._2).map { case (wd, rs) =>
      wd -> (BigInt(rs.length), rs.map(r => rank2(r._1)).sum)
    }.toSeq.sortBy(_._1)
    // the engine folds (rg2/2)²/ng in weekday order in IEEE doubles
    val sterm = grp.foldLeft(0.0) { case (a, (_, (ng, rg2))) =>
      a + (rg2.toDouble / 2.0 * (rg2.toDouble / 2.0)) / ng.toDouble }
    val nd = n.toDouble
    val h = 12.0 / (nd * (nd + 1.0)) * sterm - 3.0 * (nd + 1.0)
    val corr = 1.0 - tie3.toDouble / (n * n * n - n).toDouble
    val htc = h / corr
    def r(v: Double, p: Int) = BigDecimal(v)
      .setScale(p, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(hStat.get - r(h, 4)) < 1e-9, "h_stat")
    assert(math.abs(hTie.get - r(htc, 4)) < 1e-9, "h_tie_corr")
    // sanity: H ≥ 0 and tie correction can only GROW the statistic
    assert(hStat.get >= 0.0 && hTie.get >= hStat.get - 1e-9)
    if (nGroups == 7L) {
      val q = htc / 2.0
      val p = math.exp(-q) * (1.0 + q + q * q / 2.0)
      assert(math.abs(pVal.get - r(p, 6)) < 1e-9, "p_value chi2(6)")
      assert(pVal.get >= 0.0 && pVal.get <= 1.0)
    } else assert(pVal.isEmpty, "p only defined at dof 6")
  }

  test("weekday anova: exact decimal moments, F and eta-squared") {
    val got = Frontier4.queries("q179_weekday_anova")(spark, sf)
      .as[(Long, Long, Option[Double], Option[Double])].collect()
    assert(got.length == 1)
    val (nOrders, k, fStat, etaSq) = got.head
    val pairs = orderCentsWeekday()
    assert(nOrders == pairs.length.toLong)
    val grp = pairs.groupBy(_._2).map { case (wd, rs) =>
      (wd, BigInt(rs.length), rs.map(r => BigInt(r._1)).sum,
        rs.map(r => BigInt(r._1) * BigInt(r._1)).sum)
    }.toSeq.sortBy(_._1)
    assert(k == grp.length.toLong)
    val n = grp.map(_._2).sum
    val sv = grp.map(_._3).sum
    val svv = grp.map(_._4).sum
    // engine folds (Σv_g)²/n_g in weekday order in IEEE doubles
    val sbterm = grp.foldLeft(0.0) { case (a, (_, ng, sg, _)) =>
      a + (sg.toDouble * sg.toDouble) / ng.toDouble }
    val nd = n.toDouble
    val ssb = sbterm - sv.toDouble * sv.toDouble / nd
    val ssw = svv.toDouble - sbterm
    val sst = svv.toDouble - sv.toDouble * sv.toDouble / nd
    def r(v: Double, p: Int) = BigDecimal(v)
      .setScale(p, BigDecimal.RoundingMode.HALF_UP).toDouble
    if (k >= 2 && n.toLong > k && ssw > 0.0) {
      val f = (ssb / (k - 1L).toDouble) / (ssw / (nd - k.toDouble))
      assert(math.abs(fStat.get - r(f, 4)) < 1e-9, "f_stat")
      assert(fStat.get >= 0.0)
    } else assert(fStat.isEmpty)
    if (sst > 0.0) {
      val eta = ssb / sst
      assert(math.abs(etaSq.get - r(eta, 6)) < 1e-9, "eta_sq")
      // variance-explained fraction lives in [0, 1]
      assert(etaSq.get >= 0.0 && etaSq.get <= 1.0)
    } else assert(etaSq.isEmpty)
    // cross-check against the rank omnibus: both read the same frame,
    // so the group count must agree
    val kw = Frontier4.queries("q178_kruskal_wallis")(spark, sf)
      .select($"n_groups").as[Long].collect().head
    assert(kw == k, "q178/q179 group-count parity")
  }

  test("brown-forsythe: lower-median deviations, exact-moment F replay") {
    val got = Frontier4.queries("q181_levene_bf")(spark, sf)
      .as[(Long, Long, Option[Double])].collect()
    assert(got.length == 1)
    val (nOrders, k, fBf) = got.head
    val pairs = orderCentsWeekday()
    assert(nOrders == pairs.length.toLong)
    val grp = pairs.groupBy(_._2)
    assert(k == grp.size.toLong)
    // house lower median: rank floor(0.5(n-1))+1 in sorted order
    def lowerMedian(vs: Seq[Long]): Long = {
      val s = vs.sorted
      s((0.5 * (s.length - 1)).floor.toInt)
    }
    val meds = grp.map { case (wd, rs) => wd -> lowerMedian(rs.map(_._1)) }
    val dev = pairs.map { case (c, wd) => (wd, math.abs(c - meds(wd))) }
    val g = dev.groupBy(_._1).map { case (wd, rs) =>
      (wd, BigInt(rs.length), rs.map(r => BigInt(r._2)).sum,
        rs.map(r => BigInt(r._2) * BigInt(r._2)).sum)
    }.toSeq.sortBy(_._1)
    val n = g.map(_._2).sum
    val sv = g.map(_._3).sum
    val svv = g.map(_._4).sum
    val sbterm = g.foldLeft(0.0) { case (a, (_, ng, sg, _)) =>
      a + (sg.toDouble * sg.toDouble) / ng.toDouble }
    val nd = n.toDouble
    val ssb = sbterm - sv.toDouble * sv.toDouble / nd
    val ssw = svv.toDouble - sbterm
    def r(v: Double, p: Int) = BigDecimal(v)
      .setScale(p, BigDecimal.RoundingMode.HALF_UP).toDouble
    if (k >= 2 && n.toLong > k && ssw > 0.0) {
      val f = (ssb / (k - 1L).toDouble) / (ssw / (nd - k.toDouble))
      assert(math.abs(fBf.get - r(f, 4)) < 1e-9, "f_bf")
      assert(fBf.get >= 0.0)
    } else assert(fBf.isEmpty)
  }

  test("welch anova: weights, weighted mean, F* and Satterthwaite dof") {
    val got = Frontier4.queries("q182_welch_anova")(spark, sf)
      .as[(Long, Long, Option[Double], Option[Double])].collect()
    assert(got.length == 1)
    val (nOrders, k, fW, dof2) = got.head
    val pairs = orderCentsWeekday()
    assert(nOrders == pairs.length.toLong)
    val g = pairs.groupBy(_._2).map { case (wd, rs) =>
      (wd, BigInt(rs.length), rs.map(r => BigInt(r._1)).sum,
        rs.map(r => BigInt(r._1) * BigInt(r._1)).sum)
    }.toSeq.sortBy(_._1)
    assert(k == g.length.toLong)
    // per-group (w, yb, ngd) exactly as the engine's transform
    val warr = g.map { case (_, ng, sg, sgg) =>
      val ngd = ng.toDouble
      val s2 = (sgg.toDouble - sg.toDouble * sg.toDouble / ngd) /
        (ngd - 1.0)
      (ngd / s2, sg.toDouble / ngd, ngd)
    }
    val bigW = warr.foldLeft(0.0)((a, x) => a + x._1)
    val ybw = warr.foldLeft(0.0)((a, x) => a + x._1 * x._2) / bigW
    val kd = k.toDouble
    val aterm = warr.foldLeft(0.0)((a, x) =>
      a + x._1 * (x._2 - ybw) * (x._2 - ybw)) / (kd - 1.0)
    val bterm = warr.foldLeft(0.0)((a, x) =>
      a + (1.0 - x._1 / bigW) * (1.0 - x._1 / bigW) / (x._3 - 1.0))
    def r(v: Double, p: Int) = BigDecimal(v)
      .setScale(p, BigDecimal.RoundingMode.HALF_UP).toDouble
    val minNg = g.map(_._2).min
    if (k >= 2 && minNg >= 2) {
      val f = aterm / (1.0 + 2.0 * (kd - 2.0) / (kd * kd - 1.0) * bterm)
      assert(math.abs(fW.get - r(f, 4)) < 1e-9, "f_welch")
      if (bterm != 0.0) {
        val d2 = (kd * kd - 1.0) / (3.0 * bterm)
        assert(math.abs(dof2.get - r(d2, 2)) < 1e-9, "dof2")
        // Satterthwaite dof is bounded by the pooled classic dof
        assert(dof2.get <= (nOrders - k).toDouble + 1e-9)
      }
    } else assert(fW.isEmpty)
  }

  test("friedman: blocked x2 tied ranks, chi2 and chi2(6) tail") {
    val got = Frontier4.queries("q183_friedman")(spark, sf)
      .as[(Long, Long, Option[Double], Option[Double])].collect()
    assert(got.length == 1)
    val (b, k, chi2, p) = got.head
    // independent replay off raw orders through the same projections
    val rows = graft.Tables.load(spark, sf, "orders")
      .select((year(to_date($"o_orderdate")) * 12 +
          month(to_date($"o_orderdate"))).cast("long").as("m"),
        pmod(datediff(to_date($"o_orderdate"), lit("1970-01-05")),
          lit(7)).cast("long").as("wd"),
        round($"o_totalprice" * 100).cast("long").as("cents"))
      .as[(Long, Long, Long)].collect()
    val cells = rows.groupBy(r => (r._1, r._2))
      .map { case ((m, wd), rs) => (m, wd, rs.map(r => BigInt(r._3)).sum) }
    val fullBlocks = cells.groupBy(_._1).filter(_._2.size == 7)
    assert(b == fullBlocks.size.toLong)
    assert(k == 7L)
    // x2-scaled average tied rank: 2*cnt_lt + cnt_eq + 1
    val r2j = scala.collection.mutable.Map.empty[Long, Long]
    fullBlocks.values.foreach { cs =>
      cs.foreach { case (_, wd, v) =>
        val lt = cs.count(_._3 < v)
        val eq = cs.count(_._3 == v)
        r2j(wd) = r2j.getOrElse(wd, 0L) + (2L * lt + eq + 1L)
      }
    }
    val sr2 = r2j.toSeq.sortBy(_._1).foldLeft(0.0) { case (a, (_, r2)) =>
      a + (r2.toDouble / 2.0) * (r2.toDouble / 2.0) }
    val bd = b.toDouble
    val kd = 7.0
    val expChi = 12.0 / (bd * kd * (kd + 1.0)) * sr2 -
      3.0 * bd * (kd + 1.0)
    def r(v: Double, prec: Int) = BigDecimal(v)
      .setScale(prec, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(math.abs(chi2.get - r(expChi, 4)) < 1e-9, "chi2_f")
    // rank-sum invariant: sum of 2x rank sums = b * k(k+1)
    assert(r2j.values.sum == b * 7L * 8L, "rank-sum telescope")
    val q = expChi / 2.0
    val expP = math.exp(-q) * (1.0 + q + q * q / 2.0)
    assert(math.abs(p.get - r(expP, 6)) < 1e-9, "p chi2(6)")
    assert(p.get >= 0.0 && p.get <= 1.0)
  }

  test("cusum ivm twin: merged-state snapshot equals q84's direct batch") {
    // the IVM statement in-engine: replaying the corpus through the
    // production cusumDriftBatch state path (three deltas, swap-rename
    // parquet merges) serves EXACTLY the frame the one-pass batch
    // query computes — row-for-row, not just hash-level
    val twin = Frontier4.queries("q180_cusum_ivm")(spark, sf)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    val direct = graft.queries.Mining.queries("q84_cusum")(spark, sf)
      .as[(String, Long, Long, Long)].collect().sortBy(_._1)
    assert(twin.nonEmpty, "snapshot served rows")
    assert(twin.toSeq == direct.toSeq,
      s"IVM snapshot diverged from direct recompute:\n" +
        s"twin   = ${twin.toSeq}\ndirect = ${direct.toSeq}")
  }
}
