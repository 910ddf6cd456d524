package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral specs for the round-16 batch-3 operators — independent
  * driver-side re-derivations at sf0.001 (the FrontierSpec pattern),
  * on top of the DuckDB hash gate. The energy-distance check is
  * deliberately BRUTE FORCE (O(n²) pair loops over the collected
  * sample) so it validates the CDF-integral formulation against the
  * definition, not against a re-statement of the same integral.
  */
class Frontier7Spec extends SparkSpec {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** (custkey, cents, day-index) order rows plus span midpoint. */
  private def orderRows(): (Array[(Long, Long, Long)], Long) = {
    val rows = graft.Tables.load(spark, sf, "orders")
      .select($"o_custkey",
        round($"o_totalprice" * 100).cast("long").as("cents"),
        to_date($"o_orderdate").cast("string").as("day"))
      .as[(Long, Long, String)].collect()
      .map { case (c, v, d) =>
        (c, v, java.time.LocalDate.parse(d).toEpochDay) }
    val d0 = rows.map(_._3).min
    val d1 = rows.map(_._3).max
    (rows.map { case (c, v, d) => (c, v, d - d0) }, (d1 - d0) / 2)
  }

  private def pctCont(sorted: Array[Long], q: Double): Double = {
    val h = (sorted.length - 1).toDouble * q
    val lo = math.floor(h).toInt
    val hi = math.ceil(h).toInt
    sorted(lo) + (h - lo) * (sorted(hi) - sorted(lo)).toDouble
  }

  /** Split the order sample into (first-half, second-half) cents. */
  private def halves(): (Array[Long], Array[Long]) = {
    val (rows, mid) = orderRows()
    (rows.filter(_._3 <= mid).map(_._2), rows.filter(_._3 > mid).map(_._2))
  }

  test("wasserstein: matches the exact CDF-integral re-derivation") {
    val (xs, ys) = halves()
    val n1 = xs.length.toLong
    val n2 = ys.length.toLong
    val support = (xs ++ ys).distinct.sorted
    var cf = 0L; var cs = 0L
    var area = BigInt(0)
    support.sliding(2).foreach {
      case Array(v, nx) =>
        cf += xs.count(_ == v)
        cs += ys.count(_ == v)
        area += (BigInt(cf) * n2 - BigInt(cs) * n1).abs * (nx - v)
      case _ =>
    }
    val expect = area.toDouble / (n1.toDouble * n2.toDouble * 100.0)
    val got = Frontier7.queries("q203_wasserstein")(spark, sf)
      .as[(Long, Long, Long, Double)].collect().head
    assert(got._1 == n1 && got._2 == n2)
    assert(got._3 == support.length.toLong)
    assert(got._4 == round6(expect))
    assert(got._4 >= 0.0)
  }

  test("energy distance: CDF integrals match brute-force pair means") {
    val (xs, ys) = halves()
    val n1 = xs.length.toDouble
    val n2 = ys.length.toDouble
    // brute-force definitions (V-statistic population form, dollars)
    def meanAbs(a: Array[Long], b: Array[Long]): Double = {
      var s = BigInt(0)
      a.foreach(x => b.foreach(y => s += math.abs(x - y)))
      s.toDouble / (a.length.toDouble * b.length.toDouble * 100.0)
    }
    val exy = meanAbs(xs, ys)
    val exx = meanAbs(xs, xs)
    val eyy = meanAbs(ys, ys)
    val got = Frontier7.queries("q204_energy_distance")(spark, sf)
      .as[(Long, Long, Double, Double, Double, Double)].collect().head
    assert(got._1 == xs.length.toLong && got._2 == ys.length.toLong)
    assert(math.abs(got._3 - exy) < 1e-6, s"E|X-Y| ${got._3} vs $exy")
    assert(math.abs(got._4 - exx) < 1e-6, s"E|X-X'| ${got._4} vs $exx")
    assert(math.abs(got._5 - eyy) < 1e-6, s"E|Y-Y'| ${got._5} vs $eyy")
    val d2 = 2.0 * got._3 - got._4 - got._5
    assert(d2 > -1e-9, "energy distance squared is nonnegative")
    assert(math.abs(got._6 - math.sqrt(math.max(0.0, d2))) < 1e-5)
  }

  test("granger: matches the closed-form two-regressor OLS F-test") {
    val daily = graft.Tables.load(spark, sf, "events")
      .select(to_date($"ts").cast("string").as("day"),
        round($"value" * 100).cast("long").as("cents"))
      .as[(String, Long)].collect()
      .groupBy(r => java.time.LocalDate.parse(r._1).toEpochDay)
      .map { case (d, rs) => (d, rs.map(_._2).sum, rs.length.toLong) }
    val byDay = daily.map(t => t._1 -> t).toMap
    val pairs = daily.toSeq.flatMap { case (d, sp, _) =>
      byDay.get(d - 1).map { case (_, spL, volL) => (sp, spL, volL) }
    }
    val n = pairs.size
    val nd = n.toDouble
    def s(f: ((Long, Long, Long)) => BigInt): Double =
      pairs.map(f).sum.toDouble
    val (sy, su, sw) = (s(p => BigInt(p._1)), s(p => BigInt(p._2)),
      s(p => BigInt(p._3)))
    val cyy = s(p => BigInt(p._1) * p._1) - sy * sy / nd
    val cuu = s(p => BigInt(p._2) * p._2) - su * su / nd
    val cww = s(p => BigInt(p._3) * p._3) - sw * sw / nd
    val cyu = s(p => BigInt(p._1) * p._2) - sy * su / nd
    val cyw = s(p => BigInt(p._1) * p._3) - sy * sw / nd
    val cuw = s(p => BigInt(p._2) * p._3) - su * sw / nd
    val rssR = cyy - cyu * cyu / cuu
    val det = cuu * cww - cuw * cuw
    val bAr = (cww * cyu - cuw * cyw) / det
    val bVol = (cuu * cyw - cuw * cyu) / det
    val rssU = cyy - bAr * cyu - bVol * cyw
    val f = (rssR - rssU) / (rssU / (nd - 3.0))
    val got = Frontier7.queries("q205_granger")(spark, sf)
      .as[(Long, Double, Double, Double)].collect().head
    assert(got._1 == n.toLong)
    assert(math.abs(got._2 - bAr) < 1e-6)
    assert(math.abs(got._3 - bVol) < 1e-6)
    assert(math.abs(got._4 - f) < 1e-3, s"F ${got._4} vs $f")
    assert(got._4 >= 0.0, "F = (RSS_r - RSS_u)/scale with nested models")
  }

  test("cmh: matches the stratified 2x2 re-derivation; OR positive") {
    val (rows, mid) = orderRows()
    val med = pctCont(rows.map(_._2).sorted, 0.5)
    val custReg = {
      val cn = graft.Tables.load(spark, sf, "customer")
        .select($"c_custkey", $"c_nationkey").as[(Long, Long)].collect().toMap
      val nr = graft.Tables.load(spark, sf, "nation")
        .select($"n_nationkey", $"n_regionkey").as[(Long, Long)].collect().toMap
      val rn = graft.Tables.load(spark, sf, "region")
        .select($"r_regionkey", $"r_name").as[(Long, String)].collect().toMap
      (c: Long) => rn(nr(cn(c)))
    }
    val strata = rows.groupBy(r => custReg(r._1)).view.mapValues { rs =>
      val a = rs.count(r => r._3 > mid && r._2.toDouble > med).toLong
      val b = rs.count(r => r._3 > mid && r._2.toDouble <= med).toLong
      val c = rs.count(r => r._3 <= mid && r._2.toDouble > med).toLong
      val d = rs.count(r => r._3 <= mid && r._2.toDouble <= med).toLong
      (a, b, c, d)
    }.toSeq.sortBy(_._1)
    val sumA = strata.map(_._2._1).sum
    val (sumE, sumV, sumAd, sumBc) =
      strata.foldLeft((0.0, 0.0, 0.0, 0.0)) {
        case ((e, v, ad, bc), (_, (a, b, c, d))) =>
          val nT = (a + b + c + d).toDouble
          (e + (a + b).toDouble * (a + c).toDouble / nT,
            v + (BigInt(a + b) * (c + d) * (a + c) * (b + d)).toDouble /
              (nT * nT * (nT - 1.0)),
            ad + a.toDouble * d.toDouble / nT,
            bc + b.toDouble * c.toDouble / nT)
      }
    val z = math.abs(sumA.toDouble - sumE) - 0.5
    val got = Frontier7.queries("q206_cmh")(spark, sf)
      .as[(Long, Long, Double, Double, Double)].collect().head
    assert(got._1 == strata.size.toLong && got._2 == sumA)
    assert(got._3 == round4(sumE))
    assert(math.abs(got._4 - z * z / sumV) < 1e-4)
    assert(math.abs(got._5 - sumAd / sumBc) < 1e-4)
    assert(got._5 > 0.0)
  }

  test("rdd: matches the two-sided local-linear re-derivation") {
    val spend = graft.Tables.load(spark, sf, "orders")
      .select($"o_custkey", round($"o_totalprice" * 100).cast("long"))
      .as[(Long, Long)].collect()
      .groupBy(_._1).view.mapValues(_.map(_._2).sum).toMap
    val pts = graft.Tables.load(spark, sf, "customer")
      .select($"c_custkey", round($"c_acctbal" * 100).cast("long"))
      .as[(Long, Long)].collect()
      .filter { case (_, bal) => math.abs(bal) <= 100000L }
      .map { case (ck, bal) => (bal, spend.getOrElse(ck, 0L)) }
    def fit(side: Array[(Long, Long)]): (Double, Double) = {
      val nd = side.length.toDouble
      val sb = side.map(p => BigInt(p._1)).sum.toDouble
      val ss = side.map(p => BigInt(p._2)).sum.toDouble
      val sbb = side.map(p => BigInt(p._1) * p._1).sum.toDouble
      val sbs = side.map(p => BigInt(p._1) * p._2).sum.toDouble
      val slope = (sbs - sb * ss / nd) / (sbb - sb * sb / nd)
      (slope, (ss / nd - slope * sb / nd) / 100.0)
    }
    val (slL, icL) = fit(pts.filter(_._1 < 0L))
    val (slR, icR) = fit(pts.filter(_._1 >= 0L))
    val got = Frontier7.queries("q207_rdd")(spark, sf)
      .as[(Long, Long, Double, Double, Double, Double, Double)]
      .collect().head
    assert(got._1 == pts.count(_._1 < 0L).toLong)
    assert(got._2 == pts.count(_._1 >= 0L).toLong)
    assert(math.abs(got._3 - slL) < 1e-6)
    assert(math.abs(got._4 - slR) < 1e-6)
    assert(math.abs(got._5 - icL) < 1e-3)
    assert(math.abs(got._6 - icR) < 1e-3)
    assert(math.abs(got._7 - (icR - icL)) < 1e-3,
      "effect is the intercept gap at the cutoff")
  }
}
