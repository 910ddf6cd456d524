package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral specs for the round-16 batch-2 operators — independent
  * driver-side re-derivations at sf0.001 (the FrontierSpec pattern),
  * on top of the DuckDB hash gate.
  */
class Frontier6Spec extends SparkSpec {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** (user, day-index) pairs plus the span midpoint day-index. */
  private def userDays(): (Array[(Long, Long)], Long) = {
    val rows = graft.Tables.load(spark, sf, "events")
      .select($"user_id", to_date($"ts").cast("string").as("day"))
      .as[(Long, String)].collect()
      .map { case (u, d) => (u, java.time.LocalDate.parse(d).toEpochDay) }
    val d0 = rows.map(_._2).min
    val d1 = rows.map(_._2).max
    (rows.map { case (u, d) => (u, d - d0) }, (d1 - d0) / 2)
  }

  /** percentile_cont on a sorted long array (linear interpolation,
    * the SQL-standard definition both engines implement).
    */
  private def pctCont(sorted: Array[Long], q: Double): Double = {
    val h = (sorted.length - 1).toDouble * q
    val lo = math.floor(h).toInt
    val hi = math.ceil(h).toInt
    sorted(lo) + (h - lo) * (sorted(hi) - sorted(lo)).toDouble
  }

  test("mcnemar: matches a driver-side paired-shift re-derivation") {
    val (rows, mid) = userDays()
    val cnts = rows.groupBy(_._1).toSeq.map { case (_, ds) =>
      (ds.count(_._2 <= mid).toLong, ds.count(_._2 > mid).toLong)
    }.toArray
    val mf = pctCont(cnts.map(_._1).sorted, 0.5)
    val ms = pctCont(cnts.map(_._2).sorted, 0.5)
    val per = cnts.toSeq.map { case (cf, cs) =>
      (cf.toDouble > mf, cs.toDouble > ms)
    }
    val b = per.count { case (f, s) => f && !s }.toLong
    val c = per.count { case (f, s) => !f && s }.toLong
    val both = per.count { case (f, s) => f && s }.toLong
    val expect = {
      val d = math.abs(b - c) - 1
      (d * d).toDouble / (b + c).toDouble
    }
    val got = Frontier6.queries("q197_mcnemar")(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(got._1 == per.size.toLong)
    assert(got._2 == both && got._3 == b && got._4 == c)
    assert(b + c > 0, "fixture has no discordant users — test is vacuous")
    assert(got._5 == round4(expect))
  }

  test("g_test: matches a driver-side LLR re-derivation; dof correct") {
    val rows = graft.Tables.load(spark, sf, "events")
      .select($"event_type",
        pmod(datediff(to_date($"ts"), lit("1970-01-05")), lit(7))
          .cast("long").as("wd"))
      .as[(String, Long)].collect()
    val cells = rows.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val rowN = rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val colN = rows.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val n = rows.length.toLong
    val g = 2.0 * cells.toSeq.sortBy(_._1).foldLeft(0.0) {
      case (acc, ((t, w), obs)) =>
        acc + obs.toDouble *
          math.log((n.toDouble * obs.toDouble) /
            (rowN(t).toDouble * colN(w).toDouble))
    }
    val got = Frontier6.queries("q198_g_test")(spark, sf)
      .as[(Long, Long, Double)].collect().head
    assert(got._1 == n)
    assert(got._2 == (rowN.size - 1).toLong * (colN.size - 1).toLong)
    assert(got._3 == round4(g))
    assert(got._3 >= 0.0, "G is a deviance — nonnegative by construction")
  }

  test("cronbach alpha: matches re-derivation; bounded above by 1") {
    val rows = graft.Tables.load(spark, sf, "events")
      .select($"user_id", $"event_type").as[(Long, String)].collect()
    val x = rows.groupBy(identity).view.mapValues(_.length.toLong).toMap
    val users = rows.map(_._1).distinct
    val nd = users.length.toDouble
    val types = rows.map(_._2).distinct.sorted
    val sumItemVar = types.foldLeft(0.0) { (acc, t) =>
      val xs = users.map(u => x.getOrElse((u, t), 0L))
      val si = xs.sum.toDouble
      val qi = xs.map(v => v * v).sum.toDouble
      acc + (qi / nd - (si / nd) * (si / nd))
    }
    val totals = rows.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val ts = users.map(totals)
    val st = ts.sum.toDouble
    val qt = ts.map(v => v * v).sum.toDouble
    val totalVar = qt / nd - (st / nd) * (st / nd)
    val k = types.length.toDouble
    val alpha = (k / (k - 1.0)) * (1.0 - sumItemVar / totalVar)
    val got = Frontier6.queries("q199_cronbach_alpha")(spark, sf)
      .as[(Long, Long, Double, Double, Double)].collect().head
    assert(got._1 == users.length.toLong && got._2 == types.length.toLong)
    assert(got._3 == round4(sumItemVar))
    assert(got._4 == round4(totalVar))
    assert(got._5 == round4(alpha))
    assert(got._5 <= 1.0, "alpha <= 1 always")
  }

  /** Order (cents, day-index) rows plus span midpoint. */
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

  test("psi: matches re-derivation; nonnegative; halves partition") {
    val (rows, mid) = orderRows()
    val sorted = rows.map(_._2).sorted
    val bs = (1 to 9).map(j => pctCont(sorted, j / 10.0))
    val buckets = rows.map { case (_, v, d) =>
      (bs.count(b => v.toDouble > b).toLong, d > mid)
    }
    val nf = buckets.count(!_._2).toLong
    val ns = buckets.count(_._2).toLong
    val cells = buckets.groupBy(_._1).view.mapValues { g =>
      (g.count(!_._2).toLong, g.count(_._2).toLong)
    }.toMap
    val psi = cells.toSeq.sortBy(_._1).foldLeft(0.0) {
      case (acc, (_, (a, b))) =>
        val p = (a.toDouble + 0.5) / (nf.toDouble + 5.0)
        val q = (b.toDouble + 0.5) / (ns.toDouble + 5.0)
        acc + (p - q) * math.log(p / q)
    }
    val got = Frontier6.queries("q200_psi")(spark, sf)
      .as[(Long, Long, Long, Double)].collect().head
    assert(got._1 == nf && got._2 == ns)
    assert(got._1 + got._2 == rows.length.toLong)
    assert(got._3 == cells.size.toLong)
    assert(got._4 == round6(psi))
    assert(got._4 >= 0.0, "every PSI term (p-q)ln(p/q) is nonnegative")
  }

  test("cuped: matches re-derivation; rho2 in [0,1]") {
    val (rows, mid) = orderRows()
    val byCust = rows.groupBy(_._1).map { case (c, rs) =>
      val x = rs.filter(_._3 <= mid).map(_._2).sum
      val y = rs.filter(_._3 > mid).map(_._2).sum
      (c % 2, x, y)
    }.toSeq
    val nd = byCust.size.toDouble
    val (sx, sy) = (byCust.map(_._2).sum.toDouble, byCust.map(_._3).sum.toDouble)
    val sxy = byCust.map(r => BigInt(r._2) * BigInt(r._3)).sum.toDouble
    val sxx = byCust.map(r => BigInt(r._2) * BigInt(r._2)).sum.toDouble
    val syy = byCust.map(r => BigInt(r._3) * BigInt(r._3)).sum.toDouble
    val (mx, my) = (sx / nd, sy / nd)
    val covxy = sxy / nd - mx * my
    val varx = sxx / nd - mx * mx
    val vary = syy / nd - my * my
    val theta = covxy / varx
    val arm1 = byCust.filter(_._1 == 1L)
    val arm0 = byCust.filter(_._1 == 0L)
    def mean(v: Seq[Long]): Double = v.sum.toDouble / v.size
    val diffRaw = mean(arm1.map(_._3)) - mean(arm0.map(_._3))
    val diffCuped =
      (mean(arm1.map(_._3)) - theta * mean(arm1.map(_._2))) -
        (mean(arm0.map(_._3)) - theta * mean(arm0.map(_._2)))
    val rho2 = covxy * covxy / (varx * vary)
    val got = Frontier6.queries("q201_cuped")(spark, sf)
      .as[(Long, Long, Double, Double, Double, Double)].collect().head
    assert(got._1 == arm1.size.toLong && got._2 == arm0.size.toLong)
    assert(math.abs(got._3 - diffRaw) < 0.01)
    assert(math.abs(got._4 - theta) < 1e-4)
    assert(math.abs(got._5 - diffCuped) < 0.01)
    assert(got._6 >= 0.0 && got._6 <= 1.0)
  }

  test("nelson-aalen: H matches KM risk table; monotone; S=exp(-H)") {
    val rows = Frontier6.queries("q202_nelson_aalen")(spark, sf)
      .as[(Long, Long, Long, Long, Double, Double)].collect()
    // risk-table identity with q120's frame: same t/n_at_risk/d/c
    val km = graft.queries.Insights.queries("q120_survival_km")(spark, sf)
      .select($"t", $"n_at_risk", $"n_churned", $"n_censored")
      .as[(Long, Long, Long, Long)].collect()
    assert(rows.map(r => (r._1, r._2, r._3, r._4)).toSeq == km.toSeq)
    // re-derive the hazard prefix in the same fold order
    var acc = 0.0
    rows.foreach { r =>
      acc += r._3.toDouble / r._2.toDouble
      assert(r._5 == round6(acc), s"H at t=${r._1}")
      assert(r._6 == round6(math.exp(-acc)), s"S at t=${r._1}")
    }
    // H nondecreasing, S nonincreasing
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._5 <= b._5 && a._6 >= b._6)
      case _ =>
    }
  }
}
