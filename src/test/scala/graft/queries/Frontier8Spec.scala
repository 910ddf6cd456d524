package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral specs for the round-16 batch-5 operators — independent
  * driver-side re-derivations at sf0.001 on top of the DuckDB gate.
  */
class Frontier8Spec extends SparkSpec {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  /** day-index → daily spend cents. */
  private def daily(): Map[Long, Long] =
    graft.Tables.load(spark, sf, "events")
      .select(to_date($"ts").cast("string").as("day"),
        round($"value" * 100).cast("long").as("cents"))
      .as[(String, Long)].collect()
      .groupBy(r => java.time.LocalDate.parse(r._1).toEpochDay)
      .view.mapValues(_.map(_._2).sum).toMap

  test("adf: matches the closed-form Dickey-Fuller re-derivation") {
    val d = daily()
    val pairs = d.toSeq.flatMap { case (t, y) =>
      d.get(t - 1).map(u => (y - u, u))
    }
    val n = pairs.size
    val nd = n.toDouble
    val su = pairs.map(p => BigInt(p._2)).sum.toDouble
    val sd = pairs.map(p => BigInt(p._1)).sum.toDouble
    val cuu = pairs.map(p => BigInt(p._2) * p._2).sum.toDouble - su * su / nd
    val cud = pairs.map(p => BigInt(p._2) * p._1).sum.toDouble - su * sd / nd
    val cdd = pairs.map(p => BigInt(p._1) * p._1).sum.toDouble - sd * sd / nd
    val beta = cud / cuu
    val rss = cdd - beta * cud
    val t = beta / math.sqrt(rss / (nd - 2.0) / cuu)
    val got = Frontier8.queries("q208_adf")(spark, sf)
      .as[(Long, Double, Double, Double)].collect().head
    assert(got._1 == n.toLong)
    assert(math.abs(got._2 - beta) < 1e-6)
    assert(math.abs(got._3 - (sd / nd - beta * su / nd) / 100.0) < 1e-3)
    assert(math.abs(got._4 - t) < 1e-3)
    assert(got._2 < 0.0 && got._4 < 0.0,
      "bounded daily spend is mean-reverting, not a unit root")
  }

  test("variance ratio: matches brute-force overlapping windows") {
    val d = daily()
    def popVar(xs: Seq[Long]): Double = {
      val nd = xs.size.toDouble
      val s = xs.map(BigInt(_)).sum.toDouble
      val ss = xs.map(x => BigInt(x) * x).sum.toDouble
      (ss - s * s / nd) / nd
    }
    val var1 = popVar(d.values.toSeq)
    val got = Frontier8.queries("q209_variance_ratio")(spark, sf)
      .as[(Long, Long, Double, Double)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(2L, 4L, 8L))
    got.foreach { case (q, nw, vr, z) =>
      val qi = q.toInt
      // anchor t holds days t-q+1 .. t, kept only when all q exist
      val wins = d.keys.toSeq.sorted.flatMap { t =>
        val w = (0 until qi).flatMap(o => d.get(t - o))
        if (w.size == qi) Some(w.sum) else None
      }
      assert(nw == wins.size.toLong, s"q=$q window count")
      val expVr = popVar(wins) / (q.toDouble * var1)
      assert(math.abs(vr - expVr) < 1e-4, s"q=$q VR $vr vs $expVr")
      val expZ = (expVr - 1.0) / math.sqrt(
        2.0 * (2.0 * q - 1.0) * (q - 1.0) / (3.0 * q * nw))
      assert(math.abs(z - expZ) < 1e-3, s"q=$q z")
    }
  }

  test("var/es: tail mean at or below the 5th-percentile change") {
    val d = daily()
    val chg = d.toSeq.flatMap { case (t, y) =>
      d.get(t - 1).map(u => y - u)
    }.sorted.toArray
    val h = (chg.length - 1).toDouble * 0.05
    val lo = math.floor(h).toInt
    val hi = math.ceil(h).toInt
    val v = chg(lo) + (h - lo) * (chg(hi) - chg(lo)).toDouble
    val tail = chg.filter(_.toDouble <= v)
    val got = Frontier8.queries("q210_var_es")(spark, sf)
      .as[(Long, Long, Double, Double)].collect().head
    assert(got._1 == chg.length.toLong)
    assert(got._2 == tail.length.toLong)
    assert(got._3 == round4(v / 100.0))
    assert(math.abs(got._4 -
      tail.map(BigInt(_)).sum.toDouble / tail.length / 100.0) < 1e-3)
    assert(got._4 <= got._3, "ES is at least as severe as VaR")
  }

  test("arch-lm: n*R2 on squared-change lag pairs matches") {
    val d = daily()
    val e2 = d.toSeq.flatMap { case (t, y) =>
      d.get(t - 1).map { u =>
        t -> ((BigInt(y - u) * BigInt(y - u)) / 10000)
      }
    }.toMap
    val pairs = e2.toSeq.flatMap { case (t, ey) =>
      e2.get(t - 1).map(eu => (ey, eu))
    }
    val n = pairs.size
    val nd = n.toDouble
    val sy = pairs.map(_._1).sum.toDouble
    val su = pairs.map(_._2).sum.toDouble
    val cyy = pairs.map(p => p._1 * p._1).sum.toDouble - sy * sy / nd
    val cuu = pairs.map(p => p._2 * p._2).sum.toDouble - su * su / nd
    val cyu = pairs.map(p => p._1 * p._2).sum.toDouble - sy * su / nd
    val r2 = cyu * cyu / (cuu * cyy)
    val got = Frontier8.queries("q215_arch_lm")(spark, sf)
      .as[(Long, Double, Double)].collect().head
    assert(got._1 == n.toLong)
    assert(math.abs(got._2 - r2) < 1e-6)
    assert(math.abs(got._3 - nd * r2) < 1e-3)
    assert(got._2 >= 0.0 && got._2 <= 1.0, "R2 is a squared correlation")
  }

  test("mde: per-type power sizing from exact user moments") {
    val per = graft.Tables.load(spark, sf, "events")
      .select($"event_type", $"user_id",
        round($"value" * 100).cast("long").as("cents"))
      .as[(String, Long, Long)].collect()
      .groupBy(r => (r._1, r._2)).view
      .mapValues(_.map(_._3).sum).toSeq
      .groupBy(_._1._1)
    val got = Frontier8.queries("q216_mde")(spark, sf)
      .as[(String, Long, Double, Double, Double)].collect()
    assert(got.length == per.size)
    got.foreach { case (tpe, n, mean, mde, rel) =>
      val xs = per(tpe).map(_._2)
      val nd = xs.size.toDouble
      val mu = xs.map(BigInt(_)).sum.toDouble / nd
      val sig2 = xs.map(x => BigInt(x) * x).sum.toDouble / nd - mu * mu
      val expMde = 2.801585 * math.sqrt(2.0 * sig2 / (nd / 2.0))
      assert(n == xs.size.toLong)
      assert(math.abs(mean - mu / 100.0) < 1e-3)
      assert(math.abs(mde - expMde / 100.0) < 1e-3)
      assert(math.abs(rel - expMde / mu) < 1e-4)
      assert(mde > 0.0, "MDE is positive for a non-constant metric")
    }
  }

  test("newey-west: Bartlett-weighted long-run variance matches") {
    val d = daily()
    val nn = d.size.toDouble
    val mu = d.values.map(BigInt(_)).sum.toDouble / nn
    val gam = (0 to 7).map { l =>
      val pr = d.toSeq.flatMap { case (t, u) =>
        d.get(t + l).map(y => (y, u))
      }
      val syu = pr.map(p => BigInt(p._1) * p._2).sum.toDouble
      val syl = pr.map(p => BigInt(p._1)).sum.toDouble
      val sul = pr.map(p => BigInt(p._2)).sum.toDouble
      (syu - mu * (syl + sul) + pr.size.toDouble * mu * mu) / nn
    }
    val lrv = gam.zipWithIndex.map { case (g, l) =>
      if (l == 0) g else 2.0 * (1.0 - l / 8.0) * g
    }.sum
    val got = Frontier8.queries("q211_newey_west")(spark, sf)
      .as[(Long, Double, Double, Double)].collect().head
    assert(got._1 == d.size.toLong)
    assert(math.abs(got._2 - gam.head / 10000.0) < 1e-3)
    assert(math.abs(got._3 - lrv / 10000.0) < 1e-3)
    assert(math.abs(got._4 -
      math.sqrt(math.max(lrv, 0.0) / nn) / 100.0) < 1e-3)
    assert(got._2 > 0.0, "gamma0 is a variance of a non-constant series")
  }
}
