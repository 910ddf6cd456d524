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
}
