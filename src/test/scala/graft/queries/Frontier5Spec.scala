package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral specs for the round-15 batch-1 operators — independent
  * driver-side re-derivations at sf0.001 (the FrontierSpec pattern),
  * on top of the DuckDB hash gate.
  */
class Frontier5Spec extends SparkSpec {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  /** Gap-filled daily cent series per event type (q174's spine),
    * as (type → di → cents) plus the max day index.
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

  private def round4(x: Double): Double =
    BigDecimal(x).setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("decontam ivm: batched quarantine == single-shot; flags are sound") {
    val got = Frontier5.queries("q186_decontam_ivm")(spark, sf)
      .as[(Long, Long)].collect()
    // (a) batch ids are the id-range thirds
    val docs = graft.Tables.load(spark, sf, "documents")
    val cut = docs.agg(max($"doc_id")).as[Long].first()
    val r = cut - 250L
    got.foreach { case (b, id) =>
      val expect =
        if (id <= 250L + r / 3L) 0L
        else if (id <= 250L + (2L * r) / 3L) 1L else 2L
      assert(b == expect, s"doc $id flagged in batch $b, arrived in $expect")
    }
    // (b) the IVM property: three id-ordered batches through the
    // PRODUCTION guard quarantine exactly what ONE batch over the
    // whole train set quarantines — batch boundaries are invisible
    val test0 = docs.filter($"doc_id" < 250L).select($"doc_id", $"text")
    val train = docs.filter($"doc_id" >= 250L).select($"doc_id", $"text")
    val oneDir = graft.ScratchDir.path("decontam_spec_single") + "/q"
    graft.streaming.StreamOps.decontaminationGuard(test0, oneDir)(
      train, 0L)
    val single = spark.read
      .schema("doc_id BIGINT, batch_id BIGINT").parquet(oneDir)
      .select($"doc_id").as[Long].collect().toSet
    assert(got.map(_._2).toSet == single,
      "batched quarantine set != single-shot quarantine set")
    // (c) soundness: every flagged doc really has a corpus near-dup
    // at exact shingle-Jaccard >= 0.5 (driver brute-force, 500 docs)
    val shh = docs
      .select($"doc_id", graft.functions.ShingleFunctions
        .shingle_hashes($"text").as("shh"))
      .as[(Long, Seq[Long])].collect().toMap
    got.foreach { case (_, id) =>
      val mine = shh(id).toSet
      val best = (0L until 250L).flatMap(c => shh.get(c)).map { cs =>
        val inter = mine.intersect(cs.toSet).size.toDouble
        inter / (mine.size + cs.toSet.size - inter)
      }.foldLeft(0.0)(math.max)
      assert(best >= 0.5,
        s"doc $id quarantined but best corpus Jaccard is $best")
    }
  }

  test("ljung-box: exact-moment fold replay of the 7-lag statistic") {
    val got = Frontier5.queries("q187_ljung_box")(spark, sf)
      .as[(String, Long, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    val (series, dmax) = dailyEventSeries()
    val n = dmax + 1
    series.foreach { case (t, byDi) =>
      val v = (0L until n).map(byDi).toArray
      val s = v.map(BigInt(_)).sum
      val ss = v.map(x => BigInt(x) * x).sum
      val nd = n.toDouble
      val m = s.toDouble / nd
      val c0 = ss.toDouble - nd * m * m
      var acc = 0.0
      (1 to 7).foreach { k =>
        val sp = (0 until (n - k).toInt)
          .map(i => BigInt(v(i)) * v(i + k)).sum
        val sh = (0 until (n - k).toInt).map(i => BigInt(v(i))).sum
        val st = (k until n.toInt).map(i => BigInt(v(i))).sum
        val num = sp.toDouble - m * (sh.toDouble + st.toDouble) +
          (nd - k.toDouble) * m * m
        val rho = num / c0
        acc += rho * rho / (nd - k.toDouble)
      }
      val lb = round4(nd * (nd + 2.0) * acc)
      val (_, nDays, df, gotLb) = got(t)
      assert(nDays == n && df == 7L)
      assert(gotLb.isDefined && math.abs(gotLb.get - lb) < 1e-9,
        s"$t: lb ${gotLb} != replay $lb")
    }
  }

  test("mood median: pooled interpolated median, exact counts, chi2") {
    val got = Frontier5.queries("q188_mood_median")(spark, sf)
      .as[(String, Long, Long, Double, Option[Double], Long)]
      .collect().sortBy(_._1)
    val rows = graft.Tables.load(spark, sf, "orders")
      .join(graft.Tables.load(spark, sf, "customer"),
        $"o_custkey" === $"c_custkey")
      .select($"c_mktsegment",
        round($"o_totalprice" * 100).cast("long"))
      .as[(String, Long)].collect()
    // percentile_cont(0.5) replay: index (n-1)/2, linear interpolation
    val sorted = rows.map(_._2).sorted
    val pos = 0.5 * (sorted.length - 1)
    val lo = sorted(pos.toInt)
    val hi = sorted(math.ceil(pos).toInt)
    val med = lo + (pos - pos.toInt) * (hi - lo)
    val per = rows.groupBy(_._1).map { case (seg, rs) =>
      seg -> (rs.length.toLong, rs.count(_._2 > med).toLong)
    }
    val nn = per.values.map(_._1).sum
    val aa = per.values.map(_._2).sum
    var chi2 = 0.0
    per.toSeq.sortBy(_._1).foreach { case (_, (ng, ag)) =>
      val ea = ng.toDouble * aa.toDouble / nn.toDouble
      val eb = ng.toDouble * (nn.toDouble - aa.toDouble) / nn.toDouble
      chi2 += (ag.toDouble - ea) * (ag.toDouble - ea) / ea +
        ((ng - ag).toDouble - eb) * ((ng - ag).toDouble - eb) / eb
    }
    assert(got.length == per.size)
    got.foreach { case (seg, ng, na, ea, c2, df) =>
      assert(per(seg) == ((ng, na)), s"$seg counts mismatch")
      val eaR = round4(ng.toDouble * aa.toDouble / nn.toDouble)
      assert(math.abs(ea - eaR) < 1e-9)
      assert(c2.isDefined && math.abs(c2.get - round4(chi2)) < 1e-9)
      assert(df == per.size - 1L)
    }
  }

  test("cramers v: exact contingency replay of the return/status pair") {
    val got = Frontier5.queries("q189_cramers_v")(spark, sf)
      .as[(String, Long, Long, Long, Double, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.keySet == Set("return_status", "brand_size",
      "priority_status", "segment_nation"))
    val cells = graft.Tables.load(spark, sf, "lineitem")
      .groupBy($"l_returnflag", $"l_linestatus")
      .agg(count(lit(1)).as("o"))
      .as[(String, String, Long)].collect()
    val nn = cells.map(_._3).sum
    val rn = cells.groupBy(_._1).view.mapValues(_.map(_._3).sum).toMap
    val cn = cells.groupBy(_._2).view.mapValues(_.map(_._3).sum).toMap
    var chi2 = 0.0
    cells.sortBy(c => (c._1, c._2)).foreach { case (a, b, o) =>
      val dv = (BigInt(nn) * o - BigInt(rn(a)) * cn(b)).toDouble
      chi2 += dv * dv /
        (nn.toDouble * rn(a).toDouble * cn(b).toDouble)
    }
    val r = rn.size
    val c = cn.size
    val v = math.sqrt(chi2 / (nn.toDouble * (math.min(r, c) - 1)))
    val (_, gn, gr, gc, gChi, gV) = got("return_status")
    assert(gn == nn && gr == r && gc == c)
    assert(math.abs(gChi - round4(chi2)) < 1e-9)
    assert(math.abs(gV - BigDecimal(v)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-9)
  }

  /** Exact weekday (wd, n, Σv, Σv²) panel off raw orders — the q179
    * frame q191/q192 replay against.
    */
  private def weekdayPanel(): Map[Long, (Long, BigInt, BigInt)] = {
    val rows = graft.Tables.load(spark, sf, "orders")
      .select(
        pmod(datediff(to_date($"o_orderdate"), lit("1970-01-05")),
          lit(7)).cast("long"),
        round($"o_totalprice" * 100).cast("long"))
      .as[(Long, Long)].collect()
    rows.groupBy(_._1).map { case (wd, rs) =>
      wd -> (rs.length.toLong,
        rs.map(r => BigInt(r._2)).sum,
        rs.map(r => BigInt(r._2) * r._2).sum)
    }
  }

  test("tukey hsd: pairwise q replays from the exact weekday moments") {
    val got = Frontier5.queries("q191_tukey_hsd")(spark, sf)
      .as[(Long, Long, Long, Long, Double, Option[Double])].collect()
    val panel = weekdayPanel()
    val k = panel.size
    assert(got.length == k * (k - 1) / 2, "one row per weekday pair")
    val n = panel.values.map(_._1).sum
    val svv = panel.values.map(_._3).sum
    val sbterm = panel.toSeq.sortBy(_._1).map { case (_, (ng, sg, _)) =>
      sg.toDouble * sg.toDouble / ng.toDouble
    }.foldLeft(0.0)(_ + _)
    val msw = (svv.toDouble - sbterm) / (n.toDouble - k.toDouble)
    got.foreach { case (a, b, na, nb, diff, q) =>
      val (pa, pb) = (panel(a), panel(b))
      assert(na == pa._1 && nb == pb._1)
      val ma = pa._2.toDouble / pa._1.toDouble
      val mb = pb._2.toDouble / pb._1.toDouble
      assert(math.abs(diff - round4((ma - mb) / 100.0)) < 1e-9)
      val qr = math.abs(ma - mb) /
        math.sqrt(msw / 2.0 * (1.0 / na.toDouble + 1.0 / nb.toDouble))
      assert(q.isDefined && math.abs(q.get - round4(qr)) < 1e-9,
        s"pair ($a,$b): q ${q} != replay $qr")
    }
  }

  test("bartlett: log-variance fold replays from the exact moments") {
    val got = Frontier5.queries("q192_bartlett")(spark, sf)
      .as[(Long, Long, Option[Double])].collect()
    assert(got.length == 1)
    val panel = weekdayPanel()
    val k = panel.size
    val n = panel.values.map(_._1).sum
    val byWd = panel.toSeq.sortBy(_._1)
    val s2 = byWd.map { case (_, (ng, sg, sgg)) =>
      (ng, (sgg.toDouble - sg.toDouble * sg.toDouble / ng.toDouble) /
        (ng.toDouble - 1.0))
    }
    val nd = n.toDouble
    val kd = k.toDouble
    val sp2 = s2.map { case (ng, v) => (ng.toDouble - 1.0) * v }
      .foldLeft(0.0)(_ + _) / (nd - kd)
    val lnsum = s2.map { case (ng, v) =>
      (ng.toDouble - 1.0) * math.log(v) }.foldLeft(0.0)(_ + _)
    val invsum = s2.map { case (ng, _) => 1.0 / (ng.toDouble - 1.0) }
      .foldLeft(0.0)(_ + _)
    val c = 1.0 + (invsum - 1.0 / (nd - kd)) / (3.0 * (kd - 1.0))
    val stat = ((nd - kd) * math.log(sp2) - lnsum) / c
    val (gn, gk, gs) = got(0)
    assert(gn == n && gk == k)
    assert(gs.isDefined && math.abs(gs.get - round4(stat)) < 1e-9,
      s"bartlett ${gs} != replay $stat")
  }

  test("grubbs: argmax day and G replay from the exact daily grid") {
    val got = Frontier5.queries("q193_grubbs_outlier")(spark, sf)
      .as[(String, Long, String, Long, Option[Double])].collect()
      .map(r => r._1 -> r).toMap
    val (series, dmax) = dailyEventSeries()
    val n = dmax + 1
    series.foreach { case (t, byDi) =>
      val v = (0L until n).map(byDi).toArray
      val s = v.map(BigInt(_)).sum
      val ss = v.map(x => BigInt(x) * x).sum
      val nd = n.toDouble
      val m = s.toDouble / nd
      val piv = BigDecimal(m)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      // deterministic struct-max: max (|v-piv|, day-index, v)
      val wi = v.zipWithIndex.maxBy { case (x, i) =>
        (math.abs(x - piv), i.toLong) }
      val varr = ss.toDouble / nd - m * m
      val g = math.abs(wi._1.toDouble - m) / math.sqrt(varr)
      val (_, nDays, _, wc, gg) = got(t)
      assert(nDays == n)
      assert(wc == wi._1, s"$t worst_cents $wc != replay ${wi._1}")
      assert(gg.isDefined && math.abs(gg.get - round4(g)) < 1e-9)
    }
  }

  test("cochran-armitage: exact score sums, T and Var replay") {
    val got = Frontier5.queries("q194_cochran_armitage")(spark, sf)
      .as[(Long, Long, Option[Double])].collect()
    assert(got.length == 1)
    val rows = graft.Tables.load(spark, sf, "orders")
      .select(
        pmod(datediff(to_date($"o_orderdate"), lit("1970-01-05")),
          lit(7)).cast("long"),
        round($"o_totalprice" * 100).cast("long"))
      .as[(Long, Long)].collect()
    val sorted = rows.map(_._2).sorted
    val pos = 0.5 * (sorted.length - 1)
    val lo = sorted(pos.toInt)
    val hi = sorted(math.ceil(pos).toInt)
    val med = lo + (pos - pos.toInt) * (hi - lo)
    val n = rows.length.toLong
    val a = rows.count(_._2 > med).toLong
    val swa = rows.filter(_._2 > med).map(_._1).sum
    val swn = rows.map(_._1).sum
    val sw2n = rows.map(r => r._1 * r._1).sum
    val p = a.toDouble / n.toDouble
    val t = swa.toDouble - p * swn.toDouble
    val vr = p * (1.0 - p) *
      (sw2n.toDouble - (BigInt(swn) * swn).toDouble / n.toDouble)
    val z = t / math.sqrt(vr)
    val (gn, ga, gz) = got(0)
    assert(gn == n && ga == a)
    assert(gz.isDefined && math.abs(gz.get - round4(z)) < 1e-9,
      s"z ${gz} != replay $z")
  }

  test("page-hinkley: exact integer walk, pivot, lambda, alarms") {
    val got = Frontier5.queries("q190_page_hinkley")(spark, sf)
      .as[(String, Long, Long, Long, Option[String], Long)].collect()
      .map(r => r._1 -> r).toMap
    val (series, dmax) = dailyEventSeries()
    val n = dmax + 1
    series.foreach { case (t, byDi) =>
      val v = (0L until n).map(byDi).toArray
      val s = v.map(BigInt(_)).sum
      val ss = v.map(x => BigInt(x) * x).sum
      val nd = n.toDouble
      val m = s.toDouble / nd
      val piv = BigDecimal(m)
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      val vr = math.max(ss.toDouble / nd - m * m, 0.0)
      val lambda = BigDecimal(2.0 * math.sqrt(vr))
        .setScale(0, BigDecimal.RoundingMode.HALF_UP).toLong
      var mt = 0L
      var mn = 0L
      var first = true
      var nAlarms = 0L
      var firstAlarm: Option[Int] = None
      var maxPh = 0L
      v.zipWithIndex.foreach { case (x, i) =>
        mt += x - piv
        if (first || mt < mn) mn = mt
        first = false
        val ph = mt - mn
        if (ph > maxPh) maxPh = ph
        if (ph > lambda) {
          nAlarms += 1
          if (firstAlarm.isEmpty) firstAlarm = Some(i)
        }
      }
      val (_, nDays, gl, ga, gf, gm) = got(t)
      assert(nDays == n)
      assert(gl == lambda, s"$t lambda $gl != $lambda")
      assert(ga == nAlarms, s"$t alarms $ga != $nAlarms")
      assert(gm == maxPh, s"$t max_ph $gm != $maxPh")
      assert(gf.isDefined == firstAlarm.isDefined)
    }
  }
}
