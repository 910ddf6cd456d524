package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scalar re-derivations for the round-18 batch-2 keys — each test
  * recomputes the operator's answer from first principles on the
  * sf0.001 fixture (collected driver-side, tiny) and pins the
  * distributed plan against it.
  */
class Frontier11Spec extends SparkSpec {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def md5hex(s: String): String =
    java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8")).map("%02x".format(_)).mkString

  /** (source, 3-gram) pairs of the fixture corpus. */
  private def shingles(): Seq[(String, String)] =
    graft.Tables.load(spark, sf, "documents")
      .select($"source", $"text").as[(String, String)].collect()
      .toSeq.flatMap { case (src, text) =>
        val w = text.toLowerCase.split("\\s+")
        if (w.length < 3) Seq.empty
        else w.sliding(3).map(g => src -> g.mkString(" ")).toSeq
      }

  test("kmv overlap: estimates match the brute-force bottom-k replay; " +
      "sketches are FULL so the (K-1)M/h_K path is exercised") {
    val k = 256
    val dom = 1152921504606846976L // 16^15
    val sh = shingles()
    def hash(t: String): Long =
      java.lang.Long.parseLong(md5hex(t).substring(0, 15), 16)
    val bySrc = sh.groupBy(_._1).view
      .mapValues(_.map(p => hash(p._2)).distinct.sorted).toMap
    def est(vs: Seq[Long]): Double =
      if (vs.length < k) vs.length.toDouble
      else (k - 1).toDouble * dom.toDouble / vs(k - 1).toDouble
    val got = Frontier11.queries("pipeline_kmv_overlap")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) -> r).toMap
    assert(got.nonEmpty)
    // every sketch must be full at this corpus (~1.5k shingles/source)
    bySrc.foreach { case (s, vs) =>
      assert(vs.length > k, s"$s universe ${vs.length} <= K — vacuous")
    }
    got.foreach { case ((sa, sb), row) =>
      val (va, vb) = (bySrc(sa), bySrc(sb))
      assert(math.abs(row.getDouble(5) - est(va)) < 0.01, s"est_a $sa")
      assert(math.abs(row.getDouble(6) - est(vb)) < 0.01, s"est_b $sb")
      val merged = (va.take(k) ++ vb.take(k)).distinct.sorted
      val unionK = merged.take(k)
      val estU =
        if (merged.length < k) merged.length.toDouble
        else (k - 1).toDouble * dom.toDouble / unionK(k - 1).toDouble
      val both = unionK.count(v =>
        va.take(k).contains(v) && vb.take(k).contains(v))
      val jac = both.toDouble / unionK.length.toDouble
      assert(math.abs(row.getDouble(7) - estU) < 0.01, s"union $sa/$sb")
      assert(math.abs(row.getDouble(8) - jac) < 1e-6, s"jacc $sa/$sb")
      // the estimates must actually estimate: exact values ride in
      // columns 2-4; K=256 design error is ~6%, grant 4 sigma
      val exactA = row.getLong(2).toDouble
      assert(math.abs(est(va) - exactA) / exactA < 0.25,
        s"est_a off by >25% of exact for $sa — estimator broken?")
    }
  }

  test("dp quantile: released bin is the Gumbel-max argmax of the " +
      "scalar exponential-mechanism replay") {
    val o = graft.Tables.load(spark, sf, "orders")
      .select($"o_orderpriority",
        expr("CAST(round(o_totalprice * 100) AS BIGINT) div 1000")
          .as("bin"))
      .as[(String, Long)].collect()
    val got = Frontier11.queries("pipeline_dp_quantile")(spark, sf)
      .select($"priority", $"released_bin", $"score")
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    o.groupBy(_._1).foreach { case (prio, rows) =>
      val bins = rows.map(_._2).groupBy(identity).view
        .mapValues(_.size.toLong).toSeq.sortBy(_._1)
      val n = rows.size.toLong
      var cum = 0L
      val scored = bins.map { case (b, c) =>
        cum += c
        val u2 = -math.abs(2 * cum - n)
        val hex = md5hex(s"dpq:$prio:$b").substring(0, 12)
        val u01 = (java.lang.Long.parseLong(hex, 16).toDouble + 0.5) /
          281474976710656.0
        val g = -math.log(-math.log(u01))
        b -> (u2.toDouble * 0.25 + g)
      }
      val (wantBin, wantScore) =
        scored.maxBy { case (b, s) => (s, -b) }
      val (gotPrio, gotBin, gotScore) = got(prio)
      assert(gotBin == wantBin, s"$prio released $gotBin != $wantBin")
      assert(math.abs(gotScore - wantScore) < 1e-4, s"$prio score")
    }
  }

  test("ccnet buckets: tercile cuts and bucket masses match the " +
      "scalar surprisal replay") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select($"doc_id", $"lang", $"text")
      .as[(Long, String, String)].collect()
    // per-doc bigrams + per-lang model, exactly text_lm_score's shape
    val bgs = docs.flatMap { case (id, lang, text) =>
      val t = text.toLowerCase.split("\\s+")
      if (t.length < 2) Seq.empty
      else t.sliding(2).map(g => (id, lang, t.length.toLong,
        g.mkString(" "))).toSeq
    }
    val model = bgs.groupBy(b => (b._2, b._4)).view.mapValues(_.size).toMap
    val nLang = model.groupBy(_._1._1).view
      .mapValues(_.values.map(_.toLong).sum).toMap
    val scored = bgs.groupBy(_._1).map { case (id, rows) =>
      val lang = rows.head._2
      val srp = math.log(nLang(lang).toDouble) -
        rows.map(r => math.log(model((lang, r._4)).toDouble)).sum /
          rows.size
      (id, lang, rows.head._3,
        BigDecimal(srp).setScale(4, BigDecimal.RoundingMode.HALF_UP)
          .toDouble)
    }.toSeq
    // the rank cut: row_number over (srp, doc_id), 3·rn <= n / <= 2n
    val want = scored.groupBy(_._2).flatMap { case (lang, rows) =>
      val ordered = rows.sortBy(r => (r._4, r._1))
      val n = ordered.size
      ordered.zipWithIndex.groupBy { case (_, i) =>
        val rn = i + 1
        if (rn * 3 <= n) "head"
        else if (rn * 3 <= 2 * n) "middle" else "tail"
      }.map { case (b, rs) =>
        (lang, b) -> (rs.size.toLong, rs.map(_._1._3).sum) }
    }
    val got = Frontier11.queries("pipeline_ccnet_buckets")(spark, sf)
      .select($"lang", $"bucket", $"n_docs", $"n_tokens")
      .as[(String, String, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    assert(got.keySet == want.keySet,
      s"bucket panel mismatch: ${got.keySet} vs ${want.keySet}")
    want.foreach { case (k, v) =>
      assert(got(k) == v, s"bucket $k: ${got(k)} != $v")
    }
  }

  test("runs test: R, n1/n2, and z match the scalar replay; " +
      "oscillation/clustering read the documented sign") {
    val daily = graft.Tables.load(spark, sf, "events")
      .select($"event_type", to_date($"ts").cast("string").as("day"),
        round($"value" * 100).cast("long").as("cents"))
      .as[(String, String, Long)].collect()
      .groupBy(_._1).view.mapValues(
        _.groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq
          .sortBy(_._1).map(_._2)).toMap
    val got = Frontier11.queries("q230_runs_test")(spark, sf)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    daily.foreach { case (et, vs) =>
      val sg = vs.sliding(2).collect {
        case Seq(a, b) if b != a => if (b > a) 1 else -1 }.toSeq
      val (n1, n2) = (sg.count(_ == 1).toLong, sg.count(_ == -1).toLong)
      val r = if (sg.isEmpty) 0L
        else 1L + sg.sliding(2).count {
          case Seq(a, b) => a != b; case _ => false }
      val (_, gn1, gn2, gr, gz) = got(et)
      assert(gn1 == n1 && gn2 == n2 && gr == r, s"$et counts")
      if (n1 > 0 && n2 > 0 && n1 + n2 >= 2) {
        val n = (n1 + n2).toDouble
        val e = 2.0 * n1 * n2 / n + 1.0
        val v = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (n * n * (n - 1))
        if (v > 0)
          assert(math.abs(gz - (r - e) / math.sqrt(v)) < 1e-3, s"$et z")
      }
    }
  }

  test("amoc changepoint: the released split maximizes the exact " +
      "CUSUM gain in the scalar replay") {
    val daily = graft.Tables.load(spark, sf, "events")
      .select($"event_type", to_date($"ts").cast("string").as("day"),
        round($"value" * 100).cast("long").as("cents"))
      .as[(String, String, Long)].collect()
      .groupBy(_._1).view.mapValues(
        _.groupBy(_._2).view.mapValues(_.map(_._3).sum).toSeq
          .sortBy(_._1)).toMap
    val got = Frontier11.queries("q231_amoc_changepoint")(spark, sf)
      .select($"event_type", $"n_days", $"t_star",
        $"mean_left_cents", $"mean_right_cents")
      .as[(String, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    daily.foreach { case (et, rows) =>
      val vs = rows.map(_._2)
      val n = vs.length
      val s = vs.map(BigInt(_)).sum
      var best = (-1.0, 0)
      var sl = BigInt(0)
      for (t <- 1 until n) {
        sl += vs(t - 1)
        val num = BigInt(n) * sl - BigInt(t) * s
        val gain = (num * num).toDouble / (t.toLong * (n - t)).toDouble
        if (gain > best._1) best = (gain, t)
      }
      val (_, gotN, gotT, ml, mr) = got(et)
      assert(gotN == n.toLong && gotT == best._2.toLong,
        s"$et split ${gotT} != ${best._2}")
      val slStar = vs.take(best._2).map(BigInt(_)).sum
      assert(ml == (slStar / best._2).toLong, s"$et mean_left")
      assert(mr == ((s - slStar) / (n - best._2)).toLong,
        s"$et mean_right")
    }
  }

  test("mann-kendall: S, tie-corrected variance, and z match the " +
      "pairwise scalar replay") {
    val daily = graft.Tables.load(spark, sf, "events")
      .select($"event_type", to_date($"ts").as("day"),
        round($"value" * 100).cast("long").as("cents"))
      .groupBy($"event_type", $"day").agg(sum($"cents").as("v"))
      .select($"event_type", $"day".cast("string"), $"v")
      .as[(String, String, Long)].collect()
    val got = Frontier11.queries("q229_mann_kendall")(spark, sf)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    daily.groupBy(_._1).foreach { case (et, rows) =>
      val vs = rows.sortBy(_._2).map(_._3)
      val n = vs.length
      var s = 0L
      for (i <- 0 until n; j <- i + 1 until n)
        s += java.lang.Long.signum(vs(j) - vs(i))
      val ties = vs.groupBy(identity).values.map(_.size.toLong)
      val var18 = n.toLong * (n - 1) * (2L * n + 5) -
        ties.map(t => t * (t - 1) * (2 * t + 5)).sum
      val z =
        if (var18 <= 0) Double.NaN
        else (if (s > 0) s - 1.0 else if (s < 0) s + 1.0 else 0.0) /
          math.sqrt(var18 / 18.0)
      val (_, gotN, gotS, gotZ) = got(et)
      assert(gotN == n.toLong && gotS == s, s"$et n/S")
      if (!z.isNaN)
        assert(math.abs(gotZ - z) < 1e-3, s"$et z $gotZ != $z")
    }
  }
}
