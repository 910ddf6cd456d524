package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Scalar re-derivations for the round-19 batch keys — each test
  * recomputes the statistic from first principles on the sf0.001
  * fixture (collected driver-side, tiny) and pins the distributed
  * plan against it; plus the non-vacuity pin for the watermark-drop
  * audit (its oracle REPLAYS the drop rule, so a hash match alone
  * could be satisfied by a no-drop degeneration — this spec pins
  * that real drops occur).
  */
class Frontier12Spec extends SparkSpec {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  /** (event_type, day-ordered daily cents) from the same rollup the
    * queries build — isolates the statistic under test.
    */
  private def dailyByType(): Map[String, Seq[Long]] =
    graft.Tables.load(spark, sf, "events")
      .select($"event_type", to_date($"ts").as("day"),
        round($"value" * 100).cast("long").as("cents"))
      .groupBy($"event_type", $"day").agg(sum($"cents").as("v"))
      .orderBy($"event_type", $"day")
      .select($"event_type", $"v").as[(String, Long)].collect()
      .toSeq.groupBy(_._1).view.mapValues(_.map(_._2)).toMap

  test("q237 Hodges-Lehmann equals the sorted-pairwise-difference median") {
    val daily = dailyByType()
    val got = Frontier12.queries("q237_hodges_lehmann")(spark, sf)
      .collect().map(r => (r.getString(0), r.getString(1)) ->
        (r.getLong(2), r.getLong(3), r.getDouble(4))).toMap
    val types = daily.keys.toSeq.sorted
    val expectedPairs = for {
      i <- types.indices; j <- (i + 1) until types.length
    } yield (types(i), types(j))
    assert(got.keySet == expectedPairs.toSet)
    expectedPairs.foreach { case (ta, tb) =>
      val diffs = (for (a <- daily(ta); b <- daily(tb)) yield a - b)
        .sorted
      val m = diffs.length
      val hlX2 = diffs((m + 1) / 2 - 1) + diffs((m + 2) / 2 - 1)
      val (nPairs, gx2, ghl) = got((ta, tb))
      assert(nPairs == m.toLong, s"$ta/$tb n_pairs")
      assert(gx2 == hlX2, s"$ta/$tb hl_x2")
      assert(ghl == hlX2.toDouble / 2.0, s"$ta/$tb hl")
    }
  }

  test("q238 KPSS equals the BigInt partial-sum replay (incl. the lag rule)") {
    val daily = dailyByType()
    val got = Frontier12.queries("q238_kpss")(spark, sf)
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getDouble(3))).toMap
    daily.foreach { case (tpe, vs) =>
      val n = vs.length
      val q = (8 to 0 by -1).find(k =>
        100L * k * k * k * k <= 256L * n).get
      val sv = vs.map(BigInt(_)).sum
      val ee = vs.map(v => BigInt(v) * n - sv)
      val st = ee.scanLeft(BigInt(0))(_ + _).tail
      val a2 = st.map(s => s * s).sum
      val gam = (0 to q).map(j =>
        (j until n).map(t => ee(t) * ee(t - j)).sum)
      val dd = (0 to q).map(j =>
        if (j == 0) BigInt(q + 1) * gam(0)
        else BigInt(2) * (q + 1 - j) * gam(j)).sum
      val eta = (BigInt(q + 1) * a2).toDouble / (BigInt(n) * dd).toDouble
      val (gn, gq, gk) = got(tpe)
      assert(gn == n.toLong && gq == q.toLong, s"$tpe n/q")
      assert(math.abs(gk - math.rint(eta * 1e6) / 1e6) < 1e-9,
        s"$tpe kpss $gk vs $eta")
    }
  }

  test("q239 Cliff's delta equals the brute-force pair count") {
    val rows = graft.Tables.load(spark, sf, "orders")
      .filter($"o_orderpriority".isin("1-URGENT", "5-LOW"))
      .select(round($"o_totalprice" * 100).cast("long").as("cents"),
        ($"o_orderpriority" === "1-URGENT").as("isa"))
      .as[(Long, Boolean)].collect()
    val xs = rows.filter(_._2).map(_._1)
    val ys = rows.filterNot(_._2).map(_._1)
    var gt = 0L; var lt = 0L
    for (x <- xs; y <- ys) {
      if (x > y) gt += 1 else if (x < y) lt += 1
    }
    val delta = (gt - lt).toDouble / (xs.length.toLong * ys.length)
    val r = Frontier12.queries("q239_cliffs_delta")(spark, sf)
      .collect().head
    assert(r.getLong(0) == xs.length.toLong)
    assert(r.getLong(1) == ys.length.toLong)
    assert(math.abs(r.getDouble(2) - math.rint(delta * 1e6) / 1e6)
      < 1e-9)
  }

  test("q240 Page's L equals the per-block rank replay on the integer calendar") {
    val daily = graft.Tables.load(spark, sf, "events")
      .select(to_date($"ts").as("day"),
        round($"value" * 100).cast("long").as("cents"))
      .groupBy($"day").agg(sum($"cents").as("v"))
      .select(datediff($"day", lit("1970-01-01")).cast("long"), $"v")
      .as[(Long, Long)].collect().toSeq
    val byBlock = daily.map { case (ed, v) =>
      ((ed + 3) / 7, (ed + 3) % 7 + 1, v)
    }.groupBy(_._1).filter(_._2.length == 7)
    val l2 = byBlock.values.map { wk =>
      wk.map { case (_, j, v) =>
        val less = wk.count(_._3 < v)
        val tied = wk.count(_._3 == v)
        j * (2L * less + tied + 1)
      }.sum
    }.sum
    val b = byBlock.size
    val z = (6.0 * l2 - 3.0 * b * 7 * 64) / (56.0 * math.sqrt(6.0 * b))
    val r = Frontier12.queries("q240_page_trend")(spark, sf)
      .collect().head
    assert(r.getLong(0) == b.toLong, "n_blocks")
    assert(r.getLong(1) == l2, "l_x2")
    if (b == 0) assert(r.isNullAt(2))
    else assert(math.abs(r.getDouble(2) - math.rint(z * 1e4) / 1e4)
      < 1e-9)
  }

  test("q234 watermark-drop audit is non-vacuous: the runtime really drops") {
    val total = graft.Tables.load(spark, sf, "events").count()
    val survived = Frontier12
      .queries("q234_watermark_drop_ivm")(spark, sf)
      .agg(sum($"n")).first.getLong(0)
    assert(survived < total,
      s"no drops happened ($survived of $total) — the audit is vacuous")
    assert(survived > (total * 8) / 10,
      s"implausibly many drops ($survived of $total) — staging broke")
  }
}
