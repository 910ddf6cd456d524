package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** q25's moment sums must survive magnitudes where BIGINT arithmetic
  * overflows (the sf≈1 ceiling VERDICT r3 flagged): the aggregation
  * accumulates decimal(38,0), so a corpus far past the long bound
  * still produces exact statistics.
  */
class MomentWidthSpec extends SparkSpec {
  import spark.implicits._

  // cents ≈ 9e9 → c² ≈ 8.1e19 > Long.MaxValue (9.2e18): a single
  // row's squared moment already exceeds 64-bit
  private val vals = (1 to 10).map(i => 9.0e7 + i * 1000)
  private def events = vals.zipWithIndex.map { case (v, i) =>
    ("big", v, s"""{"k": ${i % 5}}""")
  }.toDF("event_type", "value", "props")

  test("long-width moments overflow at this magnitude (ANSI throws)") {
    val cl = round($"value" * 100).cast("long")
    intercept[Exception] {
      events.select(sum(cl * cl)).collect()
    }
  }

  test("q157 rolling corr survives daily sums past the 2^31 ceiling") {
    // two types, 8 days, one event/day with cents ≈ 9e9 (> 2^31):
    // the squared window moments (~8.1e19·7) overflow BIGINT, so the
    // pre-escalation long window moments would ANSI-throw; the
    // decimal(38,0) moments must produce the exact Pearson
    val base = java.sql.Timestamp.valueOf("2024-01-01 12:00:00")
    def ts(day: Int) = new java.sql.Timestamp(
      base.getTime + day * 86400000L)
    // y = a·x + noise keeps corr well inside (0, 1) — a boundary-free
    // assertion target
    val xs = (0 until 8).map(i => 9.0e7 + i * 31000 + (i % 3) * 7000)
    val ys = (0 until 8).map(i => 1.8e8 + i * 62000 + (i % 2) * 9000)
    val events = (0 until 8).flatMap { i =>
      Seq(("alpha", xs(i), ts(i)), ("beta", ys(i), ts(i)))
    }.toDF("event_type", "value", "ts")
    val rows = Frontier2.rollingCorr(events).collect()
    // 8 grid days → windows with n=7 at day 6 and day 7
    assert(rows.length == 2)
    def expected(off: Int): Double = {
      val cx = xs.slice(off, off + 7).map(v => BigInt(math.round(v * 100)))
      val cy = ys.slice(off, off + 7).map(v => BigInt(math.round(v * 100)))
      val n = BigInt(7)
      val (sx, sy) = (cx.sum, cy.sum)
      val sxy = cx.zip(cy).map { case (a, b) => a * b }.sum
      val (sxx, syy) = (cx.map(a => a * a).sum, cy.map(a => a * a).sum)
      val num = (n * sxy - sx * sy).toDouble
      val den = math.sqrt((n * sxx - sx * sx).toDouble *
        (n * syy - sy * sy).toDouble)
      math.rint(num / den * 10000) / 10000
    }
    rows.zipWithIndex.foreach { case (r, i) =>
      assert(math.abs(r.getAs[Double]("corr7") - expected(i)) < 2e-4,
        s"window $i: ${r.getAs[Double]("corr7")} vs ${expected(i)}")
    }
  }

  test("q100 assortativity escalates to decimal past 64-bit products") {
    // degree pairs whose products exceed Long.MaxValue: 4e9² =
    // 1.6e19 — try_multiply nulls, the overflow counter fires, and
    // the decimal recompute must match the BigInt reference
    val dxy = Seq((4_000_000_000L, 3_900_000_000L),
      (3_800_000_000L, 4_100_000_000L),
      (100L, 200L), (250L, 50L), (7L, 4_000_000_123L))
    val out = Graph.assortativityFromDxDy(
      dxy.toDF("dx", "dy")).collect().head
    val n = BigInt(dxy.size)
    val bx = dxy.map(p => BigInt(p._1))
    val by = dxy.map(p => BigInt(p._2))
    val (sx, sy) = (bx.sum, by.sum)
    val sxy = bx.zip(by).map { case (a, b) => a * b }.sum
    val (sxx, syy) = (bx.map(a => a * a).sum, by.map(a => a * a).sum)
    val exp = (n * sxy - sx * sy).toDouble /
      math.sqrt((n * sxx - sx * sx).toDouble *
        (n * syy - sy * sy).toDouble)
    assert(out.getAs[Long]("n") == 5L)
    assert(math.abs(out.getAs[Double]("assortativity") -
      math.rint(exp * 10000) / 10000) < 2e-4)
  }

  test("q100 fast path (no overflow) matches the same reference") {
    val dxy = Seq((10L, 20L), (20L, 10L), (10L, 30L),
      (30L, 10L), (20L, 30L), (30L, 20L))
    val out = Graph.assortativityFromDxDy(
      dxy.toDF("dx", "dy")).collect().head
    val n = BigInt(dxy.size)
    val bx = dxy.map(p => BigInt(p._1))
    val by = dxy.map(p => BigInt(p._2))
    val (sx, sy) = (bx.sum, by.sum)
    val sxy = bx.zip(by).map { case (a, b) => a * b }.sum
    val (sxx, syy) = (bx.map(a => a * a).sum, by.map(a => a * a).sum)
    val exp = (n * sxy - sx * sy).toDouble /
      math.sqrt((n * sxx - sx * sx).toDouble *
        (n * syy - sy * sy).toDouble)
    assert(math.abs(out.getAs[Double]("assortativity") -
      math.rint(exp * 10000) / 10000) < 2e-4)
  }

  test("q126 spearman rank moments survive sums past the 64-bit bound") {
    // ×2-scaled ranks of a ~1.5e9-customer corpus: rx ≈ 3e9, so each
    // product rx² ≈ 9e18 still fits a long but THREE of them do not —
    // the decimal(38,0) accumulation is what keeps Σrank² exact
    val rx = Seq(3_000_000_000L, 2_900_000_000L, 2_800_000_000L,
      2_700_000_000L, 2_600_000_000L)
    val ry = Seq(2_600_000_000L, 2_900_000_000L, 2_700_000_000L,
      3_000_000_000L, 2_800_000_000L)
    val out = Insights.spearmanFromScaledRanks(
      rx.zip(ry).toDF("rx", "ry")).collect().head
    val n = BigInt(rx.size)
    val (bx, by) = (rx.map(BigInt(_)), ry.map(BigInt(_)))
    val (sx, sy) = (bx.sum, by.sum)
    val sxy = bx.zip(by).map { case (a, b) => a * b }.sum
    val (sxx, syy) = (bx.map(a => a * a).sum, by.map(a => a * a).sum)
    assert(sxx > BigInt(Long.MaxValue), "case must exceed the long sum")
    val exp = (n * sxy - sx * sy).toDouble /
      (math.sqrt((n * sxx - sx * sx).toDouble) *
       math.sqrt((n * syy - sy * sy).toDouble))
    assert(out.getAs[Long]("n_cust") == 5L)
    assert(math.abs(out.getAs[Double]("spearman_rho") -
      math.rint(exp * 10000) / 10000) < 2e-4)
  }

  test("q131 neighbor-degree mass is exact at the documented bound " +
      "and fails loud past it") {
    // documented bound: Σnbr_deg per bucket < 2^63 by value domain.
    // Four rows of 2.3e18 land at 9.2e18 — under Long.MaxValue by
    // 0.25% — and must come back EXACT (a double path would be ~1e3
    // off at this magnitude); a fifth row crosses 2^63 and the ANSI
    // sum must throw, never wrap.
    def rows(n: Int) = (1 to n).map(i =>
      (i.toLong, 5L, 2_300_000_000_000_000_000L))
    val ok = Graph.avgNeighborDegreeBuckets(
      rows(4).toDF("src", "deg", "nbr_deg")).collect()
    assert(ok.length == 1)
    assert(ok.head.getAs[Long]("bucket") == 2L) // bin(5)="101"
    assert(ok.head.getAs[Long]("n_nodes") == 4L)
    assert(ok.head.getAs[Long]("n_endpoints") == 4L)
    assert(ok.head.getAs[Long]("nbr_deg_mass") ==
      9_200_000_000_000_000_000L)
    assert(math.abs(ok.head.getAs[Double]("avg_nbr_deg") /
      2.3e18 - 1.0) < 1e-12)
    intercept[Exception] {
      Graph.avgNeighborDegreeBuckets(
        rows(5).toDF("src", "deg", "nbr_deg")).collect()
    }
  }

  test("q149 elasticity moments are exact near the documented bound " +
      "and fail loud past it") {
    // value-domain bound: Σxy grows with rows, documented long-safe
    // to ~sf 30M. Near-bound exactness: products ≈ 4.4e18 summing to
    // 8.4e18 (under 2^63) must assemble the exact slope; one more
    // magnitude step and the ANSI sum throws instead of wrapping.
    val t = Seq((1L, 2_100_000_000L, 2_000_000_000L),
      (1L, 2_000_000_000L, 2_150_000_000L))
      .toDF("segment", "x", "y")
    val out = Frontier.elasticitySlopes(t).collect().head
    val (bx, by) = (Seq(BigInt(2100000000L), BigInt(2000000000L)),
      Seq(BigInt(2000000000L), BigInt(2150000000L)))
    val n = BigInt(2)
    val (sx, sy) = (bx.sum, by.sum)
    val sxy = bx.zip(by).map { case (a, b) => a * b }.sum
    val sxx = bx.map(a => a * a).sum
    assert((sxx + sxy) > BigInt(Long.MaxValue) / 2,
      "case must sit near the long bound")
    val exp = (n * sxy - sx * sy).toDouble /
      (n * sxx - sx * sx).toDouble
    assert(out.getAs[Long]("n") == 2L)
    assert(math.abs(out.getAs[Double]("slope_centi_units_per_pct") -
      math.rint(exp * 1000000) / 1000000) < 2e-6)
    intercept[Exception] {
      Frontier.elasticitySlopes(
        Seq((1L, 2_200_000_000L, 2_200_000_000L),
          (1L, 2_200_000_000L, 2_200_000_000L))
          .toDF("segment", "x", "y")).collect()
    }
  }

  test("q173 ols influence survives daily sums past the long-square " +
      "ceiling") {
    // 10 grid days with cents ≈ 9e9: svv ≈ 8.1e19·10 and the (Σuv)²
    // SSE term would ANSI-throw in longs; the decimal(38,0) moments
    // must reproduce the BigInt reference exactly
    val base = java.sql.Timestamp.valueOf("2024-01-01 12:00:00")
    def ts(day: Int) = new java.sql.Timestamp(
      base.getTime + day * 86400000L)
    // linear-plus-spike: day 7 is the influential point the screen
    // must flag
    val xs = (0 until 10).map(i =>
      9.0e7 + i * 50000 + (if (i == 7) 4.0e7 else 0.0))
    val events = (0 until 10).map(i => ("alpha", xs(i), ts(i)))
      .toDF("event_type", "value", "ts")
    val rows = Frontier4.olsInfluence(events).collect()
    val n = 10
    val v = xs.map(x => BigInt(math.round(x * 100)))
    val u = (0 until n).map(t => BigInt(2 * t - (n - 1)))
    val su2 = u.map(x => x * x).sum
    val suv = u.zip(v).map { case (a, b) => a * b }.sum
    val sv = v.sum
    val svv = v.map(x => x * x).sum
    val sseSc = BigInt(n) * su2 * svv - sv * sv * su2 -
      BigInt(n) * suv * suv
    val nsu2 = (BigInt(n) * su2).toDouble
    val s2 = sseSc.toDouble / nsu2 / (n - 2).toDouble
    val expected = (0 until n).flatMap { t =>
      val esc = v(t) * n * su2 - sv * su2 - BigInt(n) * suv * u(t)
      val e = esc.toDouble / nsu2
      val h = 1.0 / n + (u(t) * u(t)).toDouble / su2.toDouble
      val cd = e * e * h / (2.0 * s2 * (1.0 - h) * (1.0 - h))
      if (cd > 4.0 / n) Some((t, e, cd)) else None
    }
    assert(expected.exists(_._1 == 7), "the spike day is flagged")
    assert(rows.length == expected.length)
    rows.zip(expected).foreach { case (r, (_, e, cd)) =>
      assert(math.abs(r.getAs[Double]("residual") - e) <
        math.abs(e) * 1e-9 + 1e-4, "residual exact")
      assert(math.abs(r.getAs[Double]("cook_d") - cd) <
        math.abs(cd) * 1e-9 + 1e-6, "cook_d exact")
    }
  }

  test("decimal-width momentStats stays exact beyond the long bound") {
    val row = Relational.momentStats(events).collect().head
    // replicate the moments exactly with BigInt
    val cs = vals.map(v => BigInt(math.round(v * 100)))
    val ks = vals.indices.map(i => BigInt(i % 5))
    val n = BigInt(cs.size)
    val (s1, s2) = (cs.sum, cs.map(c => c * c).sum)
    val (sk, skk) = (ks.sum, ks.map(k => k * k).sum)
    val svk = cs.zip(ks).map { case (c, k) => c * k }.sum
    val varNum = (n * s2 - s1 * s1).toDouble
    val kVarNum = (n * skk - sk * sk).toDouble
    val mean = s1.toDouble / (n.toDouble * 100.0)
    val variance = varNum / (n.toDouble * (n.toDouble - 1)) / 10000.0
    val corr = (n * svk - s1 * sk).toDouble /
      (math.sqrt(varNum) * math.sqrt(kVarNum))
    assert(row.getAs[Long]("n") == 10L)
    assert(math.abs(row.getAs[Double]("mean_value") - mean) < 0.01)
    assert(math.abs(row.getAs[Double]("var_value") - variance) <
      math.abs(variance) * 1e-9 + 0.01)
    assert(math.abs(row.getAs[Double]("sd_value") - math.sqrt(variance)) <
      math.sqrt(variance) * 1e-9 + 0.01)
    assert(math.abs(row.getAs[Double]("corr_vk") - corr) < 0.01)
  }

  test("q174 jarque-bera fourth powers survive past the long ceiling") {
    // daily deviations ~9e7 cents: c⁴ ≈ 6.6e31 >> Long.MaxValue
    // (9.2e18) — the long-width pipeline would ANSI-throw on a single
    // day's fourth power; the decimal(38,0) moments must yield the
    // exact BigInt-replayed JB
    val base = java.sql.Timestamp.valueOf("2024-01-01 12:00:00")
    def ts(day: Int) = new java.sql.Timestamp(
      base.getTime + day * 86400000L)
    // asymmetric series → nonzero skew, finite kurtosis
    val vs = Seq(1.0e6, 2.0e6, 1.5e6, 9.0e5, 4.0e6, 1.2e6, 8.0e5,
      2.5e6)
    val events = vs.zipWithIndex.map { case (v, i) =>
      ("heavy", v, ts(i))
    }.toDF("event_type", "value", "ts")
    val row = Frontier4.jarqueBera(events).collect().head
    val cents = vs.map(v => math.round(v * 100))
    val n = cents.length
    val piv = math.round(cents.map(BigInt(_)).sum.toDouble / n.toDouble)
    val cs = cents.map(c => BigInt(c - piv))
    val nd = n.toDouble
    val m1 = cs.sum.toDouble / nd
    val r2 = cs.map(c => c * c).sum.toDouble / nd
    val r3 = cs.map(c => c * c * c).sum.toDouble / nd
    val r4 = cs.map(c => c * c * c * c).sum.toDouble / nd
    val m2 = r2 - m1 * m1
    val m3 = r3 - 3.0 * m1 * r2 + 2.0 * m1 * m1 * m1
    val m4 = r4 - 4.0 * m1 * r3 + 6.0 * m1 * m1 * r2 -
      3.0 * m1 * m1 * m1 * m1
    val skew = m3 / (math.sqrt(m2) * m2)
    val exk = m4 / (m2 * m2) - 3.0
    val jb = nd / 6.0 * (skew * skew + exk * exk / 4.0)
    assert(row.getAs[Long]("n_days") == n.toLong)
    assert(math.abs(row.getAs[Double]("skewness") - skew) < 1e-4,
      s"skew ${row.getAs[Double]("skewness")} vs $skew")
    assert(math.abs(row.getAs[Double]("ex_kurtosis") - exk) < 1e-4)
    assert(math.abs(row.getAs[Double]("jb_stat") - jb) < 1e-3)
    // sanity: c⁴ really is past the long ceiling at this magnitude
    assert(cs.map(c => c * c * c * c).max > BigInt(Long.MaxValue))
  }
}
