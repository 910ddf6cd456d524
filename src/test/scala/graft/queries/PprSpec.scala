package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral guards for q213_ppr beyond the unrolled-CTE hash match:
  * a full driver-side replay of the integer iteration (same
  * truncation sequence), plus the personalization property global
  * PageRank cannot have — teleport mass flows only from the seed
  * cohort, so every positive rank is seed-reachable within the round
  * horizon and every seed is positive.
  */
class PprSpec extends SparkSpec {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("ppr: matches a driver-side integer replay; seeds carry mass") {
    val Scale = 1000000000000L
    val li = graft.Tables.load(spark, sf, "lineitem")
      .selectExpr("l_orderkey as ok", "l_suppkey as sk")
      .as[(Long, Long)].collect()
    val ord = graft.Tables.load(spark, sf, "orders")
      .selectExpr("o_orderkey as ok", "o_custkey as ck")
      .as[(Long, Long)].collect().toMap
    val base = li.flatMap { case (ok, sk) =>
      ord.get(ok).map(ck => (ck * 2, sk * 2 + 1))
    }
    val edges = base.flatMap { case (s0, d0) => Seq((s0, d0), (d0, s0)) }
    val deg = edges.groupBy(_._1).view.mapValues(_.length.toLong).toMap
    val seedCust = graft.Tables.load(spark, sf, "customer")
      .filter($"c_nationkey" === 0).select($"c_custkey")
      .as[Long].collect().map(_ * 2).toSet
    val seeds = deg.keySet & seedCust
    val ns = seeds.size.toLong
    val bias = deg.keySet.map(n =>
      n -> (if (seeds(n)) (15L * Scale) / (100L * ns) else 0L)).toMap
    var r = deg.keySet.map(n =>
      n -> (if (seeds(n)) Scale / ns else 0L)).toMap
    for (_ <- 1 to 5) {
      val got = new scala.collection.mutable.HashMap[Long, Long]()
        .withDefaultValue(0L)
      edges.foreach { case (s0, d0) =>
        got(d0) += r(s0) / deg(s0)
      }
      r = deg.keySet.map(n =>
        n -> (bias(n) + 85L * got(n) / 100L)).toMap
    }
    def name(n: Long): String =
      if (n % 2 == 0) s"c${n / 2}" else s"s${(n - 1) / 2}"
    val want = r.toSeq.map { case (n, v) => (name(n), v) }
      .sortBy { case (nm, v) => (-v, nm) }.take(100)
    val got = graft.SparkEntry.queries("q213_ppr")(spark, sf)
      .as[(String, Long)].collect().toSeq
    assert(got == want, s"first diff: ${
      got.zip(want).find { case (a, b) => a != b }}")
    // personalization properties
    assert(ns > 0, "fixture has no nation-0 customers — vacuous")
    seeds.foreach(n => assert(r(n) > 0L, s"seed $n lost its mass"))
    spark.catalog.clearCache()
  }

  test("tail dependence: joint exceedance over marginal exceedance") {
    val daily = graft.Tables.load(spark, sf, "events")
      .select(to_date($"ts").cast("string").as("day"),
        round($"value" * 100).cast("long").as("cents"))
      .as[(String, Long)].collect()
      .groupBy(_._1).map { case (_, rs) =>
        (rs.map(_._2).sum, rs.length.toLong)
      }.toArray
    def pct(sorted: Array[Long], q: Double): Double = {
      val h = (sorted.length - 1).toDouble * q
      val lo = math.floor(h).toInt
      val hi = math.ceil(h).toInt
      sorted(lo) + (h - lo) * (sorted(hi) - sorted(lo)).toDouble
    }
    val qy = pct(daily.map(_._1).sorted, 0.9)
    val qv = pct(daily.map(_._2).sorted, 0.9)
    val nTailY = daily.count(_._1.toDouble > qy).toLong
    val nTailV = daily.count(_._2.toDouble > qv).toLong
    val nJoint = daily.count(d =>
      d._1.toDouble > qy && d._2.toDouble > qv).toLong
    val got = Frontier8.queries("q214_tail_dependence")(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect().head
    assert(got._1 == daily.length.toLong)
    assert(got._2 == nTailY && got._3 == nTailV && got._4 == nJoint)
    // the query rounds lambda_u to 4 decimals for display
    assert(math.abs(got._5 - nJoint.toDouble / nTailY.toDouble) < 5e-5)
    assert(got._5 >= 0.0 && got._5 <= 1.0)
  }
}
