package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.functions._

/** Error-bound checks for the sketch aggregates, driven against the
  * raw sketch frame (Relational.approxAggRaw — the production shape).
  * The registered q29_approx_agg row hashes the same contract at the
  * driver gate via exact companions + bound booleans (r15 #3); these
  * tests keep the numeric bounds pinned locally and independently.
  */
class ApproxAggSpec extends SparkSpec {
  import spark.implicits._

  test("q29's registered contract row reports every bound satisfied") {
    val rows = SparkEntry.queries("q29_approx_agg")(spark, sf).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      Seq("users_ok", "users_1pct_ok", "p50_rank_ok", "p95_rank_ok")
        .foreach { c =>
          assert(r.getAs[Boolean](c),
            s"${r.getAs[String]("event_type")}: $c must hold")
        }
    }
  }

  private val sf = "/root/testdata/sf0.01"

  test("CMS never undercounts; overcount bounded by eps * stream size") {
    val est = SparkEntry.queries("q67_cms_freq")(spark, sf)
      .as[(String, Long)].collect().toMap
    val ev = graft.Tables.load(spark, sf, "events")
    val exact = ev.groupBy($"event_type").count()
      .as[(String, Long)].collect().toMap
    val total = exact.values.sum
    assert(est.keySet == exact.keySet)
    exact.foreach { case (t, n) =>
      assert(est(t) >= n, s"CMS must never undercount ($t)")
      assert(est(t) <= n + (0.001 * total).ceil.toLong,
        s"CMS overcount above eps*N for $t: ${est(t)} vs $n")
    }
  }

  test("HLL distinct counts are within the configured relative error") {
    val approx = Relational.approxAggRaw(spark, sf)
      .select($"event_type", $"approx_users", $"approx_users_1pct")
      .as[(String, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val exact = graft.Tables.load(spark, sf, "events")
      .groupBy($"event_type")
      .agg(countDistinct($"user_id").as("u"))
      .as[(String, Long)].collect().toMap
    exact.foreach { case (et, ex) =>
      val (a, a1) = approx(et)
      // default rsd 5%: allow 3 standard errors; 1% rsd must be tighter
      assert(math.abs(a - ex).toDouble / ex <= 0.15,
        s"$et: default-rsd HLL $a vs exact $ex")
      assert(math.abs(a1 - ex).toDouble / ex <= 0.03,
        s"$et: 1%-rsd HLL $a1 vs exact $ex")
    }
  }

  test("approx percentiles land within the positional accuracy bound") {
    val approx = Relational.approxAggRaw(spark, sf)
      .select($"event_type", $"p50", $"p95")
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val exact = graft.Tables.load(spark, sf, "events")
      .groupBy($"event_type")
      .agg(expr("percentile(value, 0.5)").as("p50"),
        expr("percentile(value, 0.95)").as("p95"),
        count(lit(1)).as("n"))
      .as[(String, Double, Double, Long)].collect()
    exact.foreach { case (et, e50, e95, n) =>
      val (a50, a95) = approx(et)
      // accuracy 10000 → positional error ≤ n/10000 ranks; translate
      // to a value tolerance via a generous relative band (values are
      // roughly uniform in this table)
      assert(math.abs(a50 - e50) / math.max(e50, 1.0) <= 0.05,
        s"$et: p50 $a50 vs exact $e50 (n=$n)")
      assert(math.abs(a95 - e95) / math.max(e95, 1.0) <= 0.05,
        s"$et: p95 $a95 vs exact $e95 (n=$n)")
    }
  }
}
