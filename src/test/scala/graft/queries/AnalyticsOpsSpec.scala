package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral guards for the time-series / histogram / anomaly /
  * keyword / inverted-index operators. The DuckDB gate proves
  * cross-engine equality; these pin the semantics — the resample grid
  * is complete and count-preserving, histogram buckets partition the
  * rows, flagged anomalies really are 3-sigma outliers, keyword ranks
  * are monotone under the (tf, df) order, posting lists are capped and
  * sorted.
  */
class AnalyticsOpsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("incremental agg merge == direct recompute, avg is exact div") {
    val merged = graft.SparkEntry.queries("q64_incremental_agg")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val direct = graft.Tables.load(spark, sf, "orders")
      .select($"o_custkey",
        datediff(to_date($"o_orderdate"), lit("1992-01-01"))
          .cast("long").as("od"),
        round($"o_totalprice" * 100).cast("long").as("cents"))
      .groupBy($"o_custkey")
      .agg(count(lit(1)).as("n"), sum($"cents").as("c"),
        min($"od").as("lo"), max($"od").as("hi"))
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(merged.length == direct.size)
    merged.foreach { case (ck, n, c, lo, hi, avg) =>
      val (_, dn, dc, dlo, dhi) = direct(ck)
      assert(n == dn && c == dc && lo == dlo && hi == dhi,
        s"cust $ck: merged partials diverge from recompute")
      assert(avg == c / n)
    }
  }

  test("resample grid is dense per type and preserves total event count") {
    val out = graft.SparkEntry.queries("q31_resample")(spark, sf)
      .select($"event_type", $"hour".cast("long").as("h"), $"n")
      .as[(String, Long, Long)].collect()
    val events = graft.Tables.load(spark, sf, "events")
    val types = events.select($"event_type").distinct().count()
    val hours = out.map(_._2).distinct.sorted
    // every type has one row per hour in [min, max], step = 3600 s
    assert(out.length == types * hours.length)
    assert(hours.zip(hours.tail).forall { case (a, b) => b - a == 3600 },
      "hour grid has a gap — sequence() fill failed")
    assert(out.map(_._3).sum == events.count(),
      "gap fill must add zero rows, not move counts")
    assert(out.exists(_._3 == 0L),
      "fixture has empty buckets; none surfaced — fill not exercised")
  }

  test("histogram buckets partition the orders rows with consistent bounds") {
    val out = graft.SparkEntry.queries("q32_histogram")(spark, sf)
      .as[(Long, Double, Double, Long)].collect()
    val orders = graft.Tables.load(spark, sf, "orders")
    assert(out.map(_._4).sum == orders.count())
    out.foreach { case (b, lo, hi, _) =>
      assert(hi - lo == 25000.0, s"bucket $b width ${hi - lo}")
      assert(lo == b * 25000.0)
    }
    // buckets strictly increasing, no duplicates
    val ids = out.map(_._1)
    assert(ids.sameElements(ids.distinct.sorted))
  }

  test("anomaly flags match a double-precision 3-sigma recomputation") {
    val flagged = graft.SparkEntry.queries("q33_log_anomaly")(spark, sf)
      .select($"event_id", $"side").as[(Long, String)].collect().toMap
    val stats = graft.Tables.load(spark, sf, "events")
      .groupBy($"event_type")
      .agg(avg($"value").as("mu"), stddev($"value").as("sd"))
      .as[(String, Double, Double)].collect()
      .map(r => r._1 -> (r._2, r._3)).toMap
    val ev = graft.Tables.load(spark, sf, "events")
      .select($"event_id", $"event_type", $"value")
      .as[(Long, String, Double)].collect()
    ev.foreach { case (id, tpe, v) =>
      val (mu, sd) = stats(tpe)
      val z = (v - mu) / sd
      // the integer test is exact on cents; the double recomputation
      // sits on raw values, so leave an epsilon band at the boundary
      if (math.abs(z) > 3.001)
        assert(flagged.contains(id), s"|z|=$z event $id not flagged")
      if (math.abs(z) < 2.999)
        assert(!flagged.contains(id), s"|z|=$z event $id wrongly flagged")
      flagged.get(id).foreach { side =>
        assert(side == (if (v > mu) "high" else "low"))
      }
    }
    assert(flagged.nonEmpty, "fixture has 3-sigma outliers; none flagged")
  }

  test("keyword ranks are monotone under (tf desc, df asc, token) per doc") {
    val out = graft.SparkEntry.queries("text_keywords")(spark, sf)
      .as[(Long, Long, String, Long, Long)].collect()
    out.groupBy(_._1).foreach { case (doc, rows) =>
      val sorted = rows.sortBy(_._2)
      assert(sorted.map(_._2).sameElements(1L to sorted.length),
        s"doc $doc ranks not contiguous from 1")
      sorted.zip(sorted.tail).foreach { case (a, b) =>
        val ord = a._4 > b._4 ||
          (a._4 == b._4 && (a._5 < b._5 ||
            (a._5 == b._5 && a._3 < b._3)))
        assert(ord, s"doc $doc: rank ${a._2} does not dominate ${b._2}")
      }
    }
  }

  test("lateral top-2 equals the hand-written window formulation") {
    import org.apache.spark.sql.expressions.Window
    val lat = graft.SparkEntry.queries("q35_lateral")(spark, sf)
      .select($"c_custkey", $"o_orderkey")
      .as[(Long, Long)].collect().toSeq
    val w = Window.partitionBy($"o_custkey")
      .orderBy(desc("o_totalprice"), $"o_orderkey")
    val cust = graft.Tables.load(spark, sf, "customer")
      .select($"c_custkey")
    val win = graft.Tables.load(spark, sf, "orders")
      .withColumn("rn", row_number().over(w))
      .filter($"rn" <= 2)
      .join(cust, $"o_custkey" === $"c_custkey")
      .select($"c_custkey", $"o_orderkey")
      .as[(Long, Long)].collect().toSeq
    assert(lat.toSet == win.toSet,
      "LATERAL decorrelation changed the top-2 semantics")
    assert(lat.nonEmpty)
  }

  test("funnel stages are monotone: stage k implies all earlier timestamps") {
    val out = graft.SparkEntry.queries("q36_funnel")(spark, sf)
      .collect()
    assert(out.nonEmpty)
    var converted = 0
    out.foreach { r =>
      val stage = r.getLong(4)
      val v = Option(r.getTimestamp(1))
      val c = Option(r.getTimestamp(2))
      val p = Option(r.getTimestamp(3))
      assert((stage >= 1) == v.isDefined)
      assert((stage >= 2) == c.isDefined)
      assert((stage >= 3) == p.isDefined)
      if (stage >= 2) assert(!c.get.before(v.get), "click precedes view")
      if (stage >= 3) { assert(!p.get.before(c.get)); converted += 1 }
    }
    assert(converted > 0, "fixture has full conversions; none found")
  }

  test("inverted index: df floor holds, postings capped at 20 and sorted") {
    val out = graft.SparkEntry.queries("text_inverted_index")(spark, sf)
      .as[(String, Long, String)].collect()
    assert(out.nonEmpty)
    out.foreach { case (tok, df, postings) =>
      assert(df >= 10, s"$tok df=$df below floor")
      val ids = postings.split(",").map(_.toLong)
      assert(ids.length == math.min(df, 20L).toInt,
        s"$tok postings length ${ids.length} vs df $df")
      assert(ids.sameElements(ids.sorted), s"$tok postings unsorted")
      assert(ids.distinct.length == ids.length, s"$tok duplicate postings")
    }
    // the cap binds for at least one stopword-like token
    assert(out.exists(r => r._2 > 20),
      "fixture has tokens in >20 docs; cap never exercised")
  }
}
