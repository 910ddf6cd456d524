package graft.functions

import graft.{GraftFunctions, SparkSpec}
import graft.functions.SpaceSavingAgg.space_saving
import org.apache.spark.sql.functions._

/** Pins the SpaceSaving invariants the gate can't see (the gate query
  * runs the sketch in its exact regime, capacity >= vocabulary):
  * overestimate + tracked-error bounds under eviction pressure, heavy
  * items surviving a capacity squeeze, exactness without evictions,
  * and merge correctness under Spark's real partial aggregation
  * (multi-partition input exercises update+merge, not update alone).
  */
class SpaceSavingSpec extends SparkSpec {
  import spark.implicits._

  /** Zipf-ish stream: item k occurs ~N/k times — heavy head, long
    * tail; shuffled deterministically so partitions interleave items.
    */
  private def zipf(n: Int): Seq[String] = {
    val s = (1 to 40).flatMap(k => Seq.fill(n / k)(s"item$k"))
    new scala.util.Random(7).shuffle(s)
  }

  test("exact when capacity >= distinct items (no evictions)") {
    val data = zipf(400)
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    val out = data.toDF("x").repartition(8)
      .agg(space_saving($"x", 64).as("hh"))
      .select(explode($"hh").as("e"))
      .select($"e.item", $"e.est", $"e.err")
      .as[(String, Long, Long)].collect()
    assert(out.length == truth.size)
    out.foreach { case (item, est, err) =>
      assert(est == truth(item), s"$item: est $est != true ${truth(item)}")
      assert(err == 0L)
    }
  }

  test("overestimate + error bounds hold under eviction pressure") {
    val data = zipf(2000)
    val truth = data.groupBy(identity).view.mapValues(_.size.toLong).toMap
    // capacity 16 << 40 distinct items forces constant eviction,
    // across 8 partitions so merge offsets kick in too
    val out = data.toDF("x").repartition(8)
      .agg(space_saving($"x", 16).as("hh"))
      .select(explode($"hh").as("e"))
      .select($"e.item", $"e.est", $"e.err")
      .as[(String, Long, Long)].collect()
    assert(out.length == 16)
    out.foreach { case (item, est, err) =>
      val t = truth(item)
      assert(est >= t, s"$item: est $est under-counts true $t")
      assert(est - err <= t, s"$item: est-err ${est - err} exceeds true $t")
    }
    // the top-3 true heavy hitters dominate (> N/16 each) — SpaceSaving
    // guarantees they cannot be displaced
    val reported = out.map(_._1).toSet
    (1 to 3).foreach(k => assert(reported.contains(s"item$k"),
      s"true heavy hitter item$k was displaced"))
  }

  test("single-partition and multi-partition estimates agree in the exact regime") {
    val data = zipf(600)
    def run(parts: Int) = data.toDF("x").repartition(parts)
      .agg(space_saving($"x", 64).as("hh"))
      .select(explode($"hh").as("e"))
      .select($"e.item", $"e.est").as[(String, Long)].collect().sorted.toSeq
    assert(run(1) == run(8), "merge must not change exact-regime results")
  }

  test("non-string item column is rejected at analysis, not at runtime") {
    val ex = intercept[Exception] {
      Seq(1L, 2L).toDF("x").agg(space_saving($"x", 8)).collect()
    }
    assert(ex.getMessage.contains("string"),
      s"expected an analysis-time type error, got: ${ex.getMessage.take(200)}")
  }

  test("SQL builders reject wrong arity instead of dropping arguments") {
    GraftFunctions.register(spark)
    val ex = intercept[Exception] {
      spark.sql("SELECT nfc_normalize('a', 'b')").collect()
    }
    assert(ex.getMessage.contains("exactly one"),
      s"got: ${ex.getMessage.take(200)}")
  }

  test("registered for the SQL surface with a capacity literal") {
    GraftFunctions.register(spark)
    Seq("a", "a", "b").toDF("x").createOrReplaceTempView("ss_in")
    val out = spark.sql(
      "SELECT space_saving(x, 8) AS hh FROM ss_in")
      .select(explode(col("hh")).as("e"))
      .select(col("e.item"), col("e.est")).as[(String, Long)].collect()
    assert(out.toSet == Set(("a", 2L), ("b", 1L)))
  }

  test("text_heavy_hitters fails LOUDLY when capacity <= vocabulary") {
    // r16 verdict item #5: an sf whose vocabulary reaches the sketch
    // capacity must fail with the sizing rule, not surface later as a
    // spurious hash mismatch against the exact GROUP-BY oracle.
    // Squeeze capacity below sf0.001's vocab via the sysprop to stand
    // in for the sf100 regime.
    val sf = "/root/testdata/sf0.001"
    sys.props("graft.ss.capacity") = "8"
    try {
      val ex = intercept[IllegalArgumentException] {
        graft.SparkEntry.queries("text_heavy_hitters")(spark, sf).collect()
      }
      assert(ex.getMessage.contains("capacity"),
        s"got: ${ex.getMessage.take(200)}")
      assert(ex.getMessage.contains("graft.ss.capacity"),
        "the failure must name the sizing knob")
    } finally sys.props.remove("graft.ss.capacity")
    // and at the default capacity the gate passes — the exact regime
    val ok = graft.SparkEntry.queries("text_heavy_hitters")(spark, sf)
    assert(ok.collect().nonEmpty)
  }
}
