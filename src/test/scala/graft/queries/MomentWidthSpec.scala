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
}
