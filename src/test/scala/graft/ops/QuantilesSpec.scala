package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** ops.Quantiles must reproduce (a) the sorted-multiset definition of
  * the discrete quantile, (b) SQL ntile()'s exact fill rule — the two
  * contracts that let window-free plans hash-match engines running
  * the classical window forms.
  */
class QuantilesSpec extends SparkSpec {
  import spark.implicits._

  private def mk(n: Int) =
    (1 to n).map(i =>
        (s"g${i % 3}", i.toLong, ((i * 2654435761L) % 500).toLong))
      .toDF("g", "id", "v")

  test("exactByGroup matches the sorted-array order statistics") {
    val df = mk(4000)
    val got = Quantiles.exactByGroup(df, "g", $"v",
        Seq("p05" -> 0.05, "p50" -> 0.5, "p95" -> 0.95))
      .as[(String, Long, Long, Long, Long)].collect()
    val byG = df.as[(String, Long, Long)].collect().groupBy(_._1)
    assert(got.length == byG.size)
    got.foreach { case (g, n, p05, p50, p95) =>
      val xs = byG(g).map(_._3).sorted
      assert(n == xs.length)
      def q(p: Double) = xs(math.floor(p * (xs.length - 1)).toInt)
      assert(p05 == q(0.05) && p50 == q(0.5) && p95 == q(0.95))
    }
    spark.catalog.clearCache()
  }

  test("exactByGroupCounts over a pre-built count table == exactByGroup") {
    // the r19 q161 path: callers that already rolled rows up to the
    // (group, value, count) domain must get the identical quantiles
    val df = mk(4000)
    val ps = Seq("p05" -> 0.05, "p50" -> 0.5, "p90" -> 0.9)
    val want = Quantiles.exactByGroup(df, "g", $"v", ps)
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1)
    val vc = df.groupBy($"g", $"v".as("__qv"))
      .agg(count(lit(1)).as("__qc"))
    val got = Quantiles.exactByGroupCounts(vc, "g", ps)
      .as[(String, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq == want.toSeq)
    spark.catalog.clearCache()
  }

  test("ntileFromRank replays ntile()'s fill rule at awkward n") {
    // n chosen to exercise n % k != 0, n < k, and n == k
    for (n <- Seq(3, 5, 8, 97, 1000); k <- Seq(5, 8)) {
      val df = (1 to n).map(_.toLong).toDF("x")
      val w = Window.orderBy($"x")
      val want = df.withColumn("t", ntile(k).over(w).cast("long"))
        .withColumn("rn", row_number().over(w).cast("long"))
        .withColumn("n_rows", lit(n.toLong))
      val bad = want
        .withColumn("t2", Quantiles.ntileFromRank("rn", "n_rows", k))
        .filter($"t" =!= $"t2").count()
      assert(bad == 0, s"n=$n k=$k")
    }
  }
}
