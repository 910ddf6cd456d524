package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Unit guards for the round-6 native expressions: PqEncode (product-
  * quantization encoder) and BloomMightContain. Queries exercise the
  * codegen path; these pin the semantics and the interpreted/codegen
  * parity a HOF-lambda context relies on.
  */
class PqBloomExpressionsSpec extends SparkSpec {
  import spark.implicits._

  // 2 subspaces × 2 cells × 2 dims: cell 0 near the origin-axis,
  // cell 1 far — argmin is obvious by construction
  private val cb: Seq[Seq[Seq[Double]]] = Seq(
    Seq(Seq(1.0, 0.0), Seq(10.0, 10.0)),
    Seq(Seq(0.0, 1.0), Seq(-5.0, -5.0)))

  test("pq_encode picks the L2-nearest cell per subspace, float and double inputs") {
    val rows = Seq(
      (1L, Array(1.1f, 0.1f, 0.2f, 0.9f)), // near cell 0 in both
      (2L, Array(9.0f, 9.5f, -4.0f, -5.5f))) // near cell 1 in both
      .toDF("id", "emb")
    val out = rows.select($"id",
      PqFunctions.pq_encode($"emb", cb).as("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(out(1L) == Seq(0, 0))
    assert(out(2L) == Seq(1, 1))
    val outD = rows
      .select($"id", $"emb".cast("array<double>").as("emb"))
      .select($"id", PqFunctions.pq_encode($"emb", cb).as("codes"))
      .as[(Long, Seq[Int])].collect().toMap
    assert(outD == out, "float and double inputs must encode identically")
  }

  test("pq_encode ties break to the lowest cell") {
    val tieCb: Seq[Seq[Seq[Double]]] =
      Seq(Seq(Seq(1.0, 0.0), Seq(-1.0, 0.0)))
    // equidistant from both cells in L2
    val out = Seq((1L, Array(0.0f, 5.0f))).toDF("id", "emb")
      .select(PqFunctions.pq_encode($"emb", tieCb))
      .as[Seq[Int]].head()
    assert(out == Seq(0))
  }

  test("bloom_might_contain: no false negatives, probes work inside HOF lambdas") {
    val members = (1L to 500L).map(_ * 7L)
    val bloom = members.toDF("v").stat.bloomFilter("v", 1000L, 0.01)
    // direct column probe: every member must hit (no false negatives)
    val misses = members.toDF("v")
      .filter(!BloomFunctions.bloom_might_contain($"v", bloom))
      .count()
    assert(misses == 0, "bloom returned a false negative")
    // inside a higher-order filter (the decontamination shape) — the
    // interpreted eval path must agree with the codegen path above
    val flagged = Seq((1L, Seq(7L, 11L, 14L))).toDF("id", "xs")
      .select(size(filter($"xs",
        x => BloomFunctions.bloom_might_contain(x, bloom))).as("n"))
      .as[Int].head()
    assert(flagged >= 2, s"members 7 and 14 must hit, got $flagged")
    // false-positive rate on non-members stays near the trained fpp
    val nonMembers = (1L to 2000L).map(_ * 7L + 3L)
    val fp = nonMembers.toDF("v")
      .filter(BloomFunctions.bloom_might_contain($"v", bloom))
      .count()
    assert(fp <= 100, s"fp rate implausibly high: $fp of 2000")
  }
}
