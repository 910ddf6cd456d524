package graft.functions

import graft.{GraftFunctions, SparkSpec}
import graft.functions.VectorFunctions._
import org.apache.spark.sql.functions._

class VectorExpressionsSpec extends SparkSpec {
  import spark.implicits._

  private def vecs = Seq(
    (1L, Array(1.0f, 0.0f, 0.0f), Array(1.0f, 0.0f, 0.0f)),
    (2L, Array(1.0f, 0.0f, 0.0f), Array(0.0f, 1.0f, 0.0f)),
    (3L, Array(1.0f, 2.0f, 2.0f), Array(2.0f, 4.0f, 4.0f)),
    (4L, Array(0.0f, 0.0f, 0.0f), Array(1.0f, 1.0f, 1.0f)))
    .toDF("id", "a", "b")

  test("cosine: identical=1, orthogonal=0, scaled=1, zero-norm=null") {
    val out = vecs.select($"id", cosine_similarity($"a", $"b").as("c"))
      .collect().map(r => r.getLong(0) ->
        (if (r.isNullAt(1)) None else Some(r.getDouble(1)))).toMap
    assert(math.abs(out(1L).get - 1.0) < 1e-15)
    assert(out(2L).get == 0.0)
    assert(math.abs(out(3L).get - 1.0) < 1e-15)
    assert(out(4L).isEmpty) // zero vector → null, not NaN
  }

  test("matches the interpreted HOF formulation bit-exactly") {
    // id=4 (zero vector) excluded: under ANSI mode the HOF division
    // throws DIVIDE_BY_ZERO where the native expression yields null —
    // the native behavior is the robust one
    val nonZero = vecs.filter($"id" =!= 4L)
    val hof = nonZero.select(
      (aggregate(zip_with($"a", $"b", (x, y) =>
        x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v) /
        (sqrt(aggregate(zip_with($"a", $"a", (x, y) =>
          x.cast("double") * y.cast("double")), lit(0.0), (acc, v) => acc + v)) *
          sqrt(aggregate(zip_with($"b", $"b", (x, y) =>
            x.cast("double") * y.cast("double")), lit(0.0),
            (acc, v) => acc + v)))).as("c"))
      .as[Double].collect()
    val native = nonZero.select(cosine_similarity($"a", $"b").as("c"))
      .filter($"c".isNotNull).as[Double].collect()
    assert(hof.toSeq == native.toSeq) // exact double equality
  }

  test("dot_product on double arrays") {
    val out = Seq((Array(1.0, 2.0), Array(3.0, 4.0)))
      .toDF("a", "b")
      .select(dot_product($"a", $"b")).as[Double].head()
    assert(out == 11.0)
  }

  test("SQL registration: cosine_similarity callable from spark.sql") {
    GraftFunctions.register(spark)
    vecs.createOrReplaceTempView("vecs_v")
    val out = spark.sql(
      "SELECT id, cosine_similarity(a, b) AS c FROM vecs_v WHERE id = 3")
      .as[(Long, Double)].head()
    assert(math.abs(out._2 - 1.0) < 1e-15)
  }

  test("rolling hash: golden values, order sensitivity, codegen=interp") {
    import graft.functions.RollingHash.rolling_hash
    // golden value computed by the definition: fold(h*31+byte) mod 1e9+7
    def ref(s: String): Long =
      s.getBytes("UTF-8").foldLeft(0L)((h, b) => (h * 31 + (b & 0xFF)) % 1000000007L)
    val rows = Seq("", "a", "ab", "ba", "the quick brown fox")
      .toDF("s").select($"s", rolling_hash($"s").as("h"))
      .as[(String, Long)].collect().toMap
    assert(rows("") == 0L)
    assert(rows("a") == ref("a") && rows("ab") == ref("ab"))
    assert(rows("ab") != rows("ba")) // order-sensitive
    assert(rows("the quick brown fox") == ref("the quick brown fox"))
  }

  test("type check rejects non-array inputs") {
    val err = intercept[Exception] {
      vecs.select(cosine_similarity($"id", $"a")).collect()
    }
    assert(err.getMessage.contains("cosine_similarity") ||
      err.getMessage.toLowerCase.contains("data type"))
  }
}
