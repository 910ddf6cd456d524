package graft.ops

import graft.SparkSpec
import org.apache.spark.SparkException
import org.apache.spark.sql.functions._

class ErrorModesSpec extends SparkSpec {
  import spark.implicits._

  private def df = Seq(
    """{"k": 1}""", """{"k": 2}""", """not json""").toDF("value")

  test("E1 DROPMALFORMED: bad records vanish, stream continues") {
    val out = df.select(
      ErrorModes.parseDropMalformed($"value", "k double").as("p"))
      .select($"p.k").na.drop()
      .as[Double].collect().sorted.toSeq
    assert(out == Seq(1.0, 2.0))
  }

  test("E1 PERMISSIVE quarantine: corrupt payloads preserved") {
    val (good, bad) = ErrorModes.quarantine(df, "value", "k double")
    assert(good.count() == 2)
    assert(bad.select("corrupt_payload").as[String].collect().toSeq ==
      Seq("not json"))
  }

  test("E2 FAILFAST: first malformed value aborts the job") {
    val ex = intercept[SparkException] {
      df.select(ErrorModes.parseFailFast($"value", "k double").as("p"))
        .select($"p.k").collect()
    }
    assert(ex.getMessage.toLowerCase.contains("malformed") ||
      ex.getCause != null)
  }
}
