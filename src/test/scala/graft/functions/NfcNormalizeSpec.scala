package graft.functions

import graft.{GraftFunctions, SparkSpec}
import graft.functions.NfcNormalize.nfc_normalize
import org.apache.spark.sql.functions._

class NfcNormalizeSpec extends SparkSpec {
  import spark.implicits._

  test("composes decomposed sequences to canonical form") {
    val rows = Seq(
      "café",          // e + combining acute → é
      "Ångström", // A+ring → Å, o+diaeresis → ö
      "é",              // already NFC — unchanged
      "plain ascii",
      "").toDF("s")
      .select(nfc_normalize($"s")).as[String].collect()
    assert(rows(0) == "café")
    assert(rows(1) == "Ångström")
    assert(rows(2) == "é")
    assert(rows(3) == "plain ascii")
    assert(rows(4) == "")
  }

  test("null in, null out") {
    val out = Seq[Option[String]](None).toDF("s")
      .select(nfc_normalize($"s")).collect()
    assert(out(0).isNullAt(0))
  }

  test("codegen and interpreted paths agree") {
    val df = Seq("café Å ẍ́").toDF("s")
    val viaCodegen = df.select(nfc_normalize($"s")).as[String].head()
    // filter(lambda) forces the interpreted path for the lambda body;
    // simpler: evaluate the expression directly
    val viaEval = NfcNormalize(org.apache.spark.sql.catalyst.expressions
      .Literal("café Å ẍ́"))
      .eval(null).toString
    assert(viaCodegen == viaEval)
  }

  test("registered for the SQL surface") {
    GraftFunctions.register(spark)
    val out = spark.sql("SELECT nfc_normalize('café') AS n")
      .as[String].head()
    assert(out == "café")
  }

  test("codepoint length shrinks by the number of composed pairs") {
    val df = Seq("éé").toDF("s")
    val (before, after) = df.select(
      length($"s"), length(nfc_normalize($"s")))
      .as[(Int, Int)].head()
    assert(before == 4 && after == 2)
  }
}
