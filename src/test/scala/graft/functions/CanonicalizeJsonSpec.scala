package graft.functions

import graft.SparkSpec
import graft.functions.CanonicalizeJson.canonicalize_json

class CanonicalizeJsonSpec extends SparkSpec {
  import spark.implicits._

  private def canon(s: String): Option[String] =
    Seq(s).toDF("v").select(canonicalize_json($"v").as("c"))
      .collect().headOption.flatMap(r =>
        if (r.isNullAt(0)) None else Some(r.getString(0)))

  test("sorts keys recursively like Go json.Marshal of a map") {
    assert(canon("""{"z":{"b":2,"a":1},"a":[{"y":1,"x":0}]}""")
      .contains("""{"a":[{"x":0.0,"y":1.0}],"z":{"a":1.0,"b":2.0}}"""))
  }

  test("numbers become doubles at every depth (Go float64 semantics)") {
    assert(canon("""{"k":87,"nested":{"n":[1,2]}}""")
      .contains("""{"k":87.0,"nested":{"n":[1.0,2.0]}}"""))
  }

  test("non-object top-level values pass through") {
    assert(canon("17").contains("17.0"))
    assert(canon("\"s\"").contains("\"s\""))
    assert(canon("[3,1]").contains("[3.0,1.0]")) // arrays keep order
    assert(canon("null").contains("null"))
  }

  test("malformed input yields null (E1-compatible)") {
    assert(canon("{not json").isEmpty)
  }

  test("agrees with the flat-schema canonicalJson on flat payloads") {
    import graft.ops.Transforms
    val df = Seq("""{"z": 2, "a": 1}""").toDF("value")
    val flat = df.transform(Transforms.canonicalJson("value", "c"))
      .select("c").as[String].head()
    val full = canon("""{"z": 2, "a": 1}""").get
    assert(flat == full)
  }
}
