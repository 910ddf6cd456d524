package graft.ops

import graft.SparkSpec
import graft.ops.Transforms._
import org.apache.spark.sql.functions._
import java.nio.file.Files

class TransformsSpec extends SparkSpec {
  import spark.implicits._

  test("F1: dropEmptyLines removes zero-length lines only") {
    val df = Seq("a", "", "b", "").toDF("value")
    assert(df.transform(dropEmptyLines()).as[String].collect().toSeq ==
      Seq("a", "b"))
  }

  test("F2: dropNullJson removes SQL nulls and literal null documents") {
    val df = Seq(Some("""{"a":1}"""), None, Some("null"), Some(" null "),
      Some("17")).toDF("value")
    assert(df.transform(dropNullJson()).as[String].collect().toSeq ==
      Seq("""{"a":1}""", "17"))
  }

  test("P1: wrapLine emits key-sorted object with add-entries") {
    val df = Seq("hello world").toDF("value")
    val out = df.transform(wrapLine("LogEntry", Seq("LogFile" -> "ErrorLog")))
      .select("record").as[String].head()
    // Go's json.Marshal sorts map keys: LogEntry < LogFile
    assert(out == """{"LogEntry":"hello world","LogFile":"ErrorLog"}""")
  }

  test("P1: wrapLine sorts outputKey among entries") {
    val df = Seq("x").toDF("value")
    val out = df.transform(wrapLine("zkey", Seq("AFile" -> "f")))
      .select("record").as[String].head()
    assert(out == """{"AFile":"f","zkey":"x"}""")
  }

  test("P2: addEntries overwrites colliding payload keys") {
    val df = Seq(("orig", 1.0)).toDF("LogFile", "k")
      .select(struct($"LogFile", $"k").as("payload"))
    val out = df.transform(addEntries(Seq("LogFile" -> "New"), "payload"))
      .select(to_json($"payload")).as[String].head()
    assert(out == """{"LogFile":"New","k":1.0}""")
  }

  test("P3: canonicalJson sorts keys and renders numbers as doubles") {
    val df = Seq("""{"z": 2, "a": 1}""").toDF("value")
    val out = df.transform(canonicalJson("value", "canon"))
      .select("canon").as[String].head()
    assert(out == """{"a":1.0,"z":2.0}""")
  }

  test("K1: withPartitionKey attaches a constant key column") {
    val df = Seq("r").toDF("value")
    val out = df.transform(withPartitionKey("host-1"))
    assert(out.select("partition_key").as[String].head() == "host-1")
  }

  test("C1: auto output format folds line->string, json->json") {
    assert(resolveOutputFormat(LineFormat, None) == StringOutput)
    assert(resolveOutputFormat(JsonFormat, None) == JsonOutput)
    assert(resolveOutputFormat(LineFormat, Some(JsonOutput)) == JsonOutput)
  }

  test("C1: duplicate --add-entry keys rejected at parse (main.go:115-118)") {
    assert(parseAddEntries(Seq("A=1", "B=2")) == Right(Seq("A" -> "1", "B" -> "2")))
    assert(parseAddEntries(Seq("A=1", "A=2")).isLeft)
    assert(parseAddEntries(Seq("noequals")).isLeft)
    assert(parseAddEntries(Seq("K=a=b")) == Right(Seq("K" -> "a=b")))
    assert(parseAddEntries(Nil) == Right(Nil))
  }

  test("T1: text source splits LF and CRLF; final unterminated line kept") {
    // The reference drops a final unterminated line (linestreamer.go:49-54
    // never flushes `pending`) — we deliberately keep it (SURVEY §2a T1).
    val dir = Files.createTempDirectory("graft-t1")
    Files.write(dir.resolve("log.txt"),
      "a\r\nb\nc".getBytes("UTF-8"))
    val lines = spark.read.text(dir.toString)
      .as[String].collect().toSeq.sorted
    assert(lines == Seq("a", "b", "c"))
  }

  test("pipeline: line mode end-to-end matches reference record shape") {
    val df = Seq("GET / 200", "", "POST /x 500").toDF("value")
    val out = df
      .transform(dropEmptyLines())
      .transform(wrapLine("LogEntry", Seq("LogFile" -> "AccessLog")))
      .transform(withPartitionKey("ip-address:10.0.0.1"))
      .select("record").as[String].collect().toSeq
    assert(out == Seq(
      """{"LogEntry":"GET / 200","LogFile":"AccessLog"}""",
      """{"LogEntry":"POST /x 500","LogFile":"AccessLog"}"""))
  }
}
