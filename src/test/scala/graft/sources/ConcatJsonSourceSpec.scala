package graft.sources

import graft.SparkSpec
import graft.ops.ErrorModes
import org.apache.spark.sql.functions._
import java.nio.file.Files

class ConcatJsonSourceSpec extends SparkSpec {
  import spark.implicits._

  test("concat-json source splits whitespace-separated values into rows") {
    val dir = Files.createTempDirectory("graft-cj")
    Files.writeString(dir.resolve("a.json"),
      """{"k": 1} 17 "s" [1,2] null {"k": 2}""")
    Files.writeString(dir.resolve("b.json"), """{"k": 3}{"k": 4}""")
    val df = spark.read.format("concat-json").load(dir.toString)
    val vals = df.as[String].collect().toSet
    assert(vals == Set("""{"k": 1}""", """{"k": 2}""", "17", "\"s\"",
      "[1,2]", "null", """{"k": 3}""", """{"k": 4}"""))
    // one partition per file
    assert(df.rdd.getNumPartitions == 2)
  }

  test("streams micro-batches of newly arrived files (MICRO_BATCH_READ)") {
    val dir = Files.createTempDirectory("graft-cjmb")
    Files.writeString(dir.resolve("first.json"), """{"k": 1} {"k": 2}""")
    val q = spark.readStream.format("concat-json").load(dir.toString)
      .writeStream.format("memory").queryName("cjmb")
      .outputMode("append").start()
    q.processAllAvailable()
    assert(spark.table("cjmb").count() == 2)
    // a file arrives mid-stream — the next offset covers exactly it
    // (file-SET offsets: no ordering/naming assumptions on arrivals)
    Files.writeString(dir.resolve("0-early-name.json"), """17 "s" null""")
    q.processAllAvailable()
    val vals = spark.table("cjmb").as[String].collect().toSet
    q.stop()
    assert(vals == Set("""{"k": 1}""", """{"k": 2}""", "17", "\"s\"",
      "null"))
    // second batch ingested only the new file's 3 values
    assert(spark.table("cjmb").count() == 5)
  }

  test("maxFilesPerTrigger bounds each DSv2 micro-batch (B1 backpressure)") {
    val dir = Files.createTempDirectory("graft-cjadm")
    (1 to 3).foreach(i =>
      Files.writeString(dir.resolve(s"f$i.json"), s"""{"k": $i}"""))
    val q = spark.readStream.format("concat-json")
      .option("maxFilesPerTrigger", "1").load(dir.toString)
      .writeStream.format("memory").queryName("cjadm")
      .outputMode("append").start()
    q.processAllAvailable()
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    val total = spark.table("cjadm").count()
    q.stop()
    assert(total == 3)
    assert(batches.length == 3, s"expected 3 bounded batches, got " +
      batches.map(_.numInputRows).mkString(","))
    assert(batches.forall(_.numInputRows == 1))
  }

  test("restart from checkpoint resumes at the stored file-set offset") {
    val dir = Files.createTempDirectory("graft-cjck")
    val ck = Files.createTempDirectory("graft-cjck-meta").toString
    Files.writeString(dir.resolve("one.json"), """{"k": 1}""")
    ConcatJsonSourceSpec.received.clear()
    // memory sink refuses checkpoint recovery; foreachBatch supports it
    def start() = spark.readStream.format("concat-json")
      .load(dir.toString)
      .writeStream
      .option("checkpointLocation", ck)
      .foreachBatch { (batch: org.apache.spark.sql.DataFrame, _: Long) =>
        batch.collect().foreach(r =>
          ConcatJsonSourceSpec.received.add(r.getString(0)))
      }
      .start()
    val q1 = start()
    q1.processAllAvailable(); q1.stop()
    assert(ConcatJsonSourceSpec.received.size() == 1)
    ConcatJsonSourceSpec.received.clear()
    // new file arrives while the query is DOWN; the restarted query
    // must deserialize the committed offset and ingest only the delta
    Files.writeString(dir.resolve("two.json"), """{"k": 2} {"k": 3}""")
    val q2 = start()
    q2.processAllAvailable(); q2.stop()
    import scala.jdk.CollectionConverters._
    val second = ConcatJsonSourceSpec.received.asScala.toSet
    assert(second == Set("""{"k": 2}""", """{"k": 3}"""),
      s"restart must skip already-committed files: $second")
  }

  test("pipes into from_json with the F2 null filter and E1 policy") {
    val dir = Files.createTempDirectory("graft-cj2")
    // malformed tail LAST: an unbalanced '{' swallows everything after
    // it (the splitter can't rebound) — same stream-abort semantics as
    // Go's json.Decoder (E2); here the E1 policy just drops the tail
    Files.writeString(dir.resolve("in.json"),
      """{"k": 1} null {"k": 2} {"k": 3} {bad""")
    val out = spark.read.format("concat-json").load(dir.toString)
      .filter(trim($"value") =!= "null") // F2
      .select(ErrorModes.parseDropMalformed($"value", "k double").as("p"))
      .select($"p.k").na.drop() // E1: malformed "{bad" dropped
      .as[Double].collect().toSeq.sorted
    assert(out == Seq(1.0, 2.0, 3.0))
  }
}

object ConcatJsonSourceSpec {
  // executor-side collection (local mode shares the JVM)
  val received = new java.util.concurrent.ConcurrentLinkedQueue[String]()
}
