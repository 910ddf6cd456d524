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

  test("a large file fans out across offset splits with identical records") {
    val dir = Files.createTempDirectory("graft-cjsplit")
    val rnd = new scala.util.Random(5)
    val sb = new StringBuilder
    (0 until 20000).foreach { i =>
      sb.append(s"""{"id": $i, "pad": "${"x" * rnd.nextInt(40)}"}""")
      // mixed separators: several values per line + newline boundaries
      sb.append(if (i % 3 == 0) " " else "\n")
    }
    Files.writeString(dir.resolve("big.json"), sb.toString)
    val whole = spark.read.format("concat-json")
      .option("multiline", "true").load(dir.toString)
    val split = spark.read.format("concat-json")
      .option("splitSize", "65536").load(dir.toString)
    assert(whole.rdd.getNumPartitions == 1)
    assert(split.rdd.getNumPartitions > 4,
      s"expected >4 splits of the ~1MB file, got ${split.rdd.getNumPartitions}")
    val a = whole.as[String].collect().sorted.toSeq
    val b = split.as[String].collect().sorted.toSeq
    assert(a == b, "split read must yield exactly the whole-file records")
  }

  test("split boundaries are consistent at any split size (fuzz)") {
    val dir = Files.createTempDirectory("graft-cjfuzz")
    val rnd = new scala.util.Random(17)
    val sb = new StringBuilder
    (0 until 2000).foreach { i =>
      sb.append(s"""{"id": $i, "p": "${"y" * rnd.nextInt(25)}"}""")
      sb.append(if (rnd.nextBoolean()) " " else "\n")
    }
    Files.writeString(dir.resolve("f.json"), sb.toString)
    val expected = spark.read.format("concat-json")
      .option("multiline", "true").load(dir.toString)
      .as[String].collect().sorted.toSeq
    // awkward sizes: splits landing mid-value, mid-line, on newlines
    for (sz <- Seq(512L, 1001L, 4096L, 65536L)) {
      val got = spark.read.format("concat-json")
        .option("splitSize", sz.toString).load(dir.toString)
        .as[String].collect().sorted.toSeq
      assert(got == expected, s"splitSize=$sz lost or duplicated records")
    }
  }

  test("pretty-printed values: multiline=true reads whole; split mode fails loudly") {
    val dir = Files.createTempDirectory("graft-cjml")
    val pretty = (0 until 2000).map(i =>
      s"{\n  \"id\": $i,\n  \"v\": [\n    1,\n    2\n  ]\n}").mkString("\n")
    Files.writeString(dir.resolve("p.json"), pretty)
    val whole = spark.read.format("concat-json")
      .option("multiline", "true").load(dir.toString)
    assert(whole.count() == 2000)
    // raw-newlines-inside-values violates the split contract: the
    // resync guard must abort the task, not emit garbage rows
    val bad = spark.read.format("concat-json")
      .option("splitSize", "1024").load(dir.toString)
    def msgs(t: Throwable): String =
      if (t == null) "" else t.toString + "\n" + msgs(t.getCause)
    val ex = intercept[Exception] { bad.count() }
    assert(msgs(ex).contains("multiline=true"),
      s"expected the multiline guard, got: ${msgs(ex).take(500)}")
  }

  test("a vanished file fails planning with the offset-replay scenario named") {
    val ex = intercept[java.io.FileNotFoundException] {
      graft.sources.ConcatJsonSplits.plan(
        Seq("/nonexistent/graft-rotated-away.json"), None, multiline = false)
    }
    assert(ex.getMessage.contains("vanished") &&
      ex.getMessage.contains("checkpoint"))
    assert(ex.getCause.isInstanceOf[java.nio.file.NoSuchFileException])
  }

  test("multiline=true splits an oversized pretty-printed file on exact value boundaries") {
    val dir = Files.createTempDirectory("graft-cjmlsplit")
    val rnd = new scala.util.Random(23)
    // pretty-printed values with raw newlines INSIDE values, plus
    // hostile content: braces/brackets/escaped quotes inside strings
    val pretty = (0 until 4000).map { i =>
      val pad = "z" * rnd.nextInt(30)
      s"""{\n  "id": $i,\n  "s": "br{ace ]x \\" $pad",\n  "v": [\n    1,\n    2\n  ]\n}"""
    }.mkString("\n")
    Files.writeString(dir.resolve("p.json"), pretty)
    val single = spark.read.format("concat-json")
      .option("multiline", "true")
      .option("splitSize", (1L << 40).toString).load(dir.toString)
    val split = spark.read.format("concat-json")
      .option("multiline", "true")
      .option("splitSize", "16384").load(dir.toString)
    assert(single.rdd.getNumPartitions == 1)
    assert(split.rdd.getNumPartitions > 4,
      s"expected the pretty file to fan out, got ${split.rdd.getNumPartitions}")
    val a = single.as[String].collect().sorted.toSeq
    val b = split.as[String].collect().sorted.toSeq
    assert(a.length == 4000)
    assert(a == b, "exact-boundary splits must yield identical records")
  }

  test("boundary scanner offsets always land on top-level value starts (fuzz)") {
    val rnd = new scala.util.Random(41)
    val values = (0 until 800).map { i =>
      rnd.nextInt(5) match {
        case 0 => s"""{\n "a": $i,\n "s": "q\\"} ${"w" * rnd.nextInt(12)}"\n}"""
        case 1 => s"""[1,\n  {"x": "]"},\n  $i]"""
        case 2 => s""""top \\" level } string $i""""
        case 3 => i.toString
        case _ => "null"
      }
    }
    val text = values.mkString(" ", "\n", "\n")
    val bytes = text.getBytes("UTF-8")
    for (target <- Seq(64L, 257L, 1024L)) {
      val bs = graft.ops.JsonValueSplitter.boundaries(
        new java.io.ByteArrayInputStream(bytes), target)
      assert(bs.head == 0L)
      assert(bs == bs.sorted && bs.distinct == bs)
      // piecewise split over the boundary ranges == one-shot split
      val piecewise = (bs :+ bytes.length.toLong).sliding(2).flatMap {
        case Seq(b, e) =>
          graft.ops.JsonValueSplitter.split(
            new String(bytes, b.toInt, (e - b).toInt, "UTF-8"))
      }.toSeq
      assert(piecewise == graft.ops.JsonValueSplitter.split(text),
        s"target=$target: piecewise split diverged")
    }
  }

  test("many oversized multiline files take the distributed boundary-job path") {
    val dir = Files.createTempDirectory("graft-cjmlmany")
    val rnd = new scala.util.Random(31)
    (0 until 5).foreach { fi =>
      val pretty = (0 until 1500).map { i =>
        s"""{\n  "f": $fi,\n  "id": $i,\n  "p": "${"q" * rnd.nextInt(20)}"\n}"""
      }.mkString("\n")
      Files.writeString(dir.resolve(s"p$fi.json"), pretty)
    }
    // 5 files > the job threshold (4) → boundaries come from the
    // first-pass Spark job, one task per file
    val split = spark.read.format("concat-json")
      .option("multiline", "true")
      .option("splitSize", "16384").load(dir.toString)
    val single = spark.read.format("concat-json")
      .option("multiline", "true")
      .option("splitSize", (1L << 40).toString).load(dir.toString)
    assert(split.rdd.getNumPartitions > 5,
      s"each oversized file should fan out, got ${split.rdd.getNumPartitions}")
    val a = single.as[String].collect().sorted.toSeq
    val b = split.as[String].collect().sorted.toSeq
    assert(a.length == 7500 && a == b)
  }

  test("boundary scan clamps to the size snapshot (concurrent-append safety)") {
    val values = (0 until 500).map(i => s"""{\n "id": $i\n}""")
    val bytes = values.mkString("\n").getBytes("UTF-8")
    val snapshot = bytes.length / 2L
    // simulate a file that grew after sizing: scan sees MORE bytes
    // than the snapshot, but must not emit boundaries past it —
    // otherwise the planner builds a negative-length partition
    val bs = graft.ops.JsonValueSplitter.boundaries(
      new java.io.ByteArrayInputStream(bytes), 256L, limitBytes = snapshot)
    assert(bs.nonEmpty && bs.forall(_ < snapshot),
      s"boundaries ${bs.filter(_ >= snapshot)} escaped the snapshot")
  }

  test("spark.sql.files.ignoreMissingFiles skips a vanished file at planning") {
    val dir = Files.createTempDirectory("graft-cjignore")
    Files.writeString(dir.resolve("a.json"), """{"id": 1}""")
    val present = dir.resolve("a.json").toString
    val gone = dir.resolve("rotated-away.json").toString
    spark.conf.set("spark.sql.files.ignoreMissingFiles", "true")
    try {
      val parts = graft.sources.ConcatJsonSplits.plan(
        Seq(present, gone), None, multiline = false)
      assert(parts.length == 1, "only the present file should be planned")
    } finally spark.conf.set("spark.sql.files.ignoreMissingFiles", "false")
  }

  test("micro-batch stream splits a large file and delivers each record once") {
    val dir = Files.createTempDirectory("graft-cjmbsplit")
    val body = (0 until 5000).map(i => s"""{"id": $i}""").mkString("\n")
    Files.writeString(dir.resolve("big.json"), body)
    val q = spark.readStream.format("concat-json")
      .option("splitSize", "8192").load(dir.toString)
      .writeStream.format("memory").queryName("cjmbsplit")
      .outputMode("append").start()
    q.processAllAvailable()
    val got = spark.table("cjmbsplit").as[String].collect()
    q.stop()
    assert(got.length == 5000, s"expected 5000 records once, got ${got.length}")
    assert(got.toSet == (0 until 5000).map(i => s"""{"id": $i}""").toSet)
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
