package graft

import graft.ops.Transforms.{JsonFormat, JsonOutput, LineFormat, StringOutput}
import graft.sinks.InMemoryRecordsClient
import java.nio.file.Files
import scala.jdk.CollectionConverters._

/** CLI surface (C1): flag-validation parity with the reference
  * (main.go:79-140) and the wired source→transforms→sink path, driven
  * end-to-end through Main.run with the in-memory transport.
  */
class MainSpec extends SparkSpec {

  // ------------------------------------------------ flag validation
  test("parse rejects with exit 2 exactly like the reference") {
    def reject(args: String*): String = Main.parse(args) match {
      case Left((msg, 2)) => msg
      case other => fail(s"expected exit-2 rejection, got $other")
    }
    assert(reject("--format", "xml", "s").contains("Unrecognized format"))
    assert(reject("--output-format", "yaml", "s")
      .contains("Unrecognized output format"))
    assert(reject("--add-entry", "NoEquals", "s").contains("NoEquals"))
    assert(reject("--add-entry", "k=1", "--add-entry", "k=2", "s")
      .contains("duplicate"))
    assert(reject() == "Kinesis stream must be specified.")
    assert(reject("stream1", "stream2").contains("stream2"))
    assert(reject("--bogus", "s").contains("Unknown option"))
    // --once=false would silently mean TRUE; boolean flags reject values
    assert(reject("--once=false", "s").contains("does not take a value"))
  }

  test("parse accepts the reference's full flag surface") {
    val cfg = Main.parse(Seq("-f", "json", "--output-format=json",
      "-k", "Line", "-I", "LogFile=AccessLog", "-I", "Env=prod",
      "--region", "us-west-2", "--profile", "dev",
      "--input-dir", "/logs", "--checkpoint-dir", "/ck",
      "--once", "my-stream")) match {
      case Right(c) => c
      case Left(e) => fail(s"unexpected rejection: $e")
    }
    assert(cfg.format == JsonFormat)
    assert(cfg.outputFormat.contains(JsonOutput))
    assert(cfg.outputKey == "Line")
    assert(cfg.entries == Seq("LogFile" -> "AccessLog", "Env" -> "prod"))
    assert(cfg.region.contains("us-west-2"))
    assert(cfg.profile.contains("dev"))
    assert(cfg.inputDir.contains("/logs"))
    assert(cfg.checkpointDir.contains("/ck"))
    assert(cfg.once && cfg.stream == "my-stream")
  }

  test("auto output format folds line→string, json→json (main.go:93-99)") {
    val line = Main.parse(Seq("s")).toOption.get
    val json = Main.parse(Seq("-f", "json", "s")).toOption.get
    assert(graft.ops.Transforms
      .resolveOutputFormat(line.format, line.outputFormat) == StringOutput)
    assert(graft.ops.Transforms
      .resolveOutputFormat(json.format, json.outputFormat) == JsonOutput)
  }

  // ------------------------------------------- end-to-end: line mode
  test("line mode e2e: error-log lines → wrapped JSON records in the sink") {
    val dir = Files.createTempDirectory("graft-cli-line")
    Files.write(dir.resolve("error.log"),
      ("[Wed Aug 12 05:00:01 2026] [warn] worker process 1234 exiting\n" +
        "\n" + // F1 drops this
        "[Wed Aug 12 05:00:02 2026] [error] disk full\n").getBytes("UTF-8"))
    val cfg = Main.parse(Seq("--format", "line", "--output-format", "json",
      "--add-entry", "LogFile=ErrorLog",
      "--input-dir", dir.toString, "--once", "ErrLines")).toOption.get
    InMemoryRecordsClient.clear()
    val client = new InMemoryRecordsClient("mainspec-line")
    val ck = Files.createTempDirectory("graft-cli-ck1").toString
    val q = Main.run(spark, cfg, client, ck)
    q.processAllAvailable(); q.stop()
    val got = InMemoryRecordsClient.recordsFor("mainspec-line", "ErrLines")
      .map(r => new String(r.data, "UTF-8")).sorted
    // FIXTURES.md §2 byte shape: {outputKey: line, ...entries} key-sorted
    assert(got == Seq(
      """{"LogEntry":"[Wed Aug 12 05:00:01 2026] [warn] worker process 1234 exiting","LogFile":"ErrorLog"}""",
      """{"LogEntry":"[Wed Aug 12 05:00:02 2026] [error] disk full","LogFile":"ErrorLog"}""").sorted)
    // K1: every record carries the resolved host id as partition key
    val keys = InMemoryRecordsClient.recordsFor("mainspec-line", "ErrLines")
      .map(_.partitionKey).toSet
    assert(keys == Set(graft.sinks.HostId.cached))
  }

  // ------------------------------------------- end-to-end: stdin mode
  test("--stdin e2e: piped bytes → line pipeline with no pre-existing directory") {
    // the reference's only real input is a pipe from Apache
    // (main.go:164, httpd.conf:202-204) — this drives that lifecycle:
    // bytes arrive on stdin, the pipe closes (EOF), the CLI drains
    // and reports. No --input-dir anywhere; the unterminated final
    // line is still a record (T1 divergence, kept deliberately).
    val cfg = Main.parse(Seq("--format", "line", "--output-format", "json",
      "--add-entry", "LogFile=ErrorLog", "--stdin", "PipeLines"))
      .toOption.get
    assert(cfg.stdin && cfg.inputDir.isEmpty)
    val in = new java.io.ByteArrayInputStream(
      ("[Wed Aug 12 05:00:01 2026] [warn] worker exiting\n" +
        "\n" + // F1 drops the empty line
        "[Wed Aug 12 05:00:02 2026] [error] disk full").getBytes("UTF-8"))
    InMemoryRecordsClient.clear()
    val client = new InMemoryRecordsClient("mainspec-stdin")
    val ck = Files.createTempDirectory("graft-cli-ck-stdin").toString
    Main.runStdin(spark, cfg, in, client, ck)
    val got = InMemoryRecordsClient.recordsFor("mainspec-stdin", "PipeLines")
      .map(r => new String(r.data, "UTF-8")).sorted
    assert(got == Seq(
      """{"LogEntry":"[Wed Aug 12 05:00:01 2026] [warn] worker exiting","LogFile":"ErrorLog"}""",
      """{"LogEntry":"[Wed Aug 12 05:00:02 2026] [error] disk full","LogFile":"ErrorLog"}""").sorted)
  }

  test("functest twin: httpd.conf's two pipe scenarios through Main " +
      "→ sink → registry readback, one assertion chain") {
    // The reference ships a docker functest wiring Apache to the
    // binary twice, BOTH into stream "Test" (functest/apachelogs/
    // httpd.conf): ErrorLog '|… --format line --output-format json
    // --add-entry LogFile=HTTPErrorLog Test' (httpd.conf:182) and
    // CustomLog '|… --format json Test' with the accessjson
    // LogFormat (httpd.conf:192–204). This drives both scenarios
    // through the REAL CLI stdin path into one registry stream and
    // reads the stream back through the kinesis-registry consumer —
    // payloads, partition keys, and cross-scenario per-shard order
    // asserted in one place.
    InMemoryRecordsClient.clear()
    val client = new InMemoryRecordsClient("functest")
    // scenario 1 — ErrorLog pipe (line mode, wrap + enrich)
    val errCfg = Main.parse(Seq("--format", "line",
      "--output-format", "json",
      "--add-entry", "LogFile=HTTPErrorLog", "--stdin", "Test"))
      .toOption.get
    Main.runStdin(spark, errCfg,
      new java.io.ByteArrayInputStream(
        ("[Wed Aug 12 05:00:01 2026] [warn] worker exiting\n" +
          "[Wed Aug 12 05:00:02 2026] [error] disk full\n")
          .getBytes("UTF-8")),
      client, Files.createTempDirectory("graft-ft-err-ck").toString)
    // scenario 2 — CustomLog pipe (json mode, accessjson-shaped
    // records, canonical re-marshal)
    val accCfg = Main.parse(Seq("--format", "json", "--stdin", "Test"))
      .toOption.get
    Main.runStdin(spark, accCfg,
      new java.io.ByteArrayInputStream(
        ("""{"Status": 200, "RequestMethod": "GET", "UrlPath": "/"}""" +
          "\n" +
          """{"Status": 404, "RequestMethod": "GET", "UrlPath": "/x"}""" +
          "\n").getBytes("UTF-8")),
      client, Files.createTempDirectory("graft-ft-acc-ck").toString)

    // readback through the consumer source — the downstream half of
    // the loop the reference's functest never verifies
    val q = spark.readStream.format("kinesis-registry")
      .option("registryId", "functest").option("stream", "Test").load()
      .selectExpr("seq", "CAST(data AS STRING) AS rec",
        "partition_key", "shard_id")
      .writeStream.format("memory").queryName("functest_twin")
      .outputMode("append").start()
    q.processAllAvailable()
    import spark.implicits._
    val rows = spark.table("functest_twin")
      .as[(Long, String, String, String)].collect().sortBy(_._1)
    q.stop()

    // one host, no reshard → one shard; seq IS the delivery order:
    // scenario 1's two records precede scenario 2's, each in input
    // order (K1 same-key FIFO, §1.4)
    assert(rows.map(_._2).toSeq == Seq(
      """{"LogEntry":"[Wed Aug 12 05:00:01 2026] [warn] worker exiting","LogFile":"HTTPErrorLog"}""",
      """{"LogEntry":"[Wed Aug 12 05:00:02 2026] [error] disk full","LogFile":"HTTPErrorLog"}""",
      """{"RequestMethod":"GET","Status":200.0,"UrlPath":"/"}""",
      """{"RequestMethod":"GET","Status":404.0,"UrlPath":"/x"}"""))
    // K1: every record carries the host partition key (hostid chain)
    assert(rows.map(_._3).toSet == Set(graft.sinks.HostId.cached))
    assert(rows.map(_._4).toSet.size == 1, "single-host → one shard")
  }

  test("stdin spooler rolls only at newline boundaries and keeps the EOF tail") {
    val dir = Files.createTempDirectory("graft-spool-spec")
    // 1-byte roll threshold forces a roll attempt after every read;
    // lines must still come out whole because rolls cut at '\n'
    val in = new java.io.ByteArrayInputStream(
      "alpha\nbeta\ngamma".getBytes("UTF-8"))
    graft.sources.StdinSpooler.spool(in, dir, rollBytes = 1)
    val files = Files.list(dir).iterator().asScala.toSeq
      .sortBy(_.getFileName.toString)
    assert(files.nonEmpty)
    assert(files.forall(_.getFileName.toString.startsWith("part-")),
      "no temp files may remain visible after EOF")
    val lines = files.flatMap(f =>
      new String(Files.readAllBytes(f), "UTF-8").split("\n", -1))
      .filter(_.nonEmpty)
    assert(lines == Seq("alpha", "beta", "gamma"))
  }

  test("parse: --stdin excludes --input-dir and takes no value") {
    assert(Main.parse(Seq("--stdin", "--input-dir", "/tmp/x", "S"))
      .left.toOption.get._2 == 2)
    assert(Main.parse(Seq("--stdin=true", "S")).left.toOption.get._2 == 2)
    assert(Main.parse(Seq("--stdin", "S")).toOption.get.stdin)
  }

  // ------------------------------------------- end-to-end: json mode
  test("json mode e2e: concatenated values → canonical enriched records") {
    val dir = Files.createTempDirectory("graft-cli-json")
    // multi-line concatenated values (NOT NDJSON): an object split
    // across lines, a null (F2 drop), a malformed token (E1 skip)
    Files.write(dir.resolve("a.json"),
      "{\"b\": 2,\n \"a\": \"x\"}\n null {nope} {\"c\":1}".getBytes("UTF-8"))
    val cfg = Main.parse(Seq("--format", "json",
      "--add-entry", "LogFile=AccessLog",
      "--input-dir", dir.toString, "--once", "JsonVals")).toOption.get
    InMemoryRecordsClient.clear()
    val client = new InMemoryRecordsClient("mainspec-json")
    val ck = Files.createTempDirectory("graft-cli-ck2").toString
    val q = Main.run(spark, cfg, client, ck)
    q.processAllAvailable(); q.stop()
    val got = InMemoryRecordsClient.recordsFor("mainspec-json", "JsonVals")
      .map(r => new String(r.data, "UTF-8")).sorted
    // canonical marshal: keys sorted at every level, numbers as
    // float64, add-entry merged (overwrite semantics)
    assert(got == Seq(
      """{"LogFile":"AccessLog","a":"x","b":2.0}""",
      """{"LogFile":"AccessLog","c":1.0}""").sorted)
  }

  test("json mode with string output canonicalizes but does not enrich") {
    // jsonstreamer.go:48-58: add-entries are json-output-gated, but the
    // decoded value is ALWAYS re-marshaled (key-sorted, float64)
    val dir = Files.createTempDirectory("graft-cli-jstr")
    Files.write(dir.resolve("a.json"), """{"b":2,"a":"x"}""".getBytes("UTF-8"))
    val cfg = Main.parse(Seq("--format", "json", "--output-format", "string",
      "--add-entry", "LogFile=ShouldNotAppear",
      "--input-dir", dir.toString, "--once", "JsonStr")).toOption.get
    InMemoryRecordsClient.clear()
    val client = new InMemoryRecordsClient("mainspec-jstr")
    val ck = Files.createTempDirectory("graft-cli-ck4").toString
    val q = Main.run(spark, cfg, client, ck)
    q.processAllAvailable(); q.stop()
    val got = InMemoryRecordsClient.recordsFor("mainspec-jstr", "JsonStr")
      .map(r => new String(r.data, "UTF-8"))
    assert(got == Seq("""{"a":"x","b":2.0}"""))
  }

  // ---------------------- end-to-end: access-log fixture (SURVEY §5.5)
  test("access-log fixture: NDJSON through json mode, payload bytes + FIFO") {
    val rec1 =
      """{"ClientAddress":"203.0.113.7","PeerAddress":"203.0.113.7",""" +
        """"Protocol":"HTTP/1.1","QueryString":"?q=1","RequestHandler":"-",""" +
        """"RequestLine":"GET /index.html?q=1 HTTP/1.1","RequestMethod":"GET",""" +
        """"RequestTimeMicroseconds":1532,"ResponseBodySize":5120,""" +
        """"Referer":"-","StartTime":"2026-08-12T05:00:00.123456Z",""" +
        """"Status":200,"User":"-","UserAgent":"curl/8.0","UrlPath":"/index.html"}"""
    // second record pre-sets LogFile to assert --add-entry overwrite
    val rec2 = """{"LogFile":"stale","Status":404,"UrlPath":"/missing"}"""
    // third record: per-field escaping hazards — embedded quotes,
    // backslashes, non-ASCII — must survive parse→canonical-marshal
    // byte-exactly (Go's Marshal keeps UTF-8 raw and escapes \" \\)
    val rec3 = """{"RequestLine":"GET /a\"b\\c HTTP/1.1","Status":201,""" +
      """"UrlPath":"/päth","UserAgent":"ua \"quoted\""}"""
    val dir = Files.createTempDirectory("graft-cli-access")
    Files.write(dir.resolve("access.json"),
      (rec1 + "\n" + rec2 + "\n" + rec3 + "\n").getBytes("UTF-8"))
    val cfg = Main.parse(Seq("--format", "json",
      "--add-entry", "LogFile=AccessLog",
      "--input-dir", dir.toString, "--once", "Apache")).toOption.get
    InMemoryRecordsClient.clear()
    val client = new InMemoryRecordsClient("mainspec-access")
    val ck = Files.createTempDirectory("graft-cli-ck3").toString
    val q = Main.run(spark, cfg, client, ck)
    q.processAllAvailable(); q.stop()
    val got = InMemoryRecordsClient.recordsFor("mainspec-access", "Apache")
    val texts = got.map(r => new String(r.data, "UTF-8"))
    // exact canonical bytes of the FIXTURES.md §1 record: key-sorted,
    // numbers re-rendered as float64
    assert(texts.head ==
      """{"ClientAddress":"203.0.113.7","LogFile":"AccessLog",""" +
        """"PeerAddress":"203.0.113.7","Protocol":"HTTP/1.1",""" +
        """"QueryString":"?q=1","Referer":"-","RequestHandler":"-",""" +
        """"RequestLine":"GET /index.html?q=1 HTTP/1.1","RequestMethod":"GET",""" +
        """"RequestTimeMicroseconds":1532.0,"ResponseBodySize":5120.0,""" +
        """"StartTime":"2026-08-12T05:00:00.123456Z","Status":200.0,""" +
        """"UrlPath":"/index.html","User":"-","UserAgent":"curl/8.0"}""")
    // overwrite-on-collision: add-entry's LogFile wins over the payload's
    assert(texts(1) ==
      """{"LogFile":"AccessLog","Status":404.0,"UrlPath":"/missing"}""")
    // escaping hazards round-trip byte-exactly in canonical form
    assert(texts(2) ==
      """{"LogFile":"AccessLog","RequestLine":"GET /a\"b\\c HTTP/1.1",""" +
        """"Status":201.0,"UrlPath":"/päth","UserAgent":"ua \"quoted\""}""")
    // per-key FIFO: one partition key (the host id) and arrival order
    // preserved within it — the reference's delivery guarantee (§1.4)
    assert(got.map(_.partitionKey).toSet == Set(graft.sinks.HostId.cached))
    assert(texts.indexWhere(_.contains("/index.html")) <
      texts.indexWhere(_.contains("/missing")))
  }

  // ------------------------------- end-to-end: exactly-once replay
  test("--exactly-once: a re-delivered batch 0 does not duplicate records") {
    val dir = Files.createTempDirectory("graft-cli-eos")
    Files.write(dir.resolve("a.log"), "one\ntwo\n".getBytes("UTF-8"))
    val cfg = Main.parse(Seq("--format", "line", "--exactly-once",
      "--input-dir", dir.toString, "--once", "EosStream")).toOption.get
    assert(cfg.exactlyOnce)
    InMemoryRecordsClient.clear()
    val client = new InMemoryRecordsClient("mainspec-eos")
    val ck = Files.createTempDirectory("graft-cli-eck1").toString
    val q1 = Main.run(spark, cfg, client, ck)
    q1.processAllAvailable(); q1.stop()
    assert(InMemoryRecordsClient.recordsFor("mainspec-eos", "EosStream")
      .size == 2)
    // a replay of the committed batchId under the SAME query scope
    // (its checkpoint) is the crash-redelivery case → must be a no-op
    import org.apache.spark.sql.functions.{col, lit}
    val b0 = spark.read.text(dir.toString)
      .select(col("value").as("data"), lit("k").as("partition_key"))
    graft.sinks.KinesisSink.deliverBatchIdempotent(
      b0, "EosStream", client, ck, batchId = 0L)
    assert(InMemoryRecordsClient.recordsFor("mainspec-eos", "EosStream")
      .size == 2, "same-scope replayed batch must not duplicate records")
    // restarting with the SAME checkpoint resumes committed offsets:
    // nothing new to deliver
    val q2 = Main.run(spark, cfg, client, ck)
    q2.processAllAvailable(); q2.stop()
    assert(InMemoryRecordsClient.recordsFor("mainspec-eos", "EosStream")
      .size == 2)
    // a FRESH checkpoint is a NEW query identity: its batch 0 holds
    // (what could be) different data, so it correctly delivers —
    // batch markers scope to the query, they are not a content dedupe
    val q3 = Main.run(spark, cfg, client,
      Files.createTempDirectory("graft-cli-eck2").toString)
    q3.processAllAvailable(); q3.stop()
    assert(InMemoryRecordsClient.recordsFor("mainspec-eos", "EosStream")
      .size == 4)
  }

  test("--exactly-once without a batch-marker transport fails loudly") {
    val dir = Files.createTempDirectory("graft-cli-eos2")
    Files.write(dir.resolve("a.log"), "one\n".getBytes("UTF-8"))
    val cfg = Main.parse(Seq("--format", "line", "--exactly-once",
      "--input-dir", dir.toString, "--once", "S")).toOption.get
    val bare = new graft.sinks.KinesisSink.RecordsClient {
      def putRecords(sn: String,
          rs: Seq[graft.sinks.KinesisSink.RecordEntry]) =
        graft.sinks.KinesisSink.PutResult(Nil, Nil)
    }
    intercept[IllegalArgumentException] {
      Main.run(spark, cfg, bare,
        Files.createTempDirectory("graft-cli-eck3").toString)
    }
  }

  // ------------------------------------------------- SDK seam guard
  test("SdkRecordsClient fails fast without the AWS SDK on classpath") {
    val c = new graft.sinks.SdkRecordsClient(Some("us-east-1"), None)
    val e = intercept[IllegalStateException] {
      c.putRecords("s", Seq(graft.sinks.KinesisSink
        .RecordEntry("x".getBytes("UTF-8"), "pk")))
    }
    assert(e.getMessage.contains("software.amazon.awssdk"))
  }

  test("SdkShardFeed (consumer seam) fails fast without the AWS SDK") {
    val f = new graft.sources.SdkShardFeed(Some("us-east-1"), None)
    val e = intercept[IllegalStateException] { f.listShards("s") }
    assert(e.getMessage.contains("software.amazon.awssdk"))
    val e2 = intercept[IllegalStateException] {
      f.iteratorFor("s", "shardId-000000000000", None)
    }
    assert(e2.getMessage.contains("software.amazon.awssdk"))
  }
}
