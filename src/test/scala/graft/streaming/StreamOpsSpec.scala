package graft.streaming

import graft.SparkSpec
import graft.ops.Transforms
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._
import java.sql.Timestamp

class StreamOpsSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  test("AvailableNow backfill: drains the existing backlog in batches, then stops") {
    // the catch-up trigger every reprocessing run uses: consume ALL
    // files present at start — in maxFilesPerTrigger-sized micro-
    // batches, unlike Trigger.Once — and terminate on its own
    val dir = java.nio.file.Files.createTempDirectory("graft_an")
    (1 to 5).foreach { i =>
      java.nio.file.Files.writeString(dir.resolve(s"f$i.txt"),
        s"line-$i-a\nline-$i-b\n")
    }
    val q = StreamOps.lineStream(spark, dir.toString,
        maxFilesPerTrigger = 2)
      .writeStream.format("memory").queryName("an_backfill")
      .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
      .outputMode("append").start()
    q.awaitTermination(60000)
    assert(!q.isActive, "AvailableNow must self-terminate after the backlog")
    val got = spark.table("an_backfill").as[String].collect().toSet
    assert(got == (1 to 5).flatMap(i =>
      Seq(s"line-$i-a", s"line-$i-b")).toSet)
    // admission control held: 5 files / 2 per trigger -> >= 3 batches
    assert(q.recentProgress.count(_.numInputRows > 0) >= 3,
      "backlog should drain across multiple admission-capped batches")
  }

  test("tumbling window aggregates by event time with watermark") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val events = in.toDF().toDF("ts", "event_type", "value")
    val q = StreamOps.tumblingCounts(events, "ts", "1 hour", "2 hours",
      Seq("event_type"))
      .writeStream.format("memory").queryName("tumbling")
      .outputMode("update").start()
    in.addData(
      (ts("2024-01-01 10:05:00"), "click", 1.0),
      (ts("2024-01-01 10:55:00"), "click", 2.0),
      (ts("2024-01-01 11:05:00"), "click", 4.0))
    q.processAllAvailable()
    val rows = spark.table("tumbling")
      .select(col("window.start").cast("string"), $"event_type", $"n",
        $"sum_value")
      .as[(String, String, Long, Double)].collect().toSet
    q.stop()
    assert(rows == Set(
      ("2024-01-01 10:00:00", "click", 2L, 3.0),
      ("2024-01-01 11:00:00", "click", 1L, 4.0)))
  }

  test("sliding window: events fall into overlapping windows") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, String, Double)]
    val events = in.toDF().toDF("ts", "event_type", "value")
    val q = StreamOps.slidingCounts(events, "ts", "1 hour", "30 minutes",
      "2 hours")
      .writeStream.format("memory").queryName("sliding")
      .outputMode("complete").start()
    in.addData((ts("2024-01-01 10:40:00"), "click", 1.0))
    q.processAllAvailable()
    val windows = spark.table("sliding")
      .select(col("window.start").cast("string")).as[String]
      .collect().toSet
    q.stop()
    // one event at 10:40 belongs to the [10:00,11:00) and [10:30,11:30)
    // hour-long windows sliding every 30 min
    assert(windows == Set("2024-01-01 10:00:00", "2024-01-01 10:30:00"))
  }

  test("session window closes after gap") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val events = in.toDF().toDF("ts", "user_id")
    val q = StreamOps.sessionCounts(events, "ts", "30 minutes", "2 hours",
      Seq("user_id"))
      .writeStream.format("memory").queryName("sessions")
      .outputMode("complete").start()
    in.addData(
      (ts("2024-01-01 10:00:00"), 1L),
      (ts("2024-01-01 10:10:00"), 1L), // same session
      (ts("2024-01-01 11:30:00"), 1L)) // gap > 30min => new session
    q.processAllAvailable()
    val n = spark.table("sessions").count()
    q.stop()
    assert(n == 2)
  }

  test("streaming dedup within watermark drops repeats") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Timestamp, Long)]
    val events = in.toDF().toDF("ts", "event_id")
    val q = StreamOps.dedupStream(events, "ts", "1 hour", Seq("event_id"))
      .writeStream.format("memory").queryName("deduped")
      .outputMode("append").start()
    in.addData(
      (ts("2024-01-01 10:00:00"), 1L),
      (ts("2024-01-01 10:01:00"), 1L), // dup
      (ts("2024-01-01 10:02:00"), 2L))
    q.processAllAvailable()
    val n = spark.table("deduped").count()
    q.stop()
    assert(n == 2)
  }

  test("streaming training prep: quality filter + cross-batch dedup + split stamp") {
    implicit val sqlCtx = spark.sqlContext
    // diverse 200+ char text passes the quality gate
    val good = (1 to 40).map(i => s"word$i").mkString(" ")
    val good2 = (100 to 140).map(i => s"tok$i").mkString(" ")
    val short = "too short"
    val repetitive = ("dup " * 80).trim // long but ttr ~ 1/80
    val in = MemoryStream[(Long, Timestamp, String)]
    val docs = in.toDF().toDF("doc_id", "ts", "text")
    val q = StreamOps.trainingPrepStream(docs)
      .writeStream.format("memory").queryName("prep")
      .outputMode("append").start()
    in.addData(
      (1L, ts("2024-01-01 10:00:00"), good),
      (2L, ts("2024-01-01 10:01:00"), short),
      (3L, ts("2024-01-01 10:02:00"), repetitive))
    q.processAllAvailable()
    in.addData( // later micro-batch: exact dup of doc 1 under a new id
      (4L, ts("2024-01-01 10:10:00"), good),
      (5L, ts("2024-01-01 10:11:00"), good2))
    q.processAllAvailable()
    val out = spark.table("prep")
      .select($"doc_id", $"split").as[(Long, String)].collect().toMap
    q.stop()
    assert(out.keySet == Set(1L, 5L),
      s"expected quality-filtered deduped {1, 5}, got ${out.keySet}")
    assert(out.values.forall(s => s == "train" || s == "test"))
  }

  test("stream-static join enriches events with the broadcast dimension") {
    implicit val sqlCtx = spark.sqlContext
    val dim = Seq((1L, "gold"), (2L, "basic")).toDF("user_id", "tier")
    val in = MemoryStream[(Long, Double)]
    val events = in.toDF().toDF("user_id", "value")
    val q = StreamOps.enrichStream(events, dim, "user_id")
      .writeStream.format("memory").queryName("enriched")
      .outputMode("append").start()
    in.addData((1L, 5.0), (2L, 7.0), (3L, 9.0)) // 3 has no dim row
    q.processAllAvailable()
    val out = spark.table("enriched")
      .select($"user_id", $"tier").as[(Long, String)].collect().toSet
    q.stop()
    assert(out == Set((1L, "gold"), (2L, "basic")))
  }

  test("transformWithState quota admits first N per key across micro-batches") {
    implicit val sqlCtx = spark.sqlContext
    // state API v2 requires the RocksDB state store provider
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(Long, Long, Double)]
      val events = in.toDS()
        .map { case (u, e, v) => StreamOps.QuotaEvent(u, e, v) }
      val q = StreamOps.quotaStream(events, limit = 2)
        .writeStream.format("memory").queryName("quota")
        .outputMode("append").start()
      in.addData((1L, 10L, 1.0), (1L, 11L, 1.0), (2L, 20L, 1.0))
      q.processAllAvailable()
      in.addData((1L, 12L, 1.0), (2L, 21L, 1.0)) // user 1 over quota
      q.processAllAvailable()
      val out = spark.table("quota")
        .as[StreamOps.AllowedEvent].collect()
        .map(a => (a.user_id, a.event_id, a.n_allowed)).toSet
      q.stop()
      assert(out == Set((1L, 10L, 1L), (1L, 11L, 2L),
        (2L, 20L, 1L), (2L, 21L, 2L)),
        s"quota output was $out")
    } finally {
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("transformWithState v2 TTL: expired seen-marks re-admit the key") {
    implicit val sqlCtx = spark.sqlContext
    val prev = spark.conf.getOption(
      "spark.sql.streaming.stateStore.providerClass")
    spark.conf.set("spark.sql.streaming.stateStore.providerClass",
      "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider")
    try {
      val in = MemoryStream[(Long, Long)]
      val events = in.toDS()
        .map { case (u, e) => StreamOps.SeenEvent(u, e) }
      // ProcessingTime time-mode schedules a batch EVERY trigger (the
      // engine must advance the TTL clock even with no data), so
      // processAllAvailable never sees a quiescent stream and hangs —
      // poll the sink for sentinel rows instead, under a real trigger
      // interval so the empty batches don't hot-spin.
      def sinkRows(): Set[(Long, Long)] = spark.table("ttlguard")
        .as[StreamOps.SeenEvent].collect()
        .map(e => (e.user_id, e.event_id)).toSet
      def waitFor(what: String)(cond: => Boolean): Unit = {
        val deadline = System.currentTimeMillis + 60000
        while (!cond && System.currentTimeMillis < deadline)
          Thread.sleep(100)
        assert(cond, s"timed out waiting for $what; sink=${sinkRows()}")
      }
      // generous TTL vs batch-latency margin: cold batches run
      // 300-400 ms and the sink poll adds up to ~500 ms more, so the
      // mark must outlive several seconds of suppressed-phase
      // processing, and the expiry sleep must decisively clear it
      val q = StreamOps.ttlSeenGuardStream(events, ttlMs = 8000)
        .writeStream.format("memory").queryName("ttlguard")
        .trigger(org.apache.spark.sql.streaming.Trigger
          .ProcessingTime("200 milliseconds"))
        .outputMode("append").start()
      in.addData((1L, 10L), (1L, 11L), (2L, 20L))
      waitFor("first admissions")(
        sinkRows() == Set((1L, 10L), (2L, 20L)))
      // mark still live → (1,12) suppressed; the fresh key 4 rides the
      // same batch as a sentinel proving the batch was fully processed
      in.addData((1L, 12L), (4L, 40L))
      waitFor("sentinel key 4")(sinkRows().contains((4L, 40L)))
      assert(!sinkRows().contains((1L, 12L)),
        s"live mark failed to suppress: ${sinkRows()}")
      Thread.sleep(12000) // let the TTL decisively lapse
      in.addData((1L, 13L), (3L, 30L)) // 1 re-admitted, 3 fresh
      waitFor("re-admission after TTL lapse")(
        sinkRows().contains((1L, 13L)) && sinkRows().contains((3L, 30L)))
      val out = sinkRows()
      q.stop()
      assert(out == Set((1L, 10L), (2L, 20L), (4L, 40L),
          (1L, 13L), (3L, 30L)),
        s"ttl guard output was $out")
    } finally {
      prev match {
        case Some(p) => spark.conf.set(
          "spark.sql.streaming.stateStore.providerClass", p)
        case None => spark.conf.unset(
          "spark.sql.streaming.stateStore.providerClass")
      }
    }
  }

  test("lineStream maxFilesPerTrigger bounds each micro-batch (B1 backpressure)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-mft")
    (1 to 3).foreach(i => java.nio.file.Files.write(
      dir.resolve(s"f$i.log"), s"line$i\n".getBytes("UTF-8")))
    val q = StreamOps.lineStream(spark, dir.toString, maxFilesPerTrigger = 1)
      .writeStream.format("memory").queryName("mft")
      .outputMode("append").start()
    q.processAllAvailable()
    val batches = q.recentProgress.filter(_.numInputRows > 0)
    val total = spark.table("mft").count()
    q.stop()
    assert(total == 3)
    // one file (= one row here) per micro-batch, three batches
    assert(batches.length == 3, s"expected 3 bounded batches, got " +
      batches.map(_.numInputRows).mkString(","))
    assert(batches.forall(_.numInputRows == 1))
  }

  test("concatJsonStream splits multi-line concatenated values (S2 streaming)") {
    val dir = java.nio.file.Files.createTempDirectory("graft-cjstream")
    // values span lines and are NOT line-delimited — the line-oriented
    // sources cannot split this
    java.nio.file.Files.write(dir.resolve("v.json"),
      "{\"a\":\n 1} 17 \"s\"\n[1,2] null".getBytes("UTF-8"))
    val q = StreamOps.concatJsonStream(spark, dir.toString)
      .writeStream.format("memory").queryName("cjs")
      .outputMode("append").start()
    q.processAllAvailable()
    val rows = spark.table("cjs").as[String].collect().toSeq
    q.stop()
    assert(rows == Seq("{\"a\":\n 1}", "17", "\"s\"", "[1,2]", "null"))
    // the batch twin (concat-json DSv2 source) agrees exactly
    val batch = spark.read.format("concat-json").load(dir.toString)
      .as[String].collect().toSeq
    assert(batch == rows)
  }

  test("streaming as-of join carries click state across micro-batches") {
    import StreamOps.{AsofMatch, TypedEvent}
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[TypedEvent]
    val q = StreamOps.asofEnrichStream(in.toDS())
      .writeStream.format("memory").queryName("asof")
      .outputMode("append").start()
    // batch 1: click then purchase (same batch, out of insertion order)
    in.addData(
      TypedEvent(1L, ts("2024-01-01 10:05:00"), "purchase", 100L, 9.99),
      TypedEvent(1L, ts("2024-01-01 10:00:00"), "click", 10L, 1.0),
      TypedEvent(2L, ts("2024-01-01 10:01:00"), "purchase", 200L, 5.0))
    q.processAllAvailable()
    // batch 2: purchase only — must match batch 1's click via state
    in.addData(
      TypedEvent(1L, ts("2024-01-01 11:00:00"), "purchase", 101L, 2.50))
    q.processAllAvailable()
    // batch 3: an event-time-LATE purchase (before the stored click)
    // must not match the later click — miss, never a wrong match
    in.addData(
      TypedEvent(1L, ts("2024-01-01 09:00:00"), "purchase", 102L, 1.0))
    q.processAllAvailable()
    val out = spark.table("asof")
      .as[AsofMatch].collect().map(m => m.event_id -> m.click_event_id)
      .toMap
    q.stop()
    // user 2 had no prior click → no match (inner as-of semantics);
    // late purchase 102 absent
    assert(out == Map(100L -> 10L, 101L -> 10L))
  }

  test("stream-stream interval join pairs purchases with window clicks only") {
    implicit val sqlCtx = spark.sqlContext
    val clicks = MemoryStream[(Long, Timestamp, Long)]
    val purchases = MemoryStream[(Long, Timestamp, Long, Double)]
    val q = StreamOps.intervalJoinStream(
      clicks.toDF().toDF("user_id", "ts", "event_id"),
      purchases.toDF().toDF("user_id", "ts", "event_id", "value"),
      "30 minutes")
      .writeStream.format("memory").queryName("ivj")
      .outputMode("append").start()
    // two clicks inside the window, one outside, one from another user
    clicks.addData(
      (1L, ts("2024-01-01 09:50:00"), 11L),
      (1L, ts("2024-01-01 09:58:00"), 12L),
      (1L, ts("2024-01-01 09:00:00"), 13L), // > 30 min before
      (2L, ts("2024-01-01 09:55:00"), 21L)) // other user
    purchases.addData((1L, ts("2024-01-01 10:10:00"), 100L, 9.99))
    q.processAllAvailable()
    // a click arriving AFTER the purchase's micro-batch still joins —
    // the purchase is buffered in join state until the watermark
    clicks.addData((1L, ts("2024-01-01 10:05:00"), 14L))
    q.processAllAvailable()
    val out = spark.table("ivj")
      .select($"purchase_id", $"click_id")
      .as[(Long, Long)].collect().toSet
    q.stop()
    assert(out == Set((100L, 11L), (100L, 12L), (100L, 14L)))
  }

  test("streaming heavy hitters accumulate sketch state across micro-batches") {
    import StreamOps.{HeavyHitters, TokenEvent}
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[TokenEvent]
    val q = StreamOps.heavyHittersStream(in.toDS(), m = 8, topK = 3)
      .writeStream.format("memory").queryName("hh")
      .outputMode("update").start()
    in.addData(
      Seq.fill(5)(TokenEvent("en", "the")) ++
        Seq.fill(2)(TokenEvent("en", "a")) ++
        Seq(TokenEvent("de", "der")): _*)
    q.processAllAvailable()
    val batch1 = spark.table("hh").as[HeavyHitters].collect()
      .map(h => h.key -> h.items).toMap
    assert(batch1("en").head.item == "the" && batch1("en").head.est == 5L)
    assert(batch1("de").head.item == "der" && batch1("de").head.est == 1L)
    // batch 2: counts must ACCUMULATE onto batch 1's sketch state,
    // and "a" (2+4=6) must overtake "the" (5+0=5)
    in.addData(Seq.fill(4)(TokenEvent("en", "a")): _*)
    q.processAllAvailable()
    val en2 = spark.table("hh").as[HeavyHitters].collect()
      .filter(_.key == "en").last.items
    q.stop()
    assert(en2.map(i => i.item -> i.est).take(2).toSeq ==
      Seq("a" -> 6L, "the" -> 5L))
    assert(en2.forall(_.err == 0L), "exact regime: capacity not exceeded")
  }

  test("heavy-hitters sketch state survives a checkpointed restart") {
    import StreamOps.{HeavyHitters, TokenEvent}
    val dir = java.nio.file.Files.createTempDirectory("graft-hhckpt-in")
    val ckpt = java.nio.file.Files.createTempDirectory("graft-hhckpt")
    // memory sink can't recover from a checkpoint — foreachBatch can
    // (and is the production sink shape for this op anyway)
    val seen =
      new java.util.concurrent.ConcurrentLinkedQueue[(String, Seq[StreamOps.HHItem])]()
    def start() = StreamOps.heavyHittersStream(
      spark.readStream.text(dir.toString).as[String]
        .map { l => val p = l.split(" ", 2); TokenEvent(p(0), p(1)) },
      m = 8, topK = 3)
      .writeStream.outputMode("update")
      .option("checkpointLocation", ckpt.toString)
      .foreachBatch { (df: org.apache.spark.sql.Dataset[HeavyHitters],
          _: Long) =>
        df.collect().foreach(h => seen.add(h.key -> h.items))
      }.start()
    java.nio.file.Files.writeString(dir.resolve("b1.txt"),
      Seq.fill(3)("en the").mkString("\n") + "\nen a")
    val q1 = start()
    q1.processAllAvailable()
    q1.stop()
    val first = seen.toArray.map(_.asInstanceOf[(String, Seq[StreamOps.HHItem])])
      .filter(_._1 == "en").last._2
    assert(first.head.item == "the" && first.head.est == 3L)
    // restart against the same checkpoint: group state must be
    // recovered, so new counts ACCUMULATE onto the pre-restart sketch
    java.nio.file.Files.writeString(dir.resolve("b2.txt"),
      Seq.fill(4)("en a").mkString("\n"))
    val q2 = start()
    q2.processAllAvailable()
    q2.stop()
    val after = seen.toArray.map(_.asInstanceOf[(String, Seq[StreamOps.HHItem])])
      .filter(_._1 == "en").last._2
    assert(after.map(i => i.item -> i.est).take(2).toSeq ==
      Seq("a" -> 5L, "the" -> 3L),
      s"state not recovered across restart: $after")
  }

  test("reference line pipeline runs unchanged on a streaming frame") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[String]
    val lines = in.toDF().toDF("value")
    val piped = lines
      .transform(Transforms.dropEmptyLines())
      .transform(Transforms.wrapLine("LogEntry", Seq("LogFile" -> "ErrorLog")))
      .transform(Transforms.withPartitionKey("host-x"))
    assert(piped.isStreaming)
    val q = piped.writeStream.format("memory").queryName("lines")
      .outputMode("append").start()
    in.addData("a line", "", "another")
    q.processAllAvailable()
    val out = spark.table("lines").select("record").as[String].collect().toSet
    q.stop()
    assert(out == Set(
      """{"LogEntry":"a line","LogFile":"ErrorLog"}""",
      """{"LogEntry":"another","LogFile":"ErrorLog"}"""))
  }
}
