package graft.streaming

import graft.SparkSpec
import graft.streaming.StreamOps.{UserEvent, UserSummary}
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions.unix_micros
import java.sql.Timestamp

/** Constructed-data pins for the four round-18 driver-gated streaming
  * rows (q225–q228) — each test asserts the one semantic the verdict
  * named, on data built to hit it exactly (the driver gate hashes the
  * fixture replay; these pin the MECHANISM).
  */
class Round18IvmSpec extends SparkSpec {
  import spark.implicits._

  private def ts(s: String): Timestamp = Timestamp.valueOf(s)

  private def withRocksDb[T](body: => T): T = {
    val k = "spark.sql.streaming.stateStore.providerClass"
    val prev = spark.conf.getOption(k)
    spark.conf.set(k, "org.apache.spark.sql.execution.streaming" +
      ".state.RocksDBStateStoreProvider")
    try body
    finally prev match {
      case Some(p) => spark.conf.set(k, p)
      case None => spark.conf.unset(k)
    }
  }

  // 40 distinct words ≈ 280 chars, ttr 1.0 — passes the quality gate;
  // a suffix keeps variants distinct
  private def longText(tag: String): String =
    (1 to 40).map(i => s"word$i$tag").mkString(" ")

  test("q225 mechanism: training-prep dedup hit and split stamp cross " +
      "a micro-batch boundary") {
    implicit val sqlCtx = spark.sqlContext
    val in = MemoryStream[(Long, String, Timestamp)]
    val q = StreamOps.trainingPrepStream(
        in.toDF().toDF("doc_id", "text", "ts"), "ts", "1 hour")
      .writeStream.format("memory").queryName("tprep18")
      .outputMode("append").start()
    val tA = longText("a")
    // batch 1: doc 1 (text A), doc 2 (a short low-quality doc — must
    // be filtered before it ever reaches dedup state)
    in.addData((1L, tA, ts("2024-01-01 10:00:00")),
      (2L, "too short", ts("2024-01-01 10:00:01")))
    q.processAllAvailable()
    val afterB1 = spark.table("tprep18").collect()
    assert(afterB1.length == 1, s"batch 1 must emit doc 1 only")
    // batch 2: doc 3 re-delivers text A (the cross-batch dedup hit)
    // and doc 4 brings a fresh text (the cross-batch split stamp)
    val tB = longText("b")
    in.addData((3L, tA, ts("2024-01-01 10:10:00")),
      (4L, tB, ts("2024-01-01 10:10:01")))
    q.processAllAvailable()
    val out = spark.table("tprep18")
      .select("doc_id", "digest", "split")
      .as[(Long, String, String)].collect()
    q.stop()
    assert(out.length == 2,
      s"duplicate digest must not re-emit across batches: ${out.toSeq}")
    assert(out.map(_._1).toSet == Set(1L, 4L))
    out.foreach { case (_, digest, split) =>
      val want = if (digest.substring(0, 1) < "c") "train" else "test"
      assert(split == want, s"split stamp must be digest-derived")
    }
  }

  test("q226 mechanism: arrival past the gap closes a session on the " +
      "spot (flag false), the superseded timer is suppressed by the " +
      "deadline guard, and the event-time timer — not data arrival — " +
      "closes the idle tail") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val in = MemoryStream[UserEvent]
      val q = StreamOps.idleUserSummariesV2(in.toDS(), idleMs = 1800000L)
        .writeStream.format("memory").queryName("idle18")
        .outputMode("append").start()
      // batch 1: user 1's session alone — the watermark stays AT its
      // deadline's near side, so the timer cannot fire early (a
      // watermark-pushing row here would close the session in the
      // eager no-data batch MemoryStream runs on watermark advance)
      in.addData(UserEvent(1L, ts("2024-01-01 10:00:00"), 2.0))
      q.processAllAvailable()
      assert(spark.table("idle18").count() == 0, "nothing closed yet")
      // batch 2: user 1 returns 32 min later TOGETHER with the
      // watermark pusher. The batch's eviction watermark is still
      // 10:00 (it trails data), so the ARRIVAL is what closes
      // session 1 (flag false); the no-data batch right after (wm →
      // 10:32) fires the now-stale 10:30 timer, and the deadline
      // guard must swallow it instead of double-closing
      in.addData(UserEvent(1L, ts("2024-01-01 10:32:00"), 5.0),
        UserEvent(999L, ts("2024-01-01 10:31:00"), 0.0))
      q.processAllAvailable()
      val mid = spark.table("idle18").as[UserSummary].collect()
        .filter(_.user_id == 1L)
      assert(mid.length == 1, s"exactly one closure: ${mid.toSeq}")
      assert(!mid.head.closed_by_timeout,
        "the gap ARRIVAL must close the session (flag false); a " +
          "timer-true or duplicate row means the stale-timer guard " +
          "failed")
      assert(mid.head.n_events == 1 && mid.head.sum_value == 2.0)
      // two watermark pushes close user 1's tail session by TIMER
      in.addData(UserEvent(999L, ts("2024-01-01 12:00:00"), 0.0))
      q.processAllAvailable()
      in.addData(UserEvent(999L, ts("2024-01-01 12:01:00"), 0.0))
      q.processAllAvailable()
      val fin = spark.table("idle18").as[UserSummary].collect()
        .filter(_.user_id == 1L)
      q.stop()
      assert(fin.length == 2, s"tail session must close: ${fin.toSeq}")
      val tail = fin.filter(_.closed_by_timeout)
      assert(tail.length == 1 && tail.head.n_events == 1 &&
        tail.head.sum_value == 5.0,
        "the idle tail closes by TIMER with exactly the post-gap rows")
    }
  }

  test("q226 mechanism: a gap inside ONE micro-batch still splits the " +
      "session (parity with batch sessionization cannot depend on " +
      "batch boundaries)") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val in = MemoryStream[UserEvent]
      val q = StreamOps.idleUserSummariesV2(in.toDS(), idleMs = 1800000L)
        .writeStream.format("memory").queryName("idle18b")
        .outputMode("append").start()
      in.addData(UserEvent(7L, ts("2024-01-01 10:00:00"), 1.0),
        UserEvent(7L, ts("2024-01-01 10:00:10"), 2.0),
        UserEvent(7L, ts("2024-01-01 10:31:00"), 4.0))
      q.processAllAvailable()
      val out = spark.table("idle18b").as[UserSummary].collect()
      q.stop()
      assert(out.length == 1 && out.head.n_events == 2 &&
        out.head.sum_value == 3.0 && !out.head.closed_by_timeout,
        s"the within-batch gap must close session 1 on arrival: " +
          s"${out.toSeq}")
    }
  }

  test("q232 mechanism: the native session store MERGES a session " +
      "across a micro-batch boundary and emits it exactly once, only " +
      "after the watermark passes its end") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val in = MemoryStream[UserEvent]
      val q = StreamOps.sessionCounts(
          in.toDS().toDF().select($"user_id", $"ts"),
          "ts", "30 minutes", "0 seconds", Seq("user_id"))
        .writeStream.format("memory").queryName("sess18")
        .outputMode("append").start()
      // batch 1: two events of one session
      in.addData(UserEvent(1L, ts("2024-01-01 10:00:00"), 0.0),
        UserEvent(1L, ts("2024-01-01 10:10:00"), 0.0))
      q.processAllAvailable()
      // batch 2: a third event EXTENDS the same session (gap < 30 min)
      in.addData(UserEvent(1L, ts("2024-01-01 10:30:00"), 0.0))
      q.processAllAvailable()
      assert(spark.table("sess18").count() == 0,
        "an open session must not emit")
      // watermark passes end = 11:00 → the merged session emits once
      in.addData(UserEvent(999L, ts("2024-01-01 12:30:00"), 0.0))
      q.processAllAvailable()
      in.addData(UserEvent(999L, ts("2024-01-01 12:31:00"), 0.0))
      q.processAllAvailable()
      val out = spark.table("sess18")
        .filter($"user_id" === 1L)
        .select(unix_micros($"session_window.start"),
          unix_micros($"session_window.end"), $"n")
        .as[(Long, Long, Long)].collect()
      q.stop()
      assert(out.length == 1, s"merged session emits ONCE: ${out.toSeq}")
      val (st, en, n) = out.head
      assert(n == 3L, "all three events in the merged session")
      assert(en - st == (30 * 60 + 30 * 60) * 1000000L,
        s"[start, last+gap): ${(st, en)}")
    }
  }

  test("q233 mechanism: a tumbling window spanning micro-batches " +
      "merges partial aggregates and closes once per watermark pass") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val in = MemoryStream[UserEvent]
      val q = StreamOps.tumblingCounts(
          in.toDS().toDF()
            .select($"user_id".cast("string").as("event_type"),
              $"ts", $"value"),
          "ts", "1 hour", "0 seconds", Seq("event_type"))
        .writeStream.format("memory").queryName("tumble18")
        .outputMode("append").start()
      // the 10:00-11:00 window accumulates across TWO batches
      in.addData(UserEvent(1L, ts("2024-01-01 10:05:00"), 2.0))
      q.processAllAvailable()
      in.addData(UserEvent(1L, ts("2024-01-01 10:55:00"), 3.0))
      q.processAllAvailable()
      assert(spark.table("tumble18").count() == 0,
        "an open window must not emit")
      in.addData(UserEvent(9L, ts("2024-01-01 12:00:00"), 0.0))
      q.processAllAvailable()
      in.addData(UserEvent(9L, ts("2024-01-01 12:01:00"), 0.0))
      q.processAllAvailable()
      val out = spark.table("tumble18")
        .filter($"event_type" === "1")
        .select(unix_micros($"window.start"), $"n", $"sum_value")
        .as[(Long, Long, Double)].collect()
      q.stop()
      assert(out.length == 1, s"window closes ONCE: ${out.toSeq}")
      assert(out.head._2 == 2L && out.head._3 == 5.0,
        "cross-batch partials merged (2 events, sum 5.0)")
    }
  }

  test("q228 mechanism: an unmatched click's null row is emitted ONLY " +
      "after the watermark passes its join bound") {
    implicit val sqlCtx = spark.sqlContext
    withRocksDb {
      val clicks = MemoryStream[(Long, Timestamp, Long)]
      val purchases = MemoryStream[(Long, Timestamp, Long, Double)]
      val q = StreamOps.intervalJoinLeftOuterStream(
          clicks.toDF().toDF("user_id", "ts", "event_id"),
          purchases.toDF().toDF("user_id", "ts", "event_id", "value"))
        .writeStream.format("memory").queryName("ojoin18")
        .outputMode("append").start()
      // user 1: click with a purchase inside the 30-min window;
      // user 2: click that never matches
      clicks.addData((1L, ts("2024-01-01 10:00:00"), 100L),
        (2L, ts("2024-01-01 10:00:00"), 200L))
      purchases.addData((1L, ts("2024-01-01 10:10:00"), 101L, 9.0))
      q.processAllAvailable()
      val early = spark.table("ojoin18")
        .select("user_id", "purchase_id")
        .as[(Long, Option[Long])].collect()
      assert(early.toSet == Set((1L, Some(101L))),
        s"matched pair emits eagerly, unmatched must WAIT: ${early.toSeq}")
      // advance both watermarks past click_ts + 30 min + 1 h delay —
      // two pushes because the watermark trails data by one batch
      Seq("2024-01-01 13:00:00", "2024-01-01 13:01:00").foreach { t =>
        clicks.addData((-1L, ts(t), -1L))
        purchases.addData((-1L, ts(t), -1L, 0.0))
        q.processAllAvailable()
      }
      val late = spark.table("ojoin18")
        .filter($"user_id" >= 0L)
        .select("user_id", "click_id", "purchase_id")
        .as[(Long, Long, Option[Long])].collect()
      q.stop()
      assert(late.toSet == Set((1L, 100L, Some(101L)),
        (2L, 200L, None)),
        s"state expiry must surface the unmatched click with nulls: " +
          s"${late.toSeq}")
    }
  }
}
