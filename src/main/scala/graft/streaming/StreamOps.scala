package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Structured Streaming surface. The reference's processing model is an
  * unbounded arrival-ordered record stream (SURVEY.md §1.1); here that
  * is `readStream` + the same row-local transform library
  * (graft.ops.Transforms — every §2a op is stateless, so the exact
  * batch combinators apply to streaming frames unchanged).
  *
  * Everything time-based (watermarks, tumbling/sliding/session
  * windows, streaming dedup) is pure extension — the reference has no
  * event time (§2b). Batch twins of the windowed aggregations live in
  * graft.queries.Relational (q12_time_window, q15_sessionize) and are
  * oracle-checked; the streaming forms are spec-checked with
  * MemoryStream (DuckDB cannot express watermarks, SURVEY.md §7.4).
  */
object StreamOps {

  /** Tail a directory of log files as an unbounded line stream — the
    * Spark-idiomatic equivalent of the reference's stdin scan (S1).
    * `maxFilesPerTrigger` is the micro-batch admission control that
    * replaces the reference's bounded-channel backpressure (B1).
    */
  def lineStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 16): DataFrame =
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .text(dir)

  /** NDJSON stream with explicit schema (S2; schema-on-read per §1.3 —
    * pass the access-log StructType for the canonical shape, or read
    * as text + from_json for schemaless passthrough).
    */
  def jsonStream(spark: SparkSession, dir: String, schemaDdl: String)
      : DataFrame =
    spark.readStream.schema(schemaDdl).json(dir)

  /** Unbounded stream of *concatenated* (whitespace-separated, NOT
    * line-delimited) top-level JSON values — the streaming form of S2
    * (the reference's json mode is an unbounded stdin stream,
    * jsonstreamer.go:40-46; the `concat-json` DSv2 source is its batch
    * twin). A value can span lines, so the line-split text source
    * can't work: whole files are the split unit (`wholetext`), each
    * run through JsonValueSplitter executor-side — the same
    * one-partition-per-file scale shape as the batch source, with
    * `maxFilesPerTrigger` as micro-batch admission control.
    */
  def concatJsonStream(spark: SparkSession, dir: String,
      maxFilesPerTrigger: Int = 16): DataFrame = {
    import spark.implicits._
    spark.readStream
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .option("wholetext", "true")
      .text(dir)
      .as[String]
      .flatMap(graft.ops.JsonValueSplitter.split _)
      .toDF("value")
  }

  /** Tumbling event-time window aggregation with a watermark bounding
    * state. Keys: window + any additional group columns.
    */
  def tumblingCounts(events: DataFrame, tsCol: String, windowLen: String,
      watermark: String, groupCols: Seq[String]): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy((window(col(tsCol), windowLen) +: groupCols.map(col)): _*)
      .agg(count(lit(1)).as("n"), sum(col("value")).as("sum_value"))

  /** Sliding window variant. */
  def slidingCounts(events: DataFrame, tsCol: String, windowLen: String,
      slide: String, watermark: String): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen, slide))
      .agg(count(lit(1)).as("n"))

  /** Session windows with a gap timeout — the streaming twin of the
    * batch q15_sessionize (30-min gap rule).
    */
  def sessionCounts(events: DataFrame, tsCol: String, gap: String,
      watermark: String, keyCols: Seq[String]): DataFrame =
    events
      .withWatermark(tsCol, watermark)
      .groupBy((session_window(col(tsCol), gap) +: keyCols.map(col)): _*)
      .agg(count(lit(1)).as("n"))

  /** Streaming exact dedup on a key subset, state bounded by the
    * watermark (the streaming twin of dedup_exact).
    */
  def dedupStream(events: DataFrame, tsCol: String, watermark: String,
      keys: Seq[String]): DataFrame =
    events.withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(keys)

  // ------------------------------------- streaming training-data prep
  /** The LLM-pipeline composition in streaming form — the batch
    * pipeline_training_prep stages applied to unbounded arrival:
    * row-local quality filter (length + type-token ratio) → exact
    * dedup on content digest within the watermark horizon →
    * deterministic content-hash split stamp. State is only the digest
    * set of the watermark window (dropDuplicatesWithinWatermark),
    * never the corpus — the incremental-dedup discipline
    * (Dedup.incrementalExact) for streams; re-deliveries inside the
    * horizon dedupe exactly, older replays are the at-least-once
    * residual a downstream digest-keyed sink absorbs.
    */
  def trainingPrepStream(docs: DataFrame, tsCol: String = "ts",
      watermark: String = "1 hour"): DataFrame =
    docs
      .filter(length(col("text")) >= 200)
      .withColumn("t", split(lower(col("text")), "\\s+"))
      .withColumn("ttr",
        size(array_distinct(col("t"))).cast("double") /
          size(col("t")).cast("double"))
      .filter(col("ttr") >= 0.3)
      .withColumn("digest", md5(col("text")))
      .withWatermark(tsCol, watermark)
      .dropDuplicatesWithinWatermark(Seq("digest"))
      .withColumn("split",
        when(substring(col("digest"), 1, 1) < "c", "train")
          .otherwise("test"))
      .select(col("doc_id"), col(tsCol), col("digest"), col("split"))

  // ----------------------------------------------- streaming as-of join
  case class TypedEvent(user_id: Long, ts: java.sql.Timestamp,
      event_type: String, event_id: Long, value: Double)
  case class AsofState(clickId: Long, clickValue: Double, clickTs: Long)
  case class AsofMatch(event_id: Long, user_id: Long,
      ts: java.sql.Timestamp, click_event_id: Long, click_value: Double)

  /** Streaming twin of q27_asof_join: enrich each purchase with the
    * user's latest at-or-before click, incrementally. State per user
    * is O(1) — just the last click — where a stream-stream interval
    * join would buffer the whole watermark window of both sides.
    * Within a micro-batch rows are re-ordered by event time (the
    * iterator has no order guarantee); across batches the carried
    * state provides the "past" side, so a click in batch N enriches a
    * purchase in batch N+k with no rescan. Tie-breaks match the batch
    * twin (same-timestamp click visible to the purchase; max event_id
    * wins among simultaneous clicks).
    */
  def asofEnrichStream(events: org.apache.spark.sql.Dataset[TypedEvent])
      : org.apache.spark.sql.Dataset[AsofMatch] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[AsofState, AsofMatch](
        OutputMode.Append(), GroupStateTimeout.NoTimeout()) {
        (uid, rows, state) =>
          val sorted = rows.toSeq.sortBy(e =>
            (e.ts.getTime, if (e.event_type == "click") 0 else 1,
              e.event_id))
          val out = Seq.newBuilder[AsofMatch]
          var st = state.getOption
            .getOrElse(AsofState(-1L, 0.0, Long.MinValue))
          sorted.foreach { e =>
            if (e.event_type == "click") {
              if (e.ts.getTime > st.clickTs ||
                (e.ts.getTime == st.clickTs && e.event_id > st.clickId))
                st = AsofState(e.event_id, e.value, e.ts.getTime)
            } else if (e.event_type == "purchase" &&
              st.clickTs != Long.MinValue &&
              // at-or-before contract ACROSS batches too: a purchase
              // arriving event-time-late must not match a click that
              // happened after it (the O(1) state can't recover the
              // overwritten earlier click, so the late purchase goes
              // unmatched — a miss, never a wrong match; bound late
              // data with a watermark upstream if misses matter)
              st.clickTs <= e.ts.getTime) {
              out += AsofMatch(e.event_id, uid, e.ts, st.clickId,
                st.clickValue)
            }
          }
          state.update(st)
          out.result().iterator
      }
  }

  // -------------------------------------- stream-stream interval join
  /** True two-stream join: attribute each purchase to every click by
    * the same user in the preceding attribution window. Both sides are
    * watermarked and the join condition bounds the event-time distance
    * in BOTH directions, so Spark's symmetric hash join can expire
    * buffered rows — state per side is O(rate × (watermark + window)),
    * never unbounded. Complements asofEnrichStream: that one keeps
    * O(1)-per-user state but only the LATEST click; this one buffers
    * the window but emits every qualifying pair (ad attribution,
    * funnel analysis). Inner join → Append output; late rows beyond
    * the watermark are dropped, matching the batch twin only up to
    * the allowed lateness (the standard stream-stream contract).
    */
  def intervalJoinStream(clicks: DataFrame, purchases: DataFrame,
      window: String = "30 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", "1 hour")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val p = purchases.withWatermark("ts", "1 hour")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
    c.join(p,
      col("c_user") === col("p_user") &&
        col("click_ts") <= col("purchase_ts") &&
        col("click_ts") >= col("purchase_ts") - expr(s"interval $window"))
      .select(col("p_user").as("user_id"), col("purchase_id"),
        col("purchase_ts"), col("click_id"), col("click_ts"),
        col("value"))
  }

  /** LEFT OUTER twin of [[intervalJoinStream]] — the ad-attribution
    * question inverted: every click, WITH its attributed purchases
    * when they exist and with nulls when none ever arrives. The outer
    * semantics are a genuinely distinct streaming surface: an inner
    * join can emit a match the moment both rows are buffered, but an
    * UNMATCHED click can only be declared unmatched once no future
    * purchase could still join it — i.e. when the watermark expires
    * the click from join state — so null-joined rows surface with
    * watermark latency, never eagerly. Both sides are watermarked and
    * the condition bounds event-time distance in both directions, so
    * state stays O(rate × (watermark + window)) exactly like the
    * inner form; late rows beyond the watermark are dropped, and the
    * batch left join is reproduced only up to allowed lateness (the
    * standard contract — q228 stages arrival in event-time order so
    * the replay loses nothing and must hash-equal the batch oracle).
    */
  def intervalJoinLeftOuterStream(clicks: DataFrame, purchases: DataFrame,
      window: String = "30 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", "1 hour")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val p = purchases.withWatermark("ts", "1 hour")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
    c.join(p,
      col("c_user") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"interval $window"),
      "left_outer")
      .select(col("c_user").as("user_id"), col("click_id"),
        col("click_ts"), col("purchase_id"), col("purchase_ts"),
        col("value"))
  }

  /** RIGHT OUTER twin of [[intervalJoinStream]] — every purchase,
    * with its attributing clicks when they exist and nulls when no
    * click in the preceding window ever arrives (the orphan-purchase
    * audit: conversions with no recorded touchpoint). Mirror image
    * of the LEFT OUTER form, but the PRESERVED side is now the one
    * whose rows wait on the OTHER side's watermark: an unmatched
    * purchase is emitted null-joined only once the watermark expires
    * it from the join state — the symmetric hash join's right-side
    * state class that q228's left-outer replay cannot exercise.
    * Same state bound: O(rate × (watermark + window)) per side.
    */
  def intervalJoinRightOuterStream(clicks: DataFrame,
      purchases: DataFrame, window: String = "30 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", "1 hour")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val p = purchases.withWatermark("ts", "1 hour")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
    c.join(p,
      col("c_user") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"interval $window"),
      "right_outer")
      .select(col("p_user").as("user_id"), col("purchase_id"),
        col("purchase_ts"), col("click_id"), col("click_ts"),
        col("value"))
  }

  /** FULL OUTER completion of the interval-join family
    * ([[intervalJoinStream]] inner, [[intervalJoinStream]]'s
    * left-outer twin, [[intervalJoinRightOuterStream]]): every click
    * AND every purchase appears exactly once-or-joined — unmatched
    * clicks null-join when the watermark expires them from the LEFT
    * side's state, unmatched purchases when it expires them from the
    * RIGHT side's — the only join mode where BOTH sides' state
    * classes emit null rows, which neither one-sided outer replay
    * exercises together. Same state bound per side:
    * O(rate × (watermark + window)).
    */
  def intervalJoinFullOuterStream(clicks: DataFrame,
      purchases: DataFrame, window: String = "30 minutes"): DataFrame = {
    val c = clicks.withWatermark("ts", "1 hour")
      .select(col("user_id").as("c_user"), col("ts").as("click_ts"),
        col("event_id").as("click_id"))
    val p = purchases.withWatermark("ts", "1 hour")
      .select(col("user_id").as("p_user"), col("ts").as("purchase_ts"),
        col("event_id").as("purchase_id"), col("value"))
    c.join(p,
      col("c_user") === col("p_user") &&
        col("purchase_ts") >= col("click_ts") &&
        col("purchase_ts") <= col("click_ts") + expr(s"interval $window"),
      "full_outer")
      .select(coalesce(col("c_user"), col("p_user")).as("user_id"),
        col("click_id"), col("click_ts"),
        col("purchase_id"), col("purchase_ts"), col("value"))
  }

  // ----------------------------------------------------- custom state
  case class UserEvent(user_id: Long, ts: java.sql.Timestamp, value: Double)
  case class UserState(count: Long, sum: Double, lastTs: Long)
  case class UserSummary(user_id: Long, n_events: Long, sum_value: Double,
      closed_by_timeout: Boolean)

  /** Custom keyed state via flatMapGroupsWithState: accumulates a
    * per-user running summary and emits it when the user goes idle —
    * the arbitrary-state API for semantics the built-in windows can't
    * express. Event-time timeouts (not processing-time): the watermark
    * drives expiry, which is deterministic, replayable, and doesn't
    * make the no-data query spin micro-batches to poll wall-clock
    * timeouts. State is O(1) per key; the watermark bounds its
    * lifetime.
    */
  def idleUserSummaries(events: org.apache.spark.sql.Dataset[UserEvent],
      idleMs: Long, watermarkDelay: String = "0 seconds")
      : org.apache.spark.sql.Dataset[UserSummary] = {
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[UserState, UserSummary](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (userId: Long, rows: Iterator[UserEvent],
            state: GroupState[UserState]) =>
          if (state.hasTimedOut) {
            val s = state.get
            state.remove()
            Iterator.single(UserSummary(userId, s.count, s.sum,
              closed_by_timeout = true))
          } else {
            val prev = state.getOption.getOrElse(UserState(0L, 0.0, 0L))
            val next = rows.foldLeft(prev) { (acc, e) =>
              UserState(acc.count + 1, acc.sum + e.value,
                math.max(acc.lastTs, e.ts.getTime))
            }
            state.update(next)
            // expire when the watermark passes lastTs + idle gap; for
            // late events (lastTs already behind the watermark) the
            // raw timestamp would be rejected with
            // IllegalArgumentException and kill the query — clamp to
            // just past the current watermark so the group expires on
            // the next batch instead
            state.setTimeoutTimestamp(
              math.max(next.lastTs + idleMs,
                state.getCurrentWatermarkMs() + 1))
            Iterator.empty
          }
      }
  }

  // ---------------------------------------------- stream-static join
  /** Stream-static enrichment: an unbounded stream joined to a
    * bounded dimension frame — the streaming analogue of
    * q13_dim_join and the third join flavor next to the stateful
    * stream-stream interval join (intervalJoinStream) and the as-of
    * state machine (asofEnrichStream). No state store is involved:
    * the static side is re-planned per micro-batch (picking up
    * dimension-table refreshes between batches) and broadcast, so
    * the stream side never shuffles.
    */
  def enrichStream(events: DataFrame, dim: DataFrame,
      key: String): DataFrame =
    events.join(broadcast(dim), Seq(key))

  // ------------------------- transformWithState (Spark 4 state API v2)
  case class QuotaEvent(user_id: Long, event_id: Long, value: Double)
  case class AllowedEvent(user_id: Long, event_id: Long, n_allowed: Long)

  /** Per-key admission quota on the Spark 4 `transformWithState` API
    * (state API v2 — typed named state vars, TTL support, RocksDB
    * provider required): the first `limit` events per key pass with a
    * running admitted-count, the rest drop. The ingestion-guard shape
    * (cap per-host log volume, per-user event budgets) the reference's
    * bounded channel only approximates process-wide.
    *
    * Why v2 over flatMapGroupsWithState (used by asofEnrichStream /
    * idleUserSummaries, kept as the v1 demonstrations): named
    * `ValueState` handles instead of one opaque state object, so a
    * processor composes multiple independent state vars, and TTL is
    * declarative per state var instead of hand-rolled timer logic.
    * Within a batch, rows are admitted in event_id order (the iterator
    * itself is unordered).
    */
  class QuotaProcessor(limit: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, QuotaEvent, AllowedEvent] {
    import org.apache.spark.sql.Encoders
    @transient private var admitted:
        org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      admitted = getHandle.getValueState[Long]("admitted",
        Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(key: Long, rows: Iterator[QuotaEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[AllowedEvent] = {
      var c = if (admitted.exists()) admitted.get() else 0L
      val out = rows.toSeq.sortBy(_.event_id).flatMap { e =>
        if (c < limit) {
          c += 1
          Some(AllowedEvent(key, e.event_id, c))
        } else None
      }
      admitted.update(c)
      out.iterator
    }
  }

  def quotaStream(events: org.apache.spark.sql.Dataset[QuotaEvent],
      limit: Long): org.apache.spark.sql.Dataset[AllowedEvent] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new QuotaProcessor(limit),
        TimeMode.None(), OutputMode.Append())
  }

  case class SeenEvent(user_id: Long, event_id: Long)

  /** Declarative state-TTL on the v2 API — the round-7 forward-note
    * gap: every other processor here uses `TTLConfig.NONE`, so the
    * TTL half of the v2 surface was untested. This is the
    * recently-seen admission guard (suppress repeats of a key while
    * its mark is live): the "seen" mark is a `ValueState` with a
    * real `TTLConfig` duration, and EVICTION IS THE SEMANTICS — once
    * the store expires the mark, the key is admitted again. That is
    * the streaming-dedup memory model at 100 TB: per-key state can't
    * grow forever, so the guard window IS the TTL, enforced by the
    * store (RocksDB cleans expired rows in the background) instead
    * of by hand-rolled timers scanning every key.
    *
    * TTL is processing-time by contract (TimeMode.ProcessingTime
    * required); the spec drives expiry with a real clock.
    */
  class TtlSeenGuardProcessor(ttlMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, SeenEvent, SeenEvent] {
    import org.apache.spark.sql.Encoders
    @transient private var seen:
        org.apache.spark.sql.streaming.ValueState[Long] = _

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      seen = getHandle.getValueState[Long]("seen",
        Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig(
          java.time.Duration.ofMillis(ttlMs)))

    override def handleInputRows(key: Long, rows: Iterator[SeenEvent],
        timerValues: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[SeenEvent] = {
      // expired mark reads as absent — the admission decision and the
      // eviction policy are the same declarative TTL
      if (seen.exists()) { rows.foreach(_ => ()); Iterator.empty }
      else {
        val first = rows.toSeq.minBy(_.event_id)
        seen.update(first.event_id)
        Iterator.single(first)
      }
    }
  }

  def ttlSeenGuardStream(events: org.apache.spark.sql.Dataset[SeenEvent],
      ttlMs: Long): org.apache.spark.sql.Dataset[SeenEvent] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .transformWithState(new TtlSeenGuardProcessor(ttlMs),
        TimeMode.ProcessingTime(), OutputMode.Append())
  }

  /** Idle-close SESSIONIZATION on the v2 API with EVENT-TIME TIMERS —
    * the [[idleUserSummaries]] twin on transformWithState, upgraded
    * (round 18) to the full gap-sessionization contract of the batch
    * twins (q15/q52): accumulate a per-user session summary, CLOSE it
    * on EITHER signal —
    *   - a subsequent arrival whose event time sits ≥ idleMs past the
    *     session's last event closes the old session immediately
    *     (closed_by_timeout = false) and starts a new one (without
    *     this, two gap-separated events landing in one micro-batch
    *     would silently merge, and parity with batch sessionization
    *     would depend on where micro-batch boundaries fell);
    *   - an event-time timer armed at lastTs + idleMs closes the
    *     session when the watermark passes it and nothing extended it
    *     (closed_by_timeout = true) — the only way a user's FINAL
    *     session ever closes.
    * Within a batch, rows are walked in event-time (ms) order; gap
    * arithmetic is on `Timestamp.getTime` milliseconds (the state's
    * clock), which the q226 oracle replays via epoch µs div 1000.
    * Stale timers (superseded by later events — the v2 API
    * accumulates timers rather than replacing them) are recognized by
    * comparing the fired expiry against the state's current deadline
    * and dropped, the standard guard; input is processed before
    * expired timers within a batch, so a gap-closure and a pending
    * timer for the same old session resolve to the gap-closure. The
    * timer is clamped past the current watermark like the v1 twin (a
    * late event's raw deadline could otherwise be un-armable).
    */
  class IdleCloseProcessor(idleMs: Long)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, UserEvent, UserSummary] {
    import org.apache.spark.sql.Encoders
    @transient private var agg:
        org.apache.spark.sql.streaming.ValueState[UserState] = _

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      agg = getHandle.getValueState[UserState]("agg",
        Encoders.product[UserState],
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    private def deadline(s: UserState,
        tv: org.apache.spark.sql.streaming.TimerValues): Long =
      math.max(s.lastTs + idleMs, tv.getCurrentWatermarkInMs() + 1)

    override def handleInputRows(key: Long, rows: Iterator[UserEvent],
        tv: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[UserSummary] = {
      val out = Seq.newBuilder[UserSummary]
      var st = if (agg.exists()) agg.get() else UserState(0L, 0.0, 0L)
      rows.toSeq.sortBy(_.ts.getTime).foreach { e =>
        val t = e.ts.getTime
        if (st.count > 0L && t - st.lastTs >= idleMs) {
          // arrival past the gap: the old session is over AS OF THE
          // DATA, no watermark needed
          out += UserSummary(key, st.count, st.sum,
            closed_by_timeout = false)
          st = UserState(0L, 0.0, 0L)
        }
        st = UserState(st.count + 1, st.sum + e.value,
          math.max(st.lastTs, t))
      }
      agg.update(st)
      getHandle.registerTimer(deadline(st, tv))
      out.result().iterator
    }

    override def handleExpiredTimer(key: Long,
        tv: org.apache.spark.sql.streaming.TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[UserSummary] = {
      if (!agg.exists()) Iterator.empty
      else {
        val s = agg.get()
        // only the CURRENT deadline closes the session; earlier
        // armed-then-superseded timers fire and are ignored
        if (expired.getExpiryTimeInMs() >= s.lastTs + idleMs) {
          agg.clear()
          Iterator.single(UserSummary(key, s.count, s.sum,
            closed_by_timeout = true))
        } else Iterator.empty
      }
    }
  }

  def idleUserSummariesV2(
      events: org.apache.spark.sql.Dataset[UserEvent], idleMs: Long,
      watermarkDelay: String = "0 seconds")
      : org.apache.spark.sql.Dataset[UserSummary] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .transformWithState(new IdleCloseProcessor(idleMs),
        TimeMode.EventTime(), OutputMode.Append())
  }

  // ------------------------------------- per-window top-k leaderboard
  case class WinEvent(event_type: String, ts: java.sql.Timestamp)
  case class WindowTopK(window_start: Long, rank: Long,
      event_type: String, n: Long)

  /** Exact per-window top-k leaderboard emitted ONCE, when the
    * watermark closes the window — the streaming form of q7's top-k
    * (heavyHittersStream covers the UNBOUNDED-key case with a sketch;
    * this is the exact enum-keyed case: per-window state is one
    * count per distinct item, bounded by the item enum, and the
    * emission is a single sorted snapshot instead of per-batch
    * updates). Grouping key = window start (event-time floor), counts
    * in MapState, one event-time timer per window armed at
    * window-end + 1 (clamped past the current watermark so a late
    * event's window can still close); ranks break ties by item name
    * — fully deterministic output for a given input set.
    */
  class WindowTopKProcessor(windowMs: Long, k: Int)
      extends org.apache.spark.sql.streaming.StatefulProcessor[
        Long, WinEvent, WindowTopK] {
    import org.apache.spark.sql.Encoders
    @transient private var counts:
        org.apache.spark.sql.streaming.MapState[String, Long] = _

    override def init(
        outputMode: org.apache.spark.sql.streaming.OutputMode,
        timeMode: org.apache.spark.sql.streaming.TimeMode): Unit =
      counts = getHandle.getMapState[String, Long]("counts",
        Encoders.STRING, Encoders.scalaLong,
        org.apache.spark.sql.streaming.TTLConfig.NONE)

    override def handleInputRows(winStart: Long,
        rows: Iterator[WinEvent],
        tv: org.apache.spark.sql.streaming.TimerValues)
        : Iterator[WindowTopK] = {
      rows.foreach { e =>
        val prev =
          if (counts.containsKey(e.event_type))
            counts.getValue(e.event_type)
          else 0L
        counts.updateValue(e.event_type, prev + 1L)
      }
      getHandle.registerTimer(math.max(winStart + windowMs,
        tv.getCurrentWatermarkInMs() + 1))
      Iterator.empty
    }

    override def handleExpiredTimer(winStart: Long,
        tv: org.apache.spark.sql.streaming.TimerValues,
        expired: org.apache.spark.sql.streaming.ExpiredTimerInfo)
        : Iterator[WindowTopK] = {
      if (!counts.exists()) Iterator.empty
      else {
        val snap = counts.iterator().toSeq
        counts.clear()
        snap.sortBy { case (item, n) => (-n, item) }
          .take(k).zipWithIndex.iterator
          .map { case ((item, n), i) =>
            WindowTopK(winStart, i + 1L, item, n) }
      }
    }
  }

  def windowTopKStream(events: org.apache.spark.sql.Dataset[WinEvent],
      windowMs: Long, watermarkDelay: String, k: Int)
      : org.apache.spark.sql.Dataset[WindowTopK] = {
    import org.apache.spark.sql.streaming.{OutputMode, TimeMode}
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(e => {
        val ms = e.ts.getTime
        ms - math.floorMod(ms, windowMs)
      })
      .transformWithState(new WindowTopKProcessor(windowMs, k),
        TimeMode.EventTime(), OutputMode.Append())
  }

  // ------------------------------------------- streaming heavy hitters
  case class TokenEvent(key: String, item: String)
  case class HHItem(item: String, est: Long, err: Long)
  case class HeavyHitters(key: String, items: Seq[HHItem])

  /** Streaming frequent-items over an unbounded keyed stream: the
    * SpaceSaving counters (graft.functions.SpaceSaving — the same core
    * as the batch aggregate) live in per-key group state, so memory is
    * O(m) per key FOREVER regardless of stream length — the property
    * that makes a sketch the only viable shape here (an exact
    * streaming groupBy(token) count in update mode grows state with
    * the vocabulary, unbounded for open-ended token streams). Each
    * micro-batch emits the key's refreshed top-k snapshot (Update
    * mode); estimates carry the sketch's overestimate + tracked-error
    * invariants across batches because the state IS the sketch.
    */
  def heavyHittersStream(events: org.apache.spark.sql.Dataset[TokenEvent],
      m: Int, topK: Int)
      : org.apache.spark.sql.Dataset[HeavyHitters] = {
    import org.apache.spark.sql.streaming.{GroupStateTimeout, OutputMode}
    import events.sparkSession.implicits._
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[Seq[HHItem], HeavyHitters](
        OutputMode.Update(), GroupStateTimeout.NoTimeout()) {
        (key: String, rows: Iterator[TokenEvent],
            state: org.apache.spark.sql.streaming.GroupState[Seq[HHItem]]) =>
          val buf = scala.collection.mutable.HashMap(
            state.getOption.getOrElse(Seq.empty)
              .map(i => i.item -> (i.est, i.err)): _*)
          rows.foreach(r =>
            graft.functions.SpaceSaving.add(buf, r.item, m))
          val sorted = buf.toSeq
            .sortBy { case (k2, (c, _)) => (-c, k2) }
            .map { case (k2, (c, e)) => HHItem(k2, c, e) }
          state.update(sorted)
          Iterator.single(HeavyHitters(key, sorted.take(topK)))
      }
  }

  // ------------------------------- streaming incremental aggregation
  /** Streaming twin of q64_incremental_agg: a foreachBatch sink that
    * maintains a per-key serving aggregate (n, sum, min, max) by
    * MERGING each micro-batch's partials into the stored table —
    * counts/sums add, min/max fold — instead of re-aggregating
    * history. State lives in parquet at `stateDir`, group-sized (one
    * row per key), never row-sized; each batch's work is
    * O(batch + |keys|). The merged frame is written to a TEMP
    * directory and swapped into place with renames — never an
    * in-place overwrite of the directory the merge just read: a
    * cache-evicted partition during an in-place overwrite would
    * recompute lineage against the half-deleted input (round-7
    * advice). The swap (state→old, tmp→state, drop old) leaves every
    * crash window recoverable: the worst case is a missing `state`
    * with an intact `-old` beside it, never a torn mix of both
    * generations. At-least-once replays of a batch re-merge its
    * rows — exactly-once needs idempotent keys or the BatchMarkers
    * discipline (KinesisSink.writeStreamExactlyOnce); the spec pins
    * merge == direct recompute over clean delivery.
    */
  /** Crash recovery for the swap-rename discipline: a failure BETWEEN
    * rename(state→old) and rename(tmp→state) leaves no `state` dir
    * but an intact `-old` holding the last complete generation. Every
    * batch starts by restoring that generation if it finds the torn
    * shape — without this the next batch silently reinitializes from
    * empty and its own preamble deletes `-old`, losing all
    * accumulated history (round-9 advice).
    */
  private def restoreTornState(fs: org.apache.hadoop.fs.FileSystem,
      statePath: org.apache.hadoop.fs.Path,
      oldPath: org.apache.hadoop.fs.Path): Unit =
    if (!fs.exists(statePath) && fs.exists(oldPath))
      fs.rename(oldPath, statePath)

  def incrementalAggBatch(stateDir: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val partial = batch.groupBy(col("k")).agg(
      count(lit(1)).as("n"), sum(col("v")).as("s"),
      min(col("v")).as("lo"), max(col("v")).as("hi"))
    // existence via the Hadoop FS API — stateDir is an object-store /
    // HDFS path in production, not a local file
    val statePath = new org.apache.hadoop.fs.Path(stateDir)
    val fs = statePath.getFileSystem(
      spark.sessionState.newHadoopConf())
    restoreTornState(fs, statePath,
      new org.apache.hadoop.fs.Path(s"$stateDir-old"))
    val prior =
      if (fs.exists(statePath)) Some(spark.read.parquet(stateDir))
      else None
    val merged = prior.map(_.unionByName(partial)).getOrElse(partial)
      .groupBy(col("k")).agg(
        sum(col("n")).as("n"), sum(col("s")).as("s"),
        min(col("lo")).as("lo"), max(col("hi")).as("hi"))
    val tmpPath = new org.apache.hadoop.fs.Path(
      s"$stateDir-tmp-$batchId")
    val oldPath = new org.apache.hadoop.fs.Path(s"$stateDir-old")
    merged.write.mode("overwrite").parquet(tmpPath.toString)
    fs.delete(oldPath, true)
    if (fs.exists(statePath)) fs.rename(statePath, oldPath)
    fs.rename(tmpPath, statePath)
    fs.delete(oldPath, true)
  }

  /** Streaming CUSUM drift monitor — q84's statistic maintained over
    * an unbounded event stream via the IVM pattern: each micro-batch
    * reduces to per-(event_type, day) integer partials (daily sums
    * are associative, so merge == recompute by construction), merged
    * into a domain-bounded parquet state table with the same
    * swap-rename discipline as incrementalAggBatch. The statistic
    * itself is NOT incremental (a new day shifts every deviation
    * through the global mean), and does not need to be: it recomputes
    * on the COMPACT state (types × days rows, never event-sized) at
    * read time via [[graft.queries.Mining.cusumOverDaily]] — the
    * fact stream is touched once per batch, the state thousands of
    * rows. Batch shape: (event_type string, day long, cents long).
    */
  def cusumDriftBatch(stateDir: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val partial = batch.groupBy(col("event_type"), col("day"))
      .agg(sum(col("cents")).as("x"))
    val statePath = new org.apache.hadoop.fs.Path(stateDir)
    val fs = statePath.getFileSystem(
      spark.sessionState.newHadoopConf())
    restoreTornState(fs, statePath,
      new org.apache.hadoop.fs.Path(s"$stateDir-old"))
    val prior =
      if (fs.exists(statePath)) Some(spark.read.parquet(stateDir))
      else None
    val merged = prior.map(_.unionByName(partial)).getOrElse(partial)
      .groupBy(col("event_type"), col("day"))
      .agg(sum(col("x")).as("x"))
    val tmpPath = new org.apache.hadoop.fs.Path(
      s"$stateDir-tmp-$batchId")
    val oldPath = new org.apache.hadoop.fs.Path(s"$stateDir-old")
    merged.write.mode("overwrite").parquet(tmpPath.toString)
    fs.delete(oldPath, true)
    if (fs.exists(statePath)) fs.rename(statePath, oldPath)
    fs.rename(tmpPath, statePath)
    fs.delete(oldPath, true)
  }

  /** The served drift report: q84's CUSUM over the current merged
    * daily state. */
  def cusumDriftSnapshot(spark: SparkSession, stateDir: String)
      : DataFrame =
    graft.queries.Mining.cusumOverDaily(spark.read.parquet(stateDir))

  /** Streaming lateness monitor — q124's out-of-order audit
    * maintained INCREMENTALLY over an unbounded stream (the IVM
    * family next to incrementalAggBatch/cusumDriftBatch): per-user
    * event-time high watermarks plus lateness counters live in a
    * swap-renamed parquet state, each micro-batch merges its deltas,
    * and the snapshot serves the same (n_events, n_late, max, mean,
    * share) row q124 computes in batch — the number that decides
    * whether a deployed `withWatermark` delay still covers the
    * arrival tail AS THE STREAM DRIFTS, without rescanning history.
    *
    * Per-batch semantics are exact: events are processed in
    * event_id (arrival) order against greatest(prior hwm,
    * within-batch running hwm) — so a cross-batch regression (an
    * event older than a PREVIOUS batch's max) is charged correctly.
    * Batch shape: (user_id long, event_id long, us long).
    */
  def latenessMonitorBatch(stateDir: String)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val statePath = new org.apache.hadoop.fs.Path(stateDir)
    val fs = statePath.getFileSystem(
      spark.sessionState.newHadoopConf())
    restoreTornState(fs, statePath,
      new org.apache.hadoop.fs.Path(s"$stateDir-old"))
    val prior =
      if (fs.exists(statePath)) Some(spark.read.parquet(stateDir))
      else None
    val wb = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id")).orderBy(col("event_id"))
      .rowsBetween(org.apache.spark.sql.expressions.Window
        .unboundedPreceding, -1)
    val withPrior = prior match {
      case Some(p) => batch.join(
        p.select(col("user_id"), col("hwm_us").as("p_hwm")),
        Seq("user_id"), "left")
      case None => batch.withColumn("p_hwm", lit(null).cast("long"))
    }
    // greatest() skips NULLs: eff is null only for a user's very
    // first event ever (no prior state, no preceding batch row)
    val deltas = withPrior
      .withColumn("bhwm", max(col("us")).over(wb))
      .withColumn("eff", greatest(col("bhwm"), col("p_hwm")))
      .withColumn("late",
        when(col("eff").isNotNull && col("us") < col("eff"),
          col("eff") - col("us")).otherwise(lit(0L)))
      .groupBy(col("user_id"))
      .agg(max(col("us")).as("d_hwm"), count(lit(1)).as("d_n"),
        sum(when(col("late") > 0, 1L).otherwise(0L)).as("d_late"),
        max(col("late")).as("d_maxlate"),
        sum(col("late")).as("d_sumlate"))
    val merged = prior match {
      case Some(p) => p
        .join(deltas, Seq("user_id"), "full_outer")
        .select(col("user_id"),
          greatest(col("hwm_us"), col("d_hwm")).as("hwm_us"),
          (coalesce(col("n_events"), lit(0L)) +
            coalesce(col("d_n"), lit(0L))).as("n_events"),
          (coalesce(col("n_late"), lit(0L)) +
            coalesce(col("d_late"), lit(0L))).as("n_late"),
          greatest(coalesce(col("max_late_us"), lit(0L)),
            coalesce(col("d_maxlate"), lit(0L))).as("max_late_us"),
          (coalesce(col("sum_late_us"), lit(0L)) +
            coalesce(col("d_sumlate"), lit(0L))).as("sum_late_us"))
      case None => deltas.select(col("user_id"),
        col("d_hwm").as("hwm_us"), col("d_n").as("n_events"),
        col("d_late").as("n_late"), col("d_maxlate").as("max_late_us"),
        col("d_sumlate").as("sum_late_us"))
    }
    val tmpPath = new org.apache.hadoop.fs.Path(
      s"$stateDir-tmp-$batchId")
    val oldPath = new org.apache.hadoop.fs.Path(s"$stateDir-old")
    merged.write.mode("overwrite").parquet(tmpPath.toString)
    fs.delete(oldPath, true)
    if (fs.exists(statePath)) fs.rename(statePath, oldPath)
    fs.rename(tmpPath, statePath)
    fs.delete(oldPath, true)
  }

  /** The served lateness report: q124's output shape off the compact
    * per-user state. */
  def latenessSnapshot(spark: SparkSession, stateDir: String)
      : DataFrame =
    spark.read.parquet(stateDir)
      .agg(sum(col("n_events")).as("n_events"),
        sum(col("n_late")).as("n_late"),
        max(col("max_late_us")).as("max_late_us"),
        sum(col("sum_late_us")).as("sum_late_us"))
      .select(col("n_events"), col("n_late"), col("max_late_us"),
        expr("sum_late_us div greatest(n_late, 1)")
          .as("mean_late_us"),
        round(col("n_late").cast("double") /
          col("n_events").cast("double"), 6).as("late_share"))

  /** Streaming decontamination guard — eval-set protection AT INGEST:
    * each arriving micro-batch of documents is checked for near-dups
    * of the (static) test corpus, and hits are quarantined to a
    * parquet audit log instead of flowing on to training. This is
    * pipeline_split_leakage's detector turned preventive, and it
    * reuses the verified batch machinery WHOLESALE: the test corpus
    * rides in with negative ids and
    * [[graft.dedup.Dedup.minhashIncrementalOver]] (pivot 0) returns
    * the batch's survivors — flagged = batch ∖ survivors. Per-batch
    * cost re-shingles the test corpus; a production deployment
    * persists the corpus signature table across batches (the sigs
    * frame inside the reused machinery is exactly that table — the
    * documented lift when batch rate matters). Batch shape:
    * (doc_id ≥ 0 long, text string).
    */
  def decontaminationGuard(testCorpus: DataFrame, quarantineDir: String,
      threshold: Double = 0.5)(batch: DataFrame, batchId: Long)
      : Unit = {
    val corpus = testCorpus
      .select((-col("doc_id") - 1).as("doc_id"), col("text"))
    val all = corpus.unionByName(batch.select(col("doc_id"), col("text")))
      .withColumn("shh", graft.functions.ShingleFunctions
        .shingle_hashes(col("text")))
    val survivors = graft.dedup.Dedup
      .minhashIncrementalOver(all, pivot = 0L, threshold)
    val flagged = batch.select(col("doc_id"))
      .join(survivors, Seq("doc_id"), "left_anti")
      .withColumn("batch_id", lit(batchId))
    flagged.write.mode("append").parquet(quarantineDir)
    batch.sparkSession.catalog.clearCache()
  }
}
