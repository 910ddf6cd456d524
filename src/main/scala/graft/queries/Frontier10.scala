package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{Q, ScratchDir, Tables}

/** Round-18 frontier: six streaming-parity rows, each driver-gated
  * through the PRODUCTION runtime on the [[Replay]] staged-replay
  * harness — the four components the r17 verdict named as
  * extension-surface residue (q225–q228) plus the two stateful
  * store classes that completed the sweep (q232 session-window
  * merge store, q233 windowed-agg StateStoreSave) —
  *
  *   - q225_training_prep_ivm: the streaming training-prep
  *     composition (quality filter → digest dedup within watermark →
  *     split stamp), the oldest spec-only twin of a batch oracle row
  *     (pipeline_training_prep);
  *   - q226_idle_session_ivm: event-time-timer gap sessionization on
  *     transformWithState (idleUserSummariesV2) — the only
  *     event-time-timer processor shape that had no board row;
  *   - q227_incremental_agg_ivm: the foreachBatch IVM serving sink
  *     (incrementalAggBatch) driven through a REAL writeStream —
  *     q64 proves merge == recompute in batch; this row proves the
  *     sink path itself;
  *   - q228_outer_interval_ivm: the stream-stream LEFT OUTER interval
  *     join — watermark-expiry null emission, the semantics q212's
  *     inner join cannot exercise;
  *   - q232_session_window_ivm: native `session_window` gap merge —
  *     the dedicated session-store class (merging-window state);
  *   - q233_tumbling_window_ivm: watermarked tumbling-window
  *     aggregate through StateStoreSave/Restore — the windowed-agg
  *     store class.
  *
  * Reference note: the reference engine (`/root/reference/`, a Go
  * stdin→Kinesis log forwarder — SURVEY.md §1; basestreamer.go:65–87
  * is its whole delivery surface) has no stateful streaming; these
  * are the §2b extension rows for the analytics a log-streamer
  * consumer builds first (sessionization over access logs,
  * attribution joins, incremental serving aggregates, streaming
  * corpus prep), under the house disciplines: exact integer domains
  * (cents), event-time-ordered staged arrival so watermarks drop
  * nothing, RocksDB state via Replay.withRocksDb, and DuckDB oracles
  * replaying the identical semantics batch-wise.
  */
object Frontier10 {

  // epoch-pinned far-future sentinels (2025-06-01/02 UTC, q185's
  // values) — tz-free longs so the staged bytes are identical on any
  // JVM default zone; two of them because the watermark trails data
  // by one micro-batch
  private val Sentinel1Ms = 1748736000000L
  private val Sentinel2Ms = 1748822400000L

  def queries: Map[String, Q] = Map(

    // Driver-gated parity row for the streaming training-prep
    // composition (StreamOps.trainingPrepStream — r17 verdict item
    // #3; its batch chain pipeline_training_prep is hash-gated, the
    // stream form was spec-only since round 6). Documents ride a
    // synthetic event-time clock (epoch + doc_id ms — arrival order
    // IS event-time order, so the id-range thirds are event-time
    // thirds and the 30-day watermark, far wider than any fixture's
    // clock span, expires no digest state mid-replay: the dedup
    // horizon covers the whole corpus, exactly the batch twin's
    // contract). The replay runs the PRODUCTION chain — row-local
    // quality filter, dropDuplicatesWithinWatermark on the md5
    // digest through the real RocksDB store, deterministic split
    // stamp — across three staged micro-batches; a batch-2/3
    // re-arrival of a batch-1 digest must emit NOTHING (the
    // cross-batch dedup hit the spec also pins). The gate hashes
    // (digest, split): the surviving-digest set is deterministic
    // (equal digests ⇒ equal text ⇒ equal quality verdict) even
    // though WHICH doc_id survives an intra-batch tie is not, and a
    // dedup miss would surface as a duplicate digest row. Oracle:
    // one-pass distinct-digest replay of the same filter + stamp.
    "q225_training_prep_ivm" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.load(s, d, "documents")
        .select($"doc_id", $"text",
          timestamp_millis(lit(1700000000000L) + $"doc_id").as("ts"))
      val cut = docs.agg(max($"doc_id")).first.getLong(0)
      val root = ScratchDir.path(s"tprep_ivm_${Replay.run()}")
      val staged = Replay.stageBatches(root, Seq(
        docs.filter($"doc_id" <= cut / 3),
        docs.filter($"doc_id" > cut / 3 && $"doc_id" <= 2 * cut / 3),
        docs.filter($"doc_id" > 2 * cut / 3)))
      Replay.withRocksDb(s) {
        val src = s.readStream
          .schema("doc_id BIGINT, text STRING, ts TIMESTAMP")
          .option("maxFilesPerTrigger", "1").parquet(staged)
        val q = graft.streaming.StreamOps
          .trainingPrepStream(src, "ts", "30 days")
          .writeStream.format("parquet")
          .option("path", s"$root/out")
          .option("checkpointLocation", s"$root/ckpt")
          .outputMode("append")
          .start()
        Replay.drainStagedReplay(q, nFiles = 3)
      }
      s.read.schema("doc_id BIGINT, ts TIMESTAMP, digest STRING, " +
          "split STRING")
        .parquet(s"$root/out")
        .select($"digest", $"split")
        .orderBy($"digest")
    }),

    // Driver-gated parity row for event-time-timer gap sessionization
    // (StreamOps.idleUserSummariesV2 / IdleCloseProcessor — r17
    // verdict item #4). Events replay as three EVENT-TIME thirds plus
    // two far-future sentinels whose only job is advancing the
    // watermark past every real session's idle deadline (wm trails
    // data by one batch, hence two); 30-min gap, values as exact
    // cents ridden in the double field so session sums fold
    // associatively. Sessions close by EITHER signal — a later
    // arrival past the gap (closed_by_timeout = false) or the
    // event-time timer (true) — and the oracle replays both: q52's
    // gap-sessionization on the SAME ms clock, flagging a session
    // true iff it is the user's final one OR it hits the one
    // replay-structural timer case (a batch-1 session whose deadline
    // cleared batch 1's closing watermark while the user's next event
    // waited in batch 3: the timer fires a full batch before the
    // arrival; when both land in one batch, input-before-timers makes
    // the arrival win — the ordering the spec pins). The sentinel
    // user (-1) filters out. The hash match proves per-user RocksDB
    // session state carries across real micro-batch boundaries and
    // that timers — not data arrival — close idle tails.
    "q226_idle_session_ivm" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.load(s, d, "events")
        .select($"user_id", $"ts",
          round($"value" * 100).cast("long").cast("double").as("value"),
          unix_micros($"ts").as("us"))
      val mm = ev.agg(min($"us"), max($"us")).first
      val (lo, hi) = (mm.getLong(0), mm.getLong(1))
      val t1 = lo + (hi - lo) / 3L
      val t2 = lo + (2L * (hi - lo)) / 3L
      val root = ScratchDir.path(s"idle_ivm_${Replay.run()}")
      val cols = Seq($"user_id", $"ts", $"value")
      def sentinel(ms: Long): DataFrame = s.range(1)
        .select(lit(-1L).as("user_id"),
          timestamp_millis(lit(ms)).as("ts"), lit(0.0).as("value"))
      val staged = Replay.stageBatches(root, Seq(
        ev.filter($"us" <= t1).select(cols: _*),
        ev.filter($"us" > t1 && $"us" <= t2).select(cols: _*),
        ev.filter($"us" > t2).select(cols: _*),
        sentinel(Sentinel1Ms), sentinel(Sentinel2Ms)))
      Replay.withRocksDb(s) {
        val src = s.readStream
          .schema("user_id BIGINT, ts TIMESTAMP, value DOUBLE")
          .option("maxFilesPerTrigger", "1").parquet(staged)
          .as[graft.streaming.StreamOps.UserEvent]
        val q = graft.streaming.StreamOps
          .idleUserSummariesV2(src, idleMs = 1800000L)
          .writeStream.format("parquet")
          .option("path", s"$root/out")
          .option("checkpointLocation", s"$root/ckpt")
          .outputMode("append")
          .start()
        Replay.drainStagedReplay(q, nFiles = 5)
      }
      s.read.schema("user_id BIGINT, n_events BIGINT, " +
          "sum_value DOUBLE, closed_by_timeout BOOLEAN")
        .parquet(s"$root/out")
        .filter($"user_id" >= 0L)
        .orderBy($"user_id", $"n_events", $"sum_value",
          $"closed_by_timeout")
    }),

    // Driver-gated parity row for the foreachBatch IVM serving sink
    // (StreamOps.incrementalAggBatch — r17 verdict item #5).
    // q64_incremental_agg proves merge(partial, partial) ==
    // recompute(full) for the (n, sum, min, max) state algebra in
    // batch; THIS row drives the sink itself — a real
    // readStream → writeStream.foreachBatch(AvailableNow) over three
    // staged micro-batches, each invocation merging its partials into
    // the swap-renamed parquet state table — and hashes the SERVED
    // state against the one-pass oracle. Arrival-order thirds
    // (event_id, q184's proxy); values as exact cents so every state
    // column stays integer. The sink is stateless Spark-side (state
    // lives in the parquet table), so AvailableNow drains cleanly
    // with no sentinels and no state store.
    "q227_incremental_agg_ivm" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.load(s, d, "events")
        .select($"user_id".as("k"),
          round($"value" * 100).cast("long").as("v"), $"event_id")
      val cut = ev.agg(max($"event_id")).first.getLong(0)
      val root = ScratchDir.path(s"incagg_ivm_${Replay.run()}")
      val staged = Replay.stageBatches(root, Seq(
        ev.filter($"event_id" <= cut / 3).select($"k", $"v"),
        ev.filter($"event_id" > cut / 3 && $"event_id" <= 2 * cut / 3)
          .select($"k", $"v"),
        ev.filter($"event_id" > 2 * cut / 3).select($"k", $"v")))
      val stateDir = s"$root/state"
      val src = s.readStream.schema("k BIGINT, v BIGINT")
        .option("maxFilesPerTrigger", "1").parquet(staged)
      val q = src.writeStream
        .foreachBatch(
          graft.streaming.StreamOps.incrementalAggBatch(stateDir) _)
        .option("checkpointLocation", s"$root/ckpt")
        .trigger(org.apache.spark.sql.streaming.Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      s.read.schema("k BIGINT, n BIGINT, s BIGINT, lo BIGINT, hi BIGINT")
        .parquet(stateDir)
        .select($"k", $"n", $"s", $"lo", $"hi")
        .orderBy($"k")
    }),

    // Driver-gated parity row for the stream-stream LEFT OUTER
    // interval join (StreamOps.intervalJoinLeftOuterStream — r17
    // verdict item #6, q212's outer twin). The distinct semantics
    // under test is WATERMARK-EXPIRY NULL EMISSION: an unmatched
    // click may only surface (with null purchase columns) once the
    // watermark expires it from join state — no future purchase can
    // still match — so the replay needs the two far-future sentinel
    // batches on BOTH sides to flush the tail of unmatched clicks
    // (the eviction watermark is the min across sources). Real
    // arrival is the q212 recipe: both streams cut into the same
    // event-time thirds, advancing in lockstep under
    // maxFilesPerTrigger=1, so the 1 h watermark drops nothing and
    // the replay must hash-equal the BATCH left join the oracle runs.
    // Sentinel rows (user -1) join nothing and their clicks are never
    // expired (nothing advances the watermark past them) — the
    // user_id filter is belt-and-braces documentation.
    "q228_outer_interval_ivm" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.load(s, d, "events")
        .filter($"event_type".isin("click", "purchase"))
        .select($"user_id", $"ts", $"event_id", $"value",
          $"event_type", unix_micros($"ts").as("us"))
      val mm = ev.agg(min($"us"), max($"us")).first
      val (lo, hi) = (mm.getLong(0), mm.getLong(1))
      val t1 = lo + (hi - lo) / 3L
      val t2 = lo + (2L * (hi - lo)) / 3L
      val root = ScratchDir.path(s"ojoin_ivm_${Replay.run()}")
      def thirds(df: DataFrame): Seq[DataFrame] = Seq(
        df.filter($"us" <= t1), df.filter($"us" > t1 && $"us" <= t2),
        df.filter($"us" > t2))
      def cSentinel(ms: Long): DataFrame = s.range(1)
        .select(lit(-1L).as("user_id"),
          timestamp_millis(lit(ms)).as("ts"), lit(-1L).as("event_id"))
      def pSentinel(ms: Long): DataFrame = s.range(1)
        .select(lit(-1L).as("user_id"),
          timestamp_millis(lit(ms)).as("ts"), lit(-1L).as("event_id"),
          lit(0.0).as("value"))
      val cStage = Replay.stageBatches(s"$root/clicks", thirds(
        ev.filter($"event_type" === "click")
          .select($"user_id", $"ts", $"event_id")) ++
        Seq(cSentinel(Sentinel1Ms), cSentinel(Sentinel2Ms)))
      val pStage = Replay.stageBatches(s"$root/purchases", thirds(
        ev.filter($"event_type" === "purchase")
          .select($"user_id", $"ts", $"event_id", $"value")) ++
        Seq(pSentinel(Sentinel1Ms), pSentinel(Sentinel2Ms)))
      Replay.withRocksDb(s) {
        val clicks = s.readStream
          .schema("user_id BIGINT, ts TIMESTAMP, event_id BIGINT")
          .option("maxFilesPerTrigger", "1").parquet(cStage)
        val purchases = s.readStream
          .schema("user_id BIGINT, ts TIMESTAMP, event_id BIGINT, " +
            "value DOUBLE")
          .option("maxFilesPerTrigger", "1").parquet(pStage)
        val q = graft.streaming.StreamOps
          .intervalJoinLeftOuterStream(clicks, purchases)
          .writeStream.format("parquet")
          .option("path", s"$root/out")
          .option("checkpointLocation", s"$root/ckpt")
          .outputMode("append")
          .start()
        Replay.drainStagedReplay(q, nFiles = 5)
      }
      s.read.schema("user_id BIGINT, click_id BIGINT, " +
          "click_ts TIMESTAMP, purchase_id BIGINT, " +
          "purchase_ts TIMESTAMP, value DOUBLE")
        .parquet(s"$root/out")
        .filter($"user_id" >= 0L)
        .select($"user_id", $"click_id", $"click_ts", $"purchase_id",
          $"purchase_ts", $"value")
        .orderBy($"click_id", $"purchase_id")
    }),

    // Driver-gated parity row for the NATIVE session-window store —
    // with q212/q217 (join & flatMapGroups state), q185/q195/q196/
    // q226 (transformWithState), q225 (streaming dedup state) and
    // q233 (windowed-agg state), this completes driver gates over
    // every stateful operator class Structured Streaming ships.
    // session_window(ts, 30 min) merges events within the gap in the
    // dedicated session store (merge-on-update, a distinct state
    // format from the agg store); append mode emits a session only
    // when the watermark passes its end. Replay = three event-time
    // thirds + the two far-future sentinels (user −1, filtered) that
    // close every real session; the oracle is q52's gap
    // sessionization verbatim (same µs clock, same
    // event-at-exactly-gap starts-a-new-session boundary), so the
    // hash match proves cross-batch session MERGE in the real store
    // — a batch-2 event extends a batch-1 session, and the merged
    // [start, last+gap) interval comes out exactly once.
    "q232_session_window_ivm" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.load(s, d, "events")
        .select($"user_id", $"ts", unix_micros($"ts").as("us"))
      val mm = ev.agg(min($"us"), max($"us")).first
      val (lo, hi) = (mm.getLong(0), mm.getLong(1))
      val t1 = lo + (hi - lo) / 3L
      val t2 = lo + (2L * (hi - lo)) / 3L
      val root = ScratchDir.path(s"sesswin_ivm_${Replay.run()}")
      val cols = Seq($"user_id", $"ts")
      def sentinel(ms: Long): DataFrame = s.range(1)
        .select(lit(-1L).as("user_id"),
          timestamp_millis(lit(ms)).as("ts"))
      val staged = Replay.stageBatches(root, Seq(
        ev.filter($"us" <= t1).select(cols: _*),
        ev.filter($"us" > t1 && $"us" <= t2).select(cols: _*),
        ev.filter($"us" > t2).select(cols: _*),
        sentinel(Sentinel1Ms), sentinel(Sentinel2Ms)))
      Replay.withRocksDb(s) {
        val src = s.readStream
          .schema("user_id BIGINT, ts TIMESTAMP")
          .option("maxFilesPerTrigger", "1").parquet(staged)
        val q = graft.streaming.StreamOps
          .sessionCounts(src, "ts", "30 minutes", "0 seconds",
            Seq("user_id"))
          .writeStream.format("parquet")
          .option("path", s"$root/out")
          .option("checkpointLocation", s"$root/ckpt")
          .outputMode("append")
          .start()
        Replay.drainStagedReplay(q, nFiles = 5)
      }
      s.read.schema("session_window STRUCT<start: TIMESTAMP, " +
          "end: TIMESTAMP>, user_id BIGINT, n BIGINT")
        .parquet(s"$root/out")
        .filter($"user_id" >= 0L)
        .select($"user_id",
          unix_micros($"session_window.start").as("s_start_us"),
          unix_micros($"session_window.end").as("s_end_us"),
          $"n".as("n_events"))
        .orderBy($"user_id", $"s_start_us")
    }),

    // Driver-gated parity row for the windowed-AGGREGATION state
    // store (StateStoreSave/Restore — the oldest stateful path in
    // Structured Streaming, and the last one without a board row):
    // epoch-aligned 7-day tumbling counts + sums per event type
    // through the production tumblingCounts, append mode emitting
    // each window's FINAL row once the watermark passes its end.
    // Replay = event-time thirds + sentinels ('drain' type, filtered
    // — their window never closes and must not leak rows); values
    // ride as exact cents in the double field so window sums fold
    // associatively. The day-split thirds are NOT window-aligned, so
    // boundary windows accumulate partial aggregates across
    // micro-batches — the cross-batch merge the hash proves. Oracle
    // = the one-pass batch rollup on the same µs window floor.
    "q233_tumbling_window_ivm" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.load(s, d, "events")
        .select($"event_type", $"ts",
          round($"value" * 100).cast("long").cast("double").as("value"),
          unix_micros($"ts").as("us"))
      val mm = ev.agg(min($"us"), max($"us")).first
      val (lo, hi) = (mm.getLong(0), mm.getLong(1))
      val t1 = lo + (hi - lo) / 3L
      val t2 = lo + (2L * (hi - lo)) / 3L
      val root = ScratchDir.path(s"tumble_ivm_${Replay.run()}")
      val cols = Seq($"event_type", $"ts", $"value")
      def sentinel(ms: Long): DataFrame = s.range(1)
        .select(lit("drain").as("event_type"),
          timestamp_millis(lit(ms)).as("ts"), lit(0.0).as("value"))
      val staged = Replay.stageBatches(root, Seq(
        ev.filter($"us" <= t1).select(cols: _*),
        ev.filter($"us" > t1 && $"us" <= t2).select(cols: _*),
        ev.filter($"us" > t2).select(cols: _*),
        sentinel(Sentinel1Ms), sentinel(Sentinel2Ms)))
      Replay.withRocksDb(s) {
        val src = s.readStream
          .schema("event_type STRING, ts TIMESTAMP, value DOUBLE")
          .option("maxFilesPerTrigger", "1").parquet(staged)
        val q = graft.streaming.StreamOps
          .tumblingCounts(src, "ts", "7 days", "0 seconds",
            Seq("event_type"))
          .writeStream.format("parquet")
          .option("path", s"$root/out")
          .option("checkpointLocation", s"$root/ckpt")
          .outputMode("append")
          .start()
        Replay.drainStagedReplay(q, nFiles = 5)
      }
      s.read.schema("window STRUCT<start: TIMESTAMP, end: TIMESTAMP>, " +
          "event_type STRING, n BIGINT, sum_value DOUBLE")
        .parquet(s"$root/out")
        .filter($"event_type" =!= "drain")
        .select($"event_type",
          unix_micros($"window.start").as("w_start_us"),
          $"n", $"sum_value")
        .orderBy($"event_type", $"w_start_us")
    }))

  def oracles: Map[String, String] = Map(

    // distinct-digest replay of the production stream's filter +
    // stamp: digest survival is text-pure, so the one-pass form needs
    // no batch structure at all — that's the point of the gate
    "q225_training_prep_ivm" ->
      """WITH scored AS (
           SELECT md5(text) AS digest,
             CAST(len(list_distinct(string_split_regex(lower(text),
               '\s+'))) AS DOUBLE) /
             CAST(len(string_split_regex(lower(text), '\s+'))
               AS DOUBLE) AS ttr
           FROM documents
           WHERE len(text) >= 200),
         d AS (SELECT DISTINCT digest FROM scored WHERE ttr >= 0.3)
         SELECT digest,
           CASE WHEN substr(digest, 1, 1) < 'c' THEN 'train'
                ELSE 'test' END AS split
         FROM d ORDER BY digest""",

    // q52's gap sessionization on the stream's ms clock; the flag
    // replays the replay's OWN closure structure — final session per
    // user closes by timer (the sentinels guarantee it), earlier
    // sessions close by the next arrival EXCEPT the one structural
    // timer case: a batch-1 session whose idle deadline cleared
    // batch 1's closing watermark (w1 = max batch-1 ms) while the
    // user's next event sat in batch 3 — there the timer fires a
    // whole batch ahead of the arrival
    "q226_idle_session_ivm" ->
      """WITH b AS (
           SELECT min(epoch_us(ts)) AS lo, max(epoch_us(ts)) AS hi
           FROM events),
         cuts AS (
           SELECT lo + (hi - lo) // 3 AS t1,
                  lo + (2 * (hi - lo)) // 3 AS t2 FROM b),
         e AS (
           SELECT user_id, epoch_us(ts) AS us,
             epoch_us(ts) // 1000 AS ms,
             CAST(round(value * 100) AS BIGINT) AS cents, event_id
           FROM events),
         w1 AS (
           SELECT max(ms) AS w1ms FROM e, cuts WHERE us <= t1),
         l AS (
           SELECT user_id, us, ms, cents, event_id,
             lag(ms) OVER (PARTITION BY user_id
               ORDER BY ms, event_id) AS prev_ms
           FROM e),
         m AS (
           SELECT user_id, us, ms, cents,
             CAST(sum(CASE WHEN prev_ms IS NULL
                           OR ms - prev_ms >= 1800000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY ms, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS sess
           FROM l),
         sgrp AS (
           SELECT user_id, sess, count(*) AS n_events,
             CAST(sum(cents) AS BIGINT) AS sc,
             max(ms) AS last_ms, min(us) AS first_us
           FROM m GROUP BY user_id, sess),
         sx AS (
           SELECT user_id, sess, n_events, sc, last_ms,
             lead(first_us) OVER (PARTITION BY user_id
               ORDER BY sess) AS next_us,
             max(sess) OVER (PARTITION BY user_id) AS mx
           FROM sgrp)
         SELECT s.user_id, s.n_events,
           CAST(s.sc AS DOUBLE) AS sum_value,
           (s.sess = s.mx
             OR (s.next_us > c.t2 AND s.last_ms + 1800000 <= w.w1ms))
             AS closed_by_timeout
         FROM sx s, cuts c, w1 w
         ORDER BY s.user_id, s.n_events, sum_value, closed_by_timeout""",

    // the one-pass aggregate the served state must equal — q64's
    // merge==recompute proof, now for the real sink path
    "q227_incremental_agg_ivm" ->
      """SELECT user_id AS k, count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS s,
           CAST(min(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS lo,
           CAST(max(CAST(round(value * 100) AS BIGINT)) AS BIGINT) AS hi
         FROM events GROUP BY user_id ORDER BY k""",

    // q52's gap sessionization verbatim (µs clock, >= gap starts a
    // new session, end = last + gap) — what the native session store
    // must reproduce across batch boundaries
    "q232_session_window_ivm" ->
      """WITH e AS (
           SELECT user_id, event_id, epoch_us(ts) AS us,
             lag(epoch_us(ts)) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS prev_us
           FROM events),
         m AS (
           SELECT user_id, us,
             CAST(sum(CASE WHEN prev_us IS NULL
                           OR us - prev_us >= 1800000000
                      THEN 1 ELSE 0 END)
               OVER (PARTITION BY user_id ORDER BY us, event_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS sess
           FROM e)
         SELECT user_id,
           CAST(min(us) AS BIGINT) AS s_start_us,
           CAST(max(us) + 1800000000 AS BIGINT) AS s_end_us,
           count(*) AS n_events
         FROM m GROUP BY user_id, sess
         ORDER BY user_id, s_start_us""",

    // the one-pass weekly rollup on the same epoch-aligned µs floor
    "q233_tumbling_window_ivm" ->
      """SELECT event_type,
           CAST((epoch_us(ts) // 604800000000) * 604800000000
             AS BIGINT) AS w_start_us,
           count(*) AS n,
           CAST(sum(CAST(round(value * 100) AS BIGINT)) AS DOUBLE)
             AS sum_value
         FROM events
         GROUP BY 1, 2 ORDER BY event_type, w_start_us""",

    // the batch LEFT join the staged streaming replay must equal —
    // matched pairs exactly as q212's inner oracle, unmatched clicks
    // with nulls (the rows only watermark expiry can emit)
    "q228_outer_interval_ivm" ->
      """SELECT c.user_id, c.event_id AS click_id, c.ts AS click_ts,
           p.event_id AS purchase_id, p.ts AS purchase_ts, p.value
         FROM events c LEFT JOIN events p
           ON p.user_id = c.user_id AND p.event_type = 'purchase'
           AND p.ts >= c.ts AND p.ts <= c.ts + INTERVAL 30 MINUTE
         WHERE c.event_type = 'click'
         ORDER BY click_id, purchase_id""")
}
