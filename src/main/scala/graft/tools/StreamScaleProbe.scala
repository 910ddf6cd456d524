package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.{ScratchDir, Tables}
import graft.queries.Replay

/** State-store decade probe for the streaming-parity paths (r18
  * verdict item #5): the IVM rows gate correctness at sf0.001–1
  * where harness latency dominates, but nothing yet MEASURES how the
  * RocksDB state store grows with the corpus. This probe replays the
  * two production windowed-aggregation paths (the same
  * StreamOps.sessionCounts / tumblingCounts chains behind
  * q232/q233) over the events table at sf0.1 → sf1 → sf10
  * (driver testdata + the Sf1Probe/Sf10Probe corpora) and reports,
  * per decade, from the runtime's own StreamingQueryProgress:
  *
  *   - rows streamed vs PEAK state rows (`stateOperators[].
  *     numRowsTotal`) — the "state ∝ keys (windows/sessions), not
  *     rows" claim, measured: tumbling state is (event_type ×
  *     7-day-window) pairs, fixed by the clock span as rows grow
  *     10×; session state is live sessions, sub-linear in rows;
  *   - per-batch latency (`durationMs.triggerExecution` median/max)
  *     and state commit time (`stateOperators[].commitTimeMs`) —
  *     the checkpoint-cost growth a 100 TB deployment budgets;
  *   - peak state memory (`stateOperators[].memoryUsedBytes`).
  *
  * Same staging discipline as the board rows (event-time thirds +
  * two far-future sentinels, mtime-ordered maxFilesPerTrigger=1
  * replay on real RocksDB via Replay.withRocksDb). Run on an idle
  * box, fresh JVM (r16 lesson):
  *
  *   sbt "runMain graft.tools.StreamScaleProbe"
  *   sbt "runMain graft.tools.StreamScaleProbe only=tumbling"
  */
object StreamScaleProbe {

  // far-future sentinels (q185's epoch-pinned values)
  private val Sentinel1Ms = 1748736000000L
  private val Sentinel2Ms = 1748822400000L

  case class Decade(label: String, dir: String)

  val decades: Seq[Decade] = Seq(
    Decade("sf0.1", "/root/testdata/sf0.1"),
    Decade("sf1", "/tmp/graft-sf1"),
    Decade("sf10", "/tmp/graft-sf10"))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val only = args.collectFirst {
      case a if a.startsWith("only=") =>
        a.stripPrefix("only=").split(",").map(_.trim).toSet
    }
    val paths = Seq("session", "tumbling")
      .filter(p => only.forall(_.contains(p)))

    println("| path | sf | rows | batches | peak state rows | " +
      "peak state MB | trigger med/max ms | commit med/max ms | " +
      "wall s |")
    println("|---|---|---|---|---|---|---|---|---|")

    paths.foreach { path =>
      decades.foreach { dec =>
        if (!new java.io.File(dec.dir).isDirectory) {
          println(s"| $path | ${dec.label} | (corpus missing: " +
            s"${dec.dir} — run Sf1Probe/Sf10Probe genonly) | | | | | | |")
        } else {
          val ev = Tables.load(spark, dec.dir, "events")
            .select($"user_id", $"event_type", $"ts",
              round($"value" * 100).cast("long").cast("double")
                .as("value"),
              unix_micros($"ts").as("us"))
          val mm = ev.agg(min($"us"), max($"us"), count(lit(1))).first
          val (lo, hi, nRows) =
            (mm.getLong(0), mm.getLong(1), mm.getLong(2))
          val t1 = lo + (hi - lo) / 3L
          val t2 = lo + (2L * (hi - lo)) / 3L
          val root = ScratchDir.path(
            s"streamscale_${path}_${dec.label}_${Replay.run()}")

          val (cols, schema, mkSentinel, build) = path match {
            case "session" => (
              Seq($"user_id", $"ts"),
              "user_id BIGINT, ts TIMESTAMP",
              (ms: Long) => spark.range(1)
                .select(lit(-1L).as("user_id"),
                  timestamp_millis(lit(ms)).as("ts")),
              (src: DataFrame) => graft.streaming.StreamOps
                .sessionCounts(src, "ts", "30 minutes", "0 seconds",
                  Seq("user_id")))
            case "tumbling" => (
              Seq($"event_type", $"ts", $"value"),
              "event_type STRING, ts TIMESTAMP, value DOUBLE",
              (ms: Long) => spark.range(1)
                .select(lit("drain").as("event_type"),
                  timestamp_millis(lit(ms)).as("ts"),
                  lit(0.0).as("value")),
              (src: DataFrame) => graft.streaming.StreamOps
                .tumblingCounts(src, "ts", "7 days", "0 seconds",
                  Seq("event_type")))
          }

          val staged = Replay.stageBatches(root, Seq(
            ev.filter($"us" <= t1).select(cols: _*),
            ev.filter($"us" > t1 && $"us" <= t2).select(cols: _*),
            ev.filter($"us" > t2).select(cols: _*),
            mkSentinel(Sentinel1Ms), mkSentinel(Sentinel2Ms)))

          val t0 = System.nanoTime()
          val progress = Replay.withRocksDb(spark) {
            val src = spark.readStream.schema(schema)
              .option("maxFilesPerTrigger", "1").parquet(staged)
            val q = build(src)
              .writeStream.format("parquet")
              .option("path", s"$root/out")
              .option("checkpointLocation", s"$root/ckpt")
              .outputMode("append")
              .start()
            Replay.drainStagedReplay(q, nFiles = 5)
            q.recentProgress.toSeq // readable after stop
          }
          val wall = (System.nanoTime() - t0) / 1e9

          // data batches only: a progress row with zero input rows is
          // a maintenance/no-data batch — its trigger wall is noise
          val data = progress.filter(_.numInputRows > 0)
          def med(xs: Seq[Long]): Long =
            if (xs.isEmpty) 0L else xs.sorted.apply(xs.size / 2)
          val trig = data.map(p =>
            p.durationMs.getOrDefault("triggerExecution", 0L).longValue)
          val stateOps = data.flatMap(_.stateOperators.toSeq)
          val commits = stateOps.map(_.commitTimeMs)
          val peakRows =
            if (stateOps.isEmpty) 0L else stateOps.map(_.numRowsTotal).max
          val peakMem =
            if (stateOps.isEmpty) 0L
            else stateOps.map(_.memoryUsedBytes).max
          println(f"| $path | ${dec.label} | $nRows | ${data.size} " +
            f"| $peakRows | ${peakMem / 1e6}%.1f " +
            f"| ${med(trig)}/${if (trig.isEmpty) 0L else trig.max} " +
            f"| ${med(commits)}/${if (commits.isEmpty) 0L else commits.max} " +
            f"| $wall%.1f |")
        }
      }
    }
    spark.stop()
  }
}
