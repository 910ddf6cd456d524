package graft.queries

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, ScratchDir, Tables}

/** Round-15 frontier (batch 1): the decontamination-guard IVM twin
  * (completing the streaming-parity set the r14 verdict named), the
  * Ljung–Box portmanteau test, Mood's median test, a Cramér's V
  * association panel, and a Page–Hinkley drift monitor.
  *
  * Reference note: the reference engine (`/root/reference/`, a Go log
  * forwarder — SURVEY.md §1) has no analytics surface; these extend
  * the Insights/Frontier families under the house disciplines —
  * exact integer domains until one final IEEE assembly (decimal(38,0)
  * where 64-bit products can overflow), order-deterministic double
  * folds (sort_array + `aggregate` HOF, mirrored by DuckDB's ordered
  * `list(...)` + `list_reduce` — the q92 discipline), `Tables.nz` on
  * signable float outputs, bounded collects only, and DuckDB oracles
  * replaying the identical arithmetic.
  */
object Frontier5 {

  // The staged-replay machinery (stageBatches / drainStagedReplay /
  // withRocksDb / the ivmRun uniquifier) was proven here across
  // q186/q195/q196/q212/q217 and moved to [[Replay]] in round 18 so
  // the q225–q228 parity rows share it.

  def queries: Map[String, Q] = Map(

    // IVM parity twin of the streaming decontamination guard — the
    // last of the stateful ops the r14 verdict named (q180 CUSUM,
    // q184 lateness, q185 window-top-k, and now the quarantine path).
    // Documents arriving after the held-out corpus (doc_id >= 250,
    // the dedup_minhash_incremental pivot) are replayed through the
    // PRODUCTION StreamOps.decontaminationGuard as three id-ordered
    // micro-batches; each invocation runs the MinHash screen against
    // the corpus and APPENDS flagged docs to the parquet quarantine
    // log — and that accumulated log is what the oracle hashes. The
    // oracle recomputes the screen in one pass over the full table
    // (band-collision candidates × exact-Jaccard ≥ 0.5 verify, the
    // committed minhash CTE replay), so the hash match proves the
    // per-batch guard quarantines exactly the docs a full-corpus
    // screen would — batch boundaries can neither hide a contaminated
    // doc nor flag a clean one (per-doc decisions depend only on
    // (doc, corpus), a property the replay certifies rather than
    // assumes). Batch ids are the id-range thirds, replayed by the
    // oracle in integer arithmetic.
    "q186_decontam_ivm" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.load(s, d, "documents")
      val test = docs.filter($"doc_id" < 250L).select($"doc_id", $"text")
      val train = docs.filter($"doc_id" >= 250L)
        .select($"doc_id", $"text")
      // bounded driver scalar (1 row) — the same arrival-cut pattern
      // as q184's event_id thirds
      val cut = docs.agg(max($"doc_id")).first.getLong(0)
      val r = cut - 250L
      val t1 = 250L + r / 3L
      val t2 = 250L + (2L * r) / 3L
      val qdir = ScratchDir.path(
        s"decontam_ivm_${Replay.run()}") + "/quarantine"
      Seq($"doc_id" <= t1,
        $"doc_id" > t1 && $"doc_id" <= t2,
        $"doc_id" > t2).zipWithIndex.foreach { case (pred, i) =>
        graft.streaming.StreamOps.decontaminationGuard(test, qdir)(
          train.filter(pred), i.toLong)
      }
      // explicit schema: a batch with zero flagged docs appends no
      // part files, and an all-clean corpus would leave the log
      // schema-less — the read must not depend on that
      s.read.schema("doc_id BIGINT, batch_id BIGINT").parquet(qdir)
        .select($"batch_id", $"doc_id")
        .orderBy($"batch_id", $"doc_id")
    }),

    // Driver-gated parity row for the v2 QuotaProcessor (r15 verdict
    // item #4 — quotaStream was spec-only while q185 proved the
    // replay pattern): the events table is replayed in ARRIVAL order
    // (event_id, q184's proxy) as three staged parquet batches
    // through the PRODUCTION transformWithState path — RocksDB
    // provider (the v2 runtime requirement), file source with
    // maxFilesPerTrigger=1, append mode — admitting the first 5
    // events per user with a running count. No sentinels: quota has
    // no timers/watermark, so AvailableNow drains every batch.
    // Within a batch the processor admits in event_id order and
    // batches partition the id range in order, so global admission ==
    // first-5-by-event_id per user — which is exactly the oracle's
    // one-pass row_number replay: the hash match proves the per-key
    // ValueState count carries across real micro-batch boundaries.
    "q195_quota_ivm" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.load(s, d, "events")
        .select($"user_id", $"event_id", $"value")
      val cut = ev.agg(max($"event_id")).first.getLong(0)
      val root = ScratchDir.path(
        s"quota_ivm_${Replay.run()}")
      val staging = Replay.stageBatches(root, Seq(
        ev.filter($"event_id" <= cut / 3),
        ev.filter($"event_id" > cut / 3 && $"event_id" <= 2 * cut / 3),
        ev.filter($"event_id" > 2 * cut / 3)))
      Replay.withRocksDb(s) {
        val src = s.readStream
          .schema("user_id BIGINT, event_id BIGINT, value DOUBLE")
          .option("maxFilesPerTrigger", "1").parquet(staging)
          .as[graft.streaming.StreamOps.QuotaEvent]
        val q = graft.streaming.StreamOps.quotaStream(src, limit = 5L)
          .writeStream.format("parquet")
          .option("path", s"$root/out")
          .option("checkpointLocation", s"$root/ckpt")
          .outputMode("append")
          .start()
        Replay.drainStagedReplay(q, nFiles = 3)
      }
      s.read.schema("user_id BIGINT, event_id BIGINT, n_allowed BIGINT")
        .parquet(s"$root/out")
        .select($"user_id", $"event_id", $"n_allowed")
        .orderBy($"user_id", $"event_id")
    }),

    // Driver-gated parity row for the v2 TTL seen-guard (the other
    // spec-only processor the r15 verdict named). Same replay
    // harness; the guard's "seen" mark is a ValueState with a REAL
    // TTLConfig (1 h) under TimeMode.ProcessingTime — the declarative
    // state-eviction path through the real RocksDB store. One hour
    // dwarfs the replay's wall clock, so no mark expires mid-run and
    // the admission semantics are deterministic: per user, exactly
    // the globally-first event (batches are id-ordered and the
    // processor takes the within-batch min) — the oracle's
    // min(event_id) per user. Clock-driven EXPIRY (readmission after
    // the mark dies) is inherently wall-time-dependent and stays
    // pinned by StreamOpsSpec's real-clock test; this row gates the
    // TTL-configured state path end-to-end where the driver can hash
    // it.
    "q196_ttl_ivm" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.load(s, d, "events")
        .select($"user_id", $"event_id")
      val cut = ev.agg(max($"event_id")).first.getLong(0)
      val root = ScratchDir.path(
        s"ttl_ivm_${Replay.run()}")
      val staging = Replay.stageBatches(root, Seq(
        ev.filter($"event_id" <= cut / 3),
        ev.filter($"event_id" > cut / 3 && $"event_id" <= 2 * cut / 3),
        ev.filter($"event_id" > 2 * cut / 3)))
      Replay.withRocksDb(s) {
        val src = s.readStream
          .schema("user_id BIGINT, event_id BIGINT")
          .option("maxFilesPerTrigger", "1").parquet(staging)
          .as[graft.streaming.StreamOps.SeenEvent]
        val q = graft.streaming.StreamOps
          .ttlSeenGuardStream(src, ttlMs = 3600000L)
          .writeStream.format("parquet")
          .option("path", s"$root/out")
          .option("checkpointLocation", s"$root/ckpt")
          .outputMode("append")
          .start()
        Replay.drainStagedReplay(q, nFiles = 3)
      }
      s.read.schema("user_id BIGINT, event_id BIGINT")
        .parquet(s"$root/out")
        .select($"user_id", $"event_id")
        .orderBy($"user_id")
    }),

    // Driver-gated parity row for the stream-stream interval join —
    // the last spec-only streaming operator after q195/q196 closed
    // the v2 processors. Clicks and purchases are staged as two
    // SEPARATE file-source streams, each cut into the same
    // EVENT-TIME thirds (min/max-µs driver scalars), so arrival
    // order respects event time and the 1 h watermark can never drop
    // a row: a click expires from join state only once the watermark
    // passes click_ts + 30 min, and any purchase it could still
    // match would itself lie beyond that watermark — so the staged
    // replay through the PRODUCTION intervalJoinStream (symmetric
    // hash join, real RocksDB store, both sides watermarked,
    // maxFilesPerTrigger=1 advancing the two sources in lockstep)
    // emits EXACTLY the batch interval join, which is what the
    // oracle replays. The hash match proves buffered-side state
    // carries matches across micro-batch boundaries (a batch-2
    // purchase finds its batch-1 click) without duplication.
    "q212_interval_join_ivm" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.load(s, d, "events")
        .filter($"event_type".isin("click", "purchase"))
        .select($"user_id", $"ts", $"event_id", $"value",
          $"event_type", unix_micros($"ts").as("us"))
      val mm = ev.agg(min($"us"), max($"us")).first
      val (lo, hi) = (mm.getLong(0), mm.getLong(1))
      val t1 = lo + (hi - lo) / 3L
      val t2 = lo + (2L * (hi - lo)) / 3L
      val root = ScratchDir.path(
        s"ijoin_ivm_${Replay.run()}")
      def thirds(df: DataFrame): Seq[DataFrame] = Seq(
        df.filter($"us" <= t1), df.filter($"us" > t1 && $"us" <= t2),
        df.filter($"us" > t2))
      val cStage = Replay.stageBatches(s"$root/clicks", thirds(
        ev.filter($"event_type" === "click")
          .select($"user_id", $"ts", $"event_id", $"us")))
      val pStage = Replay.stageBatches(s"$root/purchases", thirds(
        ev.filter($"event_type" === "purchase")
          .select($"user_id", $"ts", $"event_id", $"value", $"us")))
      // the 4-state-partition pin lives inside Replay.withRocksDb now
      // (measured here first: 12.7 s @32 → 8.1 @8 → 7.1 @4 at sf0.1,
      // cpu 105 → 26 — the symmetric hash join opens FOUR RocksDB
      // stores per partition per micro-batch)
      Replay.withRocksDb(s) {
        val clicks = s.readStream
          .schema("user_id BIGINT, ts TIMESTAMP, event_id BIGINT, us BIGINT")
          .option("maxFilesPerTrigger", "1").parquet(cStage)
        val purchases = s.readStream
          .schema("user_id BIGINT, ts TIMESTAMP, event_id BIGINT, " +
            "value DOUBLE, us BIGINT")
          .option("maxFilesPerTrigger", "1").parquet(pStage)
        val q = graft.streaming.StreamOps
          .intervalJoinStream(clicks, purchases)
          .writeStream.format("parquet")
          .option("path", s"$root/out")
          .option("checkpointLocation", s"$root/ckpt")
          .outputMode("append")
          .start()
        Replay.drainStagedReplay(q, nFiles = 3)
      }
      s.read.schema("user_id BIGINT, purchase_id BIGINT, " +
          "purchase_ts TIMESTAMP, click_id BIGINT, " +
          "click_ts TIMESTAMP, value DOUBLE")
        .parquet(s"$root/out")
        .select($"user_id", $"purchase_id", $"purchase_ts",
          $"click_id", $"click_ts", $"value")
        .orderBy($"purchase_id", $"click_id")
    }),

    // Driver-gated parity row for the streaming as-of enrichment —
    // the oldest streaming twin without one (r16 verdict item #4;
    // q27_asof_join is its batch twin, StreamOpsSpec pins the
    // constructed cross-batch carry). Clicks + purchases ride ONE
    // stream: asofEnrichStream keeps O(1) last-click state per user
    // (flatMapGroupsWithState), not a buffered window — the
    // complement of q212's symmetric hash join. Staged as three
    // EVENT-TIME thirds (min/max-µs driver scalars), so arrival
    // respects event time: no purchase precedes a click it should
    // see, equal timestamps land in one batch (the same µs cut), and
    // the carried RocksDB state provides the "past" side across
    // batches — a batch-1 click enriches a batch-3 purchase with no
    // rescan. The replay must therefore hash-equal the BATCH as-of
    // join, which is what the oracle (DuckDB native ASOF JOIN, q27's
    // exact form) replays; the tie-breaks match by construction
    // (within-batch sort puts clicks before purchases at equal ts,
    // max event_id wins among simultaneous clicks).
    "q217_asof_ivm" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.load(s, d, "events")
        .filter($"event_type".isin("click", "purchase"))
        .select($"user_id", $"ts", $"event_type", $"event_id",
          $"value", unix_micros($"ts").as("us"))
      val mm = ev.agg(min($"us"), max($"us")).first
      val (lo, hi) = (mm.getLong(0), mm.getLong(1))
      val t1 = lo + (hi - lo) / 3L
      val t2 = lo + (2L * (hi - lo)) / 3L
      val root = ScratchDir.path(
        s"asof_ivm_${Replay.run()}")
      val cols = Seq($"user_id", $"ts", $"event_type", $"event_id",
        $"value")
      val staged = Replay.stageBatches(root, Seq(
        ev.filter($"us" <= t1).select(cols: _*),
        ev.filter($"us" > t1 && $"us" <= t2).select(cols: _*),
        ev.filter($"us" > t2).select(cols: _*)))
      Replay.withRocksDb(s) {
        val src = s.readStream
          .schema("user_id BIGINT, ts TIMESTAMP, event_type STRING, " +
            "event_id BIGINT, value DOUBLE")
          .option("maxFilesPerTrigger", "1").parquet(staged)
          .as[graft.streaming.StreamOps.TypedEvent]
        val q = graft.streaming.StreamOps.asofEnrichStream(src)
          .writeStream.format("parquet")
          .option("path", s"$root/out")
          .option("checkpointLocation", s"$root/ckpt")
          .outputMode("append")
          .start()
        Replay.drainStagedReplay(q, nFiles = 3)
      }
      s.read.schema("event_id BIGINT, user_id BIGINT, ts TIMESTAMP, " +
          "click_event_id BIGINT, click_value DOUBLE")
        .parquet(s"$root/out")
        .select($"event_id", $"user_id", $"ts", $"click_event_id",
          $"click_value")
        .orderBy($"event_id")
    }),

    // Ljung–Box portmanteau test (lags 1..7) on each type's daily
    // revenue series — "is there ANY autocorrelation left" as one
    // statistic, the standard post-fit whiteness check next to
    // q176's Durbin–Watson (which reads only lag 1) and q132's ACF
    // (which reports the lags separately, on observed days only).
    // The series is the gap-filled complete day grid (span-bounded —
    // data-size-independent after the daily rollup; missing days are
    // genuine zeros, as in q127/q174), so lag pairs are well-defined
    // calendar shifts. Sample autocorrelations use the standard
    // full-series-mean estimator: rho_k assembles from exact
    // decimal(38,0) sums (pair products Σv_t·v_{t+k}, head/tail sums,
    // and the type's Σv, Σv² — daily cent sums past 2^31 square past
    // 2^63, the q157 discipline) in one fixed IEEE expression;
    // Q = n(n+2)·Σ rho_k²/(n−k) folds the 7 terms in lag order
    // (sort_array + aggregate, the q92 order-deterministic fold). A
    // zero-variance series yields NULL rho → NULL Q on both engines.
    "q187_ljung_box" -> ((s, d) => {
      import s.implicits._
      val dec = "decimal(38,0)"
      val daily = Tables.load(s, d, "events")
        .select($"event_type", to_date($"ts").as("day"),
          round($"value" * 100).cast("long").as("cents"))
        .groupBy($"event_type", $"day").agg(sum($"cents").as("v"))
      val span = daily.agg(min($"day").as("d0"), max($"day").as("d1"))
      val types = daily.select($"event_type").distinct()
      val grid = span
        .select(explode(sequence($"d0", $"d1")).as("day"), $"d0",
          (datediff($"d1", $"d0") + 1).cast("long").as("n"))
        .crossJoin(broadcast(types))
        .join(daily, Seq("event_type", "day"), "left")
        .select($"event_type", $"n",
          datediff($"day", $"d0").cast("long").as("t"),
          coalesce($"v", lit(0L)).as("v"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val tot = grid.groupBy($"event_type")
        .agg(min($"n").as("n"), sum($"v".cast(dec)).as("s"),
          sum(($"v".cast(dec) * $"v").cast(dec)).as("ss"))
      val lagged = grid
        .select($"event_type", $"t", $"v".as("v1"),
          explode(sequence(lit(1L), lit(7L))).as("lag"))
        .withColumn("t2", $"t" + $"lag")
        .join(grid.select($"event_type", $"t".as("t2"), $"v".as("v2")),
          Seq("event_type", "t2"))
        .groupBy($"event_type", $"lag")
        .agg(sum(($"v1".cast(dec) * $"v2").cast(dec)).as("sp"),
          sum($"v1".cast(dec)).as("sh"),
          sum($"v2".cast(dec)).as("st"))
      val terms = lagged.join(broadcast(tot), Seq("event_type"))
        .withColumn("nd", $"n".cast("double"))
        .withColumn("m", $"s".cast("double") / $"nd")
        .withColumn("num", $"sp".cast("double") -
          $"m" * ($"sh".cast("double") + $"st".cast("double")) +
          ($"nd" - $"lag".cast("double")) * $"m" * $"m")
        .withColumn("c0", $"ss".cast("double") - $"nd" * $"m" * $"m")
        .withColumn("rho",
          when($"c0" === 0.0, lit(null).cast("double"))
            .otherwise($"num" / $"c0"))
        .withColumn("term",
          $"rho" * $"rho" / ($"nd" - $"lag".cast("double")))
      terms.groupBy($"event_type")
        .agg(min($"n").as("n_days"), min($"nd").as("nd"),
          sort_array(collect_list(struct($"lag", $"term"))).as("cs"))
        .select($"event_type", $"n_days", lit(7L).as("df"),
          Tables.nz(round($"nd" * ($"nd" + 2.0) * expr(
            """aggregate(cs, cast(0.0 as double),
               (acc, c) -> acc + c.term)"""), 4)).as("lb_stat"))
        .orderBy($"event_type")
    }),

    // Mood's median test across market segments on order value — the
    // nonparametric "do the segments share a median" screen that
    // stays valid under the heavy right tail that invalidates
    // q179's ANOVA readout (q178's Kruskal–Wallis ranks everything;
    // this one needs only one pooled median and per-segment counts,
    // the cheapest possible k-sample location test). Pooled median
    // via percentile_cont over exact cents (the q71-proven
    // interpolation parity); per segment, the 2×k table of counts
    // above/≤ the median; chi² assembles each cell's (O−E)²/E in one
    // fixed IEEE expression and folds the segment terms in name
    // order (q92 discipline). Degenerate panels (all or no values
    // above the pooled median) yield NULL chi² on both engines.
    "q188_mood_median" -> ((s, d) => {
      import s.implicits._
      val oc = Tables.load(s, d, "orders")
        .join(broadcast(Tables.load(s, d, "customer")
          .select($"c_custkey", $"c_mktsegment")),
          $"o_custkey" === $"c_custkey")
        .select($"c_mktsegment".as("segment"),
          round($"o_totalprice" * 100).cast("long").as("cents"))
      val med = oc.agg(
        expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY cents)")
          .as("med"))
      val per = oc.crossJoin(broadcast(med))
        .groupBy($"segment")
        .agg(count(lit(1)).as("n_g"),
          sum(when($"cents" > $"med", 1L).otherwise(0L)).as("a_g"))
      val tot = per.agg(sum($"n_g").as("nn"), sum($"a_g").as("aa"),
        count(lit(1)).as("k"))
      val cells = per.crossJoin(broadcast(tot))
        .withColumn("ea", $"n_g".cast("double") *
          $"aa".cast("double") / $"nn".cast("double"))
        .withColumn("eb", $"n_g".cast("double") *
          ($"nn".cast("double") - $"aa".cast("double")) /
          $"nn".cast("double"))
        .withColumn("term",
          when($"aa" === 0L || $"aa" === $"nn",
            lit(null).cast("double"))
            .otherwise(
              ($"a_g".cast("double") - $"ea") *
                ($"a_g".cast("double") - $"ea") / $"ea" +
              (($"n_g" - $"a_g").cast("double") - $"eb") *
                (($"n_g" - $"a_g").cast("double") - $"eb") / $"eb"))
      val stat = cells
        .agg(sort_array(collect_list(struct($"segment", $"term")))
          .as("cs"), min($"k").as("k"))
        .select(expr(
          """aggregate(cs, cast(0.0 as double),
             (acc, c) -> acc + c.term)""").as("chi2raw"),
          ($"k" - 1L).as("df"))
      cells.crossJoin(broadcast(stat))
        .select($"segment", $"n_g", $"a_g".as("n_above"),
          Tables.nz(round($"ea", 4)).as("exp_above"),
          Tables.nz(round($"chi2raw", 4)).as("chi2"), $"df")
        .orderBy($"segment")
    }),

    // Cramér's V association panel — effect-size-normalized chi² for
    // a fixed list of categorical column pairs, the "is this
    // dependence LARGE or merely significant" companion to q92's
    // single chi² (V is comparable across tables of different size
    // and shape; a 0.02 V on 6M rows is real but negligible).
    // Contingency cells are key-domain-bounded groupBys (never
    // row-sized); the chi² deviation N·O−R·C squares past 2^63 once
    // N nears ~3e9 (inside the 100 TB shape), so it assembles in
    // decimal(38,0) and casts the exact integer to double once (the
    // q92 discipline, HUGEINT on the DuckDB side); cell terms fold
    // in (row, col) order. V = sqrt(chi²/(N·(min(r,c)−1))).
    "q189_cramers_v" -> ((s, d) => {
      import s.implicits._
      val dec = "decimal(38,0)"
      def cram(cells0: DataFrame, label: String): DataFrame = {
        val cells = cells0.toDF("a", "b", "o")
        val rowc = cells.groupBy($"a").agg(sum($"o").as("rn"))
        val colc = cells.groupBy($"b").agg(sum($"o").as("cn"))
        val tot = cells.agg(sum($"o").as("nn"),
          countDistinct($"a").as("r"), countDistinct($"b").as("c"))
        val terms = cells
          .join(broadcast(rowc), Seq("a"))
          .join(broadcast(colc), Seq("b"))
          .crossJoin(broadcast(tot))
          .withColumn("dv",
            ($"nn".cast(dec) * $"o" - $"rn".cast(dec) * $"cn")
              .cast("double"))
          .withColumn("term", $"dv" * $"dv" /
            ($"nn".cast("double") * $"rn".cast("double") *
              $"cn".cast("double")))
        terms
          .agg(min($"nn").as("nn"), min($"r").as("r"),
            min($"c").as("c"),
            sort_array(collect_list(struct($"a", $"b", $"term")))
              .as("cs"))
          .withColumn("chi2raw", expr(
            """aggregate(cs, cast(0.0 as double),
               (acc, c) -> acc + c.term)"""))
          .select(lit(label).as("pair"), $"nn".as("n"),
            $"r".as("n_rows"), $"c".as("n_cols"),
            Tables.nz(round($"chi2raw", 4)).as("chi2"),
            Tables.nz(round(sqrt($"chi2raw" /
              ($"nn".cast("double") *
                (least($"r", $"c") - 1L).cast("double"))), 6))
              .as("cramers_v"))
      }
      val li = Tables.load(s, d, "lineitem")
      val pa = Tables.load(s, d, "part")
      val or = Tables.load(s, d, "orders")
      val cu = Tables.load(s, d, "customer")
      cram(li.groupBy($"l_returnflag".as("a"), $"l_linestatus".as("b"))
          .agg(count(lit(1)).as("o")), "return_status")
        .unionByName(cram(
          pa.groupBy($"p_brand".as("a"),
              $"p_size".cast("string").as("b"))
            .agg(count(lit(1)).as("o")), "brand_size"))
        .unionByName(cram(
          or.groupBy($"o_orderpriority".as("a"),
              $"o_orderstatus".as("b"))
            .agg(count(lit(1)).as("o")), "priority_status"))
        .unionByName(cram(
          cu.groupBy($"c_mktsegment".as("a"),
              $"c_nationkey".cast("string").as("b"))
            .agg(count(lit(1)).as("o")), "segment_nation"))
        .orderBy($"pair")
    }),

    // Page–Hinkley drift monitor on each type's daily revenue — the
    // sequential change detector next to q84's CUSUM (CUSUM tracks
    // one-sided drift from a reference mean with a per-step
    // allowance; Page–Hinkley reads the gap between the cumulative
    // deviation and its running minimum, the classic "has the level
    // shifted upward since ANY past point" alarm). The reference
    // level is the type's span mean, snapped to an integer pivot
    // (q174's piv discipline) so the cumulative walk m_t, its prefix
    // minimum M_t, and the PH statistic m_t−M_t are EXACT longs —
    // no float prefix sums (a windowed double running sum would be
    // association-order-sensitive and break cross-engine hashing).
    // The alarm threshold λ = round(2·sd) comes from the exact
    // decimal moments in one fixed IEEE expression. All windows
    // partition by event_type over the span-bounded day grid.
    "q190_page_hinkley" -> ((s, d) => {
      import s.implicits._
      val dec = "decimal(38,0)"
      val daily = Tables.load(s, d, "events")
        .select($"event_type", to_date($"ts").as("day"),
          round($"value" * 100).cast("long").as("cents"))
        .groupBy($"event_type", $"day").agg(sum($"cents").as("v"))
      val span = daily.agg(min($"day").as("d0"), max($"day").as("d1"))
      val types = daily.select($"event_type").distinct()
      val grid = span
        .select(explode(sequence($"d0", $"d1")).as("day"),
          (datediff($"d1", $"d0") + 1).cast("long").as("n"))
        .crossJoin(broadcast(types))
        .join(daily, Seq("event_type", "day"), "left")
        .select($"event_type", $"day", $"n",
          coalesce($"v", lit(0L)).as("v"))
      val tot = grid.groupBy($"event_type")
        .agg(min($"n").as("n"), sum($"v".cast(dec)).as("s"),
          sum(($"v".cast(dec) * $"v").cast(dec)).as("ss"))
        .withColumn("nd", $"n".cast("double"))
        .withColumn("m", $"s".cast("double") / $"nd")
        .withColumn("piv", round($"m").cast("long"))
        .withColumn("vr", greatest(
          $"ss".cast("double") / $"nd" - $"m" * $"m", lit(0.0)))
        .withColumn("lambda",
          round(lit(2.0) * sqrt($"vr")).cast("long"))
        .select($"event_type", $"piv", $"lambda")
      val w = Window.partitionBy($"event_type").orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val walk = grid.join(broadcast(tot), Seq("event_type"))
        .withColumn("dev", $"v" - $"piv")
        .withColumn("mt", sum($"dev").over(w))
        .withColumn("ph", $"mt" - min($"mt").over(w))
        .withColumn("alarm", $"ph" > $"lambda")
      walk.groupBy($"event_type")
        .agg(min($"n").as("n_days"), min($"lambda").as("lambda"),
          sum(when($"alarm", 1L).otherwise(0L)).as("n_alarm_days"),
          date_format(min(when($"alarm", $"day")), "yyyy-MM-dd")
            .as("first_alarm_day"),
          max($"ph").as("max_ph"))
        .orderBy($"event_type")
    }),

    // Tukey HSD post-hoc panel — WHICH weekday pairs differ, once
    // q179's omnibus F rejects (an omnibus test only says "not all
    // equal"; every dashboard's next question is the pairwise one).
    // The studentized-range statistic q = |m_a − m_b| /
    // √(MSW/2·(1/n_a+1/n_b)) assembles per pair from the SAME exact
    // decimal(38,0) weekday moments as q179 (shared-derivation
    // discipline): group means are single IEEE divides of exact
    // sums, MSW folds Σ(Σv_g)²/n_g in weekday order (q92 fold), and
    // the 7×6/2 = 21-pair frame is a broadcast self-join of the
    // ≤7-row panel. Degenerate guards (k < 2, n ≤ k, SSW ≤ 0) yield
    // NULL q on both engines.
    "q191_tukey_hsd" -> ((s, d) => {
      import s.implicits._
      val dec = "decimal(38,0)"
      val o = Tables.load(s, d, "orders")
        .select(round($"o_totalprice" * 100).cast("long").as("v"),
          pmod(datediff(to_date($"o_orderdate"), lit("1970-01-05")),
            lit(7)).cast("long").as("wd"))
      val grp = o.groupBy($"wd")
        .agg(count(lit(1)).as("ng"),
          sum($"v".cast(dec)).as("sg"),
          sum(($"v".cast(dec) * $"v").cast(dec)).as("sgg"))
      val panel = grp.agg(count(lit(1)).as("k"),
          sum($"ng").cast(dec).as("n"),
          sum($"sgg").cast(dec).as("svv"),
          sort_array(collect_list(struct($"wd", $"ng", $"sg")))
            .as("arr"))
        .withColumn("sbterm", expr(
          """aggregate(arr, CAST(0.0 AS DOUBLE), (a, x) ->
             a + (CAST(x.sg AS DOUBLE) * CAST(x.sg AS DOUBLE)) /
               CAST(x.ng AS DOUBLE))"""))
        .withColumn("msw",
          when($"k" < 2L || $"n" <= $"k".cast(dec) ||
              ($"svv".cast("double") - $"sbterm") <= 0.0,
            lit(null).cast("double"))
            .otherwise(($"svv".cast("double") - $"sbterm") /
              ($"n".cast("double") - $"k".cast("double"))))
        .select($"msw")
      val a = grp.select($"wd".as("wd_a"), $"ng".as("na"),
        ($"sg".cast("double") / $"ng".cast("double")).as("ma"))
      val b = grp.select($"wd".as("wd_b"), $"ng".as("nb"),
        ($"sg".cast("double") / $"ng".cast("double")).as("mb"))
      a.join(b, $"wd_a" < $"wd_b").crossJoin(broadcast(panel))
        .select($"wd_a", $"wd_b", $"na", $"nb",
          Tables.nz(round(($"ma" - $"mb") / 100.0, 4))
            .as("mean_diff"),
          Tables.nz(round(abs($"ma" - $"mb") /
            sqrt($"msw" / 2.0 *
              (lit(1.0) / $"na".cast("double") +
               lit(1.0) / $"nb".cast("double"))), 4)).as("q_stat"))
        .orderBy($"wd_a", $"wd_b")
    }),

    // Bartlett's homogeneity-of-variance test across weekdays — the
    // parametric (normality-assuming) sharp-variance companion to
    // q181's robust Brown–Forsythe: B = [(N−k)·ln(Sp²) −
    // Σ(n_g−1)·ln(S_g²)] / [1 + (Σ1/(n_g−1) − 1/(N−k))/(3(k−1))].
    // Group variances assemble from the SAME exact decimal(38,0)
    // weekday moments as q179/q181 (unbiased S² = (Σv² − (Σv)²/n)/
    // (n−1), one IEEE expression each); both log folds run in
    // weekday order (q92 discipline); ln stays IN-ENGINE on both
    // sides (the house ln-fold rule — never driver libm vs engine
    // libm). Guards: any n_g < 2 or S_g² ≤ 0 → NULL.
    "q192_bartlett" -> ((s, d) => {
      import s.implicits._
      val dec = "decimal(38,0)"
      val o = Tables.load(s, d, "orders")
        .select(round($"o_totalprice" * 100).cast("long").as("v"),
          pmod(datediff(to_date($"o_orderdate"), lit("1970-01-05")),
            lit(7)).cast("long").as("wd"))
      val grp = o.groupBy($"wd")
        .agg(count(lit(1)).as("ng"),
          sum($"v".cast(dec)).as("sg"),
          sum(($"v".cast(dec) * $"v").cast(dec)).as("sgg"))
        .withColumn("s2",
          when($"ng" < 2L, lit(null).cast("double"))
            .otherwise(($"sgg".cast("double") -
              $"sg".cast("double") * $"sg".cast("double") /
                $"ng".cast("double")) /
              ($"ng".cast("double") - 1.0)))
      val panel = grp.agg(count(lit(1)).as("k"),
          sum($"ng").as("n"),
          min($"ng").as("min_ng"), min($"s2").as("min_s2"),
          sort_array(collect_list(struct($"wd", $"ng", $"s2")))
            .as("arr"))
        .withColumn("nd", $"n".cast("double"))
        .withColumn("kd", $"k".cast("double"))
        .withColumn("sp2", expr(
          """aggregate(arr, CAST(0.0 AS DOUBLE), (a, x) ->
             a + (CAST(x.ng AS DOUBLE) - 1.0) * x.s2)""") /
          ($"nd" - $"kd"))
        .withColumn("lnsum", expr(
          """aggregate(arr, CAST(0.0 AS DOUBLE), (a, x) ->
             a + (CAST(x.ng AS DOUBLE) - 1.0) * ln(x.s2))"""))
        .withColumn("invsum", expr(
          """aggregate(arr, CAST(0.0 AS DOUBLE), (a, x) ->
             a + 1.0 / (CAST(x.ng AS DOUBLE) - 1.0))"""))
        .withColumn("c", lit(1.0) +
          ($"invsum" - lit(1.0) / ($"nd" - $"kd")) /
            (lit(3.0) * ($"kd" - 1.0)))
      panel.select($"n".cast("long").as("n_orders"),
          $"k".as("n_groups"),
          Tables.nz(round(
            when($"k" < 2L || $"min_ng" < 2L || $"min_s2" <= 0.0,
              lit(null).cast("double"))
              .otherwise((($"nd" - $"kd") * log($"sp2") - $"lnsum")
                / $"c"), 4)).as("bartlett_stat"))
    }),

    // Grubbs max-deviation outlier screen on each type's daily
    // revenue — "is the single worst day a statistical outlier":
    // G = max|v_t − mean| / sd over the gap-filled span grid. The
    // argmax day rides a deterministic struct-max (deviation as an
    // EXACT long, day as tiebreak — no float compare decides the
    // winner); mean/sd assemble once per type from the exact
    // decimal(38,0) moments, and G is a single IEEE divide. The
    // zero-variance guard yields NULL G on both engines.
    "q193_grubbs_outlier" -> ((s, d) => {
      import s.implicits._
      val dec = "decimal(38,0)"
      val daily = Tables.load(s, d, "events")
        .select($"event_type", to_date($"ts").as("day"),
          round($"value" * 100).cast("long").as("cents"))
        .groupBy($"event_type", $"day").agg(sum($"cents").as("v"))
      val span = daily.agg(min($"day").as("d0"), max($"day").as("d1"))
      val types = daily.select($"event_type").distinct()
      val grid = span
        .select(explode(sequence($"d0", $"d1")).as("day"),
          (datediff($"d1", $"d0") + 1).cast("long").as("n"))
        .crossJoin(broadcast(types))
        .join(daily, Seq("event_type", "day"), "left")
        .select($"event_type", $"day", $"n",
          coalesce($"v", lit(0L)).as("v"))
      val tot = grid.groupBy($"event_type")
        .agg(min($"n").as("n"), sum($"v".cast(dec)).as("s"),
          sum(($"v".cast(dec) * $"v").cast(dec)).as("ss"))
        .withColumn("nd", $"n".cast("double"))
        .withColumn("m", $"s".cast("double") / $"nd")
        .withColumn("piv", round($"m").cast("long"))
        .select($"event_type", $"nd", $"m", $"piv", $"ss")
      // |v − piv| is an exact long, so the (deviation, day) struct
      // max is integer-deterministic; the CONTINUOUS deviation for G
      // re-assembles at the winner as |v − m| in one IEEE expression
      val win = grid.join(broadcast(tot), Seq("event_type"))
        .withColumn("adev", abs($"v" - $"piv"))
        .groupBy($"event_type")
        .agg(max(struct($"adev", $"day", $"v")).as("w"),
          min($"n").as("n_days"), min($"nd").as("nd"),
          min($"m").as("m"), min($"ss").as("ss"))
        .withColumn("varr",
          $"ss".cast("double") / $"nd" - $"m" * $"m")
      win.select($"event_type", $"n_days",
          date_format($"w.day", "yyyy-MM-dd").as("worst_day"),
          $"w.v".as("worst_cents"),
          Tables.nz(round(
            when($"varr" <= 0.0, lit(null).cast("double"))
              .otherwise(abs($"w.v".cast("double") - $"m") /
                sqrt($"varr")), 4)).as("grubbs_g"))
        .orderBy($"event_type")
    }),

    // Cochran–Armitage trend test — does the HIGH-VALUE share of
    // orders trend monotonically across the week (ordered weekday
    // scores 0..6), the ordered-alternative sharpening of q92-style
    // independence tests (a monotone dose-response the omnibus χ²
    // dilutes across 6 dof concentrates into one Z here). Success =
    // order value above the pooled median (q188's exact-cents
    // percentile_cont, q71-proven parity, one 1-row broadcast). The
    // statistic needs NO fold at all: T = Σw·a − p̄·Σw·n and
    // Var = p̄(1−p̄)(Σw²n − (Σwn)²/N) assemble from five EXACT long
    // aggregates (weights ≤ 6, counts ≤ N — products bounded by 36N,
    // decimal only for (Σwn)² which squares past 2^63 near N ≈ 4e8)
    // in one fixed IEEE expression per side. Degenerate guards: all
    // or none above the median, or zero variance → NULL Z.
    "q194_cochran_armitage" -> ((s, d) => {
      import s.implicits._
      val dec = "decimal(38,0)"
      val o = Tables.load(s, d, "orders")
        .select(round($"o_totalprice" * 100).cast("long").as("cents"),
          pmod(datediff(to_date($"o_orderdate"), lit("1970-01-05")),
            lit(7)).cast("long").as("wd"))
      val med = o.agg(
        expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY cents)")
          .as("med"))
      val agg = o.crossJoin(broadcast(med))
        .select($"wd", when($"cents" > $"med", 1L).otherwise(0L)
          .as("hi"))
        .agg(count(lit(1)).as("n"), sum($"hi").as("a"),
          sum($"wd" * $"hi").as("swa"),
          sum($"wd").as("swn"),
          sum($"wd" * $"wd").as("sw2n"))
        .withColumn("nd", $"n".cast("double"))
        .withColumn("p", $"a".cast("double") / $"nd")
        .withColumn("t", $"swa".cast("double") -
          $"p" * $"swn".cast("double"))
        .withColumn("vr", $"p" * (lit(1.0) - $"p") *
          ($"sw2n".cast("double") -
            ($"swn".cast(dec) * $"swn").cast("double") / $"nd"))
      agg.select($"n".cast("long").as("n_orders"),
          $"a".as("n_high"),
          Tables.nz(round(
            when($"a" === 0L || $"a" === $"n" || $"vr" <= 0.0,
              lit(null).cast("double"))
              .otherwise($"t" / sqrt($"vr")), 4)).as("z_trend"))
    }))

  private def cramOracleCtes(tag: String, from: String, a: String,
      b: String): String =
    s"""${tag}c AS (SELECT CAST($a AS VARCHAR) AS a,
           CAST($b AS VARCHAR) AS b,
           CAST(count(*) AS BIGINT) AS o
         FROM $from GROUP BY 1, 2),
       ${tag}r AS (SELECT a, CAST(sum(o) AS BIGINT) AS rn
                   FROM ${tag}c GROUP BY 1),
       ${tag}l AS (SELECT b, CAST(sum(o) AS BIGINT) AS cn
                   FROM ${tag}c GROUP BY 1),
       ${tag}t AS (SELECT CAST(sum(o) AS BIGINT) AS nn,
                     CAST(count(DISTINCT a) AS BIGINT) AS r,
                     CAST(count(DISTINCT b) AS BIGINT) AS c
                   FROM ${tag}c),
       ${tag}j AS (
         SELECT cc.a, cc.b,
           CAST(CAST(t.nn AS HUGEINT) * cc.o
                - CAST(r.rn AS HUGEINT) * l.cn AS DOUBLE)
             * CAST(CAST(t.nn AS HUGEINT) * cc.o
                - CAST(r.rn AS HUGEINT) * l.cn AS DOUBLE)
             / (CAST(t.nn AS DOUBLE) * r.rn * l.cn) AS term
         FROM ${tag}c cc
         JOIN ${tag}r r ON cc.a = r.a
         JOIN ${tag}l l ON cc.b = l.b
         CROSS JOIN ${tag}t t),
       ${tag}f AS (
         SELECT t.nn, t.r, t.c,
           list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             (SELECT list(term ORDER BY a, b) FROM ${tag}j)),
             (x, y) -> x + y) AS chi2raw
         FROM ${tag}t t)"""

  private def cramOracleRow(tag: String, label: String): String =
    s"""SELECT '$label' AS pair, nn AS n, r AS n_rows, c AS n_cols,
         round(chi2raw, 4) + 0.0 AS chi2,
         round(sqrt(chi2raw /
           (CAST(nn AS DOUBLE) *
            CAST(least(r, c) - 1 AS DOUBLE))), 6) + 0.0 AS cramers_v
       FROM ${tag}f"""

  def oracles: Map[String, String] = Map(

    "q186_decontam_ivm" -> {
      val sh = graft.dedup.Dedup.shingleCtesOver("documents")
      val mh = graft.dedup.Dedup.minhashCtesShared
      val jac = graft.dedup.Dedup.jaccardSqlShared("sa.shh", "sb.shh")
      s"""WITH $sh,
         $mh,
         mx AS (SELECT CAST(max(doc_id) - 250 AS BIGINT) AS r
                FROM documents),
         cand AS (SELECT DISTINCT x.doc_id AS t_id, y.doc_id AS c_id
                  FROM bk x JOIN bk y
                    ON x.b = y.b AND x.key = y.key
                  WHERE x.doc_id >= 250 AND y.doc_id < 250),
         drp AS (SELECT DISTINCT c.t_id
                 FROM cand c
                 JOIN sh sa ON sa.doc_id = c.t_id
                 JOIN sh sb ON sb.doc_id = c.c_id
                 WHERE $jac >= 0.5)
         SELECT CAST(CASE WHEN d.t_id <= 250 + m.r // 3 THEN 0
                          WHEN d.t_id <= 250 + (2 * m.r) // 3 THEN 1
                          ELSE 2 END AS BIGINT) AS batch_id,
           d.t_id AS doc_id
         FROM drp d, mx m
         ORDER BY 1, 2"""
    },

    // one-pass admission replay: first 5 per user in event_id order,
    // with the running admitted-count
    "q195_quota_ivm" ->
      """SELECT user_id, event_id, CAST(rn AS BIGINT) AS n_allowed
         FROM (
           SELECT user_id, event_id,
             row_number() OVER (PARTITION BY user_id
               ORDER BY event_id) AS rn
           FROM events) t
         WHERE rn <= 5 ORDER BY user_id, event_id""",

    // windowed first-seen dedup with the window (TTL) wider than the
    // replay: exactly the per-user global first event
    "q196_ttl_ivm" ->
      """SELECT user_id, CAST(min(event_id) AS BIGINT) AS event_id
         FROM events GROUP BY user_id ORDER BY user_id""",

    // the batch interval join the staged streaming replay must equal
    // (event-time-ordered arrival => the watermark drops nothing)
    "q212_interval_join_ivm" ->
      """SELECT p.user_id, p.event_id AS purchase_id,
           p.ts AS purchase_ts, c.event_id AS click_id,
           c.ts AS click_ts, p.value
         FROM events p
         JOIN events c ON c.user_id = p.user_id
           AND c.ts <= p.ts
           AND c.ts >= p.ts - INTERVAL 30 MINUTE
         WHERE p.event_type = 'purchase' AND c.event_type = 'click'
         ORDER BY purchase_id, click_id""",

    // the batch as-of join the staged streaming replay must equal —
    // q27_asof_join's oracle verbatim (DuckDB native ASOF JOIN with
    // the same per-(user, ts) max-event_id click dedupe)
    "q217_asof_ivm" ->
      """WITH clicks AS (
           SELECT user_id, ts, event_id, value,
             row_number() OVER (PARTITION BY user_id, ts
                                ORDER BY event_id DESC) AS rn
           FROM events WHERE event_type = 'click'),
         c AS (SELECT user_id, ts, event_id AS click_event_id,
                      value AS click_value
               FROM clicks WHERE rn = 1),
         p AS (SELECT event_id, user_id, ts, value FROM events
               WHERE event_type = 'purchase')
         SELECT p.event_id, p.user_id, p.ts, c.click_event_id,
                c.click_value
         FROM p ASOF JOIN c
           ON p.user_id = c.user_id AND p.ts >= c.ts
         ORDER BY p.event_id""",

    "q187_ljung_box" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS v
           FROM events GROUP BY 1, 2),
         span AS (
           SELECT d0, d1,
             CAST(date_diff('day', d0, d1) + 1 AS BIGINT) AS n
           FROM (SELECT min(day) AS d0, max(day) AS d1 FROM daily)),
         days AS (
           SELECT unnest(generate_series(d0, d1,
             INTERVAL 1 DAY))::DATE AS day, d0, n
           FROM span),
         types AS (SELECT DISTINCT event_type FROM daily),
         grid AS MATERIALIZED (
           SELECT t.event_type, dy.n,
             CAST(date_diff('day', dy.d0, dy.day) AS BIGINT) AS t,
             coalesce(d.v, 0) AS v
           FROM days dy CROSS JOIN types t
           LEFT JOIN daily d
             ON d.event_type = t.event_type AND d.day = dy.day),
         tot AS (SELECT event_type, min(n) AS n,
                   sum(CAST(v AS HUGEINT)) AS s,
                   sum(CAST(v AS HUGEINT) * v) AS ss
                 FROM grid GROUP BY 1),
         lagged AS (
           SELECT a.event_type, l.lag,
             sum(CAST(a.v AS HUGEINT) * b.v) AS sp,
             sum(CAST(a.v AS HUGEINT)) AS sh,
             sum(CAST(b.v AS HUGEINT)) AS st
           FROM grid a
           CROSS JOIN (SELECT CAST(unnest(range(1, 8)) AS BIGINT)
                         AS lag) l
           JOIN grid b ON b.event_type = a.event_type
                      AND b.t = a.t + l.lag
           GROUP BY 1, 2),
         terms AS (
           SELECT g.event_type, g.lag, t.n,
             CAST(t.n AS DOUBLE) AS nd,
             CASE WHEN CAST(t.ss AS DOUBLE)
                    - CAST(t.n AS DOUBLE)
                      * (CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE))
                      * (CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE))
                    = 0.0
               THEN NULL
               ELSE (CAST(g.sp AS DOUBLE)
                 - (CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE))
                   * (CAST(g.sh AS DOUBLE) + CAST(g.st AS DOUBLE))
                 + (CAST(t.n AS DOUBLE) - CAST(g.lag AS DOUBLE))
                   * (CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE))
                   * (CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE)))
                / (CAST(t.ss AS DOUBLE)
                 - CAST(t.n AS DOUBLE)
                   * (CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE))
                   * (CAST(t.s AS DOUBLE) / CAST(t.n AS DOUBLE)))
             END AS rho
           FROM lagged g JOIN tot t ON t.event_type = g.event_type),
         folded AS (
           SELECT event_type, min(n) AS n_days, min(nd) AS nd,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(rho * rho / (nd - CAST(lag AS DOUBLE))
                    ORDER BY lag)),
               (a, b) -> a + b) AS acc
           FROM terms GROUP BY event_type)
         SELECT event_type, n_days, CAST(7 AS BIGINT) AS df,
           round(nd * (nd + 2.0) * acc, 4) + 0.0 AS lb_stat
         FROM folded ORDER BY event_type""",

    "q188_mood_median" ->
      """WITH oc AS (
           SELECT c.c_mktsegment AS segment,
             CAST(round(o.o_totalprice * 100) AS BIGINT) AS cents
           FROM orders o JOIN customer c
             ON o.o_custkey = c.c_custkey),
         med AS (SELECT percentile_cont(0.5)
                   WITHIN GROUP (ORDER BY cents) AS med
                 FROM oc),
         per AS (
           SELECT segment, CAST(count(*) AS BIGINT) AS n_g,
             CAST(sum(CASE WHEN cents > (SELECT med FROM med)
                      THEN 1 ELSE 0 END) AS BIGINT) AS a_g
           FROM oc GROUP BY 1),
         tot AS (SELECT CAST(sum(n_g) AS BIGINT) AS nn,
                   CAST(sum(a_g) AS BIGINT) AS aa,
                   CAST(count(*) AS BIGINT) AS k
                 FROM per),
         cells AS (
           SELECT p.segment, p.n_g, p.a_g, t.nn, t.aa, t.k,
             CAST(p.n_g AS DOUBLE) * CAST(t.aa AS DOUBLE)
               / CAST(t.nn AS DOUBLE) AS ea,
             CAST(p.n_g AS DOUBLE)
               * (CAST(t.nn AS DOUBLE) - CAST(t.aa AS DOUBLE))
               / CAST(t.nn AS DOUBLE) AS eb
           FROM per p CROSS JOIN tot t),
         terms AS (
           SELECT segment, n_g, a_g, k, ea,
             CASE WHEN aa = 0 OR aa = nn THEN NULL
               ELSE (CAST(a_g AS DOUBLE) - ea)
                    * (CAST(a_g AS DOUBLE) - ea) / ea
                  + (CAST(n_g - a_g AS DOUBLE) - eb)
                    * (CAST(n_g - a_g AS DOUBLE) - eb) / eb
             END AS term
           FROM cells),
         stat AS (
           SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               (SELECT list(term ORDER BY segment) FROM terms)),
               (a, b) -> a + b) AS chi2raw,
             (SELECT min(k) - 1 FROM terms) AS df)
         SELECT t.segment, t.n_g, t.a_g AS n_above,
           round(t.ea, 4) + 0.0 AS exp_above,
           round(s.chi2raw, 4) + 0.0 AS chi2,
           CAST(s.df AS BIGINT) AS df
         FROM terms t CROSS JOIN stat s
         ORDER BY t.segment""",

    "q189_cramers_v" -> {
      s"""WITH ${cramOracleCtes("p1", "lineitem",
             "l_returnflag", "l_linestatus")},
         ${cramOracleCtes("p2", "part",
             "p_brand", "p_size")},
         ${cramOracleCtes("p3", "orders",
             "o_orderpriority", "o_orderstatus")},
         ${cramOracleCtes("p4", "customer",
             "c_mktsegment", "c_nationkey")}
         SELECT * FROM (
           ${cramOracleRow("p1", "return_status")}
           UNION ALL ${cramOracleRow("p2", "brand_size")}
           UNION ALL ${cramOracleRow("p3", "priority_status")}
           UNION ALL ${cramOracleRow("p4", "segment_nation")})
         ORDER BY pair"""
    },

    "q191_tukey_hsd" ->
      """WITH o AS (
           SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
             CAST(((date_diff('day', DATE '1970-01-05',
               o_orderdate) % 7) + 7) % 7 AS BIGINT) AS wd
           FROM orders),
         grp AS (
           SELECT wd, CAST(count(*) AS BIGINT) AS ng,
             sum(CAST(v AS HUGEINT)) AS sg,
             sum(CAST(v AS HUGEINT) * v) AS sgg
           FROM o GROUP BY 1),
         panel AS (
           SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(ng) AS HUGEINT) AS n,
             sum(sgg) AS svv,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
                    / CAST(ng AS DOUBLE) ORDER BY wd)),
               (a, b) -> a + b) AS sbterm
           FROM grp),
         msw AS (
           SELECT CASE WHEN k < 2 OR CAST(n AS DOUBLE) <= CAST(k AS DOUBLE)
                    OR (CAST(svv AS DOUBLE) - sbterm) <= 0.0 THEN NULL
                  ELSE (CAST(svv AS DOUBLE) - sbterm)
                    / (CAST(n AS DOUBLE) - CAST(k AS DOUBLE)) END AS msw
           FROM panel)
         SELECT a.wd AS wd_a, b.wd AS wd_b,
           a.ng AS na, b.ng AS nb,
           round((CAST(a.sg AS DOUBLE) / CAST(a.ng AS DOUBLE)
                  - CAST(b.sg AS DOUBLE) / CAST(b.ng AS DOUBLE))
                 / 100.0, 4) + 0.0 AS mean_diff,
           round(abs(CAST(a.sg AS DOUBLE) / CAST(a.ng AS DOUBLE)
                     - CAST(b.sg AS DOUBLE) / CAST(b.ng AS DOUBLE))
                 / sqrt(m.msw / 2.0 *
                   (1.0 / CAST(a.ng AS DOUBLE)
                    + 1.0 / CAST(b.ng AS DOUBLE))), 4) + 0.0 AS q_stat
         FROM grp a JOIN grp b ON a.wd < b.wd
         CROSS JOIN msw m
         ORDER BY wd_a, wd_b""",

    "q192_bartlett" ->
      """WITH o AS (
           SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS v,
             CAST(((date_diff('day', DATE '1970-01-05',
               o_orderdate) % 7) + 7) % 7 AS BIGINT) AS wd
           FROM orders),
         grp AS (
           SELECT wd, CAST(count(*) AS BIGINT) AS ng,
             sum(CAST(v AS HUGEINT)) AS sg,
             sum(CAST(v AS HUGEINT) * v) AS sgg
           FROM o GROUP BY 1),
         g2 AS (
           SELECT wd, ng,
             CASE WHEN ng < 2 THEN NULL
               ELSE (CAST(sgg AS DOUBLE)
                 - CAST(sg AS DOUBLE) * CAST(sg AS DOUBLE)
                   / CAST(ng AS DOUBLE))
                 / (CAST(ng AS DOUBLE) - 1.0) END AS s2
           FROM grp),
         panel AS (
           SELECT CAST(count(*) AS BIGINT) AS k,
             CAST(sum(ng) AS BIGINT) AS n,
             CAST(min(ng) AS BIGINT) AS min_ng, min(s2) AS min_s2,
             CAST(sum(ng) AS DOUBLE) AS nd,
             CAST(count(*) AS DOUBLE) AS kd,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list((CAST(ng AS DOUBLE) - 1.0) * s2 ORDER BY wd)),
               (a, b) -> a + b) AS spsum,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list((CAST(ng AS DOUBLE) - 1.0) * ln(s2) ORDER BY wd)),
               (a, b) -> a + b) AS lnsum,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(1.0 / (CAST(ng AS DOUBLE) - 1.0) ORDER BY wd)),
               (a, b) -> a + b) AS invsum
           FROM g2)
         SELECT n AS n_orders, k AS n_groups,
           round(CASE WHEN k < 2 OR min_ng < 2 OR min_s2 <= 0.0
               THEN NULL
             ELSE ((nd - kd) * ln(spsum / (nd - kd)) - lnsum)
               / (1.0 + (invsum - 1.0 / (nd - kd)) / (3.0 * (kd - 1.0)))
             END, 4) + 0.0 AS bartlett_stat
         FROM panel""",

    "q194_cochran_armitage" ->
      """WITH o AS (
           SELECT CAST(round(o_totalprice * 100) AS BIGINT) AS cents,
             CAST(((date_diff('day', DATE '1970-01-05',
               o_orderdate) % 7) + 7) % 7 AS BIGINT) AS wd
           FROM orders),
         med AS (SELECT percentile_cont(0.5)
                   WITHIN GROUP (ORDER BY cents) AS med
                 FROM o),
         h AS (
           SELECT wd,
             CASE WHEN cents > (SELECT med FROM med)
               THEN 1 ELSE 0 END AS hi
           FROM o),
         agg AS (
           SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(hi) AS BIGINT) AS a,
             CAST(sum(wd * hi) AS BIGINT) AS swa,
             CAST(sum(wd) AS BIGINT) AS swn,
             CAST(sum(wd * wd) AS BIGINT) AS sw2n
           FROM h),
         fin AS (
           SELECT n, a,
             CAST(a AS DOUBLE) / CAST(n AS DOUBLE) AS p,
             CAST(swa AS DOUBLE)
               - (CAST(a AS DOUBLE) / CAST(n AS DOUBLE))
                 * CAST(swn AS DOUBLE) AS t,
             (CAST(a AS DOUBLE) / CAST(n AS DOUBLE))
               * (1.0 - CAST(a AS DOUBLE) / CAST(n AS DOUBLE))
               * (CAST(sw2n AS DOUBLE)
                  - CAST(CAST(swn AS HUGEINT) * swn AS DOUBLE)
                    / CAST(n AS DOUBLE)) AS vr
           FROM agg)
         SELECT n AS n_orders, a AS n_high,
           round(CASE WHEN a = 0 OR a = n OR vr <= 0.0 THEN NULL
             ELSE t / sqrt(vr) END, 4) + 0.0 AS z_trend
         FROM fin""",

    "q193_grubbs_outlier" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS v
           FROM events GROUP BY 1, 2),
         span AS (
           SELECT d0, d1,
             CAST(date_diff('day', d0, d1) + 1 AS BIGINT) AS n
           FROM (SELECT min(day) AS d0, max(day) AS d1 FROM daily)),
         days AS (
           SELECT unnest(generate_series(d0, d1,
             INTERVAL 1 DAY))::DATE AS day, n
           FROM span),
         types AS (SELECT DISTINCT event_type FROM daily),
         grid AS MATERIALIZED (
           SELECT t.event_type, dy.day, dy.n, coalesce(d.v, 0) AS v
           FROM days dy CROSS JOIN types t
           LEFT JOIN daily d
             ON d.event_type = t.event_type AND d.day = dy.day),
         tot AS (
           SELECT event_type, min(n) AS n,
             CAST(min(n) AS DOUBLE) AS nd,
             CAST(sum(CAST(v AS HUGEINT)) AS DOUBLE)
               / CAST(min(n) AS DOUBLE) AS m,
             CAST(round(CAST(sum(CAST(v AS HUGEINT)) AS DOUBLE)
               / CAST(min(n) AS DOUBLE)) AS BIGINT) AS piv,
             CAST(sum(CAST(v AS HUGEINT) * v) AS DOUBLE) AS ssd
           FROM grid GROUP BY event_type),
         win AS (
           SELECT g.event_type,
             max(struct_pack(adev := abs(g.v - t.piv), day := g.day,
               v := g.v)) AS w,
             min(g.n) AS n_days, min(t.nd) AS nd, min(t.m) AS m,
             min(t.ssd) AS ssd
           FROM grid g JOIN tot t ON t.event_type = g.event_type
           GROUP BY g.event_type)
         SELECT event_type, n_days,
           strftime(w.day, '%Y-%m-%d') AS worst_day,
           CAST(w.v AS BIGINT) AS worst_cents,
           round(CASE WHEN ssd / nd - m * m <= 0.0 THEN NULL
             ELSE abs(CAST(w.v AS DOUBLE) - m) / sqrt(ssd / nd - m * m)
             END, 4) + 0.0 AS grubbs_g
         FROM win ORDER BY event_type""",

    "q190_page_hinkley" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS v
           FROM events GROUP BY 1, 2),
         span AS (
           SELECT d0, d1,
             CAST(date_diff('day', d0, d1) + 1 AS BIGINT) AS n
           FROM (SELECT min(day) AS d0, max(day) AS d1 FROM daily)),
         days AS (
           SELECT unnest(generate_series(d0, d1,
             INTERVAL 1 DAY))::DATE AS day, n
           FROM span),
         types AS (SELECT DISTINCT event_type FROM daily),
         grid AS MATERIALIZED (
           SELECT t.event_type, dy.day, dy.n, coalesce(d.v, 0) AS v
           FROM days dy CROSS JOIN types t
           LEFT JOIN daily d
             ON d.event_type = t.event_type AND d.day = dy.day),
         tot AS (
           SELECT event_type, min(n) AS n,
             CAST(round(CAST(sum(CAST(v AS HUGEINT)) AS DOUBLE)
               / CAST(min(n) AS DOUBLE)) AS BIGINT) AS piv,
             CAST(round(2.0 * sqrt(greatest(
               CAST(sum(CAST(v AS HUGEINT) * v) AS DOUBLE)
                 / CAST(min(n) AS DOUBLE)
               - (CAST(sum(CAST(v AS HUGEINT)) AS DOUBLE)
                  / CAST(min(n) AS DOUBLE))
                 * (CAST(sum(CAST(v AS HUGEINT)) AS DOUBLE)
                    / CAST(min(n) AS DOUBLE)), 0.0)))
               AS BIGINT) AS lambda
           FROM grid GROUP BY event_type),
         walk1 AS (
           SELECT g.event_type, g.day, g.n, t.lambda,
             sum(g.v - t.piv) OVER (
               PARTITION BY g.event_type ORDER BY g.day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS mt
           FROM grid g JOIN tot t ON t.event_type = g.event_type),
         walk AS (
           SELECT event_type, day, n, lambda,
             mt - min(mt) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS ph
           FROM walk1)
         SELECT event_type, min(n) AS n_days,
           CAST(min(lambda) AS BIGINT) AS lambda,
           CAST(sum(CASE WHEN ph > lambda THEN 1 ELSE 0 END)
             AS BIGINT) AS n_alarm_days,
           strftime(min(CASE WHEN ph > lambda THEN day END),
             '%Y-%m-%d') AS first_alarm_day,
           CAST(max(ph) AS BIGINT) AS max_ph
         FROM walk GROUP BY event_type ORDER BY event_type""")
}
