package graft.queries

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Round-18 batch 2: sketch-based corpus overlap, private quantile
  * release, and the trend-significance completion of the robust-slope
  * panel —
  *
  *   - pipeline_kmv_overlap: KMV (bottom-k) sketches of each source's
  *     token vocabulary + pairwise union/Jaccard/intersection
  *     ESTIMATES with the exact values beside them (the recall-row
  *     pattern) — the 100 TB way to ask "how much do two crawls
  *     share" without a distinct-join over everything;
  *   - pipeline_dp_quantile: ε-differentially-private median of order
  *     value per priority class via the EXPONENTIAL MECHANISM,
  *     realized as Gumbel-max with deterministic md5 draws —
  *     pipeline_dp_count's companion (that one releases counts, this
  *     one a quantile, the two standard private releases on a
  *     dataset card);
  *   - q229_mann_kendall: the Mann–Kendall trend test with tie
  *     correction on each type's daily revenue — q141_theil_sen gives
  *     the robust slope, this gives its significance (the pair is the
  *     standard nonparametric trend readout).
  *
  * Batch 3 — corpus curriculum + the change/randomness completions:
  *
  *   - pipeline_ccnet_buckets: CCNet's head/middle/tail perplexity
  *     bucketing — each lang's docs split at the surprisal terciles
  *     of text_lm_score's bigram model, with per-bucket doc/token
  *     mass (the standard "keep head, sample middle, drop tail"
  *     pretraining curriculum input);
  *   - q230_runs_test: Wald–Wolfowitz runs test on the signs of
  *     day-over-day revenue moves — non-randomness the trend tests
  *     can't see (oscillation reads z < 0, clustering z > 0);
  *   - q231_amoc_changepoint: at-most-one-changepoint binary
  *     segmentation over the daily series — the retrospective
  *     split-point locator next to the ONLINE drift monitors
  *     (q84 CUSUM, q190 Page–Hinkley).
  *
  * Batch 5 — the physical-layout diagnostics a 100 TB deployment
  * tunes by:
  *
  *   - pipeline_skew_report: the shuffle-skew audit for a planned
  *     partitioning key — heavy-key shares and the per-key salt
  *     factor that caps any key at one partition's fair share (the
  *     number you set BEFORE the first straggler, not after);
  *   - pipeline_zorder_layout: Morton (Z-order) interleave of two
  *     filter dimensions + the measured file-skipping rate a
  *     Z-clustered layout buys over naive single-column clustering —
  *     the Delta/Iceberg OPTIMIZE ZORDER decision, quantified.
  *
  * Reference note: the reference (`/root/reference/`, a 656-line Go
  * log forwarder — SURVEY.md §1) has none of this surface; these are
  * §2b extension ops under the house disciplines — exact integer
  * domains until one final IEEE assembly, md5-derived randomness with
  * the (hex + ½)/16ⁿ clamp both engines replay bit-identically,
  * k-bounded/value-domain-bounded frames only, and decade probes on
  * registration.
  */
object Frontier11 {

  private val dec = "decimal(38,0)"

  /** 16^15 = 2^60, the KMV hash-domain size: 15 md5 nibbles fit a
    * BIGINT exactly on both engines.
    */
  private val KmvDomain = 1152921504606846976L
  private val KmvK = 256

  def queries: Map[String, Q] = Map(

    // KMV (k-minimum-values / bottom-k) sketch overlap between source
    // vocabularies. Per source, the sketch is the K smallest md5
    // values over DISTINCT tokens (duplicates hash identically, so no
    // pre-distinct pass is needed — the groupBy(source, h) is the
    // dedup); the distinct-count estimate is the classic
    // (K−1)·M/h_(K) (or the exact size when the sketch isn't full);
    // pairwise, the union sketch is the K smallest of the merged
    // value set and Jaccard ≈ |union-k values present in BOTH
    // per-source sketches| / K, intersection ≈ J · union-estimate.
    // Everything stays in the exact integer hash domain until the
    // final estimate divides; the exact distinct/overlap counts ride
    // beside the estimates (the ann_recall/dedup_lsh_eval
    // self-evaluating-row pattern — at 100 TB you ship the sketch
    // column and drop the exact ones; here they grade it: ~4% rel
    // err at K=256). Scale shape: one token scan → per-source
    // K-bounded sketches (window top-K on a value-domain-bounded
    // frame) → an |sources|²-bounded pair frame; the exact side is
    // vocab-bounded. Nothing row-sized leaves the first groupBy.
    "pipeline_kmv_overlap" -> ((s, d) => {
      import s.implicits._
      // the sketch universe is word 3-GRAMS, not tokens: the synthetic
      // corpus has a ~31-word vocabulary (tokens would leave every
      // sketch un-full and the (K−1)·M/h_(K) path vacuously untested),
      // while 3-grams give each source a ~1.5k-value universe at
      // sf0.01 — sketches saturate and the estimator is the path
      // under test. On a real crawl either universe works; shingles
      // are also what the dedup family blocks on, so cross-source
      // shingle overlap is the operationally useful number.
      val tok = Tables.load(s, d, "documents")
        .select($"source", split(lower($"text"), "\\s+").as("w"))
        .filter(size($"w") >= 3)
        .select($"source", explode(expr(
          """transform(sequence(1, size(w) - 2), i ->
             concat_ws(' ', element_at(w, i), element_at(w, i + 1),
               element_at(w, i + 2)))""")).as("tok"))
      // r19 optimization (guide §1.2 "don't compute things twice"):
      // the 3-gram kernel is the query's expensive stage and used to
      // run TWICE (once into the hash sketch, once into the exact
      // vocab side). One pass now builds the distinct (source, tok)
      // vocab — the frame the exact side already persisted — and the
      // sketch hashes FROM it. Value-identical: distinct tokens then
      // distinct h ≡ DISTINCT (source, h) over all occurrences (the
      // oracle's `hashed` CTE), md5-collision merge included; the
      // residual groupBy(source, h) input is vocab-bounded instead of
      // occurrence-bounded, so the sketch side also shuffles less.
      val vocab = tok.select($"source", $"tok").distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // materialize ONCE before the fan-out: five of the consumers
      // below are independent broadcast-exchange subplans whose
      // builder threads otherwise race to fill the same cold cache
      // concurrently (measured: first run 8.5 s racing vs 4.2 s
      // sequential-fill — duplicated partition computes + cache locks)
      vocab.count()
      val hashed = vocab
        .select($"source",
          conv(substring(md5($"tok"), 1, 15), 16, 10).cast("long")
            .as("h"))
        .groupBy($"source", $"h").agg(count(lit(1)).as("n_occ"))
      val wk = Window.partitionBy($"source").orderBy($"h")
      val sk = hashed
        .withColumn("rk", row_number().over(wk))
        .filter($"rk" <= KmvK)
        .select($"source", $"h", $"rk")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val perSource = sk.groupBy($"source")
        .agg(count(lit(1)).as("n_sk"), max($"h").as("hk"))
        .select($"source", $"n_sk",
          when($"n_sk" < KmvK, $"n_sk".cast("double"))
            .otherwise(lit((KmvK - 1).toDouble) * lit(KmvDomain.toDouble)
              / $"hk".cast("double")).as("est"))
      // union-k per pair: K smallest distinct values of the merged
      // sketches; a value is in the intersection estimate iff both
      // sides' sketches contain it — explode per-pair merged values
      // from the two K-bounded sketch sets (pair frame is
      // |sources|² and enum-sized, so both joins broadcast)
      val names = sk.select($"source").distinct()
      val pairNames = names.as("x").select($"source".as("sa"))
        .join(names.as("y").select($"source".as("sb")), $"sa" < $"sb")
      val mergedVals = pairNames
        .join(sk.select($"source".as("sa"), $"h".as("va")), Seq("sa"))
        .select($"sa", $"sb", $"va".as("v"))
        .unionByName(pairNames
          .join(sk.select($"source".as("sb"), $"h".as("vb")), Seq("sb"))
          .select($"sa", $"sb", $"vb".as("v")))
        .groupBy($"sa", $"sb", $"v")
        .agg(count(lit(1)).as("sides")) // 2 = value in both sketches
      val wp = Window.partitionBy($"sa", $"sb").orderBy($"v")
      val unionK = mergedVals
        .withColumn("rk", row_number().over(wp))
        .filter($"rk" <= KmvK)
      val pairEst = unionK.groupBy($"sa", $"sb")
        .agg(count(lit(1)).as("n_u"), max($"v").as("vk"),
          sum(when($"sides" === 2L, 1L).otherwise(0L)).as("n_both"))
        .select($"sa", $"sb",
          when($"n_u" < KmvK, $"n_u".cast("double"))
            .otherwise(lit((KmvK - 1).toDouble) * lit(KmvDomain.toDouble)
              / $"vk".cast("double")).as("est_union"),
          ($"n_both".cast("double") / $"n_u".cast("double"))
            .as("jaccard_est"))
      // exact side (vocab-bounded): distinct tokens per source pair —
      // `vocab` is the shared one-pass frame persisted above
      val exactN = vocab.groupBy($"source").agg(count(lit(1)).as("n_ex"))
      val exactPair = vocab.as("a").select($"source".as("sa"), $"tok")
        .join(vocab.as("b").select($"source".as("sb"), $"tok"),
          Seq("tok"))
        .filter($"sa" < $"sb")
        .groupBy($"sa", $"sb").agg(count(lit(1)).as("n_inter_exact"))
      pairEst
        .join(broadcast(exactPair), Seq("sa", "sb"), "left")
        .join(broadcast(exactN.select($"source".as("sa"),
          $"n_ex".as("n_a_exact"))), Seq("sa"))
        .join(broadcast(exactN.select($"source".as("sb"),
          $"n_ex".as("n_b_exact"))), Seq("sb"))
        .join(broadcast(perSource.select($"source".as("sa"),
          $"est".as("est_a"))), Seq("sa"))
        .join(broadcast(perSource.select($"source".as("sb"),
          $"est".as("est_b"))), Seq("sb"))
        .select($"sa".as("source_a"), $"sb".as("source_b"),
          $"n_a_exact", $"n_b_exact",
          coalesce($"n_inter_exact", lit(0L)).as("n_inter_exact"),
          Tables.nz(round($"est_a", 2)).as("est_a"),
          Tables.nz(round($"est_b", 2)).as("est_b"),
          Tables.nz(round($"est_union", 2)).as("est_union"),
          Tables.nz(round($"jaccard_est", 6)).as("jaccard_est"),
          Tables.nz(round($"jaccard_est" * $"est_union", 2))
            .as("est_intersection"))
        .orderBy($"source_a", $"source_b")
    }),

    // ε-DP median of order value (cents) per priority class: the
    // EXPONENTIAL MECHANISM over the $10-bin candidate grid with
    // rank utility u(b) = −|#{v ≤ b} − n/2| (sensitivity 1), realized
    // as GUMBEL-MAX — score(b) = ε·u(b)/2 + Gumbel(md5("dpq:" class
    // ":" bin)) and release the argmax — which samples EXACTLY the
    // exponential-mechanism distribution without a cumulative-weight
    // pass (no ordered double fold to replay; every score is
    // row-local, the argmax is one group-partitioned row_number).
    // Integer discipline: 2·u = −|2·cum − n| stays integer; the
    // Gumbel draw uses the (hex+½)/16¹² clamp (pipeline_dp_count's
    // r17-ADVICE rule) so −ln(−ln u) never hits ±∞. true_median_bin
    // rides beside the release for the gate (and gets dropped by a
    // production release, as in dp_count). Candidate grid is
    // value-domain-bounded; everything after the rollup is
    // grid-sized.
    "pipeline_dp_quantile" -> ((s, d) => {
      import s.implicits._
      val o = Tables.load(s, d, "orders")
        .select($"o_orderpriority".as("priority"),
          expr("CAST(round(o_totalprice * 100) AS BIGINT) div 1000")
            .as("bin"))
      val binned = o.groupBy($"priority", $"bin")
        .agg(count(lit(1)).as("c"))
      val wcum = Window.partitionBy($"priority").orderBy($"bin")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val scored = binned
        .withColumn("cum", sum($"c").over(wcum))
        .withColumn("n", sum($"c").over(
          Window.partitionBy($"priority")))
        .withColumn("u2", -abs(lit(2L) * $"cum" - $"n")) // 2·utility
        .withColumn("g",
          -log(-log((conv(substring(md5(concat(lit("dpq:"), $"priority",
            lit(":"), $"bin".cast("string"))), 1, 12), 16, 10)
            .cast("long").cast("double") + lit(0.5))
            / lit(281474976710656.0))))
        .withColumn("score",
          $"u2".cast("double") * lit(0.25) + $"g") // ε=1: ε·u/2 = u2/4
      val wpick = Window.partitionBy($"priority")
        .orderBy($"score".desc, $"bin")
      val exact = o.groupBy($"priority")
        .agg(expr("percentile_cont(0.5) WITHIN GROUP (ORDER BY bin)")
          .as("true_median_bin"), count(lit(1)).as("n"))
      scored
        .withColumn("rk", row_number().over(wpick))
        .filter($"rk" === 1)
        .select($"priority", $"bin".as("released_bin"),
          Tables.nz(round($"score", 6)).as("score"))
        .join(exact, Seq("priority"))
        .select($"priority", $"n", lit(1.0).as("epsilon"),
          Tables.nz(round($"true_median_bin", 1)).as("true_median_bin"),
          $"released_bin", $"score")
        .orderBy($"priority")
    }),

    // Mann–Kendall trend test with tie correction on each type's
    // daily revenue — the significance companion to q141_theil_sen's
    // robust slope. S = Σ_{i<j} sign(v_j − v_i) over the day-ordered
    // series (span-bounded: the pair self-join is days²/2 per type,
    // data-size-independent after the daily rollup); Var·18 =
    // n(n−1)(2n+5) − Σ_t t(t−1)(2t+5) from the value-count table,
    // exact integers throughout; z applies the standard continuity
    // correction (S∓1) in one final IEEE assembly. A zero-variance
    // series yields NULL z on both engines; S = 0 reads z = 0.
    "q229_mann_kendall" -> ((s, d) => {
      import s.implicits._
      val daily = Tables.load(s, d, "events")
        .select($"event_type", to_date($"ts").as("day"),
          round($"value" * 100).cast("long").as("cents"))
        .groupBy($"event_type", $"day").agg(sum($"cents").as("v"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val sStat = daily.as("a").join(daily.as("b"),
          $"a.event_type" === $"b.event_type" && $"a.day" < $"b.day")
        .groupBy($"a.event_type".as("event_type"))
        .agg(sum(signum(($"b.v" - $"a.v").cast("double")).cast("long"))
          .as("s"))
      val ties = daily.groupBy($"event_type", $"v")
        .agg(count(lit(1)).as("t"))
        .groupBy($"event_type")
        .agg(sum($"t").as("n"),
          sum(($"t".cast(dec) * ($"t" - 1) * (lit(2).cast(dec) * $"t"
            + 5)).cast(dec)).as("tie3"))
      sStat.join(ties, Seq("event_type"))
        .withColumn("var18",
          ($"n".cast(dec) * ($"n" - 1) * (lit(2).cast(dec) * $"n" + 5)
            - $"tie3").cast(dec))
        .select($"event_type", $"n".cast("long").as("n_days"),
          $"s".as("s_stat"),
          Tables.nz(round(
            when($"var18" <= 0, lit(null).cast("double"))
              .otherwise(
                when($"s" > 0, ($"s" - 1).cast("double"))
                  .when($"s" < 0, ($"s" + 1).cast("double"))
                  .otherwise(lit(0.0))
                / sqrt($"var18".cast("double") / 18.0)), 4))
            .as("z_stat"))
        .orderBy($"event_type")
    }),

    // CCNet-style perplexity bucketing: per language, split documents
    // at the TERCILES of their bigram-LM surprisal (text_lm_score's
    // exact per-doc statistic, rounded to 4 decimals BEFORE the
    // percentile cut so the bucket key is the already-hash-matched
    // value, not a fresh float) into head (most fluent) / middle /
    // tail, and report each bucket's doc and token mass — the
    // "keep head, sample middle, drop tail" input every
    // perplexity-filtered pretraining mix starts from. The cut is
    // RANK-based — row_number over (srp, doc_id) with integer
    // 3·rn ≤ n / ≤ 2n boundaries — NOT percentile-interpolated:
    // a first cut used percentile_cont thresholds and 2 docs per
    // ~6k flipped buckets at sf0.1 because the interpolated
    // threshold lands ulp-close to the many 4-decimal-tied srp
    // values and `<=` reads opposite sides cross-engine; the rank
    // cut is exact integer arithmetic with a doc_id tie-break, so
    // membership cannot flip. Docs with no bigram (< 2 tokens) are
    // excluded exactly as in text_lm_score. Scale shape: the model
    // is a (lang, bigram) rollup joined back broadcast; the rank
    // window partitions by lang (5-way, span of docs per lang — at
    // 100 TB swap for ops.PrefixSum per lang, the q
    // pipeline_curriculum shape).
    "pipeline_ccnet_buckets" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.load(s, d, "documents")
        .withColumn("t", split(lower($"text"), "\\s+"))
      val bg = docs.select($"doc_id", $"lang",
        size($"t").cast("long").as("n_tokens"),
        explode(when(size($"t") >= 2, expr(
          "transform(sequence(1, size(t) - 1), i -> " +
            "concat_ws(' ', element_at(t, i), element_at(t, i + 1)))"))
          .otherwise(array().cast("array<string>"))).as("bg"))
      val model = bg.groupBy($"lang", $"bg").agg(count(lit(1)).as("c"))
      val totals = model.groupBy($"lang").agg(sum($"c").as("n_lang"))
      val scored = bg.join(broadcast(model), Seq("lang", "bg"))
        .join(broadcast(totals), Seq("lang"))
        .groupBy($"doc_id")
        .agg(first($"lang").as("lang"),
          first($"n_tokens").as("n_tokens"),
          round(log(first($"n_lang")) -
            sum(log($"c".cast("double"))) / count(lit(1)), 4)
            .as("srp"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val wr = Window.partitionBy($"lang").orderBy($"srp", $"doc_id")
      val wn = Window.partitionBy($"lang")
      scored
        .withColumn("rn", row_number().over(wr).cast("long"))
        .withColumn("nl", count(lit(1)).over(wn))
        .withColumn("bucket",
          when($"rn" * 3 <= $"nl", "head")
            .when($"rn" * 3 <= $"nl" * 2, "middle").otherwise("tail"))
        .groupBy($"lang", $"bucket")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tokens").as("n_tokens"),
          Tables.nz(round(min($"srp"), 4)).as("min_srp"),
          Tables.nz(round(max($"srp"), 4)).as("max_srp"))
        .orderBy($"lang", $"bucket")
    }),

    // Wald–Wolfowitz runs test on the SIGNS of day-over-day revenue
    // moves per type: R = number of maximal same-sign runs over the
    // nonzero deltas in day order; z = (R − E)/σ with the exact
    // integer E/σ² pieces (E = 2·n₁n₂/n + 1). The trend panel's
    // randomness complement: MK/Theil–Sen see monotone drift, the
    // runs count sees oscillation (z ≪ 0: too many runs) and
    // clustering (z ≫ 0: too few). Day-ordered lags ride
    // type-partitioned windows on the span-bounded daily frame; zero
    // deltas drop (the standard convention); n₁ = 0 or n₂ = 0 is a
    // degenerate NULL on both engines. One final IEEE assembly.
    "q230_runs_test" -> ((s, d) => {
      import s.implicits._
      val wd = Window.partitionBy($"event_type").orderBy($"day")
      val daily = Tables.load(s, d, "events")
        .select($"event_type", to_date($"ts").as("day"),
          round($"value" * 100).cast("long").as("cents"))
        .groupBy($"event_type", $"day").agg(sum($"cents").as("v"))
        .withColumn("dv", $"v" - lag($"v", 1).over(wd))
        .filter($"dv".isNotNull && $"dv" =!= 0L)
        .withColumn("sg", when($"dv" > 0, 1L).otherwise(-1L))
        .withColumn("prev_sg", lag($"sg", 1).over(wd))
      daily.groupBy($"event_type")
        .agg(
          sum(when($"sg" === 1L, 1L).otherwise(0L)).as("n1"),
          sum(when($"sg" === -1L, 1L).otherwise(0L)).as("n2"),
          (sum(when($"prev_sg".isNull || $"sg" =!= $"prev_sg", 1L)
            .otherwise(0L))).as("r"))
        .withColumn("n", $"n1" + $"n2")
        .withColumn("p2", (lit(2).cast(dec) * $"n1" * $"n2").cast(dec))
        .select($"event_type", $"n1", $"n2", $"r".as("n_runs"),
          Tables.nz(round(
            when($"n1" === 0L || $"n2" === 0L || $"n" < 2L,
              lit(null).cast("double"))
              .otherwise({
                val e = $"p2".cast("double") / $"n".cast("double") + 1.0
                val v = ($"p2" * ($"p2" - $"n")).cast("double") /
                  ($"n".cast(dec) * $"n" * ($"n" - 1)).cast("double")
                when(v > 0.0, ($"r".cast("double") - e) / sqrt(v))
                  .otherwise(lit(null).cast("double"))
              }), 4)).as("z_stat"))
        .orderBy($"event_type")
    }),

    // At-most-one-changepoint (AMOC) binary segmentation over each
    // type's daily revenue: the split t* maximizing the CUSUM gain
    // G(t) = (n·S_L(t) − t·S)² / (t·(n−t)) over the day-indexed
    // series — the retrospective "WHERE did the level shift" locator
    // next to the online monitors (q84 CUSUM flags THAT it drifted,
    // q190 Page–Hinkley WHEN the stream crossed; this one localizes
    // the split after the fact, the classic offline first step of
    // binary segmentation). Exactness: S_L rides a type-partitioned
    // running sum over the span-bounded daily frame; the gain's
    // numerator (n·S_L − t·S)² is decimal(38,0)-exact (|n·S_L| <
    // 2.7e14 at sf100-scale cents ⇒ squared < 10²⁹ ≪ 10³⁸) and the
    // one divide to double is identical IEEE on both engines, so the
    // argmax (gain desc, t asc) cannot flip cross-engine. Segment
    // means publish as exact FLOOR-division cents (DuckDB `//`
    // parity even for negative segment sums), and the published
    // gain is the EXACT integer division num div (t(n−t)) div 10⁴
    // (dollars²): a first cut published round(gain, 4) on the
    // ~1e13-cents² double and the decimal rendering of that huge
    // double differed in the last digit cross-engine at sf0.1 — the
    // argmax double is fine to ORDER by (identical IEEE), never to
    // print. Long-exact through sf100 (3.6e18 < 2⁶³); past that,
    // publish in whole dollars² × 10³ (stated bound).
    "q231_amoc_changepoint" -> ((s, d) => {
      import s.implicits._
      val wd = Window.partitionBy($"event_type").orderBy($"day")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      val wall = Window.partitionBy($"event_type")
      val daily = Tables.load(s, d, "events")
        .select($"event_type", to_date($"ts").as("day"),
          round($"value" * 100).cast("long").as("cents"))
        .groupBy($"event_type", $"day").agg(sum($"cents").as("v"))
        .withColumn("sl", sum($"v").over(wd))
        .withColumn("t", count(lit(1)).over(wd))
        .withColumn("n", count(lit(1)).over(wall))
        .withColumn("s", sum($"v").over(wall))
        .filter($"t" < $"n") // splits only (left segment non-full)
      val gained = daily
        .withColumn("num",
          (($"n".cast(dec) * $"sl" - $"t".cast(dec) * $"s") *
            ($"n".cast(dec) * $"sl" - $"t".cast(dec) * $"s")).cast(dec))
        .withColumn("gain",
          $"num".cast("double") /
            ($"t" * ($"n" - $"t")).cast("double"))
      val wpick = Window.partitionBy($"event_type")
        .orderBy($"gain".desc, $"t")
      gained
        .withColumn("rk", row_number().over(wpick))
        .filter($"rk" === 1)
        .select($"event_type", $"n".as("n_days"), $"t".as("t_star"),
          date_format($"day", "yyyy-MM-dd").as("split_day"),
          // floor division (not `div`, which truncates toward zero)
          // to stay parity-exact with DuckDB's `//` when a segment's
          // cents sum is negative — refunds would flip `div` vs `//`
          expr("CAST(FLOOR(CAST(sl AS DECIMAL(38,0)) / t) AS BIGINT)")
            .as("mean_left_cents"),
          expr("CAST(FLOOR(CAST(s - sl AS DECIMAL(38,0)) / (n - t)) " +
            "AS BIGINT)").as("mean_right_cents"),
          expr("CAST((num div (t * (n - t))) div 10000 AS BIGINT)")
            .as("gain_dollars2"))
        .orderBy($"event_type")
    }),

    // Shuffle-skew audit for a planned partitioning key: the top-5
    // heaviest user_id keys of the events stream with their row
    // shares, plus the SALT FACTOR that caps each at one partition's
    // fair share under the session's 32-way shuffle — salt =
    // ceil(key_rows · P / total) sub-keys spreads the key to ≤
    // total/P rows apiece, which is exactly the number you configure
    // into a salted join/agg BEFORE the first straggler (AQE's
    // skew-join split handles sort-merge joins at runtime; a salt is
    // still the only lever for skewed AGGREGATION keys). Everything
    // is exact integers; the top-5 pick is k-bounded (count desc,
    // key asc). Scale shape: one groupBy(key) rollup — the histogram
    // a 100 TB shuffle plan is costed from — then a 5-row frame.
    "pipeline_skew_report" -> ((s, d) => {
      import s.implicits._
      val P = 32L
      val counts = Tables.load(s, d, "events")
        .groupBy($"user_id").agg(count(lit(1)).as("c"))
      val tot = counts.agg(sum($"c").as("n_rows"),
        count(lit(1)).as("n_keys"))
      // top-5 via orderBy+limit (TakeOrderedAndProject — distributed
      // partial top-k per map task, never a global window over the
      // key histogram, which is user-domain-sized at 100 TB); the
      // rank window then runs on the ≤5-row frame
      val wtop = Window.orderBy($"c".desc, $"user_id")
      counts.orderBy($"c".desc, $"user_id").limit(5)
        .withColumn("rk", row_number().over(wtop).cast("long"))
        .crossJoin(broadcast(tot))
        .select($"rk".as("rank"), $"user_id", $"c".as("n_rows_key"),
          $"n_keys", $"n_rows",
          round($"c".cast("double") / $"n_rows".cast("double"), 6)
            .as("share"),
          expr(s"($P * c + n_rows - 1) div n_rows").as("salt_factor"))
        .orderBy($"rank")
    }),

    // Z-order (Morton) layout quality, measured: interleave the two
    // filter dimensions a log-analytics table is actually pruned by
    // — user bucket (user_id % 128) and day index (both ≤ 10
    // bits) — sort by the interleaved key, chunk into 64 equal
    // "files", and count how many files each layout SKIPS for a
    // middle-eighth range predicate on EACH dimension, against the
    // two single-column clusterings. This is the OPTIMIZE ZORDER
    // decision quantified: single-column layouts skip ~7/8 of files
    // on their own dimension and ZERO on the other; the Z layout
    // buys real skipping on BOTH — min/max file stats are what
    // parquet/Delta pruning consumes, so the skipped count IS the
    // scan saved. All integer arithmetic (bit interleave, PrefixSum
    // global ranks — never a partition-less window — fid = rank·64
    // div n, interval-overlap tests); output is 3 layouts × 2
    // predicates = 6 rows.
    "pipeline_zorder_layout" -> ((s, d) => {
      import s.implicits._
      val nFiles = 64L
      val zExpr = (0 until 10).map(i =>
        s"(((u >> $i) & 1) << ${2 * i}) | (((dd >> $i) & 1) << ${2 * i + 1})")
        .mkString("(", " | ", ")")
      val base = Tables.load(s, d, "events")
        .select($"event_id", ($"user_id" % 128L).as("u"),
          to_date($"ts").as("day"))
      val span = base.agg(min($"day").as("d0"), max($"day").as("d1"),
          max($"u").as("um"))
        .select($"d0", datediff($"d1", $"d0").cast("long").as("sp"),
          $"um")
        .first
      val (d0, sp, um) = (span.getDate(0), span.getLong(1),
        span.getLong(2))
      // persist + eager count (r20, guide §1.2 "don't compute
      // twice"): dims has FOUR consumers — the count below and the
      // three layout() calls, each of whose runningTotal starts with
      // a repartitionByRange over it (plus the range partitioner's
      // own sampling pass) — so unpersisted, the events scan + bit
      // interleave ran four times over. The cached frame is four
      // integer columns, fact-bounded.
      val dims = base
        .select($"event_id", $"u",
          datediff($"day", lit(d0)).cast("long").as("dd"))
        .withColumn("z", expr(zExpr))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // the three physical orders; fid = global-rank·64 div n
      val nTotal = dims.count() // bounded driver scalar (fills cache)
      def layout(name: String, orderCols: Seq[org.apache.spark.sql
          .Column]): DataFrame = {
        val ranked = graft.ops.PrefixSum.runningTotal(dims,
          orderCols :+ $"event_id", lit(1L), "rn")
        ranked
          .withColumn("fid",
            expr(s"((rn - 1) * $nFiles) div ${nTotal}L"))
          .groupBy($"fid")
          .agg(min($"u").as("u_lo"), max($"u").as("u_hi"),
            min($"dd").as("d_lo"), max($"dd").as("d_hi"))
          .withColumn("layout", lit(name))
      }
      val files = layout("zorder", Seq($"z"))
        .unionByName(layout("by_user", Seq($"u")))
        .unionByName(layout("by_day", Seq($"dd")))
      // middle-eighth predicates on each dimension, bounds derived
      // from the OBSERVED domain (a fixed bucket slice was vacuous at
      // small SF: the fixture has 150·sf/0.01 users, so an absolute
      // [448, 575] window selected nothing below sf1)
      val uLo = (um * 7L) / 16L
      val uHi = (um * 9L) / 16L
      val dLo = (sp * 7L) / 16L
      val dHi = (sp * 9L) / 16L
      files
        .select($"layout",
          explode(array(
            struct(lit("user").as("pred_dim"),
              ($"u_hi" < uLo || $"u_lo" > uHi).as("skipped")),
            struct(lit("day").as("pred_dim"),
              ($"d_hi" < dLo || $"d_lo" > dHi).as("skipped"))))
            .as("p"))
        .groupBy($"layout", $"p.pred_dim")
        .agg(count(lit(1)).as("n_files"),
          sum(when($"p.skipped", 1L).otherwise(0L)).as("n_skipped"))
        .withColumn("skip_rate",
          round($"n_skipped".cast("double") / $"n_files".cast("double"),
            4))
        .orderBy($"layout", $"pred_dim")
    }))

  def oracles: Map[String, String] = Map(

    "pipeline_kmv_overlap" ->
      s"""WITH w AS (
           SELECT source, string_split_regex(lower(text), '\\s+') AS w
           FROM documents),
         tf AS (
           SELECT source,
             unnest(list_transform(range(1, len(w) - 1), i ->
               w[i] || ' ' || w[i + 1] || ' ' || w[i + 2])) AS tok
           FROM w WHERE len(w) >= 3),
         hashed AS (
           SELECT DISTINCT source,
             CAST(('0x' || substr(md5(tok), 1, 15)) AS BIGINT) AS h
           FROM tf),
         sk AS (
           SELECT source, h,
             row_number() OVER (PARTITION BY source ORDER BY h) AS rk
           FROM hashed
           QUALIFY rk <= $KmvK),
         per AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n_sk,
             max(h) AS hk
           FROM sk GROUP BY 1),
         pest AS (
           SELECT source,
             CASE WHEN n_sk < $KmvK THEN CAST(n_sk AS DOUBLE)
               ELSE ${KmvK - 1}.0 * $KmvDomain.0 / CAST(hk AS DOUBLE)
             END AS est
           FROM per),
         names AS (SELECT DISTINCT source FROM sk),
         pn AS (
           SELECT x.source AS sa, y.source AS sb
           FROM names x JOIN names y ON x.source < y.source),
         mv AS (
           SELECT sa, sb, v, CAST(count(*) AS BIGINT) AS sides
           FROM (
             SELECT p.sa, p.sb, s.h AS v
             FROM pn p JOIN sk s ON s.source = p.sa
             UNION ALL
             SELECT p.sa, p.sb, s.h AS v
             FROM pn p JOIN sk s ON s.source = p.sb)
           GROUP BY 1, 2, 3),
         uk AS (
           SELECT sa, sb, v, sides,
             row_number() OVER (PARTITION BY sa, sb ORDER BY v) AS rk
           FROM mv
           QUALIFY rk <= $KmvK),
         pe AS (
           SELECT sa, sb, CAST(count(*) AS BIGINT) AS n_u, max(v) AS vk,
             CAST(sum(CASE WHEN sides = 2 THEN 1 ELSE 0 END) AS BIGINT)
               AS n_both
           FROM uk GROUP BY 1, 2),
         pest2 AS (
           SELECT sa, sb,
             CASE WHEN n_u < $KmvK THEN CAST(n_u AS DOUBLE)
               ELSE ${KmvK - 1}.0 * $KmvDomain.0 / CAST(vk AS DOUBLE)
             END AS est_union,
             CAST(n_both AS DOUBLE) / CAST(n_u AS DOUBLE) AS jaccard_est
           FROM pe),
         vocab AS (SELECT DISTINCT source, tok FROM tf),
         exn AS (
           SELECT source, CAST(count(*) AS BIGINT) AS n_ex
           FROM vocab GROUP BY 1),
         exp2 AS (
           SELECT a.source AS sa, b.source AS sb,
             CAST(count(*) AS BIGINT) AS n_inter_exact
           FROM vocab a JOIN vocab b
             ON a.tok = b.tok AND a.source < b.source
           GROUP BY 1, 2)
         SELECT p.sa AS source_a, p.sb AS source_b,
           na.n_ex AS n_a_exact, nb.n_ex AS n_b_exact,
           coalesce(e.n_inter_exact, 0) AS n_inter_exact,
           round(ea.est, 2) + 0.0 AS est_a,
           round(eb.est, 2) + 0.0 AS est_b,
           round(p.est_union, 2) + 0.0 AS est_union,
           round(p.jaccard_est, 6) + 0.0 AS jaccard_est,
           round(p.jaccard_est * p.est_union, 2) + 0.0
             AS est_intersection
         FROM pest2 p
         LEFT JOIN exp2 e ON e.sa = p.sa AND e.sb = p.sb
         JOIN exn na ON na.source = p.sa
         JOIN exn nb ON nb.source = p.sb
         JOIN pest ea ON ea.source = p.sa
         JOIN pest eb ON eb.source = p.sb
         ORDER BY source_a, source_b""",

    "pipeline_dp_quantile" ->
      """WITH o AS (
           SELECT o_orderpriority AS priority,
             CAST(round(o_totalprice * 100) AS BIGINT) // 1000 AS bin
           FROM orders),
         binned AS (
           SELECT priority, bin, CAST(count(*) AS BIGINT) AS c
           FROM o GROUP BY 1, 2),
         scored AS (
           SELECT priority, bin,
             CAST(sum(c) OVER (PARTITION BY priority ORDER BY bin
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum,
             CAST(sum(c) OVER (PARTITION BY priority) AS BIGINT) AS n
           FROM binned),
         g AS (
           SELECT priority, bin, n,
             CAST(-abs(2 * cum - n) AS DOUBLE) * 0.25
               + (-ln(-ln((CAST(CAST(('0x' || substr(md5('dpq:' ||
                   priority || ':' || CAST(bin AS VARCHAR)), 1, 12))
                   AS BIGINT) AS DOUBLE) + 0.5) / 281474976710656.0)))
               AS score
           FROM scored),
         pick AS (
           SELECT priority, bin, n, score,
             row_number() OVER (PARTITION BY priority
               ORDER BY score DESC, bin) AS rk
           FROM g),
         exact AS (
           SELECT priority,
             percentile_cont(0.5) WITHIN GROUP (ORDER BY bin)
               AS true_median_bin
           FROM o GROUP BY 1)
         SELECT p.priority, p.n, 1.0 AS epsilon,
           round(e.true_median_bin, 1) + 0.0 AS true_median_bin,
           p.bin AS released_bin,
           round(p.score, 6) + 0.0 AS score
         FROM pick p JOIN exact e ON e.priority = p.priority
         WHERE p.rk = 1
         ORDER BY p.priority""",

    "pipeline_ccnet_buckets" ->
      """WITH t AS (
           SELECT doc_id, lang,
             string_split_regex(lower(text), '\s+') AS tk,
             CAST(len(string_split_regex(lower(text), '\s+'))
               AS BIGINT) AS n_tokens
           FROM documents),
         bgs AS (
           SELECT doc_id, lang, n_tokens, unnest(list_transform(
             range(1, greatest(len(tk) - 1, 0) + 1),
             i -> tk[i] || ' ' || tk[i+1])) AS bg
           FROM t),
         model AS (SELECT lang, bg, count(*) AS c FROM bgs GROUP BY 1, 2),
         totals AS (SELECT lang, CAST(sum(c) AS BIGINT) AS n_lang
                    FROM model GROUP BY 1),
         scored AS (
           SELECT b.doc_id, any_value(b.lang) AS lang,
             any_value(b.n_tokens) AS n_tokens,
             round(ln(any_value(tt.n_lang)) -
               sum(ln(CAST(m.c AS DOUBLE))) / count(*), 4) AS srp
           FROM bgs b
           JOIN model m ON b.lang = m.lang AND b.bg = m.bg
           JOIN totals tt ON b.lang = tt.lang
           GROUP BY b.doc_id),
         ranked AS (
           SELECT lang, n_tokens, srp,
             CAST(row_number() OVER (PARTITION BY lang
               ORDER BY srp, doc_id) AS BIGINT) AS rn,
             CAST(count(*) OVER (PARTITION BY lang) AS BIGINT) AS nl
           FROM scored)
         SELECT lang,
           CASE WHEN rn * 3 <= nl THEN 'head'
                WHEN rn * 3 <= nl * 2 THEN 'middle'
                ELSE 'tail' END AS bucket,
           count(*) AS n_docs,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           round(min(srp), 4) + 0.0 AS min_srp,
           round(max(srp), 4) + 0.0 AS max_srp
         FROM ranked
         GROUP BY 1, 2 ORDER BY 1, 2""",

    "q230_runs_test" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS v
           FROM events GROUP BY 1, 2),
         d2 AS (
           SELECT event_type, day,
             v - lag(v) OVER (PARTITION BY event_type ORDER BY day)
               AS dv
           FROM daily),
         nz AS (
           SELECT event_type, day,
             CASE WHEN dv > 0 THEN 1 ELSE -1 END AS sg
           FROM d2 WHERE dv IS NOT NULL AND dv <> 0),
         rr AS (
           SELECT event_type, sg,
             lag(sg) OVER (PARTITION BY event_type ORDER BY day)
               AS prev_sg
           FROM nz),
         agg AS (
           SELECT event_type,
             CAST(sum(CASE WHEN sg = 1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n1,
             CAST(sum(CASE WHEN sg = -1 THEN 1 ELSE 0 END) AS BIGINT)
               AS n2,
             CAST(sum(CASE WHEN prev_sg IS NULL OR sg <> prev_sg
               THEN 1 ELSE 0 END) AS BIGINT) AS r
           FROM rr GROUP BY 1)
         SELECT event_type, n1, n2, r AS n_runs,
           round(CASE WHEN n1 = 0 OR n2 = 0 OR n1 + n2 < 2 THEN NULL
             WHEN CAST(2 * n1 AS HUGEINT) * n2 *
               (2 * n1 * n2 - (n1 + n2)) <= 0 THEN NULL
             ELSE (CAST(r AS DOUBLE) -
               (CAST(CAST(2 * n1 AS HUGEINT) * n2 AS DOUBLE)
                 / CAST(n1 + n2 AS DOUBLE) + 1.0))
               / sqrt(CAST(CAST(2 * n1 AS HUGEINT) * n2 *
                   (2 * n1 * n2 - (n1 + n2)) AS DOUBLE)
                 / CAST(CAST(n1 + n2 AS HUGEINT) * (n1 + n2)
                   * (n1 + n2 - 1) AS DOUBLE))
             END, 4) + 0.0 AS z_stat
         FROM agg ORDER BY event_type""",

    "q231_amoc_changepoint" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS v
           FROM events GROUP BY 1, 2),
         pre AS (
           SELECT event_type, day, v,
             CAST(sum(v) OVER (PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS sl,
             CAST(row_number() OVER (PARTITION BY event_type
               ORDER BY day) AS BIGINT) AS t,
             CAST(count(*) OVER (PARTITION BY event_type) AS BIGINT)
               AS n,
             CAST(sum(v) OVER (PARTITION BY event_type) AS BIGINT)
               AS s
           FROM daily),
         g AS (
           SELECT *,
             CAST((CAST(n AS HUGEINT) * sl - CAST(t AS HUGEINT) * s)
               * (CAST(n AS HUGEINT) * sl - CAST(t AS HUGEINT) * s)
               AS DOUBLE) / CAST(t * (n - t) AS DOUBLE) AS gain
           FROM pre WHERE t < n),
         pick AS (
           SELECT *, row_number() OVER (PARTITION BY event_type
             ORDER BY gain DESC, t) AS rk
           FROM g)
         SELECT event_type, n AS n_days, t AS t_star,
           strftime(day, '%Y-%m-%d') AS split_day,
           CAST(sl // t AS BIGINT) AS mean_left_cents,
           CAST((s - sl) // (n - t) AS BIGINT) AS mean_right_cents,
           CAST(((CAST(n AS HUGEINT) * sl - CAST(t AS HUGEINT) * s)
             * (CAST(n AS HUGEINT) * sl - CAST(t AS HUGEINT) * s)
             // (t * (n - t))) // 10000 AS BIGINT) AS gain_dollars2
         FROM pick WHERE rk = 1 ORDER BY event_type""",

    "pipeline_skew_report" ->
      """WITH c AS (
           SELECT user_id, CAST(count(*) AS BIGINT) AS c
           FROM events GROUP BY 1),
         t AS (
           SELECT CAST(sum(c) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_keys
           FROM c),
         r AS (
           SELECT user_id, c,
             CAST(row_number() OVER (ORDER BY c DESC, user_id)
               AS BIGINT) AS rk
           FROM c)
         SELECT rk AS rank, user_id, c AS n_rows_key,
           t.n_keys, t.n_rows,
           round(CAST(c AS DOUBLE) / CAST(t.n_rows AS DOUBLE), 6)
             + 0.0 AS share,
           CAST((32 * c + t.n_rows - 1) // t.n_rows AS BIGINT)
             AS salt_factor
         FROM r, t WHERE rk <= 5 ORDER BY rank""",

    "pipeline_zorder_layout" -> {
      val zExpr = (0 until 10).map(i =>
        s"(((u >> $i) & 1) << ${2 * i}) | (((dd >> $i) & 1) << ${2 * i + 1})")
        .mkString("(", " | ", ")")
      s"""WITH span AS (
           SELECT min(CAST(ts AS DATE)) AS d0,
             CAST(date_diff('day', min(CAST(ts AS DATE)),
               max(CAST(ts AS DATE))) AS BIGINT) AS sp,
             CAST(max(user_id % 128) AS BIGINT) AS um
           FROM events),
         dims AS (
           SELECT event_id, user_id % 128 AS u,
             CAST(date_diff('day', span.d0, CAST(ts AS DATE))
               AS BIGINT) AS dd
           FROM events, span),
         z AS (SELECT *, $zExpr AS zv FROM dims),
         n AS (SELECT CAST(count(*) AS BIGINT) AS nt FROM dims),
         lz AS (
           SELECT 'zorder' AS layout, u, dd,
             CAST(row_number() OVER (ORDER BY zv, event_id)
               AS BIGINT) AS rn
           FROM z
           UNION ALL
           SELECT 'by_user', u, dd,
             CAST(row_number() OVER (ORDER BY u, event_id) AS BIGINT)
           FROM z
           UNION ALL
           SELECT 'by_day', u, dd,
             CAST(row_number() OVER (ORDER BY dd, event_id) AS BIGINT)
           FROM z),
         f AS (
           SELECT layout, (rn - 1) * 64 // nt AS fid,
             min(u) AS u_lo, max(u) AS u_hi,
             min(dd) AS d_lo, max(dd) AS d_hi
           FROM lz, n GROUP BY 1, 2),
         p AS (
           SELECT layout, 'user' AS pred_dim,
             CASE WHEN u_hi < (SELECT um * 7 // 16 FROM span)
                    OR u_lo > (SELECT um * 9 // 16 FROM span)
               THEN 1 ELSE 0 END AS sk
           FROM f
           UNION ALL
           SELECT layout, 'day',
             CASE WHEN d_hi < (SELECT sp * 7 // 16 FROM span)
                    OR d_lo > (SELECT sp * 9 // 16 FROM span)
               THEN 1 ELSE 0 END
           FROM f)
         SELECT layout, pred_dim, count(*) AS n_files,
           CAST(sum(sk) AS BIGINT) AS n_skipped,
           round(CAST(sum(sk) AS DOUBLE) / count(*), 4) + 0.0
             AS skip_rate
         FROM p GROUP BY 1, 2 ORDER BY layout, pred_dim"""
    },

    "q229_mann_kendall" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS v
           FROM events GROUP BY 1, 2),
         s AS (
           SELECT a.event_type,
             CAST(sum(CAST(sign(b.v - a.v) AS BIGINT)) AS BIGINT) AS s
           FROM daily a JOIN daily b
             ON a.event_type = b.event_type AND a.day < b.day
           GROUP BY 1),
         t AS (
           SELECT event_type, CAST(count(*) AS BIGINT) AS t
           FROM daily GROUP BY event_type, v),
         ties AS (
           SELECT event_type,
             CAST(sum(t) AS HUGEINT) AS n,
             sum(CAST(t AS HUGEINT) * (t - 1) * (2 * t + 5)) AS tie3
           FROM t GROUP BY 1),
         v AS (
           SELECT s.event_type, s.s, ties.n,
             ties.n * (ties.n - 1) * (2 * ties.n + 5) - ties.tie3
               AS var18
           FROM s JOIN ties ON ties.event_type = s.event_type)
         SELECT event_type, CAST(n AS BIGINT) AS n_days, s AS s_stat,
           round(CASE WHEN var18 <= 0 THEN NULL
             ELSE (CASE WHEN s > 0 THEN CAST(s - 1 AS DOUBLE)
                        WHEN s < 0 THEN CAST(s + 1 AS DOUBLE)
                        ELSE 0.0 END)
               / sqrt(CAST(var18 AS DOUBLE) / 18.0) END, 4) + 0.0
             AS z_stat
         FROM v ORDER BY event_type""")
}
