package graft.queries

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** End-to-end training-data preparation pipeline — the composition the
  * LLM-pipeline operators exist for: quality-filter → exact-dedup
  * (keep lowest doc_id) → attach embeddings → emit training rows.
  * One query so the whole flow is plan-optimized together: the quality
  * predicates push into the scan, the dedup is one digest shuffle, the
  * embedding attach broadcasts.
  */
object Pipeline {

  /** Quality scoring + filter (length + type-token ratio) — the shared
    * first stage of both prep pipelines; a threshold tweak here stays
    * in lockstep across them (and must be mirrored in their oracles).
    */
  private def qualityFiltered(docs: DataFrame): DataFrame =
    docs
      .withColumn("t", split(lower(col("text")), "\\s+"))
      .withColumn("ttr",
        size(array_distinct(col("t"))).cast("double") /
          size(col("t")).cast("double"))
      .filter(col("n_chars") >= 200 && col("ttr") >= 0.3)

  /** Exact dedup keeping the lowest doc_id per content digest. */
  private def keepFirstDigest(df: DataFrame): DataFrame =
    df.withColumn("digest", md5(col("text")))
      .withColumn("keeper",
        min(col("doc_id")).over(
          org.apache.spark.sql.expressions.Window.partitionBy(col("digest"))))
      .filter(col("doc_id") === col("keeper"))

  /** Deterministic content-hash split assignment: 12/16 md5 buckets →
    * train, 4/16 → test. Pure function of content, so re-runs,
    * incremental batches, and other engines agree row-for-row; the
    * lexicographic hex compare is numeric order ('0'<'9'<'a'<'f').
    */
  private def splitCol(text: Column): Column =
    when(substring(md5(text), 1, 1) < lit("c"), lit("train"))
      .otherwise(lit("test"))

  /** Distinct word-n-gram hashes from a token-hash array — the
    * generalized form of Dedup.hashedShingles (n=3); decontamination
    * uses wider grams.
    */
  private def gramHashes(th: Column, n: Int): Column =
    when(size(th) >= n,
      array_distinct(transform(
        sequence(lit(1), size(th) - (n - 1)),
        i => xxhash64((0 until n).map(j => element_at(th, i + j)): _*))))
      .otherwise(array().cast("array<bigint>"))

  /** Vocabulary encoding, raw form — per-doc id sequence as an array
    * (see the `pipeline_vocab_encode` registration for the
    * gate-compatible fingerprint wrapper).
    */
  def vocabEncode(s: org.apache.spark.sql.SparkSession, d: String)
      : DataFrame = {
    import s.implicits._
    val tok = Tables.spread(Tables.load(s, d, "documents"))
      .select($"doc_id",
        posexplode(split(lower($"text"), "\\s+")).as(Seq("pos", "tok")))
    val w = org.apache.spark.sql.expressions.Window
      .orderBy($"c".desc, $"tok")
    val vocab = tok.groupBy($"tok").agg(count(lit(1)).as("c"))
      .orderBy($"c".desc, $"tok").limit(1000)
      .withColumn("id", row_number().over(w).cast("long") - 1L)
      .select($"tok", $"id")
    tok.join(broadcast(vocab), Seq("tok"), "left")
      .withColumn("id", coalesce($"id", lit(-1L)))
      .groupBy($"doc_id")
      .agg(transform(
        array_sort(collect_list(struct($"pos", $"id"))),
        x => x.getField("id")).as("ids"))
  }

  /** Bloom prefilter plumbing shared by the registered
    * decontaminate_bloom query and the superset spec: candidate
    * (doc_id, gram) pairs whose gram passes the test-gram Bloom
    * filter, plus the test-gram frame for the exact confirm. The
    * non-candidate train mass (the overwhelming majority at 100 TB)
    * is eliminated row-locally — zero shuffle — by the broadcast
    * bloom probe inside a higher-order filter.
    */
  private def bloomCandidates(s: org.apache.spark.sql.SparkSession,
      d: String): (DataFrame, DataFrame) = {
    import s.implicits._
    val docs = Tables.spread(Tables.load(s, d, "documents"))
      .withColumn("split", splitCol($"text"))
      .withColumn("th",
        graft.dedup.Dedup.tokenHashes(split(lower($"text"), "\\s+")))
      .withColumn("g", gramHashes($"th", 4))
      .select($"doc_id", $"split", $"g")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val testGrams = docs.filter($"split" === "test")
      .select(explode($"g").as("gram"))
    // sizing action on the small (test) side only; the Bloom build
    // itself is one distributed aggregate over the same frame
    val n = math.max(testGrams.count(), 1000L)
    val bloom = testGrams.stat.bloomFilter("gram", n, 1e-4)
    val candidates = docs.filter($"split" === "train")
      .withColumn("flagged",
        filter($"g", gr =>
          graft.functions.BloomFunctions.bloom_might_contain(gr, bloom)))
      .filter(size($"flagged") > 0)
      .select($"doc_id", explode($"flagged").as("gram"))
    (candidates, testGrams)
  }

  /** Raw FP-accepting prefilter view (doc_id, n_flagged) — the
    * zero-confirm shape whose superset-of-exact property
    * PipelineOpsSpec pins (the registered query adds the exact
    * confirm on top and so matches pipeline_decontaminate exactly).
    */
  def bloomPrefilter(s: org.apache.spark.sql.SparkSession, d: String)
      : DataFrame = {
    import s.implicits._
    val (candidates, _) = bloomCandidates(s, d)
    candidates.groupBy($"doc_id")
      .agg(count(lit(1)).as("n_flagged"))
      .orderBy($"doc_id")
  }

  def queries: Map[String, Q] = Map(

    // Stride-overlapped document chunking — the context-window split
    // every RAG index and long-doc training pipeline runs: 64-token
    // chunks advancing 48 tokens, so consecutive chunks share a
    // 16-token overlap and no token is orphaned (the tail chunk may
    // be short; a doc shorter than one window is one chunk). Chunk
    // count = 1 + ceil(max(0, n-64)/48) in pure integer arithmetic.
    // Scale shape: entirely ROW-LOCAL — tokenize, count, explode the
    // chunk-index sequence, slice — no shuffle at all until the
    // display sort; the ~1.3× token duplication materializes in the
    // output writer, never in an exchange.
    "pipeline_chunk" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.spread(Tables.load(s, d, "documents"))
        .withColumn("t", split(lower($"text"), "\\s+"))
        .withColumn("n", size($"t"))
        .withColumn("nchunks",
          expr("1 + greatest(0, n - 64 + 47) div 48"))
      docs.select($"doc_id",
          explode(sequence(lit(0), $"nchunks" - 1)).as("chunk_id"),
          $"t", $"n")
        .select($"doc_id", $"chunk_id".cast("long").as("chunk_id"),
          size(slice($"t", $"chunk_id" * 48 + 1, lit(64))).cast("long")
            .as("n_tokens"),
          concat_ws(" ", slice($"t", $"chunk_id" * 48 + 1, lit(64)))
            .as("chunk_text"))
        .orderBy($"doc_id", $"chunk_id")
    }),

    // Vocabulary encoding — the tokenizer-encode step of training
    // prep: build the top-1000 vocabulary by corpus frequency
    // (count DESC, token — deterministic), assign contiguous ids, and
    // re-emit every document as its id sequence with OOV → -1 (UNK).
    // Scale shape: one (token) partial-count shuffle builds the
    // vocab; the vocab is top-k-BOUNDED so it broadcasts by
    // construction (the id-assignment window runs over ≤1000 rows —
    // the one place a single-task window is correct); encoding is a
    // broadcast left join + per-doc re-assembly ordered by position.
    // the id sequence is an array — the driver's pandas harness
    // can't hash array cells (CORRECTNESS_r07 err), so the gate
    // compares the md5 of the comma-joined sequence (mm_embed
    // pattern); longs stringify identically on both engines. The raw
    // array form (vocabEncode) stays covered by PipelineOpsSpec.
    "pipeline_vocab_encode" -> ((s, d) => {
      import s.implicits._
      vocabEncode(s, d)
        .select($"doc_id", size($"ids").cast("long").as("n_tokens"),
          md5(concat_ws(",", transform($"ids", _.cast("string"))))
            .as("ids_fp"))
        .orderBy($"doc_id")
    }),

    // Weighted systematic resampling — the with-replacement mixing
    // pass that up-weights heavy/high-value documents: 1000 sample
    // slots are spread evenly over the cumulative token mass, and a
    // document is emitted once per slot boundary its weight interval
    // crosses: n_copies = floor(cum·k/W) − floor((cum−w)·k/W). Pure
    // integer arithmetic (slot positions never materialize as floats)
    // so both engines agree exactly; deterministic doc_id order. The
    // prefix sum rides ops.PrefixSum's distributed scan (range
    // exchange + two per-partition jobs + |partitions| driver longs),
    // never a partition-less window; W and k are scalars. At 100 TB
    // cum·k outgrows a long — move the product to decimal(38,0) on
    // both engines (same truncating div); the plan is unchanged.
    "pipeline_resample" -> ((s, d) => {
      import s.implicits._
      val k = 1000L
      val docs = Tables.load(s, d, "documents")
        .select($"doc_id", $"lang",
          size(split(lower($"text"), "\\s+")).cast("long").as("w"))
      val total = docs.agg(sum($"w")).head.getLong(0) // driver scalar W
      graft.ops.PrefixSum.runningTotal(docs, Seq($"doc_id"), $"w", "cum")
        .withColumn("n_copies",
          expr(s"(cum * $k) div $total - ((cum - w) * $k) div $total"))
        .filter($"n_copies" >= 1L)
        .select($"doc_id", $"lang", $"w".as("n_tokens"), $"n_copies")
        .orderBy($"doc_id")
    }),

    // Training-sequence packing: documents stream into fixed
    // token-budget sequences (greedy fill in doc_id order — the
    // standard streaming pack). The running sum partitions by
    // (lang, source) so state never crosses a shard: at 100 TB each
    // (lang, source) shard packs independently — no global order, no
    // driver coordination; within a shard it is one window pass.
    // Budget 512 whitespace tokens here; real deployments use the
    // model context minus specials.
    "pipeline_pack" -> ((s, d) => {
      import s.implicits._
      val budget = 512
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"lang", $"source").orderBy($"doc_id")
      Tables.load(s, d, "documents")
        .withColumn("n_tokens",
          size(split(lower($"text"), "\\s+")).cast("long"))
        .withColumn("cum", sum($"n_tokens").over(w))
        // a doc joins the sequence its cumulative START falls in;
        // floor (not cast) — ANSI cast truncates, DuckDB's rounds
        .withColumn("seq_id",
          floor(($"cum" - $"n_tokens") / budget).cast("long"))
        .groupBy($"lang", $"source", $"seq_id")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_tokens").as("sum_tokens"))
        .orderBy($"lang", $"source", $"seq_id")
    }),

    // Benchmark decontamination: train-split docs sharing any word
    // n-gram with the test split are flagged (the GPT-3-style n-gram
    // overlap check). Hashed grams exploded from the train side join
    // the distinct test-side grams — linear scan + one equi-join on
    // the gram hash, never doc×doc. n=4 suits this tiny synthetic
    // vocabulary; production text uses 8–13. The oracle replays the
    // same join over string grams (same results short of a 64-bit
    // hash collision, the dedup_ngram_jaccard precedent).
    "pipeline_decontaminate" -> ((s, d) => {
      import s.implicits._
      // token hashes MUST materialize as their own column before the
      // gram lambda: the lambda references them n times, and a
      // collapsed projection re-runs the whole (interpreted) token
      // transform per reference — measured 50 s vs 1.5 s at sf0.1.
      // The gram frame feeds both split branches → persist; released
      // by the caller's clearCache, not here — the returned plan is
      // lazy and re-reads it (see Dedup scaladoc, Cache lifecycle).
      val docs = Tables.spread(Tables.load(s, d, "documents"))
        .withColumn("split", splitCol($"text"))
        .withColumn("th",
          graft.dedup.Dedup.tokenHashes(split(lower($"text"), "\\s+")))
        .withColumn("g", gramHashes($"th", 4))
        .select($"doc_id", $"split", $"g")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val train = docs.filter($"split" === "train")
        .select($"doc_id", explode($"g").as("gram"))
      val testGrams = docs.filter($"split" === "test")
        .select(explode($"g").as("gram")).distinct()
      train.join(testGrams, Seq("gram"))
        .groupBy($"doc_id")
        .agg(count_distinct($"gram").as("n_shared_grams"))
        .orderBy($"doc_id")
    }),

    // Decontamination, the 100 TB shape: the exact form above JOINS
    // train grams against test grams — correct, but the train side
    // (the 100 TB side) shuffles its gram explosion. The scale form
    // trains a Bloom filter over the TEST grams once (distributed
    // tree-aggregate, MBs at fpp 1e-4) and probes it row-locally
    // inside a higher-order filter on the train side: ZERO
    // train-side shuffle for the non-candidate mass, scan-shaped at
    // any corpus size. False positives can only over-flag (never
    // under-flag) — BloomDecontaminateSpec pins the superset
    // property — so an exact-confirm join over the SURVIVORS only
    // (the bloom-flagged sliver, ~test-suite-sized, not
    // corpus-sized) removes the FPs and makes the output
    // deterministic: identical to pipeline_decontaminate, which is
    // exactly what lets this scale path share the exact oracle
    // (round-8; previously rows-only because the raw prefilter
    // output was FP-dependent).
    "pipeline_decontaminate_bloom" -> ((s, d) => {
      import s.implicits._
      val (candidates, testGrams) = bloomCandidates(s, d)
      // exact confirm: only candidate grams shuffle (bounded by the
      // bloom hit volume ≈ true hits + fpp·train-grams, not by the
      // corpus); distinct test grams broadcast-able at any sane
      // test-suite size
      candidates.join(testGrams.distinct(), Seq("gram"))
        .groupBy($"doc_id")
        .agg(count_distinct($"gram").as("n_shared_grams"))
        .orderBy($"doc_id")
    }),

    // Leakage-safe corpus split summary (see splitCol). Row-local,
    // scan-shaped.
    "pipeline_split" -> ((s, d) => {
      import s.implicits._
      Tables.load(s, d, "documents")
        .withColumn("split", splitCol($"text"))
        .groupBy($"lang", $"split")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_chars").as("sum_chars"))
        .orderBy($"lang", $"split")
    }),
    // Split-leakage audit: near-dup pairs that CROSS the train/test
    // boundary — the eval-contamination check a content-hash split
    // does not give you for free (hash splitting prevents EXACT-dup
    // leakage by construction; near-dups of each other still land on
    // opposite sides and inflate eval scores). Composes the two
    // already-verified primitives: dedup_ngram_jaccard's blocked pair
    // list and pipeline_split's content-hash assignment, joined on
    // both endpoints and filtered to split_a ≠ split_b. Scale shape:
    // the (doc_id, split) table is corpus-sized, so both lookups are
    // doc-keyed hash joins (two shuffles of id+split pairs — splits
    // never broadcast at 100 TB); the pair list is the bounded output
    // of the near-dup pass. The fix-side policy op is
    // pipeline_keep_best (collapse each cluster to one side);
    // this query is the detector that says you need it.
    //
    // ROUND-10 GENERATOR SWAP (same remedy, same reasoning as
    // pipeline_dedup_sweep — this was the other consumer of the
    // lang×length-blocked J >= 0.05 generator, and the round-10
    // decade probe caught it: wall exp 0.89 with CPU growing
    // super-linearly, 22 s → 302 s across sf0.1→sf1). The detector
    // now runs the LOSSLESS prefix-filter generator at J >= 1/2:
    // cross-split near-duplicate leakage is exactly the
    // near-dup-crossing-the-fence case, and losslessness means NO
    // leaked pair at the operating point is missed — the blocked
    // generator silently missed cross-length-block leaks. Semantics
    // change stated: threshold 0.05 → 0.5; jaccard is now the exact
    // n_inter/n_union of the hashed shingle sets.
    "pipeline_split_leakage" -> ((s, d) => {
      import s.implicits._
      val pairs = graft.dedup.Dedup.prefixFilterPairs(s, d)
        .select($"doc_a", $"doc_b",
          ($"n_inter".cast("double") / $"n_union".cast("double"))
            .as("jaccard"))
      val splits = Tables.load(s, d, "documents")
        .select($"doc_id", splitCol($"text").as("split"))
      pairs
        .join(splits.select($"doc_id".as("doc_a"),
          $"split".as("split_a")), Seq("doc_a"))
        .join(splits.select($"doc_id".as("doc_b"),
          $"split".as("split_b")), Seq("doc_b"))
        .filter($"split_a" =!= $"split_b")
        .select($"doc_a", $"doc_b", $"jaccard", $"split_a", $"split_b")
        .orderBy($"doc_a", $"doc_b")
    }),
    // Per-language quality gate: keep documents at or above their
    // language's MEDIAN quality score. Two-pass scale shape — NOT a
    // percent_rank window (partitionBy(lang) would funnel a 100 TB
    // corpus into one task per language): (1) groupBy(lang) exact
    // median over the INTEGER-milli score — the score has bounded
    // cardinality (~thousands of distinct values), so the percentile
    // aggregate's state is a small count-map with map-side partials,
    // not a value buffer; (2) broadcast the 5-row threshold table and
    // filter the scan. Integer domain on both engines: floor(qs*1000)
    // is bit-identical (text_quality proves qs itself matches), and
    // median interpolation on small integers at the dyadic 0.5 is
    // exact in both (the q20 precedent).
    "pipeline_quality_gate" -> ((s, d) => {
      import s.implicits._
      val scored = Tables.load(s, d, "documents")
        .withColumn("t", split(lower($"text"), "\\s+"))
        .withColumn("score_milli", floor(
          (when(length($"text") >= 100, lit(1.0)).otherwise(lit(0.0)) +
            size(array_distinct($"t")).cast("double") /
              size($"t").cast("double") +
            size(filter($"t", x => x.isInCollection(
              Seq("the", "a", "of", "and", "is", "to", "in"))))
              .cast("double") / size($"t").cast("double")) * 1000)
          .cast("long"))
      val thresholds = scored.groupBy($"lang")
        .agg(expr("percentile(score_milli, 0.5)").as("med"))
      scored.join(broadcast(thresholds), Seq("lang"))
        .filter($"score_milli".cast("double") >= $"med")
        .select($"doc_id", $"lang", $"score_milli")
        .orderBy($"doc_id")
    }),

    // Stratified corpus sampling: per-language deterministic rates
    // (downsample the dominant language to rebalance the mix) keyed on
    // a salted content hash — pure function of the row, so re-runs and
    // incremental batches agree without any coordination, and identical
    // texts sample identically (the pipeline_split discipline). The
    // lexicographic hex compare is numeric order; row-local,
    // scan-shaped at any scale.
    "pipeline_sample_stratified" -> ((s, d) => {
      import s.implicits._
      val bucket = substring(md5(concat(lit("sample:"), $"text")), 1, 2)
      val keep = bucket < when($"lang" === "en", lit("40")) // 64/256
        .otherwise(lit("80")) // 128/256
      Tables.load(s, d, "documents")
        .filter(keep)
        .select($"doc_id", $"lang", $"source")
        .orderBy($"doc_id")
    }),

    // Exact-k per-group sample: bottom-k by salted content hash — the
    // deterministic reservoir. The hash order is content-random, so
    // the pick is uniform; it is also re-run-stable and
    // engine-agnostic (the pipeline_split discipline), unlike an
    // actual reservoir whose result depends on encounter order. Scale
    // shape: row_number under the (lang)-partitioned hash order is a
    // WindowGroupLimit — each map task keeps only its local bottom-k
    // before the shuffle, so per-group state is k rows, never the
    // group.
    "pipeline_sample_fixed_k" -> ((s, d) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"lang").orderBy($"skey", $"doc_id")
      Tables.load(s, d, "documents")
        .withColumn("skey", md5(concat(lit("fixedk:"), $"text")))
        .withColumn("pick", row_number().over(w).cast("long"))
        .filter($"pick" <= 20)
        .select($"lang", $"pick", $"doc_id", $"skey")
        .orderBy($"lang", $"pick")
    }),

    // Deterministic global training shuffle: every epoch-0 data loader
    // wants the corpus in a reproducible pseudorandom order. The sort
    // key is a seeded content-free hash of doc_id, so the ORDER BY is
    // a range-partitioned distributed sort over uniformly distributed
    // keys — no skew, no single-task window (a row_number() global
    // window would serialize; the key itself IS the position). shard
    // (first hex nibble, 0-15) is the downstream writer bucket.
    "pipeline_shuffle" -> ((s, d) => {
      import s.implicits._
      val key = md5(concat(lit("shuffle42:"), $"doc_id".cast("string")))
      Tables.load(s, d, "documents")
        .select($"doc_id", $"lang", key.as("shuffle_key"),
          conv(substring(key, 1, 1), 16, 10).cast("long").as("shard"))
        .orderBy($"shuffle_key", $"doc_id")
    }),

    // Deterministic domain-mixture interleaving — the data-mixing
    // scheduler every multi-corpus training run needs (e.g. 4 parts
    // English to 1 part each other language): weighted fair queuing's
    // virtual-time rule. Item k of a weight-w stream is scheduled at
    // vtime (2k−1)/w; with integer weights the comparison runs on the
    // exact integer (2k−1)·(W/w) (W = max weight), so both engines
    // order identically — no float virtual clock. Per-stream sequence
    // numbers come from a lang-partitioned window here; at 100 TB
    // per-stream numbering is a prefix-sum problem and rides
    // ops.PrefixSum (the q47 two-pass form) instead of a 5-task
    // window funnel. Emits the first 200 schedule slots.
    "pipeline_interleave" -> ((s, d) => {
      import s.implicits._
      val wLang = org.apache.spark.sql.expressions.Window
        .partitionBy($"lang").orderBy($"doc_id")
      // mult = W/w as an exact integer: en (w=4) → 1, others (w=1) → 4
      val mult = when($"lang" === "en", lit(1L)).otherwise(lit(4L))
      Tables.load(s, d, "documents")
        .withColumn("rn", row_number().over(wLang).cast("long"))
        .withColumn("vtime", (lit(2L) * $"rn" - 1L) * mult)
        .select($"vtime", $"lang", $"rn", $"doc_id")
        .orderBy($"vtime", $"lang", $"doc_id")
        .limit(200)
    }),

    // Contiguous global sample numbering in the deterministic shuffle
    // order — the "assign example ids" pass before sharded writes.
    // A row_number() window with no partitionBy funnels the corpus
    // through ONE task; this rides ops.PrefixSum's two-pass
    // distributed scan (range shuffle → per-partition totals → driver
    // exclusive scan → broadcast offsets), partition-count-invariant
    // (PrefixSumSpec) and equal to the window form row-for-row — the
    // oracle IS that window form.
    "pipeline_global_index" -> ((s, d) => {
      import s.implicits._
      val key = md5(concat(lit("shuffle42:"), $"doc_id".cast("string")))
      graft.ops.PrefixSum.runningTotal(
        Tables.load(s, d, "documents").select($"doc_id", key.as("skey")),
        Seq(col("skey"), col("doc_id")), lit(1L), "global_idx")
        .select($"doc_id", $"skey", $"global_idx")
        .orderBy($"global_idx")
    }),

    // Training-shard planner: assign documents to contiguous
    // fixed-token-budget shards in deterministic global order — the
    // webdataset/tar-shard build step between curation and the
    // dataloader. shard_id = exclusive-cumulative-tokens div budget
    // off PrefixSum's distributed running total (a doc starts a new
    // shard when the budget would overflow mid-doc under this
    // greedy-contiguous rule); the report is the per-shard rollup
    // (shard-count-bounded). Order is pipeline_global_index's
    // content-pure md5 — re-runs produce identical shards.
    "pipeline_shard_plan" -> ((s, d) => {
      import s.implicits._
      val budget = 20000L // tokens per shard
      val docs = Tables.spread(Tables.load(s, d, "documents"))
        .select($"doc_id",
          size(split($"text", "\\s+")).cast("long").as("n_tok"),
          md5(concat(lit("shard42:"), $"doc_id".cast("string")))
            .as("skey"))
      val cum = graft.ops.PrefixSum.runningTotal(docs,
        Seq(col("skey"), col("doc_id")), $"n_tok", "cum_tok")
      cum
        .withColumn("shard_id",
          expr("(cum_tok - n_tok) div " + budget))
        .groupBy($"shard_id")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"),
          min($"skey").as("first_key"))
        .orderBy($"shard_id")
    }),

    // Temperature-sampled language mixture (α = 0.3): the
    // multilingual rebalancing schedule (mBERT/XLM-R exponent
    // smoothing) — sampling weights ∝ p^α lift low-resource languages
    // without drowning the head. Per-language token masses are exact
    // longs; p^α and the weight normalization are the only floats,
    // and the Σp^α normalizer folds a LANG-SORTED enum-sized array
    // (both engines accumulate the identical IEEE sequence; pow
    // itself is libm — round(6) absorbs its ulp).
    "pipeline_temperature_mix" -> ((s, d) => {
      import s.implicits._
      val langs = Tables.spread(Tables.load(s, d, "documents"))
        .select($"lang",
          size(split($"text", "\\s+")).cast("long").as("n_tok"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"), sum($"n_tok").as("n_tokens"))
      val tot = langs.agg(sum($"n_tokens").as("tot"))
      val withP = langs.crossJoin(broadcast(tot))
        .select($"lang", $"n_docs", $"n_tokens",
          ($"n_tokens".cast("double") / $"tot".cast("double"))
            .as("p"))
        .withColumn("pa", pow($"p", lit(0.3)))
      withP
        .agg(sort_array(collect_list(struct($"lang", $"n_docs",
          $"n_tokens", $"p", $"pa"))).as("arr"))
        .select(explode($"arr").as("r"),
          expr("""aggregate(arr, CAST(0.0 AS DOUBLE),
            (a, x) -> a + x.pa)""").as("sum_pa"))
        .select($"r.lang".as("lang"), $"r.n_docs".as("n_docs"),
          $"r.n_tokens".as("n_tokens"),
          round($"r.p", 6).as("p"),
          round($"r.pa" / $"sum_pa", 6).as("w"),
          round($"r.pa" / $"sum_pa" / $"r.p", 4).as("boost"))
        .orderBy($"lang")
    }),

    // Tiered dedup sweep report: the policy table a curation run
    // reads before committing to a dedup configuration — how many
    // documents each tier removes, applied in escalating cost order
    // (exact digests first, near-dup clusters among the exact
    // survivors second). Composes three verified pieces (digest
    // keep-first, prefix-filter candidate pairs, connected
    // components); each tier's counts are aggregates cross-joined
    // into a two-row report — no driver-side counting. The near tier
    // only ever sees exact survivors, mirroring how a production
    // sweep avoids paying shingle cost on verbatim copies.
    //
    // ROUND-10 CANDIDATE-GENERATOR SWAP (the r9 verdict's one
    // scale-weak hold): the near tier previously ran the blocked
    // exact-Jaccard generator at J >= 0.05 — lang×length block
    // occupancy grows linearly with corpus size at fixed key
    // cardinality, so within-block pair enumeration grows
    // QUADRATICALLY (measured decade-probe growth exponent 1.24,
    // PLANS.md). It now runs the LOSSLESS prefix-filter generator
    // (Dedup.prefixFilterPairsOver): candidates only where the
    // (df ASC, hash ASC)-sorted shingle PREFIXES share a shingle —
    // pigeonhole-complete at J >= 1/2 — then the same exact-Jaccard
    // verify and CC tier. SEMANTICS CHANGE, stated: the near tier's
    // threshold is now J >= 0.5 ("near-duplicate") instead of 0.05
    // ("any overlap"); 0.05 is below every published near-dup
    // operating point and was the only consumer forcing the
    // quadratic generator. Oracle re-derived to replay the new
    // generator (still hash-exact); candidate occupancy is bounded
    // by prefix-shingle document frequency, not corpus size
    // (decade-probe exp 0.39 for the standalone prefix-filter op).
    "pipeline_dedup_sweep" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.spread(Tables.load(s, d, "documents"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      // persist: the digest rollup (an md5 pass over every text) has
      // THREE consumers below (the survivor join, nKeep1, and t2's
      // reuse of nKeep1) — unpersisted it re-hashed the corpus each
      // time (r19, guide §1.2)
      val keep1 = docs
        .select($"doc_id", md5($"text").as("digest"))
        .groupBy($"digest").agg(min($"doc_id").as("doc_id"))
        .select($"doc_id")
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val survivors = docs.join(keep1, Seq("doc_id"))
      val cc = graft.dedup.Dedup.connectedComponents(
        graft.dedup.Dedup.prefixFilterPairsOver(
          graft.dedup.Dedup.shingleBlocks(survivors)))
      val nDocs = docs.agg(count(lit(1)).as("n_in"))
      val nKeep1 = keep1.agg(count(lit(1)).as("n_out"))
      val nNearRemoved = cc.filter($"doc_id" =!= $"component")
        .agg(count(lit(1)).as("n_removed"))
      val t1 = nDocs.crossJoin(nKeep1)
        .select(lit("1_exact").as("tier"), $"n_in",
          ($"n_in" - $"n_out").as("n_removed"), $"n_out")
      val t2 = nKeep1.select($"n_out".as("n_in"))
        .crossJoin(nNearRemoved)
        .select(lit("2_near_jaccard").as("tier"), $"n_in",
          $"n_removed", ($"n_in" - $"n_removed").as("n_out"))
      t1.unionAll(t2).orderBy($"tier")
    }),

    // Curriculum schedule: global training order (easy → hard, short
    // docs first — the classic length-based curriculum heuristic)
    // with a content-pure deterministic shuffle WITHIN each
    // difficulty level (md5, pipeline_global_index's key — no RNG, so
    // re-runs and engines agree). The contiguous index rides
    // PrefixSum's two-pass distributed scan over the (n_tokens, md5)
    // order — never a single-task window; swapping the heuristic for
    // a model-scored difficulty column changes one expression.
    "pipeline_curriculum" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.load(s, d, "documents")
        .select($"doc_id",
          size(split($"text", "\\s+")).cast("long").as("n_tokens"),
          md5(concat(lit("curr42:"), $"doc_id".cast("string")))
            .as("skey"))
      graft.ops.PrefixSum.runningTotal(docs,
        Seq(col("n_tokens"), col("skey"), col("doc_id")), lit(1L),
        "curriculum_idx")
        .select($"doc_id", $"n_tokens", $"skey", $"curriculum_idx")
        .orderBy($"curriculum_idx")
    }),

    "pipeline_training_prep_v2" -> ((s, d) => trainingPrepV2(s, d)),
    "pipeline_training_prep" -> ((s, d) => {
      import s.implicits._
      val embs = Tables.load(s, d, "embeddings")
      val deduped = keepFirstDigest(
        qualityFiltered(Tables.load(s, d, "documents")))
      deduped
        .join(broadcast(embs), deduped("doc_id") === embs("vec_id"))
        .select($"doc_id", $"lang", $"source", $"n_chars", $"ttr",
          $"label", size($"embedding").cast("long").as("emb_dim"))
        .orderBy($"doc_id")
    }),

    // CDC / MERGE-INTO apply: reconcile a snapshot with a changelog of
    // upserts and deletes, latest-wins per key by sequence number —
    // the incremental-corpus-refresh operator (a crawler re-visit
    // updates or tombstones documents between training runs). The
    // changelog here is derived deterministically from the snapshot
    // (the fixtures ship no second table) — updates for doc_id%10==3,
    // tombstones for %10==7, fresh inserts keyed past the snapshot
    // range for %10==5, plus a second-generation update (%100==3) so
    // multiple log entries per key exercise the latest-wins rule.
    // Shape: ONE shuffle on the key for the per-key latest pick
    // (row_number, WindowGroupLimit partial on each map side). At
    // 100 TB the changelog is typically ≪ the snapshot, so the same
    // plan holds with the log side's pre-aggregation folding first;
    // nothing here is driver-side.
    "pipeline_cdc_apply" -> ((s, d) => {
      import s.implicits._
      def src = Tables.load(s, d, "documents")
      val snap = src.select($"doc_id", $"lang", $"source", $"text",
        lit(0L).as("seq"), lit("I").as("op"))
      val upd1 = src.filter($"doc_id" % 10 === 3)
        .select($"doc_id", $"lang", $"source",
          upper($"text").as("text"), lit(1L).as("seq"), lit("U").as("op"))
      val dels = src.filter($"doc_id" % 10 === 7)
        .select($"doc_id", $"lang", $"source", $"text",
          lit(1L).as("seq"), lit("D").as("op"))
      val ins = src.filter($"doc_id" % 10 === 5)
        .select(($"doc_id" + 1000000L).as("doc_id"), $"lang", $"source",
          reverse($"text").as("text"), lit(1L).as("seq"),
          lit("I").as("op"))
      val upd2 = src.filter($"doc_id" % 100 === 3)
        .select($"doc_id", $"lang", $"source",
          concat($"text", lit(" v3")).as("text"), lit(2L).as("seq"),
          lit("U").as("op"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"seq".desc)
      snap.unionByName(upd1).unionByName(dels).unionByName(ins)
        .unionByName(upd2)
        .withColumn("rn", row_number().over(w))
        .filter($"rn" === 1 && $"op" =!= "D")
        .select($"doc_id", $"lang", $"source", md5($"text").as("digest"))
        .orderBy($"doc_id")
    }))

  /** The full modern prep flow in ONE optimized plan: quality filter →
    * exact dedup (digest keeper) → NEAR-dup removal (blocked ngram
    * pairs → connected components → keep cluster minima) →
    * deterministic split assignment → embedding attach. Each stage is
    * the scale shape proven for its standalone operator; composing
    * them lets Catalyst push the quality predicates into the scan
    * under everything else.
    */
  def trainingPrepV2(s: org.apache.spark.sql.SparkSession, d: String)
      : DataFrame = {
    import s.implicits._
    val embs = Tables.load(s, d, "embeddings")
    val deduped = keepFirstDigest(
      qualityFiltered(Tables.load(s, d, "documents")))
      .drop("t", "digest", "keeper")
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // near-dup clusters among the survivors; droppees = cluster
    // members that are not the component minimum
    val pairs = graft.dedup.Dedup.ngramJaccardPairs(
      graft.dedup.Dedup.shingleBlocks(deduped), 0.6)
    val droppees = graft.dedup.Dedup.connectedComponents(pairs)
      .filter($"doc_id" =!= $"component")
      .select($"doc_id")
    deduped
      .join(droppees, Seq("doc_id"), "left_anti")
      .withColumn("split", splitCol($"text"))
      .join(broadcast(embs), $"doc_id" === embs("vec_id"))
      .select($"doc_id", $"lang", $"split", embs("label"))
      .orderBy($"doc_id")
  }

  def oracles: Map[String, String] = Map(

    "pipeline_vocab_encode" ->
      """WITH t AS (
           SELECT doc_id, string_split_regex(lower(text), '\s+') AS tk
           FROM documents),
         tok AS (
           SELECT doc_id, unnest(tk) AS tok,
             unnest(range(0, len(tk))) AS pos
           FROM t),
         counts AS (SELECT tok, count(*) AS c FROM tok GROUP BY 1),
         vocab AS (
           SELECT tok, CAST(row_number() OVER (ORDER BY c DESC, tok)
             AS BIGINT) - 1 AS id
           FROM counts ORDER BY c DESC, tok LIMIT 1000),
         enc AS (
           SELECT t2.doc_id, t2.pos, coalesce(v.id, -1) AS id
           FROM tok t2 LEFT JOIN vocab v USING (tok))
         SELECT doc_id, CAST(count(*) AS BIGINT) AS n_tokens,
           md5(array_to_string(list(CAST(id AS VARCHAR) ORDER BY pos),
             ',')) AS ids_fp
         FROM enc GROUP BY doc_id ORDER BY doc_id""",

    "pipeline_resample" ->
      """WITH w AS (
           SELECT doc_id, lang,
             CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT)
               AS w
           FROM documents),
         t AS (SELECT CAST(sum(w) AS BIGINT) AS total FROM w),
         c AS (
           SELECT doc_id, lang, w,
             CAST(sum(w) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum
           FROM w)
         SELECT doc_id, lang, w AS n_tokens,
           CAST((cum * 1000) // t.total
              - ((cum - w) * 1000) // t.total AS BIGINT) AS n_copies
         FROM c, t
         WHERE (cum * 1000) // t.total
             - ((cum - w) * 1000) // t.total >= 1
         ORDER BY doc_id""",

    "pipeline_chunk" ->
      """WITH t AS (
           SELECT doc_id, string_split_regex(lower(text), '\s+') AS tk,
             len(string_split_regex(lower(text), '\s+')) AS n
           FROM documents),
         c AS (
           SELECT doc_id, tk, ci
           FROM t, unnest(range(0,
             1 + greatest(0, n - 64 + 47) // 48)) AS u(ci))
         SELECT doc_id, CAST(ci AS BIGINT) AS chunk_id,
           CAST(len(list_slice(tk, ci*48 + 1, ci*48 + 64)) AS BIGINT)
             AS n_tokens,
           array_to_string(list_slice(tk, ci*48 + 1, ci*48 + 64), ' ')
             AS chunk_text
         FROM c ORDER BY doc_id, chunk_id""",
    "pipeline_pack" ->
      """WITH t AS (
           SELECT lang, source, doc_id,
             CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT)
               AS n_tokens,
             CAST(sum(len(string_split_regex(lower(text), '\s+')))
               OVER (PARTITION BY lang, source ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
               AS BIGINT) AS cum
           FROM documents)
         SELECT lang, source,
           CAST(floor((cum - n_tokens) / 512) AS BIGINT) AS seq_id,
           count(*) AS n_docs, CAST(sum(n_tokens) AS BIGINT) AS sum_tokens
         FROM t GROUP BY 1, 2, 3 ORDER BY lang, source, seq_id""",
    // the bloom variant's exact-confirm join makes its output
    // identical to the exact form by construction, so the two share
    // one oracle (the bloom filter is a shuffle-avoidance prefilter,
    // not a semantics change)
    "pipeline_decontaminate_bloom" -> decontaminateOracle,
    "pipeline_decontaminate" -> decontaminateOracle,
  ) ++ oraclesRest

  private val decontaminateOracle: String =
      """WITH toks AS (
           SELECT doc_id,
             CASE WHEN substring(md5(text), 1, 1) < 'c'
                  THEN 'train' ELSE 'test' END AS split,
             string_split_regex(lower(text), '\s+') AS t
           FROM documents),
         grams AS (
           SELECT doc_id, split,
             list_distinct(list_transform(
               range(1, greatest(len(t) - 3, 0) + 1),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2] || ' ' || t[i+3]))
               AS g
           FROM toks),
         train AS (
           SELECT doc_id, unnest(g) AS gram FROM grams WHERE split = 'train'),
         testg AS (
           SELECT DISTINCT unnest(g) AS gram FROM grams WHERE split = 'test')
         SELECT t.doc_id,
           CAST(count(DISTINCT t.gram) AS BIGINT) AS n_shared_grams
         FROM train t JOIN testg USING (gram)
         GROUP BY t.doc_id ORDER BY doc_id"""

  private val oraclesRest: Map[String, String] = Map(
    "pipeline_split" ->
      """SELECT lang,
           CASE WHEN substring(md5(text), 1, 1) < 'c'
                THEN 'train' ELSE 'test' END AS split,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_chars) AS BIGINT) AS sum_chars
         FROM documents GROUP BY 1, 2 ORDER BY lang, split""",
    // composes dedup_ngram_jaccard's pair CTE with pipeline_split's
    // assignment rule — the same float-exact jaccard expression, so
    // the doubles hash-match
    // round-10 re-derivation: the shared shingle + prefix-filter CTEs
    // (J >= 1/2, lossless) replace the blocked 0.05 pair CTE — see
    // the Spark side's comment.
    "pipeline_split_leakage" ->
      s"""WITH ${graft.dedup.Dedup.shingleCtesOver("documents")},
         ${graft.dedup.Dedup.prefixFilterSqlCtes},
         pr AS (
           SELECT doc_a, doc_b,
             CAST(n_inter AS DOUBLE) / CAST(n_union AS DOUBLE)
               AS jaccard
           FROM v WHERE n_inter * 2 >= n_union),
         sp AS (
           SELECT doc_id,
             CASE WHEN substring(md5(text), 1, 1) < 'c'
                  THEN 'train' ELSE 'test' END AS split
           FROM documents)
         SELECT p.doc_a, p.doc_b, p.jaccard,
           sa.split AS split_a, sb.split AS split_b
         FROM pr p
         JOIN sp sa ON p.doc_a = sa.doc_id
         JOIN sp sb ON p.doc_b = sb.doc_id
         WHERE sa.split <> sb.split
         ORDER BY p.doc_a, p.doc_b""",
    "pipeline_quality_gate" ->
      """WITH scored AS (
           SELECT doc_id, lang,
             CAST(floor((
               CASE WHEN length(text) >= 100 THEN 1.0 ELSE 0.0 END +
               CAST(len(list_distinct(string_split_regex(lower(text), '\s+'))) AS DOUBLE) /
                 CAST(len(string_split_regex(lower(text), '\s+')) AS DOUBLE) +
               CAST(len(list_filter(string_split_regex(lower(text), '\s+'),
                 x -> x IN ('the','a','of','and','is','to','in'))) AS DOUBLE) /
                 CAST(len(string_split_regex(lower(text), '\s+')) AS DOUBLE)
             ) * 1000) AS BIGINT) AS score_milli
           FROM documents),
         th AS (
           SELECT lang,
             percentile_cont(0.5) WITHIN GROUP (ORDER BY score_milli) AS med
           FROM scored GROUP BY lang)
         SELECT s.doc_id, s.lang, s.score_milli
         FROM scored s JOIN th USING (lang)
         WHERE CAST(s.score_milli AS DOUBLE) >= th.med
         ORDER BY s.doc_id""",
    "pipeline_sample_stratified" ->
      """SELECT doc_id, lang, source FROM documents
         WHERE substring(md5('sample:' || text), 1, 2) <
           CASE WHEN lang = 'en' THEN '40' ELSE '80' END
         ORDER BY doc_id""",
    "pipeline_sample_fixed_k" ->
      """WITH keyed AS (
           SELECT lang, doc_id, md5('fixedk:' || text) AS skey
           FROM documents),
         r AS (
           SELECT lang, doc_id, skey,
             CAST(row_number() OVER (PARTITION BY lang
               ORDER BY skey, doc_id) AS BIGINT) AS pick
           FROM keyed)
         SELECT lang, pick, doc_id, skey FROM r
         WHERE pick <= 20 ORDER BY lang, pick""",
    "pipeline_shuffle" ->
      """SELECT doc_id, lang,
           md5('shuffle42:' || CAST(doc_id AS VARCHAR)) AS shuffle_key,
           CAST(strpos('0123456789abcdef',
             substring(md5('shuffle42:' || CAST(doc_id AS VARCHAR)), 1, 1))
             - 1 AS BIGINT) AS shard
         FROM documents
         ORDER BY shuffle_key, doc_id""",
    "pipeline_global_index" ->
      """SELECT doc_id,
           md5('shuffle42:' || CAST(doc_id AS VARCHAR)) AS skey,
           CAST(row_number() OVER (
             ORDER BY md5('shuffle42:' || CAST(doc_id AS VARCHAR)),
               doc_id) AS BIGINT) AS global_idx
         FROM documents ORDER BY global_idx""",
    "pipeline_shard_plan" ->
      """WITH docs AS (
           SELECT doc_id,
             CAST(len(string_split_regex(text, '\s+')) AS BIGINT)
               AS n_tok,
             md5('shard42:' || CAST(doc_id AS VARCHAR)) AS skey
           FROM documents),
         cum AS (
           SELECT doc_id, n_tok, skey,
             CAST(sum(n_tok) OVER (ORDER BY skey, doc_id) AS BIGINT)
               AS cum_tok
           FROM docs)
         SELECT (cum_tok - n_tok) // 20000 AS shard_id,
           CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_tok) AS BIGINT) AS n_tokens,
           min(skey) AS first_key
         FROM cum GROUP BY 1 ORDER BY shard_id""",

    "pipeline_temperature_mix" ->
      """WITH langs AS (
           SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
             CAST(sum(len(string_split_regex(text, '\s+')))
               AS BIGINT) AS n_tokens
           FROM documents GROUP BY 1),
         tot AS (SELECT CAST(sum(n_tokens) AS BIGINT) AS tot
                 FROM langs),
         withp AS (
           SELECT lang, n_docs, n_tokens,
             CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE) AS p,
             pow(CAST(n_tokens AS DOUBLE) / CAST(tot AS DOUBLE),
               CAST(0.3 AS DOUBLE)) AS pa
           FROM langs, tot),
         one AS (
           SELECT list({'lang': lang, 'n_docs': n_docs,
             'n_tokens': n_tokens, 'p': p, 'pa': pa}
             ORDER BY lang) AS arr
           FROM withp),
         x AS (
           SELECT unnest(arr) AS r,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(arr, x -> x.pa)), (a, b) -> a + b)
               AS sum_pa
           FROM one)
         SELECT r.lang AS lang, r.n_docs AS n_docs,
           r.n_tokens AS n_tokens,
           round(r.p, 6) AS p,
           round(r.pa / sum_pa, 6) AS w,
           round(r.pa / sum_pa / r.p, 4) AS boost
         FROM x ORDER BY lang""",

    // keep1 survivors → hashed-shingle CTEs → the shared prefix-filter
    // replay (J >= 1/2, lossless) → the dedup_clusters recursive-CC
    // replay, plus the two-row report arithmetic. Re-derived for the
    // round-10 candidate-generator swap (see the Spark side's comment).
    "pipeline_dedup_sweep" ->
      s"""WITH RECURSIVE keep1 AS MATERIALIZED (
           SELECT min(doc_id) AS doc_id
           FROM documents GROUP BY md5(text)),
         docs0 AS MATERIALIZED (
           SELECT d.doc_id, d.text
           FROM documents d JOIN keep1 k ON k.doc_id = d.doc_id),
         ${graft.dedup.Dedup.shingleCtesOver("docs0")},
         ${graft.dedup.Dedup.prefixFilterSqlCtes},
         pairs AS MATERIALIZED (
           SELECT doc_a, doc_b FROM v
           WHERE n_inter * 2 >= n_union),
         edges AS MATERIALIZED (
           SELECT doc_a AS src, doc_b AS dst FROM pairs
           UNION ALL SELECT doc_b, doc_a FROM pairs),
         reach(src, dst) AS (
           SELECT src, dst FROM edges
           UNION
           SELECT r.src, e.dst FROM reach r JOIN edges e
             ON r.dst = e.src),
         members AS MATERIALIZED (SELECT DISTINCT src AS doc_id FROM edges),
         cc AS MATERIALIZED (
           SELECT least(m.doc_id, min(r.dst)) AS component, m.doc_id
           FROM members m JOIN reach r ON r.src = m.doc_id
           GROUP BY m.doc_id),
         counts AS (
           SELECT
             (SELECT CAST(count(*) AS BIGINT) FROM documents) AS n0,
             (SELECT CAST(count(*) AS BIGINT) FROM keep1) AS k1,
             (SELECT CAST(count(*) AS BIGINT) FROM cc
               WHERE doc_id <> component) AS r2)
         SELECT '1_exact' AS tier, n0 AS n_in, n0 - k1 AS n_removed,
           k1 AS n_out FROM counts
         UNION ALL
         SELECT '2_near_jaccard', k1, r2, k1 - r2 FROM counts
         ORDER BY tier""",

    // Independent formulation: the single-sort row_number window the
    // PrefixSum scan replaces.
    "pipeline_curriculum" ->
      """WITH t AS (
           SELECT doc_id,
             CAST(len(string_split_regex(text, '\s+')) AS BIGINT)
               AS n_tokens,
             md5('curr42:' || CAST(doc_id AS VARCHAR)) AS skey
           FROM documents)
         SELECT doc_id, n_tokens, skey,
           CAST(row_number() OVER (ORDER BY n_tokens, skey, doc_id)
             AS BIGINT) AS curriculum_idx
         FROM t ORDER BY curriculum_idx""",
    "pipeline_interleave" ->
      """WITH r AS (
           SELECT lang, doc_id,
             CAST(row_number() OVER (PARTITION BY lang ORDER BY doc_id)
               AS BIGINT) AS rn
           FROM documents),
         v AS (
           SELECT (2 * rn - 1) *
             (CASE WHEN lang = 'en' THEN 1 ELSE 4 END) AS vtime,
             lang, rn, doc_id
           FROM r)
         SELECT CAST(vtime AS BIGINT) AS vtime, lang, rn, doc_id
         FROM v ORDER BY vtime, lang, doc_id LIMIT 200""",
    "pipeline_training_prep_v2" ->
      """WITH RECURSIVE scored AS MATERIALIZED (
           SELECT doc_id, lang, source, n_chars, text,
             CAST(len(list_distinct(string_split_regex(lower(text), '\s+'))) AS DOUBLE) /
             CAST(len(string_split_regex(lower(text), '\s+')) AS DOUBLE) AS ttr
           FROM documents
           WHERE n_chars >= 200),
         filtered AS MATERIALIZED (SELECT * FROM scored WHERE ttr >= 0.3),
         dedup1 AS MATERIALIZED (
           SELECT * FROM (
             SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS keeper
             FROM filtered)
           WHERE doc_id = keeper),
         shingled AS MATERIALIZED (
           SELECT doc_id,
             lang || '#' || CAST(CAST(floor(n_chars / 100) AS BIGINT) AS VARCHAR) AS block,
             list_distinct(list_transform(
               range(1, greatest(len(string_split_regex(lower(text), '\s+')) - 2, 0) + 1),
               i -> string_split_regex(lower(text), '\s+')[i] || ' ' ||
                    string_split_regex(lower(text), '\s+')[i+1] || ' ' ||
                    string_split_regex(lower(text), '\s+')[i+2])) AS sh
           FROM dedup1),
         -- posting-list form of the same J >= 0.6 verify (r14 sf1 gate
         -- finding: per-pair list_intersect ran on ~4 cores; a shared-
         -- shingle hash join + group-by enumerates exactly the same
         -- passing set, since a zero-overlap pair can never reach 0.6;
         -- the len > 0 guards are implied — empty lists post nothing)
         sizes AS MATERIALIZED (
           SELECT doc_id, CAST(len(sh) AS BIGINT) AS l FROM shingled),
         posting AS MATERIALIZED (
           SELECT doc_id, block, unnest(sh) AS tok FROM shingled),
         inter AS MATERIALIZED (
           SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
             CAST(count(*) AS BIGINT) AS ni
           FROM posting a JOIN posting b
             ON a.block = b.block AND a.tok = b.tok
            AND a.doc_id < b.doc_id
           GROUP BY 1, 2),
         pairs AS MATERIALIZED (
           SELECT i.doc_a, i.doc_b
           FROM inter i
           JOIN sizes sa ON sa.doc_id = i.doc_a
           JOIN sizes sb ON sb.doc_id = i.doc_b
           WHERE CAST(i.ni AS DOUBLE) /
                 CAST(sa.l + sb.l - i.ni AS DOUBLE) >= 0.6),
         edges AS MATERIALIZED (
           SELECT doc_a AS src, doc_b AS dst FROM pairs
           UNION ALL SELECT doc_b, doc_a FROM pairs),
         reach(src, dst) AS (
           SELECT src, dst FROM edges
           UNION
           SELECT r.src, e.dst FROM reach r JOIN edges e ON r.dst = e.src),
         members AS MATERIALIZED (SELECT DISTINCT src AS doc_id FROM edges),
         droppees AS (
           SELECT m.doc_id FROM members m JOIN reach r ON r.src = m.doc_id
           GROUP BY m.doc_id
           HAVING m.doc_id <> least(m.doc_id, min(r.dst)))
         SELECT d.doc_id, d.lang,
           CASE WHEN substring(md5(d.text), 1, 1) < 'c'
                THEN 'train' ELSE 'test' END AS split,
           e.label
         FROM dedup1 d
         JOIN embeddings e ON d.doc_id = e.vec_id
         WHERE d.doc_id NOT IN (SELECT doc_id FROM droppees)
         ORDER BY d.doc_id""",
    "pipeline_training_prep" ->
      """WITH scored AS (
           SELECT doc_id, lang, source, n_chars, text,
             CAST(len(list_distinct(string_split_regex(lower(text), '\s+'))) AS DOUBLE) /
             CAST(len(string_split_regex(lower(text), '\s+')) AS DOUBLE) AS ttr
           FROM documents
           WHERE n_chars >= 200),
         filtered AS (SELECT * FROM scored WHERE ttr >= 0.3),
         deduped AS (
           SELECT *, min(doc_id) OVER (PARTITION BY md5(text)) AS keeper
           FROM filtered)
         SELECT d.doc_id, d.lang, d.source, d.n_chars, d.ttr, e.label,
           CAST(len(e.embedding) AS BIGINT) AS emb_dim
         FROM deduped d JOIN embeddings e ON d.doc_id = e.vec_id
         WHERE d.doc_id = d.keeper
         ORDER BY d.doc_id""",
    "pipeline_cdc_apply" ->
      """WITH log AS (
           SELECT doc_id, lang, source, text, CAST(0 AS BIGINT) AS seq,
             'I' AS op FROM documents
           UNION ALL
           SELECT doc_id, lang, source, upper(text), 1, 'U'
           FROM documents WHERE doc_id % 10 = 3
           UNION ALL
           SELECT doc_id, lang, source, text, 1, 'D'
           FROM documents WHERE doc_id % 10 = 7
           UNION ALL
           SELECT doc_id + 1000000, lang, source, reverse(text), 1, 'I'
           FROM documents WHERE doc_id % 10 = 5
           UNION ALL
           SELECT doc_id, lang, source, text || ' v3', 2, 'U'
           FROM documents WHERE doc_id % 100 = 3),
         latest AS (
           SELECT *, row_number() OVER (PARTITION BY doc_id
             ORDER BY seq DESC) AS rn
           FROM log)
         SELECT doc_id, lang, source, md5(text) AS digest
         FROM latest WHERE rn = 1 AND op <> 'D'
         ORDER BY doc_id""")
}
