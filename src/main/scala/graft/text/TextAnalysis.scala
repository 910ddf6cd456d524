package graft.text

import graft.{Q, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for a training-data pipeline (north-star
  * extension, SURVEY.md §2b): token statistics, quality scoring,
  * stopword-vote language ID, BPE-ish token counting, and document
  * fingerprinting. Everything is row-local built-in expressions — no
  * shuffle except the final ORDER BY for oracle determinism, so the
  * operators scan-scale linearly at 100 TB.
  */
object TextAnalysis {

  private def toks(c: Column): Column = split(lower(c), "\\s+")

  /** Stopword lists for the vote-based language-ID heuristic. Tiny on
    * purpose: the heuristic is the operator; real deployments swap the
    * lists. Deterministic alphabetical-first tie-break.
    */
  val stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("de", "shi", "le", "he", "zai"))

  private def stopCount(t: Column, words: Seq[String]): Column =
    size(filter(t, x => x.isInCollection(words))).cast("long")

  /** English-ish stopword ratio used by the quality score. */
  private val qualityStops = Seq("the", "a", "of", "and", "is", "to", "in")

  // The "BPE-ish" token pattern: letter runs, digit runs, single
  // non-alphanumeric marks — the pre-tokenizer shape GPT-2-style BPEs
  // use before merges.
  private val BpePattern = "[a-z]+|[0-9]+|[^a-z0-9\\s]"

  /** text_heavy_hitters' SpaceSaving capacity. Exactness needs
    * capacity > per-language vocabulary (~31·10^decades in the
    * synthetic corpus — 4096 covers through sf10); the query enforces
    * this at run time. Overridable for bigger corpora / the squeeze
    * spec via the `graft.ss.capacity` system property.
    */
  def heavyHitterCapacity: Int =
    sys.props.get("graft.ss.capacity").map(_.toInt).getOrElse(4096)

  // PII patterns, restricted to the Java∩RE2 subset (no lookarounds,
  // no backrefs) so Spark and the DuckDB oracle compile the same
  // automaton. Exposed for PiiRedactSpec.
  val EmailRe = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val Ipv4Re = "\\b([0-9]{1,3}\\.){3}[0-9]{1,3}\\b"
  val PhoneRe = "\\b555-[0-9]{4}\\b"

  def queries: Map[String, Q] = Map(
    // Sentence-level readability rollup: sentences per doc and mean
    // sentence length per language — the Flesch-family signal's
    // integer core (tokens per sentence) without its float syllable
    // heuristic. Sentences are [.!?]+ splits with blank segments
    // dropped (trim-nonempty on both engines); a doc with no
    // terminal punctuation is one sentence, so every non-blank doc
    // counts ≥ 1 and the per-lang ratio is well-defined. Row-local
    // splits → one map-side-combined rollup; the only float is the
    // final ratio of two exact longs, round(4).
    "text_sentences" -> ((s, d) => {
      import s.implicits._
      Tables.spread(Tables.load(s, d, "documents"))
        .select($"lang",
          size(filter(split($"text", "[.!?]+"),
            x => length(trim(x)) > 0)).cast("long").as("n_sentences"),
          size(toks($"text")).cast("long").as("n_tokens"))
        .groupBy($"lang")
        .agg(count(lit(1)).as("n_docs"),
          sum($"n_sentences").as("n_sentences"),
          sum($"n_tokens").as("n_tokens"))
        .select($"lang", $"n_docs", $"n_sentences", $"n_tokens",
          round($"n_tokens".cast("double") /
            $"n_sentences".cast("double"), 4)
            .as("avg_sentence_tokens"))
        .orderBy($"lang")
    }),

    "text_stats" -> ((s, d) => {
      import s.implicits._
      Tables.spread(Tables.load(s, d, "documents"))
        .withColumn("t", toks($"text"))
        .select(
          $"doc_id", $"lang",
          size($"t").cast("long").as("n_tokens"),
          size(array_distinct($"t")).cast("long").as("n_distinct"),
          (size(array_distinct($"t")).cast("double") /
            size($"t").cast("double")).as("ttr"),
          (aggregate($"t", lit(0L), (acc, x) => acc + length(x))
            .cast("double") / size($"t").cast("double")).as("avg_token_len"))
        .orderBy($"doc_id")
    }),

    "text_quality" -> ((s, d) => {
      import s.implicits._
      val df = Tables.spread(Tables.load(s, d, "documents")).withColumn("t", toks($"text"))
      df.select(
        $"doc_id",
        length($"text").cast("long").as("n_chars_actual"),
        (stopCount($"t", qualityStops).cast("double") /
          size($"t").cast("double")).as("stopword_ratio"),
        (size(array_distinct($"t")).cast("double") /
          size($"t").cast("double")).as("distinct_ratio"),
        // crude composite quality: long enough, diverse, some glue words
        (when(length($"text") >= 100, lit(1.0)).otherwise(lit(0.0)) +
          size(array_distinct($"t")).cast("double") / size($"t").cast("double") +
          stopCount($"t", qualityStops).cast("double") / size($"t").cast("double"))
          .as("quality_score"))
        .orderBy($"doc_id")
    }),

    "text_langid" -> ((s, d) => {
      import s.implicits._
      val df = Tables.spread(Tables.load(s, d, "documents")).withColumn("t", toks($"text"))
      val scored = stopwords.foldLeft(df) { case (acc, (lang, words)) =>
        acc.withColumn(s"s_$lang", stopCount(col("t"), words))
      }
      val best = greatest(stopwords.map { case (l, _) => col(s"s_$l") }: _*)
      // alphabetical-first tie-break via ordered CASE chain
      val predicted = stopwords.foldRight(lit(null).cast("string"): Column) {
        case ((l, _), els) => when(col(s"s_$l") === best, lit(l)).otherwise(els)
      }
      // foldRight gives en-first priority? No: foldRight nests from the
      // right, so the leftmost (alphabetically first) lang is the
      // outermost WHEN — first match wins, as in the SQL oracle.
      scored.select($"doc_id", $"lang".as("labeled_lang"),
        predicted.as("predicted_lang"), best.as("best_score"))
        .orderBy($"doc_id")
    }),

    "text_tokens" -> ((s, d) => {
      import s.implicits._
      Tables.spread(Tables.load(s, d, "documents"))
        .select(
          $"doc_id",
          size(toks($"text")).cast("long").as("ws_tokens"),
          size(regexp_extract_all(lower($"text"), lit(BpePattern), lit(0)))
            .cast("long").as("bpe_tokens"),
          ceil(length($"text").cast("double") / 4.0).as("chars_div4_est"))
        .orderBy($"doc_id")
    }),

    // Gopher-style repetition signal: the fraction of a document's
    // word-3-grams that are repeats (1 - distinct/total). High ratios
    // flag boilerplate/spam for the quality filter; row-local and
    // scan-scaling like the other text ops. Token hashes materialize
    // as their own column — the gram lambda references them three
    // times and a collapsed projection would re-run the (interpreted)
    // token transform per reference.
    "text_repetition" -> ((s, d) => {
      import s.implicits._
      val total = greatest(size($"th") - 2, lit(0)).cast("long")
      Tables.spread(Tables.load(s, d, "documents"))
        .withColumn("th", graft.dedup.Dedup.tokenHashes(toks($"text")))
        .withColumn("shh", graft.dedup.Dedup.hashedShingles($"th"))
        .select($"doc_id", $"lang",
          total.as("n_grams"),
          size($"shh").cast("long").as("n_distinct_grams"),
          when(total > 0,
            lit(1.0) - size($"shh").cast("double") / total.cast("double"))
            .as("dup_gram_ratio"))
        .orderBy($"doc_id")
    }),

    // Heavy hitters via the SpaceSaving sketch aggregate (bounded
    // memory per group regardless of stream length — the 100 TB
    // shape; see SpaceSavingAgg). Exactness bound, stated as
    // arithmetic (r15 ADVICE): the synthetic vocab is ~31 tokens/lang
    // at base, ×10 per Sf1Probe decade, so capacity 4096 exceeds it
    // THROUGH sf10 (~3,100) but NOT at sf100 (~31,000) — within the
    // bound the sketch is provably EXACT and the oracle is a plain
    // GROUP BY count top-10; an sf100 gate would need a capacity bump
    // (m ≳ 31·10^decades) or an ε-aware oracle for this row. The
    // eviction and merge paths (the real-corpus regime, where
    // vocabulary always exceeds ANY fixed capacity) are pinned by
    // SpaceSavingSpec, and the r15 sf1 gate verified the ε-contract
    // numerically when the old capacity 256 fell below the renamed
    // sf1 vocab (PLANS.md: no under-estimates, over-estimates ≤ N/m
    // on every language).
    // The bound is also ENFORCED at run time (r16 verdict item #5): a
    // sketch that reaches capacity may have evicted, so exactness vs
    // the plain GROUP-BY oracle is no longer provable — the query
    // fails with the sizing rule instead of letting an sf100 gate
    // surface a spurious hash mismatch. The check reads max(size(hh))
    // off the persisted per-language frame: one cache-scan aggregate
    // over ~|langs| rows, no recompute of the token rollup.
    // The sketch array arrives sorted (est desc, item asc), so
    // top-10 is a slice, no window.
    "text_heavy_hitters" -> ((s, d) => {
      import s.implicits._
      val cap = heavyHitterCapacity
      val hh = Tables.spread(Tables.load(s, d, "documents"))
        .select($"lang", explode(toks($"text")).as("token"))
        .groupBy($"lang")
        .agg(graft.functions.SpaceSavingAgg.space_saving($"token", cap)
          .as("hh"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val maxTracked = hh
        .agg(coalesce(max(size($"hh")), lit(0))).head.getInt(0)
      require(maxTracked < cap,
        s"text_heavy_hitters: SpaceSaving sketch filled (tracked " +
          s"$maxTracked = capacity $cap) — a full sketch may have " +
          "evicted, so exactness vs the exact GROUP-BY oracle is not " +
          "provable. Size capacity above the per-language vocabulary " +
          "(synthetic corpus: ~31·10^decades tokens/lang, so e.g. " +
          "capacity ≥ 40960 at sf100 via -Dgraft.ss.capacity) or " +
          "pair the row with an ε-aware oracle.")
      hh
        .select($"lang", posexplode(slice($"hh", 1, 10)).as(Seq("p", "e")))
        .select($"lang", ($"p" + 1).cast("long").as("rank"),
          $"e.item".as("token"), $"e.est".as("n"))
        .orderBy($"lang", $"rank")
    }),

    // Unicode text normalization: NFC (native graft expression — see
    // NfcNormalize) + control-char strip + whitespace collapse, the
    // cleaning pass that must precede hashing/dedup/tokenization so
    // byte-different-but-visually-identical text converges. The ASCII
    // corpus is augmented with planted decomposed sequences (combining
    // accents, a control char, run-on spaces — the oracle plants the
    // same via chr(); Spark's chr is ASCII-only so this side embeds
    // the literals) and the normalized md5 + codepoint delta are
    // compared cross-engine. Row-local, scan-shaped.
    "text_normalize" -> ((s, d) => {
      import s.implicits._
      // "e"+U+0301 → é, "A"+U+030A → Å under NFC; U+0007 is control
      val aug = concat($"text",
        lit(" café  x  Å end"))
      val norm = graft.functions.NfcNormalize.nfc_normalize(aug)
      val clean = trim(regexp_replace(
        regexp_replace(norm, "[\\x00-\\x1f\\x7f]", ""), " {2,}", " "))
      Tables.spread(Tables.load(s, d, "documents"))
        .select(
          $"doc_id",
          md5(clean).as("norm_fp"),
          length(clean).cast("long").as("n_codepoints"),
          (length(aug) - length(norm)).cast("long").as("n_composed"))
        .orderBy($"doc_id")
    }),

    // Per-language vocabulary: token frequencies, top 20 per language
    // with a deterministic (count desc, token asc) tie-break — the
    // vocab-building pass of a tokenizer-training pipeline. Scale
    // shape: explode → groupBy(lang, token) rides map-side partial
    // aggregation (token cardinality ≪ token instances), and the
    // per-language top-k is a WindowGroupLimit partial top-k, never a
    // full sort of the vocabulary.
    "text_vocab" -> ((s, d) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"lang").orderBy($"n".desc, $"token")
      Tables.spread(Tables.load(s, d, "documents"))
        .select($"lang", explode(toks($"text")).as("token"))
        .groupBy($"lang", $"token")
        .agg(count(lit(1)).as("n"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter($"rank" <= 20)
        .select($"lang", $"rank", $"token", $"n")
        .orderBy($"lang", $"rank")
    }),

    // Zipf rank-frequency fit per language: OLS slope of ln(count) on
    // ln(rank) over the top-100 tokens — natural language sits near
    // slope ≈ −1, so a corpus that drifts far from it is template
    // spam, OCR noise, or synthetic filler (the "is this even
    // language" gate before tokenizer training). The four OLS sums
    // fold over the rank-SORTED 100-element array with an explicit
    // 0.0 seed (matching DuckDB's list_prepend+list_reduce term by
    // term), so the transcendental accumulation is engine-identical;
    // round(4) absorbs the ln ulp gap. Same top-k machinery as
    // text_vocab (WindowGroupLimit, never a vocabulary sort).
    "text_zipf_fit" -> ((s, d) => {
      import s.implicits._
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"lang").orderBy($"n".desc, $"token")
      def fold(term: String): String =
        s"aggregate(rc, CAST(0.0 AS DOUBLE), (a, p) -> a + $term)"
      Tables.spread(Tables.load(s, d, "documents"))
        .select($"lang", explode(toks($"text")).as("token"))
        .groupBy($"lang", $"token")
        .agg(count(lit(1)).as("n"))
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter($"rank" <= 100)
        .groupBy($"lang")
        .agg(sort_array(collect_list(struct($"rank", $"n"))).as("rc"))
        .withColumn("k", size($"rc").cast("double"))
        .withColumn("sx", expr(fold("ln(CAST(p.rank AS DOUBLE))")))
        .withColumn("sy", expr(fold("ln(CAST(p.n AS DOUBLE))")))
        .withColumn("sxy", expr(fold(
          "ln(CAST(p.rank AS DOUBLE)) * ln(CAST(p.n AS DOUBLE))")))
        .withColumn("sxx", expr(fold(
          "ln(CAST(p.rank AS DOUBLE)) * ln(CAST(p.rank AS DOUBLE))")))
        .withColumn("slope_raw",
          ($"k" * $"sxy" - $"sx" * $"sy") /
            ($"k" * $"sxx" - $"sx" * $"sx"))
        .select($"lang", size($"rc").cast("long").as("n_top"),
          Tables.nz(round($"slope_raw", 4)).as("slope"),
          Tables.nz(round(($"sy" - $"slope_raw" * $"sx") / $"k", 4))
            .as("intercept"))
        .orderBy($"lang")
    }),

    // Token burstiness (Church–Gale): variance-to-mean ratio of
    // per-document counts for the top-50 corpus tokens — VMR ≈ 1 is
    // Poisson scatter (function words), VMR ≫ 1 is bursty topical
    // concentration (content words). The signal separates "frequent
    // because everywhere" from "frequent because a few documents are
    // about it" — the stopword-vs-keyword cut frequency alone can't
    // make. Zero-count documents enter the moments implicitly
    // (Σx / Σx² over occurrences, n = corpus doc count), so nothing
    // materializes a dense doc×token grid; top-50 selection is a
    // vocab-bounded count + TakeOrdered; VMR = (n·Σx² − (Σx)²)/(n·Σx)
    // with doubles cast before the BIGINT-overflowing products (q43
    // discipline), round(4).
    "text_burstiness" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.spread(Tables.load(s, d, "documents"))
      val nDocs = docs.agg(count(lit(1)).as("n_docs"))
      val perDoc = docs
        .select($"doc_id", explode(toks($"text")).as("token"))
        .groupBy($"token", $"doc_id").agg(count(lit(1)).as("c"))
      val top = perDoc.groupBy($"token")
        .agg(sum($"c").as("total_cnt"), count(lit(1)).as("df"),
          sum($"c" * $"c").as("sxx"))
        .orderBy($"total_cnt".desc, $"token").limit(50)
      top.crossJoin(broadcast(nDocs))
        .select($"token", $"total_cnt", $"df",
          round(
            ($"n_docs".cast("double") * $"sxx".cast("double") -
             $"total_cnt".cast("double") * $"total_cnt".cast("double"))
            / ($"n_docs".cast("double") * $"total_cnt".cast("double")),
            4).as("vmr"))
        .orderBy($"total_cnt".desc, $"token")
    }),

    // Heaps'-law vocabulary growth: V(N) ≈ c·N^β over corpus ingest
    // order (doc_id as the arrival proxy) — natural language grows
    // vocabulary at β ≈ 0.4–0.6; β near 0 means a closed template
    // vocabulary, β near 1 means id-like noise. The "is the corpus
    // still teaching the tokenizer new words" read, zipf_fit's
    // growth-side twin. Ten corpus-order checkpoints (integer bucket
    // arithmetic off a one-row bounds aggregate); per-bucket token
    // mass and first-seen vocabulary reduce map-side; cumulatives
    // ride a 10-ROW window (q105 stance); the OLS folds run over the
    // bucket-sorted array (zipf's transcendental discipline).
    "text_heaps_fit" -> ((s, d) => {
      import s.implicits._
      def fold(term: String): String =
        s"aggregate(arr, CAST(0.0 AS DOUBLE), (a, p) -> a + $term)"
      val bounds = Tables.load(s, d, "documents")
        .agg(min($"doc_id").as("lo"), max($"doc_id").as("hi"))
      val tok = Tables.spread(Tables.load(s, d, "documents"))
        .crossJoin(broadcast(bounds))
        .select(expr("""CAST(((doc_id - lo + 1) * 10
            + (hi - lo + 1) - 1) div (hi - lo + 1) AS BIGINT)""")
          .as("b"), explode(toks($"text")).as("token"))
        // feeds the token-mass AND first-seen branches
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val perB = tok.groupBy($"b").agg(count(lit(1)).as("nt"))
      val fdB = tok.groupBy($"token").agg(min($"b").as("b"))
        .groupBy($"b").agg(count(lit(1)).as("nv"))
      val w10 = org.apache.spark.sql.expressions.Window.orderBy($"b")
        .rowsBetween(org.apache.spark.sql.expressions.Window
          .unboundedPreceding, 0)
      val curve = perB.join(fdB, Seq("b"), "full_outer")
        .select($"b", coalesce($"nt", lit(0L)).as("nt"),
          coalesce($"nv", lit(0L)).as("nv"))
        // 10 rows — the global window is constant-sized
        .withColumn("tokens_cum", sum($"nt").over(w10))
        .withColumn("vocab_cum", sum($"nv").over(w10))
      curve
        .agg(sort_array(collect_list(struct($"b", $"tokens_cum",
          $"vocab_cum"))).as("arr"))
        .withColumn("k", size($"arr").cast("double"))
        .withColumn("sx", expr(fold("ln(CAST(p.tokens_cum AS DOUBLE))")))
        .withColumn("sy", expr(fold("ln(CAST(p.vocab_cum AS DOUBLE))")))
        .withColumn("sxy", expr(fold(
          "ln(CAST(p.tokens_cum AS DOUBLE)) * " +
            "ln(CAST(p.vocab_cum AS DOUBLE))")))
        .withColumn("sxx", expr(fold(
          "ln(CAST(p.tokens_cum AS DOUBLE)) * " +
            "ln(CAST(p.tokens_cum AS DOUBLE))")))
        .withColumn("beta",
          ($"k" * $"sxy" - $"sx" * $"sy") /
            ($"k" * $"sxx" - $"sx" * $"sx"))
        .select(explode($"arr").as("r"),
          round($"beta", 4).as("heaps_beta"))
        .select($"r.b".as("bucket"),
          $"r.tokens_cum".as("tokens_cum"),
          $"r.vocab_cum".as("vocab_cum"), $"heaps_beta")
        .orderBy($"bucket")
    }),

    // PII redaction (email / IPv4 / phone → typed placeholders) — the
    // scrubbing pass a training pipeline runs before anything else.
    // The synthetic corpus contains no PII, so the query PLANTS a
    // deterministic per-row contact line (pure function of doc_id,
    // built identically in the oracle) and then proves the redaction
    // itself is cross-engine exact: match counts per category plus an
    // md5 over the redacted text. Patterns stay in the Java∩RE2 regex
    // subset so both engines compile them identically; redaction is
    // row-local regexp_replace — scan-shaped at 100 TB.
    "text_pii_redact" -> ((s, d) => {
      import s.implicits._
      val aug = concat($"text",
        lit(" Contact user"), $"doc_id".cast("string"),
        lit("@example.com from 10.0."),
        pmod($"doc_id", lit(200)).cast("string"),
        lit(".7 tel 555-"),
        lpad(pmod($"doc_id", lit(10000)).cast("string"), 4, "0"), lit("."))
      // email first: its local/domain parts contain dots and digits
      // that would otherwise feed the IP pattern
      val r1 = regexp_replace(aug, EmailRe, "<EMAIL>")
      val r2 = regexp_replace(r1, Ipv4Re, "<IP>")
      val r3 = regexp_replace(r2, PhoneRe, "<PHONE>")
      Tables.spread(Tables.load(s, d, "documents"))
        .select(
          $"doc_id",
          size(regexp_extract_all(aug, lit(EmailRe), lit(0)))
            .cast("long").as("n_emails"),
          size(regexp_extract_all(aug, lit(Ipv4Re), lit(0)))
            .cast("long").as("n_ips"),
          size(regexp_extract_all(aug, lit(PhoneRe), lit(0)))
            .cast("long").as("n_phones"),
          md5(r3).as("redacted_fp"))
        .orderBy($"doc_id")
    }),

    // Mean corpus-frequency of a document's tokens — the unigram-LM
    // quality signal (KenLM-style perplexity filters rank docs by how
    // "expected" their tokens are) in a cross-engine-EXACT form: mean
    // token count instead of mean negative-log-probability, which
    // induces the same ordering monotonically for a unigram model but
    // has no float log for engines to disagree on (the text_keywords
    // discipline). Scale shape: token counts are vocab-sized
    // (broadcastable); the doc-side join is row-shaped after an
    // explode with map-side-combined (doc, token) partials; one exact
    // integer division at the end.
    "text_rarity" -> ((s, d) => {
      import s.implicits._
      val toksDf = Tables.spread(Tables.load(s, d, "documents"))
        .select($"doc_id", explode(toks($"text")).as("token"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val vocab = toksDf.groupBy($"token").agg(count(lit(1)).as("cnt"))
      toksDf.join(vocab, Seq("token"))
        .groupBy($"doc_id")
        .agg(count(lit(1)).as("n_tokens"), sum($"cnt").as("sum_cnt"))
        .select($"doc_id", $"n_tokens", $"sum_cnt",
          ($"sum_cnt".cast("double") / $"n_tokens".cast("double"))
            .as("mean_token_freq"))
        .orderBy($"doc_id")
    }),

    "text_fingerprint" -> ((s, d) => {
      import s.implicits._
      // Three fingerprint flavors: md5 over the sorted distinct token
      // set (order-free, clustering-level), exact md5, and the
      // order-sensitive polynomial rolling hash (native codegen
      // expression graft.functions.RollingHash).
      Tables.spread(Tables.load(s, d, "documents"))
        .select(
          $"doc_id",
          md5(array_join(array_sort(array_distinct(toks($"text"))), " "))
            .as("bow_fingerprint"),
          md5($"text").as("exact_fingerprint"),
          graft.functions.RollingHash.rolling_hash($"text")
            .as("rolling_fp"))
        .orderBy($"doc_id")
    }),

    // Per-document distinctive terms — the TF-IDF keyword pass in its
    // cross-engine-exact form: rank by (tf DESC, df ASC, token) —
    // "frequent here, rare elsewhere" — which is the same ordering a
    // tf·log(N/df) score induces for fixed tf, but with no float
    // logarithm for engines to disagree on at a rank boundary. Scale
    // shape: explode → map-side-combined (doc, token) counts; df is a
    // vocabulary-sized reaggregation of tf (never a second corpus
    // scan — tf is persisted for its two consumers); per-doc top-5 is
    // a WindowGroupLimit partial top-k. The tf⋈df join shuffles on
    // token; at corpus scale df is vocab-sized and broadcastable.
    "text_keywords" -> ((s, d) => {
      import s.implicits._
      val tf = Tables.spread(Tables.load(s, d, "documents"))
        .select($"doc_id", explode(toks($"text")).as("token"))
        .groupBy($"doc_id", $"token")
        .agg(count(lit(1)).as("tf"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val df = tf.groupBy($"token").agg(count(lit(1)).as("df"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"doc_id").orderBy($"tf".desc, $"df".asc, $"token")
      tf.join(df, "token")
        .withColumn("rank", row_number().over(w).cast("long"))
        .filter($"rank" <= 5)
        .select($"doc_id", $"rank", $"token", $"tf", $"df")
        .orderBy($"doc_id", $"rank")
    }),

    // Inverted index: token → document frequency + the first 20
    // postings, the retrieval-side structure a decontamination or
    // search pass reads. The posting list is CAPPED BEFORE collection
    // (row_number ≤ 20 under the token-partitioned window, a
    // WindowGroupLimit partial on each map side), so per-token state
    // is bounded even for stopwords that appear in every document of
    // a 100 TB corpus; df is computed from the uncapped pair set by a
    // map-side-combinable count, not by collecting it. Posting lists
    // are numerically sorted, then stringified for a representation
    // both engines hash identically.
    "text_inverted_index" -> ((s, d) => {
      import s.implicits._
      val pairs = Tables.spread(Tables.load(s, d, "documents"))
        .select($"doc_id", explode(toks($"text")).as("token"))
        .distinct()
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      val dfreq = pairs.groupBy($"token").agg(count(lit(1)).as("df"))
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy($"token").orderBy($"doc_id")
      val post = pairs
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= 20)
        .groupBy($"token")
        .agg(array_join(
          transform(array_sort(collect_list($"doc_id")),
            _.cast("string")), ",").as("postings"))
      dfreq.join(post, "token")
        .filter($"df" >= 10)
        .select($"token", $"df", $"postings")
        .orderBy($"token")
    }))

  def oracles: Map[String, String] = Map(
    "text_sentences" ->
      """WITH t AS (
           SELECT lang,
             CAST(len(list_filter(
               string_split_regex(text, '[.!?]+'),
               x -> length(trim(x)) > 0)) AS BIGINT) AS n_sentences,
             CAST(len(string_split_regex(lower(text), '\s+'))
               AS BIGINT) AS n_tokens
           FROM documents)
         SELECT lang, CAST(count(*) AS BIGINT) AS n_docs,
           CAST(sum(n_sentences) AS BIGINT) AS n_sentences,
           CAST(sum(n_tokens) AS BIGINT) AS n_tokens,
           round(CAST(sum(n_tokens) AS DOUBLE) /
             CAST(sum(n_sentences) AS DOUBLE), 4)
             AS avg_sentence_tokens
         FROM t GROUP BY lang ORDER BY lang""",
    "text_stats" ->
      """WITH t AS (SELECT doc_id, lang,
           string_split_regex(lower(text), '\s+') AS tk FROM documents)
         SELECT doc_id, lang,
           CAST(len(tk) AS BIGINT) AS n_tokens,
           CAST(len(list_distinct(tk)) AS BIGINT) AS n_distinct,
           CAST(len(list_distinct(tk)) AS DOUBLE) / CAST(len(tk) AS DOUBLE) AS ttr,
           CAST(list_sum(list_transform(tk, x -> length(x))) AS DOUBLE) /
             CAST(len(tk) AS DOUBLE) AS avg_token_len
         FROM t ORDER BY doc_id""",
    "text_quality" ->
      """WITH t AS (SELECT doc_id, text,
           string_split_regex(lower(text), '\s+') AS tk FROM documents)
         SELECT doc_id,
           CAST(length(text) AS BIGINT) AS n_chars_actual,
           CAST(len(list_filter(tk, x -> x IN ('the','a','of','and','is','to','in'))) AS DOUBLE) /
             CAST(len(tk) AS DOUBLE) AS stopword_ratio,
           CAST(len(list_distinct(tk)) AS DOUBLE) / CAST(len(tk) AS DOUBLE) AS distinct_ratio,
           (CASE WHEN length(text) >= 100 THEN 1.0 ELSE 0.0 END +
            CAST(len(list_distinct(tk)) AS DOUBLE) / CAST(len(tk) AS DOUBLE) +
            CAST(len(list_filter(tk, x -> x IN ('the','a','of','and','is','to','in'))) AS DOUBLE) /
              CAST(len(tk) AS DOUBLE)) AS quality_score
         FROM t ORDER BY doc_id""",
    "text_langid" ->
      """WITH t AS (SELECT doc_id, lang,
           string_split_regex(lower(text), '\s+') AS tk FROM documents),
         s AS (SELECT doc_id, lang,
           CAST(len(list_filter(tk, x -> x IN ('der','die','das','und','ist'))) AS BIGINT) AS s_de,
           CAST(len(list_filter(tk, x -> x IN ('the','a','of','and','is'))) AS BIGINT) AS s_en,
           CAST(len(list_filter(tk, x -> x IN ('el','la','de','y','es'))) AS BIGINT) AS s_es,
           CAST(len(list_filter(tk, x -> x IN ('le','la','les','et','est'))) AS BIGINT) AS s_fr,
           CAST(len(list_filter(tk, x -> x IN ('de','shi','le','he','zai'))) AS BIGINT) AS s_zh
           FROM t)
         SELECT doc_id, lang AS labeled_lang,
           CASE WHEN s_de = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'de'
                WHEN s_en = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'en'
                WHEN s_es = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'es'
                WHEN s_fr = greatest(s_de, s_en, s_es, s_fr, s_zh) THEN 'fr'
                ELSE 'zh' END AS predicted_lang,
           greatest(s_de, s_en, s_es, s_fr, s_zh) AS best_score
         FROM s ORDER BY doc_id""",
    "text_tokens" ->
      """SELECT doc_id,
           CAST(len(string_split_regex(lower(text), '\s+')) AS BIGINT) AS ws_tokens,
           CAST(len(regexp_extract_all(lower(text), '[a-z]+|[0-9]+|[^a-z0-9\s]')) AS BIGINT) AS bpe_tokens,
           CAST(ceil(CAST(length(text) AS DOUBLE) / 4.0) AS BIGINT) AS chars_div4_est
         FROM documents ORDER BY doc_id""",
    "text_repetition" ->
      """WITH g AS (
           SELECT doc_id, lang,
             CAST(greatest(len(t) - 2, 0) AS BIGINT) AS n_grams,
             CAST(len(list_distinct(list_transform(
               range(1, greatest(len(t) - 2, 0) + 1),
               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])))
               AS BIGINT) AS n_distinct_grams
           FROM (SELECT doc_id, lang,
                   string_split_regex(lower(text), '\s+') AS t
                 FROM documents))
         SELECT doc_id, lang, n_grams, n_distinct_grams,
           CASE WHEN n_grams > 0 THEN
             1.0 - CAST(n_distinct_grams AS DOUBLE) /
                   CAST(n_grams AS DOUBLE) END AS dup_gram_ratio
         FROM g ORDER BY doc_id""",
    "text_heavy_hitters" ->
      """WITH t AS (
           SELECT lang, unnest(string_split_regex(lower(text), '\s+')) AS token
           FROM documents),
         f AS (SELECT lang, token, count(*) AS n FROM t GROUP BY 1, 2),
         r AS (
           SELECT lang, token, n,
             CAST(row_number() OVER (PARTITION BY lang
               ORDER BY n DESC, token) AS BIGINT) AS rank
           FROM f)
         SELECT lang, rank, token, n FROM r
         WHERE rank <= 10 ORDER BY lang, rank""",
    "text_normalize" ->
      """WITH aug AS (
           SELECT doc_id,
             text || ' cafe' || chr(769) || '  x' || chr(7) ||
               '  A' || chr(778) || ' end' AS a
           FROM documents),
         n AS (SELECT doc_id, a, nfc_normalize(a) AS nm FROM aug),
         c AS (SELECT doc_id, a, nm,
             trim(regexp_replace(regexp_replace(nm,
               '[\x00-\x1f\x7f]', '', 'g'), ' {2,}', ' ', 'g')) AS cl
           FROM n)
         SELECT doc_id, md5(cl) AS norm_fp,
           CAST(length(cl) AS BIGINT) AS n_codepoints,
           CAST(length(a) - length(nm) AS BIGINT) AS n_composed
         FROM c ORDER BY doc_id""",
    "text_vocab" ->
      """WITH t AS (
           SELECT lang, unnest(string_split_regex(lower(text), '\s+')) AS token
           FROM documents),
         f AS (
           SELECT lang, token, count(*) AS n FROM t GROUP BY 1, 2),
         r AS (
           SELECT lang, token, n,
             CAST(row_number() OVER (PARTITION BY lang
               ORDER BY n DESC, token) AS BIGINT) AS rank
           FROM f)
         SELECT lang, rank, token, n FROM r
         WHERE rank <= 20 ORDER BY lang, rank""",
    "text_burstiness" ->
      """WITH perdoc AS (
           SELECT token, doc_id, CAST(count(*) AS BIGINT) AS c FROM (
             SELECT doc_id,
               unnest(string_split_regex(lower(text), '\s+')) AS token
             FROM documents)
           GROUP BY 1, 2),
         nd AS (SELECT CAST(count(*) AS BIGINT) AS n_docs
                FROM documents),
         top AS (
           SELECT token, CAST(sum(c) AS BIGINT) AS total_cnt,
             CAST(count(*) AS BIGINT) AS df,
             CAST(sum(c * c) AS BIGINT) AS sxx
           FROM perdoc GROUP BY 1
           ORDER BY total_cnt DESC, token LIMIT 50)
         SELECT token, total_cnt, df,
           round(
             (CAST(n_docs AS DOUBLE) * CAST(sxx AS DOUBLE) -
              CAST(total_cnt AS DOUBLE) * CAST(total_cnt AS DOUBLE))
             / (CAST(n_docs AS DOUBLE) * CAST(total_cnt AS DOUBLE)),
             4) AS vmr
         FROM top, nd ORDER BY total_cnt DESC, token""",

    "text_heaps_fit" ->
      """WITH bounds AS (
           SELECT min(doc_id) AS lo, max(doc_id) AS hi
           FROM documents),
         tok AS (
           SELECT CAST(((doc_id - lo + 1) * 10 + (hi - lo + 1) - 1)
               // (hi - lo + 1) AS BIGINT) AS b,
             unnest(string_split_regex(lower(text), '\s+')) AS token
           FROM documents, bounds),
         perb AS (
           SELECT b, CAST(count(*) AS BIGINT) AS nt
           FROM tok GROUP BY 1),
         fdb AS (
           SELECT b, CAST(count(*) AS BIGINT) AS nv FROM (
             SELECT token, min(b) AS b FROM tok GROUP BY 1)
           GROUP BY 1),
         curve AS (
           SELECT coalesce(p.b, f.b) AS b,
             CAST(sum(coalesce(p.nt, 0))
               OVER (ORDER BY coalesce(p.b, f.b)) AS BIGINT)
               AS tokens_cum,
             CAST(sum(coalesce(f.nv, 0))
               OVER (ORDER BY coalesce(p.b, f.b)) AS BIGINT)
               AS vocab_cum
           FROM perb p FULL OUTER JOIN fdb f ON f.b = p.b),
         one AS (
           SELECT list({'b': b, 'tokens_cum': tokens_cum,
             'vocab_cum': vocab_cum} ORDER BY b) AS arr
           FROM curve),
         fitted AS (
           SELECT arr, CAST(len(arr) AS DOUBLE) AS k,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(arr, p ->
                 ln(CAST(p.tokens_cum AS DOUBLE)))),
               (a, b) -> a + b) AS sx,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(arr, p ->
                 ln(CAST(p.vocab_cum AS DOUBLE)))),
               (a, b) -> a + b) AS sy,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(arr, p ->
                 ln(CAST(p.tokens_cum AS DOUBLE)) *
                 ln(CAST(p.vocab_cum AS DOUBLE)))),
               (a, b) -> a + b) AS sxy,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(arr, p ->
                 ln(CAST(p.tokens_cum AS DOUBLE)) *
                 ln(CAST(p.tokens_cum AS DOUBLE)))),
               (a, b) -> a + b) AS sxx
           FROM one)
         SELECT r.b AS bucket, r.tokens_cum AS tokens_cum,
           r.vocab_cum AS vocab_cum,
           round((k * sxy - sx * sy) / (k * sxx - sx * sx), 4)
             AS heaps_beta
         FROM fitted, unnest(arr) AS u(r)
         ORDER BY bucket""",

    "text_zipf_fit" ->
      """WITH t AS (
           SELECT lang, unnest(string_split_regex(lower(text), '\s+'))
             AS token
           FROM documents),
         f AS (SELECT lang, token, count(*) AS n FROM t GROUP BY 1, 2),
         r AS (
           SELECT lang, n,
             CAST(row_number() OVER (PARTITION BY lang
               ORDER BY n DESC, token) AS BIGINT) AS rank
           FROM f),
         g AS (
           SELECT lang, list_sort(list({'rank': rank, 'n': n})) AS rc
           FROM r WHERE rank <= 100 GROUP BY 1),
         s AS (
           SELECT lang, CAST(len(rc) AS DOUBLE) AS k,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(rc, p -> ln(CAST(p.rank AS DOUBLE)))),
               (x, y) -> x + y) AS sx,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(rc, p -> ln(CAST(p.n AS DOUBLE)))),
               (x, y) -> x + y) AS sy,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(rc, p -> ln(CAST(p.rank AS DOUBLE)) *
                 ln(CAST(p.n AS DOUBLE)))),
               (x, y) -> x + y) AS sxy,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(rc, p -> ln(CAST(p.rank AS DOUBLE)) *
                 ln(CAST(p.rank AS DOUBLE)))),
               (x, y) -> x + y) AS sxx,
             CAST(len(rc) AS BIGINT) AS n_top
           FROM g)
         SELECT lang, n_top,
           round((k * sxy - sx * sy) / (k * sxx - sx * sx), 4) + 0.0
             AS slope,
           round((sy - ((k * sxy - sx * sy) / (k * sxx - sx * sx))
             * sx) / k, 4) + 0.0 AS intercept
         FROM s ORDER BY lang""",
    "text_pii_redact" ->
      """WITH aug AS (
           SELECT doc_id,
             text || ' Contact user' || CAST(doc_id AS VARCHAR) ||
               '@example.com from 10.0.' || CAST(doc_id % 200 AS VARCHAR) ||
               '.7 tel 555-' ||
               lpad(CAST(doc_id % 10000 AS VARCHAR), 4, '0') || '.' AS a
           FROM documents)
         SELECT doc_id,
           CAST(len(regexp_extract_all(a,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}')) AS BIGINT)
             AS n_emails,
           CAST(len(regexp_extract_all(a,
             '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b')) AS BIGINT) AS n_ips,
           CAST(len(regexp_extract_all(a,
             '\b555-[0-9]{4}\b')) AS BIGINT) AS n_phones,
           md5(regexp_replace(regexp_replace(regexp_replace(a,
             '[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}', '<EMAIL>', 'g'),
             '\b([0-9]{1,3}\.){3}[0-9]{1,3}\b', '<IP>', 'g'),
             '\b555-[0-9]{4}\b', '<PHONE>', 'g')) AS redacted_fp
         FROM aug ORDER BY doc_id""",
    "text_rarity" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split_regex(lower(text), '\s+'))
             AS token FROM documents),
         vocab AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1)
         SELECT t.doc_id,
           CAST(count(*) AS BIGINT) AS n_tokens,
           CAST(sum(v.cnt) AS BIGINT) AS sum_cnt,
           CAST(sum(v.cnt) AS DOUBLE) / CAST(count(*) AS DOUBLE)
             AS mean_token_freq
         FROM tok t JOIN vocab v USING (token)
         GROUP BY t.doc_id ORDER BY t.doc_id""",
    "text_fingerprint" ->
      """SELECT doc_id,
           md5(array_to_string(list_sort(list_distinct(
             string_split_regex(lower(text), '\s+'))), ' ')) AS bow_fingerprint,
           md5(text) AS exact_fingerprint,
           list_reduce(
             list_prepend(CAST(0 AS BIGINT),
               list_transform(range(1, length(text) + 1),
                 i -> CAST(ascii(text[i]) AS BIGINT))),
             (h, b) -> (h * 31 + b) % 1000000007) AS rolling_fp
         FROM documents ORDER BY doc_id""",
    "text_keywords" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split_regex(lower(text), '\s+'))
             AS token FROM documents),
         tf AS (SELECT doc_id, token, count(*) AS tf
                FROM tok GROUP BY 1, 2),
         df AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
         r AS (
           SELECT tf.doc_id, tf.token, tf.tf, df.df,
             CAST(row_number() OVER (PARTITION BY tf.doc_id
               ORDER BY tf.tf DESC, df.df ASC, tf.token) AS BIGINT)
               AS rank
           FROM tf JOIN df ON tf.token = df.token)
         SELECT doc_id, rank, token, tf, df FROM r
         WHERE rank <= 5 ORDER BY doc_id, rank""",
    "text_inverted_index" ->
      """WITH tok AS (
           SELECT doc_id, unnest(string_split_regex(lower(text), '\s+'))
             AS token FROM documents),
         pairs AS (SELECT DISTINCT doc_id, token FROM tok),
         df AS (SELECT token, count(*) AS df FROM pairs GROUP BY 1),
         ranked AS (
           SELECT token, doc_id,
             row_number() OVER (PARTITION BY token ORDER BY doc_id)
               AS rn
           FROM pairs),
         post AS (
           SELECT token,
             array_to_string(list(doc_id ORDER BY doc_id), ',')
               AS postings
           FROM ranked WHERE rn <= 20 GROUP BY token)
         SELECT df.token, df.df, post.postings
         FROM df JOIN post ON df.token = post.token
         WHERE df.df >= 10 ORDER BY df.token""")
}
