package graft.dedup

import graft.{Q, Tables}
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Large-scale training-data deduplication over `documents` (and
  * embedding near-dup over `embeddings`). North-star extension ops —
  * the reference has no dedup (SURVEY.md §2b); designs follow the
  * standard MinHash/SimHash literature (Broder 1997; Charikar 2002).
  *
  * Scale notes (the part that matters at 100 TB):
  *  - Nothing here is all-pairs over the corpus. Candidate generation
  *    is always *blocked* — exact-hash buckets, LSH band buckets, or
  *    SimHash band buckets — so the shuffle key is the bucket id and
  *    pair expansion happens only within buckets.
  *  - Exact dedup is a single hash-shuffle groupBy (map-side partial
  *    aggregation applies).
  *  - MinHash signatures are computed row-local with higher-order
  *    functions (one pass over shingles per permutation batch) — no
  *    UDFs, stays in codegen.
  */
object Dedup {

  /** Whitespace tokens of lowercased text. */
  private def tokens(c: Column): Column = split(lower(c), "\\s+")

  /** Distinct word 3-gram shingles. `sequence(1, n)` with n < 1 would
    * generate a *descending* sequence in Spark, so short docs need the
    * explicit empty guard.
    */
  private def shingles(toks: Column): Column =
    when(size(toks) >= 3,
      array_distinct(transform(
        sequence(lit(1), size(toks) - 2),
        i => concat_ws(" ",
          element_at(toks, i), element_at(toks, i + 1),
          element_at(toks, i + 2)))))
      .otherwise(array().cast("array<string>"))

  /** Exact token-set Jaccard between two pre-distinct arrays. Division
    * is done in doubles; both engines evaluate it identically, so no
    * rounding is needed for oracle parity.
    */
  private def jaccard(a: Column, b: Column): Column =
    size(array_intersect(a, b)).cast("double") /
      size(array_union(a, b)).cast("double")

  /** documents with tokens/shingles and a cheap blocking key: language
    * + length bucket. At 100 TB, blocking bounds candidate pairs to
    * within-block quadratic instead of corpus quadratic.
    */
  private def docsWithShingles(s: SparkSession, d: String): DataFrame = {
    val df = Tables.load(s, d, "documents")
    df.withColumn("toks", tokens(col("text")))
      .withColumn("sh", shingles(col("toks")))
      .withColumn("block", concat_ws("#", col("lang"),
        floor(col("n_chars") / 100).cast("long")))
  }

  // ------------------------------------------------------------ exact
  /** Exact dedup: hash-groupBy on content digest. One shuffle, partial
    * aggregation map-side; at scale, group on the digest (not the full
    * text) so shuffle rows stay small.
    */
  def exact(s: SparkSession, d: String): DataFrame =
    exactOver(Tables.load(s, d, "documents"))

  def exactOver(df: DataFrame): DataFrame = {
    df.groupBy(md5(col("text")).as("content_md5"))
      .agg(min(col("doc_id")).as("keeper_doc_id"),
        count(lit(1)).as("n_copies"))
      .orderBy(col("content_md5"))
  }

  // ------------------------------------------- n-gram Jaccard (blocked)
  /** Near-dup by word-3-gram Jaccard within (lang, length-bucket)
    * blocks: self-join on the block key (shuffle is on the block key;
    * pair expansion only within blocks), then exact Jaccard on distinct
    * shingle sets.
    */
  def ngramJaccard(s: SparkSession, d: String, threshold: Double = 0.05)
      : DataFrame = {
    val docs = docsWithShingles(s, d)
      .select(col("doc_id"), col("block"), col("sh"))
    val a = docs.select(col("doc_id").as("doc_a"), col("block"),
      col("sh").as("sh_a"))
    val b = docs.select(col("doc_id").as("doc_b"), col("block"),
      col("sh").as("sh_b"))
    a.join(b, Seq("block"))
      .filter(col("doc_a") < col("doc_b"))
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ---------------------------------------------------- MinHash + LSH
  /** 32 "permutations" realized as seed-prefixed xxhash64 — equivalent
    * independence for LSH purposes, and avoids 128-bit modular
    * arithmetic (which would overflow-throw under Spark 4's default
    * ANSI mode). Deterministic across processes, which the driver's
    * re-runs require.
    */
  private val NumPerms = 32
  private val BandRows = 4 // => 8 bands; s-curve threshold ~ (1/8)^(1/4) ≈ 0.59

  /** 32-perm MinHash signature, computed row-local with HOFs (stays in
    * codegen; no UDF). Empty shingle sets get a sentinel so they never
    * collide with real signatures.
    */
  private def signature(sh: Column): Column =
    array((0 until NumPerms).map { i =>
      when(size(sh) === 0, lit(Long.MaxValue)).otherwise(
        array_min(transform(sh, x => xxhash64(lit(i), x))))
    }: _*)

  /** MinHash LSH near-dup: signature → 8 bands of 4 → explode bands →
    * groupBy band bucket (the only shuffle is on the band-bucket key)
    * → candidate pairs within buckets → verify with exact Jaccard.
    * Rows-only driver check (the hash seeds aren't SQL-expressible);
    * correctness is asserted in MinHashSpec against planted dups.
    */
  def minhashLsh(s: SparkSession, d: String, threshold: Double = 0.5)
      : DataFrame = minhashLshOver(docsWithShingles(s, d), threshold)

  /** Same pipeline over any (doc_id, sh) frame — reused by the spec to
    * run on planted near-duplicates.
    */
  def minhashLshOver(docs: DataFrame, threshold: Double): DataFrame = {
    val withSig = docs.select(col("doc_id"), col("sh"))
      .withColumn("sig", signature(col("sh")))
    val banded = withSig.select(col("doc_id"), col("sh"),
      posexplode(transform(sequence(lit(0), lit(NumPerms / BandRows - 1)),
        b => xxhash64(
          (0 until BandRows).map(r =>
            element_at(col("sig"), b * lit(BandRows) + lit(r + 1))): _*)))
        .as(Seq("band", "band_hash")))
    val a = banded.select(col("band"), col("band_hash"),
      col("doc_id").as("doc_a"), col("sh").as("sh_a"))
    val b = banded.select(col("band"), col("band_hash"),
      col("doc_id").as("doc_b"), col("sh").as("sh_b"))
    a.join(b, Seq("band", "band_hash"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sh_a"), col("sh_b"))
      .distinct() // a pair can collide in several bands
      .withColumn("jaccard", jaccard(col("sh_a"), col("sh_b")))
      .filter(col("jaccard") >= threshold)
      .select(col("doc_a"), col("doc_b"), col("jaccard"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ----------------------------------------------------------- SimHash
  /** 64-bit SimHash over tokens (Charikar): per bit, sign of the sum of
    * ±1 votes from each token's xxhash64 bit. Row-local HOF compute;
    * near-dup candidates via 4×16-bit band blocking, verified with
    * bit_count(xor) Hamming distance. Rows-only driver check;
    * SimHashSpec asserts on planted dups.
    */
  def simhashBits(textCol: Column): Column = {
    val toks = tokens(textCol)
    transform(sequence(lit(0), lit(63)), k =>
      when(aggregate(toks, lit(0L), (acc, t) =>
        acc + when(call_function("shiftright", xxhash64(t), k)
          .bitwiseAND(1) === 1, 1L).otherwise(-1L)) > 0,
        lit(1L)).otherwise(lit(0L)))
  }

  def simhashValue(bits: Column): Column =
    aggregate(sequence(lit(0), lit(63)), lit(0L),
      (acc, k) => acc.bitwiseOR(
        call_function("shiftleft", element_at(bits, k + 1), k)))

  def simhash(s: SparkSession, d: String, maxHamming: Int = 3): DataFrame =
    simhashOver(Tables.load(s, d, "documents"), maxHamming)

  def simhashOver(docs: DataFrame, maxHamming: Int): DataFrame = {
    val withSim = docs
      .withColumn("simhash", simhashValue(simhashBits(col("text"))))
      .select(col("doc_id"), col("simhash"))
    // 4 bands of 16 bits: two docs within Hamming 3 must agree exactly
    // on at least one band (pigeonhole).
    val banded = withSim.select(col("doc_id"), col("simhash"),
      posexplode(transform(sequence(lit(0), lit(3)), b =>
        call_function("shiftright", col("simhash"), b * lit(16))
          .bitwiseAND(0xFFFFL))))
      .toDF("doc_id", "simhash", "band", "band_bits")
    val a = banded.select(col("band"), col("band_bits"),
      col("doc_id").as("doc_a"), col("simhash").as("sim_a"))
    val b = banded.select(col("band"), col("band_bits"),
      col("doc_id").as("doc_b"), col("simhash").as("sim_b"))
    a.join(b, Seq("band", "band_bits"))
      .filter(col("doc_a") < col("doc_b"))
      .select(col("doc_a"), col("doc_b"), col("sim_a"), col("sim_b"))
      .distinct()
      .withColumn("hamming",
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long"))
      .filter(col("hamming") <= maxHamming)
      .select(col("doc_a"), col("doc_b"), col("hamming"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  // ------------------------------------------- embedding cosine near-dup
  /** Cosine similarity between two float-array columns, computed in
    * doubles with a strict left fold — DuckDB's `list_reduce` replays
    * the same fold order, so oracle doubles are bit-identical.
    */
  def cosine(a: Column, b: Column): Column = {
    def dot(x: Column, y: Column): Column =
      aggregate(zip_with(x, y, (p, q) => p.cast("double") * q.cast("double")),
        lit(0.0), (acc, v) => acc + v)
    dot(a, b) / (sqrt(dot(a, a)) * sqrt(dot(b, b)))
  }

  /** Embedding near-dup: all pairs above a cosine threshold. Candidate
    * blocking at 100 TB comes from the LSH variant (graft.sim); this is
    * the exact verifier, bounded here by the small embeddings table.
    */
  def embeddingCosine(s: SparkSession, d: String, threshold: Double = 0.35)
      : DataFrame = {
    val e = Tables.load(s, d, "embeddings")
    val a = e.select(col("vec_id").as("v1"), col("embedding").as("emb_a"))
    val b = e.select(col("vec_id").as("v2"), col("embedding").as("emb_b"))
    a.crossJoin(b)
      .filter(col("v1") < col("v2"))
      .withColumn("cosine", cosine(col("emb_a"), col("emb_b")))
      .filter(col("cosine") >= threshold)
      .select(col("v1"), col("v2"), col("cosine"))
      .orderBy(col("v1"), col("v2"))
  }

  def queries: Map[String, Q] = Map(
    "dedup_exact" -> ((s, d) => exact(s, d)),
    "dedup_ngram_jaccard" -> ((s, d) => ngramJaccard(s, d)),
    "dedup_minhash_lsh" -> ((s, d) => minhashLsh(s, d)),
    "dedup_simhash" -> ((s, d) => simhash(s, d)),
    "dedup_embedding_cosine" -> ((s, d) => embeddingCosine(s, d)))

  /** DuckDB twins. minhash/simhash are seeded-hash pipelines — not
    * SQL-expressible — and get the rows-only check.
    */
  def oracles: Map[String, String] = Map(
    "dedup_exact" ->
      """SELECT md5(text) AS content_md5, min(doc_id) AS keeper_doc_id,
         count(*) AS n_copies
         FROM documents GROUP BY md5(text) ORDER BY content_md5""",
    "dedup_ngram_jaccard" ->
      """WITH docs AS (
           SELECT doc_id,
             lang || '#' || CAST(CAST(floor(n_chars / 100) AS BIGINT) AS VARCHAR) AS block,
             list_distinct(list_transform(
               range(1, greatest(len(string_split_regex(lower(text), '\s+')) - 2, 0) + 1),
               i -> string_split_regex(lower(text), '\s+')[i] || ' ' ||
                    string_split_regex(lower(text), '\s+')[i+1] || ' ' ||
                    string_split_regex(lower(text), '\s+')[i+2])) AS sh
           FROM documents)
         SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
           CAST(len(list_distinct(a.sh || b.sh)) AS DOUBLE) AS jaccard
         FROM docs a JOIN docs b ON a.block = b.block AND a.doc_id < b.doc_id
         WHERE CAST(len(list_intersect(a.sh, b.sh)) AS DOUBLE) /
               CAST(len(list_distinct(a.sh || b.sh)) AS DOUBLE) >= 0.05
         ORDER BY doc_a, doc_b""",
    "dedup_embedding_cosine" ->
      """WITH pairs AS (
           SELECT a.vec_id AS v1, b.vec_id AS v2, a.embedding AS ea,
                  b.embedding AS eb
           FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id),
         sims AS (
           SELECT v1, v2,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(range(1, len(ea) + 1),
                 i -> CAST(ea[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE))),
               (x, y) -> x + y) /
             (sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(range(1, len(ea) + 1),
                 i -> CAST(ea[i] AS DOUBLE) * CAST(ea[i] AS DOUBLE))),
               (x, y) -> x + y)) *
              sqrt(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list_transform(range(1, len(eb) + 1),
                 i -> CAST(eb[i] AS DOUBLE) * CAST(eb[i] AS DOUBLE))),
               (x, y) -> x + y))) AS cosine
           FROM pairs)
         SELECT v1, v2, cosine FROM sims WHERE cosine >= 0.35
         ORDER BY v1, v2""")
}
