package graft.dedup

import graft.SparkSpec
import org.apache.spark.sql.functions._

class DedupSpec extends SparkSpec {
  import spark.implicits._

  private val baseToks = (1 to 60).map(i => s"tok$i")
  private val base = baseToks.mkString(" ")
  // doc 1 = doc 0 with one token changed → 3 of 58 shingles differ,
  // shingle Jaccard ≈ 0.90 (comfortably above the LSH s-curve knee)
  private val nearDup = baseToks.updated(29, "zz").mkString(" ")
  private val unrelated1 = (1 to 60).map(i => s"u$i").mkString(" ")
  private val unrelated2 = (1 to 60).map(i => s"v$i").mkString(" ")

  private def docs = Seq(
    (0L, base, "en", "s0", base.length.toLong),
    (1L, nearDup, "en", "s0", nearDup.length.toLong),
    (2L, base, "en", "s0", base.length.toLong), // exact copy of 0
    (3L, unrelated1, "en", "s0", unrelated1.length.toLong),
    (4L, unrelated2, "en", "s0", unrelated2.length.toLong))
    .toDF("doc_id", "text", "lang", "source", "n_chars")

  test("exact dedup groups identical texts, keeps min doc_id") {
    val out = Dedup.exactOver(docs)
      .select("keeper_doc_id", "n_copies")
      .as[(Long, Long)].collect().toMap
    assert(out(0L) == 2L) // docs 0 and 2 collapsed, keeper is 0
    assert(out.values.sum == 5L)
  }

  test("minhash LSH finds planted near-dups and exact dups only") {
    val withShingles = docs
      .withColumn("toks", split(lower($"text"), "\\s+"))
      .withColumn("th", Dedup.tokenHashes($"toks"))
      .withColumn("shh", Dedup.hashedShingles($"th"))
    val pairs = Dedup.minhashLshOver(withShingles, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((0L, 2L))) // exact dup always collides
    assert(pairs.contains((0L, 1L)) || pairs.contains((1L, 2L)),
      s"near-dup pair not found: $pairs") // high-jaccard pair caught
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
    assert(!pairs.exists(p => p._1 == 4L || p._2 == 4L))
  }

  test("simhash: identical texts at hamming 0, near-dups close, unrelated apart") {
    val out = Dedup.simhashOver(docs, maxHamming = 12)
      .select("doc_a", "doc_b", "hamming")
      .as[(Long, Long, Long)].collect()
    val asMap = out.map(t => (t._1, t._2) -> t._3).toMap
    assert(asMap((0L, 2L)) == 0L) // exact copies
    assert(asMap.contains((0L, 1L)), s"near-dup not within hamming 12: $asMap")
    assert(!asMap.keySet.exists(p => p._1 >= 3L || p._2 >= 3L))
  }

  test("two-level simhash probes are exact within the pigeonhole radius") {
    val s0 = 0x0123456789ABCDEFL
    for (bits <- Seq(Seq(0), Seq(5, 17), Seq(63, 31, 2), Seq(1, 2, 3))) {
      val s1 = bits.foldLeft(s0)((a, b) => a ^ (1L << b))
      val df = Seq((0L, s0), (1L, s1)).toDF("doc_id", "simhash")
      assert(Dedup.simhashCandidates(df, maxHamming = 3).count() == 1L,
        s"pair at hamming ${bits.size} missed by two-level probes")
    }
  }

  test("simhash candidate growth: ~linear under two-level keys where " +
    "single-level grows quadratically") {
    // uniform random simhashes = unrelated docs: measures pure
    // collision noise of the banding key space as the corpus doubles
    val rnd = new scala.util.Random(11)
    def frame(n: Int) = (0 until n).map(i => (i.toLong, rnd.nextLong()))
      .toDF("doc_id", "simhash")
    val n = 4000
    val (f1, f2) = (frame(n), frame(2 * n))
    // single-level 16-bit buckets: noise ~ 4·n²/2/2^16 → ~4× on doubling
    val single1 = Dedup.simhashCandidates(f1, maxHamming = 12).count()
    val single2 = Dedup.simhashCandidates(f2, maxHamming = 12).count()
    assert(single1 > 100, s"expected measurable collision noise: $single1")
    assert(single2 > 3 * single1,
      s"single-level should grow ~quadratically: $single1 -> $single2")
    // two-level 28-bit keys: noise ~ 16·n²/2/2^28 — stays near zero at
    // a corpus size where single-level already generates thousands
    val two1 = Dedup.simhashCandidates(f1, maxHamming = 3).count()
    val two2 = Dedup.simhashCandidates(f2, maxHamming = 3).count()
    assert(two2 < single2 / 50,
      s"two-level noise should be orders below single-level: $two2 vs $single2")
    assert(two2 <= math.max(8 * math.max(two1, 1L), 16L),
      s"two-level growth should stay ~linear-ish: $two1 -> $two2")
  }

  test("ngram jaccard on planted pair is high, unrelated absent") {
    // run the same pipeline privately: block on lang+bucket like the query
    val a = docs.select($"doc_id".as("doc_a"),
      array_distinct(split(lower($"text"), "\\s+")).as("t_a"))
    val b = docs.select($"doc_id".as("doc_b"),
      array_distinct(split(lower($"text"), "\\s+")).as("t_b"))
    val j = a.crossJoin(b).filter($"doc_a" < $"doc_b")
      .select($"doc_a", $"doc_b",
        (size(array_intersect($"t_a", $"t_b")).cast("double") /
          size(array_union($"t_a", $"t_b")).cast("double")).as("jac"))
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(j((0L, 2L)) == 1.0)
    assert(j((0L, 1L)) > 0.8)
    assert(j((0L, 3L)) == 0.0)
  }

  test("ngram jaccard survives <3-token docs (empty shingles, ANSI 0/0)") {
    import org.apache.spark.sql.functions.{col, lit, lower, split => splitF, concat_ws}
    val shortDocs = Seq(
      (0L, "one two"), (1L, "a b"), // both shingle-less, same block
      (2L, base), (3L, nearDup))
      .toDF("doc_id", "text")
      .withColumn("block", lit("en#0"))
      .withColumn("toks", splitF(lower(col("text")), "\\s+"))
      .withColumn("th", Dedup.tokenHashes(col("toks")))
      .withColumn("shh", Dedup.hashedShingles(col("th")))
      .select("doc_id", "block", "shh")
    // would throw DIVIDE_BY_ZERO under ANSI without the empty filter
    val pairs = Dedup.ngramJaccardOver(shortDocs, threshold = 0.5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((2L, 3L))) // only the real near-dup pair
  }

  test("native ShingleHashes matches the declarative HOF chain bit-for-bit") {
    val texts = Seq(
      (0L, base), (1L, nearDup), (2L, "one two"), (3L, ""),
      (4L, "  leading and   multiple   spaces trailing  "),
      (5L, "a b c"), (6L, "x y x y x y x y")) // repeats → distinct path
      .toDF("doc_id", "text")
    val declarative = texts
      .withColumn("toks", split(lower($"text"), "\\s+"))
      .withColumn("shh", Dedup.hashedShingles(Dedup.tokenHashes($"toks")))
      .select($"doc_id", $"shh")
      .as[(Long, Seq[Long])].collect().toMap
    val native = texts.select($"doc_id",
      graft.functions.ShingleFunctions.shingle_hashes($"text").as("shh"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(native == declarative)
  }

  test("ShingleHashes parity holds on 500 randomized texts (fuzz)") {
    // unicode letters, exotic whitespace, punctuation, empties — the
    // native expression must replay lower()+split()+xxhash64 exactly
    val rnd = new scala.util.Random(99)
    val alphabets = Array(
      "abcdefghij", "ÄÖÜßÉÑ", "котик", "漢字かな", "0123!?#.,;",
      " \t\n\f\r", "emoji😀mix")
    def randText(): String = {
      val n = rnd.nextInt(120)
      (0 until n).map { _ =>
        val a = alphabets(rnd.nextInt(alphabets.length))
        a(rnd.nextInt(a.length))
      }.mkString
    }
    val texts = (0 until 500).map(i => (i.toLong, randText()))
      .toDF("doc_id", "text")
    val declarative = texts
      .withColumn("toks", split(lower($"text"), "\\s+"))
      .withColumn("shh", Dedup.hashedShingles(Dedup.tokenHashes($"toks")))
      .select($"doc_id", $"shh")
      .as[(Long, Seq[Long])].collect().toMap
    val native = texts.select($"doc_id",
      graft.functions.ShingleFunctions.shingle_hashes($"text").as("shh"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(native == declarative)
  }

  test("row-local MinHashSignature matches the MinHashAgg aggregate") {
    val withShingles = docs.withColumn("shh",
      graft.functions.ShingleFunctions.shingle_hashes($"text"))
      .filter(size($"shh") > 0)
    val viaAgg = withShingles
      .select($"doc_id", explode($"shh").as("h"))
      .groupBy($"doc_id")
      .agg(graft.functions.MinHashAgg.minhash_agg($"h", 32).as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    val viaScalar = withShingles.select($"doc_id",
      graft.functions.ShingleFunctions.minhash_signature($"shh", 32)
        .as("sig"))
      .as[(Long, Seq[Long])].collect().toMap
    assert(viaScalar == viaAgg)
  }

  test("minhash banding: candidates track planted clusters, not corpus size") {
    // synthetic signature frames: unrelated docs get random distinct
    // shingle sets (band collisions ~0 since keys are 64-bit hashes);
    // 5 planted dup-pairs keep a constant candidate floor. Doubling
    // the unrelated corpus must NOT grow candidates.
    val rnd = new scala.util.Random(23)
    def sigsOf(n: Int) = {
      val docs = (0 until n).map { i =>
        (i.toLong + 1000L, Array.fill(40)(rnd.nextLong()))
      } ++ (0 until 5).flatMap { p => // planted identical pairs, ids < 1000
        val sh = Array.fill(40)(scala.util.hashing.MurmurHash3
          .stringHash(s"dup$p").toLong)
        Seq((p.toLong * 2, sh), (p.toLong * 2 + 1, sh))
      }
      docs.toDF("doc_id", "shh")
        .select($"doc_id", graft.functions.ShingleFunctions
          .minhash_signature($"shh", 32).as("sig"))
    }
    val c1 = Dedup.minhashCandidates(sigsOf(2000)).count()
    val c2 = Dedup.minhashCandidates(sigsOf(4000)).count()
    assert(c1 >= 5, s"planted dup pairs must collide: $c1")
    assert(c2 <= c1 + 10,
      s"candidates must not grow with unrelated corpus: $c1 -> $c2")
  }

  test("connected components merges transitive near-dup chains") {
    // 1-2-5 is one cluster only transitively (no direct 1-5 pair);
    // 7-9 is a separate cluster — takes ≥2 propagation rounds
    val pairs = Seq((1L, 2L), (2L, 5L), (7L, 9L)).toDF("doc_a", "doc_b")
    val cc = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toSeq
    assert(cc == Seq((1L, 1L), (1L, 2L), (1L, 5L), (7L, 7L), (7L, 9L)))
  }

  test("local and distributed CC paths agree (incl. a long chain)") {
    // a 12-node path graph needs several propagation rounds — the
    // worst case for the two-rounds-per-sync loop — plus a separate
    // 2-cluster; localSolveMaxEdges = 0 forces the distributed loop
    val chain = (0 until 11).map(i => (i.toLong, i.toLong + 1))
    val pairs = (chain ++ Seq((100L, 101L))).toDF("doc_a", "doc_b")
    val local = Dedup.connectedComponents(pairs)
      .as[(Long, Long)].collect().toSeq
    val dist = Dedup.connectedComponents(pairs, localSolveMaxEdges = 0)
      .as[(Long, Long)].collect().toSeq
    assert(local == dist)
    assert(local == ((0 to 11).map(i => (0L, i.toLong)) ++
      Seq((100L, 100L), (100L, 101L))))
  }

  test("incremental minhash drops batch docs near-duplicating the corpus") {
    // corpus: ids 0-1; batch: ids 250-253 where 250 near-dups corpus
    // doc 0 (1 of 60 tokens changed) and 251 exactly copies corpus
    // doc 1; 252 is unrelated and must survive; 253 is a <3-token doc
    // (no shingles) with no corpus match — it must ALSO survive, not
    // silently vanish with the empty-shingle candidate filter
    val all = Seq(
      (0L, base), (1L, unrelated1),
      (250L, nearDup), (251L, unrelated1), (252L, unrelated2),
      (253L, "tiny doc"))
      .toDF("doc_id", "text")
      .withColumn("block", lit("en#0"))
      .withColumn("shh",
        graft.functions.ShingleFunctions.shingle_hashes(col("text")))
      .select("doc_id", "block", "shh")
    val survivors = Dedup.minhashIncrementalOver(all, pivot = 250L,
      threshold = 0.5)
      .as[Long].collect().toSeq
    assert(survivors == Seq(252L, 253L),
      s"expected the unrelated and the shingle-less batch docs to " +
        s"survive: $survivors")
  }

  test("incremental dedup drops new docs whose content exists in corpus") {
    import org.apache.spark.sql.functions.{col, md5}
    // corpus: ids 0-2; batch: ids 3-4 where doc 3 repeats doc 0's text
    val all = Seq(
      (0L, "alpha beta gamma"), (1L, "delta"), (2L, "epsilon"),
      (3L, "alpha beta gamma"), (4L, "zeta eta"))
      .toDF("doc_id", "text")
    val corpus = all.filter(col("doc_id") < 3)
      .select(md5(col("text")).as("digest")).distinct()
    val survivors = all.filter(col("doc_id") >= 3)
      .withColumn("digest", md5(col("text")))
      .join(corpus, Seq("digest"), "left_anti")
      .select("doc_id").as[Long].collect().toSeq
    assert(survivors == Seq(4L))
  }

  test("embedding LSH finds planted near-dups; candidates stay ~linear " +
    "as the corpus grows (plane count adapts)") {
    val rnd = new scala.util.Random(41)
    def gauss() = Array.fill(64)(rnd.nextGaussian().toFloat)
    def near(v: Array[Float]) = // tiny perturbation → cosine ≈ 0.999
      v.map(x => x + 0.02f * rnd.nextGaussian().toFloat)
    def corpus(n: Int) = {
      val planted = (0 until 5).flatMap { p =>
        val v = gauss()
        Seq((p.toLong * 2, v), (p.toLong * 2 + 1, near(v)))
      }
      val noise = (0 until n).map(i => (1000L + i, gauss()))
      (planted ++ noise).toDF("vec_id", "embedding")
    }
    val n = 2000
    val p1 = graft.sim.Similarity.planesFor(n, targetBucket = 4)
    val p2 = graft.sim.Similarity.planesFor(2 * n, targetBucket = 4)
    assert(p2 > p1, "plane count must grow with the corpus")
    val found = Dedup.embeddingLshOver(corpus(n), 0.9, 1, p1)
      .select("v1", "v2").as[(Long, Long)].collect().toSet
    val plantedPairs = (0 until 5).map(p => (p.toLong * 2, p.toLong * 2 + 1))
    assert(plantedPairs.count(found.contains) >= 4,
      s"planted near-dups missed: found only ${plantedPairs.filter(found.contains)}")
    // candidate growth: doubling the corpus adds a plane, so bucket
    // occupancy (and the candidate count per vector) stays flat —
    // candidate totals grow ~linearly, not quadratically
    val c1 = Dedup.embeddingLshCandidates(corpus(n), 1, p1).count()
    val c2 = Dedup.embeddingLshCandidates(corpus(2 * n), 1, p2).count()
    assert(c1 > 0)
    assert(c2 < 3L * c1,
      s"candidates must grow ~linearly with the corpus: $c1 -> $c2")
  }

  test("semantic dedup: planted near-dups co-cluster and are found; " +
    "deterministic across runs") {
    val rnd = new scala.util.Random(43)
    def gauss() = Array.fill(64)(rnd.nextGaussian().toFloat)
    def near(v: Array[Float]) = // cosine ≈ 0.999 — same semantic point
      v.map(x => x + 0.02f * rnd.nextGaussian().toFloat)
    val planted = (0 until 5).flatMap { p =>
      val v = gauss()
      Seq((p.toLong * 2, v), (p.toLong * 2 + 1, near(v)))
    }
    val noise = (0 until 500).map(i => (1000L + i, gauss()))
    val e = (planted ++ noise).toDF("vec_id", "embedding")
    def run() = Dedup.semanticDedupOver(e, k = 8, threshold = 0.9)
      .select($"v1", $"v2").as[(Long, Long)].collect().toSet
    val found = run()
    spark.catalog.clearCache()
    val plantedPairs = (0 until 5).map(p => (p.toLong * 2, p.toLong * 2 + 1))
    // a near-identical pair lands in the same k-means cell unless it
    // straddles a boundary (the SemDeDup miss mode) — ≥4/5 here
    assert(plantedPairs.count(found.contains) >= 4,
      s"planted semantic dups missed: ${plantedPairs.filter(found.contains)}")
    // random gaussians in d=64 are near-orthogonal: nothing else
    // clears cosine 0.9, so the planted pairs are ALL that's found
    assert(found.forall(p => plantedPairs.contains(p)),
      s"false positives above threshold: ${found -- plantedPairs}")
    // stride init + fixed tol → the whole pipeline is deterministic
    val again = run()
    spark.catalog.clearCache()
    assert(again == found, "semantic dedup must be run-deterministic")
  }

  test("sorted neighborhood: prefix-identical near-dups pair, " +
    "unrelated neighbors verify away") {
    // all five docs sort into one 5-wide window (24-char keys:
    // base/nearDup/copy share "tok1 tok2 ...", u*/v* differ), so every
    // pair is a candidate — verification must keep exactly the
    // planted near-dup triangle
    val pairs = Dedup.sortedNeighborhoodOver(docs, window = 5)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    spark.catalog.clearCache()
    assert(pairs == Set((0L, 1L), (0L, 2L), (1L, 2L)),
      s"expected the planted triangle only: $pairs")
  }

  test("sorted neighborhood: window bounds candidates — adjacent ranks " +
    "only at window 2") {
    // window=2 pairs each doc with its immediate successor only; the
    // sort key is the 24-char normalized prefix, so the exact copy
    // (doc 2) ranks adjacent to doc 0 (tie broken by doc_id: 0,1,2 all
    // share one key — ranks are doc_id order). Adjacent near-dup pairs
    // (0,1) and (1,2) survive; (0,2) is 2 apart and must NOT appear.
    val pairs = Dedup.sortedNeighborhoodOver(docs, window = 2)
      .select("doc_a", "doc_b").as[(Long, Long)].collect().toSet
    spark.catalog.clearCache()
    assert(pairs == Set((0L, 1L), (1L, 2L)),
      s"window 2 must pair adjacent ranks only: $pairs")
  }

  test("tfidf cosine: exact copy at 1.0, near-dup high, unrelated absent") {
    val out = Dedup.tfidfCosinePairsOver(docs)
      .select("doc_a", "doc_b", "cosine")
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    spark.catalog.clearCache()
    // identical 3-gram multisets => proportional weight vectors
    assert(out((0L, 2L)) == 1.0, s"exact copy must score 1.0: $out")
    assert(out((0L, 1L)) > 0.5, s"near-dup should score high: $out")
    // u*/v* docs share no 3-gram with anything => never candidates
    assert(!out.keySet.exists(p => p._1 >= 3L || p._2 >= 3L),
      s"unrelated docs must not pair: $out")
  }

  test("embedding cosine: identical vectors similarity 1.0") {
    val e = Seq(
      (0L, Array(1.0f, 2.0f, 3.0f)),
      (1L, Array(1.0f, 2.0f, 3.0f)),
      (2L, Array(-3.0f, 1.0f, 0.5f))).toDF("vec_id", "embedding")
    val sims = e.select($"vec_id", $"embedding")
      .crossJoin(e.select($"vec_id".as("v2"), $"embedding".as("e2")))
      .filter($"vec_id" < $"v2")
      .select($"vec_id", $"v2", Dedup.cosine($"embedding", $"e2").as("c"))
      .as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    assert(math.abs(sims((0L, 1L)) - 1.0) < 1e-12)
    assert(math.abs(sims((0L, 2L))) < 0.3)
  }

  test("lshEval counts are consistent and its ratios are true divisions") {
    val sf = "/root/testdata/sf0.01"
    val row = Dedup.lshEval(spark, sf).collect().head
    val (nT, nC, nH) = (row.getLong(0), row.getLong(1), row.getLong(2))
    val (prec, rec) = (row.getDouble(3), row.getDouble(4))
    assert(nT > 0 && nC > 0)
    assert(nH <= math.min(nT, nC))
    assert(math.abs(prec - nH.toDouble / nC) < 5e-5)
    assert(math.abs(rec - nH.toDouble / nT) < 5e-5)
    assert(prec >= 0.0 && prec <= 1.0 && rec >= 0.0 && rec <= 1.0)
    // the banded candidate set must surface most blocked true pairs
    // (8 bands of 4 at j>=0.5 sit above the s-curve threshold)
    assert(rec >= 0.8, s"LSH recall collapsed: $rec")
    spark.catalog.clearCache()
  }

  test("blocking report: baseline exact, strategies reduce, counts check") {
    val sf = "/root/testdata/sf0.001"
    val rows = Dedup.blockingReport(spark, sf)
      .as[(String, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows.size == 3)
    val n = graft.Tables.load(spark, sf, "documents").count()
    val (_, u0, m0, p0, r0) = rows("0_all_pairs")
    assert(u0 == 1 && m0 == n && p0 == n * (n - 1) / 2 &&
      math.abs(r0 - 1.0) < 1e-9)
    // both strategies reduce the pair count strictly
    Seq("1_lang_length_block", "2_rare_shingle").foreach { s0 =>
      val (_, units, maxU, pairs, red) = rows(s0)
      assert(units > 1 && maxU < n, s0)
      assert(pairs < p0 && red < 1.0 && red > 0.0, s0)
      assert(math.abs(red - pairs.toDouble / p0) < 1e-6, s0)
    }
    spark.catalog.clearCache()
  }

  test("entity resolution reconciles with fuzzy pairs + driver union-find") {
    val sf = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("dedup_entity_resolution")(
      spark, sf).as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val pairs = Dedup.fuzzyEditPairs(spark, sf)
      .selectExpr("doc_a", "doc_b").as[(Long, Long)].collect()
    // driver union-find
    val parent = scala.collection.mutable.Map.empty[Long, Long]
    def find(x: Long): Long = {
      val p = parent.getOrElseUpdate(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    pairs.foreach { case (a, b) => parent(find(a)) = find(b) }
    val comps = parent.keys.toSeq.groupBy(find)
    val want = comps.map { case (_, ms) =>
      (ms.min, ms.length.toLong, ms.max)
    }.toSeq.sortBy(_._1)
    assert(got.toSeq.sortBy(_._1) == want,
      "entity table diverges from union-find")
    assert(got.forall(_._2 >= 2), "singletons must not appear")
    spark.catalog.clearCache()
  }

  test("prefix filtering is lossless vs brute-force threshold Jaccard") {
    val sf = "/root/testdata/sf0.001"
    val got = Dedup.prefixFilterPairs(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => (r._1, r._2) -> (r._3, r._4)).toMap
    // brute force: distinct 3-gram shingle sets, ALL pairs, J >= 1/2
    val docs = graft.Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "text").as[(Long, String)].collect()
      .map { case (id, text) =>
        val t = text.toLowerCase.split("\\s+").filter(_.nonEmpty)
        id -> t.sliding(3).filter(_.length == 3)
          .map(_.mkString(" ")).toSet
      }.filter(_._2.nonEmpty)
    val want = (for {
      (a, sa) <- docs; (b, sb) <- docs if a < b
      inter = (sa intersect sb).size.toLong
      union = sa.size + sb.size - inter
      if inter * 2 >= union
    } yield (a, b) -> (inter, union)).toMap
    assert(got == want, "prefix-filter pair set diverges from brute force")
    assert(want.nonEmpty, "fixture has no qualifying pairs")
    spark.catalog.clearCache()
  }
}
