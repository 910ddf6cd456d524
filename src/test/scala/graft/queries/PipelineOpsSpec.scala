package graft.queries

import graft.SparkSpec
import graft.text.TextAnalysis
import org.apache.spark.sql.functions._

/** Behavioral guards for the round-6 pipeline operators. The driver's
  * DuckDB gate proves cross-engine equality; these specs pin the
  * SEMANTICS — redaction actually removes the PII shapes, sampling is
  * deterministic and rate-correct, the quality gate keeps at least
  * half of every language, the shuffle is a permutation with balanced
  * shards.
  */
class PipelineOpsSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("sentence stats match a brute-force split per language") {
    val got = TextAnalysis.queries("text_sentences")(spark,
        "/root/testdata/sf0.001")
      .selectExpr("lang", "n_docs", "n_sentences", "n_tokens")
      .as[(String, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001",
        "documents")
      .selectExpr("lang", "text").as[(String, String)].collect()
      .groupBy(_._1)
    got.foreach { case (lang, nd, ns, nt) =>
      val mine = docs(lang).map(_._2)
      assert(nd == mine.length)
      assert(ns == mine.map(_.split("[.!?]+")
        .count(_.trim.nonEmpty).toLong).sum)
      assert(nt == mine.map(
        _.toLowerCase.split("\\s+").length.toLong).sum)
    }
    spark.catalog.clearCache()
  }

  test("vocab encode: ids dense in [-1, 1000), OOV only for off-vocab tokens") {
    // raw array form (the registered query fingerprints `ids` for the
    // driver's hash gate, which can't compare array cells)
    val out = Pipeline.vocabEncode(spark, sf)
      .select($"doc_id", size($"ids").cast("long"), $"ids")
      .as[(Long, Long, Seq[Long])].collect()
    val docs = graft.Tables.load(spark, sf, "documents")
    assert(out.length == docs.count())
    out.foreach { case (id, n, ids) =>
      assert(ids.length == n, s"doc $id: length mismatch")
      assert(ids.forall(i => i == -1L || (i >= 0L && i < 1000L)))
    }
    // the fixture vocabulary is tiny, so every token should be in the
    // top-1000 vocab — OOV must NOT occur here; and id 0 (the most
    // frequent token) must appear somewhere
    assert(out.forall(!_._3.contains(-1L)), "unexpected OOV in fixture")
    assert(out.exists(_._3.contains(0L)))
  }

  test("systematic resample: exactly k copies total, heavy docs guaranteed in") {
    val out = graft.SparkEntry.queries("pipeline_resample")(spark, sf)
      .as[(Long, String, Long, Long)].collect()
    // floor telescoping: Σ n_copies = floor(W·k/W) − floor(0) = k
    assert(out.map(_._4).sum == 1000L,
      "slot boundaries must partition the mass into exactly k picks")
    val w = graft.Tables.load(spark, sf, "documents")
      .select($"doc_id",
        size(split(lower($"text"), "\\s+")).cast("long"))
      .as[(Long, Long)].collect()
    val total = w.map(_._2).sum
    val picked = out.map(_._1).toSet
    // a doc spanning ≥ one full stride (w ≥ W/k) must cross a boundary
    w.filter(_._2 * 1000 >= total).foreach { case (id, _) =>
      assert(picked.contains(id), s"heavy doc $id missed") }
    assert(out.forall(_._4 >= 1))
  }

  test("chunking tiles every token with 16-token overlap, tail short only at end") {
    val chunks = graft.SparkEntry.queries("pipeline_chunk")(spark, sf)
      .as[(Long, Long, Long, String)].collect()
    val docs = graft.Tables.load(spark, sf, "documents")
      .select($"doc_id", size(split(lower($"text"), "\\s+")).cast("long"))
      .as[(Long, Long)].collect().toMap
    assert(chunks.map(_._1).distinct.length == docs.size,
      "every document must produce at least one chunk")
    chunks.groupBy(_._1).foreach { case (id, cs) =>
      val sorted = cs.sortBy(_._2)
      val n = docs(id)
      // chunk k starts at token 48k+1 and carries min(64, n-48k) tokens;
      // the final token of the last chunk is token n — full coverage
      sorted.foreach { case (_, k, len, text) =>
        assert(len == math.min(64L, n - 48 * k), s"doc $id chunk $k")
        assert(text.split(" ").length == len)
      }
      val last = sorted.last
      assert(48 * last._2 + last._3 == n, s"doc $id: tail not at token $n")
      // all chunks except possibly the last are full windows
      assert(sorted.init.forall(_._3 == 64L))
    }
  }

  test("bloom decontamination over-flags only: superset of the exact join, bounded excess") {
    // the exact form (gram equi-join) is ground truth; the raw Bloom
    // PREFILTER may add false positives (fpp 1e-4 per gram) but must
    // never miss a contaminated doc, and the per-doc flagged count
    // can only grow
    val exact = graft.SparkEntry.queries("pipeline_decontaminate")(spark, sf)
      .select($"doc_id", $"n_shared_grams").as[(Long, Long)].collect().toMap
    val bloom = graft.queries.Pipeline.bloomPrefilter(spark, sf)
      .select($"doc_id", $"n_flagged").as[(Long, Long)].collect().toMap
    exact.foreach { case (doc, nShared) =>
      assert(bloom.contains(doc), s"bloom missed contaminated doc $doc")
      assert(bloom(doc) >= nShared,
        s"doc $doc: bloom flagged ${bloom(doc)} < exact $nShared")
    }
    val trainDocs = graft.Tables.load(spark, sf, "documents")
      .filter(substring(md5($"text"), 1, 1) < "c").count()
    val extra = bloom.size - exact.size
    assert(extra <= math.max(2L, trainDocs / 10),
      s"bloom false-positive excess too high: $extra extra docs " +
        s"over ${exact.size} exact on $trainDocs train docs")
    // and the REGISTERED bloom query (prefilter + exact confirm)
    // matches the exact join outright — that equality is what lets
    // it share pipeline_decontaminate's oracle in the gate
    val confirmed = graft.SparkEntry
      .queries("pipeline_decontaminate_bloom")(spark, sf)
      .select($"doc_id", $"n_shared_grams")
      .as[(Long, Long)].collect().toMap
    assert(confirmed == exact,
      s"confirmed bloom output diverges from exact join")
  }

  test("pii patterns redact planted email/ip/phone and leave clean text alone") {
    val rows = Seq(
      "reach me at alice.smith+spam@sub.example.co.uk today",
      "server 192.168.001.42 answered",
      "call 555-0123 now",
      "no pii here at all",
      "a@b.io and 10.0.0.1 and 555-9999 together").toDF("s")
      .withColumn("r",
        regexp_replace(regexp_replace(regexp_replace($"s",
          TextAnalysis.EmailRe, "<EMAIL>"),
          TextAnalysis.Ipv4Re, "<IP>"),
          TextAnalysis.PhoneRe, "<PHONE>"))
      .select($"r").as[String].collect()
    assert(rows(0) == "reach me at <EMAIL> today")
    assert(rows(1) == "server <IP> answered")
    assert(rows(2) == "call <PHONE> now")
    assert(rows(3) == "no pii here at all")
    assert(rows(4) == "<EMAIL> and <IP> and <PHONE> together")
  }

  test("text_pii_redact finds exactly one of each planted category per doc") {
    val out = graft.SparkEntry.queries("text_pii_redact")(spark, sf)
    val bad = out.filter($"n_emails" =!= 1 || $"n_ips" =!= 1 ||
      $"n_phones" =!= 1)
    assert(bad.count() == 0, "every augmented doc plants exactly one email/ip/phone")
  }

  test("stratified sample is deterministic and near the per-lang target rates") {
    val q = graft.SparkEntry.queries("pipeline_sample_stratified")
    val a = q(spark, sf).collect().map(_.getLong(0))
    val b = q(spark, sf).collect().map(_.getLong(0))
    assert(a.sameElements(b), "content-hash sampling must be reproducible")
    val total = graft.Tables.load(spark, sf, "documents")
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    val kept = q(spark, sf).groupBy($"lang").count()
      .as[(String, Long)].collect().toMap
    total.foreach { case (lang, n) =>
      val rate = kept.getOrElse(lang, 0L).toDouble / n
      val target = if (lang == "en") 0.25 else 0.5
      // 3-sigma binomial tolerance at these tiny counts
      val tol = 3 * math.sqrt(target * (1 - target) / n)
      assert(math.abs(rate - target) <= tol,
        s"$lang rate $rate vs target $target (n=$n, tol=$tol)")
    }
  }

  test("quality gate keeps >= half of every language (median threshold)") {
    val total = graft.Tables.load(spark, sf, "documents")
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    val kept = graft.SparkEntry.queries("pipeline_quality_gate")(spark, sf)
      .groupBy($"lang").count().as[(String, Long)].collect().toMap
    total.foreach { case (lang, n) =>
      val k = kept.getOrElse(lang, 0L)
      assert(k >= n / 2, s"$lang kept $k of $n — median gate must keep >= half")
      assert(k < n, s"$lang kept everything — gate is not filtering")
    }
  }

  test("shuffle is a deterministic permutation with all 16 shards in range") {
    val out = graft.SparkEntry.queries("pipeline_shuffle")(spark, sf)
    val n = graft.Tables.load(spark, sf, "documents").count()
    val rows = out.collect()
    assert(rows.length == n, "shuffle must be a permutation, not a sample")
    assert(rows.map(_.getLong(0)).distinct.length == n)
    val shards = rows.map(_.getLong(3))
    assert(shards.forall(s => s >= 0 && s <= 15))
    // md5 uniformity: no shard should be empty at 500 docs
    assert(shards.distinct.length == 16, "all 16 shards populated")
    // the order is the shuffle: doc_id order and output order differ
    assert(!rows.map(_.getLong(0)).sameElements(rows.map(_.getLong(0)).sorted))
  }

  test("cdc apply: tombstones gone, latest update wins, inserts present") {
    val out = graft.SparkEntry.queries("pipeline_cdc_apply")(spark, sf)
      .select($"doc_id", $"digest").as[(Long, String)].collect().toMap
    val docs = graft.Tables.load(spark, sf, "documents")
      .select($"doc_id", md5($"text").as("orig"),
        md5(upper($"text")).as("up"),
        md5(concat($"text", lit(" v3"))).as("v3"))
      .as[(Long, String, String, String)].collect()
    docs.foreach { case (id, orig, up, v3) =>
      if (id % 10 == 7) {
        assert(!out.contains(id), s"tombstoned doc $id survived")
      } else if (id % 100 == 3) {
        // two log entries for this key — seq 2 ('v3' suffix on the
        // ORIGINAL text) must beat seq 1 (upper-case)
        assert(out(id) == v3, s"doc $id: latest-wins violated")
      } else if (id % 10 == 3) {
        assert(out(id) == up, s"doc $id: update not applied")
      } else {
        assert(out(id) == orig, s"doc $id: untouched doc mutated")
      }
      if (id % 10 == 5)
        assert(out.contains(id + 1000000L), s"insert for $id missing")
    }
    // no keys beyond snapshot ∪ inserts
    val validIds = docs.map(_._1).toSet
    out.keys.foreach { id =>
      assert(validIds.contains(id) ||
        (id > 1000000L && validIds.contains(id - 1000000L) &&
          (id - 1000000L) % 10 == 5), s"unexpected key $id")
    }
  }

  test("dedup sweep tiers chain and reconcile with their components") {
    val rows = graft.SparkEntry.queries("pipeline_dedup_sweep")(
      spark, sf).as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(rows.size == 2)
    val (_, n0, rm1, k1) = rows("1_exact")
    val (_, in2, rm2, out2) = rows("2_near_jaccard")
    val docs = graft.Tables.load(spark, sf, "documents")
    assert(n0 == docs.count())
    // tier-1 reconciles with the digest count
    val distinctDigests = docs
      .selectExpr("md5(text) as g").distinct().count()
    assert(k1 == distinctDigests && rm1 == n0 - k1)
    // chaining: tier 2 consumes exactly tier 1's survivors
    assert(in2 == k1 && out2 == in2 - rm2)
    assert(rm1 >= 0 && rm2 >= 0 && out2 > 0)
    // tier-2 removals reconcile with the CC non-canonical count over
    // the survivor set (round 10: the near tier runs the lossless
    // prefix-filter generator at J >= 1/2 — see Pipeline.scala)
    val keep1 = docs.selectExpr("doc_id", "md5(text) as g")
      .groupBy("g")
      .agg(org.apache.spark.sql.functions.min($"doc_id").as("doc_id"))
      .select("doc_id")
    val cc = graft.dedup.Dedup.connectedComponents(
      graft.dedup.Dedup.prefixFilterPairsOver(
        graft.dedup.Dedup.shingleBlocks(docs.join(keep1, Seq("doc_id")))))
    assert(rm2 == cc.filter($"doc_id" =!= $"component").count())
    // losslessness, observable at the tier level: the BLOCKED exact
    // generator at the same J >= 1/2 finds only within-block pairs, a
    // subset of the global prefix-filter pair set — and CC removals
    // are monotone in the edge set, so blocked-0.5 removals can never
    // exceed the sweep's. (The old 0.05 near tier is NOT comparable:
    // different threshold AND different blocking scope — at this
    // fixture the global 0.5 generator actually removes MORE than the
    // blocked 0.05 one because near-dups straddle length blocks.)
    val rmBlocked05 = graft.dedup.Dedup.connectedComponents(
      graft.dedup.Dedup.ngramJaccardPairs(
        graft.dedup.Dedup.shingleBlocks(docs.join(keep1, Seq("doc_id"))),
        0.5))
      .filter($"doc_id" =!= $"component").count()
    assert(rmBlocked05 <= rm2)
    spark.catalog.clearCache()
  }

  test("shard plan: shards are contiguous, budget-bounded, and conserve") {
    val rows = graft.SparkEntry.queries("pipeline_shard_plan")(
      spark, sf).as[(Long, Long, Long, String)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    val docs = graft.Tables.load(spark, sf, "documents")
      .selectExpr("doc_id", "size(split(text, '\\\\s+')) as n",
        "md5(concat('shard42:', cast(doc_id as string))) as k")
      .as[(Long, Int, String)].collect().sortBy(r => (r._3, r._1))
    // driver replay of the greedy-contiguous rule
    var cum = 0L
    val assign = docs.map { case (_, n, k) =>
      val sid = cum / 20000L
      cum += n
      (sid, n.toLong, k)
    }
    val byShard = assign.groupBy(_._1)
    assert(rows.map(_._1).toSet == byShard.keySet)
    rows.foreach { case (sid, nDocs, nTok, firstKey) =>
      val ds = byShard(sid)
      assert(nDocs == ds.length && nTok == ds.map(_._2).sum, s"s$sid")
      assert(firstKey == ds.map(_._3).min, s"s$sid first key")
    }
    assert(rows.map(_._3).sum == docs.map(_._2.toLong).sum,
      "token conservation")
    // every shard but the last carries at least the budget's worth of
    // starts (a doc can overflow, so tokens >= budget - max_doc)
    val maxDoc = docs.map(_._2.toLong).max
    rows.init.foreach { case (sid, _, nTok, _) =>
      assert(nTok >= 20000L - maxDoc, s"shard $sid undersized")
    }
    spark.catalog.clearCache()
  }

  test("temperature mix: weights normalize and lift low-resource langs") {
    val rows = graft.SparkEntry.queries("pipeline_temperature_mix")(
      spark, sf).as[(String, Long, Long, Double, Double, Double)]
      .collect()
    assert(rows.nonEmpty)
    assert(math.abs(rows.map(_._4).sum - 1.0) < 1e-4, "p sums to 1")
    assert(math.abs(rows.map(_._5).sum - 1.0) < 1e-4, "w sums to 1")
    // driver recompute of the alpha-smoothed weights
    val tot = rows.map(_._3).sum.toDouble
    val pas = rows.map(r => math.pow(r._3 / tot, 0.3))
    rows.zip(pas).foreach { case ((lang, _, _, p, w, boost), pa) =>
      assert(math.abs(w - pa / pas.sum) < 1e-4, lang)
      assert(math.abs(boost - w / p) < 1e-2, lang)
    }
    // smoothing lifts below-average languages, dampens the head
    val avgP = 1.0 / rows.length
    rows.foreach { case (lang, _, _, p, _, boost) =>
      if (p < avgP * 0.8) assert(boost > 1.0, s"$lang should be lifted")
      if (p > avgP * 1.25) assert(boost < 1.0, s"$lang should be damped")
    }
    spark.catalog.clearCache()
  }
}
