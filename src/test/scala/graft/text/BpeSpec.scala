package graft.text

import graft.SparkSpec

/** Pins Bpe.learn against an independent single-node reference
  * implementation of the same algorithm (Sennrich-style BPE: word
  * frequencies, char+</w> init, greedy non-overlapping merge apply,
  * argmax by weight then lexicographic pair). The Spark side is
  * HOF-fold distributed code; this is scalar Scala collections — a
  * genuine cross-implementation check, not a replay.
  */
class BpeSpec extends SparkSpec {

  private def referenceBpe(texts: Seq[String], nMerges: Int)
      : Seq[(Long, String, String, String, Long)] = {
    val wordFreq = texts
      .flatMap(_.toLowerCase.split("\\s+"))
      .filter(_.matches("^[a-z]+$"))
      .groupBy(identity).map { case (w, ws) => (w, ws.size.toLong) }
    var syms: Map[Vector[String], Long] = wordFreq.map { case (w, f) =>
      (w.map(_.toString).toVector :+ "</w>", f)
    }.groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).sum) }
    val out = Seq.newBuilder[(Long, String, String, String, Long)]
    var rank = 1L
    var done = false
    while (rank <= nMerges && !done) {
      val pairs = scala.collection.mutable.Map[(String, String), Long]()
      for ((s, f) <- syms; i <- 0 until s.size - 1)
        pairs((s(i), s(i + 1))) = pairs.getOrElse((s(i), s(i + 1)), 0L) + f
      if (pairs.isEmpty) done = true
      else {
        val ((l, r), w) = pairs.toSeq.minBy { case ((a, b), c) =>
          (-c, a, b)
        }
        out += ((rank, l, r, l + r, w))
        syms = syms.toSeq.map { case (s, f) =>
          val b = Vector.newBuilder[String]
          var i = 0
          while (i < s.size) {
            if (i < s.size - 1 && s(i) == l && s(i + 1) == r) {
              b += (l + r); i += 2
            } else { b += s(i); i += 1 }
          }
          (b.result(), f)
        }.groupBy(_._1).map { case (k, vs) => (k, vs.map(_._2).sum) }
        rank += 1
      }
    }
    out.result()
  }

  test("merge table matches the independent reference implementation") {
    import spark.implicits._
    // mixed corpus: the classic low/lower/newest family (known merge
    // cascade), repetition to force weight ties, and an overlap word
    // ("aaa") exercising the non-overlapping greedy scan
    val texts = Seq(
      "low low low lower lower lowest",
      "new new newer newest newest newest",
      "aaa aaa aaa aaa banana bandana",
      "the the the the quick brown fox low newest")
    val got = Bpe.learn(texts.toDF("text"), 12)
      .as[(Long, String, String, String, Long)].collect().toSeq
    val want = referenceBpe(texts, 12)
    assert(got == want)
  }

  test("overlapping runs merge greedily left-to-right") {
    import spark.implicits._
    // "aaaaaaaa" with merge (a,a): greedy non-overlapping →
    // [aa, aa, aa, aa, </w>], so round 2's top pair is (aa, aa)
    // STRICTLY (weight 9 vs 3 for (aa, </w>)) and (a, a) can never
    // recur. (The previous "aaaa" fixture tied (aa,aa) with (aa,</w>)
    // at weight 3, where the declared tie-break — weight DESC, left
    // ASC, right ASC — correctly picks (aa,</w>) since "</w>" < "aa";
    // the fixture was ambiguous, not the implementation.)
    val got = Bpe.learn(Seq("aaaaaaaa aaaaaaaa aaaaaaaa").toDF("text"), 2)
      .as[(Long, String, String, String, Long)].collect().toSeq
    assert(got.map(m => (m._2, m._3)) == Seq(("a", "a"), ("aa", "aa")))
  }

  /** Independent scalar BPE encoder (lowest-rank-first, greedy
    * non-overlapping apply) — deliberately re-implemented here rather
    * than calling Bpe.encodeWord, so the spec is a cross-check.
    */
  private def referenceEncode(word: String,
      merges: Seq[(String, String)]): Seq[String] = {
    val rank = merges.zipWithIndex.toMap
    var syms = word.map(_.toString).toList :+ "</w>"
    var go = true
    while (go) {
      val present = syms.zip(syms.tail)
        .filter(rank.contains).sortBy(rank)
      present.headOption match {
        case None => go = false
        case Some((l, r)) =>
          val out = scala.collection.mutable.ListBuffer[String]()
          var rest = syms
          while (rest.nonEmpty) rest match {
            case a :: b :: t if a == l && b == r =>
              out += (l + r); rest = t
            case a :: t => out += a; rest = t
            case Nil =>
          }
          syms = out.toList
      }
    }
    syms
  }

  test("encode segments with the learned merges, losslessly and rank-greedily") {
    import spark.implicits._
    val texts = Seq(
      "low low low lower lower lowest",
      "new new newer newest newest newest",
      "the quick brown fox 123 x9") // non-alpha words pass through
    val docs = texts.zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val merges = Bpe.learn(docs.select($"text"), 8)
      .as[(Long, String, String, String, Long)].collect().toSeq
    val out = Bpe.encode(docs, merges.map(m => (m._1, m._2, m._3)))
      .as[(Long, Long, Long, String)].collect()
    assert(out.length == texts.length)
    // expected per-doc token stream via the independent encoder
    val pairTable = merges.map(m => (m._2, m._3))
    texts.zipWithIndex.foreach { case (t, i) =>
      val ws = t.toLowerCase.split("\\s+").filter(_.nonEmpty)
      val toks = ws.flatMap { w =>
        if (w.forall(c => c >= 'a' && c <= 'z'))
          referenceEncode(w, pairTable)
        else Seq(w)
      }
      val (_, nWords, nToks, fp) = out(i)
      assert(nWords == ws.length, s"doc $i word count")
      assert(nToks == toks.length,
        s"doc $i: got $nToks tokens, reference says ${toks.length}")
      val want = java.security.MessageDigest.getInstance("MD5")
        .digest(toks.mkString(",").getBytes("UTF-8"))
        .map("%02x".format(_)).mkString
      assert(fp == want, s"doc $i: token sequence fingerprint differs")
      // losslessness: each word's segmentation concatenates back to
      // the word once the end-of-word markers are stripped
      ws.filter(_.forall(c => c >= 'a' && c <= 'z')).foreach { w =>
        assert(referenceEncode(w, pairTable).mkString
          .replace("</w>", "") == w, s"lossy segmentation of '$w'")
      }
    }
  }

  test("stops early when no pairs remain") {
    import spark.implicits._
    val got = Bpe.learn(Seq("a b c").toDF("text"), 50)
      .as[(Long, String, String, String, Long)].collect().toSeq
    // single-char words: each is [c, </w>] — 3 mergeable pairs total,
    // then every word is one symbol and learning must terminate
    assert(got.size == 3 && got.forall(_._3 == "</w>"))
  }
}
