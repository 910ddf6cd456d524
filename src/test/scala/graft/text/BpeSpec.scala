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

  test("stops early when no pairs remain") {
    import spark.implicits._
    val got = Bpe.learn(Seq("a b c").toDF("text"), 50)
      .as[(Long, String, String, String, Long)].collect().toSeq
    // single-char words: each is [c, </w>] — 3 mergeable pairs total,
    // then every word is one symbol and learning must terminate
    assert(got.size == 3 && got.forall(_._3 == "</w>"))
  }
}
