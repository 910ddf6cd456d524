package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral specs for the round-16 batch-4 LLM-training ops —
  * independent driver-side re-derivations at sf0.001 on top of the
  * DuckDB hash gate.
  */
class LlmFrontierSpec extends SparkSpec {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  /** Left-fold cosine in index order — the same operation order as
    * the native expression and the DuckDB list_reduce replay.
    */
  private def cos(a: Array[Float], b: Array[Float], dim: Int): Double = {
    var dot = 0.0; var na = 0.0; var nb = 0.0
    var i = 0
    while (i < dim) {
      dot += a(i).toDouble * b(i).toDouble
      na += a(i).toDouble * a(i).toDouble
      nb += b(i).toDouble * b(i).toDouble
      i += 1
    }
    dot / (math.sqrt(na) * math.sqrt(nb))
  }

  private def embeddings(): Array[(Long, Array[Float], Int)] =
    graft.Tables.load(spark, sf, "embeddings")
      .select($"vec_id", $"embedding", $"label")
      .as[(Long, Array[Float], Int)].collect()

  test("hard negatives: top-5 wrong-label neighbors + triplet margin") {
    val e = embeddings()
    val dim = e.head._2.length
    val got = LlmFrontier.queries("ann_hard_negatives")(spark, sf)
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    val byQ = got.groupBy(_._1)
    e.filter(_._1 % 100 == 0).foreach { case (qid, qv, qlab) =>
      val scored = e.filter(_._1 != qid)
        .map { case (id, v, lab) => (id, lab, cos(qv, v, dim)) }
      val negs = scored.filter(_._2 != qlab)
        .sortBy(t => (-t._3, t._1)).take(5)
      val pos = scored.filter(_._2 == qlab).map(_._3).max
      val rows = byQ(qid).sortBy(_._2)
      assert(rows.map(_._3).toSeq == negs.map(_._1).toSeq,
        s"q=$qid negative ids")
      rows.zip(negs).foreach { case (r, (_, _, c)) =>
        assert(math.abs(r._4 - c) < 1e-9)
        assert(math.abs(r._5 - pos) < 1e-9)
        assert(math.abs(r._6 - (pos - c)) < 1e-5, "margin = pos - neg")
      }
    }
  }

  test("matryoshka: recall vs full-dim truth; dim-64 row is exactly 1") {
    val e = embeddings()
    val got = LlmFrontier.queries("emb_matryoshka_eval")(spark, sf)
      .as[(Long, Long, Long, Double)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(8L, 16L, 32L, 64L))
    val qs = e.filter(_._1 % 100 == 0)
    def top10(dim: Int, qid: Long, qv: Array[Float]): Set[Long] =
      e.filter(_._1 != qid)
        .map { case (id, v, _) => (id, cos(qv, v, dim)) }
        .sortBy(t => (-t._2, t._1)).take(10).map(_._1).toSet
    val truth = qs.map { case (qid, qv, _) => qid -> top10(64, qid, qv) }
      .toMap
    got.foreach { case (dim, nq, overlap, recall) =>
      assert(nq == qs.length.toLong)
      val exp = qs.map { case (qid, qv, _) =>
        (top10(dim.toInt, qid, qv) & truth(qid)).size
      }.sum.toLong
      assert(overlap == exp, s"dim=$dim overlap")
      val expR = BigDecimal(exp.toDouble / (10.0 * nq.toDouble))
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(recall == expR)
    }
    assert(got.last._4 == 1.0, "full-dim search IS the truth run")
    // recall should not decrease when the prefix widens (planted
    // property of prefix-dominant synthetic embeddings is not
    // guaranteed — assert the weaker sanity: every recall in (0, 1])
    got.foreach(r => assert(r._4 > 0.0 && r._4 <= 1.0))
  }

  test("span corruption: layout matches the mix32 re-derivation") {
    // replicate the engine-portable scramble in driver longs
    def mix(x: Long): Long = {
      val s0 = x % 2147483647L
      val v1 = (s0 * 2654435761L) % 4294967296L
      val v2 = v1 ^ (v1 >> 16)
      val v3 = (v2 * 40503L) % 4294967296L
      v3 ^ (v3 >> 16)
    }
    def md5hex(s: String): String =
      java.security.MessageDigest.getInstance("MD5")
        .digest(s.getBytes("UTF-8"))
        .map(b => f"$b%02x").mkString
    val docs = graft.Tables.load(spark, sf, "documents")
      .select($"doc_id", size(split(lower($"text"), "\\s+")).cast("long"))
      .as[(Long, Long)].collect().toMap
    val got = LlmFrontier.queries("pipeline_span_corruption")(spark, sf)
      .as[(Long, Long, Long, Long, Double, String)].collect()
    assert(got.length == docs.size)
    got.foreach { case (id, n, nSpans, nMasked, rate, fp) =>
      assert(n == docs(id))
      val starts = (0L until n).filter(i =>
        mix(id * 1000003L + i) % 20L == 0L)
      val masked = starts.flatMap(s => s to math.min(s + 2L, n - 1L))
        .distinct.sorted
      assert(nSpans == starts.length.toLong, s"doc $id spans")
      assert(nMasked == masked.length.toLong, s"doc $id masked")
      val expRate = BigDecimal(masked.length.toDouble / n.toDouble)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(rate == expRate)
      assert(fp == md5hex(masked.mkString(",")), s"doc $id fingerprint")
      // spans clip at the end, never spill
      assert(masked.forall(i => i >= 0 && i < n))
    }
    // the layout is a plan over real text: some doc must have spans
    assert(got.map(_._3).sum > 0, "fixture produced zero spans — vacuous")
  }
}
