package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral specs for the round-16 batch-6 LLM-training ops —
  * independent driver-side re-derivations at sf0.001 on top of the
  * DuckDB hash gate.
  */
class LlmFrontier2Spec extends SparkSpec {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  private def round6(x: Double): Double =
    BigDecimal(x).setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

  test("mips: top-10 by inner product matches brute force") {
    val e = graft.Tables.load(spark, sf, "embeddings")
      .select($"vec_id", $"embedding")
      .as[(Long, Array[Float])].collect()
    def dot(a: Array[Float], b: Array[Float]): Double = {
      var s = 0.0; var i = 0
      while (i < a.length) { s += a(i).toDouble * b(i).toDouble; i += 1 }
      s
    }
    val got = LlmFrontier2.queries("ann_mips")(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    val byQ = got.groupBy(_._1)
    e.filter(_._1 % 100 == 0).foreach { case (qid, qv) =>
      val exp = e.filter(_._1 != qid)
        .map { case (id, v) => (id, dot(qv, v)) }
        .sortBy(t => (-t._2, t._1)).take(10)
      val rows = byQ(qid).sortBy(_._2)
      assert(rows.map(_._3).toSeq == exp.map(_._1).toSeq, s"q=$qid ids")
      rows.zip(exp).foreach { case (r, (_, s)) =>
        assert(math.abs(r._4 - s) < 1e-9)
      }
    }
  }

  test("calibration: bins, micro-averaged confidence, accuracy, ECE") {
    val en = graft.text.TextAnalysis.stopwords.toMap.apply("en").toSet
    val docs = graft.Tables.load(spark, sf, "documents")
      .select($"lang", lower($"text")).as[(String, String)].collect()
      .map { case (lang, text) =>
        val t = text.split("\\s+", -1)
        val hits = t.count(en.contains).toLong
        val total = t.length.toLong
        (math.min(10L * hits / total, 9L), total, hits,
          if (lang == "en") 1L else 0L)
      }
    val bins = docs.groupBy(_._1).view.mapValues { rs =>
      (rs.length.toLong, rs.map(_._4).sum, rs.map(_._3).sum,
        rs.map(_._2).sum)
    }.toMap
    val nAll = docs.length.toDouble
    val ece = bins.toSeq.sortBy(_._1).foldLeft(0.0) {
      case (acc, (_, (n, pos, hits, total))) =>
        acc + n.toDouble / nAll *
          math.abs(pos.toDouble / n.toDouble -
            hits.toDouble / total.toDouble)
    }
    val got = LlmFrontier2.queries("pipeline_calibration")(spark, sf)
      .as[(Long, Long, Long, Double, Double, Double)].collect()
    assert(got.length == bins.size)
    got.foreach { case (bin, n, pos, conf, acc, e) =>
      val (en_, epos, ehits, etotal) = bins(bin)
      assert(n == en_ && pos == epos)
      assert(conf == round6(ehits.toDouble / etotal.toDouble))
      assert(acc == round6(epos.toDouble / en_.toDouble))
      assert(math.abs(e - ece) < 1e-6)
      assert(e >= 0.0 && e <= 1.0)
    }
  }

  test("token drift: JS over top-500+OOV matches re-derivation") {
    val docs = graft.Tables.load(spark, sf, "documents")
      .select($"doc_id", lower($"text")).as[(Long, String)].collect()
    val mid = docs.map(_._1).max / 2
    val counts = scala.collection.mutable.Map[String, (Long, Long)]()
      .withDefaultValue((0L, 0L))
    docs.foreach { case (id, text) =>
      text.split("\\s+", -1).foreach { t =>
        val (f, s0) = counts(t)
        counts(t) = if (id <= mid) (f + 1, s0) else (f, s0 + 1)
      }
    }
    val n1 = counts.values.map(_._1).sum
    val n2 = counts.values.map(_._2).sum
    val top = counts.toSeq
      .sortBy { case (t, (f, s0)) => (-(f + s0), t) }.take(500)
    val oovF = n1 - top.map(_._2._1).sum
    val oovS = n2 - top.map(_._2._2).sum
    val cells = (top :+ ("~other~" -> (oovF, oovS))).sortBy(_._1)
    val js = cells.foldLeft(0.0) { case (acc, (_, (f, s0))) =>
      val p = (f.toDouble + 0.5) / (n1.toDouble + 250.5)
      val q = (s0.toDouble + 0.5) / (n2.toDouble + 250.5)
      val m = 0.5 * (p + q)
      acc + 0.5 * p * math.log(p / m) + 0.5 * q * math.log(q / m)
    }
    val got = LlmFrontier2.queries("text_token_drift")(spark, sf)
      .as[(Long, Long, Long, Double, Double)].collect().head
    assert(got._1 == n1 && got._2 == n2)
    assert(got._3 == cells.size.toLong)
    assert(math.abs(got._4 - js) < 1e-6)
    assert(got._4 >= 0.0 && got._4 <= math.log(2.0) + 1e-9,
      "JS divergence is bounded by ln 2")
    assert(math.abs(got._5 - math.sqrt(math.max(js, 0.0))) < 1e-6)
  }

  test("soft-dedup weights: 1/cluster-size, singletons keep weight 1") {
    val clus = graft.dedup.Dedup.queries("dedup_clusters")(spark, sf)
      .select($"doc_id", $"component").as[(Long, Long)].collect()
    val size = clus.groupBy(_._2).view.mapValues(_.length.toLong).toMap
    val comp = clus.toMap
    val nDocs = graft.Tables.load(spark, sf, "documents").count()
    val got = LlmFrontier2
      .queries("pipeline_soft_dedup_weights")(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.length == nDocs, "every document gets a weight row")
    assert(got.map(_._1).distinct.length == got.length)
    got.foreach { case (id, cid, csize, w) =>
      comp.get(id) match {
        case Some(c) =>
          assert(cid == c && csize == size(c), s"doc $id cluster")
        case None =>
          assert(cid == id && csize == 1L, s"doc $id is a singleton")
      }
      assert(w == round6(1.0 / csize.toDouble))
    }
    // the fixture must actually contain a non-trivial cluster
    assert(got.exists(_._3 > 1L), "no clusters — weighting is vacuous")
  }
}
