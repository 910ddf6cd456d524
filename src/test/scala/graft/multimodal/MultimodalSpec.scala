package graft.multimodal

import graft.SparkSpec
import graft.multimodal.Multimodal.{DecodedMedia, MediaRecord}
import java.util.concurrent.ConcurrentLinkedQueue
import scala.jdk.CollectionConverters._

class MultimodalSpec extends SparkSpec {
  import spark.implicits._

  private def packedDf(n: Int) = {
    (0 until n).map(i => MediaRecord(i.toLong,
      Array.fill(10 + i % 50)(i.toByte), "en", "s0", i % 3,
      Array(0.1f, 0.2f))).toDF()
  }

  test("decode kernel receives bounded batches covering every record") {
    MultimodalSpec.calls.clear()
    val out = Multimodal.decode(packedDf(130).repartition(2),
      batchSize = 32, kernel = MultimodalSpec.recordingKernel)
      .as[DecodedMedia].collect()
    assert(out.length == 130)
    assert(out.map(_.doc_id).toSet == (0L until 130L).toSet)
    val sizes = MultimodalSpec.calls.asScala.toSeq
    assert(sizes.forall(_ <= 32), s"oversized batch: $sizes")
    assert(sizes.sum == 130)
    // amortization happened: far fewer kernel calls than records
    assert(sizes.size <= 8, s"too many kernel invocations: ${sizes.size}")
  }

  test("phash pairs are exactly the Hamming<=2 pairs (brute force)") {
    val got = Multimodal.queries("mm_phash_dedup")(spark,
        "/root/testdata/sf0.001")
      .as[(Long, Long, Long)].collect().map(r => (r._1, r._2)).toSet
    // recompute hashes by hand from the stub kernel definition
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.001",
        "documents")
      .join(graft.Tables.load(spark, "/root/testdata/sf0.001",
        "embeddings"), $"doc_id" === $"vec_id")
      .selectExpr("doc_id", "text").as[(Long, String)].collect()
    def phash(text: String): Long = {
      val counts = new Array[Long](26)
      text.getBytes("UTF-8").foreach { b =>
        val c = (b | 0x20).toChar
        if (c >= 'a' && c <= 'z') counts(c - 'a') += 1
      }
      val tot = counts.sum
      (0 until 26).map { i =>
        (if (26 * counts(i) > tot) 1L << i else 0L) +
          (if (13 * counts(i) > tot) 1L << (i + 26) else 0L)
      }.sum
    }
    val hs = docs.map { case (id, t) => id -> phash(t) }
    val want = (for {
      (a, ha) <- hs; (b, hb) <- hs if a < b
      if java.lang.Long.bitCount(ha ^ hb) <= 2
    } yield (a, b)).toSet
    assert(got == want,
      s"banding must be a lossless Hamming<=2 blocker: " +
        s"missing ${(want -- got).take(3)}, extra ${(got -- want).take(3)}")
  }

  test("stub decode is deterministic over payload bytes") {
    val a = Multimodal.fakeDecode(1L, Array[Byte](1, 2, 3))
    val b = Multimodal.fakeDecode(1L, Array[Byte](9, 9, 9))
    assert(a == b) // depends only on length + id
    assert(a.byte_len == 3 && a.n_frames == 1L + 3 % 8)
  }

  test("VAD matches a driver-side frame-energy recompute") {
    val sf = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("mm_audio_vad")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.nonEmpty)
    val docs = Multimodal.pack(spark, sf)
      .selectExpr("doc_id", "cast(payload as string) as text")
      .as[(Long, String)].collect()
    assert(got.size == docs.count(_._2.nonEmpty))
    docs.filter(_._2.nonEmpty).foreach { case (id, text) =>
      val energies = text.getBytes("UTF-8").grouped(160)
        .map(_.map(b => (b & 0xff).toLong).sum).toArray
      val th = energies.sum / energies.length
      val voiced = energies.map(_ > th)
      val runLens = voiced.foldLeft(List.empty[Long]) {
        case (h :: t, true) if h > 0 => (h + 1) :: t
        case (acc, true) => 1L :: acc
        case (acc, false) => 0L :: acc
      }.filter(_ > 0)
      val (_, nF, nV, nS, maxS) = got(id)
      assert(nF == energies.length, s"doc $id frames")
      assert(nV == voiced.count(identity), s"doc $id voiced")
      assert(nS == runLens.length, s"doc $id segments")
      assert(maxS == (if (runLens.isEmpty) 0L else runLens.max),
        s"doc $id max segment")
    }
    spark.catalog.clearCache()
  }

  test("coverage audit reconciles totals and bounds the ratio") {
    val sf = "/root/testdata/sf0.001"
    val rows = graft.SparkEntry.queries("mm_coverage")(spark, sf)
      .as[(String, String, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val nDocs = graft.Tables.load(spark, sf, "documents").count()
    val nEmb = graft.Tables.load(spark, sf, "embeddings").count()
    assert(rows.map(_._3).sum == nDocs)
    assert(rows.map(_._4).sum <= nEmb)
    rows.foreach { case (l, s0, n, w, _, cov) =>
      assert(w <= n, s"$l/$s0")
      assert(math.abs(cov - w.toDouble / n) < 1e-5, s"$l/$s0")
    }
    spark.catalog.clearCache()
  }

  test("scene cuts match a driver-side frame-difference recompute") {
    val sf = "/root/testdata/sf0.001"
    val got = graft.SparkEntry.queries("mm_scene_cut")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.nonEmpty)
    val docs = Multimodal.pack(spark, sf)
      .selectExpr("doc_id", "cast(payload as string) as text")
      .as[(Long, String)].collect().filter(_._2.nonEmpty)
    docs.foreach { case (id, text) =>
      val e = text.getBytes("UTF-8").grouped(160)
        .map(_.map(b => (b & 0xff).toLong).sum).toArray
      val (wantCuts, wantMean) =
        if (e.length <= 1) (0L, e.length.toLong)
        else {
          val diffs = e.sliding(2).map(w => math.abs(w(1) - w(0))).toArray
          val th = diffs.sum / diffs.length
          val cuts = diffs.count(_ > th).toLong
          (cuts, e.length / (cuts + 1L))
        }
      val (_, nF, nC, mean) = got(id)
      assert(nF == e.length, s"doc $id frames")
      assert(nC == wantCuts, s"doc $id cuts")
      assert(mean == wantMean, s"doc $id mean shot")
    }
    spark.catalog.clearCache()
  }
}

object MultimodalSpec {
  // executor-side recording (local mode shares the JVM)
  val calls = new ConcurrentLinkedQueue[Int]()
  val recordingKernel: Multimodal.DecodeKernel = { batch =>
    calls.add(batch.size)
    Multimodal.stubKernel(batch)
  }
}

class ResolutionLadderSpec extends graft.SparkSpec {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("ladder budget matches a driver recompute through the kernel dims") {
    val got = Multimodal.queries("mm_resolution_ladder")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    val dims = Multimodal.decode(Multimodal.pack(spark, sf,
        spreadDocs = true))
      .select($"doc_id", $"width", $"height")
      .as[(Long, Long, Long)].collect()
    val rungs = Seq(96L, 144L, 240L, 360L, 480L)
    val total = dims.length.toLong
    val expected = rungs.flatMap { r =>
      val hit = dims.filter { case (_, w, h) => r <= math.min(w, h) }
      if (hit.isEmpty) None
      else {
        val px = hit.map { case (_, w, h) =>
          val s = math.min(w, h); val l = math.max(w, h)
          r * (l * r / s)
        }.sum
        Some(r -> (hit.length.toLong, px))
      }
    }.toMap
    assert(got.map(_._1).toSet == expected.keySet)
    got.foreach { case (r, n, px, mean, reach) =>
      val (en, epx) = expected(r)
      assert(n == en, s"rung $r count")
      assert(px == epx, s"rung $r pixels")
      assert(mean == px / n, s"rung $r mean")
      assert(reach == n * 1000L / total, s"rung $r reach")
    }
    // the cost curve is monotone: higher rungs reach fewer assets
    val byRung = got.sortBy(_._1)
    byRung.zip(byRung.drop(1)).foreach { case (a, b) =>
      assert(a._2 >= b._2, "reach shrinks as the rung rises") }
  }
}
