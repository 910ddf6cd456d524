package graft.sim

import graft.SparkSpec

class SimilaritySpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  private def topSets(rows: Array[(Long, Long, Long)]): Map[Long, Set[Long]] =
    rows.groupBy(_._1).map { case (q, rs) => q -> rs.map(_._3).toSet }

  test("quantization codes bound reconstruction error by one step") {
    val got = graft.sim.Similarity.queries("emb_quantize")(spark,
        "/root/testdata/sf0.001")
      .selectExpr("vec_id", "dim", "l1_code")
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty)
    val raw = graft.Tables.load(spark, "/root/testdata/sf0.001",
        "embeddings")
      .selectExpr("vec_id", "cast(embedding as array<double>) as v")
      .as[(Long, Seq[Double])].collect().toMap
    got.foreach { case (id, dim, l1) =>
      val v = raw(id)
      assert(dim == v.length)
      val mx = v.map(math.abs).foldLeft(0.0)(math.max)
      val codes = v.map(x => math.floor(x * 127.0 / mx).toLong)
      assert(l1 == codes.map(math.abs).sum)
      // every code is in [-127, 127] and reconstructs within one step
      codes.zip(v).foreach { case (c, x) =>
        assert(c >= -127 && c <= 127)
        assert(math.abs(c * mx / 127.0 - x) <= mx / 127.0 + 1e-12)
      }
    }
    spark.catalog.clearCache()
  }

  test("auto plane count keeps bucket occupancy flat as corpus grows") {
    // each added plane halves expected occupancy: n / 2^planes stays
    // within a constant factor of the target across 6 orders of corpus
    for (n <- Seq(1000L, 100000L, 10000000L, 1000000000L)) {
      val p = Similarity.planesFor(n, targetBucket = 64)
      val occ = n.toDouble / math.pow(2, p)
      assert(p >= 4 && p <= 24)
      if (p > 4 && p < 24) // inside the clamp, occupancy tracks target
        assert(occ >= 16 && occ <= 256,
          s"n=$n planes=$p occupancy=$occ off target")
    }
    assert(Similarity.planesFor(1000000000L) >
      Similarity.planesFor(1000000L))
    // auto query returns ranked neighbors like the fixed-plane form
    val out = Similarity.lshTopKAuto(spark, sf, targetBucket = 32)
      .select("q_id", "rank", "vec_id").as[(Long, Long, Long)].collect()
    assert(out.nonEmpty)
    assert(out.groupBy(_._1).values.forall(_.map(_._2).toSet
      .subsetOf((1L to 10L).toSet)))
  }

  test("auto LSH recall holds at two corpus sizes with different plane counts") {
    // the registered gate query (ann_lsh_auto): the plane count must
    // actually change across scales AND recall vs brute force must
    // stay useful at both — the property planesFor exists to preserve
    def recallAt(d: String): (Int, Double) = {
      val n = graft.Tables.load(spark, d, "embeddings").count()
      val planes = Similarity.planesFor(n)
      val bf = topSets(Similarity.bruteForceTopK(spark, d)
        .select("q_id", "rank", "vec_id").as[(Long, Long, Long)].collect())
      val auto = topSets(Similarity.lshTopKAuto(spark, d)
        .select("q_id", "rank", "vec_id").as[(Long, Long, Long)].collect())
      val recalls = bf.map { case (q, top) =>
        auto.getOrElse(q, Set.empty).intersect(top).size.toDouble / top.size
      }
      (planes, recalls.sum / recalls.size)
    }
    // sf0.01 ships the same 500 embeddings as sf0.001; sf0.1 has 2000
    // — the smallest pair of scales where planesFor actually moves
    val (pSmall, rSmall) = recallAt("/root/testdata/sf0.001")
    val (pBig, rBig) = recallAt("/root/testdata/sf0.1")
    info(s"planes: $pSmall -> $pBig, recall@10: $rSmall -> $rBig")
    assert(pSmall != pBig, "plane count must differ across corpus sizes")
    assert(rSmall >= 0.3, s"small-corpus recall too low: $rSmall")
    assert(rBig >= 0.3, s"large-corpus recall too low: $rBig")
  }

  test("k-means convergence stop ends Lloyd iterations early on separable data") {
    // two tight, well-separated clusters: one iteration snaps the
    // centroids and the next moves ~0 — the tol stop must fire long
    // before the iteration budget
    val vecs = ((0 until 20).map(i =>
      (i.toLong, Array(1.0f + i * 1e-4f, 0.0f))) ++
      (20 until 40).map(i =>
        (i.toLong, Array(0.0f, 1.0f + i * 1e-4f))))
      .toDF("vec_id", "embedding")
    val (cents, itersRun) = Similarity.kmeansCentroidsWithStats(
      vecs, k = 2, iters = 10, tol = 1e-9)
    assert(cents.count() == 2)
    assert(itersRun < 10, s"expected early convergence, ran $itersRun")
  }

  test("brute force top-k: 10 ranked neighbors per query, self excluded") {
    val out = Similarity.bruteForceTopK(spark, sf)
      .select("q_id", "rank", "vec_id").as[(Long, Long, Long)].collect()
    val byQ = out.groupBy(_._1)
    assert(byQ.nonEmpty)
    byQ.foreach { case (q, rows) =>
      assert(rows.map(_._2).sorted.toSeq == (1L to 10L))
      assert(!rows.exists(_._3 == q))
    }
  }

  test("LSH candidates are a subset-rerank: hits agree with brute force cosines") {
    val bf = Similarity.bruteForceTopK(spark, sf, k = 50)
      .select("q_id", "vec_id", "cosine").as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    val lsh = Similarity.lshTopK(spark, sf)
      .select("q_id", "vec_id", "cosine").as[(Long, Long, Double)].collect()
    assert(lsh.nonEmpty, "LSH returned no candidates — buckets too fine")
    // every LSH hit that appears in the brute-force top-50 must carry
    // the identical cosine (the rerank is exact)
    lsh.foreach { case (q, v, c) =>
      bf.get((q, v)).foreach(expected => assert(c == expected))
    }
  }

  test("LSH multiprobe radius raises recall monotonically") {
    val bf = topSets(Similarity.bruteForceTopK(spark, sf)
      .select("q_id", "rank", "vec_id").as[(Long, Long, Long)].collect())
    def recall(probeBits: Int): Double = {
      val hits = topSets(Similarity.lshTopK(spark, sf, probeBits = probeBits)
        .select("q_id", "rank", "vec_id").as[(Long, Long, Long)].collect())
      val rs = bf.keys.toSeq.map { q =>
        (bf(q) & hits.getOrElse(q, Set.empty)).size.toDouble / bf(q).size
      }
      rs.sum / rs.size
    }
    val r0 = recall(0)
    val r1 = recall(1)
    val r2 = recall(2)
    assert(r0 <= r1 + 1e-9 && r1 <= r2 + 1e-9,
      s"recall not monotone in probe radius: $r0, $r1, $r2")
    assert(r2 > r0, s"widening probes should find more: $r0 vs $r2")
  }

  test("k-means IVF: trained codebook recall meets the label-cell bound") {
    val bf = topSets(Similarity.bruteForceTopK(spark, sf)
      .select("q_id", "rank", "vec_id").as[(Long, Long, Long)].collect())
    val km = topSets(Similarity.ivfKmeansTopK(spark, sf)
      .select("q_id", "rank", "vec_id").as[(Long, Long, Long)].collect())
    assert(km.nonEmpty)
    val recalls = bf.keys.toSeq.map { q =>
      (bf(q) & km.getOrElse(q, Set.empty)).size.toDouble / bf(q).size
    }
    val mean = recalls.sum / recalls.size
    assert(mean > 0.2, s"mean k-means IVF recall@10 too low: $mean")
  }

  test("PQ: codes bounded by kSub, m codes per vector, deterministic codebooks") {
    val e = graft.Tables.load(spark, sf, "embeddings")
    def train() = Similarity.pqCodebooks(e,
      Similarity.pqInit(e, 4, 16, 16), m = 4, subLen = 16, iters = 2)
    val cb1 = train()
    val cb2 = train()
    // deterministic across runs: seeded init + Lloyd on the same data
    assert(cb1.map(t => (t._1, t._2)).toSet ==
      cb2.map(t => (t._1, t._2)).toSet)
    assert(cb1.forall { case (m, cell, cent) =>
      m >= 0 && m < 4 && cell >= 0 && cell < 16 && cent.length == 16
    })
  }

  test("PQ ADC + exact rerank: recall vs brute force meets the IVF bound") {
    // same coarse quantizer as ivfTopK (nprobe=3 of 10 label cells), so
    // PQ recall is bounded by cell recall; the ADC ordering must be
    // good enough that candK=50 reranked candidates preserve most of it
    val bf = topSets(Similarity.bruteForceTopK(spark, sf)
      .select("q_id", "rank", "vec_id").as[(Long, Long, Long)].collect())
    val pq = topSets(Similarity.pqTopK(spark, sf)
      .select("q_id", "rank", "vec_id").as[(Long, Long, Long)].collect())
    assert(pq.nonEmpty)
    val recalls = bf.keys.toSeq.map { q =>
      (bf(q) & pq.getOrElse(q, Set.empty)).size.toDouble / bf(q).size
    }
    val mean = recalls.sum / recalls.size
    info(s"PQ mean recall@10: $mean")
    assert(mean > 0.15, s"mean PQ recall@10 too low: $mean")
    // reranked hits carry exact cosines (the rerank discipline)
    val bfCos = Similarity.bruteForceTopK(spark, sf, k = 50)
      .select("q_id", "vec_id", "cosine").as[(Long, Long, Double)].collect()
      .map(t => (t._1, t._2) -> t._3).toMap
    Similarity.pqTopK(spark, sf)
      .select("q_id", "vec_id", "cosine").as[(Long, Long, Double)].collect()
      .foreach { case (q, v, c) =>
        bfCos.get((q, v)).foreach(expected => assert(c == expected))
      }
  }

  test("emb_outliers surfaces a planted off-cluster vector at rank 1") {
    // two tight clusters; one vector per label planted far off its
    // cluster's direction must be that label's worst-cosine row
    def tight(base: Array[Float], id: Long): (Long, Array[Float], Int) =
      (id, base.zipWithIndex.map { case (v, i) =>
        v + (if (i == (id % 4).toInt) 0.01f else 0f) }, if (base(0) > 0) 0 else 1)
    val a = Array(1f, 0f, 0f, 0f)
    val b = Array(-1f, 0f, 0f, 0f)
    val planted = Seq(
      (100L, Array(0f, 0f, 0f, 1f), 0), // far from cluster 0's axis
      (101L, Array(0f, 0f, 1f, 0f), 1)) // far from cluster 1's axis
    val vecs = ((0L until 20L).map(tight(a, _)) ++
      (20L until 40L).map(tight(b, _)) ++ planted)
      .toDF("vec_id", "embedding", "label")
    val worst = Similarity.outliersOver(vecs, k = 1)
      .select("label", "vec_id").as[(Int, Long)].collect().toMap
    assert(worst(0) == 100L, s"label 0 worst was ${worst(0)}")
    assert(worst(1) == 101L, s"label 1 worst was ${worst(1)}")
  }

  test("IVF top-k overlaps brute-force top-k (nprobe cells only)") {
    val bf = topSets(Similarity.bruteForceTopK(spark, sf)
      .select("q_id", "rank", "vec_id").as[(Long, Long, Long)].collect())
    val ivf = topSets(Similarity.ivfTopK(spark, sf)
      .select("q_id", "rank", "vec_id").as[(Long, Long, Long)].collect())
    assert(ivf.nonEmpty)
    // with nprobe=3 of 10 cells we expect meaningful but partial recall
    val recalls = bf.keys.toSeq.map { q =>
      val hit = ivf.getOrElse(q, Set.empty)
      (bf(q) & hit).size.toDouble / bf(q).size
    }
    val mean = recalls.sum / recalls.size
    assert(mean > 0.15, s"mean IVF recall@10 too low: $mean")
  }

  test("range search equals the brute-force threshold filter") {
    val got = graft.SparkEntry.queries("ann_range_search")(spark, sf)
      .select("q_id", "vec_id").as[(Long, Long)].collect().toSet
    // driver brute force over the raw arrays
    val vecs = graft.Tables.load(spark, sf, "embeddings")
      .select("vec_id", "embedding").as[(Long, Array[Float])].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0; var i = 0
      while (i < a.length) {
        dot += a(i).toDouble * b(i).toDouble
        na += a(i).toDouble * a(i).toDouble
        nb += b(i).toDouble * b(i).toDouble
        i += 1
      }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    val want = (for {
      (q, qe) <- vecs if q % 100 == 0
      (v, ve) <- vecs if v != q
      if cos(qe, ve) >= 0.35
    } yield (q, v)).toSet
    assert(got == want, "range-search pair set diverges from brute force")
    assert(got.nonEmpty)
  }

  test("label centroids: full pair matrix, driver-recomputed cosines") {
    val got = graft.SparkEntry.queries("emb_label_centroids")(spark, sf)
      .as[(Int, Int, Long, Long, Double)].collect()
    val vecs = graft.Tables.load(spark, sf, "embeddings")
      .select("label", "embedding").as[(Int, Array[Float])].collect()
    val labels = vecs.map(_._1).distinct.sorted
    assert(got.length == labels.length * (labels.length - 1) / 2)
    // driver centroid on the same floor-grid
    val cents = vecs.groupBy(_._1).map { case (l, vs) =>
      val d = vs.head._2.length
      val c = (0 until d).map { i =>
        val sq = vs.map(v => math.floor(v._2(i).toDouble * 1e6).toLong).sum
        math.floor(sq.toDouble / vs.length) / 1e6
      }.toArray
      l -> (vs.length.toLong, c)
    }
    def cos(a: Array[Double], b: Array[Double]): Double = {
      var dot = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) { dot += a(i) * b(i); na += a(i) * a(i); nb += b(i) * b(i) }
      dot / (math.sqrt(na) * math.sqrt(nb))
    }
    got.foreach { case (la, lb, na, nb, cc) =>
      assert(na == cents(la)._1 && nb == cents(lb)._1)
      assert(math.abs(cc - cos(cents(la)._2, cents(lb)._2)) < 1e-5,
        s"pair ($la,$lb)")
    }
    spark.catalog.clearCache()
  }

  test("recall eval reconciles with the two top-k frames it composes") {
    val rows = graft.SparkEntry.queries("ann_recall_eval")(spark, sf)
      .select("q_id", "n_bf", "n_lsh", "n_hit", "recall")
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(rows.nonEmpty)
    val bf = topSets(Similarity.bruteForceTopK(spark, sf)
      .select("q_id", "rank", "vec_id").as[(Long, Long, Long)].collect())
    val lsh = topSets(Similarity.lshTopK(spark, sf)
      .select("q_id", "rank", "vec_id").as[(Long, Long, Long)].collect())
    assert(rows.map(_._1).toSet == bf.keySet)
    rows.foreach { case (q, nBf, nLsh, nHit, recall) =>
      assert(nBf == bf(q).size)
      assert(nLsh == lsh.getOrElse(q, Set.empty).size)
      assert(nHit == (bf(q) & lsh.getOrElse(q, Set.empty)).size)
      assert(math.abs(recall - nHit.toDouble / nBf) < 6e-5)
    }
    spark.catalog.clearCache()
  }

  test("per-dimension stats cover every vector and bound the values") {
    val n = graft.Tables.load(spark, sf, "embeddings").count()
    val rows = graft.SparkEntry.queries("emb_dim_stats")(spark, sf)
      .select("dim", "n", "min_v", "max_v", "mean_v")
      .as[(Long, Long, Double, Double, Double)].collect()
    assert(rows.length == 64)
    rows.foreach { case (dim, cnt, lo, hi, mean) =>
      assert(cnt == n, s"dim $dim count")
      assert(lo <= hi)
      // floor-grid mean sits within one grid step of the true range
      assert(mean >= lo - 1e-6 && mean <= hi + 1e-6, s"dim $dim mean")
    }
  }

  test("dimension correlations match a driver-side Pearson recompute") {
    val rows = graft.SparkEntry.queries("emb_dim_corr")(spark, sf)
      .as[(Long, Long, Double)].collect()
      .map(r => (r._1, r._2) -> r._3).toMap
    assert(rows.size == 64 * 63 / 2)
    val vecs = graft.Tables.load(spark, sf, "embeddings")
      .select("embedding").as[Array[Float]].collect()
      .map(_.map(v => math.floor(v.toDouble * 1e6))) // the same grid
    val n = vecs.length.toDouble
    def corr(i: Int, j: Int): Double = {
      val (xs, ys) = (vecs.map(_(i)), vecs.map(_(j)))
      val (sx, sy) = (xs.sum, ys.sum)
      val sxx = xs.map(x => x * x).sum
      val syy = ys.map(y => y * y).sum
      val sxy = xs.zip(ys).map { case (x, y) => x * y }.sum
      (n * sxy - sx * sy) /
        (math.sqrt(n * sxx - sx * sx) * math.sqrt(n * syy - sy * sy))
    }
    for (i <- 0 until 64; j <- (i + 1) until 64 if (i + j) % 13 == 0) {
      val want = corr(i, j)
      assert(math.abs(rows((i.toLong, j.toLong)) - want) < 6e-5,
        s"corr($i,$j)")
      assert(rows((i.toLong, j.toLong)).abs <= 1.0 + 1e-9)
    }
    spark.catalog.clearCache()
  }

  test("embedding drift matches driver half-centroids; same-dist halves align") {
    val (nA, nB, cosine, meanShift, maxShift) =
      graft.SparkEntry.queries("emb_drift")(spark, sf)
        .as[(Long, Long, Double, Long, Long)].collect().head
    val vecs = graft.Tables.load(spark, sf, "embeddings")
      .selectExpr("vec_id", "embedding")
      .as[(Long, Array[Float])].collect()
    val (lo, hi) = (vecs.map(_._1).min, vecs.map(_._1).max)
    val (a, b) = vecs.partition(v => v._1 * 2 < lo + hi)
    assert(nA == a.length && nB == b.length)
    def centroid(vs: Array[(Long, Array[Float])]): Array[Long] =
      (0 until 64).map { i =>
        val s = vs.map(v => math.floor(v._2(i).toDouble * 1e6).toLong)
          .sum
        math.floor(s.toDouble / vs.length).toLong
      }.toArray
    val (ca, cb) = (centroid(a), centroid(b))
    val diffs = ca.zip(cb).map { case (x, y) => math.abs(x - y) }
    assert(meanShift == diffs.sum / 64)
    assert(maxShift == diffs.max)
    var d = 0.0; var na = 0.0; var nb = 0.0
    for (i <- 0 until 64) {
      d += ca(i).toDouble * cb(i); na += ca(i).toDouble * ca(i)
      nb += cb(i).toDouble * cb(i)
    }
    assert(math.abs(cosine - d / (math.sqrt(na) * math.sqrt(nb)))
      < 1e-4)
    // NOTE: this corpus's embeddings are near-zero-mean, so the two
    // half centroids are small noise vectors and their cosine is
    // legitimately arbitrary (measured ~0.12 at sf0.001) — the
    // magnitude columns (mean/max shift), not the angle, carry the
    // signal in that regime; the operator documents this caveat
    assert(cosine.abs <= 1.0 + 1e-9)
    assert(meanShift >= 0 && maxShift >= meanShift)
    spark.catalog.clearCache()
  }

  test("filtered search: label predicate exact, ranks match brute force") {
    val got = graft.SparkEntry.queries("ann_filtered")(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    val e = graft.Tables.load(spark, sf, "embeddings")
      .selectExpr("vec_id", "label", "embedding")
      .as[(Long, Int, Array[Float])].collect()
    val labels = e.map(r => r._1 -> r._2).toMap
    def cos(a: Array[Float], b: Array[Float]): Double = {
      var d = 0.0; var na = 0.0; var nb = 0.0
      for (i <- a.indices) {
        d += a(i).toDouble * b(i); na += a(i).toDouble * a(i)
        nb += b(i).toDouble * b(i)
      }
      d / (math.sqrt(na) * math.sqrt(nb))
    }
    val byQ = got.groupBy(_._1)
    byQ.foreach { case (q, rows) =>
      val qRow = e.find(_._1 == q).get
      // every result carries the query's label
      rows.foreach { case (_, _, v, lab, _) =>
        assert(lab == labels(q).toLong, s"query $q hit $v label")
      }
      // ranks agree with a brute force restricted to the label
      val want = e.filter(r => r._1 != q && r._2 == qRow._2)
        .map(r => (r._1, cos(qRow._3, r._3)))
        .sortBy { case (v, c) => (-c, v) }.take(5)
      assert(rows.sortBy(_._2).map(_._3).toSeq == want.map(_._1).toSeq,
        s"query $q ordering")
    }
    spark.catalog.clearCache()
  }

  test("participation ratio matches driver covariance and sits in [1, d]") {
    val (nDims, trace, frob2, pr) =
      graft.SparkEntry.queries("emb_effective_dim")(spark, sf)
        .as[(Long, Double, Double, Double)].collect().head
    assert(nDims == 64)
    val vecs = graft.Tables.load(spark, sf, "embeddings")
      .select("embedding").as[Array[Float]].collect()
      .map(_.map(v => math.floor(v.toDouble * 1e6)))
    val n = vecs.length.toDouble
    def cov(i: Int, j: Int): Double = {
      val (xs, ys) = (vecs.map(_(i)), vecs.map(_(j)))
      (n * xs.zip(ys).map { case (x, y) => x * y }.sum
        - xs.sum * ys.sum) / (n * n)
    }
    val wantTrace = (0 until 64).map(i => cov(i, i)).sum
    var wantFrob = 0.0
    for (i <- 0 until 64; j <- i until 64)
      wantFrob += (if (i == j) 1 else 2) * cov(i, j) * cov(i, j)
    assert(math.abs(trace / wantTrace - 1) < 1e-9, "trace")
    assert(math.abs(frob2 / wantFrob - 1) < 1e-9, "frob2")
    assert(math.abs(pr - trace * trace / frob2) < 1e-3)
    assert(pr >= 1.0 - 1e-9 && pr <= 64.0 + 1e-9)
    spark.catalog.clearCache()
  }

  test("hybrid RRF reconciles exactly with its two component rankings") {
    val fused = graft.SparkEntry.queries("ann_hybrid_rrf")(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    val vec = Similarity.bruteForceTopK(spark, sf, 10)
      .selectExpr("q_id", "vec_id", "rank").as[(Long, Long, Long)]
      .collect().map { case (q, v, r) => (q, v) -> r }.toMap
    val lex = Similarity.lexicalTopK(spark, sf, 10)
      .selectExpr("q_id", "doc_id", "rank").as[(Long, Long, Long)]
      .collect().map { case (q, v, r) => (q, v) -> r }.toMap
    assert(fused.nonEmpty)
    assert(fused.map(_._1).distinct.length * 10 == fused.length,
      "every query must fill its top-10")
    // exact driver-side fusion over the union of both lists
    val byQ = fused.groupBy(_._1)
    byQ.foreach { case (q, rows) =>
      val cand = (vec.keySet ++ lex.keySet).filter(_._1 == q)
      val want = cand.toSeq.map { case (_, doc) =>
        val s = vec.get((q, doc)).map(r => 1.0 / (60 + r)).getOrElse(0.0) +
          lex.get((q, doc)).map(r => 1.0 / (60 + r)).getOrElse(0.0)
        (doc, s)
      }.sortBy { case (doc, s) => (-s, doc) }.take(10)
      val got = rows.sortBy(_._2).map(r => (r._3, r._4))
      got.zip(want).foreach { case ((gd, gs), (wd, ws)) =>
        assert(gd == wd, s"query $q doc order")
        assert(math.abs(gs - ws) < 1e-6, s"query $q rrf")
      }
    }
    spark.catalog.clearCache()
  }

  test("abtt: residual geometry is exact and the projection is removed") {
    val got = graft.sim.Similarity.queries("emb_abtt")(spark, sf)
      .as[(Long, Double, Double, Double, Double)].collect()
    spark.catalog.clearCache()
    assert(got.length == 20)
    // Pythagoras on the reported (rounded) numbers: orig² ≈ proj² +
    // resid² — the correction removed exactly the projected component
    got.foreach { case (id, proj, orig, resid, ratio) =>
      assert(orig >= 0.0 && resid >= 0.0, s"$id norms")
      assert(resid <= orig + 1e-6, s"$id residual shrinks")
      assert(math.abs(orig * orig - (proj * proj + resid * resid))
        < 1e-4, s"$id pythagoras")
      val expRatio = if (orig == 0.0) 0.0 else resid / orig
      assert(math.abs(ratio - expRatio) < 1e-3, s"$id ratio")
    }
    // driver replay of the selection: centered projections on the
    // replayed top direction; the 20 reported ids must be the argmax
    // set of |projection|
    val raw = graft.Tables.load(spark, sf, "embeddings")
      .selectExpr("vec_id",
        "transform(embedding, v -> cast(floor(cast(v as double) * 1000000.0) as bigint)) as q")
      .as[(Long, Seq[Long])].collect()
    val d = raw.head._2.length
    val n = raw.length.toLong
    val sx = Array.tabulate(d)(i => raw.map(_._2(i)).sum)
    val c = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- i until d) {
      val sxy = raw.map(r => r._2(i) * r._2(j)).sum
      val v0 = n.toDouble * sxy.toDouble - sx(i).toDouble * sx(j).toDouble
      c(i)(j) = v0; c(j)(i) = v0
    }
    var v = Array.fill(d)(1.0)
    for (_ <- 1 to 3) {
      val u = Array.tabulate(d) { i =>
        var acc = 0.0
        for (j <- 0 until d) acc += c(i)(j) * v(j)
        acc
      }
      val m = u.map(math.abs).max
      v = u.map(x => math.floor(x / m * 1000000.0) / 1000000.0)
    }
    val mu = sx.map(_.toDouble / n.toDouble)
    val projs = raw.map { case (id, q) =>
      var pr = 0.0
      for (i <- 0 until d)
        pr += ((q(i).toDouble - mu(i)) / 1000000.0) * v(i)
      (id, pr)
    }
    val expectedIds = projs.sortBy(t => (-math.abs(t._2), t._1))
      .take(20).map(_._1).toSet
    assert(got.map(_._1).toSet == expectedIds, "top-|proj| selection")
  }

  test("pq distortion: bounds, coverage, and codebook-improvement sanity") {
    val got = graft.sim.Similarity.queries("emb_pq_distortion")(
        spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    spark.catalog.clearCache()
    val nVecs = graft.Tables.load(spark, sf, "embeddings").count()
    assert(got.map(_._1).toSeq == Seq(0L, 1L, 2L, 3L), "4 subspaces")
    got.foreach { case (m, n, cells, sum9, mean9) =>
      assert(n == nVecs, s"subspace $m covers every vector")
      assert(cells >= 1L && cells <= 16L, s"subspace $m cell count")
      assert(sum9 >= 0L && mean9 >= 0L, s"subspace $m error sign")
      assert(mean9 == sum9 / n, s"subspace $m mean")
      // residual subvectors are small: per-vector squared error must
      // stay below the residual-norm ballpark (sanity ceiling)
      assert(mean9 < 1000000000L, s"subspace $m error magnitude")
    }
  }

  test("cluster quality: DB index reconciles with a literal recompute") {
    val got = graft.sim.Similarity.queries("emb_cluster_quality")(
        spark, sf)
      .as[(Long, Long, Long, Double, Double)].collect()
    spark.catalog.clearCache()
    assert(got.nonEmpty && got.length <= 16)
    // membership covers the corpus exactly once
    val nVecs = graft.Tables.load(spark, sf, "embeddings").count()
    assert(got.map(_._2).sum == nVecs, "every vector in one cell")
    got.foreach { case (cell, nm, sm, dbI, dbG) =>
      assert(nm > 0L, s"cell $cell nonempty")
      assert(sm >= 0L, s"cell $cell scatter sign")
      assert(dbI >= 0.0, s"cell $cell DB_i sign")
      assert(dbG >= 0.0, "DB sign")
    }
    // the global index is the mean of the per-cluster rows (rounded)
    val meanDb = got.map(_._4).sum / got.length
    assert(math.abs(got.head._5 - meanDb) < 1e-3,
      "DB = mean of DB_i within rounding")
    // one global value across rows
    assert(got.map(_._5).distinct.length == 1)
  }

  test("hubness: k-occurrence counts replay from a driver-side kNN") {
    val got = graft.sim.Similarity.queries("emb_hubness")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Option[Double])].collect()
    spark.catalog.clearCache()
    assert(got.length == 1)
    val (panelN, k, maxNk, nHubs, nAntihubs, skew) = got.head
    assert(k == 10L)
    // driver-side exact replay on the same panel
    val panel = graft.Tables.load(spark, sf, "embeddings")
      .orderBy($"vec_id").limit(512)
      .selectExpr("vec_id", "cast(embedding as array<double>) as v")
      .as[(Long, Seq[Double])].collect().sortBy(_._1)
    assert(panelN == panel.length.toLong)
    def cos(a: Seq[Double], b: Seq[Double]): Double = {
      val dot = a.zip(b).map { case (x, y) => x * y }.foldLeft(0.0)(_ + _)
      val na = math.sqrt(a.map(x => x * x).foldLeft(0.0)(_ + _))
      val nb = math.sqrt(b.map(x => x * x).foldLeft(0.0)(_ + _))
      dot / (na * nb)
    }
    val occ = scala.collection.mutable.Map[Long, Long]()
      .withDefaultValue(0L)
    panel.foreach { case (qid, qv) =>
      panel.filter(_._1 != qid)
        .map { case (vid, vv) => (vid, cos(qv, vv)) }
        .sortBy { case (vid, c) => (-c, vid) }
        .take(10)
        .foreach { case (vid, _) => occ(vid) += 1L }
    }
    val nks = panel.map(p => occ(p._1))
    assert(maxNk == nks.max, "max_nk")
    assert(nHubs == nks.count(_ >= 20L).toLong, "n_hubs")
    assert(nAntihubs == nks.count(_ == 0L).toLong, "n_antihubs")
    assert(nks.sum == panel.length.toLong * 10L,
      "total occurrences = panel*k")
    val nd = nks.length.toDouble
    val m1 = nks.sum.toDouble / nd
    val r2 = nks.map(n => n * n).sum.toDouble / nd
    val r3 = nks.map(n => n * n * n).sum.toDouble / nd
    val m2 = r2 - m1 * m1
    val m3 = r3 - 3.0 * m1 * r2 + 2.0 * m1 * m1 * m1
    if (m2 == 0.0) assert(skew.isEmpty)
    else assert(math.abs(skew.get - m3 / (math.sqrt(m2) * m2)) < 1e-4,
      s"skew ${skew.get} vs ${m3 / (math.sqrt(m2) * m2)}")
  }
}
