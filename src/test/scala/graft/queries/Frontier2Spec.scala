package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral specs for the batch-8 frontier operators — independent
  * driver-side re-derivations at sf0.001 (the FrontierSpec pattern),
  * on top of the DuckDB hash gate.
  */
class Frontier2Spec extends SparkSpec {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("funnel latency percentiles are exact order statistics") {
    val got = Frontier2.queries("q155_funnel_latency")(spark, sf)
      .as[(String, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    val ev = graft.Tables.load(spark, sf, "events")
      .filter($"event_type".isin("view", "purchase"))
      .select($"user_id", $"event_type", unix_micros($"ts").as("t"))
      .as[(Long, String, Long)].collect()
    val byUser = ev.groupBy(_._1)
    val convs = byUser.toSeq.flatMap { case (_, rows) =>
      val views = rows.filter(_._2 == "view").map(_._3)
      if (views.isEmpty) None
      else {
        val fv = views.min
        val ps = rows.filter(r => r._2 == "purchase" && r._3 > fv)
          .map(_._3)
        if (ps.isEmpty) None else Some((fv, ps.min))
      }
    }
    val weekFmt = java.time.format.DateTimeFormatter
      .ofPattern("yyyy-MM-dd")
    val byWeek = convs.groupBy { case (_, fp) =>
      val d = java.time.Instant.ofEpochSecond(fp / 1000000L)
        .atZone(java.time.ZoneOffset.UTC).toLocalDate
      d.minusDays((d.getDayOfWeek.getValue - 1).toLong).format(weekFmt)
    }
    assert(got.keySet == byWeek.keySet)
    byWeek.foreach { case (wk, cs) =>
      val lats = cs.map { case (fv, fp) =>
        Math.floorDiv(fp - fv, 1000000L) }.sorted
      val n = lats.length
      val (_, gn, p50, p90) = got(wk)
      assert(gn == n.toLong, s"$wk n")
      // ops.Quantiles' discrete rank: 0-indexed floor(p·(n−1))
      assert(p50 == lats(math.floor(0.5 * (n - 1)).toInt), s"$wk p50")
      assert(p90 == lats(math.floor(0.9 * (n - 1)).toInt), s"$wk p90")
    }
    spark.catalog.clearCache() // PrefixSum persists inside Quantiles
  }

  test("hill gamma matches a direct top-k recomputation") {
    val got = Frontier2.queries("q156_hill_tail")(spark, sf)
      .as[(String, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val orders = graft.Tables.load(spark, sf, "orders")
      .select($"o_orderpriority", $"o_orderkey",
        round($"o_totalprice" * 100).cast("long").as("cents"))
      .as[(String, Long, Long)].collect()
    orders.groupBy(_._1).foreach { case (prio, rows) =>
      val sorted = rows.sortBy(r => (-r._3, r._2)).take(65)
      if (sorted.length == 65) {
        val xk1 = sorted.map(_._3).min
        val xs = sorted.take(64).map(_._3).sorted
        var acc = 0.0
        xs.foreach { x =>
          acc = acc + (math.log(x.toDouble) - math.log(xk1.toDouble)) }
        val gamma = BigDecimal(acc / 64)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        val (_, k, gXk1, gGamma) = got(prio)
        assert(k == 64L && gXk1 == xk1, s"$prio selection")
        assert(math.abs(gGamma - gamma) < 1e-9, s"$prio gamma")
        assert(gGamma >= 0.0, s"$prio gamma sign")
      } else assert(!got.contains(prio), s"$prio without 65 orders")
    }
  }

  test("rolling corr windows are exact 7-day Pearson") {
    val rows = Frontier2.queries("q157_rolling_corr")(spark, sf)
      .as[(String, String, String, Option[Double])].collect()
    assert(rows.nonEmpty)
    val daily = graft.Tables.load(spark, sf, "events")
      .select($"event_type", to_date($"ts").cast("string").as("day"),
        round($"value" * 100).cast("long").as("c"))
      .groupBy($"event_type", $"day").agg(sum($"c").as("v"))
      .as[(String, String, Long)].collect()
    val d0 = daily.map(_._2).min
    val d1 = daily.map(_._2).max
    val types = daily.map(_._1).distinct.sorted
    val span = {
      val s = java.time.LocalDate.parse(d0)
      val e = java.time.LocalDate.parse(d1)
      Iterator.iterate(s)(_.plusDays(1)).takeWhile(!_.isAfter(e)).toSeq
    }
    val vmap = daily.map(r => (r._1, r._2) -> r._3).toMap
    def series(t: String): Seq[Long] =
      span.map(day => vmap.getOrElse((t, day.toString), 0L))
    // every emitted window re-checked against the direct formula
    rows.foreach { case (ta, tb, day, corr) =>
      val di = java.time.temporal.ChronoUnit.DAYS.between(
        java.time.LocalDate.parse(d0), java.time.LocalDate.parse(day))
        .toInt
      assert(di >= 6, "full windows only")
      val xs = series(ta).slice(di - 6, di + 1)
      val ys = series(tb).slice(di - 6, di + 1)
      val n = 7L
      val sx = xs.sum; val sy = ys.sum
      val sxy = xs.zip(ys).map { case (a, b) => a * b }.sum
      val sxx = xs.map(a => a * a).sum
      val syy = ys.map(a => a * a).sum
      val dx = n * sxx - sx * sx; val dy = n * syy - sy * sy
      if (dx == 0L || dy == 0L) assert(corr.isEmpty, s"$ta/$tb $day")
      else {
        val c = (n * sxy - sx * sy).toDouble /
          math.sqrt(dx.toDouble * dy.toDouble)
        val r = BigDecimal(c)
          .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
        assert(math.abs(corr.get - r) < 1e-9, s"$ta/$tb $day")
        assert(corr.get >= -1.0 && corr.get <= 1.0)
      }
    }
    // and the expected coverage: all pairs, all full-window days
    val expected = (for {
      i <- types.indices; j <- (i + 1) until types.length
      di <- 6 until span.length
    } yield (types(i), types(j), span(di).toString)).toSet
    assert(rows.map(r => (r._1, r._2, r._3)).toSet == expected)
  }

  test("modularity: exact Q from an independent LPA replay") {
    val got = Frontier2.queries("q158_modularity")(spark, sf)
      .as[(Long, Long, Long, Long, Double, Double)].collect()
    val edges = Graph.coOccurrencePairCounts(spark, sf)
      .select($"a", $"b").as[(Long, Long)].collect()
    val sym = edges.flatMap { case (a, b) => Seq(a -> b, b -> a) }
    val adj = sym.groupBy(_._1).map { case (k, v) =>
      k -> v.map(_._2) }
    var lab = adj.keys.map(n => n -> n).toMap
    for (_ <- 1 to 4) {
      lab = adj.map { case (node, nbrs) =>
        val counts = nbrs.groupBy(lab).map { case (l, xs) =>
          l -> xs.length }
        node -> counts.toSeq.minBy { case (l, c) => (-c, l) }._1
      }
    }
    val m = edges.length.toLong
    val deg = sym.groupBy(_._1).map { case (k, v) =>
      k -> v.length.toLong }
    val byComm = lab.groupBy(_._2)
    val expected = byComm.map { case (c, members) =>
      val dc = members.keys.toSeq.map(deg).sum
      val ec = edges.count { case (a, b) =>
        lab(a) == c && lab(b) == c }.toLong
      c -> (members.size.toLong, ec, dc, 4L * m * ec - dc * dc)
    }
    val totNum = expected.values.map(_._4).sum
    assert(got.map(_._1).toSet == expected.keySet)
    got.foreach { case (c, nm, ie, ds, qc, gq) =>
      val (en, ee, ed, enum2) = expected(c)
      assert((nm, ie, ds) == ((en, ee, ed)), s"community $c counts")
      val qcExp = BigDecimal(enum2.toDouble / (4.0 * m * m))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(qc - qcExp) < 1e-9, s"community $c contrib")
      val gqExp = BigDecimal(totNum.toDouble / (4.0 * m * m))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
      assert(math.abs(gq - gqExp) < 1e-9, "global Q")
      assert(gq >= -0.5 && gq <= 1.0, "Q in range")
    }
    // release q158's persisted graph frames (e/sym/labels) so suite
    // memory stays bounded and later tests are order-independent
    spark.catalog.clearCache()
  }

  test("pc2: exact deflated power-iteration re-derivation") {
    val got = Frontier2.queries("emb_pc2")(spark, sf)
      .as[(Long, Double, Double, Double)].collect().sortBy(_._1)
    // independent driver-side replay of the full algorithm from the
    // raw embeddings (quantize → moments → C → rounds → deflate →
    // rounds), asserting bit-level determinism of the op's pipeline
    val embs = graft.Tables.load(spark, sf, "embeddings")
      .select($"embedding").as[Array[Float]].collect()
      .map(_.map(v => math.floor(v.toDouble * 1000000.0).toLong))
    val d64 = embs.head.length
    val n = embs.length.toLong
    val sx = Array.tabulate(d64)(i => embs.map(_(i)).sum)
    val c = Array.tabulate(d64, d64) { (i, j) =>
      val sxy = embs.map(e => e(i) * e(j)).sum
      n.toDouble * sxy.toDouble - sx(i).toDouble * sx(j).toDouble
    }
    def matvec(m: Array[Array[Double]], v: Array[Double]) =
      Array.tabulate(d64) { i =>
        var acc = 0.0
        var j = 0
        while (j < d64) { acc += m(i)(j) * v(j); j += 1 }
        acc
      }
    def rounds(m: Array[Array[Double]]): (Array[Double], Double) = {
      var v = Array.fill(d64)(1.0)
      for (_ <- 1 to 3) {
        val u = matvec(m, v)
        val mx = u.map(math.abs).max
        v = u.map(x => math.floor(x / mx * 1000000.0) / 1000000.0)
      }
      val u = matvec(m, v)
      var num = 0.0; var den = 0.0
      for (i <- 0 until d64) { num += v(i) * u(i); den += v(i) * v(i) }
      (v, num / den)
    }
    val (v1, eig1) = rounds(c)
    var vv = 0.0
    v1.foreach(x => vv += x * x)
    val c2 = Array.tabulate(d64, d64) { (i, j) =>
      c(i)(j) - eig1 * v1(i) * v1(j) / vv
    }
    val (v2, eig2) = rounds(c2)
    assert(got.length == d64)
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    got.foreach { case (pos, l2, e2, e1) =>
      assert(math.abs(l2 - r6(v2(pos.toInt))) < 1e-9, s"loading $pos")
      assert(math.abs(e2 - r4(eig2 / 1.0e12)) < 1e-9, "eig2")
      assert(math.abs(e1 - r4(eig1 / 1.0e12)) < 1e-9, "eig1")
    }
    assert(got.head._4 >= got.head._3, "dominant eigenvalue first")
    assert(got.head._3 >= 0.0, "covariance is PSD")
    spark.catalog.clearCache()
  }

  test("zipf rank score: exact mean ln rank on a doc sample") {
    val got = Frontier2.queries("text_zipf_rank_score")(spark, sf)
      .as[(Long, String, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    val toks = graft.Tables.load(spark, sf, "documents")
      .select($"doc_id", split(lower($"text"), "\\s+").as("t"))
      .as[(Long, Array[String])].collect()
    val vocab = toks.flatMap(_._2).groupBy(identity)
      .map { case (t, xs) => t -> xs.length }
    val rank = vocab.toSeq.sortBy { case (t, c) => (-c, t) }
      .zipWithIndex.map { case ((t, _), i) => t -> (i + 1).toLong }
      .toMap
    toks.take(50).foreach { case (id, ts) =>
      val rs = ts.map(rank).sorted
      var acc = 0.0
      rs.foreach(r => acc = acc + math.log(r.toDouble))
      val exp = BigDecimal(acc / rs.length)
        .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
      val (_, _, n, mlr) = got(id)
      assert(n == rs.length.toLong, s"doc $id token count")
      assert(math.abs(mlr - exp) < 1e-9, s"doc $id mean ln rank")
    }
    spark.catalog.clearCache() // PrefixSum persists its sorted frame
  }

  test("aspect buckets: nearest-bucket argmin and share conservation") {
    val got = Frontier2.queries("mm_aspect_buckets")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
    val buckets = Seq(500L, 666L, 750L, 1000L, 1333L, 1500L, 2000L)
    // octet_length: the decode kernel measures UTF-8 payload BYTES
    val docs = graft.Tables.load(spark, sf, "documents")
      .join(graft.Tables.load(spark, sf, "embeddings"),
        $"doc_id" === $"vec_id")
      .select(octet_length($"text").cast("long")).as[Long].collect()
    val expected = docs.map { n =>
      val w = 64L + n % 512L; val h = 64L + (n * 7L) % 512L
      val am = w * 1000L / h
      val bm = buckets.minBy(b => (math.abs(am - b), b))
      (bm, 1000L - math.min(am, bm) * 1000L / math.max(am, bm))
    }.groupBy(_._1).map { case (bm, xs) =>
      bm -> (xs.length.toLong, xs.map(_._2).sum / xs.length) }
    assert(got.map(_._1).toSet == expected.keySet)
    val total = expected.values.map(_._1).sum
    got.foreach { case (bm, n, share, waste) =>
      val (en, ew) = expected(bm)
      assert(n == en, s"bucket $bm count")
      assert(waste == ew, s"bucket $bm waste")
      assert(share == n * 1000L / total, s"bucket $bm share")
    }
  }

  test("epoch order: 3 distinct permutations of the same doc set") {
    val got = Frontier2.queries("pipeline_epoch_order")(spark, sf)
      .as[(Int, Long, Long, Long)].collect()
    spark.catalog.clearCache() // PrefixSum persists its sorted frame
    val docIds = graft.Tables.load(spark, sf, "documents")
      .select($"doc_id").as[Long].collect()
    assert(got.map(_._1).distinct.sorted.toSeq == Seq(1, 2, 3))
    // each epoch partitions the full doc set across its shards
    got.groupBy(_._1).foreach { case (e, rows) =>
      assert(rows.map(_._3).sum == docIds.length.toLong,
        s"epoch $e covers all docs")
      assert(rows.map(_._2).toSet.subsetOf(Set(0L, 1L, 2L, 3L)))
    }
    // permutations are genuinely different: no order fingerprint
    // repeats across epochs (shard membership reshuffles too)
    val fps = got.map(_._4)
    assert(fps.distinct.length == fps.length, "distinct fingerprints")
    // driver-side replay of the full fingerprint arithmetic: md5
    // shuffle key -> nibble shard -> within-shard rank -> 48-bit
    // md5(rank:doc) prefix xor — proves the distributed PrefixSum
    // rank matches a literal sort
    def md5hex(s: String): String = java.security.MessageDigest
      .getInstance("MD5").digest(s.getBytes("UTF-8"))
      .map("%02x".format(_)).mkString
    val expected = (for {
      e <- 1 to 3; id <- docIds
      key = md5hex(s"epoch$e:$id")
    } yield (e, java.lang.Long.parseLong(key.take(1), 16) % 4, key, id))
      .groupBy(t => (t._1, t._2))
      .map { case ((e, sh), rows) =>
        val fp = rows.sortBy(t => (t._3, t._4)).zipWithIndex
          .map { case ((_, _, _, id), i) =>
            java.lang.Long.parseLong(
              md5hex(s"${i + 1}:$id").take(12), 16) }
          .foldLeft(0L)(_ ^ _)
        (e, sh) -> (rows.length.toLong, fp)
      }
    got.foreach { case (e, sh, n, fp) =>
      val (en, efp) = expected((e, sh))
      assert(n == en, s"epoch $e shard $sh count")
      assert(fp == efp, s"epoch $e shard $sh fingerprint")
    }
  }
}
