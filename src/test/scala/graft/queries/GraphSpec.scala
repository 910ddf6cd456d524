package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral guards for q62_pagerank beyond the unrolled-CTE hash
  * match: rank-mass conservation (the fixpoint invariant truncation
  * can only shrink), positivity, and bipartite sanity (both customer
  * and supplier nodes surface in the top-100).
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("shortest paths match a brute-force 4-round Bellman-Ford") {
    val got = graft.SparkEntry.queries("q87_shortest_path")(spark, sf)
      .as[(Long, Long)].collect()
    assert(got.nonEmpty)
    // rebuild the weighted graph by hand
    val li = graft.Tables.load(spark, sf, "lineitem")
      .selectExpr("l_orderkey as ok", "l_partkey as pk")
      .distinct().as[(Long, Long)].collect()
    val pairs = li.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length)
        yield (ps(i), ps(j))
    }.toSeq.groupBy(identity).map { case ((a, b), o) =>
      (a, b, 1L + 1000L / o.length) }
    val adj = pairs.flatMap { case (a, b, w) =>
      Seq((a, b, w), (b, a, w)) }.toSeq
    val source = adj.map(_._1).min
    var dist = Map(source -> 0L)
    for (_ <- 1 to 4) {
      val relaxed = adj.flatMap { case (u, v, w) =>
        dist.get(u).map(du => v -> (du + w)) }
      dist = (dist.toSeq ++ relaxed).groupBy(_._1).map {
        case (n, ds) => n -> ds.map(_._2).min }
    }
    val want = dist.toSeq.map { case (n, dd) => (n, dd) }
      .sortBy(r => (r._2, r._1)).take(100)
    assert(got.toSeq == want, s"first diff: ${
      got.toSeq.zip(want).find { case (a, b) => a != b }}")
    spark.catalog.clearCache()
  }

  test("graph profile buckets tile the degree range and conserve mass") {
    val got = graft.SparkEntry.queries("q90_graph_profile")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(got.nonEmpty)
    got.foreach { case (b, n, lo, hi, sum) =>
      // bucket b holds degrees in [2^b, 2^(b+1))
      assert(lo >= (1L << b) && hi < (1L << (b + 1)))
      assert(n > 0 && sum >= n * lo && sum <= n * hi)
    }
    // Σ per-bucket node counts = |nodes|; Σ degrees = 2·|edges|
    val li = graft.Tables.load(spark, sf, "lineitem")
      .selectExpr("l_orderkey as ok", "l_partkey as pk")
      .distinct().as[(Long, Long)].collect()
    val edges = li.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length)
        yield (ps(i), ps(j))
    }.toSet
    assert(got.map(_._2).sum ==
      edges.flatMap(e => Seq(e._1, e._2)).size)
    assert(got.map(_._5).sum == 2L * edges.size)
    spark.catalog.clearCache()
  }

  test("assortativity is in [-1, 1] and matches a direct recompute") {
    val Array((n, r)) =
      graft.SparkEntry.queries("q100_assortativity")(spark, sf)
        .as[(Long, Double)].collect()
    assert(r >= -1.0 && r <= 1.0)
    val li = graft.Tables.load(spark, sf, "lineitem")
      .selectExpr("l_orderkey as ok", "l_partkey as pk")
      .distinct().as[(Long, Long)].collect()
    val edges = li.groupBy(_._1).values.flatMap { rows =>
      val ps = rows.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- i + 1 until ps.length)
        yield (ps(i), ps(j))
    }.toSet
    val sym = edges.toSeq.flatMap(e => Seq(e, e.swap))
    val deg = sym.groupBy(_._1).view.mapValues(_.size.toLong)
    assert(n == sym.size)
    val xs = sym.map(e => (deg(e._1), deg(e._2)))
    val (sx, sy) = (xs.map(_._1).sum, xs.map(_._2).sum)
    val sxy = xs.map(p => p._1 * p._2).sum
    val sxx = xs.map(p => p._1 * p._1).sum
    val syy = xs.map(p => p._2 * p._2).sum
    val want = (n.toDouble * sxy - sx.toDouble * sy) /
      math.sqrt((n.toDouble * sxx - sx.toDouble * sx) *
        (n.toDouble * syy - sy.toDouble * sy))
    assert(math.abs(r - BigDecimal(want).setScale(4,
      BigDecimal.RoundingMode.HALF_UP).toDouble) < 1e-12)
    spark.catalog.clearCache()
  }

  test("pagerank: mass conserved within truncation loss, ranks positive") {
    val top = graft.SparkEntry.queries("q62_pagerank")(spark, sf)
      .as[(String, Long)].collect()
    assert(top.nonEmpty && top.length <= 100)
    assert(top.forall(_._2 > 0), "scaled ranks must stay positive")
    // descending by rank, tie-broken by node — verify the contract
    val ranks = top.map(_._2)
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b })
    assert(top.exists(_._1.startsWith("c")) &&
      top.exists(_._1.startsWith("s")),
      "trade graph is bipartite: both node kinds should rank")
    // UNTRUNCATED mass conservation over the full rank table (the
    // registered query's top-100 is just the display cut). Every
    // integer division only SHRINKS mass, so Σr ≤ Scale exactly; the
    // loss per round is < 1 unit per `div` site — ≤ 2 units per node
    // (teleport + got) plus ≤ 1 per edge (give) — so five rounds on
    // this graph lose well under 10·(2n + E) units of 1e12.
    val full = Graph.pagerankFull(spark, sf)
      .agg(sum($"r"), count($"node")).as[(Long, Long)].collect().head
    val (total, n) = full
    val edges = spark.read
      .parquet(s"$sf/lineitem.parquet").count() * 2 // symmetrized
    val scale = 1000000000000L
    assert(total <= scale,
      s"integer truncation can only shrink mass: $total > $scale")
    assert(total >= scale - 10L * (2 * n + edges),
      s"mass $total fell past the truncation bound below $scale")
  }

  test("k-core matches an independent brute-force peel") {
    // k=65: at sf0.001 the peel is nontrivial (probe: 4 rounds, 188
    // of 200 nodes survive) — the registered k=80 peels this small
    // graph to empty, which would vacuously pass
    val got = Graph.kcoreAt(spark, sf, 65)
      .as[(Long, Long)].collect().toSeq
    spark.catalog.clearCache()
    assert(got.nonEmpty, "k=65 core should be nonempty at sf0.001")
    // driver-local reference peel — set arithmetic, not the
    // broadcast-join algorithm under test
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_orderkey".cast("long"), $"l_partkey".cast("long"))
      .distinct().as[(Long, Long)].collect()
    val edges = li.groupBy(_._1).values.flatMap { items =>
      val ps = items.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.toSet
    var adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (n, v) => n -> v.map(_._2).toSet }
    var changed = true
    while (changed) {
      val drop = adj.collect { case (n, nb) if nb.size < 65 => n }.toSet
      changed = drop.nonEmpty
      adj = (adj -- drop).map { case (n, nb) => n -> (nb -- drop) }
    }
    val expected = adj.toSeq.map { case (n, nb) => (n, nb.size.toLong) }
      .sortBy(_._1)
    assert(got == expected,
      s"k-core diverges from the reference peel: got ${got.size}, " +
        s"expected ${expected.size}")
  }

  test("triangle counts match an independent brute-force count") {
    val top = graft.SparkEntry.queries("q72_triangle_count")(spark, sf)
      .as[(Long, Long)].collect()
    assert(top.nonEmpty && top.forall(_._2 > 0))
    // independent count: adjacency sets + neighbor intersection —
    // deliberately NOT the wedge-orientation algorithm under test
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_orderkey".cast("long"), $"l_partkey".cast("long"))
      .distinct().as[(Long, Long)].collect()
    val byOrder = li.groupBy(_._1).values
    val edges = byOrder.flatMap { items =>
      val ps = items.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.toSet
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val triPerNode = scala.collection.mutable.Map[Long, Long]()
      .withDefaultValue(0L)
    for ((a, b) <- edges; c <- adj(a) intersect adj(b); if c > b)
      Seq(a, b, c).foreach(n => triPerNode(n) += 1)
    // (a,b,c with a<b<c counted once at edge (a,b) via c>b)
    val expected = triPerNode.toSeq
      .sortBy { case (n, t) => (-t, n) }.take(top.length)
    assert(top.toSeq.map(_._2) == expected.map(_._2),
      s"per-node triangle counts diverge from brute force")
    assert(top.toSeq == expected, "tie-broken ordering diverges")
  }

  test("label propagation matches a brute-force 4-round synchronous LPA") {
    val got = graft.SparkEntry.queries("q101_label_propagation")(spark, sf)
      .as[(Long, Long, Long, Long)].collect()
      .map(r => r._1 -> (r._2, r._3, r._4)).toMap
    assert(got.nonEmpty)
    val li = graft.Tables.load(spark, sf, "lineitem")
      .selectExpr("l_orderkey as ok", "l_partkey as pk")
      .distinct().as[(Long, Long)].collect()
    val edges = li.groupBy(_._1).values.flatMap { items =>
      val ps = items.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.toSet
    val neigh = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var lab: Map[Long, Long] = neigh.keys.map(n => n -> n).toMap
    for (_ <- 1 to 4) {
      lab = neigh.map { case (n, ns) =>
        val counts = ns.groupBy(lab).map { case (l, xs) => (l, xs.size) }
        // most frequent label, smallest label on ties
        n -> counts.toSeq.sortBy { case (l, c) => (-c, l) }.head._1
      }
    }
    val want = lab.groupBy(_._2).map { case (c, m) =>
      c -> (m.size.toLong, m.keys.min, m.keys.max) }
    assert(got == want, "community summary diverges from brute force")
    spark.catalog.clearCache()
  }

  test("link prediction matches brute-force capped-wedge Jaccard") {
    val got = graft.SparkEntry.queries("q108_link_prediction")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    val li = graft.Tables.load(spark, sf, "lineitem")
      .selectExpr("l_orderkey as ok", "l_partkey as pk")
      .distinct().as[(Long, Long)].collect()
    val edges = li.groupBy(_._1).values.flatMap { items =>
      val ps = items.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.toSet
    val neigh = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val cn = scala.collection.mutable.Map[(Long, Long), Long]()
      .withDefaultValue(0L)
    neigh.foreach { case (_, ns) =>
      if (ns.size <= 64) {
        val s = ns.toSeq.sorted
        for (i <- s.indices; j <- (i + 1) until s.length)
          cn((s(i), s(j))) += 1
      }
    }
    val want = cn.toSeq
      .filter { case (p, _) => !edges.contains(p) }
      .map { case ((a, b), c) =>
        val score = c.toDouble / (neigh(a).size + neigh(b).size - c)
        (a, b, c, score)
      }
      .sortBy { case (a, b, _, score) => (-score, a, b) }
      .take(got.length)
    got.zip(want).foreach { case ((a, b, c, da, db, sc), (wa, wb, wc, wsc)) =>
      assert((a, b, c) == (wa, wb, wc), s"pair ($a,$b)")
      assert(da == neigh(a).size && db == neigh(b).size)
      assert(math.abs(sc - wsc) < 6e-5, s"score ($a,$b)")
    }
    spark.catalog.clearCache()
  }

  test("clustering coefficients match a brute-force per-node recompute") {
    val got = graft.SparkEntry.queries("q109_clustering_coeff")(spark, sf)
      .as[(Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    // independent recompute: adjacency sets, tri(v) = closed wedges
    // at v / 1 (each unordered neighbor pair checked directly)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_orderkey".cast("long"), $"l_partkey".cast("long"))
      .distinct().as[(Long, Long)].collect()
    val edges = li.groupBy(_._1).values.flatMap { items =>
      val ps = items.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.toSet
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2).toSet }
    val want = adj.toSeq.collect {
      case (v, ns) if ns.size >= 2 =>
        val nsSeq = ns.toSeq.sorted
        var tri = 0L
        for (i <- nsSeq.indices; j <- (i + 1) until nsSeq.length)
          if (edges.contains((nsSeq(i), nsSeq(j)))) tri += 1
        (v, ns.size.toLong, tri,
          2.0 * tri / (ns.size.toLong * (ns.size - 1)))
    }.sortBy { case (v, _, _, c) => (-c, v) }.take(got.length)
    got.zip(want).foreach { case ((n, dg, t, c), (wn, wdg, wt, wc)) =>
      assert(n == wn && dg == wdg && t == wt, s"node $n")
      assert(math.abs(c - wc) < 1e-12, s"coeff $n")
    }
    spark.catalog.clearCache()
  }

  test("HITS matches a driver-side 3-round integer recompute") {
    val got = graft.SparkEntry.queries("q138_hits")(spark, sf)
      .as[(String, Long, String, Long)].collect()
    // sf0.001 has only 10 suppliers: each side yields min(20, |side|)
    assert(got.nonEmpty)
    val edges = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_orderkey".cast("long"), $"l_suppkey".cast("long"))
      .join(spark.read.parquet(s"$sf/orders.parquet")
        .select($"o_orderkey".cast("long"), $"o_custkey".cast("long")),
        $"l_orderkey" === $"o_orderkey")
      .select($"o_custkey", $"l_suppkey").as[(Long, Long)].collect()
    val s0 = 1000000000000L
    val hubsSet = edges.map(_._1).distinct
    var h = hubsSet.map(_ -> s0 / hubsSet.length).toMap
    var a = Map.empty[Long, Long]
    for (_ <- 1 to 3) {
      val ra = edges.groupBy(_._2).map { case (p, es) =>
        p -> es.map(e => h(e._1)).sum }
      val qa = ra.values.sum / s0
      a = ra.map { case (p, v) => p -> v / qa }
      val rh = edges.groupBy(_._1).map { case (c, es) =>
        c -> es.map(e => a(e._2)).sum }
      val qh = rh.values.sum / s0
      h = rh.map { case (c, v) => c -> v / qh }
    }
    def top(m: Map[Long, Long], pre: String) = m.toSeq
      .map { case (n, sc) => (pre + n, sc) }
      .sortBy { case (n, sc) => (-sc, n) }.take(20)
    val wantA = top(a, "s"); val wantH = top(h, "c")
    val gotA = got.filter(_._1 == "auth").sortBy(_._2)
      .map(r => (r._3, r._4)).toSeq
    val gotH = got.filter(_._1 == "hub").sortBy(_._2)
      .map(r => (r._3, r._4)).toSeq
    assert(gotA == wantA, "authority ranking diverges")
    assert(gotH == wantH, "hub ranking diverges")
    spark.catalog.clearCache()
  }

  test("avg neighbor degree matches a brute-force recompute per bucket") {
    val got = graft.SparkEntry.queries("q131_avg_neighbor_degree")(
      spark, sf).as[(Long, Long, Long, Long, Double)].collect()
      .map(r => r._1 -> r).toMap
    assert(got.nonEmpty)
    val li = spark.read.parquet(s"$sf/lineitem.parquet")
      .select($"l_orderkey".cast("long"), $"l_partkey".cast("long"))
      .distinct().as[(Long, Long)].collect()
    val edges = li.groupBy(_._1).values.flatMap { items =>
      val ps = items.map(_._2).distinct.sorted
      for (i <- ps.indices; j <- (i + 1) until ps.length)
        yield (ps(i), ps(j))
    }.toSet
    val adj = edges.toSeq.flatMap { case (a, b) => Seq(a -> b, b -> a) }
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    val deg = adj.map { case (k, v) => k -> v.length.toLong }
    def bucket(d: Long) = 63 - java.lang.Long.numberOfLeadingZeros(d)
    val byBucket = adj.toSeq.groupBy { case (n, _) => bucket(deg(n)) }
    assert(got.keySet == byBucket.keySet.map(_.toLong))
    byBucket.foreach { case (b, nodes) =>
      val endpoints = nodes.map(_._2.length.toLong).sum
      val mass = nodes.flatMap(_._2).map(deg).sum
      val (_, nN, nE, m, avg) = got(b.toLong)
      assert(nN == nodes.length && nE == endpoints && m == mass, s"b$b")
      assert(math.abs(avg - mass.toDouble / endpoints) < 1e-3)
    }
    spark.catalog.clearCache()
  }
}
