package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral specs for the round-10 frontier operators — each
  * re-derives the operator's defining property with an independent
  * driver-side computation at sf0.001 (the house InsightsSpec
  * pattern), on top of the DuckDB hash gate the driver runs.
  */
class FrontierSpec extends SparkSpec {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("changepoint maximizes the exact CUSUM statistic, tie-earliest") {
    val got = Frontier.queries("q140_changepoint")(spark, sf)
      .select($"event_type", $"cp_day", $"s_abs")
      .as[(String, String, Long)].collect().map(r => r._1 -> r).toMap
    val daily = graft.Tables.load(spark, sf, "events")
      .select($"event_type", to_date($"ts").as("day"),
        round($"value" * 100).cast("long").as("c"))
      .groupBy($"event_type", $"day").agg(sum($"c").as("v"))
      .as[(String, java.sql.Date, Long)].collect()
      .groupBy(_._1)
    daily.foreach { case (et, rows) =>
      val vs = rows.sortBy(_._2.toString).map(_._3)
      val n = vs.length
      if (n >= 2) {
        val tot = vs.sum
        var cum = 0L
        val cands = (1 until n).map { t =>
          cum += vs(t - 1)
          (t, math.abs(n * cum - t * tot))
        }
        val best = cands.maxBy { case (t, s) => (s, -t) }
        val (_, gotDay, gotS) = got(et)
        assert(gotS == best._2, s"$et: s_abs ${gotS} vs ${best._2}")
        assert(gotDay == rows.sortBy(_._2.toString)
          .map(_._2.toString).apply(best._1 - 1),
          s"$et: cp day")
      }
    }
    spark.catalog.clearCache()
  }

  test("theil-sen slope is the lower median of all pairwise slopes") {
    val got = Frontier.queries("q141_theil_sen")(spark, sf)
      .as[(String, Long, Double)].collect().map(r => r._1 -> r).toMap
    val daily = graft.Tables.load(spark, sf, "events")
      .select($"event_type", to_date($"ts").as("day"),
        round($"value" * 100).cast("long").as("c"))
      .groupBy($"event_type", $"day").agg(sum($"c").as("v"))
      .as[(String, java.sql.Date, Long)].collect()
      .groupBy(_._1)
    daily.foreach { case (et, rows) =>
      val sorted = rows.sortBy(_._2.toString)
      val slopes = (for {
        i <- sorted.indices; j <- (i + 1) until sorted.size
      } yield {
        val days = java.time.temporal.ChronoUnit.DAYS.between(
          sorted(i)._2.toLocalDate, sorted(j)._2.toLocalDate)
        (sorted(j)._3 - sorted(i)._3).toDouble / days.toDouble
      }).sorted
      if (slopes.nonEmpty) {
        val med = slopes((slopes.size + 1) / 2 - 1)
        val (_, np, slope) = got(et)
        assert(np == slopes.size)
        assert(math.abs(slope - med) < 5e-5,
          s"$et: $slope vs $med")
      }
    }
    spark.catalog.clearCache()
  }

  test("bootstrap CI brackets the point estimate and is deterministic") {
    val q = Frontier.queries("q142_bootstrap_ci")
    val r1 = q(spark, sf).as[(Long, Long, Double, Double, Double)]
      .collect().head
    val r2 = q(spark, sf).as[(Long, Long, Double, Double, Double)]
      .collect().head
    assert(r1 == r2, "deterministic md5 draws must replay exactly")
    val (nReps, _, mean, lo, hi) = r1
    assert(nReps == 100L)
    assert(lo <= hi, s"ci order: $lo > $hi")
    // Poisson bootstrap means concentrate around the point estimate;
    // the CI must bracket it at this fixture
    assert(lo <= mean && mean <= hi, s"$lo <= $mean <= $hi")
    spark.catalog.clearCache()
  }

  test("asof nearest picks the closer view, earlier on exact ties") {
    val got = Frontier.queries("q145_asof_nearest")(spark, sf)
      .as[(Long, Long, Long, Long, Long, String)].collect()
    assert(got.nonEmpty)
    val ev = graft.Tables.load(spark, sf, "events")
      .filter($"event_type".isin("purchase", "view"))
      .select($"event_id", $"user_id", $"event_type",
        unix_micros($"ts").as("t"))
      .as[(Long, Long, String, Long)].collect()
    val viewsByUser = ev.filter(_._3 == "view").groupBy(_._2)
    got.foreach { case (eid, uid, pt, vt, diff, side) =>
      val views = viewsByUser(uid).map(_._4)
      val best = views.minBy(v => (math.abs(v - pt), v))
      assert(vt == best, s"purchase $eid: $vt vs $best")
      assert(diff == vt - pt)
      assert(side == (if (vt <= pt) "before" else "after"))
    }
    spark.catalog.clearCache()
  }

  test("retention triangle: offset-0 is the full cohort, rates <= 1000") {
    val rows = Frontier.queries("q146_retention_triangle")(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.filter(_._2 == 0L).foreach { case (_, _, na, cn, rm) =>
      assert(na == cn && rm == 1000L, "offset 0 must be 100%")
    }
    rows.foreach { case (cm, off, na, cn, rm) =>
      assert(na <= cn, s"$cm+$off: active beyond cohort")
      assert(rm == na * 1000 / cn)
    }
    // customers conserve: sum of offset-0 cohort sizes == n customers
    val nCust = graft.Tables.load(spark, sf, "orders")
      .select($"o_custkey").distinct().count()
    assert(rows.filter(_._2 == 0L).map(_._4).sum == nCust)
    spark.catalog.clearCache()
  }

  test("2-hop reach is at least the node's capped 1-hop degree") {
    val got = Frontier.queries("q143_2hop_reach")(spark, sf)
      .as[(Long, Long, Long)].collect()
    assert(got.nonEmpty && got.map(_._1).toSeq == (1L to got.length))
    val deg = Graph.coOccurrencePairCounts(spark, sf)
      .select($"a", $"b").as[(Long, Long)].collect()
      .flatMap(p => Seq(p._1 -> p._2, p._2 -> p._1))
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).toSet }
    got.foreach { case (_, node, reach) =>
      assert(reach >= deg(node).size,
        s"node $node: 2-hop reach below 1-hop degree")
    }
    spark.catalog.clearCache()
  }

  test("adamic-adar pairs are non-edges with exact rare-neighbor weights") {
    val got = Frontier.queries("q144_adamic_adar")(spark, sf)
      .as[(Long, Long, Long, Long, Double)].collect()
    assert(got.nonEmpty)
    val edges = Graph.coOccurrencePairCounts(spark, sf)
      .select($"a", $"b").as[(Long, Long)].collect().toSet
    val nbrs = edges.toSeq
      .flatMap(p => Seq(p._1 -> p._2, p._2 -> p._1))
      .groupBy(_._1).map { case (v, xs) => v -> xs.map(_._2).toSet }
    got.foreach { case (a, b, cn, aaMicro, score) =>
      assert(!edges.contains((a, b)), s"($a,$b) is an existing edge")
      val common = (nbrs(a) & nbrs(b)).filter { z =>
        val dz = nbrs(z).size; dz >= 2 && dz <= 64
      }
      assert(cn == common.size, s"($a,$b): cn")
      val want = common.toSeq.map(z =>
        math.floor(1000000.0 / math.log(nbrs(z).size.toDouble)).toLong)
        .sum
      assert(aaMicro == want, s"($a,$b): $aaMicro vs $want")
      assert(math.abs(score - aaMicro / 1e6) < 1e-3)
    }
    spark.catalog.clearCache()
  }

  test("recall curve is consistent and hits are bounded by n_queries*k") {
    val got = graft.sim.Similarity.queries("ann_recall_curve")(spark, sf)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(got.map(_._1).toSeq == Seq(1L, 5L, 10L, 20L))
    got.foreach { case (k, nq, hits, milli) =>
      assert(hits <= nq * k)
      assert(milli == hits * 1000 / (nq * k))
    }
    spark.catalog.clearCache()
  }

  test("power iteration: Rayleigh quotient dominates every axis direction") {
    val rows = graft.sim.Similarity.queries("emb_power_iteration")(
      spark, sf).as[(Long, Double, Double)].collect().sortBy(_._1)
    assert(rows.length == 64)
    val eig = rows.head._3
    assert(rows.forall(_._3 == eig), "eigval column must be constant")
    // the dominant eigenvalue bounds every diagonal entry of C:
    // λ₁ ≥ max_i C_ii / (scale) — recompute the diagonal exactly
    val q = graft.Tables.load(spark, sf, "embeddings")
      .select(expr("transform(embedding, v -> " +
        "CAST(floor(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT))").as("q"))
    val dims = q.select(posexplode($"q").as(Seq("i", "x")))
      .groupBy($"i")
      .agg(count(lit(1)).as("n"), sum($"x").as("sx"),
        sum($"x" * $"x").as("sxx"))
      .as[(Int, Long, Long, Long)].collect()
    val maxDiag = dims.map { case (_, n, sx, sxx) =>
      n.toDouble * sxx.toDouble - sx.toDouble * sx.toDouble
    }.max / 1.0e12
    assert(eig >= maxDiag - 1e-2,
      s"rayleigh $eig below max diagonal $maxDiag")
    spark.catalog.clearCache()
  }

  test("contamination: flagged docs share a 13-gram with the eval slice") {
    val got = Frontier.queries("pipeline_contamination_ngram")(
      spark, "/root/testdata/sf0.01")
      .as[(Long, Long, Long)].collect()
    // every flagged doc is a TRAIN doc with positive hits <= grams
    got.foreach { case (id, ng, nh) =>
      assert(id % 50 != 0 && nh > 0 && nh <= ng)
    }
    // brute-force witness: re-derive 13-gram string sets for flagged
    // docs and at least one eval doc must share one
    if (got.nonEmpty) {
      val texts = graft.Tables.load(spark, "/root/testdata/sf0.01",
        "documents").select($"doc_id", lower($"text"))
        .as[(Long, String)].collect().toMap
      def grams(t: String): Set[Seq[String]] = {
        val toks = t.split("\\s+").toSeq
        if (toks.size < 13) Set.empty
        else toks.sliding(13).map(_.toSeq).toSet
      }
      val evalGrams = texts.filter(_._1 % 50 == 0).values
        .flatMap(grams).toSet
      got.foreach { case (id, _, _) =>
        assert(grams(texts(id)).exists(evalGrams.contains),
          s"doc $id flagged but shares no literal 13-gram")
      }
    }
    spark.catalog.clearCache()
  }

  test("isotropy probe bounds: |mean| <= mean_abs <= max_abs <= 1") {
    val r = Frontier.queries("emb_isotropy")(spark, sf)
      .as[(Long, Double, Double, Double)].collect().head
    val (n, mean, meanAbs, maxAbs) = r
    assert(n > 0)
    assert(math.abs(mean) <= meanAbs + 1e-9)
    assert(meanAbs <= maxAbs + 1e-9)
    assert(maxAbs <= 1.0 + 1e-9)
    spark.catalog.clearCache()
  }

  test("mixture grid: tau=0 is uniform, tau=1 proportional, rows normalize") {
    val rows = Frontier.queries("pipeline_mixture_grid")(spark, sf)
      .as[(Long, String, Long, Double, Double)].collect()
    val byTau = rows.groupBy(_._1)
    assert(byTau.keySet == Set(0L, 300L, 500L, 700L, 1000L))
    byTau.foreach { case (tau, rs) =>
      val wsum = rs.map(_._5).sum
      assert(math.abs(wsum - 1.0) < 1e-4, s"tau $tau: sum $wsum")
      if (tau == 0L) {
        val u = 1.0 / rs.size
        rs.foreach(r => assert(math.abs(r._5 - u) < 1e-4))
      }
      if (tau == 1000L)
        rs.foreach(r => assert(math.abs(r._5 - r._4) < 1e-4,
          "tau=1 must reproduce the raw proportions"))
    }
    spark.catalog.clearCache()
  }

  test("running topk: leaderboard is cumulative and rank-consistent") {
    val rows = Frontier.queries("q147_running_topk")(spark, sf)
      .as[(String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val byMonth = rows.groupBy(_._1)
    byMonth.foreach { case (m, rs) =>
      val sorted = rs.sortBy(_._2)
      assert(sorted.map(_._2).toSeq == (1L to sorted.size),
        s"$m: ranks not dense")
      // rank order matches cumulative revenue order (ties by partkey)
      val pairs = sorted.map(r => (-r._4, r._3))
      assert(pairs.toSeq == pairs.sorted.toSeq, s"$m: rank order")
    }
    // a part's cumulative value never decreases across months it leads
    rows.groupBy(_._3).foreach { case (pk, rs) =>
      val ordered = rs.sortBy(_._1).map(_._4)
      assert(ordered.toSeq == ordered.sorted.toSeq,
        s"part $pk: cumulative revenue decreased")
    }
    spark.catalog.clearCache()
  }

  test("schema drift: TVD bounds and exact recomputation for one column") {
    val rows = Frontier.queries("q148_schema_drift")(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.length == 3)
    rows.foreach { case (c, n1, n2, nc, tvd) =>
      assert(n1 > 0 && n2 > 0 && nc > 0)
      assert(tvd >= 0 && tvd <= 1000, s"$c: tvd $tvd out of [0,1000]")
    }
    // recompute o_orderstatus TVD by hand
    val o = graft.Tables.load(spark, sf, "orders")
      .select(unix_micros($"o_orderdate").as("t"), $"o_orderstatus")
      .as[(Long, String)].collect()
    val mid = (o.map(_._1).min + o.map(_._1).max) / 2
    val h1 = o.filter(_._1 < mid).groupBy(_._2).view
      .mapValues(_.length.toLong).toMap
    val h2 = o.filter(_._1 >= mid).groupBy(_._2).view
      .mapValues(_.length.toLong).toMap
    val n1 = h1.values.sum; val n2 = h2.values.sum
    val cats = h1.keySet ++ h2.keySet
    val num = cats.toSeq.map(c =>
      math.abs(h1.getOrElse(c, 0L) * n2 - h2.getOrElse(c, 0L) * n1))
      .sum
    val want = num * 1000 / (2 * n1 * n2)
    val got = rows.find(_._1 == "o_orderstatus").get
    assert(got._5 == want, s"tvd ${got._5} vs $want")
    spark.catalog.clearCache()
  }

  test("readability: planted simple vs complex text orders correctly") {
    // pin the extractor's milli formula on planted rows
    def flesch(text: String): Long = {
      val w = text.toLowerCase.split("\\s+").count(_.nonEmpty)
      val sent = math.max(text.count(c => ".!?".contains(c)), 1)
      val syl = "[aeiou]+".r.findAllIn(text.toLowerCase).length
      math.floor((206.835 - 1.015 * (w.toDouble / sent) -
        84.6 * (syl.toDouble / w)) * 1000).toLong
    }
    val simple = "The cat sat. The dog ran. It was fun."
    val complex = "Notwithstanding administrative irregularities, " +
      "comprehensive organizational restructuring necessitates " +
      "extraordinary interdepartmental cooperation."
    assert(flesch(simple) > flesch(complex),
      "simple prose must score higher than bureaucratic prose")
    // and the registered query emits one sane row per language
    val rows = Frontier.queries("text_readability")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (_, nd, w, s2, syl, _) =>
      assert(nd > 0 && w > 0 && s2 > 0 && syl > 0)
    }
    spark.catalog.clearCache()
  }

  test("weighted sample: deterministic, 50 rows, keys sorted, length bias") {
    val q = Frontier.queries("pipeline_weighted_sample")
    val r1 = q(spark, sf).as[(Long, Long, Long, Double)].collect()
    val r2 = q(spark, sf).as[(Long, Long, Long, Double)].collect()
    assert(r1.toSeq == r2.toSeq, "A-Res keys must replay exactly")
    assert(r1.length == 50)
    assert(r1.map(_._4).toSeq == r1.map(_._4).sorted.reverse.toSeq)
    // length bias: sampled docs skew longer than the corpus mean
    val corpusMean = graft.Tables.load(spark, sf, "documents")
      .agg(avg($"n_chars")).head.getDouble(0)
    val sampleMean = r1.map(_._3).sum.toDouble / r1.length
    assert(sampleMean > corpusMean * 0.9,
      s"weighted sample mean $sampleMean vs corpus $corpusMean")
    spark.catalog.clearCache()
  }

  test("dataset diff reconciles with the cdc derivation rules") {
    val rows = Frontier.queries("pipeline_dataset_diff")(spark, sf)
      .as[(String, Long, Long, Long, Long, Long)].collect()
    val ids = graft.Tables.load(spark, sf, "documents")
      .select($"doc_id").as[Long].collect()
    // derivation rules: %10==7 removed; %10==5 inserts a new key;
    // changed = (%10==3 upd) ∪ (%100==3 second-gen) minus removed
    val wantRemoved = ids.count(_ % 10 == 7)
    val wantAdded = ids.count(_ % 10 == 5)
    val wantChanged = ids.count(i => i % 10 == 3)
    assert(rows.map(_._3).sum == wantAdded)
    assert(rows.map(_._4).sum == wantRemoved)
    assert(rows.map(_._5).sum == wantChanged)
    // every key accounted for exactly once
    assert(rows.map(_._2).sum == ids.length + wantAdded)
    spark.catalog.clearCache()
  }

  test("tokenizer fertility: at least one BPE token per word, exact ratio") {
    val rows = Frontier.queries("pipeline_tokenizer_fertility")(
      spark, sf).as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (lang, nd, w, t, fert) =>
      assert(nd > 0 && w > 0)
      assert(t >= w, s"$lang: fewer BPE tokens than words")
      assert(fert == t * 1000 / w)
      assert(fert >= 1000, s"$lang: fertility below 1.0")
    }
    spark.catalog.clearCache()
  }

  test("price elasticity: slope matches a driver-side OLS per segment") {
    val got = Frontier.queries("q149_price_elasticity")(spark, sf)
      .as[(Long, Long, Double)].collect().map(r => r._1 -> r).toMap
    val t = graft.Tables.load(spark, sf, "lineitem")
      .select(($"l_partkey" % 8).as("s"),
        round($"l_discount" * 100).cast("long").as("x"),
        round($"l_quantity" * 100).cast("long").as("y"))
      .as[(Long, Long, Long)].collect().groupBy(_._1)
    t.foreach { case (seg, rows) =>
      val n = rows.length.toDouble
      val sx = rows.map(_._2).sum.toDouble
      val sy = rows.map(_._3).sum.toDouble
      val sxx = rows.map(r => r._2 * r._2).sum.toDouble
      val sxy = rows.map(r => r._2 * r._3).sum.toDouble
      val want = (n * sxy - sx * sy) / (n * sxx - sx * sx)
      assert(math.abs(got(seg)._3 - want) < 1e-4,
        s"segment $seg: ${got(seg)._3} vs $want")
    }
    spark.catalog.clearCache()
  }

  test("duplicate invoice: recovers exactly the planted replay slice") {
    val got = Frontier.queries("q150_duplicate_invoice")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    val planted = graft.Tables.load(spark, sf, "orders")
      .filter($"o_orderkey" % 97 === 0)
      .select($"o_orderkey").as[Long].collect().toSet
    // every planted replay is found as (original, original + 1e9, +1d)
    planted.foreach { k =>
      assert(got.exists(r => r._3 == k && r._4 == k + 1000000000L &&
        r._5 == 1L), s"planted replay of order $k not detected")
    }
    // and nothing else fires on this fixture beyond the planted set
    got.foreach { r =>
      assert(planted.contains(r._3) || planted.contains(r._4) ||
        planted.contains(r._3 - 1000000000L) ||
        planted.contains(r._4 - 1000000000L),
        s"unexpected pair $r on a clean feed")
    }
    spark.catalog.clearCache()
  }

  test("seasonality strength: in [0,1], residual-killing raises both") {
    val rows = Frontier.queries("q151_seasonality_strength")(spark, sf)
      .as[(String, Long, Double, Double)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (et, n, fs, ft) =>
      assert(n > 0)
      assert(fs >= 0.0 && fs <= 1.0, s"$et: f_seasonal $fs")
      assert(ft >= 0.0 && ft <= 1.0, s"$et: f_trend $ft")
    }
    spark.catalog.clearCache()
  }

  test("ngram novelty: doc ordering property and exact totals") {
    val rows = Frontier.queries("text_ngram_novelty")(spark, sf)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.nonEmpty)
    // the FIRST doc with >= 13 tokens is 100% novel by construction
    assert(rows.head._3 == rows.head._2 &&
      rows.head._4 == 1000L, "first doc must be fully novel")
    rows.foreach { case (id, ng, nn, milli) =>
      assert(nn <= ng && milli == nn * 1000 / ng, s"doc $id")
    }
    // global conservation: every distinct gram is novel in exactly
    // one document, so Σ n_novel == corpus-distinct 13-gram count
    val distinctGrams = graft.Tables.load(spark, sf, "documents")
      .select(lower($"text").as("t"))
      .as[String].collect()
      .flatMap(t => t.split("\\s+").toSeq.sliding(13)
        .filter(_.size == 13).map(_.mkString(" ")))
      .toSet.size
    assert(rows.map(_._3).sum == distinctGrams,
      s"novel sum ${rows.map(_._3).sum} vs distinct $distinctGrams")
    spark.catalog.clearCache()
  }

  test("dup-ngram share matches a literal string-13-gram df recompute") {
    val rows = Frontier.queries("text_dup_ngram_share")(spark, sf)
      .as[(Long, Long, Long, Long)].collect().sortBy(_._1)
    spark.catalog.clearCache()
    assert(rows.nonEmpty)
    // literal recompute on gram STRINGS (the PolyHash basis is
    // injective on this corpus — collisions would fail these counts)
    val docs = graft.Tables.load(spark, sf, "documents")
      .select($"doc_id", lower($"text").as("t"))
      .as[(Long, String)].collect()
    val docGrams = docs.map { case (id, t) =>
      id -> t.split("\\s+").toSeq.sliding(13)
        .filter(_.size == 13).map(_.mkString("\u0001")).toSet
    }.toMap
    val df = docGrams.values.flatten
      .groupBy(identity).map { case (g, xs) => g -> xs.size }
    rows.foreach { case (id, ng, nd, milli) =>
      val gs = docGrams(id)
      assert(ng == gs.size.toLong, s"doc $id gram count")
      assert(nd == gs.count(df(_) >= 2).toLong, s"doc $id dup count")
      assert(milli == nd * 1000 / ng, s"doc $id milli")
    }
    // docs under 13 tokens have no grams and must be absent
    val short = docs.filter(_._2.split("\\s+").length < 13).map(_._1)
    assert(short.forall(id => !rows.exists(_._1 == id)))
  }

  test("lorenz deciles: conservation, monotone shares, decile 10 = 1000") {
    val rows = Frontier.queries("q152_lorenz_deciles")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == (1L to 10L))
    val nCust = graft.Tables.load(spark, sf, "orders")
      .select($"o_custkey").distinct().count()
    assert(rows.map(_._2).sum == nCust, "customers conserve")
    assert(rows.last._5 == 1000L, "full cumulative share is 1000 milli")
    val shares = rows.map(_._5)
    assert(shares.toSeq == shares.sorted.toSeq, "shares monotone")
    // Lorenz convexity on sorted-ascending spend: each decile's spend
    // is >= the previous one's
    val spends = rows.map(_._3)
    assert(spends.toSeq == spends.sorted.toSeq,
      "ascending-rank deciles must have nondecreasing spend")
    spark.catalog.clearCache()
  }

  test("pack efficiency: waste shrinks as ctx shrinks, exact identities") {
    val rows = Frontier.queries("pipeline_pack_efficiency")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect().sortBy(_._1)
    assert(rows.map(_._1).toSeq == Seq(256L, 512L, 1024L, 2048L))
    rows.foreach { case (ctx, nd, nt, nc, np, wm) =>
      assert(nc * ctx == nt + np, s"ctx $ctx: chunk budget identity")
      assert(wm == np * 1000 / (nc * ctx))
    }
    // more padding at larger contexts on short-doc corpora
    assert(rows.head._6 <= rows.last._6,
      "waste must not decrease with context length on this corpus")
    spark.catalog.clearCache()
  }

  test("shipping SLA: rates monotone in window and bounded") {
    val rows = Frontier.queries("q153_shipping_sla")(spark, sf)
      .as[(String, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (p, n, w30, w60, w90) =>
      assert(n > 0)
      assert(w30 <= w60 && w60 <= w90, s"$p: SLA not monotone")
      assert(w90 <= 1000L)
    }
    spark.catalog.clearCache()
  }

  test("shot budget: composes scene cuts with exact arithmetic") {
    val rows = Frontier.queries("mm_shot_budget")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    rows.foreach { case (id, nf, uf, sf2, delta) =>
      assert(uf == nf / 8, s"doc $id uniform")
      assert(sf2 <= nf, s"doc $id: shot frames exceed frame count")
      assert(delta == sf2 - uf)
    }
    spark.catalog.clearCache()
  }

  test("seasonal anomalies: every flagged day violates 2-sigma exactly") {
    val got = Frontier.queries("q154_seasonal_anomaly_days")(spark, sf)
      .as[(String, String, Long, Long, Long)].collect()
    val comp = Insights.queries("q127_seasonal_decompose")(spark, sf)
      .select($"event_type", $"residual")
      .as[(String, Long)].collect().groupBy(_._1)
    got.foreach { case (et, _, _, r, side) =>
      val rs = comp(et).map(_._2)
      val n = rs.length.toLong
      val sr = rs.sum
      val srr = rs.map(x => x * x).sum
      assert((n * r - sr) * (n * r - sr) > 4L * (n * srr - sr * sr),
        s"$et day flagged but inside the band")
      assert(side == (if (n * r - sr > 0) 1L else -1L))
    }
    // and none missed: count matches a driver-side sweep
    val want = comp.toSeq.map { case (_, rows) =>
      val rs = rows.map(_._2)
      val n = rs.length.toLong; val sr = rs.sum
      val srr = rs.map(x => x * x).sum
      rs.count(r => (n * r - sr) * (n * r - sr) > 4L * (n * srr - sr * sr))
    }.sum
    assert(got.length == want)
    spark.catalog.clearCache()
  }

  test("lang confusion: matrix == a driver recount of langid's output") {
    // NOTE the op's whole point: it REVEALS accuracy rather than
    // assuming it (at sf0.001 the synthetic 'fr' docs carry no French
    // stopwords and the matrix correctly shows a zero diagonal for
    // them) — so the spec asserts exact structure, not accuracy.
    val rows = Frontier.queries("text_lang_confusion")(spark, sf)
      .as[(String, String, Long, Long, Long)].collect()
    assert(rows.nonEmpty)
    val pred = graft.text.TextAnalysis.queries("text_langid")(spark, sf)
      .select($"labeled_lang", $"predicted_lang")
      .as[(String, String)].collect()
    val want = pred.groupBy(identity).view.mapValues(_.length.toLong)
    rows.foreach { case (l, p, n, nl, milli) =>
      assert(n == want((l, p)), s"cell ($l,$p)")
      assert(nl == pred.count(_._1 == l))
      assert(milli == n * 1000 / nl)
    }
    assert(rows.map(_._3).sum == pred.length, "cells cover every doc")
    spark.catalog.clearCache()
  }

  test("code detect: planted code-like text crosses the threshold") {
    // the registered query is corpus-driven; the feature extractor's
    // discrimination is pinned on planted rows via the same exprs
    val df = Seq(
      (1L, "int main() { int x = 0; for (;;) { x = x + 1; } return x; }"),
      (2L, "the quiet afternoon passed without any incident at all"))
      .toDF("doc_id", "text")
      .withColumn("n_chars", length($"text").cast("long"))
    df.createOrReplaceTempView("frontier_code_probe")
    val scored = df
      .select($"doc_id",
        ((length($"text") - length(regexp_replace($"text", "\\{", ""))) +
         (length($"text") - length(regexp_replace($"text", "\\}", ""))) +
         (length($"text") - length(regexp_replace($"text", ";", ""))) +
         (length($"text") - length(regexp_replace($"text", "=", ""))))
          .cast("long").as("special"), $"n_chars")
      .select($"doc_id",
        expr("special * 1000 div n_chars").as("score_milli"))
      .as[(Long, Long)].collect().toMap
    assert(scored(1L) >= 15, s"code row scored ${scored(1L)}")
    assert(scored(2L) < 15, s"prose row scored ${scored(2L)}")
    spark.catalog.clearCache()
  }
}
