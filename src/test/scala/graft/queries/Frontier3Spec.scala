package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral specs for the round-11 batch-9 operators — independent
  * driver-side re-derivations at sf0.001 (the FrontierSpec pattern),
  * on top of the DuckDB hash gate.
  */
class Frontier3Spec extends SparkSpec {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  /** The shared literal transition replay: per-user event sequences
    * ordered by (ts, event_id), consecutive (cur, next) pairs.
    */
  private def transitions(): Map[(String, String), Long] = {
    val ev = graft.Tables.load(spark, sf, "events")
      .select($"user_id", $"event_type", unix_micros($"ts").as("t"),
        $"event_id")
      .as[(Long, String, Long, Long)].collect()
    ev.groupBy(_._1).toSeq.flatMap { case (_, rows) =>
      val seq = rows.sortBy(r => (r._3, r._4)).map(_._2)
      seq.zip(seq.drop(1))
    }.groupBy(identity).map { case (p, xs) => p -> xs.length.toLong }
  }

  test("markov steady-state: exact 4-round replay from raw sequences") {
    val got = Frontier3.queries("q159_markov_steady")(spark, sf)
      .as[(String, Long, Double, Double)].collect().sortBy(_._1)
    val tr = transitions()
    val states =
      tr.keys.flatMap(p => Seq(p._1, p._2)).toSeq.distinct.sorted
    val k = states.length
    val n = Array.tabulate(k, k) { (i, j) =>
      tr.getOrElse((states(i), states(j)), 0L) }
    val rowTot = n.map(_.sum)
    val total = rowTot.sum
    var v = Array.fill(k)(1.0 / k)
    for (_ <- 1 to 4) {
      val u = Array.tabulate(k) { j =>
        var acc = 0.0
        for (i <- 0 until k)
          if (n(i)(j) > 0L)
            acc += v(i) * (n(i)(j).toDouble / rowTot(i).toDouble)
        acc
      }
      v = u.map(x => math.floor(x * 1.0e9) / 1.0e9)
    }
    def r6(x: Double) = BigDecimal(x)
      .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble
    assert(got.map(_._1).toSeq == states)
    got.foreach { case (st, nOut, obs, pi) =>
      val i = states.indexOf(st)
      assert(nOut == rowTot(i), s"$st n_out")
      assert(math.abs(obs - r6(rowTot(i).toDouble / total)) < 1e-9)
      assert(math.abs(pi - r6(v(i))) < 1e-9, s"$st steady_pi")
    }
    // a proper distribution (within quantization loss) that is NOT
    // just the observed shares — the iteration actually moved mass
    val piSum = got.map(_._4).sum
    assert(piSum > 0.99 && piSum < 1.01, s"pi sums to ~1: $piSum")
  }

  test("entropy rate: exact fold replay and information inequalities") {
    val got = Frontier3.queries("q160_entropy_rate")(spark, sf)
      .as[(String, Long, Double, Double, Double, Double)].collect()
    val tr = transitions()
    val bySrc = tr.groupBy(_._1._1)
    val rowTot = bySrc.map { case (s, m) => s -> m.values.sum }
    val total = rowTot.values.sum
    def r4(x: Double) = BigDecimal(x)
      .setScale(4, BigDecimal.RoundingMode.HALF_UP).toDouble
    val hCond = bySrc.map { case (s, m) =>
      val nOut = rowTot(s)
      var acc = 0.0
      m.toSeq.sortBy(_._1._2).foreach { case (_, c) =>
        val p = c.toDouble / nOut.toDouble
        acc = acc - p * math.log(p)
      }
      s -> acc
    }
    var hRate = 0.0; var h0 = 0.0
    rowTot.toSeq.sortBy(_._1).foreach { case (s, nOut) =>
      val pi = nOut.toDouble / total.toDouble
      hRate = hRate + pi * hCond(s)
      h0 = h0 - pi * math.log(pi)
    }
    got.foreach { case (st, nOut, hc, hr, hz, gain) =>
      assert(nOut == rowTot(st), s"$st n_out")
      assert(math.abs(hc - r4(hCond(st))) < 1e-9, s"$st h_cond")
      assert(math.abs(hr - r4(hRate)) < 1e-9, "h_rate")
      assert(math.abs(hz - r4(h0)) < 1e-9, "h0")
      assert(math.abs(gain - r4(1.0 - hRate / h0)) < 1e-9, "gain")
      // information inequalities: 0 <= H <= ln k
      assert(hc >= 0.0 && hz >= 0.0 && hr >= 0.0)
      assert(hz <= math.log(rowTot.size.toDouble) + 1e-9)
    }
  }

  test("filter sweep: retention table matches a literal filter") {
    val got = Frontier3.queries("pipeline_filter_sweep")(spark, sf)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    val toks = graft.Tables.load(spark, sf, "documents")
      .select(size(split(lower($"text"), "\\s+")).cast("long"))
      .as[Long].collect()
    val totDocs = toks.length.toLong
    val totToks = toks.sum
    assert(got.length == 20, "5x4 grid")
    got.foreach { case (mn, mx, dk, tk, ds, ts) =>
      val kept = toks.filter(t => t >= mn && t <= mx)
      assert(dk == kept.length.toLong, s"($mn,$mx) docs")
      assert(tk == kept.sum, s"($mn,$mx) tokens")
      assert(ds == dk * 1000L / totDocs, s"($mn,$mx) doc share")
      assert(ts == tk * 1000L / totToks, s"($mn,$mx) token share")
    }
    // monotonicity: widening the window never loses documents
    val byMin = got.groupBy(_._1)
    byMin.values.foreach { rows =>
      val sorted = rows.sortBy(_._2)
      sorted.zip(sorted.drop(1)).foreach { case (a, b) =>
        assert(a._3 <= b._3, "docs monotone in max_tokens") }
    }
  }

  test("supplier lead-time: exact order statistics per supplier") {
    val got = Frontier3.queries("q161_supplier_leadtime")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
      .map(r => r._1 -> r).toMap
    spark.catalog.clearCache() // PrefixSum persists inside Quantiles
    val li = graft.Tables.load(spark, sf, "lineitem")
      .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
      .join(graft.Tables.load(spark, sf, "orders")
        .select($"o_orderkey", $"o_orderdate"),
        $"l_orderkey" === $"o_orderkey")
      .select($"l_suppkey",
        datediff($"l_shipdate", $"o_orderdate").cast("long"))
      .as[(Long, Long)].collect()
    val bySupp = li.groupBy(_._1)
    assert(got.keySet == bySupp.keySet)
    bySupp.foreach { case (sk, rows) =>
      val lags = rows.map(_._2).sorted
      val n = lags.length
      val (_, gn, w30, p50, p90) = got(sk)
      assert(gn == n.toLong, s"supplier $sk n")
      assert(w30 == lags.count(_ <= 30L) * 1000L / n, s"$sk fill")
      assert(p50 == lags(math.floor(0.5 * (n - 1)).toInt), s"$sk p50")
      assert(p90 == lags(math.floor(0.9 * (n - 1)).toInt), s"$sk p90")
      assert(p50 <= p90, s"$sk order statistics ordered")
    }
  }
}
