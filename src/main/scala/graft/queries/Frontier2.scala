package graft.queries

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.{Q, Tables}

/** Round-10 frontier, continued (batch 8+): funnel latency
  * percentiles, heavy-tail index estimation, rolling cross-series
  * correlation, and multi-epoch training-order planning.
  *
  * Reference note: the reference engine (`/root/reference/`, a Go log
  * forwarder — SURVEY.md §1) has no analytics surface; these extend
  * the Insights/Pipeline families under the same house disciplines —
  * exact integer domains until one final IEEE assembly, `Tables.nz`
  * on signable float outputs, domain-bounded windows, md5 as the
  * cross-engine deterministic RNG, and DuckDB oracles that replay the
  * identical arithmetic.
  */
object Frontier2 {

  def queries: Map[String, Q] = Map(

    // Funnel latency distribution — "how long from first view to the
    // first purchase after it", the time dimension q36_funnel's stage
    // counts deliberately drop. Per user: first view ts, then the
    // earliest purchase strictly after it (one user-keyed shuffle
    // join — both sides map-side-reduced to one row per user first).
    // Report p50/p90 conversion latency per purchase week as exact
    // DISCRETE order statistics (rank floor(p·(n−1)) — never an
    // interpolating float percentile), computed by ops.Quantiles'
    // count-table + PrefixSum pass — the q89_conversion_lag idiom.
    // The round-10 cut collected the per-week latency list into one
    // agg buffer ("≤ users" is NOT a bound: one busy week at 100×
    // scale is millions of longs in a single buffer — the r10
    // verdict's scale flag); Quantiles' state is the (week, lat)
    // COUNT table, sized by the value domain, never the row count.
    "q155_funnel_latency" -> ((s, d) => {
      import s.implicits._
      val ev = Tables.load(s, d, "events")
        .filter($"event_type".isin("view", "purchase"))
        .select($"user_id", $"event_type", unix_micros($"ts").as("t"))
      val firstView = ev.filter($"event_type" === "view")
        .groupBy($"user_id").agg(min($"t").as("fv"))
      val conv = ev.filter($"event_type" === "purchase")
        .join(firstView, Seq("user_id"))
        .filter($"t" > $"fv")
        .groupBy($"user_id")
        .agg(min($"t").as("fp"), min($"fv").as("fv2"))
        .select(
          expr("(fp - fv2) div 1000000").as("lat_s"),
          date_format(
            date_trunc("week", timestamp_micros($"fp")), "yyyy-MM-dd")
            .as("week"))
      graft.ops.Quantiles.exactByGroup(conv, "week", $"lat_s",
          Seq("p50_lat_s" -> 0.5, "p90_lat_s" -> 0.9))
        .select($"week", $"n".as("n_conversions"),
          $"p50_lat_s", $"p90_lat_s")
        .orderBy($"week")
    }),

    // Hill tail-index estimator per order priority — "how heavy is
    // the spend tail", the number that decides whether mean-based
    // budgeting (q142's bootstrap CI) is even meaningful. Classic
    // Hill over the top k=64 order statistics: gamma = (1/k) Σ
    // ln(x_(i)/x_(k+1)), alpha = 1/gamma. The top-(k+1) selection is
    // a WindowGroupLimit partial top-k per priority (rank by exact
    // cents DESC, orderkey tiebreak — never a global sort); the ln
    // runs on exact integer cents so both engines hash identical
    // doubles, and the sum folds over the ASCENDING sorted cents list
    // (house IEEE discipline — one deterministic association order).
    // Scale: top-65-per-enum is partial-aggregated map-side; the fold
    // list is 65 elements per priority, constant.
    "q156_hill_tail" -> ((s, d) => {
      import s.implicits._
      val k = 64
      val w = Window.partitionBy($"prio")
        .orderBy($"cents".desc, $"o_orderkey")
      val top = Tables.load(s, d, "orders")
        .select($"o_orderpriority".as("prio"), $"o_orderkey",
          round($"o_totalprice" * 100).cast("long").as("cents"))
        .withColumn("rn", row_number().over(w))
        .filter($"rn" <= k + 1)
      top.groupBy($"prio")
        .agg(count(lit(1)).as("n_top"),
          min($"cents").as("xk1"),
          sort_array(collect_list(when($"rn" <= k, $"cents")))
            .as("xs"))
        .filter($"n_top" === k + 1)
        .select($"prio", lit(k.toLong).as("k"), $"xk1",
          Tables.nz(round(
            expr(s"""aggregate(xs, CAST(0.0 AS DOUBLE),
                 (a, x) -> a + (ln(CAST(x AS DOUBLE)) -
                   ln(CAST(xk1 AS DOUBLE)))) / $k"""), 4))
            .as("hill_gamma"))
        .orderBy($"prio")
    }),

    // Rolling 7-day cross-correlation between event-type daily
    // revenue series — the co-movement monitor behind "did errors
    // start tracking purchases this week". The day×type grid is
    // gap-filled to zero first (q104 spine discipline: a one-row
    // span agg explodes to the calendar, cross-joined with the
    // broadcast enum dim — grid size is span×|enum|, data-size-
    // independent), so every pair window sees aligned days. Moments
    // (n, Σx, Σy, Σxy, Σx², Σy²) accumulate as exact longs in ONE
    // RANGE frame over the integer day index; Pearson assembles once
    // per row in doubles (cross-multiplied form; zero-variance
    // windows → NULL). Pair space is |enum|²/2 — bounded. Moments
    // accumulate as decimal(38,0) (r11 verdict item #4): unlike q25's
    // corpus-sized moment scan (where decimal cost 15× and the
    // try_sum-detect-then-retry fast path earns its keep), the window
    // input here is the gap-filled GRID — span×|enum| rows, data-size
    // independent — so exact 38-digit moments are free at any corpus
    // size, and a day whose cent sum passes 2^31 (≈ $21M/day, real at
    // 100 TB) no longer ANSI-overflows the squared sums. The daily
    // rollup itself stays long (corpus-sized, bounded by total corpus
    // value ≤ ~9e16 $); the oracle mirrors with HUGEINT products.
    "q157_rolling_corr" -> ((s, d) =>
      rollingCorr(Tables.load(s, d, "events"))),

    // Multi-epoch training-order plan — every multi-epoch run needs a
    // DIFFERENT deterministic global permutation per epoch (same
    // order twice = the model sees correlated batches; Sow et al. /
    // every data-loader's reshuffle-each-epoch rule). Epoch e's order
    // is md5("epoch<e>:<doc_id>") — the house cross-engine RNG — and
    // the shard is the key's first hex nibble mod 4, so shard
    // membership ALSO reshuffles per epoch. Emits the per-(epoch,
    // shard) doc count and an ORDER-SENSITIVE fingerprint the spec
    // uses to prove the three epochs are genuinely distinct
    // permutations of the same doc set. The round-10 cut built the
    // fingerprint from a per-shard collect_list — group COUNT is
    // fixed (12) but group SIZE is corpus/4, so the buffer OOMs
    // exactly when multi-epoch planning matters (the r10 verdict's
    // scale flag). Now: each row's within-shard permutation rank
    // comes from ops.PrefixSum's two-pass distributed scan over the
    // global (epoch, shard, key, doc_id) order (per-group rank =
    // global running count − the group's start offset, the
    // ops.Quantiles subtraction trick — the offset table is 12 rows,
    // broadcast), and the fingerprint is the ORDER-FREE exact
    // bit_xor of md5(rank:doc_id)'s first 48 bits. Any transposition
    // changes some (rank, doc_id) pair, so order sensitivity is
    // preserved with one 8-byte agg buffer per shard at any scale.
    "pipeline_epoch_order" -> ((s, d) => {
      import s.implicits._
      val docs = Tables.load(s, d, "documents")
        .select($"doc_id",
          explode(sequence(lit(1), lit(3))).as("epoch"))
        .withColumn("key", md5(concat(lit("epoch"),
          $"epoch".cast("string"), lit(":"), $"doc_id".cast("string"))))
        .withColumn("shard",
          conv(substring($"key", 1, 1), 16, 10).cast("long") % 4)
      val ranked = graft.ops.PrefixSum.runningTotal(docs,
        Seq($"epoch", $"shard", $"key", $"doc_id"), lit(1L), "grn")
      val base = ranked.groupBy($"epoch", $"shard")
        .agg(min($"grn").as("g0"))
      ranked.join(broadcast(base), Seq("epoch", "shard"))
        .withColumn("rank", $"grn" - $"g0" + 1L)
        .withColumn("h",
          conv(substring(md5(concat($"rank".cast("string"), lit(":"),
            $"doc_id".cast("string"))), 1, 12), 16, 10).cast("long"))
        .groupBy($"epoch", $"shard")
        .agg(count(lit(1)).as("n_docs"),
          expr("bit_xor(h)").as("order_fp"))
        .orderBy($"epoch", $"shard")
    }),

    // Community modularity — the QUALITY score for q101's label-
    // propagation communities (Newman Q: Σ_c [e_c/m − (d_c/2m)²]).
    // Without it, "we found communities" is unfalsifiable; with it,
    // partition changes (more LPA rounds, a different seed graph) are
    // comparable numbers. The labels come from Graph.lpaLabels — the
    // SESSION-SHARED materialization of q101's exact 4-round loop
    // (r11 verdict item #5: both queries replayed the identical loop
    // for byte-identical labels); e_c is one edges⋈labels⋈labels
    // join, d_c one degree rollup. The per-community contribution is
    // the EXACT integer 4m·e_c − d_c² (the cross-multiplied form —
    // zero floats until the final /4m² assembly); global Q sums the
    // integer numerators over the community-bounded rows in one
    // unbounded window. Degree sums fit long for any graph with
    // < ~2^31 edges; past that the documented q25 decimal(38,0)
    // escalation applies.
    "q158_modularity" -> ((s, d) => {
      import s.implicits._
      val e = Graph.coOccurrencePairCounts(s, d).select($"a", $"b")
        .persist(StorageLevel.MEMORY_AND_DISK)
      val sym = e.select(explode(array(
          struct($"a".as("src"), $"b".as("dst")),
          struct($"b".as("src"), $"a".as("dst")))).as("x"))
        .select($"x.src", $"x.dst")
        .persist(StorageLevel.MEMORY_AND_DISK)
      val m = e.count()
      val labs = graft.queries.Graph.lpaLabels(s, d)
      val deg = sym.groupBy($"src".as("node"))
        .agg(count(lit(1)).as("deg"))
      val comm = labs.join(deg, Seq("node"))
        .groupBy($"lab".as("community"))
        .agg(count(lit(1)).as("n_members"), sum($"deg").as("deg_sum"))
      val intra = e
        .join(labs.select($"node".as("a"), $"lab".as("la")), Seq("a"))
        .join(labs.select($"node".as("b"), $"lab".as("lb")), Seq("b"))
        .filter($"la" === $"lb")
        .groupBy($"la".as("community"))
        .agg(count(lit(1)).as("intra_edges"))
      val out = comm.join(intra, Seq("community"), "left")
        .select($"community", $"n_members", $"deg_sum",
          coalesce($"intra_edges", lit(0L)).as("intra_edges"))
        .withColumn("qnum",
          lit(4L) * lit(m) * $"intra_edges" - $"deg_sum" * $"deg_sum")
      out
        .withColumn("q_contrib", Tables.nz(round(
          $"qnum".cast("double") / (4.0 * m.toDouble * m.toDouble), 6)))
        .withColumn("global_q", Tables.nz(round(
          sum($"qnum").over(Window.partitionBy(lit(1)))
            .cast("double") / (4.0 * m.toDouble * m.toDouble), 6)))
        .select($"community", $"n_members", $"intra_edges",
          $"deg_sum", $"q_contrib", $"global_q")
        .orderBy($"community")
    }),

    // Second principal component by Hotelling deflation — extends
    // emb_power_iteration (Similarity.scala) from "the top direction"
    // to "the top PLANE": pc2's eigenvalue ratio tells whether
    // variance is one-dimensional (a normalization bug) or genuinely
    // spread (healthy). The corpus sees ONE pass (the same exact
    // integer d²-bounded moment rollup); everything after is
    // driver-local on the 64×64 matrix (Bpe.learn discipline).
    // Deflation C' = C − λ₁·v v^T/(v^T v) runs in doubles with a
    // FIXED evaluation order ((λ·v_i)·v_j)/vv that the DuckDB oracle
    // replays term-for-term, then the same 3 quantized power rounds
    // and Rayleigh quotient run on C'.
    "emb_pc2" -> ((s, d) => {
      import s.implicits._
      val q = Tables.spread(Tables.load(s, d, "embeddings"))
        .select(expr("transform(embedding, v -> " +
          "CAST(floor(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT))")
          .as("q"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val dims = q.select(posexplode(col("q")).as(Seq("i", "x")))
        .groupBy(col("i"))
        .agg(count(lit(1)).as("n"), sum(col("x")).as("sx"))
        .as[(Int, Long, Long)].collect().sortBy(_._1)
      val n = dims.head._2
      val sx = dims.map(_._3)
      val d64 = sx.length
      val sxy = q.select(posexplode(expr(
          """flatten(transform(sequence(0, size(q) - 1), i ->
             transform(sequence(i, size(q) - 1), j ->
               element_at(q, i + 1) * element_at(q, j + 1))))"""))
          .as(Seq("pos", "xy")))
        .groupBy(col("pos")).agg(sum(col("xy")).as("sxy"))
        .as[(Int, Long)].collect().sortBy(_._1).map(_._2)
      q.unpersist(false)
      val c = Array.ofDim[Double](d64, d64)
      var p = 0
      for (i <- 0 until d64; j <- i until d64) {
        val v = n.toDouble * sxy(p).toDouble -
          sx(i).toDouble * sx(j).toDouble
        c(i)(j) = v; c(j)(i) = v; p += 1
      }
      def matvec(mat: Array[Array[Double]], v: Array[Double])
          : Array[Double] =
        Array.tabulate(d64) { i =>
          var acc = 0.0
          var j = 0
          while (j < d64) { acc += mat(i)(j) * v(j); j += 1 }
          acc
        }
      def rounds(mat: Array[Array[Double]])
          : (Array[Double], Double) = {
        var v = Array.fill(d64)(1.0)
        for (_ <- 1 to 3) {
          val u = matvec(mat, v)
          var mx = 0.0
          u.foreach(x => if (math.abs(x) > mx) mx = math.abs(x))
          // degenerate all-zero matvec (constant/single embedding →
          // zero covariance): quantize to the zero vector instead of
          // 0/0 NaN loadings; the oracle's renorm CTE applies the
          // same CASE so both engines stay deterministic
          v = if (mx == 0.0) Array.fill(d64)(0.0)
            else u.map(x => math.floor(x / mx * 1000000.0) / 1000000.0)
        }
        val u = matvec(mat, v)
        var num = 0.0; var den = 0.0
        for (i <- 0 until d64) {
          num += v(i) * u(i); den += v(i) * v(i) }
        (v, if (den == 0.0) 0.0 else num / den)
      }
      val (v1, eig1) = rounds(c)
      var vv = 0.0
      v1.foreach(x => vv += x * x)
      val c2 = Array.tabulate(d64, d64) { (i, j) =>
        c(i)(j) - eig1 * v1(i) * v1(j) / vv
      }
      val (v2, eig2) = rounds(c2)
      v2.zipWithIndex.map { case (x, i) => (i.toLong, x) }
        .toSeq.toDF("pos", "l")
        .select($"pos", Tables.nz(round($"l", 6)).as("loading2"),
          Tables.nz(round(lit(eig2) / lit(1.0e12), 4))
            .as("eig2_scaled"),
          Tables.nz(round(lit(eig1) / lit(1.0e12), 4))
            .as("eig1_scaled"))
        .orderBy($"pos")
    }),

    // Zipf rank score — mean ln(corpus rank) of a document's tokens:
    // the rank-domain twin of text_rarity's mean-frequency signal
    // (rank is scale-free across corpus sizes where raw frequency is
    // not, so thresholds TRANSFER between corpora — the reason
    // quality pipelines bin by rank). Vocab ranks order by (count
    // DESC, token) — a fully deterministic total order — but NOT via
    // a partition-less row_number window (the round-10 cut: that
    // plans as ONE task sorting the whole vocabulary, the exact
    // shape ops.PrefixSum's scaladoc warns against — billions of
    // raw tokens through a single task at 100 TB; the r10 verdict's
    // scale flag). Rank is ops.PrefixSum's two-pass distributed
    // running count over (−cnt, token) — the q105/q133 idiom. Each
    // doc then folds ln(rank) over its ASCENDING sorted rank list
    // (house IEEE discipline). Corpus-sized work: the token explode +
    // one vocab join; the fold list is doc-length-bounded, row-local.
    "text_zipf_rank_score" -> ((s, d) => {
      import s.implicits._
      val tok = Tables.spread(Tables.load(s, d, "documents"))
        .select($"doc_id", $"lang",
          explode(split(lower($"text"), "\\s+")).as("token"))
      val vocab = graft.ops.PrefixSum.runningTotal(
        tok.groupBy($"token").agg(count(lit(1)).as("cnt")),
        Seq((-$"cnt").as("negcnt"), $"token"), lit(1L), "rank")
      tok.join(vocab.select($"token", $"rank"), Seq("token"))
        .groupBy($"doc_id")
        .agg(min($"lang").as("lang"), count(lit(1)).as("n_tokens"),
          sort_array(collect_list($"rank")).as("rs"))
        .select($"doc_id", $"lang", $"n_tokens",
          Tables.nz(round(
            expr("""aggregate(rs, CAST(0.0 AS DOUBLE),
                 (a, r) -> a + ln(CAST(r AS DOUBLE)))""") /
              $"n_tokens".cast("double"), 4)).as("mean_ln_rank"))
        .orderBy($"doc_id")
    }),

    // Aspect-ratio bucketing — the batching plan every vision
    // training run needs (images batch by NEAREST canonical aspect
    // bucket; off-bucket area is pad waste). Builds on the REAL
    // multimodal seam: dimensions come through Multimodal's batched
    // mapPartitions decode kernel (stub codec, real plumbing), never
    // recomputed inline. Bucket choice is ROW-LOCAL: argmin
    // |aspect − bucket| on exact milli-ratio integers (tie → the
    // narrower bucket) via array_min over a 7-element literal grid —
    // no per-doc window, no grid join, nothing but the bucket rollup
    // shuffles; waste_milli = 1000 − 1000·min/max in integer
    // division. share_milli divides on the 7-row aggregate.
    "mm_aspect_buckets" -> ((s, d) => {
      import s.implicits._
      val dec = graft.multimodal.Multimodal
        .decode(graft.multimodal.Multimodal.pack(s, d,
          spreadDocs = true))
        .select($"doc_id",
          expr("width * 1000 div height").as("am"))
      val pick = dec
        .withColumn("bm", expr(
          """array_min(transform(
               array(500L, 666L, 750L, 1000L, 1333L, 1500L, 2000L),
               b -> struct(abs(am - b) AS df, b AS bm))).bm"""))
        .withColumn("waste_milli",
          lit(1000L) - expr(
            "least(am, bm) * 1000 div greatest(am, bm)"))
      pick.groupBy($"bm".as("bucket_milli"))
        .agg(count(lit(1)).as("n_images"),
          sum($"waste_milli").as("sw"))
        .select($"bucket_milli", $"n_images",
          expr("n_images * 1000 div (sum(n_images) OVER ())")
            .as("share_milli"),
          expr("sw div n_images").as("mean_waste_milli"))
        .orderBy($"bucket_milli")
    }))

  /** q157's body, factored so MomentWidthSpec can drive it with a
    * synthetic corpus whose daily cent sums overflow 64-bit squares.
    * Window moments are decimal(38,0) — exact far past the long
    * ceiling, and cheap because the window input is the
    * span×|enum| day grid, not the corpus.
    */
  private[queries] def rollingCorr(events: DataFrame): DataFrame = {
    val s = events.sparkSession
    import s.implicits._
    val dec = "decimal(38,0)"
    val daily = events
      .select($"event_type", to_date($"ts").as("day"),
        round($"value" * 100).cast("long").as("cents"))
      .groupBy($"event_type", $"day").agg(sum($"cents").as("v"))
    val span = daily.agg(min($"day").as("d0"), max($"day").as("d1"))
    val types = daily.select($"event_type").distinct()
    val grid = span
      .select(explode(sequence($"d0", $"d1")).as("day"), $"d0")
      .crossJoin(broadcast(types))
      .join(daily, Seq("event_type", "day"), "left")
      .select($"event_type", $"day",
        datediff($"day", $"d0").cast("long").as("di"),
        coalesce($"v", lit(0L)).cast(dec).as("v"))
    val a = grid.select($"event_type".as("ta"), $"di", $"day",
      $"v".as("x"))
    val b = grid.select($"event_type".as("tb"), $"di",
      $"v".as("y"))
    val pair = a.join(b, Seq("di")).filter($"ta" < $"tb")
    val w = Window.partitionBy($"ta", $"tb").orderBy($"di")
      .rangeBetween(-6, 0)
    val m = pair
      .withColumn("n", count(lit(1)).over(w).cast(dec))
      .withColumn("sx", sum($"x").over(w))
      .withColumn("sy", sum($"y").over(w))
      .withColumn("sxy", sum(($"x" * $"y").cast(dec)).over(w))
      .withColumn("sxx", sum(($"x" * $"x").cast(dec)).over(w))
      .withColumn("syy", sum(($"y" * $"y").cast(dec)).over(w))
      .filter($"n" === 7)
    m.select($"ta", $"tb", date_format($"day", "yyyy-MM-dd").as("day"),
        Tables.nz(round(
          when(
            ($"n" * $"sxx" - $"sx" * $"sx") === 0 ||
              ($"n" * $"syy" - $"sy" * $"sy") === 0,
            lit(null).cast("double"))
            .otherwise(
              ($"n" * $"sxy" - $"sx" * $"sy").cast("double") /
                sqrt(($"n" * $"sxx" - $"sx" * $"sx").cast("double") *
                  ($"n" * $"syy" - $"sy" * $"sy").cast("double"))),
          4)).as("corr7"))
      .orderBy($"ta", $"tb", $"day")
  }

  def oracles: Map[String, String] = Map(

    "q155_funnel_latency" ->
      """WITH ev AS (
           SELECT user_id, event_type, epoch_us(ts) AS t
           FROM events WHERE event_type IN ('view', 'purchase')),
         fv AS (
           SELECT user_id, min(t) AS fv FROM ev
           WHERE event_type = 'view' GROUP BY 1),
         conv AS (
           SELECT e.user_id, min(e.t) AS fp, min(f.fv) AS fv2
           FROM ev e JOIN fv f ON e.user_id = f.user_id
           WHERE e.event_type = 'purchase' AND e.t > f.fv
           GROUP BY 1),
         lat AS (
           SELECT (fp - fv2) // 1000000 AS lat_s,
             strftime(date_trunc('week', make_timestamp(fp)),
               '%Y-%m-%d') AS week
           FROM conv),
         r AS (
           SELECT week, lat_s,
             row_number() OVER (PARTITION BY week ORDER BY lat_s)
               AS rn,
             count(*) OVER (PARTITION BY week) AS n
           FROM lat)
         SELECT week, CAST(max(n) AS BIGINT) AS n_conversions,
           min(CASE WHEN rn = CAST(floor(0.5 * (n - 1)) AS BIGINT) + 1
                 THEN lat_s END) AS p50_lat_s,
           min(CASE WHEN rn = CAST(floor(0.9 * (n - 1)) AS BIGINT) + 1
                 THEN lat_s END) AS p90_lat_s
         FROM r GROUP BY week ORDER BY week""",

    "q156_hill_tail" ->
      """WITH c AS (
           SELECT o_orderpriority AS prio, o_orderkey,
             CAST(round(o_totalprice * 100) AS BIGINT) AS cents
           FROM orders),
         r AS (
           SELECT prio, cents,
             row_number() OVER (PARTITION BY prio
               ORDER BY cents DESC, o_orderkey) AS rn
           FROM c),
         top AS (SELECT * FROM r WHERE rn <= 65),
         g AS (
           SELECT prio, CAST(count(*) AS BIGINT) AS n_top,
             min(cents) AS xk1,
             list_sort(list(cents) FILTER (WHERE rn <= 64)) AS xs
           FROM top GROUP BY 1)
         SELECT prio, CAST(64 AS BIGINT) AS k, xk1,
           round(list_reduce(
             list_transform(xs, x ->
               ln(CAST(x AS DOUBLE)) - ln(CAST(xk1 AS DOUBLE))),
             (a, b) -> a + b) / 64, 4) + 0.0 AS hill_gamma
         FROM g WHERE n_top = 65 ORDER BY prio""",

    "q157_rolling_corr" ->
      """WITH daily AS (
           SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(sum(CAST(round(value * 100) AS BIGINT)) AS BIGINT)
               AS v
           FROM events GROUP BY 1, 2),
         span AS (SELECT min(day) AS d0, max(day) AS d1 FROM daily),
         days AS (
           SELECT unnest(generate_series(d0, d1,
             INTERVAL 1 DAY))::DATE AS day, d0
           FROM span),
         types AS (SELECT DISTINCT event_type FROM daily),
         grid AS (
           SELECT t.event_type, dy.day,
             CAST(date_diff('day', dy.d0, dy.day) AS BIGINT) AS di,
             coalesce(d.v, 0) AS v
           FROM days dy CROSS JOIN types t
           LEFT JOIN daily d
             ON d.event_type = t.event_type AND d.day = dy.day),
         pair AS (
           SELECT a.event_type AS ta, b.event_type AS tb, a.di,
             a.day, a.v AS x, b.v AS y
           FROM grid a JOIN grid b ON a.di = b.di
           WHERE a.event_type < b.event_type),
         m AS (
           -- moments stay HUGEINT (the decimal(38,0) twin of the
           -- Spark side): BIGINT products overflow exactly when a
           -- daily cent sum passes 2^31
           SELECT ta, tb, day,
             CAST(count(*) OVER w AS HUGEINT) AS n,
             CAST(sum(x) OVER w AS HUGEINT) AS sx,
             CAST(sum(y) OVER w AS HUGEINT) AS sy,
             sum(CAST(x AS HUGEINT) * y) OVER w AS sxy,
             sum(CAST(x AS HUGEINT) * x) OVER w AS sxx,
             sum(CAST(y AS HUGEINT) * y) OVER w AS syy
           FROM pair
           WINDOW w AS (PARTITION BY ta, tb ORDER BY di
             RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
         SELECT ta, tb, strftime(day, '%Y-%m-%d') AS day,
           round(CASE
             WHEN n * sxx - sx * sx = 0 OR n * syy - sy * sy = 0
               THEN NULL
             ELSE CAST(n * sxy - sx * sy AS DOUBLE) /
               sqrt(CAST(n * sxx - sx * sx AS DOUBLE) *
                 CAST(n * syy - sy * sy AS DOUBLE))
             END, 4) + 0.0 AS corr7
         FROM m WHERE n = 7
         ORDER BY ta, tb, day""",

    "q158_modularity" -> {
      def lpaRound(prev: String, out: String): String =
        s"""$out AS MATERIALIZED (
             SELECT node, lab FROM (
               SELECT s.dst AS node, l.lab, count(*) AS c,
                 row_number() OVER (PARTITION BY s.dst
                   ORDER BY count(*) DESC, l.lab) AS rn
               FROM sym s JOIN $prev l ON s.src = l.node
               GROUP BY s.dst, l.lab)
             WHERE rn = 1)"""
      s"""WITH li AS MATERIALIZED (
           SELECT DISTINCT l_orderkey AS ok, l_partkey AS pk
           FROM lineitem),
         e AS MATERIALIZED (
           SELECT DISTINCT x.pk AS a, y.pk AS b
           FROM li x JOIN li y ON x.ok = y.ok AND x.pk < y.pk),
         sym AS MATERIALIZED (SELECT a AS src, b AS dst FROM e
                 UNION ALL SELECT b, a FROM e),
         l0 AS MATERIALIZED (SELECT DISTINCT src AS node, src AS lab FROM sym),
         ${lpaRound("l0", "l1")},
         ${lpaRound("l1", "l2")},
         ${lpaRound("l2", "l3")},
         ${lpaRound("l3", "l4")},
         mm AS MATERIALIZED (SELECT CAST(count(*) AS BIGINT) AS m FROM e),
         deg AS MATERIALIZED (SELECT src AS node, CAST(count(*) AS BIGINT) AS deg
                 FROM sym GROUP BY 1),
         comm AS MATERIALIZED (
           SELECT l.lab AS community,
             CAST(count(*) AS BIGINT) AS n_members,
             CAST(sum(d.deg) AS BIGINT) AS deg_sum
           FROM l4 l JOIN deg d ON d.node = l.node GROUP BY 1),
         intra AS MATERIALIZED (
           SELECT la.lab AS community,
             CAST(count(*) AS BIGINT) AS intra_edges
           FROM e
           JOIN l4 la ON la.node = e.a
           JOIN l4 lb ON lb.node = e.b
           WHERE la.lab = lb.lab GROUP BY 1),
         o AS (
           SELECT c.community, c.n_members,
             CAST(coalesce(i.intra_edges, 0) AS BIGINT) AS intra_edges,
             c.deg_sum,
             CAST(4 * mm.m * coalesce(i.intra_edges, 0)
               - c.deg_sum * c.deg_sum AS BIGINT) AS qnum,
             mm.m AS m
           FROM comm c LEFT JOIN intra i USING (community), mm)
         SELECT community, n_members, intra_edges, deg_sum,
           round(CAST(qnum AS DOUBLE) / (4.0 * m * m), 6) + 0.0
             AS q_contrib,
           round(CAST(sum(qnum) OVER () AS DOUBLE) / (4.0 * m * m), 6)
             + 0.0 AS global_q
         FROM o ORDER BY community"""
    },

    "emb_pc2" -> {
      def matvec(mat: String, vprev: String, out: String): String =
        s"""$out AS MATERIALIZED (
             SELECT m.i,
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(m.c * v.val ORDER BY m.j)), (a, b) -> a + b)
                 AS u
             FROM $mat m JOIN $vprev v ON v.j = m.j
             GROUP BY m.i)"""
      def renorm(uprev: String, out: String): String =
        s"""$out AS MATERIALIZED (
             SELECT i AS j,
               CASE WHEN (SELECT max(abs(u)) FROM $uprev) = 0
                 THEN CAST(0.0 AS DOUBLE)
                 ELSE floor(u / (SELECT max(abs(u)) FROM $uprev)
                   * 1000000.0) / 1000000.0 END AS val
             FROM $uprev)"""
      def rayleigh(v: String, u: String, out: String): String =
        s"""$out AS MATERIALIZED (
             SELECT CASE WHEN
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(v.val * v.val ORDER BY v.j)), (a, b) -> a + b)
                 = 0 THEN CAST(0.0 AS DOUBLE) ELSE
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(v.val * u.u ORDER BY v.j)), (a, b) -> a + b) /
               list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
                 list(v.val * v.val ORDER BY v.j)), (a, b) -> a + b)
                 END AS eig
             FROM $v v JOIN $u u ON u.i = v.j)"""
      s"""WITH q AS MATERIALIZED (
           SELECT list_transform(embedding, v ->
             CAST(floor(CAST(v AS DOUBLE) * 1000000.0) AS BIGINT)) AS q
           FROM embeddings),
         dims AS MATERIALIZED (
           SELECT pos - 1 AS i, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(x) AS BIGINT) AS sx
           FROM (SELECT unnest(q) AS x,
                   unnest(range(1, len(q) + 1)) AS pos FROM q)
           GROUP BY 1),
         p AS (
           SELECT unnest(flatten(list_transform(range(0, len(q)),
             i -> list_transform(range(i, len(q)), j ->
               {'i': i, 'j': j, 'xy': q[i + 1] * q[j + 1]})))) AS s
           FROM q),
         prs AS MATERIALIZED (
           SELECT s.i AS i, s.j AS j, CAST(sum(s.xy) AS BIGINT) AS sxy
           FROM p GROUP BY 1, 2),
         tri AS MATERIALIZED (
           SELECT prs.i, prs.j,
             CAST(di.n AS DOUBLE) * CAST(prs.sxy AS DOUBLE)
               - CAST(di.sx AS DOUBLE) * CAST(dj.sx AS DOUBLE) AS c
           FROM prs
           JOIN dims di ON di.i = prs.i
           JOIN dims dj ON dj.i = prs.j),
         cm AS MATERIALIZED (
           SELECT i, j, c FROM tri
           UNION ALL
           SELECT j, i, c FROM tri WHERE i <> j),
         v0 AS (SELECT i AS j, CAST(1.0 AS DOUBLE) AS val FROM dims),
         ${matvec("cm", "v0", "u1")},
         ${renorm("u1", "v1")},
         ${matvec("cm", "v1", "u2")},
         ${renorm("u2", "v2")},
         ${matvec("cm", "v2", "u3")},
         ${renorm("u3", "v3")},
         ${matvec("cm", "v3", "uf")},
         ${rayleigh("v3", "uf", "ray")},
         vv AS MATERIALIZED (
           SELECT list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list(val * val ORDER BY j)), (a, b) -> a + b) AS vv
           FROM v3),
         cm2 AS MATERIALIZED (
           SELECT m.i, m.j,
             m.c - ray.eig * va.val * vb.val / vv.vv AS c
           FROM cm m
           JOIN v3 va ON va.j = m.i
           JOIN v3 vb ON vb.j = m.j, ray, vv),
         w0 AS (SELECT i AS j, CAST(1.0 AS DOUBLE) AS val FROM dims),
         ${matvec("cm2", "w0", "x1")},
         ${renorm("x1", "w1")},
         ${matvec("cm2", "w1", "x2")},
         ${renorm("x2", "w2")},
         ${matvec("cm2", "w2", "x3")},
         ${renorm("x3", "w3")},
         ${matvec("cm2", "w3", "xf")},
         ${rayleigh("w3", "xf", "ray2")}
         SELECT CAST(w.j AS BIGINT) AS pos,
           round(w.val, 6) + 0.0 AS loading2,
           round(ray2.eig / 1000000000000.0, 4) + 0.0 AS eig2_scaled,
           round(ray.eig / 1000000000000.0, 4) + 0.0 AS eig1_scaled
         FROM w3 w, ray, ray2 ORDER BY pos"""
    },

    "text_zipf_rank_score" ->
      """WITH tok AS (
           SELECT doc_id, lang,
             unnest(string_split_regex(lower(text), '\s+')) AS token
           FROM documents),
         vocab AS (SELECT token, count(*) AS cnt FROM tok GROUP BY 1),
         rk AS (
           SELECT token, CAST(row_number() OVER
             (ORDER BY cnt DESC, token) AS BIGINT) AS rank
           FROM vocab),
         g AS (
           SELECT t.doc_id, min(t.lang) AS lang,
             CAST(count(*) AS BIGINT) AS n_tokens,
             list_sort(list(r.rank)) AS rs
           FROM tok t JOIN rk r USING (token) GROUP BY 1)
         SELECT doc_id, lang, n_tokens,
           round(list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
             list_transform(rs, r -> ln(CAST(r AS DOUBLE)))),
             (a, b) -> a + b) / n_tokens, 4) + 0.0 AS mean_ln_rank
         FROM g ORDER BY doc_id""",

    "mm_aspect_buckets" ->
      // strlen = BYTE length in DuckDB: the real path measures UTF-8
      // BYTES (text.cast("binary") → payload.length in Multimodal's
      // decode kernel), and char count diverges on non-ASCII corpora
      """WITH m AS (
           SELECT d.doc_id, CAST(strlen(d.text) AS BIGINT) AS n
           FROM documents d JOIN embeddings e ON d.doc_id = e.vec_id),
         dims AS (
           SELECT doc_id, 64 + n % 512 AS w, 64 + (n * 7) % 512 AS h
           FROM m),
         am AS (SELECT doc_id, w * 1000 // h AS am FROM dims),
         cand AS (
           SELECT doc_id, am,
             unnest([500, 666, 750, 1000, 1333, 1500, 2000]) AS bm
           FROM am),
         pick AS (
           SELECT doc_id, am, bm,
             row_number() OVER (PARTITION BY doc_id
               ORDER BY abs(am - bm), bm) AS rn
           FROM cand),
         pw AS (
           SELECT doc_id, CAST(bm AS BIGINT) AS bm,
             1000 - least(am, bm) * 1000 // greatest(am, bm) AS waste
           FROM pick WHERE rn = 1),
         agg AS (
           SELECT bm AS bucket_milli,
             CAST(count(*) AS BIGINT) AS n_images,
             CAST(sum(waste) AS BIGINT) AS sw
           FROM pw GROUP BY 1)
         SELECT bucket_milli, n_images,
           CAST(n_images * 1000 // (SELECT sum(n_images) FROM agg)
             AS BIGINT) AS share_milli,
           CAST(sw // n_images AS BIGINT) AS mean_waste_milli
         FROM agg ORDER BY bucket_milli""",

    "pipeline_epoch_order" ->
      """WITH e AS (
           SELECT doc_id, unnest([1, 2, 3]) AS epoch FROM documents),
         k AS (
           SELECT doc_id, epoch,
             md5('epoch' || CAST(epoch AS VARCHAR) || ':' ||
               CAST(doc_id AS VARCHAR)) AS key
           FROM e),
         sh AS (
           SELECT epoch, doc_id, key,
             CAST(strpos('0123456789abcdef', substr(key, 1, 1)) - 1
               AS BIGINT) % 4 AS shard
           FROM k),
         rk AS (
           SELECT epoch, shard, doc_id,
             CAST(row_number() OVER (PARTITION BY epoch, shard
               ORDER BY key, doc_id) AS BIGINT) AS rank
           FROM sh)
         SELECT CAST(epoch AS INT) AS epoch, shard,
           CAST(count(*) AS BIGINT) AS n_docs,
           bit_xor(CAST(('0x' || substr(md5(
             CAST(rank AS VARCHAR) || ':' ||
             CAST(doc_id AS VARCHAR)), 1, 12)) AS BIGINT)) AS order_fp
         FROM rk GROUP BY 1, 2
         ORDER BY epoch, shard""")
}
