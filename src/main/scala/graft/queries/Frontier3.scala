package graft.queries

import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Round-11 frontier (batch 9): Markov steady-state of the event
  * chain, its entropy rate, and the length-filter policy sweep.
  *
  * Reference note: the reference engine (`/root/reference/`, a Go log
  * forwarder — SURVEY.md §1) has no analytics surface; these extend
  * the Insights/Pipeline families under the house disciplines — exact
  * integer domains until one final IEEE assembly, `Tables.nz` on
  * signable float outputs, sorted-array transcendental folds, driver
  * iteration only on enum-bounded matrices (Bpe.learn discipline),
  * and DuckDB oracles replaying the identical arithmetic.
  */
object Frontier3 {

  def queries: Map[String, Q] = Map(

    // Markov steady-state of the event-type chain — where the session
    // process SPENDS its time in the long run, the summary q40's raw
    // transition counts can't give (a state can be rare as a source
    // yet absorb most long-run mass). Transitions ride q40's exact
    // per-user lead window; the row-stochastic matrix is enum²-BOUNDED
    // (≤|event types|² rows) so the fixed 4 power rounds from the
    // uniform vector run DRIVER-LOCAL (the Bpe.learn / emb_pc2
    // split: corpus passes distributed, tiny iteration local).
    // Determinism: matvec folds ascending over source states in
    // doubles, each round floor-quantized to 1e-9 — the DuckDB oracle
    // unrolls the identical rounds (list_reduce ORDER BY src).
    // obs_share is the EMPIRICAL source-state mass (exact longs, one
    // IEEE divide); steady_pi − obs_share is the burn-in gap.
    "q159_markov_steady" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val trans = Tables.load(s, d, "events")
        .withColumn("next_type", lead($"event_type", 1).over(w))
        .filter($"next_type".isNotNull)
        .groupBy($"event_type".as("src"), $"next_type".as("dst"))
        .agg(count(lit(1)).as("n"))
        .as[(String, String, Long)].collect() // enum²-bounded
      val states = trans.flatMap(t => Seq(t._1, t._2)).distinct.sorted
      val idx = states.zipWithIndex.toMap
      val k = states.length
      val nMat = Array.ofDim[Long](k, k)
      trans.foreach { case (a, b, n) => nMat(idx(a))(idx(b)) = n }
      val rowTot = nMat.map(_.sum)
      val total = rowTot.sum
      // v' = v P, ascending source fold, 1e-9 floor quantize/round
      var v = Array.fill(k)(1.0 / k)
      for (_ <- 1 to 4) {
        val u = Array.tabulate(k) { j =>
          var acc = 0.0
          var i = 0
          while (i < k) {
            if (rowTot(i) > 0L && nMat(i)(j) > 0L)
              acc += v(i) * (nMat(i)(j).toDouble / rowTot(i).toDouble)
            i += 1
          }
          acc
        }
        v = u.map(x => math.floor(x * 1.0e9) / 1.0e9)
      }
      states.zipWithIndex.map { case (st, i) =>
        (st, rowTot(i), v(i)) }.toSeq
        .toDF("state", "n_out", "pi")
        .select($"state", $"n_out",
          Tables.nz(round($"n_out".cast("double") / total.toDouble, 6))
            .as("obs_share"),
          Tables.nz(round($"pi", 6)).as("steady_pi"))
        .orderBy($"state")
    }),

    // First-order entropy rate of the event chain — HOW PREDICTABLE
    // the next event is given the current one, the sequence-structure
    // number neither q103's hour entropy nor q119's field MI sees.
    // Per source state: H(dst|src) as a transcendental fold over the
    // dst-SORTED (dst, n) struct array (q106's discipline — one
    // deterministic IEEE association order); the global rate
    // Σ π(src)·H(·|src) and the zeroth-order entropy H₀ fold over the
    // src-sorted per-state table inside a ONE-ROW aggregate, joined
    // back via crossJoin(broadcast) — never a partition-less window.
    // Everything upstream is exact longs; predictability_gain
    // 1 − H_rate/H₀ is the "how much does knowing the current state
    // help" headline (0 = memoryless stream).
    "q160_entropy_rate" -> ((s, d) => {
      import s.implicits._
      val w = Window.partitionBy($"user_id").orderBy($"ts", $"event_id")
      val perSrc = Tables.load(s, d, "events")
        .withColumn("next_type", lead($"event_type", 1).over(w))
        .filter($"next_type".isNotNull)
        .groupBy($"event_type".as("state"), $"next_type".as("dst"))
        .agg(count(lit(1)).as("n"))
        .groupBy($"state")
        .agg(sum($"n").as("n_out"),
          sort_array(collect_list(struct($"dst", $"n"))).as("arr"))
        .select($"state", $"n_out",
          expr("""aggregate(arr, CAST(0.0 AS DOUBLE), (a, x) ->
               a - (CAST(x.n AS DOUBLE) / CAST(n_out AS DOUBLE)) *
                 ln(CAST(x.n AS DOUBLE) / CAST(n_out AS DOUBLE)))""")
            .as("h_raw"))
      val glob = perSrc
        .agg(sum($"n_out").as("tot"),
          sort_array(collect_list(struct($"state", $"n_out", $"h_raw")))
            .as("g"))
        .select($"tot",
          expr("""aggregate(g, CAST(0.0 AS DOUBLE), (a, x) ->
               a + (CAST(x.n_out AS DOUBLE) / CAST(tot AS DOUBLE)) *
                 x.h_raw)""").as("h_rate_raw"),
          expr("""aggregate(g, CAST(0.0 AS DOUBLE), (a, x) ->
               a - (CAST(x.n_out AS DOUBLE) / CAST(tot AS DOUBLE)) *
                 ln(CAST(x.n_out AS DOUBLE) / CAST(tot AS DOUBLE)))""")
            .as("h0_raw"))
      perSrc.crossJoin(broadcast(glob))
        .select($"state", $"n_out",
          Tables.nz(round($"h_raw", 4)).as("h_cond"),
          Tables.nz(round($"h_rate_raw", 4)).as("h_rate"),
          Tables.nz(round($"h0_raw", 4)).as("h0"),
          Tables.nz(round(
            when($"h0_raw" === 0.0, lit(0.0))
              .otherwise(lit(1.0) - $"h_rate_raw" / $"h0_raw"), 4))
            .as("predictability_gain"))
        .orderBy($"state")
    }),

    // Supplier lead-time reliability — per supplier: order-to-ship
    // lag (l_shipdate − o_orderdate), the ≤30-day fill rate, and
    // exact p50/p90 lag via ops.Quantiles' count-table pass (the lag
    // value domain is DAYS — tiny — so per-group state is
    // domain-sized, never row-sized). The supply-chain twin of
    // q153's priority-level SLA: q153 rates the ORDER pipeline, this
    // rates each SUPPLIER — the table a procurement re-negotiation
    // reads. One fact-fact orderkey shuffle join (q153/q81's
    // no-broadcast discipline) + the Quantiles scan; exact integer
    // days and milli rates throughout.
    "q161_supplier_leadtime" -> ((s, d) => {
      import s.implicits._
      val li = Tables.load(s, d, "lineitem")
        .select($"l_orderkey", $"l_suppkey", $"l_shipdate")
        .join(Tables.load(s, d, "orders")
          .select($"o_orderkey", $"o_orderdate"),
          $"l_orderkey" === $"o_orderkey")
        .select($"l_suppkey",
          datediff($"l_shipdate", $"o_orderdate").cast("long")
            .as("lag_days"))
      val base = li.groupBy($"l_suppkey")
        .agg(count(lit(1)).as("n_items"),
          sum(when($"lag_days" <= 30L, 1L).otherwise(0L))
            .as("n_fast"))
      val qs = graft.ops.Quantiles.exactByGroup(li, "l_suppkey",
        $"lag_days", Seq("p50_lag_days" -> 0.5,
          "p90_lag_days" -> 0.9)).drop("n")
      base.join(qs, Seq("l_suppkey"))
        .select($"l_suppkey", $"n_items",
          expr("n_fast * 1000 div n_items").as("within30_milli"),
          $"p50_lag_days", $"p90_lag_days")
        .orderBy($"l_suppkey")
    }),

    // Length-filter policy sweep — the retention table a curation
    // round reads BEFORE committing a token-count filter (the
    // pipeline_pack_efficiency stance applied to the quality gate):
    // docs/tokens kept per (min_tokens, max_tokens) candidate cell.
    // The corpus pass is ONE map-side-combined rollup to the
    // token-count HISTOGRAM (value-domain-sized, the ops.Quantiles
    // count-table discipline); the 20-cell literal grid then joins
    // the broadcast histogram — corpus size never multiplies the
    // grid. Shares are exact integer milli.
    "pipeline_filter_sweep" -> ((s, d) => {
      import s.implicits._
      val hist = Tables.load(s, d, "documents")
        .select(size(split(lower($"text"), "\\s+")).cast("long")
          .as("t"))
        .groupBy($"t").agg(count(lit(1)).as("nd"))
      val tot = hist.agg(sum($"nd").as("tot_docs"),
        sum($"t" * $"nd").as("tot_toks"))
      val grid = Seq(1L, 8L, 16L, 32L, 64L)
        .flatMap(mn => Seq(128L, 256L, 512L, 1024L).map(mx => (mn, mx)))
        .toDF("min_tokens", "max_tokens")
      grid.join(broadcast(hist),
          $"t" >= $"min_tokens" && $"t" <= $"max_tokens", "left")
        .groupBy($"min_tokens", $"max_tokens")
        .agg(coalesce(sum($"nd"), lit(0L)).as("docs_kept"),
          coalesce(sum($"t" * $"nd"), lit(0L)).as("tokens_kept"))
        .crossJoin(broadcast(tot))
        .select($"min_tokens", $"max_tokens", $"docs_kept",
          $"tokens_kept",
          expr("docs_kept * 1000 div tot_docs").as("docs_share_milli"),
          expr("tokens_kept * 1000 div tot_toks")
            .as("tokens_share_milli"))
        .orderBy($"min_tokens", $"max_tokens")
    }))

  def oracles: Map[String, String] = Map(

    "q159_markov_steady" -> {
      // the fold MUST be an ordered list_reduce, not sum(): double
      // summation order is unspecified for sum, and the Scala side
      // folds ascending over source states
      def round0(vprev: String, out: String): String =
        s"""$out AS MATERIALIZED (
             SELECT st.j,
               floor(coalesce((
                 SELECT list_reduce(
                   list_prepend(CAST(0.0 AS DOUBLE),
                     list(v.val * (CAST(p.n AS DOUBLE) /
                       CAST(rt.tot AS DOUBLE)) ORDER BY p.i)),
                   (a, b) -> a + b)
                 FROM p
                 JOIN rt ON rt.i = p.i
                 JOIN $vprev v ON v.j = p.i
                 WHERE p.j = st.j), 0.0)
                 * 1000000000.0) / 1000000000.0 AS val
             FROM states st)"""
      s"""WITH o AS (
           SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS next_type
           FROM events),
         tr AS (
           SELECT event_type AS src, next_type AS dst,
             CAST(count(*) AS BIGINT) AS n
           FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2),
         states AS MATERIALIZED (
           SELECT s AS state,
             CAST(row_number() OVER (ORDER BY s) AS BIGINT) AS j
           FROM (SELECT DISTINCT src AS s FROM tr
                 UNION SELECT DISTINCT dst FROM tr)),
         p AS MATERIALIZED (
           SELECT si.j AS i, sj.j AS j, t.n
           FROM tr t
           JOIN states si ON si.state = t.src
           JOIN states sj ON sj.state = t.dst),
         rt AS MATERIALIZED (
           SELECT i, CAST(sum(n) AS BIGINT) AS tot FROM p GROUP BY 1),
         k AS (SELECT CAST(count(*) AS BIGINT) AS k FROM states),
         tot AS (SELECT CAST(sum(n) AS BIGINT) AS total FROM tr),
         v0 AS (SELECT j, 1.0 / (SELECT k FROM k) AS val FROM states),
         ${round0("v0", "v1")},
         ${round0("v1", "v2")},
         ${round0("v2", "v3")},
         ${round0("v3", "v4")}
         SELECT st.state, coalesce(rt.tot, 0) AS n_out,
           round(CAST(coalesce(rt.tot, 0) AS DOUBLE) /
             CAST(tot.total AS DOUBLE), 6) + 0.0 AS obs_share,
           round(v4.val, 6) + 0.0 AS steady_pi
         FROM states st
         LEFT JOIN rt ON rt.i = st.j
         JOIN v4 ON v4.j = st.j, tot
         ORDER BY st.state"""
    },

    "q160_entropy_rate" ->
      """WITH o AS (
           SELECT user_id, event_type,
             lead(event_type) OVER (PARTITION BY user_id
               ORDER BY ts, event_id) AS next_type
           FROM events),
         tr AS (
           SELECT event_type AS state, next_type AS dst,
             CAST(count(*) AS BIGINT) AS n
           FROM o WHERE next_type IS NOT NULL GROUP BY 1, 2),
         rowt AS (
           SELECT state, CAST(sum(n) AS BIGINT) AS n_out
           FROM tr GROUP BY 1),
         per AS MATERIALIZED (
           SELECT t.state, CAST(max(r.n_out) AS BIGINT) AS n_out,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(-(CAST(t.n AS DOUBLE) / CAST(r.n_out AS DOUBLE)) *
                 ln(CAST(t.n AS DOUBLE) / CAST(r.n_out AS DOUBLE))
                 ORDER BY t.dst)),
               (a, b) -> a + b) AS h_raw
           FROM tr t JOIN rowt r ON r.state = t.state
           GROUP BY t.state),
         tt AS (SELECT CAST(sum(n_out) AS BIGINT) AS tot FROM per),
         gl AS MATERIALIZED (
           SELECT tt.tot,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list((CAST(n_out AS DOUBLE) /
                 CAST(tt.tot AS DOUBLE)) * h_raw
                 ORDER BY state)), (a, b) -> a + b) AS h_rate_raw,
             list_reduce(list_prepend(CAST(0.0 AS DOUBLE),
               list(-(CAST(n_out AS DOUBLE) /
                 CAST(tt.tot AS DOUBLE)) *
                 ln(CAST(n_out AS DOUBLE) /
                   CAST(tt.tot AS DOUBLE))
                 ORDER BY state)), (a, b) -> a + b) AS h0_raw
           FROM per, tt GROUP BY tt.tot)
         SELECT p.state, p.n_out,
           round(p.h_raw, 4) + 0.0 AS h_cond,
           round(g.h_rate_raw, 4) + 0.0 AS h_rate,
           round(g.h0_raw, 4) + 0.0 AS h0,
           round(CASE WHEN g.h0_raw = 0 THEN 0.0
             ELSE 1.0 - g.h_rate_raw / g.h0_raw END, 4) + 0.0
             AS predictability_gain
         FROM per p, gl g ORDER BY p.state""",

    "q161_supplier_leadtime" ->
      """WITH li AS (
           SELECT l.l_suppkey,
             CAST(date_diff('day', o.o_orderdate, l.l_shipdate)
               AS BIGINT) AS lag_days
           FROM lineitem l JOIN orders o
             ON l.l_orderkey = o.o_orderkey),
         base AS (
           SELECT l_suppkey, CAST(count(*) AS BIGINT) AS n_items,
             CAST(sum(CASE WHEN lag_days <= 30 THEN 1 ELSE 0 END)
               AS BIGINT) AS n_fast
           FROM li GROUP BY 1),
         r AS (
           SELECT l_suppkey, lag_days,
             row_number() OVER (PARTITION BY l_suppkey
               ORDER BY lag_days) AS rn,
             count(*) OVER (PARTITION BY l_suppkey) AS n
           FROM li),
         q AS (
           SELECT l_suppkey,
             min(CASE WHEN rn = CAST(floor(0.5 * (n - 1)) AS BIGINT)
               + 1 THEN lag_days END) AS p50_lag_days,
             min(CASE WHEN rn = CAST(floor(0.9 * (n - 1)) AS BIGINT)
               + 1 THEN lag_days END) AS p90_lag_days
           FROM r GROUP BY 1)
         SELECT b.l_suppkey, b.n_items,
           CAST(b.n_fast * 1000 // b.n_items AS BIGINT)
             AS within30_milli,
           q.p50_lag_days, q.p90_lag_days
         FROM base b JOIN q ON q.l_suppkey = b.l_suppkey
         ORDER BY b.l_suppkey""",

    "pipeline_filter_sweep" ->
      """WITH hist AS (
           SELECT CAST(len(string_split_regex(lower(text), '\s+'))
             AS BIGINT) AS t, CAST(count(*) AS BIGINT) AS nd
           FROM documents GROUP BY 1),
         tot AS (
           SELECT CAST(sum(nd) AS BIGINT) AS tot_docs,
             CAST(sum(t * nd) AS BIGINT) AS tot_toks
           FROM hist),
         grid AS (
           SELECT mn.mn AS min_tokens, mx.mx AS max_tokens
           FROM (SELECT unnest([1, 8, 16, 32, 64]) AS mn) mn
           CROSS JOIN (SELECT unnest([128, 256, 512, 1024]) AS mx) mx),
         agg AS (
           SELECT g.min_tokens, g.max_tokens,
             CAST(coalesce(sum(h.nd), 0) AS BIGINT) AS docs_kept,
             CAST(coalesce(sum(h.t * h.nd), 0) AS BIGINT)
               AS tokens_kept
           FROM grid g
           LEFT JOIN hist h
             ON h.t >= g.min_tokens AND h.t <= g.max_tokens
           GROUP BY 1, 2)
         SELECT CAST(min_tokens AS BIGINT) AS min_tokens,
           CAST(max_tokens AS BIGINT) AS max_tokens,
           docs_kept, tokens_kept,
           CAST(docs_kept * 1000 // tot_docs AS BIGINT)
             AS docs_share_milli,
           CAST(tokens_kept * 1000 // tot_toks AS BIGINT)
             AS tokens_share_milli
         FROM agg, tot ORDER BY min_tokens, max_tokens""")
}
