package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Exact per-group discrete quantiles without a row-level sort.
  *
  * The p-th DISCRETE quantile of a multiset is the value at 0-indexed
  * rank floor(p·(n−1)) of the sorted order — a deterministic VALUE
  * even where row_number ties are not, which is what makes it safe to
  * hash-compare cross-engine (q20's approx family explicitly is not).
  * The classical formulation is a per-group sort + row_number; at
  * scale that is either a global sort or a per-group single task.
  * This operator instead:
  *
  *   1. collapses rows to the (group, value) COUNT table — one
  *      map-side-combined shuffle, sized by the VALUE DOMAIN per
  *      group, not the row count;
  *   2. runs PrefixSum.runningTotal over the global (group, value)
  *      order — the two-pass distributed scan;
  *   3. recovers per-group cumulative counts by subtracting each
  *      group's start offset (a group-sized broadcast), and reads
  *      quantile p as the least value whose cumulative count reaches
  *      rank floor(p·(n−1)) + 1 — a plain min-when aggregate.
  *
  * Used by q77_winsorize (p05/p95 clamp), q80_mad (median, twice) and
  * q83_rfm's bucket cousins; QuantilesSpec pins equality with the
  * sorted-array definition.
  */
object Quantiles {

  /** One row per group: `groupCol`, n, and one `name` column per
    * requested (name, p) holding that discrete quantile of `value`.
    * `value` must be long-typed (the integer-cents discipline).
    */
  def exactByGroup(df: DataFrame, groupCol: String, value: Column,
      ps: Seq[(String, Double)]): DataFrame =
    exactByGroupCounts(
      df.select(col(groupCol), value.as("__qv"))
        .groupBy(col(groupCol), col("__qv"))
        .agg(count(lit(1)).as("__qc")),
      groupCol, ps)

  /** Same, over a pre-built `(groupCol, __qv, __qc)` count table — for
    * callers that already rolled rows up to the value domain (and
    * often need other aggregates off the SAME table: q161 derives its
    * fill-rate counters from it too, so the fact scan runs once
    * instead of twice — r19, guide §1.2).
    */
  def exactByGroupCounts(vc: DataFrame, groupCol: String,
      ps: Seq[(String, Double)]): DataFrame = {
    val cum = PrefixSum.runningTotal(vc,
      Seq(col(groupCol), col("__qv")), col("__qc"), "__qcum")
    val base = cum.groupBy(col(groupCol))
      .agg(min(col("__qcum") - col("__qc")).as("__qbase"),
        sum(col("__qc")).as("n"))
    val within = cum.join(broadcast(base), Seq(groupCol))
      .withColumn("__qin", col("__qcum") - col("__qbase"))
    val aggs = ps.map { case (name, p) =>
      min(when(col("__qin") >=
          floor(lit(p) * (col("n") - 1)) + 1, col("__qv")))
        .as(name)
    }
    within.groupBy(col(groupCol))
      .agg(max(col("n")).as("n"), aggs: _*)
  }

  /** SQL ntile(k)'s tile id as row-local arithmetic over a
    * 1-indexed rank column and a total-count column (both long):
    * with q = n div k and rem = n mod k, the first `rem` tiles hold
    * q+1 rows, the rest q — exactly the fill rule ntile() applies,
    * so a PrefixSum rank + this expression replaces the single-task
    * un-partitioned ntile window while hash-matching engines that run
    * the real ntile (q73_equidepth, q83_rfm and their oracles). When
    * n < k the WHEN branch covers every row (rem = n), so the q=0
    * division in the ELSE arm is never evaluated (CASE is lazy
    * per-row — no ANSI divide-by-zero).
    */
  def ntileFromRank(rn: String, n: String, k: Int): Column = {
    val q = s"($n div $k)"
    val rem = s"($n % $k)"
    expr(s"""CAST(CASE WHEN $rn <= $rem * ($q + 1)
         THEN ($rn - 1) div ($q + 1) + 1
         ELSE $rem + ($rn - $rem * ($q + 1) - 1) div $q + 1
         END AS BIGINT)""")
  }
}
