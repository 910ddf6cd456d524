package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, Window, WindowGroupLimit}

/** Board-wide partition-less-window discipline (r10 verdict item #2).
  *
  * A `Window.orderBy(...)` with no `partitionBy` plans as a SINGLE
  * task holding the entire sorted input — the one window shape that
  * cannot scale (ops.PrefixSum's scaladoc; the r10 verdict found
  * three of these shipped in one unreviewed batch). This spec makes
  * the discipline mechanical: it walks the physical plan of EVERY
  * registered query and fails on any `WindowExec` whose partitionSpec
  * is empty, unless the query is on the explicit whitelist below —
  * and each whitelist entry documents the bound that makes its
  * single-partition frame safe (a post-limit top-k, an enum/decile
  * domain, a count-of-counts table…). The whitelist is also checked
  * the other way: an entry whose query no longer plans a
  * partition-less window is STALE and fails, so the list can never
  * rot into a blanket exemption.
  *
  * `WindowGroupLimitExec` with empty partitionSpec is NOT flagged on
  * its own: it is precisely the partial top-k guard (each task emits
  * ≤ k rows before the single-partition rank finishes), so a
  * partition-less WindowExec fed by a WindowGroupLimit sees ≤
  * k·partitions rows — those queries still appear in the whitelist
  * (the bound is the group limit), keeping the inventory complete.
  *
  * The plan inspected is `queryExecution.optimizedPlan` — the
  * logical plan AFTER the optimizer (so WindowGroupLimit inference
  * has run; logical `Window` maps 1:1 onto `WindowExec`), walked
  * including all subquery plans, before any execution — the walk
  * costs planning time only (driver-imperative constructors like the
  * graph loops still run their own bounded jobs while building).
  */
class WindowGuardSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  /** query name → the documented bound that makes its partition-less
    * window frame single-task-safe. Every entry names WHY the frame
    * is domain-bounded, not corpus-bounded (source comments at each
    * site carry the same rationale).
    */
  private val whitelist: Map[String, String] = Map(
    "mm_aspect_buckets" ->
      "share divide rides sum() OVER () on the 7-row canonical-bucket aggregate (literal grid)",
    "pipeline_vocab_encode" ->
      "id-assignment window over the top-1000-BOUNDED vocabulary (top-k selected before the window)",
    "pipeline_weighted_sample" ->
      "rank window on the post-TakeOrderedAndProject 50-row frame (orderBy+limit runs first)",
    "pipeline_skew_report" ->
      "rank window on the post-TakeOrderedAndProject 5-row frame (orderBy+limit runs first)",
    "q105_gains_table" ->
      "cumulative window over the 10-row decile aggregate; the customer rank itself rides PrefixSum",
    "q112_skew_profile" ->
      "windows over the count-of-counts table, bounded by distinct multiplicities, never by keys",
    "q120_survival_km" ->
      "reverse cumulative over the months-bounded risk table (<= span/30 rows at any corpus size)",
    "q202_nelson_aalen" ->
      "reverse cumulative over the months-bounded risk table (q120's frame; <= span/30 rows at any corpus size)",
    "q223_rmst" ->
      "reverse cumulative over the months-bounded risk table (q120's frame; <= span/30 rows at any corpus size)",
    "q133_rfm_migration" ->
      "period-offset windows over the 2-row period table; per-period ranks ride PrefixSum",
    "pipeline_quality_classifier" ->
      "AUC rank window over the round(score,4) value domain — <= 10001 distinct-score rows at any corpus size",
    "q143_2hop_reach" ->
      "rank window on the post-limit 100-row reach frame (TakeOrdered runs before the window)",
    "q158_modularity" ->
      "global-Q sum over the community-bounded aggregate (partitionBy(lit(1)) constant-folds to bare)",
    "q68_bitmask_agg" ->
      "bit-assignment window over the distinct event-type enum (64-type universe by contract)",
    "text_heaps_fit" ->
      "cumulative window over the 10-row corpus-order checkpoint curve")

  test("no registered query plans an unbounded partition-less window") {
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    val clean = scala.collection.mutable.ArrayBuffer[String]()
    SparkEntry.queries.toSeq.sortBy(_._1).foreach { case (name, fn) =>
      val df = fn(spark, sf)
      val root = df.queryExecution.optimizedPlan
      val plans: Seq[LogicalPlan] = root +: root.subqueriesAll
      val bare = plans.flatMap(_.collect {
        case w: Window if w.partitionSpec.isEmpty => w
      })
      val limited = plans.flatMap(_.collect {
        case w: WindowGroupLimit if w.partitionSpec.isEmpty => w
      })
      if (bare.nonEmpty) {
        if (!whitelist.contains(name))
          offenders += s"$name (${bare.size} bare WindowExec, " +
            s"${limited.size} group-limited)"
      } else if (whitelist.contains(name)) clean += name
      spark.catalog.clearCache()
    }
    assert(offenders.isEmpty,
      s"partition-less WindowExec outside the whitelist:\n  " +
        offenders.mkString("\n  "))
    assert(clean.isEmpty,
      s"stale whitelist entries (no partition-less window planned):\n  " +
        clean.mkString("\n  "))
  }
}
