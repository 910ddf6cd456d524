package graft.queries

import graft.{SparkEntry, SparkSpec}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.execution.exchange.BroadcastExchangeExec
import org.apache.spark.sql.execution.joins.{BroadcastHashJoinExec, BroadcastNestedLoopJoinExec}

/** Physical-plan regression guards: the scale properties the queries
  * were designed around must survive future edits — a silently
  * reverted broadcast or lost pushdown is a 100 TB incident that no
  * row-level test catches.
  */
class PlanGuardSpec extends SparkSpec with AdaptiveSparkPlanHelper {

  private val sf = "/root/testdata/sf0.001"

  private def executedPlan(name: String) = {
    val df = SparkEntry.queries(name)(spark, sf)
    df.collect()
    df.queryExecution.executedPlan
  }

  test("q66 hints override the planner: shuffled-hash AND sort-merge appear") {
    val plan = executedPlan("q66_join_hints")
    val shj = collectWithSubqueries(plan) {
      case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
    }
    val smj = collectWithSubqueries(plan) {
      case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
    }
    // both dims are broadcast-sized, so these nodes exist ONLY if the
    // hints actually took precedence over the size-based default
    assert(shj.nonEmpty, "shuffle_hash hint must force ShuffledHashJoin")
    assert(smj.nonEmpty, "merge hint must force SortMergeJoin")
  }

  test("q3_join_agg broadcasts the customer dimension") {
    val plan = executedPlan("q3_join_agg")
    val broadcasts = collectWithSubqueries(plan) {
      case b: BroadcastHashJoinExec => b
    }
    assert(broadcasts.nonEmpty, "customer join must be broadcast")
  }

  test("q13_dim_join broadcasts both dimension tables") {
    val plan = executedPlan("q13_dim_join")
    val exchanges = collectWithSubqueries(plan) {
      case b: BroadcastExchangeExec => b
    }
    assert(exchanges.size >= 2, s"expected 2 broadcast dims, got ${exchanges.size}")
  }

  test("q2_filter_project pushes filters and prunes columns at the scan") {
    val plan = executedPlan("q2_filter_project")
    val scan = collectWithSubqueries(plan) {
      case s: FileSourceScanExec => s
    }.head
    val pushed = scan.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("GreaterThanOrEqual(p_size,30)") &&
      pushed.contains("EqualTo(p_type,ECONOMY)"), s"filters not pushed: $pushed")
    assert(!scan.requiredSchema.fieldNames.contains("p_name") ||
      scan.requiredSchema.fieldNames.length <= 6,
      "scan reads more columns than the projection needs")
  }

  test("q7_topk runs as partial top-k, not a global sort") {
    val df = SparkEntry.queries("q7_topk")(spark, sf)
    df.collect()
    val s = df.queryExecution.executedPlan.toString
    assert(s.contains("TakeOrderedAndProject"),
      s"expected TakeOrderedAndProject in:\n$s")
  }

  test("ann_lsh signature uses the native dot product, not interpreted HOFs") {
    val plan = executedPlan("ann_lsh").toString
    assert(plan.contains("dotproduct"),
      "LSH signature must go through the codegen DotProduct expression")
    assert(!plan.contains("zip_with"),
      "interpreted aggregate(zip_with) crept back into the signature")
  }

  test("dedup queries build shingles/signatures row-local (no explode shuffle)") {
    val lsh = executedPlan("dedup_minhash_lsh").toString
    assert(lsh.contains("shinglehashes") && lsh.contains("minhashsignature"),
      "minhash pipeline must use the native row-local expressions")
    val ngram = executedPlan("dedup_ngram_jaccard").toString
    assert(ngram.contains("shinglehashes"),
      "ngram pipeline must use the native shingle expression")
  }

  test("mm_decode spreads the kernel stage across partitions") {
    val plan = executedPlan("mm_decode").toString
    assert(plan.contains("RoundRobinPartitioning"),
      "decode must repartition before the CPU-heavy kernel stage")
  }

  test("q27_asof_join is join-free: union + one window pass per key") {
    val plan = executedPlan("q27_asof_join").toString
    assert(!plan.contains("Join"),
      s"as-of must not degenerate into a range join:\n$plan")
    assert(plan.contains("Window"), "expected the carry-forward window")
  }

  test("q28_range_join is binned into an equi-join, never nested-loop") {
    val plan = executedPlan("q28_range_join")
    val bnl = collectWithSubqueries(plan) {
      case b: BroadcastNestedLoopJoinExec => b
    }
    assert(bnl.isEmpty,
      "interval predicate must ride the bin equi-join, not a BNL scan")
  }

  test("dedup_embedding_lsh candidates ride a bucket equi-join, never a cross join") {
    val plan = executedPlan("dedup_embedding_lsh")
    val bnl = collectWithSubqueries(plan) {
      case b: BroadcastNestedLoopJoinExec => b
    }
    val cartesian = collectWithSubqueries(plan) {
      case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
    }
    assert(bnl.isEmpty && cartesian.isEmpty,
      "the blocked embedding dedup must never degrade to all-pairs")
  }

  test("Hints.broadcastIfSmall hints below the row gate, shuffles above it") {
    val dim = spark.range(0, 200).toDF("k")
    val fact = spark.range(0, 5000).toDF("k")
    // neutralize size-based auto-broadcast so the HINT is the only
    // mechanism that could broadcast the 200-row dim — otherwise the
    // above-gate assertion would be vacuously satisfied by the planner
    val thrKey = "spark.sql.autoBroadcastJoinThreshold"
    val prevThr = spark.conf.get(thrKey)
    try {
      spark.conf.set(thrKey, "-1")
      val below = fact.join(
        graft.ops.Hints.broadcastIfSmall(dim, 200), Seq("k"))
      below.collect()
      val bhjBelow = collectWithSubqueries(
        below.queryExecution.executedPlan) {
        case b: BroadcastHashJoinExec => b
      }
      assert(bhjBelow.nonEmpty,
        "below the gate the hint must force a broadcast hash join")
      sys.props("graft.bcast.max.rows") = "100"
      try {
        val above = fact.join(
          graft.ops.Hints.broadcastIfSmall(dim, 200), Seq("k"))
        above.collect()
        val plan = above.queryExecution.executedPlan
        val bhjAbove = collectWithSubqueries(plan) {
          case b: BroadcastHashJoinExec => b
        }
        assert(bhjAbove.isEmpty,
          "above the gate no broadcast hint may be applied — the raw " +
            "hint would be honored unconditionally and OOM at scale")
        val shuffled = collectWithSubqueries(plan) {
          case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
          case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
        }
        assert(shuffled.nonEmpty,
          "above the gate the planner must pick a shuffled join strategy")
      } finally sys.props.remove("graft.bcast.max.rows")
    } finally spark.conf.set(thrKey, prevThr)
  }

  test("Hints.broadcastIfSmallBytes hints below the byte gate, shuffles above it") {
    // The array-payload gate (r16 verdict item #2): the triangle
    // kernel's adjacency table carries ΣA = |E| elements, so it is
    // gated on an explicit payload-byte estimate, not rows. Assert
    // both sides with the same hint-only discipline as the row gate.
    import org.apache.spark.sql.functions._
    val dim = spark.range(0, 200).toDF("k")
      .withColumn("nbr", sequence(lit(0L), lit(9L)))
    val fact = spark.range(0, 5000).toDF("k")
    val estBytes = 200L * 10 * 8 + 200L * 32 // elems*8B + rows*32B
    val thrKey = "spark.sql.autoBroadcastJoinThreshold"
    val prevThr = spark.conf.get(thrKey)
    try {
      spark.conf.set(thrKey, "-1")
      val below = fact.join(
        graft.ops.Hints.broadcastIfSmallBytes(dim, estBytes), Seq("k"))
      below.collect()
      val bhjBelow = collectWithSubqueries(
        below.queryExecution.executedPlan) {
        case b: BroadcastHashJoinExec => b
      }
      assert(bhjBelow.nonEmpty,
        "below the byte gate the hint must force a broadcast hash join")
      sys.props("graft.bcast.max.bytes") = (estBytes - 1).toString
      try {
        val above = fact.join(
          graft.ops.Hints.broadcastIfSmallBytes(dim, estBytes), Seq("k"))
        above.collect()
        val plan = above.queryExecution.executedPlan
        val bhjAbove = collectWithSubqueries(plan) {
          case b: BroadcastHashJoinExec => b
        }
        assert(bhjAbove.isEmpty,
          "above the byte gate no broadcast hint may be applied — an " +
            "O(|E|)-byte adjacency broadcast is the OOM the gate kills")
        val shuffled = collectWithSubqueries(plan) {
          case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec => j
          case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec => j
        }
        assert(shuffled.nonEmpty,
          "above the byte gate the planner must pick a shuffled join")
      } finally sys.props.remove("graft.bcast.max.bytes")
    } finally spark.conf.set(thrKey, prevThr)
  }

  test("triangle kernel is strategy-invariant across the byte gate") {
    // q72/q109 must return identical rows whether the adjacency table
    // broadcasts (default gate) or the joins shuffle (gate forced to
    // 0 bytes — the dense-graph 100-TB regime).
    def run(): Seq[String] = {
      val r = SparkEntry.queries("q72_triangle_count")(spark, sf)
        .collect().map(_.toString).toSeq
      spark.catalog.clearCache()
      r
    }
    val below = run()
    val thrKey = "spark.sql.autoBroadcastJoinThreshold"
    val prevThr = spark.conf.get(thrKey)
    sys.props("graft.bcast.max.bytes") = "0"
    try {
      spark.conf.set(thrKey, "-1")
      val above = run()
      assert(above == below,
        "triangle counts must be identical on both sides of the byte gate")
      assert(below.nonEmpty, "sf0.001 must produce triangle rows")
    } finally {
      sys.props.remove("graft.bcast.max.bytes")
      spark.conf.set(thrKey, prevThr)
    }
  }

  test("graph iterations are strategy-invariant across the broadcast gate") {
    // The gated queries must return IDENTICAL rows whether the node
    // tables broadcast (default gate, the measured-fast plan) or the
    // rounds degrade to shuffled joins (gate forced to 0 rows +
    // auto-broadcast off — the 100-TB node-count regime). kcore k=65
    // exercises the cascading peel at sf0.001; pagerank exercises the
    // damped-iteration loop.
    def run(): (Seq[String], Seq[String]) = {
      val pr = SparkEntry.queries("q62_pagerank")(spark, sf)
        .collect().map(_.toString).toSeq
      spark.catalog.clearCache()
      val kc = Graph.kcoreAt(spark, sf, 65)
        .collect().map(_.toString).toSeq
      spark.catalog.clearCache()
      (pr, kc)
    }
    val (prBelow, kcBelow) = run()
    val thrKey = "spark.sql.autoBroadcastJoinThreshold"
    val prevThr = spark.conf.get(thrKey)
    sys.props("graft.bcast.max.rows") = "0"
    try {
      spark.conf.set(thrKey, "-1")
      val (prAbove, kcAbove) = run()
      assert(prAbove == prBelow,
        "pagerank must be identical on both sides of the broadcast gate")
      assert(kcAbove == kcBelow,
        "k-core must be identical on both sides of the broadcast gate")
      assert(kcBelow.nonEmpty, "k=65 must keep a nonempty core at sf0.001")
    } finally {
      sys.props.remove("graft.bcast.max.rows")
      spark.conf.set(thrKey, prevThr)
    }
  }

  test("ann_bruteforce broadcasts the query side and partial-limits the window") {
    val plan = executedPlan("ann_bruteforce")
    val bnl = collectWithSubqueries(plan) {
      case b: BroadcastNestedLoopJoinExec => b
    }
    assert(bnl.nonEmpty, "query side must be broadcast")
    assert(plan.toString.contains("WindowGroupLimit"),
      "top-k must pre-limit per partition before the shuffle")
  }
}
