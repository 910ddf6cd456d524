package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper

/** Co-located joins via bucketing — the "pre-shuffle once, join many
  * times free" pattern for repeated large-table joins at 100 TB
  * (SURVEY.md §2b / prompt's partitioning guidance). Asserts the
  * physical property that matters: a join of two tables bucketed on
  * the join key runs with NO shuffle exchange.
  */
class BucketingSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  test("join of co-bucketed tables has no shuffle exchange") {
    // default spark-warehouse dir (warehouse.dir is a static conf);
    // tables are dropped in the finally block
    val facts = (1 to 10000).map(i => (i.toLong % 100, s"f$i"))
      .toDF("k", "fv")
    val dims = (0 to 99).map(i => (i.toLong, s"d$i")).toDF("k", "dv")
    facts.write.mode("overwrite").bucketBy(8, "k")
      .sortBy("k").saveAsTable("facts_b")
    dims.write.mode("overwrite").bucketBy(8, "k")
      .sortBy("k").saveAsTable("dims_b")
    // disable auto-broadcast so the join would otherwise shuffle
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val joined = spark.table("facts_b").join(spark.table("dims_b"), "k")
      val executed = {
        joined.count() // force execution so AQE finalizes the plan
        joined.queryExecution.executedPlan
      }
      val shuffles = collectWithSubqueries(executed) {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"expected shuffle-free co-bucketed join, found: $shuffles")
      assert(joined.count() == 10000)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10MB")
      spark.sql("DROP TABLE IF EXISTS facts_b")
      spark.sql("DROP TABLE IF EXISTS dims_b")
    }
  }
}
