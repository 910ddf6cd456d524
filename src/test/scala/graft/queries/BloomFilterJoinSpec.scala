package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Runtime Bloom-filter join pruning (Spark 3.3+): a selective filter
  * on one join side injects a bloom filter that pre-prunes the large
  * side's scan output before the shuffle — at 100 TB this is the
  * difference between shuffling the full fact table and shuffling the
  * ~matching slice. Thresholds are lowered so the tiny test tables
  * qualify; production sizes trigger it naturally.
  */
class BloomFilterJoinSpec extends SparkSpec {
  import spark.implicits._

  test("selective dim filter injects a runtime bloom filter on the fact side") {
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100GB",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val li = spark.read
        .parquet("/root/testdata/sf0.001/lineitem.parquet")
      val o = spark.read
        .parquet("/root/testdata/sf0.001/orders.parquet")
        .filter($"o_totalprice" > 300000.0) // selective creation side
      val joined = li.join(o, li("l_orderkey") === o("o_orderkey"))
        .groupBy($"o_orderpriority").agg(count(lit(1)).as("n"))
      val plan = joined.queryExecution.optimizedPlan.toString
      assert(plan.contains("bloom_filter") ||
        plan.contains("BloomFilter") || plan.contains("might_contain"),
        s"no bloom filter injected:\n$plan")
      assert(joined.collect().nonEmpty)
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }
}
