package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._

/** Hive-style partitioned layout + partition pruning — the physical
  * property that makes 100 TB scans cheap when queries filter on the
  * partition column (only matching directories are listed/read).
  */
class PartitionPruningSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  test("filter on partition column prunes partitions at the scan") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    docs.write.mode("overwrite").partitionBy("lang").parquet(dir)

    val q = spark.read.parquet(dir).filter($"lang" === "en")
      .select($"doc_id", $"n_chars")
    // collect() runs THIS queryExecution's plan — count() would build
    // a separate one and leave these metrics untouched
    assert(q.collect().nonEmpty)
    val scans = collectWithSubqueries(q.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }
    assert(scans.nonEmpty)
    val scan = scans.head
    // partition filter reached the scan, and only lang=en files listed
    assert(scan.partitionFilters.nonEmpty,
      "expected partitionFilters on the scan")
    // df.inputFiles lists the PRE-pruning file index; the post-pruning
    // evidence is the executed scan's numFiles metric: 1 of 5 lang dirs
    assert(scan.metrics("numFiles").value == 1,
      s"expected 1 pruned file, read ${scan.metrics("numFiles").value}")
    // column pruning: only requested columns in the read schema
    assert(scan.requiredSchema.fieldNames.toSet == Set("doc_id", "n_chars"))
  }

  test("predicate pushdown reaches the parquet row-group filters") {
    val li = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet")
      .filter($"l_quantity" >= 49.0).select($"l_orderkey")
    val scans = collectWithSubqueries(li.queryExecution.executedPlan) {
      case s: FileSourceScanExec => s
    }
    val pushed = scans.head.metadata.getOrElse("PushedFilters", "")
    assert(pushed.contains("GreaterThanOrEqual(l_quantity"),
      s"filter not pushed: $pushed")
  }
}
