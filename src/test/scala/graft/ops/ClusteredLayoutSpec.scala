package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Data-layout clustering: writing sort-clustered parquet lets
  * row-group min/max stats skip most of the file for selective
  * predicates — the layout lever (Z-order's 1-D case) that turns a
  * 100 TB scan into a few-GB scan for key-ranged queries. Asserted by
  * comparing the scan's output-rows metric between clustered and
  * unclustered layouts under the same pushed filter.
  */
class ClusteredLayoutSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  test("range-clustered layout skips row groups for selective filters") {
    val events = Tables.load(spark, "/root/testdata/sf0.01", "events")
    val base = Files.createTempDirectory("graft-layout")
    val unsortedDir = s"$base/unsorted"
    val sortedDir = s"$base/sorted"
    // tiny row groups so the 10k-row file has many of them
    val blockOpt = Map("parquet.block.size" -> "16384")
    events.repartition(1).write.options(blockOpt).parquet(unsortedDir)
    events.repartition(1).sortWithinPartitions($"user_id")
      .write.options(blockOpt).parquet(sortedDir)

    def scanOutputRows(dir: String): Long = {
      val q = spark.read.parquet(dir).filter($"user_id" === 7L)
        .select($"event_id")
      assert(q.collect().nonEmpty)
      val scan = collectWithSubqueries(q.queryExecution.executedPlan) {
        case s: FileSourceScanExec => s
      }.head
      scan.metrics("numOutputRows").value
    }

    val unsortedRows = scanOutputRows(unsortedDir)
    val sortedRows = scanOutputRows(sortedDir)
    // both produce identical results; the clustered layout reads far
    // fewer rows because whole row groups fail the min/max check
    assert(sortedRows < unsortedRows / 2,
      s"clustering did not reduce scan: sorted=$sortedRows unsorted=$unsortedRows")
  }
}
