package graft.ops

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.Column
import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanHelper
import org.apache.spark.sql.functions._
import java.nio.file.Files

/** Z-order layout: row-group skipping must work on BOTH clustered
  * dimensions, where a linear sort only serves its leading column.
  */
class ZOrderSpec extends SparkSpec with AdaptiveSparkPlanHelper {
  import spark.implicits._

  test("z-ordered layout skips row groups on either dimension") {
    val events = Tables.load(spark, "/root/testdata/sf0.01", "events")
      .withColumn("day", dayofmonth($"ts"))
    val base = Files.createTempDirectory("graft-zorder")
    val linearDir = s"$base/linear"
    val zDir = s"$base/zorder"
    val blockOpt = Map("parquet.block.size" -> "16384")
    // linear: user_id-major sort — day values are scattered per group
    events.repartition(1).sortWithinPartitions($"user_id")
      .write.options(blockOpt).parquet(linearDir)
    ZOrder.cluster(events.repartition(1), $"user_id", $"day", bits = 8)
      .write.options(blockOpt).parquet(zDir)

    def scanRows(dir: String, pred: Column): Long = {
      val q = spark.read.parquet(dir).filter(pred).select($"event_id")
      assert(q.collect().nonEmpty)
      val scan = collectWithSubqueries(q.queryExecution.executedPlan) {
        case s: FileSourceScanExec => s
      }.head
      scan.metrics("numOutputRows").value
    }

    val total = events.count()
    // leading dim: both layouts skip
    assert(scanRows(zDir, $"user_id" === 7L) < total / 2)
    // second dim: the linear layout degenerates to ~full scan, z-order
    // keeps skipping (day bits live in the interleaved code too)
    val linearDay = scanRows(linearDir, $"day" === 3)
    val zDay = scanRows(zDir, $"day" === 3)
    // measured: linear reads ALL 10k rows (day is scattered in every
    // group), z-order ~5.4k — at this tiny scale each ~400-row group
    // still spans many (user, day) cells, so the margin is modest;
    // with production-sized groups over production-sized files the
    // per-group z-span narrows and the skip factor compounds
    assert(linearDay == total,
      s"expected zero day-skipping under user-major sort: $linearDay")
    assert(zDay <= (linearDay * 7) / 10,
      s"z-order should beat linear sort on the 2nd dim: z=$zDay linear=$linearDay")
  }
}
