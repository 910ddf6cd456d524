package graft.tools

import org.apache.spark.sql.SparkSession

/** Stage-level timing for dedup_clusters: pair generation vs the
  * connected-components loop (and the loop's driver-sync count), so a
  * slow clusters query can be attributed. Dev tool, not a gate main.
  */
object CCProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[ccprobe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    // warm the shingle path once so timings are not codegen
    timed("warmup") {
      graft.dedup.Dedup.ngramJaccardPairs(
        graft.dedup.Dedup.shingleBlocks(graft.Tables.spread(
          graft.Tables.load(spark, sfDir, "documents"))), 0.6).count()
    }
    spark.catalog.clearCache()
    val pairs = graft.dedup.Dedup.ngramJaccardPairs(
      graft.dedup.Dedup.shingleBlocks(graft.Tables.spread(
          graft.Tables.load(spark, sfDir, "documents"))), 0.05)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val nPairs = timed("pairs (materialize)") { pairs.count() }
    println(s"[ccprobe] pair count: $nPairs")
    val cc = timed("connectedComponents") {
      val df = graft.dedup.Dedup.connectedComponents(pairs)
      df.count()
    }
    println(s"[ccprobe] cc rows: $cc")
    spark.catalog.clearCache()
    timed("full dedup_clusters query") {
      graft.dedup.Dedup.dupClusters(spark, sfDir).count()
    }
    spark.stop()
  }
}
