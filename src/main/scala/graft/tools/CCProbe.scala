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
    // r20 (VERDICT r19 item 4): pipeline_dedup_sweep tier attribution
    // — the sweep shares dedup_prefix_filter's pair kernel but reads
    // ~1 s slower steady-state; decompose exactly its tiers.
    spark.catalog.clearCache()
    locally {
      import org.apache.spark.sql.functions._
      val docs = graft.Tables.spread(
        graft.Tables.load(spark, sfDir, "documents"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      timed("sweep: docs materialize") { docs.count() }
      val keep1 = docs
        .select(col("doc_id"), md5(col("text")).as("digest"))
        .groupBy(col("digest")).agg(min(col("doc_id")).as("doc_id"))
        .select(col("doc_id"))
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
      timed("sweep: keep1 digest rollup") { keep1.count() }
      val survivors = docs.join(keep1, Seq("doc_id"))
      val pairs2 = timed("sweep: prefix-filter pairs") {
        val p = graft.dedup.Dedup.prefixFilterPairsOver(
          graft.dedup.Dedup.shingleBlocks(survivors))
          .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
        p.count()
        p
      }
      timed("sweep: connectedComponents") {
        graft.dedup.Dedup.connectedComponents(pairs2).count()
      }
      spark.catalog.clearCache()
      timed("sweep: full query") {
        graft.SparkEntry.queries("pipeline_dedup_sweep")(spark, sfDir)
          .agg(bit_xor(xxhash64(struct(col("*"))))).collect()
      }
      spark.catalog.clearCache()
      timed("prefix_filter: full query") {
        graft.SparkEntry.queries("dedup_prefix_filter")(spark, sfDir)
          .agg(bit_xor(xxhash64(struct(col("*"))))).collect()
      }
    }
    spark.stop()
  }
}
