package graft
import org.apache.spark.sql.SparkSession
object Bench {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    // untimed warm-up: file indexes, parquet footers, codegen/JIT of
    // the common scan+agg+window paths — otherwise the alphabetically
    // first query absorbs ~3-5 s of session start-up
    try {
      import org.apache.spark.sql.functions._
      Tables.names.foreach(n => Tables.load(spark, sfDir, n).count())
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy("l_returnflag").orderBy("l_orderkey")
      Tables.load(spark, sfDir, "lineitem")
        .withColumn("r", row_number().over(w))
        .groupBy("l_returnflag").agg(sum("r")).collect()
      // the dedup expression path (native shingle/minhash/simhash
      // codegen + a tiny banded self-join) compiles here too —
      // otherwise the alphabetically first dedup query absorbs its
      // Janino+JIT cost while later dedup queries run it warm
      val docs = Tables.load(spark, sfDir, "documents").limit(200)
        .select(col("doc_id"),
          graft.functions.ShingleFunctions.shingle_hashes(col("text"))
            .as("shh"))
        .filter(size(col("shh")) > 0)
        .withColumn("sig", graft.functions.ShingleFunctions
          .minhash_signature(col("shh"), 32))
        .withColumn("b", xxhash64(element_at(col("sig"), 1)))
      docs.as("a").join(docs.as("b"), "b").count()
      Tables.load(spark, sfDir, "documents").limit(200)
        .select(col("doc_id"), explode(split(lower(col("text")), "\\s+"))
          .as("tok"))
        .groupBy(col("doc_id"))
        .agg(graft.functions.SimHashAgg.simhash_agg(xxhash64(col("tok"))))
        .count()
    } catch { case _: Throwable => }
    // dev knob: SPARK_GRAFT_ONLY=ann_lsh,ann_bruteforce benches a
    // subset while iterating; the driver never sets it
    val only = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).toSet)
    val selected = SparkEntry.queries.toSeq.sortBy(_._1)
      .filter { case (n, _) => only.forall(_.contains(n)) }
    val failed = scala.collection.mutable.ArrayBuffer[String]()
    val results = selected.map {
      case (name, fn) =>
        val t0 = System.nanoTime()
        // pruning-proof sink: hashing a struct of every column forces
        // the full projection to materialize (a bare count() lets the
        // optimizer delete the projection work of projection-only
        // queries, so their timings measured little more than a scan).
        // bit_xor, not sum — summing full-range hashes overflows long
        // under ANSI mode
        try {
          import org.apache.spark.sql.functions._
          fn(spark, sfDir)
            .agg(bit_xor(xxhash64(struct(col("*"))))).collect()
        } catch { case t: Throwable =>
          // record the failure in the machine-readable output too — a
          // throwing query's time-to-fail would otherwise read as an
          // impressively fast query in the summary JSON
          failed += name
          System.err.println(s"[bench] $name FAILED: ${t.getMessage}")
        }
        val sec = (System.nanoTime() - t0) / 1e9
        System.err.println(f"[bench] $name%-28s $sec%8.2f s")
        // drop caches a query persisted internally: CacheManager
        // matches by logical plan, so a leaked cache would silently
        // serve later queries that scan the same subplan and make
        // their numbers measure cache reads instead of the operator
        spark.catalog.clearCache()
        name -> sec
    }.toMap
    val qs = results.map { case (k, v) => s"\"" + k + "\":" + v }
      .mkString("{", ",", "}")
    val fj = failed.sorted.map("\"" + _ + "\"").mkString("[", ",", "]")
    val total = if (results.nonEmpty) results.values.sum else 0.0
    println(s"""{"metric":"total","value":$total,"unit":"sec","queries":$qs,"failed":$fj,"sf":"$sfDir"}""")
    spark.stop()
  }
}
