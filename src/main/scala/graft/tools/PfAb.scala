package graft.tools

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement-only A/B for the r19 prefixFilterPairsOver persist
  * (guide §1.2): reconstructs the PRE-change form (no persist — the
  * posting subtree computed twice) inline and alternates timed reps
  * against the committed form INSIDE ONE JVM, so both arms share JIT
  * state and box-noise exposure (cross-JVM stash A/Bs were unusable
  * under this box's duty-cycled hypervisor contention).
  * `runMain graft.tools.PfAb <sfDir> <nRepsPerArm>`
  */
object PfAb {
  // the pre-r19 body of Dedup.prefixFilterPairsOver, verbatim minus
  // the persist/count
  private def oldForm(docs0: DataFrame): DataFrame = {
    val docs = docs0
      .filter(size(col("shh")) > 0)
      .select(col("doc_id"), col("shh").as("sh"))
    val posting = docs.select(col("doc_id"), explode(col("sh")).as("tok"))
    val dft = posting.groupBy(col("tok")).agg(count(lit(1)).as("df"))
    val sorted = posting.join(dft, Seq("tok"))
      .groupBy(col("doc_id"))
      .agg(collect_list(struct(col("df"), col("tok"))).as("dt"))
      .select(col("doc_id"),
        expr("transform(sort_array(dt), x -> x.tok)").as("toks"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val pre = sorted.select(col("doc_id"),
        size(col("toks")).cast("long").as("l"),
        explode(slice(col("toks"), lit(1),
          expr("size(toks) - ((size(toks) + 1) div 2) + 1"))).as("tok"))
    val cand = pre.select(col("tok"), col("doc_id").as("doc_a"),
        col("l").as("la"))
      .join(pre.select(col("tok"), col("doc_id").as("doc_b"),
        col("l").as("lb")), Seq("tok"))
      .filter(col("doc_a") < col("doc_b") &&
        least(col("la"), col("lb")) * 2 >= greatest(col("la"), col("lb")))
      .select(col("doc_a"), col("doc_b")).distinct()
    val inter = size(array_intersect(col("ta"), col("tb"))).cast("long")
    cand
      .join(sorted.select(col("doc_id").as("doc_a"), col("toks").as("ta")),
        Seq("doc_a"))
      .join(sorted.select(col("doc_id").as("doc_b"), col("toks").as("tb")),
        Seq("doc_b"))
      .withColumn("n_inter", inter)
      .withColumn("n_union",
        size(col("ta")).cast("long") + size(col("tb")).cast("long")
          - col("n_inter"))
      .filter(col("n_inter") * 2 >= col("n_union"))
      .select(col("doc_a"), col("doc_b"), col("n_inter"), col("n_union"))
      .orderBy(col("doc_a"), col("doc_b"))
  }

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nReps = args.lift(1).map(_.toInt).getOrElse(3)
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
    def newArm(): DataFrame = graft.dedup.Dedup.prefixFilterPairs(spark, sfDir)
    def oldArm(): DataFrame = oldForm(graft.dedup.Dedup.shingleBlocks(
      graft.Tables.spread(graft.Tables.load(spark, sfDir, "documents"))))
    def sample(df: DataFrame): Double = {
      val t0 = System.nanoTime()
      df.agg(bit_xor(xxhash64(struct(col("*"))))).collect()
      val s = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      s
    }
    // untimed JIT warm-up of both arms (the bench fleet warms these
    // kernels before any dedup key is timed)
    sample(oldArm()); sample(newArm())
    val (olds, news) = (1 to nReps).map { _ =>
      (sample(oldArm()), sample(newArm()))
    }.unzip
    def fmt(xs: Seq[Double]) = xs.map(x => f"$x%6.2f").mkString(" ")
    println(s"[pfab] old(no-persist) ${fmt(olds)}")
    println(s"[pfab] new(persist)    ${fmt(news)}")
    println(f"[pfab] medians old=${olds.sorted.apply(olds.size / 2)}%.2f " +
      f"new=${news.sorted.apply(news.size / 2)}%.2f")
    spark.stop()
  }
}
