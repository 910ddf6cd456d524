package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** THIRD-decade scale evidence (r17 verdict item #7): stack
  * [[Sf1Probe]]'s disjoint-copy scaling a third time (sf10 →
  * "sf100", 1000× the driver's sf0.1 corpus — 600M lineitem, 10M
  * events, 5M docs, 2M vectors, ~16 GB parquet) and measure the
  * top-cpu scan-bound representatives whose 100 TB story so far
  * rests on two decades: emb_cka (the board's cpu cost leader,
  * 3,015 cpu-s at sf10), ann_lsh (the ANN family's PRODUCTION
  * serving path — the brute-force eval tiers ann_mmr /
  * ann_hybrid_rrf are excluded by the capacity rule documented on
  * [[heavy]]), and dedup_tfidf_cosine (the dedup family's
  * designed-linear row).
  *
  * Same generation discipline, token prefix e (c → d → e keeps the
  * per-copy renames injective across decades and salts the
  * embedding sign-flips so copies decorrelate against both prior
  * decades). Reports e = log10(t_sf100 / t_sf10); the remedy bar is
  * e > 1.1 (PLANS.md third-decade table).
  *
  *   sbt "runMain graft.tools.Sf100Probe"          # gen + probe
  *   sbt "runMain graft.tools.Sf100Probe genonly"  # build corpus only
  *   sbt "runMain graft.tools.Sf100Probe only=emb_cka"
  *
  * Operational: NEVER probe in the JVM that generated the corpus
  * (r16 lesson — page-cache/heap pollution inflates the first walls);
  * run `genonly`, then probe in a fresh invocation on an idle box.
  */
object Sf100Probe {

  val srcDir = "/tmp/graft-sf10"
  val dstDir = "/tmp/graft-sf100"

  /** The third-decade tier: the r17 verdict's named cost leader, the
    * dedup family's designed-linear representative, and the ANN
    * family's PRODUCTION path. The brute-force eval tiers (ann_mmr,
    * ann_hybrid_rrf's dense ranker) are deliberately NOT here: their
    * per-query top-k sort spills ∝ corpus × queries ≈ 48 GB at sf100,
    * past this box's free disk (measured: the first probe run died
    * SPILL_OUT_OF_MEMORY on ann_mmr's stage) — they are measured
    * under the capacity rule in [[bruteCap]] instead, and ann_lsh
    * stands in as the corpus-wide ANN path that actually runs at
    * this scale.
    */
  val heavy: Seq[String] = Seq(
    "emb_cka", "dedup_tfidf_cosine", "ann_lsh")

  /** The brute eval tiers MEASURED under their written capacity rule
    * (r18 verdict item #2): at sf100 on one box the full ≤1000-query
    * tier sorts ~2×10⁹ (score, id) pairs ≈ 48 GB of spill (the first
    * probe died SPILL_OUT_OF_MEMORY), and the rule says cut the
    * truth tier to ≤100 queries — tierMod 1000 IS that cut, the same
    * plan verbatim at a 10×-smaller query panel. Both decades run
    * the capped tier, so the growth exponent is like-for-like.
    */
  val bruteCap: Seq[(String, (SparkSession, String) => DataFrame)] =
    Seq(
      "ann_mmr[q<=100]" ->
        ((s: SparkSession, d: String) =>
          graft.queries.Frontier9.mmrRerank(s, d, tierMod = 1000)),
      "ann_hybrid_rrf[q<=100]" ->
        ((s: SparkSession, d: String) =>
          graft.sim.Similarity.hybridRrf(s, d, k = 10, tierMod = 1000)))

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    val sf10Marker = new java.io.File(s"$srcDir/.graft-complete")
    require(sf10Marker.exists(),
      s"run graft.tools.Sf10Probe first to build $srcDir")
    val marker = new java.io.File(s"$dstDir/.graft-complete")
    if (args.contains("regen") || !marker.exists()) {
      Sf1Probe.generate(spark, srcDir, dstDir, "e")
      marker.createNewFile()
    }
    if (args.contains("genonly")) { spark.stop(); return }

    val osBean = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]

    // same pruning-proof sink as Bench/Sf1Probe/Sf10Probe
    def time(df: => DataFrame): (Double, Double) = {
      val c0 = osBean.getProcessCpuTime
      val t0 = System.nanoTime()
      df.agg(bit_xor(xxhash64(struct(col("*"))))).collect()
      val wall = (System.nanoTime() - t0) / 1e9
      val cpu = (osBean.getProcessCpuTime - c0) / 1e9
      spark.catalog.clearCache()
      (wall, cpu)
    }

    Seq(srcDir, dstDir).foreach { d =>
      Tables.names.foreach(n => Tables.load(spark, d, n).count())
    }
    // JIT/codegen warm-up off the small end
    time(SparkEntry.queries("emb_dim_corr")(spark, srcDir))

    val only = args.collectFirst {
      case a if a.startsWith("only=") =>
        a.stripPrefix("only=").split(",").map(_.trim).toSet
    }
    println("| query | sf10 wall | sf100 wall | growth exp | sf10 cpu | sf100 cpu |")
    println("|---|---|---|---|---|---|")
    val rows = heavy.map(n => n -> SparkEntry.queries(n)) ++ bruteCap
    rows.filter { case (n, _) => only.forall(_.contains(n)) }
      .foreach { case (name, fn) =>
        val (w10, c10) = time(fn(spark, srcDir))
        val (w100, c100) = time(fn(spark, dstDir))
        val e = math.log10(w100 / w10)
        println(f"| $name | $w10%.2f s | $w100%.2f s | $e%.2f | $c10%.1f | $c100%.1f |")
      }
    spark.stop()
  }
}
