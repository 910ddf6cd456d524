package graft.tools

import graft.{SparkEntry, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Second-decade scale evidence (r12 verdict item #4): stack
  * [[Sf1Probe]]'s disjoint-copy scaling once more (sf1 → "sf10",
  * 100× the driver's sf0.1 corpus — 60M lineitem, 1M events, 500k
  * docs, 200k vectors) and measure the heavy tier whose 100× claim
  * so far rested on ONE measured decade: q158_modularity, q138_hits,
  * ann_hybrid_rrf, emb_effective_dim, emb_dim_corr. Reports the
  * per-decade growth exponent e = log10(t_sf10 / t_sf1); linear
  * operators show e ≈ 1.
  *
  * The generation discipline is Sf1Probe's, applied to the sf1
  * corpus: keys offset per copy by a power of ten above their max
  * (joins stay valid, the graph scales as disjoint components),
  * document tokens renamed injectively with a d{i}_ prefix (distinct
  * from sf1's c{i}_, so shingle structure is preserved intra-copy
  * and disjoint across copies), embeddings sign-flipped with a
  * prefix-salted pattern (orthogonal: intra-copy cosines exact,
  * cross-copy decorrelated vs BOTH the sf1 copies and each other).
  *
  *   SPARK_DRIVER_MEM=48g sbt "runMain graft.tools.Sf10Probe"
  *   sbt "runMain graft.tools.Sf10Probe regen only=q138_hits"
  *   sbt "runMain graft.tools.Sf10Probe genonly"   # build corpus, skip probes
  */
object Sf10Probe {

  val srcDir = "/tmp/graft-sf1"
  val dstDir = "/tmp/graft-sf10"

  /** The second-decade tier: every op the r12 verdict flagged as
    * resting on a single measured decade.
    */
  val heavy: Seq[String] = Seq(
    "q158_modularity", "q138_hits", "ann_hybrid_rrf",
    "emb_effective_dim", "emb_dim_corr",
    // round-15 (r14 verdict item #4): every >40 cpu-s family gets a
    // measured second decade — the dedup blocking tier, the sweep
    // that composes it, and the pagerank representative of the graph
    // family's cheap half
    "dedup_prefix_filter", "dedup_tfidf_cosine", "dedup_containment",
    "pipeline_dedup_sweep", "q62_pagerank",
    // round-16: one representative per new family shape — the
    // PrefixSum support-CDF scaffold (domain-bounded support is the
    // scale claim), the 4×-exploded eval-tier brute force, the
    // seed-biased graph loop, and the row-local scramble layout
    "q203_wasserstein", "emb_matryoshka_eval", "q213_ppr",
    "pipeline_span_corruption",
    // round-17 (r16 verdict item #7): the r16 top-cpu keys under
    // load. ann_hybrid_rrf's r14 row predates the fixed ≤1000-query
    // eval tier, so its current shape needed a fresh second decade;
    // emb_abtt had only the first decade on record
    "emb_abtt",
    // round-17 batch shapes: the capped-tier greedy rerank (scan-
    // bound claim) and the d²-panel covariance CKA (corpus passes
    // amortize into fixed d-bounded work)
    "ann_mmr", "emb_cka")

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

    val sf1Marker = new java.io.File(s"$srcDir/.graft-complete")
    require(sf1Marker.exists(),
      s"run graft.tools.Sf1Probe first to build $srcDir")
    val marker = new java.io.File(s"$dstDir/.graft-complete")
    if (args.contains("regen") || !marker.exists()) {
      Sf1Probe.generate(spark, srcDir, dstDir, "d")
      marker.createNewFile()
    }
    if (args.contains("genonly")) { spark.stop(); return }

    val osBean = java.lang.management.ManagementFactory
      .getOperatingSystemMXBean
      .asInstanceOf[com.sun.management.OperatingSystemMXBean]

    // same pruning-proof sink as Bench/Sf1Probe
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
    println("| query | sf1 wall | sf10 wall | growth exp | sf1 cpu | sf10 cpu |")
    println("|---|---|---|---|---|---|")
    heavy.filter(n => only.forall(_.contains(n))).foreach { name =>
      val fn = SparkEntry.queries(name)
      val (w1, c1) = time(fn(spark, srcDir))
      val (w10, c10) = time(fn(spark, dstDir))
      val e = math.log10(w10 / w1)
      println(f"| $name | $w1%.2f s | $w10%.2f s | $e%.2f | $c1%.1f | $c10%.1f |")
    }
    spark.stop()
  }
}
