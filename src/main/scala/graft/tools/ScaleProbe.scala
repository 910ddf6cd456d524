package graft.tools

import graft.Tables
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Empirical scaling probe for the dedup hot paths: synthesize a k×
  * corpus by unioning token-renamed copies of `documents` (prefixing
  * every token with the copy index keeps each copy's internal near-dup
  * structure — Jaccard is invariant under injective token renaming —
  * while making cross-copy shingles disjoint), then time the full
  * pipelines at 1×/2×/4×. A corpus-linear pipeline should show
  * time(k×)/time(1×) ≈ k; a quadratic candidate stage shows k².
  *
  *   SPARK_GRAFT_SF_DIR=/root/testdata/sf0.1 \
  *     sbt "runMain graft.tools.ScaleProbe"
  */
object ScaleProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    def corpus(mult: Int): DataFrame = {
      val base = Tables.load(spark, sfDir, "documents")
      (0 until mult).map { i =>
        base.select(
          (col("doc_id") + lit(i.toLong * 10000000L)).as("doc_id"),
          regexp_replace(col("text"), "(\\S+)", s"c${i}_$$1").as("text"),
          col("lang"), col("source"), col("n_chars"))
      }.reduce(_ unionByName _)
        .repartition(spark.sessionState.conf.numShufflePartitions)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

    def shingled(docs: DataFrame): DataFrame =
      docs.withColumn("shh",
          graft.functions.ShingleFunctions.shingle_hashes(col("text")))
        .withColumn("block", concat_ws("#", col("lang"),
          floor(col("n_chars") / 100).cast("long")))
        .select(col("doc_id"), col("block"), col("shh"))

    def time(f: => Long): (Double, Long) = {
      val t0 = System.nanoTime()
      val rows = f
      ((System.nanoTime() - t0) / 1e9, rows)
    }

    // untimed warm-up at 1×: codegen + JIT of the whole pipeline, so
    // the timed 1× row measures the operator, not compilation
    {
      val w = corpus(1); w.count()
      graft.dedup.Dedup.minhashLshOver(shingled(w), 0.5).count()
      graft.dedup.Dedup.simhashOver(w, 3).count()
      graft.dedup.Dedup.ngramJaccardOver(shingled(w), 0.5).count()
      spark.catalog.clearCache()
    }

    // embedding corpus at k×: copy i applies a seeded SIGNED
    // PERMUTATION of the dimensions — an orthogonal transform, so
    // every within-copy pairwise cosine is preserved exactly (the
    // copy's near-dup structure replicates) while cross-copy cosines
    // decorrelate to ~0 — the embedding analogue of the injective
    // token renaming above. (A shared additive offset would instead
    // make all vectors near-parallel: all-pairs candidates.)
    def embCorpus(mult: Int): DataFrame = {
      val base = Tables.load(spark, sfDir, "embeddings")
      (0 until mult).map { i =>
        val rnd = new scala.util.Random(1000 + i)
        val perm = rnd.shuffle((0 until 64).toVector)
        val sign = Vector.fill(64)(if (rnd.nextBoolean()) 1.0 else -1.0)
        val emb =
          if (i == 0) transform(col("embedding"), e => e.cast("double"))
          else array((0 until 64).map(j =>
            element_at(col("embedding"), perm(j) + 1).cast("double") *
              lit(sign(j))): _*)
        base.select(
          (col("vec_id") + lit(i.toLong * 10000000L)).as("vec_id"),
          emb.as("embedding"))
      }.reduce(_ unionByName _)
        .repartition(spark.sessionState.conf.numShufflePartitions)
        .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    }

    Seq(1, 2, 4).foreach { mult =>
      val docs = corpus(mult)
      val n = docs.count() // materialize input out of the timed region
      val sh = shingled(docs)
      val (tMin, rMin) = time(
        graft.dedup.Dedup.minhashLshOver(sh, 0.5).count())
      spark.catalog.clearCache()
      val docs2 = corpus(mult); docs2.count()
      val (tSim, rSim) = time(
        graft.dedup.Dedup.simhashOver(docs2, 3).count())
      spark.catalog.clearCache()
      val docs3 = corpus(mult); docs3.count()
      val (tNg, rNg) = time(
        graft.dedup.Dedup.ngramJaccardOver(shingled(docs3), 0.5).count())
      spark.catalog.clearCache()
      // substring windows: cross-copy 64-char windows are disjoint
      // (every token carries the copy prefix) while within-copy
      // repeated passages replicate — pair counts should scale ~k and
      // wall ~k (the occurrence cap bounds any one window's fan-out)
      val docs4 = corpus(mult); docs4.count()
      val (tSub, rSub) = time(
        graft.dedup.Dedup.substringPairsOver(docs4).count())
      spark.catalog.clearCache()
      // containment: rare-shingle occupancy replicates per copy
      // (cross-copy shingles disjoint), so pairs and wall track ~k
      val docs5 = corpus(mult); docs5.count()
      val (tCont, rCont) = time(
        graft.dedup.Dedup.containmentPairsOver(docs5).count())
      spark.catalog.clearCache()
      // embedding LSH: planesFor re-sizes the plane count per corpus,
      // so candidate counts (and time) should track ~k, not k²
      val embs = embCorpus(mult)
      val nVecs = embs.count()
      val planes = graft.sim.Similarity.planesFor(nVecs, targetBucket = 4)
      val (tEmb, rEmb) = time(
        graft.dedup.Dedup.embeddingLshCandidates(embs, 1, planes).count())
      spark.catalog.clearCache()
      println(f"[scale] mult=$mult docs=$n " +
        f"minhash=$tMin%.1fs($rMin) simhash=$tSim%.1fs($rSim) " +
        f"ngram(0.5)=$tNg%.1fs($rNg) substr=$tSub%.1fs($rSub) " +
        f"contain=$tCont%.1fs($rCont) " +
        f"embLsh[p=$planes]=$tEmb%.1fs($rEmb)")
    }
    spark.stop()
  }
}
