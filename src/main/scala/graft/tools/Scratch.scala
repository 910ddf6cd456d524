package graft.tools

import graft.Tables
import graft.dedup.Dedup
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Ad-hoc performance probe (not part of the contract). */
object Scratch {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val d = "/root/testdata/sf0.1"

    def time(label: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[scratch] $label%-44s rows=$n%10d ${(System.nanoTime() - t0) / 1e9}%7.2f s")
    }

    val docs = Tables.load(spark, d, "documents")
      .withColumn("toks", split(lower(col("text")), "\\s+"))
      .withColumn("th", Dedup.tokenHashes(col("toks")))
      .withColumn("shh", Dedup.hashedShingles(col("th")))
      .select(col("doc_id"), col("shh"))

    val exploded = docs.select(col("doc_id"), explode(col("shh")).as("h"))
    time("exploded count")(exploded.count())
    time("exploded count again")(exploded.count())

    // variant A: 32 min(xxhash(i,h)) aggs directly
    val minColsA = (0 until 32).map(i =>
      min(xxhash64(lit(i), col("h"))).as(s"m$i"))
    time("A: agg 32 min(xxhash)")(
      exploded.groupBy(col("doc_id")).agg(minColsA.head, minColsA.tail: _*)
        .count())
    time("A again")(
      exploded.groupBy(col("doc_id")).agg(minColsA.head, minColsA.tail: _*)
        .count())

    // variant B: project 32 hash columns, then plain mins
    val hashed = exploded.select(
      (col("doc_id") +: (0 until 32).map(i =>
        xxhash64(lit(i), col("h")).as(s"h$i"))): _*)
    val minColsB = (0 until 32).map(i => min(col(s"h$i")).as(s"m$i"))
    time("B: project hashes + agg plain mins")(
      hashed.groupBy(col("doc_id")).agg(minColsB.head, minColsB.tail: _*)
        .count())
    time("B again")(
      hashed.groupBy(col("doc_id")).agg(minColsB.head, minColsB.tail: _*)
        .count())

    // variant C: only 4 aggs, to see scaling in agg count
    val minColsC = (0 until 4).map(i =>
      min(xxhash64(lit(i), col("h"))).as(s"m$i"))
    time("C: agg 4 min(xxhash)")(
      exploded.groupBy(col("doc_id")).agg(minColsC.head, minColsC.tail: _*)
        .count())

    // variant D: per-row HOF array_min over long shingles
    val sigD = docs.select(col("doc_id"),
      array((0 until 32).map(i =>
        array_min(transform(col("shh"), h => xxhash64(lit(i), h)))): _*)
        .as("sig"))
    time("D: per-row HOF array_min x32")(sigD.count())

    spark.stop()
  }
}
