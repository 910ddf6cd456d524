package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Stage-by-stage timing of the TF-IDF cosine pipeline at a given
  * sfDir — the round-9 re-profiling probe behind the ≤4 s target.
  * Each stage is timed by forcing just its frame (count/collect of a
  * cheap projection) on a cold cache.
  */
object TfidfProfile {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    def timed[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[tfidf] $name%-26s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val docs = graft.Tables.spread(
      graft.Tables.load(spark, sfDir, "documents"))
    docs.count() // warm scan
    val t = split(lower(col("text")), "\\s+")
    val posting = docs
      .filter(size(t) >= 3)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(t) - 2),
          i => concat_ws(" ", element_at(t, i), element_at(t, i + 1),
            element_at(t, i + 2)))).as("term"))
      .groupBy(col("doc_id"), col("term"))
      .agg(count(lit(1)).as("tf"))
    val n = timed("posting (tf groupBy)")(posting.count())
    println(s"[tfidf] posting rows: $n")
    val raw = docs
      .filter(size(t) >= 3)
      .select(col("doc_id"),
        explode(transform(sequence(lit(1), size(t) - 2),
          i => concat_ws(" ", element_at(t, i), element_at(t, i + 1),
            element_at(t, i + 2)))).as("term"))
    val nr = timed("raw explode only")(raw.count())
    println(s"[tfidf] raw term rows: $nr")
    val byTerm = posting.groupBy(col("term"))
      .agg(count(lit(1)).as("df"))
    val nt = timed("df count (term groupBy)")(byTerm.count())
    println(s"[tfidf] distinct terms: $nt")
    val full = timed("full pipeline")(
      graft.dedup.Dedup.tfidfCosinePairs(spark, sfDir).collect().length)
    println(s"[tfidf] result pairs: $full")
    spark.catalog.clearCache()
    val full2 = timed("full pipeline (2nd)")(
      graft.dedup.Dedup.tfidfCosinePairs(spark, sfDir).collect().length)
    println(s"[tfidf] result pairs: $full2")
    spark.stop()
  }
}
