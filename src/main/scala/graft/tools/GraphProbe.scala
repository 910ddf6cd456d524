package graft.tools

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.Tables

/** Phase timings for q62_pagerank: edge build vs degree vs per-round
  * cost — run with SPARK_GRAFT_SF_DIR to size. Drives the iteration-
  * loop tuning the bench alone can't attribute.
  */
object GraphProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR",
      "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._
    def t[A](label: String)(f: => A): A = {
      val t0 = System.nanoTime(); val r = f
      println(f"[probe] $label%-28s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
      r
    }
    val li = Tables.load(spark, sfDir, "lineitem")
      .select($"l_orderkey", $"l_suppkey")
    val ord = Tables.load(spark, sfDir, "orders")
      .select($"o_orderkey", $"o_custkey")
    val edges = li.join(ord, $"l_orderkey" === $"o_orderkey")
      .select(($"o_custkey" * 2).as("src"), ($"l_suppkey" * 2 + 1).as("dst"))
      .select(explode(array(
        struct($"src", $"dst"),
        struct($"dst".as("src"), $"src".as("dst")))).as("e"))
      .select($"e.src".as("src"), $"e.dst".as("dst"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    t("edge build+persist") { println(s"  edges=${edges.count()}") }
    val deg = edges.groupBy($"src").agg(count(lit(1)).as("d"))
      .persist(StorageLevel.MEMORY_AND_DISK)
    val n = t("degree") { deg.count() }
    val base = (15L * 1000000000000L) / (100L * n)
    var ranks = deg.select($"src".as("node"),
      lit(1000000000000L / n).as("r"))
    for (i <- 1 to 5) {
      t(s"round $i") {
        val give = ranks.join(deg, ranks("node") === deg("src"))
          .select($"node", expr("r div d").as("give"))
        val next = edges.join(broadcast(give), $"src" === $"node")
          .groupBy($"dst").agg(sum($"give").as("got"))
          .select($"dst".as("node"),
            (lit(base) + expr("85 * got div 100")).as("r"))
          .persist(StorageLevel.MEMORY_AND_DISK)
        next.count()
        ranks = next
      }
    }
    t("top-100") { ranks.orderBy($"r".desc, $"node").limit(100).collect() }

    // 1×/2×/4× scaling: duplicate the trade graph with shifted node
    // ids (disjoint copies — rank mass per copy unchanged) and time
    // one damped round per scale. Linear growth here is the evidence
    // the per-round plan (broadcast join + map-side-collapsed agg)
    // carries to corpus scale; superlinear would flag a shape bug.
    for (mult <- Seq(1, 2, 4)) {
      val shift = 1000000L
      val multi = (0 until mult).map(m =>
        edges.select(($"src" + m * shift).as("src"),
          ($"dst" + m * shift).as("dst"))).reduce(_ unionAll _)
        .persist(StorageLevel.MEMORY_AND_DISK)
      val ne = multi.count()
      val dg = multi.groupBy($"src").agg(count(lit(1)).as("d"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val nn = dg.count()
      val r0 = dg.select($"src".as("node"), lit(1000000000000L / nn).as("r"))
      t(s"scaled round (${mult}x, $ne edges)") {
        val give = r0.join(dg, r0("node") === dg("src"))
          .select($"node", expr("r div d").as("give"))
        multi.join(broadcast(give), $"src" === $"node")
          .groupBy($"dst").agg(sum($"give").as("got")).count()
      }
      multi.unpersist(false); dg.unpersist(false)
    }
    spark.stop()
  }
}
