package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral guards for q62_pagerank beyond the unrolled-CTE hash
  * match: rank-mass conservation (the fixpoint invariant truncation
  * can only shrink), positivity, and bipartite sanity (both customer
  * and supplier nodes surface in the top-100).
  */
class GraphSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("pagerank: mass conserved within truncation loss, ranks positive") {
    val top = graft.SparkEntry.queries("q62_pagerank")(spark, sf)
      .as[(String, Long)].collect()
    assert(top.nonEmpty && top.length <= 100)
    assert(top.forall(_._2 > 0), "scaled ranks must stay positive")
    // descending by rank, tie-broken by node — verify the contract
    val ranks = top.map(_._2)
    assert(ranks.zip(ranks.tail).forall { case (a, b) => a >= b })
    assert(top.exists(_._1.startsWith("c")) &&
      top.exists(_._1.startsWith("s")),
      "trade graph is bipartite: both node kinds should rank")
    // UNTRUNCATED mass conservation over the full rank table (the
    // registered query's top-100 is just the display cut). Every
    // integer division only SHRINKS mass, so Σr ≤ Scale exactly; the
    // loss per round is < 1 unit per `div` site — ≤ 2 units per node
    // (teleport + got) plus ≤ 1 per edge (give) — so five rounds on
    // this graph lose well under 10·(2n + E) units of 1e12.
    val full = Graph.pagerankFull(spark, sf)
      .agg(sum($"r"), count($"node")).as[(Long, Long)].collect().head
    val (total, n) = full
    val edges = spark.read
      .parquet(s"$sf/lineitem.parquet").count() * 2 // symmetrized
    val scale = 1000000000000L
    assert(total <= scale,
      s"integer truncation can only shrink mass: $total > $scale")
    assert(total >= scale - 10L * (2 * n + edges),
      s"mass $total fell past the truncation bound below $scale")
  }
}
