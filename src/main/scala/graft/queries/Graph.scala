package graft.queries

import org.apache.spark.sql.functions._
import org.apache.spark.storage.StorageLevel

import graft.{Q, Tables}

/** Iterative graph analytics on the relational surface (round 7).
  *
  * The reference (`/root/reference/`, a record-at-a-time log forwarder —
  * SURVEY.md §2a) has no multi-record state at all; PageRank-class
  * iteration is the §2b extension a curation pipeline uses for
  * source-authority weighting (rank hosts by who links to them, weight
  * documents by host rank). No link data exists in the synthetic corpus,
  * so the graph is the customer↔supplier trade network implied by
  * orders⋈lineitem — the iteration machinery is what is under test.
  *
  * Cross-engine determinism: ranks live in SCALED LONGS (1e12 = rank
  * mass 1.0) and every step is integer arithmetic — `div` truncation on
  * both engines, order-free integer sums — so five iterations stay
  * hash-identical to DuckDB with no float fold order to flip a bit.
  *
  * 100 TB shape: the edge list is the only corpus-sized frame. It is
  * shuffled ONCE (repartition by src, persisted); each Lloyd-style
  * round joins it against a node-sized rank table that travels as a
  * broadcast (nodes ≪ edges — hosts vs links), then one groupBy(dst)
  * integer-sum shuffle of (dst, long) pairs — payloads never move. If
  * the node table outgrows the broadcast threshold the same plan
  * degrades to a shuffled hash join on src, co-partitioned with the
  * persisted edge layout. Driver holds two scalars (node count, base
  * term), never a vertex vector.
  */
object Graph {

  /** Rank-mass scale: 1.0 of PageRank mass = 1e12 scaled units. */
  private val Scale = 1000000000000L

  def queries: Map[String, Q] = Map(

    // 5-round damped PageRank (d = 0.85) over the symmetric
    // customer↔supplier trade graph; top-100 authorities. The oracle
    // unrolls the SAME five integer iterations as chained CTEs —
    // aggregation inside a recursive term is non-standard SQL, and the
    // unrolled chain makes the per-round parity explicit.
    "q62_pagerank" -> ((s, d) => {
      import s.implicits._
      val li = Tables.load(s, d, "lineitem")
        .select($"l_orderkey", $"l_suppkey")
      val ord = Tables.load(s, d, "orders")
        .select($"o_orderkey", $"o_custkey")
      val pairs = li.join(ord, $"l_orderkey" === $"o_orderkey")
        .select(
          concat(lit("c"), $"o_custkey".cast("string")).as("src"),
          concat(lit("s"), $"l_suppkey".cast("string")).as("dst"))
        .distinct()
      val edges = pairs
        .union(pairs.select($"dst".as("src"), $"src".as("dst")))
        .repartition($"src")
        .persist(StorageLevel.MEMORY_AND_DISK)
      val deg = edges.groupBy($"src").agg(count(lit(1)).as("d"))
        .persist(StorageLevel.MEMORY_AND_DISK)
      val n = deg.count() // driver scalar: node count
      val base = (15L * Scale) / (100L * n) // (1-d)/N teleport term
      var ranks = deg.select($"src".as("node"), lit(Scale / n).as("r"))
      for (_ <- 1 to 5) {
        // give = r div outdeg, attached node-locally; the edge join is
        // map-side (broadcast), only (dst, give) longs shuffle
        val give = ranks.join(deg, ranks("node") === deg("src"))
          .select($"node", expr("r div d").as("give"))
        ranks = edges.join(broadcast(give), $"src" === $"node")
          .groupBy($"dst").agg(sum($"give").as("got"))
          .select($"dst".as("node"),
            (lit(base) + expr("85 * got div 100")).as("r"))
      }
      ranks.orderBy($"r".desc, $"node").limit(100)
        .select($"node", $"r".as("rank_scaled"))
    }),

  )

  def oracles: Map[String, String] = Map(

    "q62_pagerank" -> {
      // Five unrolled integer iterations; itK reads it(K-1). Each round
      // re-derives give = r // deg then sums over in-edges — identical
      // operation order to the Spark loop.
      def round(prev: String, cur: String): String =
        s"""$cur AS (
           SELECT e.dst AS node,
             CAST((SELECT b FROM base) +
                  (85 * sum(p.r // dg.d)) // 100 AS BIGINT) AS r
           FROM edges e
           JOIN $prev p ON e.src = p.node
           JOIN deg dg ON e.src = dg.src
           GROUP BY e.dst)"""
      s"""WITH pairs AS (
           SELECT DISTINCT 'c' || CAST(o.o_custkey AS VARCHAR) AS src,
                           's' || CAST(l.l_suppkey AS VARCHAR) AS dst
           FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey),
         edges AS (
           SELECT src, dst FROM pairs
           UNION ALL
           SELECT dst AS src, src AS dst FROM pairs),
         deg AS (SELECT src, count(*) AS d FROM edges GROUP BY 1),
         nn AS (SELECT count(*) AS n FROM deg),
         base AS (SELECT CAST(15000000000000 // (100 * n) AS BIGINT) AS b
                  FROM nn),
         r0 AS (SELECT src AS node,
                  CAST(1000000000000 // (SELECT n FROM nn) AS BIGINT) AS r
                FROM deg),
         ${round("r0", "it1")},
         ${round("it1", "it2")},
         ${round("it2", "it3")},
         ${round("it3", "it4")},
         ${round("it4", "it5")}
         SELECT node, r AS rank_scaled FROM it5
         ORDER BY r DESC, node LIMIT 100"""
    },

  )
}
