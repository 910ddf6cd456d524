package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Parity spec for q217_asof_ivm: the staged streaming replay through
  * the production asofEnrichStream (flatMapGroupsWithState, RocksDB)
  * must equal the BATCH as-of join computed independently in Spark
  * (q27_asof_join — the DuckDB gate proves cross-engine parity; this
  * proves streaming-vs-batch parity inside one engine, the IVM claim
  * itself). The cross-batch state carry — a click in an earlier
  * micro-batch enriching a later purchase — is pinned with
  * CONSTRUCTED data in StreamOpsSpec ("streaming as-of join carries
  * click state across micro-batches"); here we additionally assert
  * the fixture actually exercises it: at least one matched purchase
  * lies in a later event-time third than its click.
  */
class AsofIvmSpec extends SparkSpec {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("staged streaming as-of enrich equals the batch as-of join; crosses batches") {
    val batch = graft.SparkEntry.queries("q27_asof_join")(spark, sf)
      .as[(Long, Long, java.sql.Timestamp, Long, Double)].collect()
    spark.catalog.clearCache()
    val streamed = graft.queries.Frontier5
      .queries("q217_asof_ivm")(spark, sf)
      .as[(Long, Long, java.sql.Timestamp, Long, Double)].collect()
    assert(streamed.toSeq == batch.toSeq,
      "staged replay must emit exactly the batch as-of join")
    assert(batch.nonEmpty, "fixture has no enriched purchase — vacuous")
    // the replay cut points (same arithmetic as the query)
    val ev = graft.Tables.load(spark, sf, "events")
      .filter($"event_type".isin("click", "purchase"))
      .select(unix_micros($"ts").as("us"))
    val mm = ev.agg(min($"us"), max($"us")).first
    val (lo, hi) = (mm.getLong(0), mm.getLong(1))
    val t1 = lo + (hi - lo) / 3L
    // click ts per matched pair: join the batch result back to events
    val clicks = graft.Tables.load(spark, sf, "events")
      .filter($"event_type" === "click")
      .select($"event_id".as("click_event_id"),
        unix_micros($"ts").as("cus"))
    val crossThird = graft.SparkEntry.queries("q27_asof_join")(spark, sf)
      .withColumn("pus", unix_micros($"ts"))
      .join(clicks, Seq("click_event_id"))
      .filter($"cus" <= t1 && $"pus" > t1)
      .count()
    assert(crossThird > 0,
      "no matched pair spans the first third-cut — the staged replay " +
        "would not exercise the cross-batch carry at this SF")
  }
}
