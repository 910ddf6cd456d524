package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Parity spec for q212_interval_join_ivm: the staged streaming
  * replay must equal a BATCH interval join computed independently in
  * Spark (the DuckDB gate proves cross-engine parity; this proves
  * streaming-vs-batch parity inside one engine, the IVM claim
  * itself). The cross-batch buffered-state carry — a click arriving
  * in an earlier micro-batch matching a later purchase — is pinned
  * with CONSTRUCTED data in StreamOpsSpec ("a click arriving AFTER
  * the purchase's micro-batch still joins"); whether the sf0.001
  * fixture happens to place a match within 30 min of a staged
  * third-cut is data luck, so it is not asserted here.
  */
class IntervalJoinIvmSpec extends SparkSpec {
  import spark.implicits._
  private val sf = "/root/testdata/sf0.001"

  test("staged streaming interval join equals the batch join; crosses batches") {
    val ev = graft.Tables.load(spark, sf, "events")
      .select($"user_id", $"ts", $"event_id", $"value", $"event_type")
    val c = ev.filter($"event_type" === "click")
      .select($"user_id", $"ts".as("click_ts"), $"event_id".as("click_id"))
    val p = ev.filter($"event_type" === "purchase")
      .select($"user_id", $"ts".as("purchase_ts"),
        $"event_id".as("purchase_id"), $"value")
    val batch = c.join(p, Seq("user_id"))
      .filter($"click_ts" <= $"purchase_ts" &&
        $"click_ts" >= $"purchase_ts" - expr("interval 30 minutes"))
      .select($"user_id", $"purchase_id", $"purchase_ts",
        $"click_id", $"click_ts", $"value")
      .orderBy($"purchase_id", $"click_id")
      .as[(Long, Long, java.sql.Timestamp, Long, java.sql.Timestamp,
        Double)].collect()
    val streamed = graft.queries.Frontier5
      .queries("q212_interval_join_ivm")(spark, sf)
      .as[(Long, Long, java.sql.Timestamp, Long, java.sql.Timestamp,
        Double)].collect()
    assert(streamed.toSeq == batch.toSeq,
      "staged replay must emit exactly the batch interval join")
    assert(batch.nonEmpty, "fixture has no attributed purchase — vacuous")
  }
}
