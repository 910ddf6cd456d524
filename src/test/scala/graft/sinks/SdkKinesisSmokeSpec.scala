package graft.sinks

import graft.sinks.KinesisSink.RecordEntry
import org.scalatest.funsuite.AnyFunSuite

/** Opt-in integration smoke for the real-SDK transport seams
  * (reference basestreamer.go:65-87's `PutRecords` + the consumer
  * iterator loop). The reflective `SdkRecordsClient`/`SdkShardFeed`
  * compile offline and fail fast without the SDK — this spec is the
  * missing derisk of the PRODUCTION path: it drives both seams
  * against a real Kinesis stream when, and only when, the operator
  * opts in.
  *
  * Gating (all three required, else the tests CANCEL — they never
  * fail a build where the SDK is absent, which includes this offline
  * container):
  *   - `GRAFT_SDK_SMOKE=1` in the environment (explicit opt-in);
  *   - `GRAFT_SDK_SMOKE_STREAM=<existing stream name>`;
  *   - `software.amazon.awssdk:kinesis` resolvable on the classpath.
  * Region/credentials ride the normal SDK chain; set
  * `GRAFT_SDK_SMOKE_REGION` to pin a region.
  *
  * See IMPLEMENTATION.md §"Real-SDK integration smoke" for the
  * one-liner that runs this against a dev stream.
  */
class SdkKinesisSmokeSpec extends AnyFunSuite {

  private def sdkPresent: Boolean =
    try {
      Class.forName(
        "software.amazon.awssdk.services.kinesis.KinesisClient")
      true
    } catch { case _: ClassNotFoundException => false }

  private def gate(): (String, Option[String]) = {
    assume(sys.env.get("GRAFT_SDK_SMOKE").contains("1"),
      "set GRAFT_SDK_SMOKE=1 to run the real-SDK integration smoke")
    assume(sdkPresent,
      "software.amazon.awssdk:kinesis is not on the classpath")
    val stream = sys.env.get("GRAFT_SDK_SMOKE_STREAM")
    assume(stream.isDefined, "set GRAFT_SDK_SMOKE_STREAM")
    (stream.get, sys.env.get("GRAFT_SDK_SMOKE_REGION"))
  }

  test("producer seam: PutRecords delivers a marked batch with zero failures") {
    val (stream, region) = gate()
    val client = new SdkRecordsClient(region, None)
    val marker = s"graft-smoke-${System.nanoTime()}"
    val res = client.putRecords(stream, Seq(
      RecordEntry(s"$marker-0".getBytes("UTF-8"), "smoke"),
      RecordEntry(s"$marker-1".getBytes("UTF-8"), "smoke")))
    assert(res.failedIndices.isEmpty,
      s"PutRecords reported failures: ${res.errors.mkString("; ")}")
  }

  test("consumer seam: the marked batch reads back through the shard feed") {
    val (stream, region) = gate()
    val client = new SdkRecordsClient(region, None)
    val feed = new graft.sources.SdkShardFeed(region, None)
    val marker = s"graft-smoke-${System.nanoTime()}"
    val put = client.putRecords(stream,
      Seq(RecordEntry(marker.getBytes("UTF-8"), "smoke")))
    assert(put.failedIndices.isEmpty)
    // poll each shard from a recent horizon until the marker appears;
    // a single-record smoke should surface within a few seconds
    val deadline = System.currentTimeMillis() + 30000
    var found = false
    while (!found && System.currentTimeMillis() < deadline) {
      found = feed.listShards(stream).exists { shard =>
        var it = feed.iteratorFor(stream, shard, None) // TRIM_HORIZON
        var hops = 0
        var hit = false
        while (!hit && it != null && hops < 20) {
          val (recs, next) = feed.getRecords(it, 1000)
          hit = recs.exists(r => new String(r.data, "UTF-8") == marker)
          it = next.orNull
          hops += 1
        }
        hit
      }
      if (!found) Thread.sleep(1000)
    }
    assert(found, s"marker $marker not read back within 30 s")
  }
}
