package graft.sources

import org.scalatest.funsuite.AnyFunSuite

/** The shared parents-drain-before-children gate (r16 verdict item
  * #3), driven offline in the SDK seam's own shapes: BigInt sequence
  * numbers, ListShards-style listings with parentShardId /
  * adjacentParentShardId, retention-expired parents. The registry
  * source's offset model rides the same `advance` — its kill-matrix
  * split/merge streaming tests in KinesisRegistrySourceSpec exercise
  * the gate end-to-end; this spec pins the predicate itself at the
  * seam both feeds share.
  */
class ShardLineageSpec extends AnyFunSuite {
  import ShardLineage._
  import SdkShardFeed.{ShardListing, toMeta}

  // Kinesis-shaped sequence numbers: 56 decimal digits, > Long.MaxValue
  private val seqEnd = "49590338271490256608559692538361571095921575989136588898"
  private def big(s: String) = BigInt(s)

  test("toMeta maps a ListShards listing to the gate's shape") {
    val parent = ShardListing("shardId-000", Nil, Some(seqEnd))
    val child = ShardListing("shardId-002", Seq("shardId-000"), None)
    val merge = ShardListing("shardId-004",
      Seq("shardId-002", "shardId-003"), None)
    assert(toMeta(parent) ==
      ShardMeta("shardId-000", Nil, Some(big(seqEnd))))
    assert(toMeta(child).parents == Seq("shardId-000"))
    assert(toMeta(child).end.isEmpty)
    assert(toMeta(merge).parents ==
      Seq("shardId-002", "shardId-003"))
  }

  test("split child is gated until the parent drains to its end-seq") {
    val metas = Seq(
      toMeta(ShardListing("p", Nil, Some(seqEnd))),
      toMeta(ShardListing("c1", Seq("p"), None)),
      toMeta(ShardListing("c2", Seq("p"), None)))
    val zero = BigInt(-1)
    // consumer mid-parent: children must not be pollable
    val mid = Map("p" -> (big(seqEnd) - 1))
    assert(pollable(metas, mid, zero) == Seq("p"))
    // parent drained exactly to its ending sequence number
    val drainedPos = Map("p" -> big(seqEnd))
    assert(pollable(metas, drainedPos, zero).toSet == Set("p", "c1", "c2"))
  }

  test("merge child is gated on BOTH parents draining") {
    val e2 = (big(seqEnd) + 7).toString
    val metas = Seq(
      toMeta(ShardListing("p1", Nil, Some(seqEnd))),
      toMeta(ShardListing("p2", Nil, Some(e2))),
      toMeta(ShardListing("m", Seq("p1", "p2"), None)))
    val zero = BigInt(-1)
    val oneDrained = Map("p1" -> big(seqEnd), "p2" -> (big(e2) - 1))
    assert(!pollable(metas, oneDrained, zero).contains("m"),
      "one drained parent must not release a merge child")
    val bothDrained = Map("p1" -> big(seqEnd), "p2" -> big(e2))
    assert(pollable(metas, bothDrained, zero).contains("m"))
  }

  test("an OPEN parent (no ending sequence) never drains") {
    val metas = Seq(
      toMeta(ShardListing("p", Nil, None)),
      toMeta(ShardListing("c", Seq("p"), None)))
    val far = Map("p" -> (big(seqEnd) * 10))
    assert(pollable(metas, far, BigInt(-1)) == Seq("p"))
  }

  test("a retention-expired parent (absent from the listing) counts as drained") {
    // Kinesis retires shards past retention: holding the child on a
    // parent that can never be read again would wedge the stream
    val metas = Seq(toMeta(ShardListing("c", Seq("gone"), None)))
    assert(pollable(metas, Map.empty, BigInt(-1)) == Seq("c"))
  }

  test("SHARD_END sentinel drains a parent whose last-read seq sits below its end-seq") {
    // real Kinesis sequence numbers are sparse: the last READABLE
    // record can sit strictly below the listing's
    // endingSequenceNumber, and the drain signal is GetRecords
    // returning a null NextShardIterator (r17 ADVICE). A consumer
    // that checkpoints last-read positions alone would gate the
    // children forever; the atEnd sentinel set is the complement.
    val metas = Seq(
      toMeta(ShardListing("p", Nil, Some(seqEnd))),
      toMeta(ShardListing("c", Seq("p"), None)))
    val zero = BigInt(-1)
    val lastRead = Map("p" -> (big(seqEnd) - 12345)) // below end-seq
    assert(pollable(metas, lastRead, zero) == Seq("p"),
      "without the sentinel the child must stay gated")
    assert(pollable(metas, lastRead, zero, Set("p")).toSet ==
      Set("p", "c"),
      "a null-next-iterator observation must release the child")
    // advance threads the same sentinel
    val adv = advance(metas, Map("c" -> big(seqEnd)), lastRead, zero,
      Set("p"))
    assert(adv("c") == big(seqEnd))
  }

  test("advance holds a gated child and releases it after the drain — the registry offset model") {
    val metas: Seq[ShardMeta[Long]] = Seq(
      ShardMeta("p", Nil, Some(10L)),
      ShardMeta("c", Seq("p"), None))
    val latest = Map("p" -> 10L, "c" -> 4L)
    // batch 1: parent not yet drained in the START offset — child held
    val o1 = advance(metas, latest, Map.empty, 0L)
    assert(o1 == Map("p" -> 10L, "c" -> 0L))
    // batch 2: start offset has the parent drained — child advances
    val o2 = advance(metas, latest, o1, 0L)
    assert(o2 == Map("p" -> 10L, "c" -> 4L))
    // positions never move backwards even if `latest` lags
    val o3 = advance(metas, Map("p" -> 3L, "c" -> 1L), o2, 0L)
    assert(o3 == o2)
  }
}
