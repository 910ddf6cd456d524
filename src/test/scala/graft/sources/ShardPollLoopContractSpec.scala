package graft.sources

import org.scalatest.funsuite.AnyFunSuite

import SdkShardFeed.{FeedRecord, ShardListing}
import ShardPollLoop.ConsumerState

/** Localstack-style contract suite for the reshard-drain semantics
  * (r18 verdict item #6): the SAME checkpointing poll loop the real
  * SDK feed plugs into ([[ShardPollLoop]] over [[ShardRecordFeed]])
  * is driven against a scripted service that reproduces the two
  * SDK-shaped signals the offline ShardLineageSpec shapes can't:
  *
  *   - SPARSE sequence numbers — every closed shard's
  *     endingSequenceNumber sits strictly ABOVE its last readable
  *     record's sequence number, as on real Kinesis;
  *   - the null NextShardIterator SHARD_END observation, delivered
  *     only when GetRecords actually walks a closed shard past its
  *     last record.
  *
  * The headline assertion is the GetRecords ordering contract: a
  * reshard child opens only after EVERY parent hit SHARD_END.
  */
class ShardPollLoopContractSpec extends AnyFunSuite {

  /** Scripted shard: records are pre-assigned sparse sequence
    * numbers; `closed` shards report `endingSeq` in the listing and
    * signal SHARD_END (a None next-iterator) once a GetRecords call
    * has consumed past the last record.
    */
  case class ShardDef(id: String, parents: Seq[String],
      records: Seq[FeedRecord], endingSeq: Option[String]) {
    require(endingSeq.forall(e => records.forall(r =>
      BigInt(r.sequenceNumber) < BigInt(e))),
      s"$id: a sparse-seq fixture keeps every record BELOW the bound")
  }

  def rec(seq: Long, key: String): FeedRecord =
    FeedRecord(seq.toString, s"payload-$seq".getBytes("UTF-8"), key)

  /** In-memory service implementing the consumer-feed contract.
    * Iterators encode (shard, index); `getRecords` pages `limit`
    * records and returns None — SHARD_END — only for a closed shard
    * with nothing left to read.
    */
  class FakeKinesis(shards: Seq[ShardDef]) extends ShardRecordFeed {
    val byId: Map[String, ShardDef] = shards.map(s => s.id -> s).toMap
    var getRecordsCalls: List[String] = Nil

    def listShardsDetailed(stream: String): Seq[ShardListing] =
      shards.map(s => ShardListing(s.id, s.parents, s.endingSeq))

    def iteratorFor(stream: String, shardId: String,
        afterSeq: Option[String]): String = {
      val s = byId(shardId)
      val idx = afterSeq match {
        case None => 0
        case Some(a) => s.records
          .indexWhere(r => BigInt(r.sequenceNumber) > BigInt(a)) match {
            case -1 => s.records.size
            case i => i
          }
      }
      s"$shardId@$idx"
    }

    def getRecords(shardIterator: String, limit: Int)
        : (Seq[FeedRecord], Option[String]) = {
      val Array(id, idxS) = shardIterator.split("@")
      val s = byId(id)
      getRecordsCalls ::= id
      val idx = idxS.toInt
      val page = s.records.slice(idx, idx + limit)
      val nextIdx = idx + page.size
      val exhausted = nextIdx >= s.records.size
      val next =
        if (exhausted && s.endingSeq.isDefined) None // SHARD_END
        else Some(s"$id@$nextIdx")
      (page, next)
    }
  }

  // Merge topology with sparse bounds: A(100,250,370|end 500) and
  // B(5000,5120|end 6000) merge into open child C(10000,10010).
  def mergeFixture(): FakeKinesis = new FakeKinesis(Seq(
    ShardDef("shardId-A", Nil,
      Seq(rec(100, "k1"), rec(250, "k2"), rec(370, "k1")), Some("500")),
    ShardDef("shardId-B", Nil,
      Seq(rec(5000, "k3"), rec(5120, "k4")), Some("6000")),
    ShardDef("shardId-C", Seq("shardId-A", "shardId-B"),
      Seq(rec(10000, "k1"), rec(10010, "k3")), None)))

  test("merge child opens only after BOTH parents hit SHARD_END") {
    val svc = mergeFixture()
    // limit=1 forces multiple GetRecords hops per parent, so the
    // SHARD_END observation arrives strictly after the last record
    val (recs, st) = ShardPollLoop.drainAll(svc, "s", limit = 1)
    val order = recs.map(_._1)
    val firstChild = order.indexOf("shardId-C")
    assert(firstChild >= 0, "child records must eventually surface")
    val parentsAfterChild = order.drop(firstChild)
      .count(id => id == "shardId-A" || id == "shardId-B")
    assert(parentsAfterChild == 0,
      s"per-key ordering violated: parent records after child in $order")
    assert(recs.count(_._1 == "shardId-A") == 3)
    assert(recs.count(_._1 == "shardId-B") == 2)
    assert(recs.count(_._1 == "shardId-C") == 2)
    assert(st.atEnd == Set("shardId-A", "shardId-B"),
      "both closed parents carry the positive SHARD_END observation")
    // sparse-seq reality check: checkpointed positions sit BELOW the
    // listing bounds even though both shards are fully drained
    assert(st.pos("shardId-A") == BigInt(370) &&
      st.pos("shardId-B") == BigInt(5120))
  }

  test("one drained parent is not enough — the child stays gated") {
    val svc = mergeFixture()
    // cycle 1 (limit high): both parents read fully AND observe
    // SHARD_END? No — with limit=10 the first GetRecords returns all
    // records but next-iterator still Some (page not past the end)…
    // so walk cycle by cycle and track admission.
    var st = ConsumerState()
    var sawChildWhileBGated = false
    var done = false
    var cycles = 0
    while (!done && cycles < 20) {
      val (recs, st1) = ShardPollLoop.pollOnce(svc, "s", st, limit = 2)
      if (recs.exists(_._1 == "shardId-C") &&
          !(st.atEnd.contains("shardId-A") &&
            st.atEnd.contains("shardId-B")))
        sawChildWhileBGated = true
      done = recs.isEmpty && st1 == st
      st = st1
      cycles += 1
    }
    assert(!sawChildWhileBGated,
      "child contributed records before both parents' SHARD_END")
    assert(st.atEnd == Set("shardId-A", "shardId-B"))
  }

  test("positions alone would gate the child forever (sparse-seq trap)") {
    val svc = mergeFixture()
    val (_, st) = ShardPollLoop.drainAll(svc, "s", limit = 1)
    val metas = svc.listShardsDetailed("s").map(SdkShardFeed.toMeta)
    // with the sentinel: child admitted
    assert(ShardLineage.pollable(metas, st.pos, BigInt(-1), st.atEnd)
      .contains("shardId-C"))
    // WITHOUT it, the pos >= end test can never pass (370 < 500):
    // the exact wedge the atEnd complement exists to break
    assert(!ShardLineage.pollable(metas, st.pos, BigInt(-1), Set.empty)
      .contains("shardId-C"),
      "fixture must reproduce the sparse-seq gap, or this suite " +
        "proves nothing")
  }

  test("split: both children gated on the one parent, then both open") {
    val svc = new FakeKinesis(Seq(
      ShardDef("shardId-P", Nil,
        Seq(rec(10, "a"), rec(88, "b")), Some("90")),
      ShardDef("shardId-C1", Seq("shardId-P"),
        Seq(rec(200, "a")), None),
      ShardDef("shardId-C2", Seq("shardId-P"),
        Seq(rec(300, "b")), None)))
    val (recs, st) = ShardPollLoop.drainAll(svc, "s", limit = 1)
    val order = recs.map(_._1)
    val lastParent = order.lastIndexOf("shardId-P")
    val firstChild = order.indexWhere(id => id.startsWith("shardId-C"))
    assert(lastParent < firstChild,
      s"every parent record precedes every child record: $order")
    assert(order.count(_ == "shardId-C1") == 1 &&
      order.count(_ == "shardId-C2") == 1)
    assert(st.atEnd == Set("shardId-P"))
  }

  test("checkpoint restart resumes AFTER_SEQUENCE_NUMBER with no duplicates") {
    val svc1 = mergeFixture()
    // partial drain: two cycles at limit=1, then "process restart" —
    // only the ConsumerState triple survives (the checkpoint)
    val (r1, st1) = ShardPollLoop.pollOnce(svc1, "s", ConsumerState(), 1)
    val (r2, st2) = ShardPollLoop.pollOnce(svc1, "s", st1, 1)
    val checkpoint = ConsumerState(st2.pos, st2.lastSeq, st2.atEnd)
    val svc2 = mergeFixture() // fresh service connection
    val (r3, st3) = ShardPollLoop.drainAll(svc2, "s", checkpoint, 1)
    val all = (r1 ++ r2 ++ r3).map(_._2.sequenceNumber)
    assert(all.size == all.distinct.size,
      s"duplicate records across a checkpoint restart: $all")
    assert(all.toSet ==
      Set("100", "250", "370", "5000", "5120", "10000", "10010"))
    assert(st3.atEnd == Set("shardId-A", "shardId-B"))
  }

  test("an open shard's tail polls empty pages without SHARD_END") {
    val svc = new FakeKinesis(Seq(
      ShardDef("shardId-open", Nil, Seq(rec(7, "x")), None)))
    val (recs, st) = ShardPollLoop.drainAll(svc, "s", limit = 5)
    assert(recs.map(_._2.sequenceNumber) == Seq("7"))
    assert(st.atEnd.isEmpty,
      "an open shard never observes SHARD_END — drain is bounded by " +
        "progress, not by a sentinel")
  }
}
