package graft.sources

import SdkShardFeed.{FeedRecord, ShardListing}

/** The consumer-feed contract [[SdkShardFeed]] implements — exactly
  * the three service calls a Kinesis poll consumer uses (ListShards
  * with lineage, GetShardIterator resume, GetRecords), so the
  * checkpointing loop below is generic over the REAL SDK seam and a
  * scripted in-memory service (ShardPollLoopContractSpec drives the
  * same loop against SDK-shaped drain signals: sparse sequence
  * numbers and a null NextShardIterator at shard end — the
  * localstack-style contract the env-gated real-SDK smoke can't
  * exercise without a jar).
  */
trait ShardRecordFeed {
  def listShardsDetailed(stream: String): Seq[ShardListing]
  def iteratorFor(stream: String, shardId: String,
      afterSeq: Option[String]): String
  def getRecords(shardIterator: String, limit: Int)
      : (Seq[FeedRecord], Option[String])
}

/** A checkpointing GetRecords poll loop with the
  * parents-drain-before-children gate ([[ShardLineage]]) applied to
  * SDK-shaped signals — the production consumer skeleton a
  * deployment runs against real Kinesis ([[SdkShardFeed]] is the
  * feed), factored pure so the reshard-drain semantics are testable
  * end-to-end without the SDK jar.
  *
  * Two drain signals, BOTH required on real Kinesis (reference
  * binding: the producer in `/root/reference` writes through exactly
  * this service surface, so resharding is the first operational
  * event its consumers hit):
  *
  *   - the listing's `endingSequenceNumber` closes a shard, but
  *     sequence numbers are SPARSE — the last readable record can
  *     sit strictly below that bound, so a consumer checkpointing
  *     last-read positions alone would hold every child closed
  *     forever on the `pos >= end` test;
  *   - a null `NextShardIterator` from GetRecords is the service's
  *     positive SHARD_END observation — the loop records it in the
  *     `atEnd` sentinel set, which [[ShardLineage.drained]] accepts
  *     as drained regardless of position.
  *
  * State is three maps keyed by shard id — O(shards), not O(records):
  * the BigInt position (gate comparisons), the raw string sequence
  * number (AFTER_SEQUENCE_NUMBER resume token — the service wants
  * the string back verbatim), and the SHARD_END set. A production
  * checkpoint stores exactly this triple.
  */
object ShardPollLoop {

  case class ConsumerState(
      pos: Map[String, BigInt] = Map.empty,
      lastSeq: Map[String, String] = Map.empty,
      atEnd: Set[String] = Set.empty)

  /** One poll cycle: list shards, read every shard the lineage gate
    * admits (skipping ones already at SHARD_END), checkpoint
    * positions and SHARD_END observations. Returns the records in
    * (shard, service-order) with the advanced state.
    *
    * One GetRecords per admitted shard per cycle — the service's
    * own pacing contract (per-shard read throughput is capped, and
    * an empty response's next-iterator is progress too: iterators
    * advance past expired/sparse ranges without records).
    */
  def pollOnce(feed: ShardRecordFeed, stream: String,
      st: ConsumerState, limit: Int = 1000)
      : (Seq[(String, FeedRecord)], ConsumerState) = {
    val metas = feed.listShardsDetailed(stream).map(SdkShardFeed.toMeta)
    val admitted = ShardLineage.pollable(
      metas, st.pos, BigInt(-1), st.atEnd)
    var pos = st.pos
    var lastSeq = st.lastSeq
    var atEnd = st.atEnd
    val out = Seq.newBuilder[(String, FeedRecord)]
    admitted.filterNot(atEnd).foreach { id =>
      val it = feed.iteratorFor(stream, id, lastSeq.get(id))
      val (recs, next) = feed.getRecords(it, limit)
      recs.foreach { r =>
        out += id -> r
        pos += id -> BigInt(r.sequenceNumber)
        lastSeq += id -> r.sequenceNumber
      }
      if (next.isEmpty) atEnd += id
    }
    (out.result(), ConsumerState(pos, lastSeq, atEnd))
  }

  /** Poll until a cycle admits nothing new and observes nothing new
    * — i.e. every readable record is consumed and every reachable
    * SHARD_END recorded — or `maxCycles` elapses (a safety bound for
    * scripted feeds; a live consumer loops forever). Returns all
    * records in consumption order with the final state.
    */
  def drainAll(feed: ShardRecordFeed, stream: String,
      st0: ConsumerState = ConsumerState(), limit: Int = 1000,
      maxCycles: Int = 100)
      : (Seq[(String, FeedRecord)], ConsumerState) = {
    val all = Seq.newBuilder[(String, FeedRecord)]
    var st = st0
    var cycles = 0
    var progressed = true
    while (progressed && cycles < maxCycles) {
      val (recs, st1) = pollOnce(feed, stream, st, limit)
      progressed = recs.nonEmpty || st1.atEnd != st.atEnd ||
        st1.pos != st.pos
      all ++= recs
      st = st1
      cycles += 1
    }
    (all.result(), st)
  }
}
