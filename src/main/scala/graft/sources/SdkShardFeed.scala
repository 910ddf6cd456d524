package graft.sources

import java.lang.reflect.Method

/** Consumer-side twin of [[graft.sinks.SdkRecordsClient]]: a
  * reflective AWS SDK v2 `ListShards` / `GetShardIterator` /
  * `GetRecords` feed — the production data path a Kinesis consumer
  * source needs (the registry-backed `kinesis-registry` source reads
  * the in-JVM registry; a deployment against real Kinesis swaps this
  * feed in behind the same position-offset model, sequence numbers
  * playing the registry positions).
  *
  * Same offline contract as the sink seam: compiles here without the
  * SDK, resolves every method on the PUBLIC interface/builder types
  * (concrete impl classes are package-private — a Method from a
  * non-public declaring class throws IllegalAccessException on
  * invoke), and fails fast with a clear message when the SDK jar is
  * absent. The equivalent direct SDK-v2 code:
  *
  * {{{
  * val shards = client.listShards(ListShardsRequest.builder()
  *   .streamName(stream).build()).shards().asScala.map(_.shardId())
  * val it0 = client.getShardIterator(GetShardIteratorRequest.builder()
  *   .streamName(stream).shardId(shardId)
  *   .shardIteratorType(ShardIteratorType.TRIM_HORIZON)   // or
  *   .shardIteratorType(ShardIteratorType.AFTER_SEQUENCE_NUMBER)
  *   .startingSequenceNumber(seq)
  *   .build()).shardIterator()
  * val resp = client.getRecords(GetRecordsRequest.builder()
  *   .shardIterator(it0).limit(limit).build())
  * resp.records().asScala.map(r => FeedRecord(
  *   r.sequenceNumber(), r.data().asByteArray(), r.partitionKey()))
  * // + resp.nextShardIterator() for the next poll
  * }}}
  */
class SdkShardFeed(region: Option[String] = None,
    profile: Option[String] = None)
    extends ShardRecordFeed with Serializable {

  import SdkShardFeed.FeedRecord
  import graft.sinks.SdkKinesis.loadSdk

  @transient private lazy val api = new {
    val clientIface =
      loadSdk("software.amazon.awssdk.services.kinesis.KinesisClient")
    val listReqCls = loadSdk(
      "software.amazon.awssdk.services.kinesis.model.ListShardsRequest")
    val listReqBuilderIface = loadSdk(
      "software.amazon.awssdk.services.kinesis.model.ListShardsRequest$Builder")
    val listRespCls = loadSdk(
      "software.amazon.awssdk.services.kinesis.model.ListShardsResponse")
    val shardCls =
      loadSdk("software.amazon.awssdk.services.kinesis.model.Shard")
    val itReqCls = loadSdk(
      "software.amazon.awssdk.services.kinesis.model.GetShardIteratorRequest")
    val itReqBuilderIface = loadSdk(
      "software.amazon.awssdk.services.kinesis.model.GetShardIteratorRequest$Builder")
    val itRespCls = loadSdk(
      "software.amazon.awssdk.services.kinesis.model.GetShardIteratorResponse")
    val itTypeCls = loadSdk(
      "software.amazon.awssdk.services.kinesis.model.ShardIteratorType")
    val recReqCls = loadSdk(
      "software.amazon.awssdk.services.kinesis.model.GetRecordsRequest")
    val recReqBuilderIface = loadSdk(
      "software.amazon.awssdk.services.kinesis.model.GetRecordsRequest$Builder")
    val recRespCls = loadSdk(
      "software.amazon.awssdk.services.kinesis.model.GetRecordsResponse")
    val recordCls =
      loadSdk("software.amazon.awssdk.services.kinesis.model.Record")
    val sdkBytesCls = loadSdk("software.amazon.awssdk.core.SdkBytes")

    val seqRangeCls = loadSdk(
      "software.amazon.awssdk.services.kinesis.model.SequenceNumberRange")

    val listShards: Method = clientIface.getMethod("listShards", listReqCls)
    val shardsOf: Method = listRespCls.getMethod("shards")
    val listNextToken: Method = listRespCls.getMethod("nextToken")
    val shardId: Method = shardCls.getMethod("shardId")
    // lineage (r16 verdict item #3): split children carry
    // parentShardId, merge children additionally adjacentParentShardId;
    // a closed shard's range has a non-null endingSequenceNumber —
    // everything the shared ShardLineage gate needs
    val parentShardId: Method = shardCls.getMethod("parentShardId")
    val adjacentParentShardId: Method =
      shardCls.getMethod("adjacentParentShardId")
    val seqRangeOf: Method = shardCls.getMethod("sequenceNumberRange")
    val endingSeqNo: Method =
      seqRangeCls.getMethod("endingSequenceNumber")
    val getShardIterator: Method =
      clientIface.getMethod("getShardIterator", itReqCls)
    val shardIteratorOf: Method = itRespCls.getMethod("shardIterator")
    val getRecords: Method = clientIface.getMethod("getRecords", recReqCls)
    val recordsOf: Method = recRespCls.getMethod("records")
    val nextShardIterator: Method =
      recRespCls.getMethod("nextShardIterator")
    val seqNo: Method = recordCls.getMethod("sequenceNumber")
    val dataOf: Method = recordCls.getMethod("data")
    val partitionKeyOf: Method = recordCls.getMethod("partitionKey")
    val asByteArray: Method = sdkBytesCls.getMethod("asByteArray")
  }

  @transient private lazy val client: AnyRef =
    graft.sinks.SdkKinesis.buildClient(region, profile)

  /** Shard ids of a stream — the id-only view of
    * [[listShardsDetailed]], kept for callers that don't need
    * lineage.
    */
  def listShards(stream: String): Seq[String] =
    listShardsDetailed(stream).map(_.shardId)

  import SdkShardFeed.ShardListing

  /** Shards + lineage of a stream, following ListShards pagination —
    * one page holds at most 1000 shards, and production streams
    * exceed that. Per the API contract the streamName goes only on
    * the FIRST request; follow-ups carry the nextToken alone.
    */
  def listShardsDetailed(stream: String): Seq[ShardListing] = {
    val out = Seq.newBuilder[ShardListing]
    var token: String = null
    var first = true
    while (first || token != null) {
      val rb = api.listReqCls.getMethod("builder").invoke(null)
      if (first)
        api.listReqBuilderIface.getMethod("streamName", classOf[String])
          .invoke(rb, stream)
      else
        api.listReqBuilderIface.getMethod("nextToken", classOf[String])
          .invoke(rb, token)
      val resp = api.listShards.invoke(client,
        api.listReqBuilderIface.getMethod("build").invoke(rb))
      val shards = api.shardsOf.invoke(resp)
        .asInstanceOf[java.util.List[AnyRef]]
      (0 until shards.size()).foreach { i =>
        val s = shards.get(i)
        val range = api.seqRangeOf.invoke(s)
        out += ShardListing(
          api.shardId.invoke(s).asInstanceOf[String],
          Seq(api.parentShardId.invoke(s),
              api.adjacentParentShardId.invoke(s))
            .collect { case p: String if p.nonEmpty => p },
          Option(range).flatMap(r =>
            Option(api.endingSeqNo.invoke(r).asInstanceOf[String])))
      }
      token = api.listNextToken.invoke(resp).asInstanceOf[String]
      first = false
    }
    out.result()
  }

  /** The shared-gate view of the stream's shards:
    * `ShardLineage.pollable(shardMetas(stream), committedPos, BigInt(-1))`
    * is the set a poll loop may read this cycle — the SAME
    * parents-drain-before-children rule the registry source bakes
    * into its offsets ([[KinesisRegistryMicroBatchStream]]), applied
    * to real sequence numbers.
    */
  def shardMetas(stream: String)
      : Seq[ShardLineage.ShardMeta[BigInt]] =
    listShardsDetailed(stream).map(SdkShardFeed.toMeta)

  // (iteratorFor / getRecords below are unchanged — the gate decides
  // WHICH shards to poll; they remain the per-shard data path)

  /** Iterator at TRIM_HORIZON (afterSeq = None) or just after a
    * committed sequence number — the resume point a checkpointed
    * micro-batch source stores, exactly like the registry source's
    * position offsets.
    */
  def iteratorFor(stream: String, shardId: String,
      afterSeq: Option[String]): String = {
    val rb = api.itReqCls.getMethod("builder").invoke(null)
    api.itReqBuilderIface.getMethod("streamName", classOf[String])
      .invoke(rb, stream)
    api.itReqBuilderIface.getMethod("shardId", classOf[String])
      .invoke(rb, shardId)
    val itType = api.itTypeCls
      .getMethod("valueOf", classOf[String])
      .invoke(null,
        if (afterSeq.isDefined) "AFTER_SEQUENCE_NUMBER" else "TRIM_HORIZON")
    api.itReqBuilderIface.getMethod("shardIteratorType", api.itTypeCls)
      .invoke(rb, itType)
    afterSeq.foreach(seq =>
      api.itReqBuilderIface
        .getMethod("startingSequenceNumber", classOf[String])
        .invoke(rb, seq))
    val resp = api.getShardIterator.invoke(client,
      api.itReqBuilderIface.getMethod("build").invoke(rb))
    api.shardIteratorOf.invoke(resp).asInstanceOf[String]
  }

  /** One GetRecords poll: records + the iterator for the next poll.
    * A `None` next-iterator is the service's SHARD_END signal — the
    * shard is fully drained even though the last record's sequence
    * number may sit below the listing's endingSequenceNumber
    * (sequence numbers are sparse). A checkpointing consumer must
    * record that observation — add the shard id to the `atEnd` set
    * it passes to [[ShardLineage.pollable]]/[[ShardLineage.advance]],
    * or checkpoint the listing's endingSequenceNumber at that moment
    * — or the `pos >= end` drain test would gate the shard's
    * children forever.
    */
  def getRecords(shardIterator: String, limit: Int)
      : (Seq[FeedRecord], Option[String]) = {
    val rb = api.recReqCls.getMethod("builder").invoke(null)
    api.recReqBuilderIface.getMethod("shardIterator", classOf[String])
      .invoke(rb, shardIterator)
    api.recReqBuilderIface.getMethod("limit", classOf[Integer])
      .invoke(rb, Integer.valueOf(limit))
    val resp = api.getRecords.invoke(client,
      api.recReqBuilderIface.getMethod("build").invoke(rb))
    val recs = api.recordsOf.invoke(resp)
      .asInstanceOf[java.util.List[AnyRef]]
    val out = (0 until recs.size()).map { i =>
      val r = recs.get(i)
      FeedRecord(
        api.seqNo.invoke(r).asInstanceOf[String],
        api.asByteArray.invoke(api.dataOf.invoke(r))
          .asInstanceOf[Array[Byte]],
        api.partitionKeyOf.invoke(r).asInstanceOf[String])
    }
    (out, Option(api.nextShardIterator.invoke(resp).asInstanceOf[String]))
  }
}

object SdkShardFeed {

  /** One consumed record, engine-shaped: the decimal-string sequence
    * number (the consumer's checkpoint token), payload bytes, and
    * the producer's partition key. Companion-level (not nested in
    * the class) so feed-generic consumers ([[ShardPollLoop]], the
    * contract suite's scripted service) share the type without a
    * path-dependent prefix.
    */
  case class FeedRecord(sequenceNumber: String, data: Array[Byte],
      partitionKey: String)

  /** One stream shard with its reshard lineage, as `ListShards`
    * reports it: a split child names one parent, a merge child names
    * two (parent + adjacentParent); a CLOSED shard's sequence range
    * carries a non-null endingSequenceNumber — the drain target the
    * GetRecords contract gates children on. The production twin of
    * the registry's `ShardInfo` snapshot, defined on the companion so
    * the lineage mapping is a pure function testable without the SDK
    * jar.
    */
  case class ShardListing(shardId: String, parentShardIds: Seq[String],
      endingSequenceNumber: Option[String])

  /** Adapt one listing to the shared gate's shape. Sequence numbers
    * are decimal strings that overflow Long (Kinesis allocates them
    * from a 186-bit space), so positions are BigInt.
    */
  def toMeta(l: ShardListing): ShardLineage.ShardMeta[BigInt] =
    ShardLineage.ShardMeta(l.shardId, l.parentShardIds,
      l.endingSequenceNumber.map(BigInt(_)))
}
