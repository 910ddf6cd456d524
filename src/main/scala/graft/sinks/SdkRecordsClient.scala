package graft.sinks

import graft.sinks.KinesisSink.{PutResult, RecordEntry, RecordsClient}
import java.lang.reflect.Method

/** AWS-SDK-backed transport for [[KinesisSink]] — the production
  * implementation of the `RecordsClient` seam (reference
  * basestreamer.go:65-87 calls `kinesis.PutRecords` and collects the
  * per-record failures).
  *
  * The AWS SDK cannot resolve in this build (offline classpath), so
  * the SDK types are reached by reflection: this class COMPILES here,
  * and works unchanged the moment `software.amazon.awssdk:kinesis` is
  * on the runtime classpath. Every method is resolved on the PUBLIC
  * interface/builder types (KinesisClientBuilder,
  * PutRecordsRequestEntry.Builder, …), never via `getClass` — the
  * SDK's concrete builder/client classes are package-private, and a
  * Method resolved from a non-public declaring class throws
  * IllegalAccessException on invoke. The equivalent direct SDK-v2
  * code — what the reflective calls below spell out — is:
  *
  * {{{
  * val b = KinesisClient.builder()
  * region.foreach(r => b.region(Region.of(r)))
  * profile.foreach(p => b.credentialsProvider(
  *   ProfileCredentialsProvider.create(p)))
  * val client = b.build()
  * val resp = client.putRecords(PutRecordsRequest.builder()
  *   .streamName(streamName)
  *   .records(records.map(r => PutRecordsRequestEntry.builder()
  *     .data(SdkBytes.fromByteArray(r.data))
  *     .partitionKey(r.partitionKey)
  *     .build()).asJava)
  *   .build())
  * // per-record ErrorCode != null → failed index (basestreamer.go:73-83)
  * val failed = resp.records().asScala.zipWithIndex
  *   .filter { case (rec, _) => rec.errorCode() != null }
  * PutResult(failed.map(_._2).toSeq,
  *   failed.map { case (rec, _) =>
  *     s"${rec.errorCode()}: ${rec.errorMessage()}" }.toSeq)
  * }}}
  *
  * Construction fails fast with a clear message when the SDK is
  * absent, so a mis-wired deployment can't silently drop records.
  */
class SdkRecordsClient(region: Option[String] = None,
    profile: Option[String] = None) extends RecordsClient {

  import SdkKinesis.loadSdk

  // all lookups on PUBLIC types; impl classes are package-private
  // (shared client bootstrap: SdkKinesis)
  @transient private lazy val api = new {
    val sdkBytesCls = loadSdk("software.amazon.awssdk.core.SdkBytes")
    val entryCls = loadSdk(
      "software.amazon.awssdk.services.kinesis.model.PutRecordsRequestEntry")
    val entryBuilderIface = loadSdk(
      "software.amazon.awssdk.services.kinesis.model.PutRecordsRequestEntry$Builder")
    val reqCls = loadSdk(
      "software.amazon.awssdk.services.kinesis.model.PutRecordsRequest")
    val reqBuilderIface = loadSdk(
      "software.amazon.awssdk.services.kinesis.model.PutRecordsRequest$Builder")
    val respCls = loadSdk(
      "software.amazon.awssdk.services.kinesis.model.PutRecordsResponse")
    val resultEntryCls = loadSdk(
      "software.amazon.awssdk.services.kinesis.model.PutRecordsResultEntry")

    val clientIface =
      loadSdk("software.amazon.awssdk.services.kinesis.KinesisClient")
    val putRecords: Method = clientIface.getMethod("putRecords", reqCls)
    val respRecords: Method = respCls.getMethod("records")
    val errorCode: Method = resultEntryCls.getMethod("errorCode")
    val errorMessage: Method = resultEntryCls.getMethod("errorMessage")
  }

  // resolved lazily per executor after deserialization
  @transient private lazy val client: AnyRef =
    SdkKinesis.buildClient(region, profile)

  override def putRecords(streamName: String,
      records: Seq[RecordEntry]): PutResult = {
    val entries = new java.util.ArrayList[AnyRef](records.size)
    records.foreach { r =>
      val eb = api.entryCls.getMethod("builder").invoke(null)
      val bytes = api.sdkBytesCls
        .getMethod("fromByteArray", classOf[Array[Byte]])
        .invoke(null, r.data)
      api.entryBuilderIface.getMethod("data", api.sdkBytesCls)
        .invoke(eb, bytes)
      api.entryBuilderIface.getMethod("partitionKey", classOf[String])
        .invoke(eb, r.partitionKey)
      entries.add(api.entryBuilderIface.getMethod("build").invoke(eb))
    }
    val rb = api.reqCls.getMethod("builder").invoke(null)
    api.reqBuilderIface.getMethod("streamName", classOf[String])
      .invoke(rb, streamName)
    api.reqBuilderIface
      .getMethod("records", classOf[java.util.Collection[_]])
      .invoke(rb, entries)
    val req = api.reqBuilderIface.getMethod("build").invoke(rb)

    val resp = api.putRecords.invoke(client, req)
    val recs = api.respRecords.invoke(resp)
      .asInstanceOf[java.util.List[AnyRef]]
    val failures = (0 until recs.size()).flatMap { idx =>
      val rec = recs.get(idx)
      val code = api.errorCode.invoke(rec)
      if (code == null) None
      else Some(idx -> s"$code: ${api.errorMessage.invoke(rec)}")
    }
    PutResult(failures.map(_._1), failures.map(_._2))
  }
}
