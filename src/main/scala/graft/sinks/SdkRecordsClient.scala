package graft.sinks

import graft.sinks.KinesisSink.{PutResult, RecordEntry, RecordsClient}

/** AWS-SDK-backed transport for [[KinesisSink]] — the production
  * implementation of the `RecordsClient` seam (reference
  * basestreamer.go:65-87 calls `kinesis.PutRecords` and collects the
  * per-record failures).
  *
  * The AWS SDK cannot resolve in this build (offline classpath), so
  * the SDK types are reached by reflection: this class COMPILES here,
  * and works unchanged the moment `software.amazon.awssdk:kinesis` is
  * on the runtime classpath. The equivalent direct SDK-v2 code — what
  * the reflective calls below spell out — is:
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

  // resolved lazily per executor after deserialization
  @transient private lazy val client: AnyRef = {
    val builderCls = loadSdk("software.amazon.awssdk.services.kinesis.KinesisClient")
    var b = builderCls.getMethod("builder").invoke(null)
    region.foreach { r =>
      val regionCls = loadSdk("software.amazon.awssdk.regions.Region")
      val reg = regionCls.getMethod("of", classOf[String]).invoke(null, r)
      b = b.getClass.getMethod("region", regionCls).invoke(b, reg)
    }
    profile.foreach { p =>
      val provCls = loadSdk(
        "software.amazon.awssdk.auth.credentials.ProfileCredentialsProvider")
      val prov = provCls.getMethod("create", classOf[String]).invoke(null, p)
      val credsIface = loadSdk(
        "software.amazon.awssdk.auth.credentials.AwsCredentialsProvider")
      b = b.getClass.getMethod("credentialsProvider", credsIface)
        .invoke(b, prov)
    }
    b.getClass.getMethod("build").invoke(b)
  }

  private def loadSdk(name: String): Class[_] =
    try Class.forName(name)
    catch {
      case _: ClassNotFoundException => throw new IllegalStateException(
        s"AWS SDK v2 class $name is not on the classpath. Add " +
          "software.amazon.awssdk:kinesis to use SdkRecordsClient, or " +
          "wire a different RecordsClient (tests: InMemoryRecordsClient).")
    }

  override def putRecords(streamName: String,
      records: Seq[RecordEntry]): PutResult = {
    val sdkBytesCls = loadSdk("software.amazon.awssdk.core.SdkBytes")
    val entryCls = loadSdk(
      "software.amazon.awssdk.services.kinesis.model.PutRecordsRequestEntry")
    val reqCls = loadSdk(
      "software.amazon.awssdk.services.kinesis.model.PutRecordsRequest")

    val entries = records.map { r =>
      var eb = entryCls.getMethod("builder").invoke(null)
      val bytes = sdkBytesCls
        .getMethod("fromByteArray", classOf[Array[Byte]])
        .invoke(null, r.data)
      eb = eb.getClass.getMethod("data", sdkBytesCls).invoke(eb, bytes)
      eb = eb.getClass.getMethod("partitionKey", classOf[String])
        .invoke(eb, r.partitionKey)
      eb.getClass.getMethod("build").invoke(eb)
    }
    var rb = reqCls.getMethod("builder").invoke(null)
    rb = rb.getClass.getMethod("streamName", classOf[String])
      .invoke(rb, streamName)
    rb = rb.getClass.getMethod("records", classOf[java.util.Collection[_]])
      .invoke(rb, new java.util.ArrayList[AnyRef] {
        entries.foreach(add)
      })
    val req = rb.getClass.getMethod("build").invoke(rb)

    val resp = client.getClass
      .getMethod("putRecords", reqCls).invoke(client, req)
    val recs = resp.getClass.getMethod("records").invoke(resp)
      .asInstanceOf[java.util.List[AnyRef]]
    val failures = (0 until recs.size()).flatMap { idx =>
      val rec = recs.get(idx)
      val code = rec.getClass.getMethod("errorCode").invoke(rec)
      if (code == null) None
      else {
        val msg = rec.getClass.getMethod("errorMessage").invoke(rec)
        Some(idx -> s"$code: $msg")
      }
    }
    PutResult(failures.map(_._1), failures.map(_._2))
  }
}
