package graft.sinks

/** Shared reflective bootstrap for the AWS SDK v2 Kinesis client —
  * used by both the producer seam ([[SdkRecordsClient]], PutRecords)
  * and the consumer seam ([[graft.sources.SdkShardFeed]],
  * ListShards/GetRecords), so client construction (region, profile,
  * credential wiring) lives in exactly one place.
  *
  * Every lookup resolves on the PUBLIC interface/builder types — the
  * SDK's concrete impl classes are package-private, and a Method whose
  * declaring class is non-public throws IllegalAccessException on
  * invoke even when the method itself is public.
  */
private[graft] object SdkKinesis {

  def loadSdk(name: String): Class[_] =
    try Class.forName(name)
    catch {
      case _: ClassNotFoundException => throw new IllegalStateException(
        s"AWS SDK v2 class $name is not on the classpath. Add " +
          "software.amazon.awssdk:kinesis to use the SDK-backed " +
          "transport/feed, or use the in-process forms " +
          "(InMemoryRecordsClient / kinesis-registry source).")
    }

  /** A configured KinesisClient (as AnyRef — the caller invokes API
    * methods reflectively against the public KinesisClient interface).
    */
  def buildClient(region: Option[String], profile: Option[String])
      : AnyRef = {
    val clientIface =
      loadSdk("software.amazon.awssdk.services.kinesis.KinesisClient")
    val builderIface = loadSdk(
      "software.amazon.awssdk.services.kinesis.KinesisClientBuilder")
    val regionCls = loadSdk("software.amazon.awssdk.regions.Region")
    val credsIface = loadSdk(
      "software.amazon.awssdk.auth.credentials.AwsCredentialsProvider")
    val profProvCls = loadSdk(
      "software.amazon.awssdk.auth.credentials.ProfileCredentialsProvider")
    val b = clientIface.getMethod("builder").invoke(null)
    region.foreach { r =>
      val reg = regionCls.getMethod("of", classOf[String]).invoke(null, r)
      builderIface.getMethod("region", regionCls).invoke(b, reg)
    }
    profile.foreach { p =>
      val prov = profProvCls.getMethod("create", classOf[String])
        .invoke(null, p)
      builderIface.getMethod("credentialsProvider", credsIface)
        .invoke(b, prov)
    }
    builderIface.getMethod("build").invoke(b)
  }
}
