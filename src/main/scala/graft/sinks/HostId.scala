package graft.sinks

import java.net.{InetAddress, NetworkInterface}
import java.security.SecureRandom
import scala.jdk.CollectionConverters._
import scala.util.Try

/** Host-identity resolution — the reference's partition-key source
  * (hostid.go:22-78), reproduced as a driver-side utility. Resolved
  * once per process and attached to every record as a literal column
  * (K1, Transforms.withPartitionKey), which gives per-host FIFO on the
  * sink's shard routing (SURVEY.md §1.4).
  *
  * Fallback chain, first hit wins (hostid.go citations):
  *   1. ECS task ARN via $ECS_CONTAINER_METADATA_URI_V4 (:27-36)
  *   2. ... via $ECS_CONTAINER_METADATA_URI (v3, :38-47)
  *   3. ECS metadata v2 fixed endpoint (:49-53)
  *   4. EC2 IMDS-constructed instance ARN (:55-59, 136-170)
  *   5. first global-unicast interface IP as "ip-address:<ip>" (:61-65)
  *   6. random 16-byte hex "uuid:<hex>" (:67-71)
  *
  * All probes are injectable for tests; timeouts are 500 ms per HTTP
  * GET like the reference (hostid.go:81, 112).
  */
object HostId {

  /** Minimal HTTP GET abstraction; None on any error/timeout. */
  trait HttpProbe {
    def get(url: String, timeoutMs: Int = 500): Option[String]
  }

  object DefaultHttpProbe extends HttpProbe {
    def get(url: String, timeoutMs: Int): Option[String] = Try {
      val conn = new java.net.URL(url).openConnection()
        .asInstanceOf[java.net.HttpURLConnection]
      conn.setConnectTimeout(timeoutMs)
      conn.setReadTimeout(timeoutMs)
      val body = scala.io.Source.fromInputStream(conn.getInputStream,
        "UTF-8").mkString
      conn.disconnect()
      body
    }.toOption

  }

  private val EcsV2Endpoint = "http://169.254.170.2/v2/metadata"
  private val ImdsBase = "http://169.254.169.254/latest/meta-data"

  /** Extract "TaskARN":"..." from ECS task metadata JSON (the only
    * field the reference reads, hostid.go:95-109).
    */
  private[sinks] def taskArn(metadataJson: String): Option[String] =
    """"TaskARN"\s*:\s*"([^"]+)"""".r
      .findFirstMatchIn(metadataJson).map(_.group(1))

  /** AZ → region: strip the trailing zone letter(s) (hostid.go:18,
    * regexp `^(.*?[0-9]+)[a-z]*$`).
    */
  private[sinks] def azToRegion(az: String): Option[String] =
    """^(.*?[0-9]+)[a-z]*$""".r.findFirstMatchIn(az).map(_.group(1))

  def resolve(
      env: Map[String, String] = sys.env,
      http: HttpProbe = DefaultHttpProbe,
      interfaces: () => Seq[InetAddress] = defaultInterfaces,
      randomBytes: () => Array[Byte] = defaultRandom): String = {

    def ecsFromUri(uriKey: String): Option[String] =
      env.get(uriKey).flatMap(uri => http.get(s"$uri/task"))
        .flatMap(taskArn)

    def ecsV2: Option[String] = http.get(EcsV2Endpoint).flatMap(taskArn)

    def ec2Arn: Option[String] = for {
      az <- http.get(s"$ImdsBase/placement/availability-zone")
      region <- azToRegion(az)
      instanceId <- http.get(s"$ImdsBase/instance-id")
      accountId <- http.get(s"$ImdsBase/identity-credentials/ec2/info")
        .flatMap(""""AccountId"\s*:\s*"([^"]+)"""".r
          .findFirstMatchIn(_).map(_.group(1)))
      partition = if (region.startsWith("cn-")) "aws-cn"
        else if (region.startsWith("us-gov-")) "aws-us-gov" else "aws"
    } yield s"arn:$partition:ec2:$region:$accountId:instance/$instanceId"

    // Go's IsGlobalUnicast (hostid.go:177) includes private ranges —
    // it only excludes loopback/link-local/multicast/unspecified.
    def interfaceIp: Option[String] =
      interfaces().find(a => !a.isLoopbackAddress && !a.isLinkLocalAddress &&
        !a.isMulticastAddress && !a.isAnyLocalAddress)
        .map(a => s"ip-address:${a.getHostAddress}")

    def uuid: String =
      "uuid:" + randomBytes().map("%02x".format(_)).mkString

    ecsFromUri("ECS_CONTAINER_METADATA_URI_V4")
      .orElse(ecsFromUri("ECS_CONTAINER_METADATA_URI"))
      .orElse(ecsV2)
      .orElse(ec2Arn)
      .orElse(interfaceIp)
      .getOrElse(uuid)
  }

  /** Memoized like the reference (hostid.go:23-25). */
  lazy val cached: String = resolve()

  private def defaultInterfaces(): Seq[InetAddress] =
    Try {
      NetworkInterface.getNetworkInterfaces.asScala.toSeq
        .filter(i => i.isUp && !i.isLoopback)
        .flatMap(_.getInetAddresses.asScala)
    }.getOrElse(Nil)

  private def defaultRandom(): Array[Byte] = {
    val b = new Array[Byte](16)
    new SecureRandom().nextBytes(b)
    b
  }
}
