package graft.sinks

import org.scalatest.funsuite.AnyFunSuite
import java.net.InetAddress

class HostIdSpec extends AnyFunSuite {

  private def noHttp: HostId.HttpProbe = (_: String, _: Int) => None
  private val taskJson =
    """{"Cluster":"c","TaskARN":"arn:aws:ecs:us-west-2:123:task/abc"}"""

  test("ECS v4 metadata URI wins when present") {
    val http = new HostId.HttpProbe {
      def get(url: String, t: Int): Option[String] =
        if (url == "http://v4.local/task") Some(taskJson) else None
    }
    val id = HostId.resolve(
      env = Map("ECS_CONTAINER_METADATA_URI_V4" -> "http://v4.local"),
      http = http, interfaces = () => Nil, randomBytes = () => Array.fill(16)(0))
    assert(id == "arn:aws:ecs:us-west-2:123:task/abc")
  }

  test("falls through v4 -> v3 env var") {
    val http = new HostId.HttpProbe {
      def get(url: String, t: Int): Option[String] =
        if (url == "http://v3.local/task") Some(taskJson) else None
    }
    val id = HostId.resolve(
      env = Map("ECS_CONTAINER_METADATA_URI" -> "http://v3.local"),
      http = http, interfaces = () => Nil, randomBytes = () => Array.fill(16)(0))
    assert(id.startsWith("arn:aws:ecs:"))
  }

  test("ECS v2 fixed endpoint probed when env URIs absent") {
    val http = new HostId.HttpProbe {
      def get(url: String, t: Int): Option[String] =
        if (url == "http://169.254.170.2/v2/metadata") Some(taskJson)
        else None
    }
    val id = HostId.resolve(env = Map.empty, http = http,
      interfaces = () => Nil, randomBytes = () => Array.fill(16)(0))
    assert(id == "arn:aws:ecs:us-west-2:123:task/abc")
  }

  test("EC2 IMDS path constructs the instance ARN") {
    val http = new HostId.HttpProbe {
      def get(url: String, t: Int): Option[String] = url match {
        case u if u.endsWith("/availability-zone") => Some("us-west-2a")
        case u if u.endsWith("/instance-id") => Some("i-0abc")
        case u if u.endsWith("/info") =>
          Some("""{"Code":"Success","AccountId":"999"}""")
        case _ => None
      }
    }
    val id = HostId.resolve(env = Map.empty, http = http,
      interfaces = () => Nil, randomBytes = () => Array.fill(16)(0))
    assert(id == "arn:aws:ec2:us-west-2:999:instance/i-0abc")
  }

  test("az->region strips zone letters only") {
    assert(HostId.azToRegion("us-west-2a").contains("us-west-2"))
    assert(HostId.azToRegion("eu-central-1b").contains("eu-central-1"))
    assert(HostId.azToRegion("notazone").isEmpty)
  }

  test("interface IP fallback includes private ranges (Go IsGlobalUnicast)") {
    val id = HostId.resolve(env = Map.empty, http = noHttp,
      interfaces = () => Seq(InetAddress.getByName("10.1.2.3")),
      randomBytes = () => Array.fill(16)(0))
    assert(id == "ip-address:10.1.2.3")
  }

  test("uuid fallback is 16 bytes hex") {
    val id = HostId.resolve(env = Map.empty, http = noHttp,
      interfaces = () => Nil,
      randomBytes = () => Array.tabulate(16)(_.toByte))
    assert(id == "uuid:000102030405060708090a0b0c0d0e0f")
  }
}
