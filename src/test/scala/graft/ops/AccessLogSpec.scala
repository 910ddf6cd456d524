package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Functional-parity fixture (SURVEY.md §5.5): the Spark analogue of
  * the reference's functest/apachelogs harness, asserting end-to-end
  * payloads on the FIXTURES.md §1 sample record.
  */
class AccessLogSpec extends SparkSpec {
  import spark.implicits._

  private val sample =
    """{"ClientAddress":"203.0.113.7","PeerAddress":"203.0.113.7",""" +
      """"Protocol":"HTTP/1.1","QueryString":"?q=1","RequestHandler":"-",""" +
      """"RequestLine":"GET /index.html?q=1 HTTP/1.1","RequestMethod":"GET",""" +
      """"RequestTimeMicroseconds":1532,"ResponseBodySize":5120,""" +
      """"Referer":"-","StartTime":"2026-08-12T05:00:00.123456Z",""" +
      """"Status":200,"User":"-","UserAgent":"curl/8.0",""" +
      """"UrlPath":"/index.html","LogFile":"AccessLog"}"""

  test("access-log record parses against the declared schema") {
    val df = Seq(sample).toDF("value")
      .select(from_json($"value", AccessLog.schema).as("r"))
    val row = df.select("r.*").collect().head
    assert(row.getAs[String]("RequestMethod") == "GET")
    assert(row.getAs[Double]("Status") == 200.0) // number → double (Go float64)
    assert(row.getAs[Double]("ResponseBodySize") == 5120.0)
    assert(row.getAs[String]("LogFile") == "AccessLog")
  }

  test("StartTime parses to event time for windowing") {
    val df = Seq(sample).toDF("value")
      .select(from_json($"value", AccessLog.schema).as("r"))
      .select(to_timestamp($"r.StartTime").as("ts"))
    val ts = df.as[java.sql.Timestamp].head()
    assert(ts.toInstant.toString.startsWith("2026-08-12T05:00:00"))
  }

  test("analytics over parsed access logs: status-class aggregation") {
    val logs = Seq(
      sample,
      sample.replace("\"Status\":200", "\"Status\":404"),
      sample.replace("\"Status\":200", "\"Status\":500"),
      sample.replace("\"Status\":200", "\"Status\":503"))
      .toDF("value")
      .select(from_json($"value", AccessLog.schema).as("r")).select("r.*")
    assert(logs.schema("Status").dataType.typeName == "double")
    val classes = logs.groupBy((floor($"Status" / 100) * 100).as("c"))
      .count().as[(Long, Long)].collect().toMap
    assert(classes == Map(200L -> 1L, 400L -> 1L, 500L -> 2L))
  }
}
