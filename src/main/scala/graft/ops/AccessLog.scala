package graft.ops

import org.apache.spark.sql.types._

/** The reference's canonical record shape: the Apache access-log JSON
  * `LogFormat` template (reference README.md:13-20,
  * functest/apachelogs/httpd.conf:192-201; field table in
  * /root/repo/FIXTURES.md §1). The explicit StructType enables
  * Catalyst pruning/pushdown on the known-schema path (SURVEY.md
  * §1.3); unknown-shape payloads stay on the schemaless
  * string+get_json_object path.
  *
  * All JSON numbers are DoubleType — Go decodes every number as
  * float64 (jsonstreamer.go:42-43).
  */
object AccessLog {

  val schema: StructType = StructType(Seq(
    StructField("ClientAddress", StringType),
    StructField("PeerAddress", StringType),
    StructField("Protocol", StringType),
    StructField("QueryString", StringType),
    StructField("RequestHandler", StringType),
    StructField("RequestLine", StringType),
    StructField("RequestMethod", StringType),
    StructField("RequestTimeMicroseconds", DoubleType),
    StructField("ResponseBodySize", DoubleType),
    StructField("Referer", StringType),
    StructField("StartTime", StringType), // ISO-8601; parse downstream
    StructField("Status", DoubleType),
    StructField("User", StringType),
    StructField("UserAgent", StringType),
    StructField("UrlPath", StringType),
    StructField("LogFile", StringType))) // injected by --add-entry
}
