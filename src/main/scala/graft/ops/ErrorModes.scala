package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** The reference's two error policies (SURVEY.md §2a E1/E2), mapped to
  * Spark's JSON parse modes:
  *
  *  - E1 skip-and-continue (line mode, linestreamer.go:94-98): a bad
  *    record is logged and dropped, the stream continues →
  *    `DROPMALFORMED`, or `PERMISSIVE` + corrupt-record column when
  *    the bad payloads should be quarantined instead of lost.
  *  - E2 fail-fast (json mode, jsonstreamer.go:44-46, 75-79): the
  *    first malformed value aborts the whole stream → `FAILFAST`.
  */
object ErrorModes {

  /** E1: parse a JSON string column; malformed payloads become null
    * structs (drop them with `.filter(parsed.isNotNull)` / `na.drop`).
    * NOTE: the `from_json` *expression* only supports PERMISSIVE and
    * FAILFAST — DROPMALFORMED exists solely on the json *file source*
    * (`spark.read.option("mode", "DROPMALFORMED").json(...)`), so
    * drop-semantics on a column are expressed as permissive + filter.
    */
  def parseDropMalformed(col_ : Column, schemaDdl: String): Column =
    from_json(col_, lit(schemaDdl), opts("PERMISSIVE"))

  /** E1 variant: keep malformed payloads in a quarantine column
    * (`_corrupt_record`) instead of dropping — the at-scale-friendly
    * form of "log to stderr and continue".
    */
  def parsePermissive(col_ : Column, schemaDdl: String): Column =
    from_json(col_,
      lit(s"$schemaDdl, _corrupt_record string"), opts("PERMISSIVE"))

  /** E2: parse a JSON string column; the first malformed value throws
    * and fails the job.
    */
  def parseFailFast(col_ : Column, schemaDdl: String): Column =
    from_json(col_, lit(schemaDdl), opts("FAILFAST"))

  private def opts(mode: String) = {
    val m = new java.util.HashMap[String, String]()
    m.put("mode", mode)
    m.put("columnNameOfCorruptRecord", "_corrupt_record")
    m
  }

  /** Quarantine split: (good rows, corrupt rows) from a permissive
    * parse — the pattern for dead-letter queues at scale.
    */
  def quarantine(df: DataFrame, jsonCol: String, schemaDdl: String)
      : (DataFrame, DataFrame) = {
    val parsed = df.withColumn("parsed",
      parsePermissive(col(jsonCol), schemaDdl))
    val good = parsed.filter(col("parsed._corrupt_record").isNull)
    val bad = parsed.filter(col("parsed._corrupt_record").isNotNull)
      .withColumn("corrupt_payload", col("parsed._corrupt_record"))
    (good, bad)
  }
}
