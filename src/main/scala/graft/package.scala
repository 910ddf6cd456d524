import org.apache.spark.sql.{DataFrame, SparkSession}

package object graft {
  /** A named engine query: (session, sfDir) => result. The driver's
    * Verify main dumps each to parquet and hash-compares against the
    * matching `oracleSql` run in DuckDB over the same tables.
    */
  type Q = (SparkSession, String) => DataFrame
}
