package graft.tools

import org.apache.spark.sql.SparkSession

/** Smoke for the `spark.sql.extensions=graft.GraftExtensions` config
  * path (constructor injection — only applies to a session built with
  * the config, hence a standalone main rather than a shared-fixture
  * spec). Proves SQL can call the native functions with zero
  * imperative registration.
  */
object ExtensionsSmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-smoke")
      .config("spark.sql.extensions", "graft.GraftExtensions")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val row = spark.sql(
      """SELECT cosine_similarity(array(1.0D, 2.0D), array(2.0D, 4.0D)) AS c,
                dot_product(array(1.0D, 2.0D), array(3.0D, 4.0D)) AS d""")
      .collect().head
    println(s"[ext-smoke] cosine=${row.getDouble(0)} dot=${row.getDouble(1)}")
    assert(math.abs(row.getDouble(0) - 1.0) < 1e-15)
    assert(row.getDouble(1) == 11.0)
    spark.stop()
  }
}
