package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession

/** Replays the driver's t1 smoke check locally: `SparkEntry.entry`
  * on sf0.001 must return rows.
  */
object EntrySmoke {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val df = SparkEntry.entry(spark)
    val n = df.count()
    println(s"[entry-smoke] rows=$n schema=${df.schema.simpleString}")
    assert(n > 0, "driver smoke requires rows > 0")
    spark.stop()
  }
}
