package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler.{SparkListener, SparkListenerJobEnd, SparkListenerJobStart}
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Noise-immune structural probe: counts Spark JOBS (and stages)
  * submitted while a named query runs once with the bench sink.
  * Job/stage counts are a pure function of the plan — unlike walls
  * or even process CPU on this box (see OPTIMIZATION_r19.md,
  * "measurement integrity") they cannot be inflated by host
  * contention, so they are the A/B evidence of record for
  * serial-job-structure changes (PrefixSum chaining, staging
  * re-scans). `runMain graft.tools.JobCount <sfDir> <query...>`
  */
object JobCount {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val names = args.drop(1).toSeq
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val jobs = new java.util.concurrent.atomic.AtomicLong(0)
    val stages = new java.util.concurrent.atomic.AtomicLong(0)
    val ends = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(j: SparkListenerJobStart): Unit = {
        jobs.incrementAndGet()
        stages.addAndGet(j.stageInfos.size.toLong)
      }
      override def onJobEnd(j: SparkListenerJobEnd): Unit =
        ends.incrementAndGet()
    })
    names.foreach { n =>
      jobs.set(0); stages.set(0); ends.set(0)
      SparkEntry.queries(n)(spark, sfDir)
        .agg(bit_xor(xxhash64(struct(col("*"))))).collect()
      spark.catalog.clearCache()
      // listener events drain asynchronously — wait until every
      // started job's end event arrived (bounded: a contended host
      // can stall the bus; the fixed 1.5 s sleep it replaces could
      // undercount there, ADVICE r19). collect() returned, so all
      // jobs HAVE ended; we are only waiting for the bus to drain.
      val deadline = System.nanoTime() + 15L * 1000000000L
      while (ends.get < jobs.get && System.nanoTime() < deadline)
        Thread.sleep(50)
      Thread.sleep(200) // tail margin for a JobStart still in flight
      println(f"[jobcount] $n%-28s jobs=${jobs.get}%3d " +
        f"stages=${stages.get}%3d")
    }
    spark.stop()
  }
}
