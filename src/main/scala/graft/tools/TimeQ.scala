package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Repeat-sample timer for optimization A/Bs:
  * `runMain graft.tools.TimeQ <sfDir> <nReps> <query...>` times each
  * named query nReps times with the BENCH sink (the pruning-proof
  * `agg(bit_xor(xxhash64(struct(*))))` — graft.Bench.sample), so the
  * numbers are comparable to the driver bench and rep-to-rep deltas
  * separate one-time costs (Janino/JIT, broadcast warm-up) from the
  * plan's steady-state cost. Session confs mirror Bench exactly.
  */
object TimeQ {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nReps = args.lift(1).map(_.toInt).getOrElse(2)
    val names = args.drop(2).toSeq
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
    try { // the bench's scan/agg/window warm-up, abbreviated
      graft.Tables.names.foreach(n =>
        graft.Tables.load(spark, sfDir, n).count())
    } catch { case _: Throwable => }
    // process CPU per rep as well as wall: under hypervisor noise
    // (the r17 "quietly-busy box" postmortem) wall stretches
    // arbitrarily while CPU time only counts scheduled cycles — for
    // cpu-bound kernels the A/B signal lives in the cpu column
    // pattern-match, not cast: on a non-HotSpot JVM the bean lacks
    // getProcessCpuTime — fall back to wall-only instead of a CCE
    val osBean: Option[com.sun.management.OperatingSystemMXBean] =
      java.lang.management.ManagementFactory
        .getOperatingSystemMXBean() match {
        case b: com.sun.management.OperatingSystemMXBean => Some(b)
        case _ => None
      }
    def cpuNow(): Long = osBean.map(_.getProcessCpuTime).getOrElse(0L)
    names.foreach { n =>
      val samples = (1 to nReps).map { _ =>
        val c0 = cpuNow()
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, sfDir)
          .agg(bit_xor(xxhash64(struct(col("*"))))).collect()
        val s = (System.nanoTime() - t0) / 1e9
        val c = (cpuNow() - c0) / 1e9
        spark.catalog.clearCache()
        (s, c)
      }
      println(f"[timeq] $n%-28s " +
        samples.map { case (s, c) => f"$s%6.2f (cpu $c%6.1f)" }
          .mkString(" "))
    }
    spark.stop()
  }
}
