package graft.tools

import graft.SparkEntry
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Same-JVM interleaved A/B for the stream-stream-join replay rows:
  * alternates `spark.sql.streaming.join.stateFormatVersion` 2 vs 3
  * (via the `graft.join.stateFormatVersion` system-property seam in
  * Replay.withRocksDb) rep by rep, so both arms share JIT state and
  * host-noise exposure — the PfAb discipline from OPTIMIZATION_r19's
  * "measurement integrity" section. Walls AND process CPU per rep.
  *
  * `runMain graft.tools.ReplayAb [sfDir] [nReps] [query...]`
  */
object ReplayAb {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nReps = args.drop(1).headOption.map(_.toInt).getOrElse(3)
    val names = {
      val rest = args.drop(2).toSeq
      if (rest.nonEmpty) rest
      else Seq("q212_interval_join_ivm", "q228_outer_interval_ivm",
        "q235_right_outer_interval_ivm", "q236_full_outer_interval_ivm")
    }
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val osBean: Option[com.sun.management.OperatingSystemMXBean] =
      java.lang.management.ManagementFactory
        .getOperatingSystemMXBean() match {
        case b: com.sun.management.OperatingSystemMXBean => Some(b)
        case _ => None
      }
    def cpuNow(): Long = osBean.map(_.getProcessCpuTime).getOrElse(0L)
    def once(n: String): (Double, Double) = {
      val c0 = cpuNow()
      val t0 = System.nanoTime()
      SparkEntry.queries(n)(spark, sfDir)
        .agg(bit_xor(xxhash64(struct(col("*"))))).collect()
      val s = (System.nanoTime() - t0) / 1e9
      val c = (cpuNow() - c0) / 1e9
      spark.catalog.clearCache()
      (s, c)
    }
    // one untimed warm rep (streaming runtime + RocksDB JNI init)
    sys.props("graft.join.stateFormatVersion") = "3"
    once(names.head)
    names.foreach { n =>
      val rows = (1 to nReps).flatMap { _ =>
        Seq("2", "3").map { fmt =>
          sys.props("graft.join.stateFormatVersion") = fmt
          val (s, c) = once(n)
          (fmt, s, c)
        }
      }
      Seq("2", "3").foreach { fmt =>
        val mine = rows.filter(_._1 == fmt)
        val ws = mine.map(_._2).sorted
        val med = ws(ws.size / 2)
        println(f"[replayab] $n%-32s fmt=$fmt med=$med%6.2f " +
          mine.map { case (_, s, c) => f"$s%5.2f(cpu$c%5.1f)" }
            .mkString(" "))
      }
    }
    sys.props.remove("graft.join.stateFormatVersion")
    spark.stop()
  }
}
