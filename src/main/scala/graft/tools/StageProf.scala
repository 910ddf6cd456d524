package graft.tools

import graft.SparkEntry
import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Per-stage CPU/wall attribution for one query (measurement-only).
  * Records executorRunTime / executorCpuTime / task count per stage
  * via a SparkListener and prints the top stages by CPU with their
  * callsite name. Purpose (r20): adjudicate WHERE the extra process
  * CPU at 32 threads goes on the kernel-bound queries — if it
  * concentrates in one stage the pathology is real (§2/§4); if it is
  * a uniform multiplier it is the host's CPU-accounting inflation.
  * `runMain graft.tools.StageProf <sfDir> <query> [reps]`
  */
object StageProf {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val name = args.drop(1).headOption.getOrElse("dedup_semantic")
    val reps = args.drop(2).headOption.map(_.toInt).getOrElse(2)
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
    case class St(name: String, var run: Long = 0L, var cpu: Long = 0L,
      var tasks: Int = 0, var wall: Long = 0L)
    val stages =
      new java.util.concurrent.ConcurrentHashMap[Int, St]()
    val done = new java.util.concurrent.atomic.AtomicLong(0)
    val started = new java.util.concurrent.atomic.AtomicLong(0)
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onStageSubmitted(
          e: SparkListenerStageSubmitted): Unit =
        started.incrementAndGet()
      override def onStageCompleted(
          e: SparkListenerStageCompleted): Unit = {
        val i = e.stageInfo
        val st = stages.computeIfAbsent(i.stageId,
          _ => St(i.name.takeWhile(_ != '\n').take(90)))
        st.tasks += i.numTasks
        st.wall += (for {a <- i.completionTime; b <- i.submissionTime}
          yield a - b).getOrElse(0L)
        val m = i.taskMetrics
        if (m != null) { st.run += m.executorRunTime
          st.cpu += m.executorCpuTime / 1000000L }
        done.incrementAndGet()
      }
    })
    (1 to reps).foreach { rep =>
      stages.clear(); done.set(0); started.set(0)
      val t0 = System.nanoTime()
      SparkEntry.queries(name)(spark, sfDir)
        .agg(bit_xor(xxhash64(struct(col("*"))))).collect()
      val w = (System.nanoTime() - t0) / 1e9
      spark.catalog.clearCache()
      val dl = System.nanoTime() + 10L * 1000000000L
      while (done.get < started.get && System.nanoTime() < dl)
        Thread.sleep(50)
      import scala.jdk.CollectionConverters._
      val rows = stages.asScala.toSeq.sortBy(-_._2.cpu)
      val totCpu = rows.map(_._2.cpu).sum / 1e3
      val totRun = rows.map(_._2.run).sum / 1e3
      println(f"[stageprof] $name rep$rep wall=$w%.2f " +
        f"sumCpu=$totCpu%.1f sumRun=$totRun%.1f nStages=${rows.size}")
      rows.take(12).foreach { case (id, s) =>
        println(f"  stage$id%5d cpu=${s.cpu / 1e3}%7.2f " +
          f"run=${s.run / 1e3}%7.2f tasks=${s.tasks}%4d " +
          f"wall=${s.wall / 1e3}%6.2f  ${s.name}")
      }
    }
    spark.stop()
  }
}
