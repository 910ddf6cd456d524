package graft.tools

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Measurement-only same-JVM interleaved A/B for the r20 §1.2
  * rewrites (the PfAb discipline: both arms share JIT state and
  * box-noise exposure; medians of alternating reps carry the signal
  * on this duty-cycle-noisy host). Each entry reconstructs the
  * PRE-change form verbatim and alternates it against the committed
  * form in `SparkEntry.queries`.
  * `runMain graft.tools.FormAb <sfDir> <nRepsPerArm> <key...>`
  */
object FormAb {

  // pre-r20 q115_fd_discovery: every candidate its own scan+groupBy
  private def q115Old(s: SparkSession, d: String): DataFrame = {
    def fd(table: String, a: String, b: String): DataFrame =
      graft.Tables.load(s, d, table)
        .groupBy(col(a).as("k"))
        .agg(countDistinct(col(b)).as("nb"))
        .agg(count(lit(1)).as("n_det"), sum(col("nb")).as("n_pairs"),
          sum(when(col("nb") > 1, 1L).otherwise(0L)).as("n_violating"))
        .select(lit(s"$table.$a -> $table.$b").as("fd"),
          col("n_det"), col("n_pairs"), col("n_violating"),
          (col("n_violating") === 0L).as("holds"))
    fd("orders", "o_orderkey", "o_custkey")
      .unionAll(fd("orders", "o_orderkey", "o_orderstatus"))
      .unionAll(fd("orders", "o_custkey", "o_orderpriority"))
      .unionAll(fd("lineitem", "l_orderkey", "l_suppkey"))
      .unionAll(fd("lineitem", "l_partkey", "l_suppkey"))
      .unionAll(fd("customer", "c_custkey", "c_mktsegment"))
      .unionAll(fd("customer", "c_nationkey", "c_mktsegment"))
      .unionAll(fd("nation", "n_nationkey", "n_regionkey"))
      .orderBy(col("fd"))
  }

  // pre-r20 pipeline_zorder_layout: dims unpersisted (recomputed by
  // the count and each of the three layout passes)
  private def zorderOld(s: SparkSession, d: String): DataFrame = {
    val nFiles = 64L
    val zExpr = (0 until 10).map(i =>
      s"(((u >> $i) & 1) << ${2 * i}) | (((dd >> $i) & 1) << ${2 * i + 1})")
      .mkString("(", " | ", ")")
    val base = graft.Tables.load(s, d, "events")
      .select(col("event_id"), (col("user_id") % 128L).as("u"),
        to_date(col("ts")).as("day"))
    val span = base.agg(min(col("day")).as("d0"),
        max(col("day")).as("d1"), max(col("u")).as("um"))
      .select(col("d0"),
        datediff(col("d1"), col("d0")).cast("long").as("sp"), col("um"))
      .first
    val (d0, sp, um) = (span.getDate(0), span.getLong(1),
      span.getLong(2))
    val dims = base
      .select(col("event_id"), col("u"),
        datediff(col("day"), lit(d0)).cast("long").as("dd"))
      .withColumn("z", expr(zExpr))
    val nTotal = dims.count()
    def layout(name: String, orderCols: Seq[Column]): DataFrame = {
      val ranked = graft.ops.PrefixSum.runningTotal(dims,
        orderCols :+ col("event_id"), lit(1L), "rn")
      ranked
        .withColumn("fid", expr(s"((rn - 1) * $nFiles) div ${nTotal}L"))
        .groupBy(col("fid"))
        .agg(min(col("u")).as("u_lo"), max(col("u")).as("u_hi"),
          min(col("dd")).as("d_lo"), max(col("dd")).as("d_hi"))
        .withColumn("layout", lit(name))
    }
    val files = layout("zorder", Seq(col("z")))
      .unionByName(layout("by_user", Seq(col("u"))))
      .unionByName(layout("by_day", Seq(col("dd"))))
    val uLo = (um * 7L) / 16L
    val uHi = (um * 9L) / 16L
    val dLo = (sp * 7L) / 16L
    val dHi = (sp * 9L) / 16L
    files
      .select(col("layout"),
        explode(array(
          struct(lit("user").as("pred_dim"),
            (col("u_hi") < uLo || col("u_lo") > uHi).as("skipped")),
          struct(lit("day").as("pred_dim"),
            (col("d_hi") < dLo || col("d_lo") > dHi).as("skipped"))))
          .as("p"))
      .groupBy(col("layout"), col("p.pred_dim"))
      .agg(count(lit(1)).as("n_files"),
        sum(when(col("p.skipped"), 1L).otherwise(0L)).as("n_skipped"))
      .withColumn("skip_rate",
        round(col("n_skipped").cast("double") /
          col("n_files").cast("double"), 4))
      .orderBy(col("layout"), col("pred_dim"))
  }

  private val oldForms
      : Map[String, (SparkSession, String) => DataFrame] = Map(
    "q115_fd_discovery" -> q115Old,
    "pipeline_zorder_layout" -> zorderOld)

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val nReps = args.lift(1).map(_.toInt).getOrElse(3)
    val names =
      if (args.length > 2) args.drop(2).toSeq else oldForms.keys.toSeq
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
    def run(df: DataFrame): (Double, Double) = {
      val c0 = cpuNow()
      val t0 = System.nanoTime()
      df.agg(bit_xor(xxhash64(struct(col("*"))))).collect()
      val s = (System.nanoTime() - t0) / 1e9
      val c = (cpuNow() - c0) / 1e9
      spark.catalog.clearCache()
      (s, c)
    }
    names.foreach { n =>
      // warm both arms once (codegen for each form)
      run(oldForms(n)(spark, sfDir))
      run(graft.SparkEntry.queries(n)(spark, sfDir))
      val samples = (1 to nReps).map { _ =>
        val o = run(oldForms(n)(spark, sfDir))
        val w = run(graft.SparkEntry.queries(n)(spark, sfDir))
        (o, w)
      }
      def med(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
      println(f"[formab] $n%-28s OLD med=${med(samples.map(_._1._1))}%5.2f " +
        samples.map { case ((s, c), _) => f"$s%5.2f(cpu$c%5.1f)" }
          .mkString(" "))
      println(f"[formab] $n%-28s NEW med=${med(samples.map(_._2._1))}%5.2f " +
        samples.map { case (_, (s, c)) => f"$s%5.2f(cpu$c%5.1f)" }
          .mkString(" "))
    }
    spark.stop()
  }
}
