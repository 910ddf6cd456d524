package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Loaders for the driver-generated parquet tables (TESTDATA.md).
  *
  * All queries take an `sfDir` (e.g. `/root/testdata/sf0.01`) and read
  * single-parquet tables from it. Reads go through `spark.read.parquet`
  * so Catalyst gets full pushdown/pruning; never cache here — the
  * driver's Verify/Bench mains decide lifecycle.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, sfDir: String, name: String): DataFrame = {
    if (name == "events") loadEvents(spark, sfDir)
    else ntzToUtc(spark.read.parquet(s"$sfDir/$name.parquet"))
  }

  /** Normalize TIMESTAMP_NTZ columns to session-zone TIMESTAMP.
    *
    * The driver's generator writes parquet `timestamp[us]` WITHOUT a
    * timezone annotation (isAdjustedToUTC=false), which Spark 4 infers
    * as TIMESTAMP_NTZ (`spark.sql.parquet.inferTimestampNTZ.enabled`
    * defaults true) — but functions on the query surface (unix_micros,
    * casts to long, INTERVAL arithmetic twins of the DuckDB oracles)
    * take TIMESTAMP. Every graft session pins
    * `spark.sql.session.timeZone=UTC`, so this cast is a pure type
    * relabel — the underlying micros are unchanged, exactly the value
    * DuckDB's naive-timestamp read of the same file produces. Done in
    * the loader (not per-query, not per-session conf) so fixtures and
    * driver parquet behave identically everywhere.
    */
  private def ntzToUtc(df: DataFrame): DataFrame =
    df.schema.fields.foldLeft(df) { (d, f) =>
      if (f.dataType == org.apache.spark.sql.types.TimestampNTZType)
        d.withColumn(f.name, col(f.name).cast("timestamp"))
      else d
    }

  /** Spread a frame across the session's parallelism ONLY when its
    * plan yields fewer partitions. Locally a small table is one parquet
    * split, so any per-row-expensive downstream stage (shingling,
    * simhash votes, multimodal kernels) would run on a single core —
    * worth one exchange. At 100 TB the scan already has thousands of
    * splits and an unconditional repartition would re-shuffle every
    * byte for nothing, so it is skipped (asserted in SpreadSpec).
    *
    * Scan-shaped frames ONLY, and the require enforces it (not caller
    * discipline): `df.rdd` forces physical planning, which on a pure
    * scan creates the RDD without running a job — but on a plan
    * containing a Join it could eagerly materialize a
    * BroadcastExchange during planning (and again at execution).
    * Callers with joins upstream spread the scan side first (see
    * Multimodal.pack). The per-call physical planning that remains is
    * milliseconds for a scan and buys the real partition count.
    */
  def spread(df: DataFrame): DataFrame = {
    // Reject explicit Joins AND subquery expressions (EXISTS/IN/scalar
    // subqueries) — the optimizer rewrites the latter into joins, so a
    // Join-only check would let them slip through to eager planning.
    require(!df.queryExecution.analyzed.exists(p =>
        p.isInstanceOf[org.apache.spark.sql.catalyst.plans.logical.Join] ||
          p.expressions.exists(_.exists(
            _.isInstanceOf[org.apache.spark.sql.catalyst.expressions.SubqueryExpression]))),
      "Tables.spread takes scan-shaped frames: planning a join (or a " +
        "subquery the optimizer rewrites into one) here can eagerly " +
        "materialize broadcast sides — spread the scan input before joining")
    val target = df.sparkSession.sessionState.conf.numShufflePartitions
    if (df.rdd.getNumPartitions < target) df.repartition(target) else df
  }

  /** Canonicalize IEEE signed zero in a double-valued column.
    *
    * `-0.0 + 0.0 == +0.0` (IEEE 754 round-to-nearest), and every other
    * value is unchanged — so appending `+ 0.0` after a `round(...)`
    * guarantees a rounded-to-zero negative never serializes as the
    * `-0.0` bit pattern. The driver's oracle compare hashes parquet
    * BYTES, so Spark emitting `0.0` while DuckDB emits `-0.0` (or vice
    * versa) is a hash red even though the values compare equal —
    * exactly the round-9 `emb_dim_corr` failure (one cell, row 308).
    * Use this on every float-emitting projection, paired with the
    * ` + 0.0` idiom in the DuckDB oracle SQL.
    */
  def nz(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
    c + lit(0.0)

  /** `events.ts` is nanosecond-precision parquet, which Spark 4 rejects
    * ([PARQUET_TYPE_ILLEGAL]). Read it as nanos-since-epoch long
    * (legacy conf) and truncate to microsecond TimestampType — the same
    * truncation DuckDB's `epoch_us` applies, keeping oracle parity
    * (SURVEY.md §7.4). Integer `div` (not `/`) — ~1.7e18 ns does not
    * fit a double's 53-bit mantissa.
    */
  def loadEvents(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    if (raw.schema("ts").dataType == LongType)
      raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
    else ntzToUtc(raw)
  }
}
