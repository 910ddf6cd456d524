package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.Row

/** No registered query may emit an IEEE negative-zero double/float.
  *
  * The driver's correctness gate hashes parquet BYTES, so Spark
  * serializing `0.0` where the DuckDB oracle serializes `-0.0` is a
  * hash red even though the values compare equal — the round-9
  * `emb_dim_corr` failure (exactly one cell: a tiny negative
  * correlation whose round(4) kept the sign bit on one engine only).
  * The remedy is the `Tables.nz` / `+ 0.0` idiom on BOTH engines
  * (IEEE: -0.0 + 0.0 = +0.0); this spec pins the Spark half for the
  * whole board by bit-scanning every query's collected output at
  * sf0.001 (the judge's method, moved into the suite). The oracle
  * half is checked by the driver's hash gate itself — an oracle-side
  * -0.0 against a clean Spark side is a red there.
  *
  * The scan recurses into arrays, structs, and map values so a signed
  * zero can't hide inside a nested column.
  */
class NegZeroSpec extends SparkSpec {
  private val sf = "/root/testdata/sf0.001"

  private def negZeros(v: Any): Long = v match {
    case d: Double =>
      if (java.lang.Double.doubleToRawLongBits(d) == Long.MinValue) 1L
      else 0L
    case f: Float =>
      if (java.lang.Float.floatToRawIntBits(f) == Int.MinValue) 1L
      else 0L
    case r: Row => r.toSeq.map(negZeros).sum
    case s: scala.collection.Seq[_] => s.map(negZeros).sum
    case m: scala.collection.Map[_, _] =>
      m.valuesIterator.map(negZeros).sum
    case _ => 0L
  }

  test("no registered query emits a negative-zero double at sf0.001") {
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    graft.SparkEntry.queries.toSeq.sortBy(_._1).foreach {
      case (name, fn) =>
        val n =
          try fn(spark, sf).collect().iterator.map(negZeros(_)).sum
          catch {
            case t: Throwable =>
              fail(s"$name crashed at sf0.001: ${t.getMessage}")
          }
        if (n > 0) offenders += s"$name ($n cells)"
        spark.catalog.clearCache()
    }
    assert(offenders.isEmpty,
      s"queries emitting -0.0 (add Tables.nz on the Spark side AND " +
        s"+ 0.0 in the oracle): ${offenders.mkString(", ")}")
  }
}
