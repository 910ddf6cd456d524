package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering: interleave the bits of two bounded
  * dimension keys so that sorting by the combined value co-locates
  * rows that are close in BOTH dimensions. Row-group min/max stats
  * then skip most of a scan for selective predicates on EITHER
  * dimension — where a linear sort only serves its leading column.
  * This is the standard multi-dimensional layout lever for 100 TB
  * tables queried along more than one axis (time × tenant, lang ×
  * length, …); the write is a one-off sort, the reads win forever.
  *
  * Dimensions must be pre-normalized to non-negative ints below
  * 2^bits (bucketize first: `floor(col / width)`, dayofmonth, a hash
  * band, …). Plain shift/or column arithmetic — stays in codegen.
  */
object ZOrder {

  /** Morton code of two dimension columns: bit i of `a` lands at
    * position 2i+1, bit i of `b` at position 2i.
    */
  def zValue(a: Column, b: Column, bits: Int = 16): Column =
    (0 until bits).map { i =>
      val aBit = shiftleft(a.cast("long").bitwiseAND(1L << i), i + 1)
      val bBit = shiftleft(b.cast("long").bitwiseAND(1L << i), i)
      aBit.bitwiseOR(bBit)
    }.reduce(_ bitwiseOR _)

  /** Rewrite a frame into Z-ordered layout over two bucketized
    * dimensions — sort-within-partitions by the Morton code (plus the
    * raw dims as tie-breaks for run-length-friendly pages).
    */
  def cluster(df: DataFrame, dimA: Column, dimB: Column,
      bits: Int = 16): DataFrame =
    df.sortWithinPartitions(zValue(dimA, dimB, bits), dimA, dimB)
}
