package graft.queries

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavioral guards for the round-8 bucketization / mode /
  * collocation queries. The DuckDB gate proves cross-engine equality;
  * these pin the semantics — equi-depth buckets really are equal-depth
  * and range-partition the key space, the mode row really is each
  * group's max-count value, PMI ranks favor pairs that co-occur above
  * independence.
  */
class BinModeSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("equi-depth buckets: depths differ by at most 1, ranges ordered, total preserved") {
    val b = graft.SparkEntry.queries("q73_equidepth")(spark, sf)
      .as[(Long, Long, Long, Long, Long)].collect()
    assert(b.map(_._1).toSeq == (1L to 8L), "8 dense buckets")
    val depths = b.map(_._2)
    assert(depths.max - depths.min <= 1,
      s"equi-depth means depths differ by <=1: ${depths.toSeq}")
    val total = spark.read.parquet(s"$sf/customer.parquet").count()
    assert(depths.sum == total, "buckets partition all rows")
    // bucket k's hi <= bucket k+1's lo (ties can straddle only via
    // the unique (cents, custkey) sort key, so ranges may touch but
    // never invert)
    b.sliding(2).foreach { case Array(x, y) =>
      assert(x._4 <= y._3, s"bucket ranges inverted: $x then $y")
    }
  }

  test("mode per segment is the true per-group argmax") {
    val got = graft.SparkEntry.queries("q74_mode_by_segment")(spark, sf)
      .as[(String, String, Long)].collect()
    val counts = spark.read.parquet(s"$sf/orders.parquet")
      .join(spark.read.parquet(s"$sf/customer.parquet"),
        $"o_custkey" === $"c_custkey")
      .groupBy($"c_mktsegment", $"o_orderpriority").count()
      .as[(String, String, Long)].collect()
      .groupBy(_._1)
    assert(got.nonEmpty && got.length == counts.size)
    got.foreach { case (seg, modal, n) =>
      val grp = counts(seg)
      assert(n == grp.map(_._3).max, s"$seg: $n is not the max count")
      // the declared tie-break: among max-count rows, smallest value
      val winners = grp.filter(_._3 == n).map(_._2).sorted
      assert(modal == winners.head,
        s"$seg: tie-break should pick ${winners.head}, got $modal")
    }
  }

  test("pmi: reported pairs beat independence and meet the support floor") {
    val rows = graft.SparkEntry.queries("text_pmi_bigrams")(spark, sf)
      .as[(String, String, Long, Double)].collect()
    assert(rows.nonEmpty && rows.length <= 50)
    assert(rows.forall(_._3 >= 5), "support floor is 5")
    // descending by pmi with (w1, w2) tie-break
    rows.sliding(2).foreach {
      case Array(a, b) =>
        assert(a._4 > b._4 || (a._4 == b._4 &&
          (a._1 < b._1 || (a._1 == b._1 && a._2 <= b._2))),
          s"pmi ordering violated between $a and $b")
      case _ => ()
    }
    // top collocations should sit above independence (pmi > 0): the
    // corpus is large enough that a pair kept by the support floor
    // and ranked first cannot be anti-correlated
    assert(rows.head._4 > 0, s"top pmi ${rows.head} not positive")
  }
}
