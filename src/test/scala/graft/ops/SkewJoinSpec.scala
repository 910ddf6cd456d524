package graft.ops

import graft.SparkSpec
import org.apache.spark.sql.functions._

class SkewJoinSpec extends SparkSpec {
  import spark.implicits._

  test("salted join matches plain join results on skewed data") {
    // heavy skew: 90% of left rows share key 1
    val left = (1 to 1000).map(i =>
      (if (i <= 900) 1L else i.toLong % 50, s"l$i")).toDF("k", "lv")
    val right = (0 to 60).map(i => (i.toLong, s"r$i")).toDF("k", "rv")

    val plain = left.join(right, Seq("k")).select("k", "lv", "rv")
      .as[(Long, String, String)].collect().toSet
    val salted = SkewJoin.saltedEquiJoin(left, right, "k", saltFactor = 8)
      .select("k", "lv", "rv")
      .as[(Long, String, String)].collect().toSet
    assert(salted == plain)
    assert(plain.count(_._1 == 1L) >= 900) // the planted hot key dominates
  }

  test("left outer salted join preserves unmatched left rows") {
    val left = Seq((1L, "a"), (99L, "nomatch")).toDF("k", "lv")
    val right = Seq((1L, "r1")).toDF("k", "rv")
    val out = SkewJoin.saltedEquiJoin(left, right, "k", 4, "left_outer")
      .select($"k", $"lv", $"rv")
      .collect().map(r => (r.getLong(0), r.getString(1),
        Option(r.getString(2)))).toSet
    assert(out == Set((1L, "a", Some("r1")), (99L, "nomatch", None)))
  }

  test("salt spreads a hot key across partitions") {
    val left = (1 to 1000).map(_ => (1L, "x")).toDF("k", "lv")
    val salted = left.withColumn("_salt", (rand(42) * 8).cast("int"))
    val counts = salted.groupBy("_salt").count()
      .as[(Int, Long)].collect().toMap
    assert(counts.size == 8)
    assert(counts.values.max < 1000) // no single bucket holds everything
  }
}
