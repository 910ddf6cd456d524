package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Skew-aware join via key salting — the manual fallback when AQE's
  * runtime skew-join splitting isn't applicable (e.g. non-shuffle
  * joins, or pre-Spark-3 clusters). At 100 TB a handful of hot keys
  * (one hostname, one null-ish user id) can pin a whole stage on one
  * task; salting fans each hot key out over `saltFactor` subkeys.
  *
  * Shape: the LEFT (large, skewed) side gets a random salt in
  * [0, saltFactor); the RIGHT side is replicated `saltFactor` times via
  * explode so every (key, salt) pair finds its match. Row multiplicity
  * is unchanged: each left row joins exactly the one replica with its
  * salt.
  */
object SkewJoin {

  def saltedEquiJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int = 8, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    // deterministic salt from stable row content would skew with the
    // data itself; uniform pseudo-random is the point (seeded for
    // reproducible plans)
    val saltedLeft = left.withColumn("_salt",
      (rand(seed = 42) * saltFactor).cast("int"))
    val saltedRight = right.withColumn("_salt",
      explode(sequence(lit(0), lit(saltFactor - 1))))
    saltedLeft.join(saltedRight, Seq(key, "_salt"), joinType)
      .drop("_salt")
  }
}
