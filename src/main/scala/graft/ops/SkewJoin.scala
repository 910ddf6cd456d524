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

  /** Join types where right-side replication cannot change result
    * multiplicity: every left row sees exactly its one salt replica.
    * right/full outer would emit unmatched right REPLICAS (up to
    * saltFactor copies) — rejected.
    */
  private val SafeJoinTypes =
    Set("inner", "left", "left_outer", "leftouter", "left_semi",
      "leftsemi", "left_anti", "leftanti")

  def saltedEquiJoin(left: DataFrame, right: DataFrame, key: String,
      saltFactor: Int = 8, joinType: String = "inner"): DataFrame = {
    require(saltFactor > 0)
    require(SafeJoinTypes.contains(joinType.toLowerCase),
      s"saltedEquiJoin supports $SafeJoinTypes, not '$joinType': " +
        "right/full outer joins would duplicate unmatched right rows " +
        "once per salt replica")
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
