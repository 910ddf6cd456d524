package graft.ml

import graft.SparkSpec

/** Behavioral contract for the classifier-based quality filter (the
  * query is rows-only — an L-BFGS fit has no SQL oracle). The labels
  * distill the rule-based gate, whose signals are all present in the
  * feature vector, so the fit must separate decisively: nearly every
  * rule-positive doc ordered above nearly every rule-negative one.
  */
class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("classifier distills the rule gate (AUC high, keep-rate sane)") {
    val out = graft.SparkEntry.queries("pipeline_quality_classifier")(spark, sf)
      .select($"doc_id", $"label", $"score", $"keep")
      .as[(Long, Long, Double, Boolean)].collect()
    spark.catalog.clearCache()
    val docs = graft.Tables.load(spark, sf, "documents")
    assert(out.length == docs.count(), "every document must be scored")
    val pos = out.filter(_._2 == 1L).map(_._3)
    val neg = out.filter(_._2 == 0L).map(_._3)
    assert(pos.nonEmpty && neg.nonEmpty)
    // exact AUC by pairwise comparison (small n; ties count half)
    var wins = 0.0
    for (p <- pos; q <- neg)
      wins += (if (p > q) 1.0 else if (p == q) 0.5 else 0.0)
    val auc = wins / (pos.length.toLong * neg.length)
    assert(auc >= 0.95, s"rule signals should separate cleanly, auc=$auc")
    // keep flag consistent with the 0.5 threshold
    out.foreach { case (_, _, s, k) => assert(k == (s >= 0.5)) }
    // the filter keeps SOMETHING and drops SOMETHING
    assert(out.exists(_._4) && out.exists(!_._4))
  }
}
