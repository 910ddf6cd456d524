package graft.ml

import graft.SparkSpec

/** Behavioral contract for the classifier-based quality filter,
  * driven against the per-document trainScore frame (the registered
  * row now hashes the model CONTRACT — exact class sizes + fit
  * booleans — at the driver gate; see QualityModel.queries). The
  * labels distill the rule-based gate, whose signals are all present
  * in the feature vector, so the fit must separate decisively:
  * nearly every rule-positive doc ordered above nearly every
  * rule-negative one.
  */
class QualityModelSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("classifier distills the rule gate (AUC high, keep-rate sane)") {
    val out = graft.ml.QualityModel.trainScore(
        graft.Tables.spread(graft.Tables.load(spark, sf, "documents")))
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

  test("registered contract row: booleans hold, class sizes exact") {
    val r = graft.SparkEntry.queries("pipeline_quality_classifier")(spark, sf)
      .collect().head
    spark.catalog.clearCache()
    assert(r.getAs[Long]("n_docs") ==
      r.getAs[Long]("n_pos") + r.getAs[Long]("n_neg"))
    Seq("auc_ge_95", "keep_near_label_rate", "threshold_consistent")
      .foreach(c => assert(r.getAs[Boolean](c), s"$c must hold"))
  }
}
