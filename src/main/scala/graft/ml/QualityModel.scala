package graft.ml

import org.apache.spark.ml.classification.LogisticRegression
import org.apache.spark.ml.feature.VectorAssembler
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.{Q, Tables}

/** Model-based quality filtering — the classifier-filter design every
  * large pretraining corpus uses (a linear classifier scores documents
  * "reference-like vs not", and only high scorers enter training).
  * The reference engine (`/root/reference/`, a log forwarder) has no
  * model surface; this is a §2b/§2c extension on the training-data
  * goal.
  *
  * Labels come from the rule-based quality gate (`text_quality`'s
  * composite, thresholded) — the standard weak-supervision bootstrap:
  * hand rules label a seed set, the classifier distills them into a
  * smooth score that ranks everything, including docs the rules only
  * barely pass or fail. (The corpus's `lang` column is NOT learnable
  * from its synthetic word-salad text, so a domain label would test
  * nothing; the rule label is the honest learnable target here.)
  * Features are the rule's raw signals plus the per-language
  * stopword profile.
  *
  * Scale shape: training is MLlib LogisticRegression — each L-BFGS
  * iteration is one treeAggregate of gradient partials (map-side
  * combine, driver holds only the coefficient vector); featurization
  * is row-local expression work; scoring inlines the fitted
  * coefficients as plan literals (codegen'd, no model object in any
  * task closure). Nothing about the corpus
  * size reaches the driver except d+1 doubles per iteration, so the
  * same code trains on 100 TB. Registered rows-only (an L-BFGS fit is
  * not SQL-expressible); QualityModelSpec pins separation quality and
  * the keep-rate envelope.
  */
object QualityModel {

  private val stopwords: Seq[(String, Seq[String])] = Seq(
    "de" -> Seq("der", "die", "das", "und", "ist"),
    "en" -> Seq("the", "a", "of", "and", "is"),
    "es" -> Seq("el", "la", "de", "y", "es"),
    "fr" -> Seq("le", "la", "les", "et", "est"),
    "zh" -> Seq("de", "shi", "le", "he", "zai"))

  private val qualityStops =
    Seq("the", "a", "of", "and", "is", "to", "in")

  private val featCols: Array[String] =
    Array("stop_ratio", "distinct_ratio", "len_ok", "n_tokens_d") ++
      stopwords.map { case (l, _) => s"r_$l" }

  /** Row-local feature profile: the rule gate's raw signals
    * (stopword ratio, type/token ratio, length indicator, token
    * count) plus per-language stopword ratios. Works on any frame
    * with (doc_id, text, lang).
    */
  def featurize(docs: DataFrame): DataFrame = {
    val toks = split(lower(col("text")), "\\s+")
    val withT = docs.withColumn("t", toks)
      .withColumn("stop_ratio",
        size(filter(col("t"), x => x.isin(qualityStops: _*)))
          .cast("double") / size(col("t")).cast("double"))
      .withColumn("distinct_ratio",
        size(array_distinct(col("t"))).cast("double") /
          size(col("t")).cast("double"))
      .withColumn("len_ok",
        when(length(col("text")) >= 100, 1.0).otherwise(0.0))
      .withColumn("n_tokens_d", size(col("t")).cast("double"))
    stopwords.foldLeft(withT) { case (acc, (l, words)) =>
      acc.withColumn(s"r_$l",
        size(filter(col("t"), x => x.isin(words: _*))).cast("double") /
          size(col("t")).cast("double"))
    }
  }

  /** Train the reference-vs-rest classifier and score every document.
    * Returns (doc_id, label, score, keep) sorted by doc_id.
    */
  def trainScore(docs: DataFrame): DataFrame = {
    // featurize feeds BOTH the training assembly and the scoring
    // projection — persist the (narrow) feature columns once instead
    // of running the 7 per-token HOF passes twice over the corpus;
    // released by the harness clearCache (cache lifecycle discipline)
    val feats = featurize(docs)
      .withColumn("label",
        when(col("len_ok") + col("distinct_ratio") + col("stop_ratio")
          >= 1.5, 1.0).otherwise(0.0))
      .select((Seq("doc_id", "label") ++ featCols).map(col): _*)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    // no second persist for the assembled frame: each L-BFGS pass
    // reads the cached narrow features and assembles row-locally
    val assembled = new VectorAssembler()
      .setInputCols(featCols).setOutputCol("features")
      .transform(feats)
      .select(col("doc_id"), col("label"), col("features"))
    // 20 iterations: the rule signals are linearly separable, so the
    // ORDERING (what the AUC spec pins) is fixed within a few rounds —
    // further L-BFGS rounds only grow the margin, at one treeAggregate
    // job each
    val lr = new LogisticRegression()
      .setMaxIter(20).setRegParam(0.01).setStandardization(true)
    val model = lr.fit(assembled)
    // Score with the fitted coefficients as PLAN LITERALS, not with
    // model.transform: the model object carries its training summary,
    // whose sparkSession reference is not task-serializable (Spark 4's
    // ObservationManager), so capturing the model in a scoring closure
    // can fail at execution depending on session state. d+1 literal
    // doubles in a codegen'd expression are also the stronger scale
    // shape — the "broadcast" is the plan itself.
    val coef = model.coefficients.toArray
    val z = featCols.zipWithIndex.foldLeft(lit(model.intercept)) {
      case (acc, (c, i)) => acc + lit(coef(i)) * col(c)
    }
    feats
      .select(col("doc_id"), col("label").cast("long").as("label"),
        round(lit(1.0) / (lit(1.0) + exp(-z)), 4).as("score"))
      .withColumn("keep", (col("score") >= 0.5).cast("boolean"))
      .orderBy(col("doc_id"))
  }

  def queries: Map[String, Q] = Map(
    "pipeline_quality_classifier" -> ((s, d) =>
      trainScore(Tables.spread(Tables.load(s, d, "documents")))))

  /** L-BFGS fits are not SQL-expressible — rows-only check; the
    * behavioral contract lives in QualityModelSpec.
    */
  def oracles: Map[String, String] = Map.empty
}
