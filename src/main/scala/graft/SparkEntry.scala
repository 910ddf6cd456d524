package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import graft.dedup.Dedup
import graft.multimodal.Multimodal
import graft.queries.{Analytics, Corpus, Graph, Insights, LogOps, Mining, Pipeline, Relational}
import graft.sim.Similarity
import graft.text.TextAnalysis

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt.
  *
  * `queries` is the union of the per-domain modules; each name present
  * in `oracleSql` is hash-compared against DuckDB by the driver at
  * sf0.01. Names absent from `oracleSql` (non-SQL-expressible ops,
  * e.g. hash-seeded MinHash/LSH) get a weaker rows-only check.
  */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame =
    queries("q3_join_agg")(spark, "/root/testdata/sf0.001")

  def queries: Map[String, Q] =
    Relational.queries ++ Analytics.queries ++ LogOps.queries ++
      Dedup.queries ++ TextAnalysis.queries ++ Similarity.queries ++
      Multimodal.queries ++ Pipeline.queries ++ Corpus.queries ++
      Graph.queries ++ Mining.queries ++ Insights.queries ++ graft.ml.QualityModel.queries ++
      graft.text.Bpe.queries ++ graft.queries.Frontier.queries ++
      graft.queries.Frontier2.queries ++
      graft.queries.Frontier3.queries ++
      graft.queries.Frontier4.queries ++ graft.queries.Frontier5.queries ++
      graft.queries.Frontier6.queries ++ graft.queries.Frontier7.queries ++
      graft.queries.LlmFrontier.queries ++ graft.queries.Frontier8.queries ++
      graft.queries.LlmFrontier2.queries ++ graft.queries.Frontier9.queries ++
      graft.queries.Frontier10.queries ++ graft.queries.Frontier11.queries ++
      graft.queries.Frontier12.queries

  def oracleSql: Map[String, String] =
    Relational.oracles ++ Analytics.oracles ++ LogOps.oracles ++
      Dedup.oracles ++ TextAnalysis.oracles ++ Similarity.oracles ++
      Multimodal.oracles ++ Pipeline.oracles ++ Corpus.oracles ++
      Graph.oracles ++ Mining.oracles ++ Insights.oracles ++ graft.ml.QualityModel.oracles ++
      graft.text.Bpe.oracles ++ graft.queries.Frontier.oracles ++
      graft.queries.Frontier2.oracles ++
      graft.queries.Frontier3.oracles ++
      graft.queries.Frontier4.oracles ++ graft.queries.Frontier5.oracles ++
      graft.queries.Frontier6.oracles ++ graft.queries.Frontier7.oracles ++
      graft.queries.LlmFrontier.oracles ++ graft.queries.Frontier8.oracles ++
      graft.queries.LlmFrontier2.oracles ++ graft.queries.Frontier9.oracles ++
      graft.queries.Frontier10.oracles ++ graft.queries.Frontier11.oracles ++
      graft.queries.Frontier12.oracles
}
