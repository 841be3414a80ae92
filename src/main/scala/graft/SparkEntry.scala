package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

import graft.operators.{AsOf, Dedup, Multimodal, Pca, Pipeline, PqIndex, Relational, RelationalOracles, Sampling, Similarity, TextAnalysis}

/** Driver contract — see /root/repo/SURVEY.md §2 for the inventory. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0. */
  def entry(spark: SparkSession): DataFrame = {
    GraftSession.prepare(spark)
    Relational.queries("q_pricing_summary")(spark, "/root/testdata/sf0.001")
  }

  /** One entry per implemented operator from SURVEY.md §2. Each query
    * prepares the session first (idempotent) so the driver's bare session
    * picks up graft functions + the nanos-timestamp read config. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = {
    val raw = Relational.queries ++ Dedup.queries ++ Similarity.queries ++
      TextAnalysis.queries ++ Multimodal.queries ++ AsOf.queries ++
      Pipeline.queries ++ Sampling.queries ++ PqIndex.queries ++
      Pca.queries ++ graft.sql.SqlQueries.queries ++
      graft.streaming.StreamQueries.queries
    raw.map { case (name, fn) =>
      name -> ((s: SparkSession, dir: String) => { GraftSession.prepare(s); fn(s, dir) })
    }
  }

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omitted keys get the weaker rows-only check. */
  def oracleSql: Map[String, String] =
    RelationalOracles.oracles ++ Dedup.oracles ++ Similarity.oracles ++
      TextAnalysis.oracles ++ Multimodal.oracles ++ AsOf.oracles ++
      Pipeline.oracles ++ Sampling.oracles ++ PqIndex.oracles ++
      Pca.oracles ++ graft.sql.SqlQueries.oracles ++
      graft.streaming.StreamQueries.oracles
}
