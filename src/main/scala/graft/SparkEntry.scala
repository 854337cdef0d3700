package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tdf.TDF

/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {

  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * The reference benchmark chain (Define → Filter → Define → Histo,
    * reference benchmarks/benchmark.cxx:113-122) through the facade.
    */
  def entry(spark: SparkSession): DataFrame = {
    val dir = "/root/testdata/sf0.001"
    queries("q_histo_fixed")(spark, dir)
  }

  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    graft.queries.CoreQueries.queries ++
      graft.queries.RelationalQueries.queries ++
      graft.queries.PipelineQueries.queries ++
      graft.queries.ExtQueries.queries ++
      graft.queries.SqlSurfaceQueries.queries ++
      graft.queries.AnalyticsQueries.queries ++
      graft.queries.FeatureQueries.queries ++
      graft.queries.OlapQueries.queries

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    graft.queries.CoreQueries.oracles ++
      graft.queries.RelationalQueries.oracles ++
      graft.queries.PipelineQueries.oracles ++
      graft.queries.ExtQueries.oracles ++
      graft.queries.SqlSurfaceQueries.oracles ++
      graft.queries.AnalyticsQueries.oracles ++
      graft.queries.FeatureQueries.oracles ++
      graft.queries.OlapQueries.oracles
}
