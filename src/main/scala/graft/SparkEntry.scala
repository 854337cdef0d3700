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

  /** Merge per-file maps, FAILING LOUDLY on key collisions: a duplicate
    * gate name would otherwise silently shadow an existing query (and its
    * oracle) with no count change — an existing correctness gate vanishing
    * without a failure (the r11 q_profile_cols near-miss).
    */
  private def mergeDisjoint[V](parts: (String, Map[String, V])*): Map[String, V] = {
    val seen = scala.collection.mutable.Map[String, String]()
    val out = Map.newBuilder[String, V]
    for ((src, m) <- parts; (k, v) <- m) {
      seen.put(k, src).foreach { prev =>
        throw new IllegalStateException(
          s"duplicate gate key '$k' defined in both $prev and $src — " +
            "rename one; silent shadowing loses a correctness gate")
      }
      out += k -> v
    }
    out.result()
  }

  /** One entry per implemented operator from SURVEY.md §2.
    *
    * Stream twins (`q_stream_*`) run under
    * [[graft.streaming.Streams.withStreamShuffle]]: their micro-batches use a
    * small fixed state-partition count instead of the session's CPU-count
    * batch default — the per-trigger state-store machinery is proportional to
    * shuffle partitions × stateful operators, pure overhead at gate-scale
    * state sizes (see the constant's scaladoc for the 100 TB reading). The
    * override spans only the builder call (plan → start → drain → stop);
    * correctness is partition-count-invariant by law.
    */
  def queries: Map[String, (SparkSession, String) => DataFrame] =
    mergeDisjoint(
      "CoreQueries" -> graft.queries.CoreQueries.queries,
      "RelationalQueries" -> graft.queries.RelationalQueries.queries,
      "PipelineQueries" -> graft.queries.PipelineQueries.queries,
      "ExtQueries" -> graft.queries.ExtQueries.queries,
      "SqlSurfaceQueries" -> graft.queries.SqlSurfaceQueries.queries,
      "AnalyticsQueries" -> graft.queries.AnalyticsQueries.queries,
      "FeatureQueries" -> graft.queries.FeatureQueries.queries,
      "OlapQueries" -> graft.queries.OlapQueries.queries)
      .map { case (k, f) =>
        if (k.startsWith("q_stream_") && !streamShuffleExempt(k))
          k -> ((s: SparkSession, dir: String) =>
            graft.streaming.Streams.withStreamShuffle(s)(f(s, dir)))
        else k -> f
      }

  /** Twins whose per-trigger cost is shuffle WORK, not state-store
    * machinery: both hold zero state-store rows (stream_stats state_rows=0
    * in every artifact) and were the only two stream rows to REGRESS under
    * the 4-partition override (BENCH_quiet_r18a vs r17d:
    * q_stream_transitions 4.17→5.46, q_stream_upsert 1.01→1.47 — their
    * per-trigger lag/merge shuffles want the cores). They keep the
    * session's partition count; every state-store-bound twin takes the
    * override.
    */
  private[graft] val streamShuffleExempt: Set[String] =
    Set("q_stream_transitions", "q_stream_upsert")

  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops.
    */
  def oracleSql: Map[String, String] =
    mergeDisjoint(
      "CoreQueries" -> graft.queries.CoreQueries.oracles,
      "RelationalQueries" -> graft.queries.RelationalQueries.oracles,
      "PipelineQueries" -> graft.queries.PipelineQueries.oracles,
      "ExtQueries" -> graft.queries.ExtQueries.oracles,
      "SqlSurfaceQueries" -> graft.queries.SqlSurfaceQueries.oracles,
      "AnalyticsQueries" -> graft.queries.AnalyticsQueries.oracles,
      "FeatureQueries" -> graft.queries.FeatureQueries.oracles,
      "OlapQueries" -> graft.queries.OlapQueries.oracles)
}
