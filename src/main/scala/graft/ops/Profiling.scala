package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Data-profiling audit — the ANALYZE/data-quality step a curation pipeline
  * runs before committing a corpus snapshot: per-column non-null count, null
  * count, EXACT distinct count, and min/max, for a set of numeric columns.
  *
  * Shape: ONE wide aggregation computes every statistic in a single pass over
  * the scan (map-side partials for count/null/min/max; the exact distincts
  * expand per-column — the standard Spark multi-distinct plan, each distinct
  * column shuffled once on its own values), then a `stack` unpivot emits one
  * row per column. At 100 TB the scan happens once regardless of how many
  * columns are profiled; swap `countDistinct` for `approx_count_distinct` when
  * a sketch suffices and the whole audit collapses to one shuffle-free pass.
  */
object Profiling {

  def columnStats(df: DataFrame, cols: Seq[String]): DataFrame = {
    require(cols.nonEmpty, "columnStats: no columns given")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        countDistinct(col(c)).as(s"${c}__distinct"),
        min(col(c).cast("double")).as(s"${c}__min"),
        max(col(c).cast("double")).as(s"${c}__max"))
    }
    val wide = df.agg(aggs.head, aggs.tail: _*)
    stack(wide, cols)
  }

  /** The 100 TB fast path: same audit with `approx_count_distinct` (HLL++)
    * in place of the exact distincts. The exact form plans an `Expand` —
    * (#distinct-cols + 1)× row inflation through the shuffle; this variant
    * is a single shuffle-free pass with map-side partials (sketches merge),
    * which is what you run over a full corpus. `rsd` is the sketch's target
    * relative standard deviation.
    */
  def columnStatsApprox(df: DataFrame, cols: Seq[String], rsd: Double = 0.05): DataFrame = {
    require(cols.nonEmpty, "columnStatsApprox: no columns given")
    val aggs = cols.flatMap { c =>
      Seq(
        count(col(c)).as(s"${c}__n"),
        sum(when(col(c).isNull, 1L).otherwise(0L)).as(s"${c}__nulls"),
        approx_count_distinct(col(c), rsd).as(s"${c}__distinct"),
        min(col(c).cast("double")).as(s"${c}__min"),
        max(col(c).cast("double")).as(s"${c}__max"))
    }
    stack(df.agg(aggs.head, aggs.tail: _*), cols)
  }

  private def stack(wide: DataFrame, cols: Seq[String]): DataFrame = {
    val stacked = cols.map(c =>
      s"'$c', `${c}__n`, `${c}__nulls`, `${c}__distinct`, `${c}__min`, `${c}__max`")
      .mkString(", ")
    wide.selectExpr(
      s"stack(${cols.size}, $stacked) AS (col_name, n, n_nulls, n_distinct, min_d, max_d)")
  }
}
