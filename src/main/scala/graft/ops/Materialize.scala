package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Incremental materialized-view maintenance: keep a grouped COUNT/SUM
  * aggregate in sync with its base table by folding in a keyed CDC batch
  * (the [[graft.streaming.Streams.diffFrames]] output) instead of
  * recomputing over history — the view-maintenance half of the snapshot
  * CDC machinery (diff = read side, upsert = write side, this = derived
  * state).
  *
  * Scale shape: the delta pass shuffles ONLY `|cdc| + |mv|` rows on the
  * grouping dims — never the base table. Counts and long-sum measures are
  * additive and sign-invertible, so the maintained view equals a full
  * rebuild exactly (law-tested in OpsSpec, oracle-gated by
  * q_mv_incremental); folding a CDC batch in key-disjoint slices is
  * associative, so maintenance is batching-invariant.
  */
object Materialize {

  /** Build the materialized aggregate: `dims → (n, sum(measure)…)`.
    * Measures must be integral (long) columns — exact additive arithmetic
    * is what makes increment == rebuild an identity, not an approximation.
    */
  def buildAggMv(base: DataFrame, dims: Seq[String], measures: Seq[String]): DataFrame = {
    require(dims.nonEmpty, "buildAggMv needs at least one grouping column")
    val aggs = sum(lit(1L)).as("n") +: measures.map(m => sum(col(m)).as(m))
    base.groupBy(dims.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Apply a keyed CDC batch to a [[buildAggMv]] view. `cdc` is diffFrames
    * output whose VALUE columns include every dim and measure (as
    * `old_X`/`new_X` pairs) — an update may move a row between groups
    * (old dims get the -1, new dims the +1). Groups whose count reaches 0
    * are dropped, so the result is exactly `buildAggMv(newBase)`.
    */
  def applyAggDelta(
      mv: DataFrame, cdc: DataFrame,
      dims: Seq[String], measures: Seq[String]): DataFrame = {
    val neg = cdc.filter(col("change_type").isin("delete", "update"))
      .select(dims.map(d => col(s"old_$d").as(d)) ++
        (lit(-1L).as("n") +: measures.map(m => (-col(s"old_$m")).as(m))): _*)
    val pos = cdc.filter(col("change_type").isin("insert", "update"))
      .select(dims.map(d => col(s"new_$d").as(d)) ++
        (lit(1L).as("n") +: measures.map(m => col(s"new_$m").as(m))): _*)
    val aggs = sum(col("n")).as("n") +: measures.map(m => sum(col(m)).as(m))
    mv.unionByName(neg).unionByName(pos)
      .groupBy(dims.map(col): _*)
      .agg(aggs.head, aggs.tail: _*)
      .filter(col("n") > 0)
  }
}
