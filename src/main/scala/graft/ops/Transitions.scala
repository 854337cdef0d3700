package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Markov transition counts over per-key event streams — batch build and
  * the streaming fold. The streaming state is the LAST event per key
  * (key-sized); each batch contributes its within-batch consecutive pairs
  * plus one boundary pair per key (state's last event → batch's first),
  * and counts are long-additive, so the fold equals the batch build for
  * any TIME-ORDERED chunking (LawsSpec law). The next-event-model data
  * prep, maintainable at ingest.
  */
object Transitions {

  /** (from_event, to_event, n) over per-key consecutive pairs. */
  def batchCounts(
      df: DataFrame, keyCol: String, tsCol: String, ordCol: String,
      attrCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(ordCol))
    df.select(col(keyCol), col(tsCol), col(ordCol), col(attrCol))
      .withColumn("__to", lead(col(attrCol), 1).over(w))
      .filter(col("__to").isNotNull)
      .groupBy(col(attrCol).as("from_event"), col("__to").as("to_event"))
      .agg(count(lit(1)).as("n"))
  }

  /** One streaming step. `state`: (key, attr) — the last-seen event per
    * key. Returns (pairDelta with (from_event, to_event, n), newState).
    * Batch must be entirely ≥ the state rows in event time.
    */
  def foldBatch(
      state: DataFrame, batch: DataFrame, keyCol: String, tsCol: String,
      ordCol: String, attrCol: String): (DataFrame, DataFrame) = {
    // r20: the batch's first/last event per key and its key set all come
    // from ONE aggregation — min/max over the (ts, ord, attr) struct picks
    // exactly the row_number endpoints, because (ts, ord) is a total order
    // per key. The previous form ran three window passes plus a distinct
    // over the ranked batch per trigger.
    val fl = batch
      .select(col(keyCol),
        struct(col(tsCol), col(ordCol), col(attrCol)).as("__s"))
      .groupBy(col(keyCol))
      .agg(min(col("__s")).as("__f"), max(col("__s")).as("__l"))
    val within = batchCounts(batch, keyCol, tsCol, ordCol, attrCol)
    val boundary = state
      .join(fl.select(col(keyCol), col(s"__f.$attrCol").as("__first")), Seq(keyCol))
      .groupBy(col("attr").as("from_event"), col("__first").as("to_event"))
      .agg(count(lit(1)).as("n"))
    val lasts = fl.select(col(keyCol), col(s"__l.$attrCol").as("attr"))
    val carried = state.join(fl.select(col(keyCol)), Seq(keyCol), "left_anti")
    (within.unionByName(boundary), carried.unionByName(lasts))
  }

  /** Collapse accumulated per-batch deltas into final counts. */
  def finish(deltas: DataFrame): DataFrame =
    deltas.groupBy(col("from_event"), col("to_event"))
      .agg(sum(col("n")).as("n"))
}
