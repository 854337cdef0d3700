package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Point-in-time feature engineering — the feature-store primitive shared
  * by the batch gate (q_asof_features) and its streaming serving twin:
  * rolling last-k aggregates are computed ON THE HISTORY side with a
  * key-partitioned window (cumulative sum minus the k-lagged cumulative —
  * never a per-prediction-point range product), collapsed to one row per
  * (key, ts) instant so an as-of attachment is deterministic under
  * timestamp ties. Prediction points then attach the latest feature row
  * STRICTLY below their timestamp via the custom as-of operator — no label
  * leakage by construction, O(1) merge state per task.
  */
object Features {

  /** Rolling last-k features over a purchase-shaped history frame with
    * columns (p_user, p_ts, p_eid, cents): returns one row per (p_user,
    * p_ts) instant carrying (n{k}, cents{k}) — the count and cents sum of
    * the last k history rows through that instant (latest event of an
    * instant wins, so its cumulative covers the whole instant). One key
    * shuffle; output is history-sized.
    */
  def lastK(history: DataFrame, k: Int): DataFrame = {
    require(k >= 1, s"k must be >= 1, got $k")
    val wp = Window.partitionBy(col("p_user")).orderBy(col("p_ts"), col("p_eid"))
    history
      .withColumn("ccum", sum(col("cents"))
        .over(wp.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("pidx", row_number().over(wp))
      .withColumn(s"cents$k",
        col("ccum") - coalesce(lag(col("ccum"), k).over(wp), lit(0L)))
      .withColumn(s"n$k", least(col("pidx"), lit(k)).cast("long"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("p_user"), col("p_ts"))
          .orderBy(col("p_eid").desc)))
      .filter(col("rn") === 1)
      .select(col("p_user"), col("p_ts"), col(s"n$k"), col(s"cents$k"))
  }

  /** Attach a last-k feature frame (the output shape of [[lastK]] for the
    * same k) to click-shaped prediction points (click_id, c_user, c_ts) via
    * the backward-strict custom as-of join; the serving tail shared by
    * batch and streaming. Output columns are labeled n$k/cents$k/
    * mean_cents$k to match the feature frame's actual window length.
    */
  def attachLastK(points: DataFrame, feat: DataFrame, k: Int): DataFrame =
    graft.plans.AsOfJoin.join(points, feat, "c_user", "p_user", "c_ts", "p_ts")
      .select(col("click_id").as("event_id"), col("c_user").as("user_id"),
        col("c_ts").as("ts"), col("p_ts").as("last_purchase_ts"),
        col(s"n$k"), col(s"cents$k"),
        round(col(s"cents$k").cast("double") / col(s"n$k"), 6).as(s"mean_cents$k"))

  def attachLast3(points: DataFrame, feat: DataFrame): DataFrame =
    attachLastK(points, feat, 3)

  /** Per-instant cumulative series over a purchase-shaped history frame
    * (p_user, p_ts, p_eid, cents): (p_user, p_ts, ccum, pidx), one row per
    * (user, ts) instant (latest event's cumulative covers the instant) —
    * the persistable artifact the TIME-window attach serves from.
    */
  def cumulative(history: DataFrame): DataFrame = {
    val wp = Window.partitionBy(col("p_user")).orderBy(col("p_ts"), col("p_eid"))
    history
      .withColumn("ccum", sum(col("cents"))
        .over(wp.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .withColumn("pidx", row_number().over(wp).cast("long"))
      .withColumn("rn", row_number().over(
        Window.partitionBy(col("p_user"), col("p_ts"))
          .orderBy(col("p_eid").desc)))
      .filter(col("rn") === 1)
      .select(col("p_user"), col("p_ts"), col("ccum"), col("pidx"))
  }

  /** TIME-window feature attach: for points (click_id, c_user, c_ts,
    * c_ts_lo = t − window), the count/sum/mean of history rows in
    * [t−window, t) as a DIFFERENCE OF TWO AS-OF LOOKUPS against the
    * [[cumulative]] series — two O(1) sort-merge as-ofs instead of a range
    * join with unbounded per-point candidates. Points with nothing in the
    * window drop (inner range semantics). `label` names the output columns
    * (n$label/cents$label/mean$label) after the caller's actual window
    * length — the window itself is whatever c_ts_lo encodes.
    */
  def attachWindow(points: DataFrame, cum: DataFrame, label: String = "7"): DataFrame = {
    val hi = graft.plans.AsOfJoin.join(points, cum,
        "c_user", "p_user", "c_ts", "p_ts")
      .select(col("click_id"), col("c_user"), col("c_ts"),
        col("ccum").as("ccum_hi"), col("pidx").as("pidx_hi"))
    val lo = graft.plans.AsOfJoin.join(
        points.select(col("click_id"), col("c_user").as("l_user"), col("c_ts_lo")),
        cum.select(col("p_user").as("q_user"), col("p_ts").as("q_ts"),
          col("ccum").as("ccum_lo"), col("pidx").as("pidx_lo")),
        "l_user", "q_user", "c_ts_lo", "q_ts")
      .select(col("click_id"), col("ccum_lo"), col("pidx_lo"))
    hi.join(lo, Seq("click_id"), "left")
      .withColumn(s"n$label", col("pidx_hi") - coalesce(col("pidx_lo"), lit(0L)))
      .withColumn(s"cents$label", col("ccum_hi") - coalesce(col("ccum_lo"), lit(0L)))
      .filter(col(s"n$label") > 0)
      .select(col("click_id").as("event_id"), col("c_user").as("user_id"),
        col("c_ts").as("ts"), col(s"n$label"), col(s"cents$label"),
        round(col(s"cents$label").cast("double") / col(s"n$label"), 6).as(s"mean$label"))
  }
}
