package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** SCD Type-2 dimension history — batch build and the STREAMING fold.
  *
  * The batch form is gaps-and-islands: break on attribute change, running
  * sum numbers the versions, lead() closes each interval. The streaming
  * form maintains the same history across micro-batches holding only the
  * OPEN row per key as state: each batch's islands are stitched onto the
  * open rows (same attribute → the open interval extends; different →
  * it closes at the batch's first event time). Closed rows are immutable
  * once emitted — the append-only property that makes SCD2 a good fit
  * for incremental maintenance at scale.
  *
  * Correctness contract: batches must be TIME-ORDERED (no event in batch
  * k+1 precedes any batch-k event for the same key) — the condition any
  * event-time-partitioned CDC feed satisfies. Under it, the fold equals
  * the batch build EXACTLY for any chunking (LawsSpec replays random
  * chunkings to pin this).
  *
  * Scale shape: islands cost one key shuffle per batch (batch-sized);
  * stitching joins the key-sized open-state frame; closed history is
  * never rewritten, only appended.
  */
object Scd2 {

  /** Per-key islands of consecutive equal `attrCol` values:
    * (key, bver 1-based, segment, valid_from, n_rows). One key shuffle.
    */
  def islands(
      df: DataFrame, keyCol: String, tsCol: String, ordCol: String,
      attrCol: String): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(ordCol))
    df.select(col(keyCol), col(tsCol), col(ordCol), col(attrCol))
      .withColumn("__brk",
        when(lag(col(attrCol), 1).over(w).isNull ||
          lag(col(attrCol), 1).over(w) =!= col(attrCol), 1L).otherwise(0L))
      .withColumn("bver",
        sum(col("__brk")).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .groupBy(col(keyCol), col("bver"))
      .agg(min(col(attrCol)).as("segment"), min(col(tsCol)).as("valid_from"),
        count(lit(1)).as("n_rows"))
  }

  /** Batch SCD2 build: islands + lead() close + sentinel open row.
    * Sentinel must stay within datetime64[ns] range (max 2262-04-11):
    * arrow/pandas readers canonicalize timestamps at ns precision, and an
    * out-of-range open-row date (the classic 9999-12-31) round-trips
    * differently across readers even when the value is semantically equal.
    */
  def batch(
      df: DataFrame, keyCol: String, tsCol: String, ordCol: String,
      attrCol: String, sentinel: String = "2200-01-01 00:00:00"): DataFrame = {
    val segs = islands(df, keyCol, tsCol, ordCol, attrCol)
      .withColumnRenamed("bver", "version")
    val wv = Window.partitionBy(col(keyCol)).orderBy(col("version"))
    segs
      .withColumn("__next", lead(col("valid_from"), 1).over(wv))
      .select(col(keyCol), col("version"), col("segment"), col("valid_from"),
        coalesce(col("__next"), lit(sentinel).cast("timestamp")).as("valid_to"),
        col("n_rows"),
        when(col("__next").isNull, 1L).otherwise(0L).as("is_current"))
  }

  /** One streaming step: stitch a batch onto the open-row state.
    * `open`: (key, version, segment, valid_from, n_rows) — the current row
    * per key. Returns (closedDelta, newOpen); closedDelta rows carry
    * `valid_to` and are final. Batch must be entirely ≥ the open rows in
    * event time (see class doc).
    */
  def foldBatch(
      open: DataFrame, batch: DataFrame, keyCol: String, tsCol: String,
      ordCol: String, attrCol: String): (DataFrame, DataFrame) = {
    // r20: the batch islands feed the first-island probe AND the renumber
    // join, whose different pruning defeats exchange reuse — pin one
    // computation of the islands window per trigger (batch-islands-sized,
    // narrow; the lazy checkpoint's blocks are reclaimed by the context
    // cleaner once the trigger's frames are dereferenced)
    val bi = islands(batch, keyCol, tsCol, ordCol, attrCol)
      .localCheckpoint(false)
    val openInfo = open.select(col(keyCol), col("version").as("__over"),
      col("segment").as("__oseg"), col("valid_from").as("__ofrom"),
      col("n_rows").as("__on"))
    // user-level merge flag: batch's first island continues the open segment
    val firstSeg = bi.filter(col("bver") === 1)
      .select(col(keyCol), col("segment").as("__fseg"), col("valid_from").as("__ffrom"))
    val info = openInfo.join(firstSeg, Seq(keyCol), "inner")
      .withColumn("__merged", col("__oseg") === col("__fseg"))
    // open rows closed by a batch that STARTS a different segment
    val closedFromOpen = info.filter(!col("__merged"))
      .select(col(keyCol), col("__over").as("version"), col("__oseg").as("segment"),
        col("__ofrom").as("valid_from"), col("__ffrom").as("valid_to"),
        col("__on").as("n_rows"))
    // renumber batch islands after the open row; merge island 1 if continuing
    val adj = bi.join(info.select(col(keyCol), col("__over"), col("__ofrom"),
        col("__on"), col("__merged")), Seq(keyCol), "left")
      .withColumn("version",
        coalesce(col("__over"), lit(0L)) + col("bver") -
          when(coalesce(col("__merged"), lit(false)), 1L).otherwise(0L))
      .withColumn("n_rows",
        when(col("__merged") && col("bver") === 1, col("n_rows") + col("__on"))
          .otherwise(col("n_rows")))
      .withColumn("valid_from",
        when(col("__merged") && col("bver") === 1, col("__ofrom"))
          .otherwise(col("valid_from")))
      .select(col(keyCol), col("bver"), col("version"), col("segment"),
        col("valid_from"), col("n_rows"))
    val wv = Window.partitionBy(col(keyCol)).orderBy(col("bver"))
    // pinned for the same reason: the complementary isNotNull/isNull
    // filters below would each re-run the renumber join + lead window
    val withNext = adj.withColumn("__next", lead(col("valid_from"), 1).over(wv))
      .localCheckpoint(false)
    val closedFromBatch = withNext.filter(col("__next").isNotNull)
      .select(col(keyCol), col("version"), col("segment"), col("valid_from"),
        col("__next").as("valid_to"), col("n_rows"))
    val newOpenFromBatch = withNext.filter(col("__next").isNull)
      .select(col(keyCol), col("version"), col("segment"), col("valid_from"),
        col("n_rows"))
    // keys untouched by this batch keep their open row. Every batch key
    // has a bver=1 island, so firstSeg IS the batch key set — reusing it
    // saves the bi.select(key).distinct pass the old form ran per trigger.
    val carried = open.join(firstSeg.select(col(keyCol)), Seq(keyCol), "left_anti")
    (closedFromOpen.unionByName(closedFromBatch),
      carried.unionByName(newOpenFromBatch))
  }

  /** Final read of a fold: closed history + open rows with the sentinel. */
  def finish(
      closed: DataFrame, open: DataFrame, keyCol: String,
      sentinel: String = "2200-01-01 00:00:00"): DataFrame =
    closed.withColumn("is_current", lit(0L))
      .unionByName(open
        .withColumn("valid_to", lit(sentinel).cast("timestamp"))
        .withColumn("is_current", lit(1L)))
      .select(col(keyCol), col("version"), col("segment"), col("valid_from"),
        col("valid_to"), col("n_rows"), col("is_current"))
}
