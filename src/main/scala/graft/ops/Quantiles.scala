package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Equi-width histogram "sketch" percentile machinery shared by the batch
  * and streaming quantile gates (q_sketch_quantile / q_stream_quantile):
  * mergeable bucket counts answer any percentile within one bucket width,
  * and the exact rank value is recovered by BUCKET BRACKETING — the
  * histogram isolates the target rank into one bucket, rows before that
  * bucket are known from the cumulative counts, so only the bracketing
  * bucket's ~cnt/buckets rows are ranked (window partitioned per
  * percentile; never an unpartitioned whole-table sort). Lower buckets
  * hold strictly smaller values, so within-bucket (value, tiebreak) order
  * is the global order restricted to the bucket — the bracketed rank is
  * bit-identical to a global row_number (pinned by the LawsSpec property
  * against the naive global rank on arbitrary tie-heavy data).
  *
  * All arithmetic is integer (scaled cents + `div`), so the APPROXIMATE
  * estimate has an exact cross-engine oracle.
  */
object Quantiles {

  /** Bounds of a cents frame (column `c`): (lo, hi, cnt, width) for `b`
    * equi-width buckets covering [lo, hi].
    */
  def bounds(cents: DataFrame, b: Int): DataFrame = {
    require(b >= 1, s"bucket count must be >= 1, got $b")
    cents.agg(min(col("c")).as("lo"), max(col("c")).as("hi"),
        count(lit(1)).as("cnt"))
      .withColumn("width",
        ceil((col("hi") - col("lo") + 1).cast("double") / b).cast("long"))
  }

  /** Global bucket counts: one broadcast of the 1-row bounds, one
    * scan-level bucket assignment, one map-side-combined aggregate.
    */
  def histogram(cents: DataFrame, boundsDf: DataFrame): DataFrame =
    cents.crossJoin(broadcast(boundsDf))
      .withColumn("bucket", expr("(c - lo) div width"))
      .groupBy(col("bucket")).agg(count(lit(1)).as("n"))

  /** Percentile estimates from the histogram plus the bucket-bracketed
    * exact rank value per percentile. `cents` carries value column `c`
    * and `tieCols` completing a total order; `hist` is (bucket, n) —
    * from [[histogram]] or any count-additive merge of shard/stream
    * histograms built over the SAME frozen bounds. Frames after the
    * histogram are bucket- or percentile-sized except the single
    * bracketing-bucket rank.
    */
  def estimateWithExact(
      cents: DataFrame, tieCols: Seq[String], boundsDf: DataFrame,
      hist: DataFrame, ps: Seq[Double]): DataFrame = {
    val cum = hist.withColumn("cum", sum(col("n")).over(
      Window.orderBy(col("bucket"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val psDf = boundsDf.select(
        explode(array(ps.map(lit): _*)).as("p"),
        col("lo"), col("width"), col("cnt"))
      .withColumn("rank_target", ceil(col("p") * col("cnt")).cast("long"))
    val est = psDf.join(cum, col("cum") >= col("rank_target"))
      .groupBy(col("p"), col("rank_target"), col("lo"), col("width"))
      .agg(min(col("bucket")).as("bucket"))
      .withColumn("est_cents",
        col("lo") + col("bucket") * col("width") + expr("(width - 1) div 2"))
    val brk = est.join(cum.select(col("bucket"),
        (col("cum") - col("n")).as("cum_before")), Seq("bucket"))
    val inBucket = cents.join(broadcast(brk),
      col("c") >= col("lo") + col("bucket") * col("width") &&
        col("c") < col("lo") + (col("bucket") + lit(1L)) * col("width"))
    inBucket.withColumn("rn", row_number().over(
        Window.partitionBy(col("p"))
          .orderBy((col("c") +: tieCols.map(col)): _*)))
      .filter(col("rn") === col("rank_target") - col("cum_before"))
      .select(col("p"), col("rank_target"), col("bucket"), col("est_cents"),
        col("c").as("exact_cents"),
        abs(col("est_cents") - col("c")).as("abs_err"),
        col("width").as("bucket_width"),
        when(abs(col("est_cents") - col("c")) <= col("width"), 1L)
          .otherwise(0L).as("within_bound"))
  }
}
