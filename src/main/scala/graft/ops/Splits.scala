package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic dataset splitting — the reproducible train/val/test
  * assignment a training pipeline requires: each row lands in exactly one
  * split by its key's md5 bucket, stable across runs, machines, partitionings
  * and engines (no RNG, no partition sensitivity; the same convention as the
  * hash-sampling query family). A pure scan-level expression: splitting
  * 100 TB adds zero shuffles, and downstream per-split reads filter on the
  * label column (pair with `SnapshotPartitioned(Seq("split"))` to prune whole
  * directories per split).
  */
object Splits {

  /** md5 bucket in [0, 100) of a key column — percentage points. */
  def bucket100(key: Column): Column =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % 100

  /** Assign each row a split label; `splits` are (name, percent) with
    * percents summing to 100, intervals taken in order.
    */
  def assign(
      df: DataFrame, keyCol: String, splits: Seq[(String, Int)],
      labelCol: String = "split"): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum == 100,
      s"split percents must sum to 100, got $splits")
    val b = bucket100(col(keyCol))
    val cuts = splits.scanLeft(0)(_ + _._2).tail
    val label = splits.zip(cuts).init.foldRight(lit(splits.last._1)) {
      case (((name, _), cut), rest) => when(b < cut, name).otherwise(rest)
    }
    df.withColumn(labelCol, label)
  }

  /** Sequence-packing offsets — the concat-then-chunk prep of LLM training
    * (documents are concatenated in a deterministic order and cut into
    * fixed-token-budget bins; a doc belongs to the bin where it STARTS).
    * Packing is per md5-hard SHARD, not global: a global concatenation
    * order would be one window partition = one task at any scale, while
    * shards pack independently and in parallel (each training worker later
    * reads its shard's bins). Emits `shard`, `start_off` (the document's
    * offset in its shard's concatenation, exclusive running sum of
    * `sizeCol`) and `bin` (= floor(start_off / budget)). One shuffle on the
    * shard key; deterministic — no RNG, stable across partitionings and
    * engines.
    */
  def packSequences(
      df: DataFrame, keyCol: String, sizeCol: String,
      budget: Long, nShards: Int): DataFrame = {
    require(budget > 0 && nShards > 0,
      s"budget and shard count must be positive, got $budget / $nShards")
    val shard = pmod(
      conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10).cast("long"),
      lit(nShards.toLong))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("shard")).orderBy(col(keyCol))
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    df.withColumn("shard", shard)
      .withColumn("start_off",
        coalesce(sum(col(sizeCol)).over(w), lit(0L)).cast("long"))
      .withColumn("bin", floor(col("start_off") / budget).cast("long"))
  }

  /** Deterministic fixed-size per-group sample — the balanced training-mix
    * op (k documents per source/language/domain regardless of group skew):
    * rows rank within their group by the md5 hash of their key (a
    * reproducible shuffle — no RNG, no partition sensitivity, the
    * [[bucket100]] convention) and the first `k` survive. One shuffle on
    * the group column at any scale; groups larger than memory stream
    * through Spark's sort-based window (`WindowGroupLimit` prunes to k per
    * group map-side before the exchange). Emits the input columns plus
    * `sample_rank` (1-based position in the group's hash order).
    */
  def sampleGroupK(
      df: DataFrame, groupCol: String, keyCol: String, k: Int): DataFrame = {
    require(k > 0, s"sample size must be positive, got $k")
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(groupCol))
      .orderBy(conv(substring(md5(col(keyCol).cast("string")), 1, 8), 16, 10)
        .cast("long").asc, col(keyCol).asc)
    df.withColumn("sample_rank", row_number().over(w))
      .filter(col("sample_rank") <= k)
  }
}
