package graft.functions

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** 2-D histogram as a distributed bucket aggregation (TH2F analog — the 2-D
  * variant the reference road-mapped alongside Histo). Unlike the 1-D action
  * (driver-sized result, custom aggregate), a 2-D grid can be large, so the
  * idiomatic-scale form is a `groupBy(bx, by).count()` DataFrame: fully
  * codegen'd, partial-aggregated map-side, and usable as input to further
  * queries. Bin convention matches the 1-D histogram: [lo + i*w, lo+(i+1)*w),
  * underflow = -1, overflow = nbins.
  */
object Histo2D {

  def bucket(c: Column, nbins: Int, lo: Double, hi: Double): Column = {
    val w = (hi - lo) / nbins
    when(c < lo, lit(-1))
      .when(c >= hi, lit(nbins))
      .otherwise(least(floor((c - lit(lo)) / lit(w)), lit(nbins - 1)).cast("int"))
  }

  def apply(
      df: DataFrame, x: Column, y: Column,
      nx: Int, lox: Double, hix: Double,
      ny: Int, loy: Double, hiy: Double): DataFrame =
    df.select(
      bucket(x.cast("double"), nx, lox, hix).as("bx"),
      bucket(y.cast("double"), ny, loy, hiy).as("by"))
      .groupBy(col("bx"), col("by"))
      .agg(count(lit(1)).as("n"))

  /** weighted variant — TH2 `Fill(x, y, w)` with real-valued weights, under
    * the same decimal-summed-bins discipline as [[WeightedHisto]]: weights
    * quantized to `wScale` decimals, cells sum exact scaled longs, one
    * division back to double per cell.
    */
  def weighted(
      df: DataFrame, x: Column, y: Column, w: Column,
      nx: Int, lox: Double, hix: Double,
      ny: Int, loy: Double, hiy: Double, wScale: Int): DataFrame = {
    require(wScale >= 0 && wScale <= 9, s"wScale must be in [0, 9], got $wScale")
    val unit = math.pow(10.0, wScale)
    df.select(
      bucket(x.cast("double"), nx, lox, hix).as("bx"),
      bucket(y.cast("double"), ny, loy, hiy).as("by"),
      round(w.cast("double") * unit).cast("long").as("__wu"))
      .groupBy(col("bx"), col("by"))
      .agg(
        (sum(col("__wu")).cast("double") / unit).as("w"),
        count(lit(1)).as("n_fills"))
  }
}

/** Profile histogram (TProfile analog — the per-x-bin mean/spread of a second
  * observable, the other member of ROOT's histogram family next to TH1/TH2;
  * the reference road-mapped the Histo family, TDataFrame.hxx:483-517).
  * Exactness discipline matches [[WeightedHisto]]: y is quantized to `yScale`
  * decimals, per-bin sums accumulate exact integers, and the mean/rms
  * doubles derive from those exact integers through one fixed expression
  * chain, so the result is order-independent across partitions and engines.
  *
  * The sum of squares is a TWO-LIMB BIGINT accumulation with a per-row
  * decimal escape hatch: rows with |yu| ≤ floor(√(2⁶³−1)) square as a plain
  * long multiply split into hi = yu² >> 31 and lo = yu² & (2³¹−1), each
  * summed as a long; rows beyond that bound (profile outliers — |y| past
  * ~3.04e9/unit) square in decimal(38,0) per row and sum separately, so NO
  * input range errors or wraps. The exact total hi·2³¹ + lo + big
  * reassembles in decimal(38,0) on the BIN-COUNT-sized result only. This
  * keeps the data-sized hot path pure codegen'd long arithmetic (the
  * previous version paid a decimal128 multiply+add per row) while the final
  * double is the same correctly-rounded conversion of the same exact
  * integer. Headroom: lo-sums wrap past 2^32 rows/bin and hi-sums past
  * ~2^30·(3e9/max|yu|)² rows/bin — both error loudly under ANSI, never
  * silently. Fully codegen'd, map-side partials, spillable — the 100 TB
  * shape. Bin convention matches the family: underflow = -1, overflow =
  * nbins.
  */
object ProfileHisto {

  /** floor(√(2⁶³−1)) — the largest |yu| whose square fits a long; rows
    * beyond it take the per-row decimal square branch
    */
  private val SQUARE_BOUND = 3037000499L

  def apply(
      df: DataFrame, x: Column, y: Column, nbins: Int, lo: Double, hi: Double,
      yScale: Int): DataFrame = {
    require(yScale >= 0 && yScale <= 9, s"yScale must be in [0, 9], got $yScale")
    val unit = math.pow(10.0, yScale)
    val yu = col("__yu")
    df.select(
      Histo2D.bucket(x.cast("double"), nbins, lo, hi).as("bin"),
      round(y.cast("double") * unit).cast("long").as("__yu"))
      .groupBy(col("bin"))
      .agg(
        count(lit(1)).as("n_fills"),
        sum(yu).as("__sy"),
        // two-limb long accumulation of Σ yu² (see scaladoc) for the rows
        // whose square fits a long (|yu| ≤ floor(√(2⁶³−1))): yu² ≥ 0, so the
        // arithmetic shift and mask split it exactly. CaseWhen evaluates
        // only the taken branch, so the guarded multiply cannot ANSI-throw.
        sum(when(abs(yu) <= SQUARE_BOUND, shiftright(yu * yu, 31))
          .otherwise(lit(0L))).as("__syy_hi"),
        sum(when(abs(yu) <= SQUARE_BOUND, (yu * yu).bitwiseAND(lit((1L << 31) - 1)))
          .otherwise(lit(0L))).as("__syy_lo"),
        // out-of-bound rows (|y| beyond ~3.04e9/unit — profile outliers)
        // square in decimal(38,0) per row; typical data never takes this
        // branch, so the hot path stays pure long arithmetic
        sum(when(abs(yu) > SQUARE_BOUND,
            yu.cast("decimal(19,0)") * yu.cast("decimal(19,0)"))
          .otherwise(lit(0L).cast("decimal(38,0)"))).as("__syy_big"))
      // exact reassembly on the bin-count-sized frame only; decimal →
      // double is the same correctly-rounded conversion as before
      .withColumn("__syy",
        (col("__syy_hi").cast("decimal(38,0)") * lit(1L << 31)
          + col("__syy_lo") + col("__syy_big")).cast("double"))
      .select(
        col("bin"), col("n_fills"),
        (col("__sy").cast("double") / col("n_fills").cast("double") / unit)
          .as("y_mean"),
        sqrt(greatest(
          col("__syy") / col("n_fills").cast("double") / unit / unit -
            (col("__sy").cast("double") / col("n_fills").cast("double") / unit) *
            (col("__sy").cast("double") / col("n_fills").cast("double") / unit),
          lit(0.0))).as("y_rms"))
  }
}

/** 1-D histogram with REAL-VALUED weights (TH1 `Fill(x, w)` with double w —
  * the weighted-fill semantics the reference's Histo action family exposes
  * through TH1, reference TDataFrame.hxx:483-517 per-slot fill/merge),
  * decimal-summed for exactness: each weight is quantized to `wScale` decimal
  * places and bins accumulate exact scaled longs — order-independent across
  * partitions and engines, unlike naive double summation whose result depends
  * on merge order. One division back to double at the end. The integer-weight
  * twin rides the native fused aggregate ([[HistogramAggExpr.histoWeighted]]);
  * this declarative form (same shape as [[Histo2D]]) trades single-pass
  * fusion for exact double-weight semantics, map-side partial aggregation,
  * and full spillability. Bin convention identical to the 1-D action:
  * underflow = -1, overflow = nbins.
  */
object WeightedHisto {

  def apply(
      df: DataFrame, x: Column, w: Column, nbins: Int, lo: Double, hi: Double,
      wScale: Int): DataFrame = {
    require(wScale >= 0 && wScale <= 9, s"wScale must be in [0, 9], got $wScale")
    val unit = math.pow(10.0, wScale)
    df.select(
      Histo2D.bucket(x.cast("double"), nbins, lo, hi).as("bin"),
      round(w.cast("double") * unit).cast("long").as("__wu"))
      .groupBy(col("bin"))
      .agg(
        (sum(col("__wu")).cast("double") / unit).as("w"),
        count(lit(1)).as("n_fills"))
  }
}
