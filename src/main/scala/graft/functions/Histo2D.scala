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
  * decimals, per-bin sums accumulate exact integers (squares computed AND
  * summed in decimal(38,0) — a long product wraps at |y|·10^yScale ≥ ~3.04e9
  * and long sums of squares overflow at real row counts), and the mean/rms
  * doubles derive from those exact integers through
  * one fixed expression chain, so the result is order-independent across
  * partitions and engines. Fully codegen'd, map-side partials, spillable —
  * the 100 TB shape. Bin convention matches the family: underflow = -1,
  * overflow = nbins.
  */
object ProfileHisto {

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
        // square in decimal, not long: yu*yu over longs silently wraps once
        // |y|*10^yScale exceeds ~3.04e9 (sqrt(Long.Max)); decimal(19,0)
        // operands make the per-row product exact up to the full long range
        sum((yu.cast("decimal(19,0)") * yu.cast("decimal(19,0)"))
          .cast("decimal(38,0)")).cast("double").as("__syy"))
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
