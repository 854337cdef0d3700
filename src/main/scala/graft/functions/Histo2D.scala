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
}
