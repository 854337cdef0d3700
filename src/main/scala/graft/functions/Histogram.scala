package graft.functions

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** A filled 1-D histogram: the result type of the reference's `Histo` action
  * (reference: TDataFrame.hxx:897-934 books a TH1F fill; per-slot partials are
  * merged at end of loop, TDataFrame.hxx:483-517). Bin i (0-based) covers
  * [lo + i*w, lo + (i+1)*w) with w = (hi-lo)/nbins; values below lo go to
  * `underflow`, values >= hi to `overflow` — same edge convention as TH1F.
  */
final case class Histogram(
    nbins: Int,
    lo: Double,
    hi: Double,
    counts: Array[Long],
    underflow: Long,
    overflow: Long,
    entries: Long,
    sumx: Double,
    sumx2: Double) {
  def binWidth: Double = (hi - lo) / nbins
  def mean: Double = if (entries == 0) 0.0 else sumx / entries
  def stddev: Double = {
    if (entries == 0) 0.0
    else math.sqrt(math.max(0.0, sumx2 / entries - mean * mean))
  }
  /** (binIndex, lowEdge, count) rows for all non-empty info, driver-side. */
  def bins: Seq[(Int, Double, Long)] =
    counts.toIndexedSeq.zipWithIndex.map { case (c, i) => (i, lo + i * binWidth, c) }

  /** Pearson χ² comparison of two same-axis histograms (the HEP shape-test
    * workhorse): χ² = Σ (a_i - b_i)² / (a_i + b_i) over bins where either
    * count is non-zero. Returns (chi2, ndf).
    */
  def chi2Test(other: Histogram): (Double, Int) = {
    require(nbins == other.nbins && lo == other.lo && hi == other.hi,
      "chi2Test: histograms must share the axis")
    var chi2 = 0.0
    var ndf = 0
    var i = 0
    while (i < nbins) {
      val a = counts(i).toDouble
      val b = other.counts(i).toDouble
      if (a + b > 0) { chi2 += (a - b) * (a - b) / (a + b); ndf += 1 }
      i += 1
    }
    (chi2, math.max(ndf - 1, 0))
  }
}

object Histogram {
  /** Empty model histogram — the analog of constructing a `TH1F` to pass to
    * the reference's model overload `Histo(branch, model)`
    * (TDataFrame.hxx:897-904): only the axis is read from it.
    */
  def model(nbins: Int, lo: Double, hi: Double): Histogram =
    Histogram(nbins, lo, hi, Array.fill(nbins)(0L), 0L, 0L, 0L, 0.0, 0.0)
}

/** Mutable per-partition buffer — the Spark analog of the reference's per-slot
  * TH1F clone (TDataFrame.hxx:483-517): update = Fill, merge = Add.
  */
final case class HistBuffer(
    counts: Array[Long],
    var underflow: Long,
    var overflow: Long,
    var entries: Long,
    var sumx: Double,
    var sumx2: Double)

/** Single-pass fixed-range histogram as a typed `Aggregator` (partial/final
  * merge maps 1:1 onto the reference's per-slot fill + end-of-loop merge).
  * Input is `Seq[Double]` so that array columns fill elementwise (the
  * reference's container overloads, TDataFrame.hxx:451-459); scalar columns
  * are wrapped with `array(col)` by the caller.
  */
final class HistogramAggregator(nbins: Int, lo: Double, hi: Double)
    extends Aggregator[Seq[Double], HistBuffer, Histogram] {
  private val w = (hi - lo) / nbins

  override def zero: HistBuffer =
    HistBuffer(Array.fill[Long](nbins)(0L), 0L, 0L, 0L, 0.0, 0.0)

  override def reduce(b: HistBuffer, in: Seq[Double]): HistBuffer = {
    if (in != null) {
      var i = 0
      val n = in.length
      while (i < n) {
        val x = in(i)
        if (x < lo) b.underflow += 1
        else if (x >= hi) b.overflow += 1
        else {
          // identical formula to the SQL oracle: floor((x-lo)/w)
          val bin = math.floor((x - lo) / w).toInt
          b.counts(math.min(bin, nbins - 1)) += 1
        }
        b.entries += 1
        b.sumx += x
        b.sumx2 += x * x
        i += 1
      }
    }
    b
  }

  override def merge(a: HistBuffer, b: HistBuffer): HistBuffer = {
    var i = 0
    while (i < nbins) { a.counts(i) += b.counts(i); i += 1 }
    a.underflow += b.underflow
    a.overflow += b.overflow
    a.entries += b.entries
    a.sumx += b.sumx
    a.sumx2 += b.sumx2
    a
  }

  override def finish(b: HistBuffer): Histogram =
    Histogram(nbins, lo, hi, b.counts, b.underflow, b.overflow, b.entries, b.sumx, b.sumx2)

  override def bufferEncoder: Encoder[HistBuffer] = Encoders.product[HistBuffer]
  override def outputEncoder: Encoder[Histogram] = Encoders.product[Histogram]
}

object HistogramAggregator {
  /** Column-level entry: `histo(when(pred, array(x)), 100, 0, 50)`. */
  def histo(in: Column, nbins: Int, lo: Double, hi: Double): Column =
    udaf(new HistogramAggregator(nbins, lo, hi)).apply(in)
}
