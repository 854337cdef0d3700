package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton / z-order curve value: bit-interleave of N non-negative integer
  * columns, so that sorting by the single interleaved value clusters ALL
  * dimensions at once — parquet min/max statistics then prune range filters
  * on any of the columns (the multi-dimensional generalisation of
  * `TDF.SnapshotSorted`'s 1-D sort). Pure native bit arithmetic
  * (shift/and/or), fully codegen'd; exact integer math makes the value
  * trivially cross-engine-reproducible.
  */
object ZOrder {

  /** Interleave the low `bits` bits of each column: bit `b` of column `i`
    * lands at position `cols.size * b + i` (column 0 in the lowest lane, so
    * `zorderN(Seq(x, y), bits)` is exactly [[zorder2]]). Values must fit in
    * `bits` bits (verify with profiling / max stats before choosing);
    * higher bits are ignored by construction. `cols.size * bits` must stay
    * within the 63 value bits of a signed long.
    */
  def zorderN(cols: Seq[Column], bits: Int): Column = {
    val k = cols.size
    require(k >= 2, s"zorderN needs at least 2 columns, got $k")
    require(bits >= 1 && k * bits <= 63,
      s"$k cols x $bits bits = ${k * bits} exceeds the 63 value bits of a long")
    val longs = cols.map(_.cast("long"))
    (0 until bits).flatMap { b =>
      longs.zipWithIndex.map { case (c, i) =>
        shiftleft(shiftright(c, b).bitwiseAND(lit(1L)), k * b + i)
      }
    }.reduce(_.bitwiseOR(_))
  }

  /** the 2-D case (kept as the named common shape) */
  def zorder2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits <= 31, s"bits must be in [1, 31], got $bits")
    zorderN(Seq(x, y), bits)
  }
}
