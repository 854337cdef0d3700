package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Morton / z-order curve value: bit-interleave of two non-negative integer
  * columns, so that sorting by the single interleaved value clusters BOTH
  * dimensions at once — parquet min/max statistics then prune range filters
  * on either column (the multi-dimensional generalisation of
  * `TDF.SnapshotSorted`'s 1-D sort). Pure native bit arithmetic
  * (shift/and/or), fully codegen'd; exact integer math makes the value
  * trivially cross-engine-reproducible.
  */
object ZOrder {

  /** Interleave the low `bits` bits of x (even positions) and y (odd
    * positions). Values must fit in `bits` bits (verify with profiling /
    * max stats before choosing); higher bits are ignored by construction.
    */
  def zorder2(x: Column, y: Column, bits: Int = 16): Column = {
    require(bits >= 1 && bits <= 31, s"bits must be in [1, 31], got $bits")
    val xl = x.cast("long")
    val yl = y.cast("long")
    (0 until bits).map { b =>
      shiftleft(shiftright(xl, b).bitwiseAND(lit(1L)), 2 * b)
        .bitwiseOR(shiftleft(shiftright(yl, b).bitwiseAND(lit(1L)), 2 * b + 1))
    }.reduce(_.bitwiseOR(_))
  }
}
