package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Exact wide-integer product assembly with a BIGINT fast path.
  *
  * The covariance/correlation family assembles `n·sxy − sx·sy`-shaped
  * numerators from exact long moment sums. The products overflow BIGINT
  * well before the sums do (1e6-scaled components: ~2e3 vectors already
  * reach ~4e18 of the 9.2e18 long range), but decimal(38,0) arithmetic is
  * several× a long multiply per op — at production dims (≥768 ⇒ ~3e5
  * matrix entries) the all-decimal assembly is measurable. So: a RUNTIME
  * bounds check picks the BIGINT path whenever the actual operands prove
  * no wrap is possible, and falls back to decimal(38,0) otherwise. Both
  * branches produce the SAME correctly-rounded double (each is an exact
  * integer converted once), so results are bit-identical whichever path a
  * row takes — the DuckDB HUGEINT oracles stay green unchanged.
  *
  * Loudness: Spark 4 runs ANSI mode by default, so even a guard bug could
  * only ever throw ARITHMETIC_OVERFLOW — never wrap silently.
  */
object ExactProducts {

  // |a·b| ≤ 2^62−1 for both products ⇒ |a·b − c·d| ≤ 2^63−2 fits a long
  private val LIM = (1L << 62) - 1

  /** Conservative proof that `a * b` cannot overflow: |a| ≤ LIM / max(|b|,1)
    * (floor division makes the check sound: a ≤ ⌊L/b⌋ ⇒ a·b ≤ L).
    */
  private def safeProd(a: Column, b: Column): Column =
    abs(a) <= lit(LIM) / greatest(abs(b), lit(1L))

  /** `(a·b − c·d)` over exact longs, as the correctly-rounded double of the
    * exact integer result — BIGINT when the operands prove it safe,
    * decimal(38,0) otherwise. CaseWhen branches evaluate lazily per row, so
    * the decimal cost is paid only by rows that need it.
    */
  def prodDiffDouble(a: Column, b: Column, c: Column, d: Column): Column = {
    def dec(x: Column) = x.cast("decimal(38,0)")
    when(safeProd(a, b) && safeProd(c, d),
      (a * b - c * d).cast("double"))
      .otherwise((dec(a) * dec(b) - dec(c) * dec(d)).cast("double"))
  }
}
