package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, TernaryExpression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{GraftSql => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Codegen'd dot product over two `array<double>` columns — the hot kernel of
  * similarity search. Replaces `aggregate(zip_with(a, b, *), 0d, +)`: the
  * higher-order-function pair allocates a lambda frame and an intermediate
  * array per row, while this compiles to a tight primitive loop inside
  * whole-stage codegen. Fold order is left-to-right, identical to the HOF
  * version and the SQL oracle, so results stay bit-for-bit equal.
  */
case class DotProduct(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = DoubleType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0.0
    var i = 0
    while (i < n) { acc += a.getDouble(i) * b.getDouble(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        double $acc = 0.0;
        for (int $i = 0; $i < $n; $i++) {
          $acc += $a.getDouble($i) * $b.getDouble($i);
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProduct =
    copy(left = l, right = r)
  override def prettyName: String = "graft_dot"
}

/** Codegen'd integer dot product over two `array<int>` quantization-code
  * columns — the search kernel of the int8 (quantized-domain) ANN path.
  * Codes are bounded by ±127 ([[graft.ops.Similarity.quantizeInt8]]), so a
  * 64-bit accumulator is exact for any realistic dim (overflow needs
  * 2^63/127² ≈ 5.7·10^14 elements); integer results make the SQL oracle
  * bit-for-bit trivial. For COSINE over codes the two per-vector scales
  * cancel (cos = (s_a·qa)·(s_b·qb)/(|s_a·qa||s_b·qb|) = qa·qb/(|qa||qb|)),
  * so quantized search never needs to rescale at all.
  */
case class DotProductInt(left: Expression, right: Expression) extends BinaryExpression {
  override def dataType: DataType = LongType

  override def nullSafeEval(l: Any, r: Any): Any = {
    val a = l.asInstanceOf[ArrayData]
    val b = r.asInstanceOf[ArrayData]
    val n = math.min(a.numElements(), b.numElements())
    var acc = 0L
    var i = 0
    while (i < n) { acc += a.getInt(i).toLong * b.getInt(i); i += 1 }
    acc
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) => {
      val i = ctx.freshName("i")
      val n = ctx.freshName("n")
      val acc = ctx.freshName("acc")
      s"""
        int $n = java.lang.Math.min($a.numElements(), $b.numElements());
        long $acc = 0L;
        for (int $i = 0; $i < $n; $i++) {
          $acc += (long) $a.getInt($i) * $b.getInt($i);
        }
        ${ev.value} = $acc;
      """
    })

  override protected def withNewChildrenInternal(l: Expression, r: Expression): DotProductInt =
    copy(left = l, right = r)
  override def prettyName: String = "graft_dot_int8"
}

/** Scalar-quantization kernels. The HOF construction they replace —
  * `transform(v, x => round(x * maxCode / array_max(transform(v, abs))))` —
  * carried its per-vector scale INSIDE the per-element lambda: lambda trees
  * get no common-subexpression elimination, so the O(d) max (plus a fresh
  * d-element array allocation) re-evaluated once per ELEMENT — O(d²) work
  * and d allocations per row, multiplied again by every consumer of the
  * codes column (q_sum / digest / max_err referenced it three times). That
  * held q_embed_quantize at a flat ~3.6 s from r15 through r18a and taxed
  * every int8/int16 index build. Same trap class as WinnowExprs, in its
  * projection form; same cure: one tight pass per row, immune by
  * construction wherever the tree lands.
  *
  * Bit parity with the HOF forms (pinned by the kernel-vs-HOF laws in
  * LawsSpec, interpreted AND whole-stage-codegen, and the md5-digest
  * oracles): rounding is Spark's `round(double)` — BigDecimal.valueOf
  * HALF_UP — and the zero-scale / empty / null-element edges reproduce the
  * `when(mx === 0, zeros)` construction exactly. NaN: the MAX kernels
  * order NaN greatest like `array_max` (law-pinned); CODES on a
  * NaN-bearing vector follow the non-ANSI `cast(NaN as int) = 0`
  * semantics — under ANSI the HOF model itself throws on that cast, so
  * codes parity is defined on NaN-free vectors only.
  */
object QuantKernels {
  /** max |x| over non-null elements, boxed; null when no non-null element.
    * NaN orders GREATEST, matching Spark's `array_max` (r18 ADVICE: the
    * plain `a > m` comparison silently dropped a NaN unless it was the
    * first element, so a NaN-bearing vector quantized differently than the
    * HOF model) — `Double.compare` gives exactly array_max's total order.
    */
  def absMaxBoxed(v: ArrayData): java.lang.Double = {
    val n = v.numElements()
    var m = 0.0
    var found = false
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i)) {
        val a = math.abs(v.getDouble(i))
        if (!found || java.lang.Double.compare(a, m) > 0) { m = a; found = true }
      }
      i += 1
    }
    if (found) java.lang.Double.valueOf(m) else null
  }

  /** Spark `cast(round(x) as int)` semantics: BigDecimal HALF_UP, NaN → 0 */
  private def roundHalfUpToInt(x: Double): Int =
    if (java.lang.Double.isNaN(x)) 0
    else if (java.lang.Double.isInfinite(x))
      (if (x > 0) Int.MaxValue else Int.MinValue)
    else java.math.BigDecimal.valueOf(x)
      .setScale(0, java.math.RoundingMode.HALF_UP).intValue()

  /** symmetric scalar codes: round(x·maxCode/max|x|); zero scale → all
    * zeros (nulls included — the HOF's `transform(v, _ => 0)` branch);
    * all-null input → all-null codes; null element → null code
    */
  def scalarCodes(v: ArrayData, maxCode: Int): ArrayData = {
    val n = v.numElements()
    val out = new Array[Any](n)
    val mxv = absMaxBoxed(v)
    if (mxv == null) return new GenericArrayData(out)
    val mx = mxv.doubleValue()
    var i = 0
    if (mx == 0.0) {
      while (i < n) { out(i) = 0; i += 1 }
    } else {
      val mc = maxCode.toDouble
      while (i < n) {
        if (!v.isNullAt(i)) out(i) = roundHalfUpToInt(v.getDouble(i) * mc / mx)
        i += 1
      }
    }
    new GenericArrayData(out)
  }

  /** max_i |x_i − q_i·mx/maxCode| over positions where both sides are
    * non-null, boxed; null when no such position (zip_with + array_max
    * null semantics — including array_max's NaN-greatest order, via
    * `Double.compare` like [[absMaxBoxed]])
    */
  def dequantMaxErrBoxed(
      v: ArrayData, q: ArrayData, mx: Double, maxCode: Int): java.lang.Double = {
    val n = math.min(v.numElements(), q.numElements())
    val mc = maxCode.toDouble
    var m = 0.0
    var found = false
    var i = 0
    while (i < n) {
      if (!v.isNullAt(i) && !q.isNullAt(i)) {
        val e = math.abs(v.getDouble(i) - q.getInt(i).toDouble * mx / mc)
        if (!found || java.lang.Double.compare(e, m) > 0) { m = e; found = true }
      }
      i += 1
    }
    if (found) java.lang.Double.valueOf(m) else null
  }
}

/** `array<double> → double`: max |x|, null on empty/all-null input */
case class AbsMax(child: Expression) extends UnaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override def nullSafeEval(v: Any): Any =
    QuantKernels.absMaxBoxed(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val o = ctx.freshName("absmax")
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!${c.isNull}) {
        java.lang.Double $o = graft.functions.QuantKernels.absMaxBoxed(
          (org.apache.spark.sql.catalyst.util.ArrayData) ${c.value});
        if ($o != null) { ${ev.isNull} = false; ${ev.value} = $o.doubleValue(); }
      }
      """)
  }

  override protected def withNewChildInternal(newChild: Expression): AbsMax =
    copy(child = newChild)
  override def prettyName: String = "graft_abs_max"
}

/** `array<double> → array<int>`: symmetric scalar quantization codes */
case class ScalarCodes(child: Expression, maxCode: Int) extends UnaryExpression {
  require(maxCode >= 1, s"maxCode >= 1, got $maxCode")
  override def dataType: DataType = ArrayType(IntegerType, containsNull = true)

  override def nullSafeEval(v: Any): Any =
    QuantKernels.scalarCodes(v.asInstanceOf[ArrayData], maxCode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c => s"""
      ${ev.value} = graft.functions.QuantKernels.scalarCodes(
        (org.apache.spark.sql.catalyst.util.ArrayData) $c, $maxCode);
      """)

  override protected def withNewChildInternal(newChild: Expression): ScalarCodes =
    copy(child = newChild)
  override def prettyName: String = "graft_scalar_codes"
}

/** `(array<double>, array<int>, double) → double`: dequantization max
  * error at the given scale numerator (maxCode is the denominator)
  */
case class DequantMaxErr(
    first: Expression, second: Expression, third: Expression, maxCode: Int)
  extends TernaryExpression {
  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true

  override protected def nullSafeEval(v: Any, q: Any, mx: Any): Any =
    QuantKernels.dequantMaxErrBoxed(
      v.asInstanceOf[ArrayData], q.asInstanceOf[ArrayData],
      mx.asInstanceOf[Double], maxCode)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val a = first.genCode(ctx)
    val b = second.genCode(ctx)
    val m = third.genCode(ctx)
    val o = ctx.freshName("dqerr")
    ev.copy(code = code"""
      ${a.code}
      ${b.code}
      ${m.code}
      boolean ${ev.isNull} = true;
      double ${ev.value} = 0.0;
      if (!${a.isNull} && !${b.isNull} && !${m.isNull}) {
        java.lang.Double $o = graft.functions.QuantKernels.dequantMaxErrBoxed(
          (org.apache.spark.sql.catalyst.util.ArrayData) ${a.value},
          (org.apache.spark.sql.catalyst.util.ArrayData) ${b.value},
          ${m.value}, $maxCode);
        if ($o != null) { ${ev.isNull} = false; ${ev.value} = $o.doubleValue(); }
      }
      """)
  }

  override protected def withNewChildrenInternal(
      f: Expression, s: Expression, t: Expression): DequantMaxErr =
    copy(first = f, second = s, third = t)
  override def prettyName: String = "graft_dequant_max_err"
}

object VectorExprs {
  /** dot(a, b) over array<double> columns, whole-stage-codegen'd */
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** integer dot(a, b) over array<int> code columns (bigint result) */
  def dotInt(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotProductInt(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** max |x| over an array<double> column (null on empty input) */
  def absMax(v: Column): Column =
    ExpressionUtils.column(AbsMax(ExpressionUtils.expression(v)))

  /** symmetric scalar-quantization codes over array<double> (one O(d) pass) */
  def scalarCodes(v: Column, maxCode: Int): Column =
    ExpressionUtils.column(ScalarCodes(ExpressionUtils.expression(v), maxCode))

  /** max dequantization error |x − q·mx/maxCode| over paired arrays */
  def dequantMaxErr(v: Column, q: Column, mx: Column, maxCode: Int): Column =
    ExpressionUtils.column(DequantMaxErr(
      ExpressionUtils.expression(v), ExpressionUtils.expression(q),
      ExpressionUtils.expression(mx), maxCode))
}
