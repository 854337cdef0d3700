package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.{GraftSql => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, DoubleType, LongType}

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

object VectorExprs {
  /** dot(a, b) over array<double> columns, whole-stage-codegen'd */
  def dot(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotProduct(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))

  /** integer dot(a, b) over array<int> code columns (bigint result) */
  def dotInt(a: Column, b: Column): Column =
    ExpressionUtils.column(
      DotProductInt(ExpressionUtils.expression(a), ExpressionUtils.expression(b)))
}
