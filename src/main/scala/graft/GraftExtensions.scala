package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{DotProduct, HistogramAggExpr}

/** SQL surface for graft's custom expressions, injectable at session build
  * time (`SparkSession.builder().withExtensions(new GraftExtensions)`) or via
  * `spark.sql.extensions=graft.GraftExtensions`:
  *
  *   SELECT graft_dot(a, b)                          -- codegen'd dot product
  *   SELECT graft_histogram(x, 128, 0.0, 100.0)     -- native histogram agg
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {

  private def lit[T](e: Expression, what: String): T = e match {
    case Literal(v, _) => v.asInstanceOf[T]
    case other => throw new IllegalArgumentException(
      s"graft_histogram: $what must be a literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectFunction((
      new FunctionIdentifier("graft_dot"),
      new ExpressionInfo(classOf[DotProduct].getName, "graft_dot"),
      (args: Seq[Expression]) => DotProduct(args(0), args(1))))
    ext.injectFunction((
      new FunctionIdentifier("graft_histogram"),
      new ExpressionInfo(classOf[HistogramAggExpr].getName, "graft_histogram"),
      (args: Seq[Expression]) => HistogramAggExpr(
        args(0),
        lit[Int](args(1), "nbins"),
        lit[Number](args(2), "lo").doubleValue(),
        lit[Number](args(3), "hi").doubleValue())))
  }
}

object GraftExtensions {
  /** Imperative registration on an existing session (tests, REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    reg.createOrReplaceTempFunction(
      "graft_dot", args => DotProduct(args(0), args(1)), "scala_udf")
    reg.createOrReplaceTempFunction(
      "graft_histogram", args => HistogramAggExpr(
        args(0),
        args(1).asInstanceOf[Literal].value.asInstanceOf[Int],
        args(2).asInstanceOf[Literal].value.asInstanceOf[Number].doubleValue(),
        args(3).asInstanceOf[Literal].value.asInstanceOf[Number].doubleValue()),
      "scala_udf")
  }
}
