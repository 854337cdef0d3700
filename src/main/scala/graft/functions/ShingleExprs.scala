package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftSql
import org.apache.spark.sql.types.{ArrayType, DataType, NullType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Sliding-window shingles as single codegen'd expressions.
  *
  * These replace the higher-order-function forms
  * `transform(sequence(1, size(toks) − n + 1), i → concat_ws(" ",
  * slice(toks, i, n)))` (and the `substr` analog for char n-grams), which
  * carry a structural performance trap: the input array/string appears
  * INSIDE the transform lambda, so whenever Catalyst inlines the producing
  * expression — which filter pushdown does UNCONDITIONALLY when a predicate
  * is pushed through the projection that computed `toks` — the producer is
  * re-evaluated PER WINDOW ELEMENT with no common-subexpression
  * elimination (lambda-bearing trees are excluded from CSE). Measured on
  * the r16 admission probe: a pushed `anyInSet(shingles(tokens(text)))`
  * predicate re-tokenized each document once per shingle — 2.6–3.0 s for a
  * 5 k-doc scan that costs 0.3 s with the array materialized first.
  *
  * A custom `UnaryExpression` is immune BY CONSTRUCTION: its child is
  * evaluated exactly once per row wherever the tree lands (filter, project,
  * join key), and the window loop is one tight kernel call instead of
  * per-element lambda dispatch. Same cure the repo's MinhashSignature /
  * Simhash32 apply to the explode-per-gram shape — this closes the gap for
  * the shingle PRODUCERS too.
  *
  * Semantics are bit-identical to the HOF forms (shared DuckDB oracles pin
  * them): windows joined with single spaces, `concat_ws` null-element
  * skipping, `< n` inputs and NULL inputs both yield the EMPTY array (the
  * `when(...).otherwise(array())` path), and the distinct variants keep
  * first-occurrence order exactly like `array_distinct`.
  */
object ShingleKernels {
  private val SPACE = UTF8String.fromString(" ")
  val EMPTY: ArrayData = new GenericArrayData(Array.empty[Any])

  /** word n-gram windows over a token array; distinct keeps first occurrence */
  def words(arr: ArrayData, n: Int, distinct: Boolean): ArrayData = {
    val sz = arr.numElements()
    if (sz < n) return EMPTY
    val out = new java.util.ArrayList[AnyRef](sz - n + 1)
    val seen = if (distinct) new java.util.HashSet[UTF8String]() else null
    var i = 0
    while (i <= sz - n) {
      val parts = new Array[UTF8String](n)
      var j = 0
      while (j < n) {
        // concat_ws semantics: null elements are skipped (concatWs ignores
        // null inputs), non-null elements joined with single spaces
        parts(j) = if (arr.isNullAt(i + j)) null else arr.getUTF8String(i + j)
        j += 1
      }
      val s = UTF8String.concatWs(SPACE, parts: _*)
      if (seen == null || seen.add(s)) out.add(s)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** char n-gram windows over a string (always distinct, first occurrence) */
  def chars(s: UTF8String, n: Int): ArrayData = {
    val len = s.numChars()
    if (len < n) return EMPTY
    val out = new java.util.ArrayList[AnyRef](len - n + 1)
    val seen = new java.util.HashSet[UTF8String]()
    var i = 1
    while (i <= len - n + 1) {
      val g = s.substringSQL(i, n)
      if (seen.add(g)) out.add(g)
      i += 1
    }
    new GenericArrayData(out.toArray)
  }
}

/** `array<string> → array<string>` word n-gram shingles; NULL input → empty
  * array (the HOF form's `otherwise(array())` branch), never null out.
  */
case class WordShingles(child: Expression, n: Int, distinct: Boolean)
  extends UnaryExpression {
  require(n >= 1, s"shingle width >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  // NullType stays a legal input (r16 ADVICE: the HOF forms tolerated
  // lit(null) by returning the empty array; the eval/codegen null branch
  // preserves that). Other non-array inputs fail analysis — stricter than
  // the HOF forms' implicit casts, documented at the TextOps wrappers.
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_shingles needs array<string>, got ${other.catalogString}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) ShingleKernels.EMPTY
    else ShingleKernels.words(v.asInstanceOf[ArrayData], n, distinct)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        ${c.isNull} ? graft.functions.ShingleKernels.EMPTY()
          : graft.functions.ShingleKernels.words(
              (org.apache.spark.sql.catalyst.util.ArrayData) (Object) ${c.value},
              $n, $distinct);
      """, isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
  override def prettyName: String = "graft_shingles"
}

/** `string → array<string>` distinct char n-grams; NULL input → empty array */
case class CharShingles(child: Expression, n: Int) extends UnaryExpression {
  require(n >= 1, s"char-gram width >= 1, got $n")

  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullable: Boolean = false

  // NullType tolerated like WordShingles (see the note there)
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType | NullType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_char_shingles needs string, got ${other.catalogString}")
  }

  override def eval(input: org.apache.spark.sql.catalyst.InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) ShingleKernels.EMPTY
    else ShingleKernels.chars(v.asInstanceOf[UTF8String], n)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        ${c.isNull} ? graft.functions.ShingleKernels.EMPTY()
          : graft.functions.ShingleKernels.chars(
              (org.apache.spark.unsafe.types.UTF8String) (Object) ${c.value}, $n);
      """, isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): CharShingles =
    copy(child = newChild)
  override def prettyName: String = "graft_char_shingles"
}

object ShingleExprs {
  def wordShingles(toks: Column, n: Int, distinct: Boolean): Column =
    GraftSql.column(WordShingles(GraftSql.expression(toks), n, distinct))
  def charShingles(c: Column, n: Int): Column =
    GraftSql.column(CharShingles(GraftSql.expression(c), n))
}
