package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftSql
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Phrase-occurrence kernel (r19).
  *
  * The streaming phrase twin matched with
  * `filter(sequence(1, n−l+1), i → AND_j element_at(toks, i+j) = t_j)`
  * where `toks` was the full `split(text)` EXPRESSION — the lambda-splice
  * class again, this time in a stream gate (outside PlanGuardSpec's batch
  * plan scan): lambda trees get no CSE, so the split re-evaluated once per
  * (position, phrase token) — O(n·l) splits of the whole text per row, and
  * the `n_matches > 0` filter inlined the whole producer below the widening
  * repartition. The kernel walks the token array once per evaluation.
  */
object PhraseKernels {
  /** (match count, first 0-based match position or null) — bit-identical to
    * the HOF form: a position i (0-based here) matches iff tokens
    * i..i+l−1 all equal the phrase (a NULL token never equals anything,
    * like the HOF's null-propagating `===`); fewer than l tokens → (0,
    * null), the HOF's `size(toks) >= l` branch.
    */
  def phraseHits(toks: ArrayData, phrase: Array[UTF8String]): InternalRow = {
    val n = toks.numElements()
    val l = phrase.length
    var cnt = 0L
    var first: Any = null
    var i = 0
    while (i <= n - l) {
      var j = 0
      var ok = true
      while (ok && j < l) {
        if (toks.isNullAt(i + j) || !toks.getUTF8String(i + j).equals(phrase(j))) ok = false
        j += 1
      }
      if (ok) {
        cnt += 1
        if (first == null) first = i.toLong
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](cnt, first))
  }
}

/** `array<string> → struct<n_matches: bigint, first_pos: bigint>` over a
  * fixed phrase literal; NULL input → NULL (like the HOF chain over a NULL
  * token array).
  */
case class PhraseHits(child: Expression, phrase: Seq[String]) extends UnaryExpression {
  require(phrase.nonEmpty, "phrase must have at least one token")

  override def dataType: DataType = StructType(Seq(
    StructField("n_matches", LongType, nullable = false),
    StructField("first_pos", LongType, nullable = true)))

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs array<string>, got ${other.catalogString}")
  }

  @transient private lazy val phraseU8: Array[UTF8String] =
    phrase.map(UTF8String.fromString).toArray

  override def nullSafeEval(input: Any): Any =
    PhraseKernels.phraseHits(input.asInstanceOf[ArrayData], phraseU8)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val phraseRef = ctx.addReferenceObj("phrase", phraseU8,
      "org.apache.spark.unsafe.types.UTF8String[]")
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = graft.functions.PhraseKernels.phraseHits(
         |  (org.apache.spark.sql.catalyst.util.ArrayData) $v, $phraseRef);""".stripMargin)
  }

  override protected def withNewChildInternal(newChild: Expression): PhraseHits =
    copy(child = newChild)
  override def prettyName: String = "graft_phrase_hits"
}

object PhraseExprs {
  def phraseHits(toks: Column, phrase: Seq[String]): Column =
    GraftSql.column(PhraseHits(GraftSql.expression(toks), phrase))
}
