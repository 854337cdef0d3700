package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.graftbridge.{GraftSql => ExpressionUtils}
import org.apache.spark.sql.types.{DataType, LongType}
import org.apache.spark.unsafe.types.UTF8String

/** Vocabulary-exact token count — the upgrade of the BPE-ish *estimator*
  * (`TextOps.bpeishTokens`) to a real tokenizer-style count: greedy
  * longest-match over a fixed subword vocabulary, the WordPiece/BPE-inference
  * segmentation rule. Counting is the operation a packing/budgeting pipeline
  * actually needs at 100 TB (the token IDS are a trivial extension; the
  * count avoids materializing them per row).
  *
  * Semantics (mirrored exactly by the recursive-CTE SQL oracle):
  * scan left to right; a space advances one char and counts nothing; else
  * consume the LONGEST vocab entry matching at the cursor (ties in length
  * are count-equivalent), or one char if none matches, and count one token.
  *
  * The vocabulary rides along as a reference object (the [[TopCentroids]]
  * pattern): one flat array serialized per task, one virtual call per row,
  * primitive loops inside — whole-stage codegen keeps the scan fused, no
  * Scala UDF. Matching is bucketed by first byte so each cursor position
  * probes only its bucket, longest first. ASCII-oriented (the corpus
  * contract); non-ASCII bytes fall through to the 1-byte fallback.
  */
case class VocabTokenCount(child: Expression, vocab: Seq[String])
  extends UnaryExpression {

  require(vocab.nonEmpty && vocab.forall(t => t.nonEmpty && !t.contains(' ')),
    "graft_vocab_token_count: vocab entries must be non-empty and space-free")

  override def dataType: DataType = LongType

  /** per-first-byte buckets of vocab entry bytes, longest first (ties by
    * entry — irrelevant to the count), built once per plan
    */
  @transient private lazy val buckets: Array[Array[Array[Byte]]] = {
    val out = Array.fill(256)(Array.empty[Array[Byte]])
    vocab.map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8))
      .groupBy(b => b(0) & 0xff)
      .foreach { case (b0, entries) =>
        out(b0) = entries.sortBy(e => (-e.length, new String(e))).toArray
      }
    out
  }

  def compute(s: UTF8String): Long = {
    val bytes = s.getBytes
    val n = bytes.length
    var pos = 0
    var count = 0L
    while (pos < n) {
      val b = bytes(pos)
      if (b == ' '.toByte) pos += 1
      else {
        val bucket = buckets(b & 0xff)
        var adv = 1
        var k = 0
        var found = false
        while (!found && k < bucket.length) {
          val e = bucket(k)
          if (e.length <= n - pos) {
            var i = 0
            while (i < e.length && bytes(pos + i) == e(i)) i += 1
            if (i == e.length) { adv = e.length; found = true }
          }
          k += 1
        }
        pos += adv
        count += 1L
      }
    }
    count
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("vocabTokenCount", this)
    nullSafeCodeGen(ctx, ev, s => s"${ev.value} = $ref.compute($s);")
  }

  // content-compare the vocab so structurally identical instances stay
  // semanticEquals (Catalyst CSE) — the TopCentroids discipline
  override def equals(other: Any): Boolean = other match {
    case v: VocabTokenCount => child == v.child && vocab == v.vocab
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(child, vocab)

  override protected def withNewChildInternal(newChild: Expression): VocabTokenCount =
    copy(child = newChild)
  override def prettyName: String = "graft_vocab_token_count"
}

object VocabExprs {
  /** greedy longest-match token count of `text` under `vocab` */
  def vocabTokenCount(text: Column, vocab: Seq[String]): Column =
    ExpressionUtils.column(VocabTokenCount(ExpressionUtils.expression(text), vocab))
}
