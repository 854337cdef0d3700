package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftSql
import org.apache.spark.sql.types.{ArrayType, DataType, LongType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** One-pass text-hash kernels shared by the eval and codegen paths.
  *
  * The hash is the engine-portable 32-bit construction used everywhere in
  * graft (TextOps.hash32): the first 4 bytes of md5(utf8), read big-endian as
  * an unsigned int — bit-for-bit equal to
  * `conv(substring(md5(s),1,8),16,10)` and to DuckDB's
  * `CAST(('0x' || substring(md5(s),1,8)) AS BIGINT)`, so SQL oracles
  * reproduce every derived signature exactly.
  */
object TextHash {
  val P: Long = 2147483647L // 2^31 - 1, the universal-hash modulus

  private val md = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  def hash32(s: UTF8String): Long = {
    val d = md.get()
    d.reset()
    val b = d.digest(s.getBytes)
    ((b(0) & 0xFFL) << 24) | ((b(1) & 0xFFL) << 16) |
      ((b(2) & 0xFFL) << 8) | (b(3) & 0xFFL)
  }

  /** k-wide MinHash signature over the array's elements in one pass: one md5
    * per element, k universal-hash mixes (a_i*h + b_i) mod P, running mins.
    * No overflow: a < P ≈ 2^31, h < 2^32, so a*h + b < 2^63.
    * NULL elements are skipped (the old explode+min shape ignored them:
    * hash32(NULL) = NULL and min skips NULLs); returns null when no non-null
    * element exists, matching the empty-array result.
    */
  def minhash(arr: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    val k = a.length
    val mins = Array.fill(k)(Long.MaxValue)
    val n = arr.numElements()
    var seen = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        seen = true
        val h = hash32(arr.getUTF8String(i))
        var j = 0
        while (j < k) {
          val v = (a(j) * h + b(j)) % P
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!seen) null else new GenericArrayData(mins)
  }

  /** 32-bit SimHash in one pass: bit j set iff Σ over elements of
    * (±1 by bit j of hash32(element)) >= 0. NULL elements are skipped
    * (the old explode+sum shape ignored them); null when no non-null
    * element exists, matching the empty-array result.
    */
  def simhash32(arr: ArrayData): java.lang.Long = {
    val counts = new Array[Int](32)
    val n = arr.numElements()
    var seen = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        seen = true
        val h = hash32(arr.getUTF8String(i))
        var j = 0
        while (j < 32) {
          if (((h >> j) & 1L) == 1L) counts(j) += 1 else counts(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    if (!seen) return null
    var out = 0L
    var j = 0
    while (j < 32) {
      if (counts(j) >= 0) out |= (1L << j)
      j += 1
    }
    out
  }
}

/** Whole-document MinHash signature as a single codegen'd expression over the
  * shingle array — `array<string> -> array<long>[k]`.
  *
  * This replaces the explode → md5-per-row → groupBy(id).agg(k mins) shape:
  * same md5 count, but ZERO shuffle (the old shape shuffles k longs per doc
  * plus pays the row-explosion) and no hash-aggregate state. At 100 TB the
  * signature stage becomes a pure map over the corpus scan. NULL for an empty
  * shingle array (mirroring the old shape, where a doc with no shingles
  * produced no exploded rows and hence no signature).
  */
case class MinhashSignature(child: Expression, seedsA: Seq[Long], seedsB: Seq[Long])
    extends UnaryExpression {
  require(seedsA.length == seedsB.length && seedsA.nonEmpty,
    "minhash needs matching, non-empty seed vectors")

  @transient private lazy val aArr = seedsA.toArray
  @transient private lazy val bArr = seedsB.toArray

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_minhash needs array<string>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    TextHash.minhash(v.asInstanceOf[ArrayData], aArr, bArr) // null if no non-null element

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val refA = ctx.addReferenceObj("graftMhSeedsA", aArr, "long[]")
    val refB = ctx.addReferenceObj("graftMhSeedsB", bArr, "long[]")
    val r = ctx.freshName("graftMhR")
    nullSafeCodeGen(ctx, ev, c => s"""
      org.apache.spark.sql.catalyst.util.ArrayData $r =
        graft.functions.TextHash.minhash($c, $refA, $refB);
      if ($r == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = $r;
      }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): MinhashSignature =
    copy(child = newChild)
  override def prettyName: String = "graft_minhash"
}

/** Whole-document 32-bit SimHash as a single codegen'd expression over the
  * (distinct) token array — replaces explode → 32 conditional sums →
  * groupBy(id): zero shuffle, no 32-column aggregate state. NULL for an
  * empty array (the old shape dropped such docs).
  */
case class Simhash32(child: Expression) extends UnaryExpression {
  override def dataType: DataType = LongType
  override def nullable: Boolean = true

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_simhash needs array<string>, got ${other.catalogString}")
  }

  override protected def nullSafeEval(v: Any): Any =
    TextHash.simhash32(v.asInstanceOf[ArrayData]) // null if no non-null element

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val r = ctx.freshName("graftShR")
    nullSafeCodeGen(ctx, ev, c => s"""
      java.lang.Long $r = graft.functions.TextHash.simhash32($c);
      if ($r == null) {
        ${ev.isNull} = true;
      } else {
        ${ev.value} = $r.longValue();
      }
    """)
  }

  override protected def withNewChildInternal(newChild: Expression): Simhash32 =
    copy(child = newChild)
  override def prettyName: String = "graft_simhash"
}

object TextHashExprs {
  /** minhash signature column: array<string> shingles -> array<long>[k] */
  def minhashSig(sh: Column, seedsA: Seq[Long], seedsB: Seq[Long]): Column =
    GraftSql.column(MinhashSignature(GraftSql.expression(sh), seedsA, seedsB))

  /** simhash column: array<string> tokens -> 32-bit simhash as long */
  def simhash(toks: Column): Column =
    GraftSql.column(Simhash32(GraftSql.expression(toks)))
}
