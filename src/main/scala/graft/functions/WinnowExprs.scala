package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.expressions.codegen.Block._
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.GraftSql
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Winnowing + chunking window kernels as single codegen'd expressions.
  *
  * These close the remainder of the lambda-splice class the r16 ShingleExprs
  * fix opened (see that file's scaladoc for the mechanism): the winnowing
  * fingerprint HOFs (`transform(sequence(1, len−k+1), i → hash32(substr(c,
  * i, k)))` and the window-min selector over `slice(hs, j+1, w)`) and the
  * document-chunking window all referenced their input INSIDE a transform
  * lambda. Every current caller bound the producer to an attribute first
  * (the "two-step binding" convention), so nothing was slow — but the next
  * caller who composes them under a pushed filter recreates the measured
  * 5–10× re-evaluation bug BY CONVENTION VIOLATION. A `UnaryExpression`
  * kernel is immune BY CONSTRUCTION: the child is evaluated exactly once
  * per row wherever the tree lands, and the window loop is one tight kernel
  * call instead of per-element lambda dispatch (the composed
  * `winnowedFingerprints` form was additionally O(len²) md5 per row —
  * re-hashing the whole gram array once per window — and is now O(len)).
  *
  * Semantics are bit-identical to the HOF forms for every input the library
  * produces, pinned by the winnow/chunk laws and the shared DuckDB oracles:
  *   - [[GramHashes]]: hash32 (first 4 md5 bytes, big-endian) of each char
  *     k-gram window, code-point windows exactly like `substr`; NULL input
  *     and `< k`-char input → empty array.
  *   - [[WinnowSelect]]/[[WinnowSelectPos]]: minimum (with 1-based position
  *     of its first occurrence, matching `array_position`) of each width-`w`
  *     window of the hash array, windows j = 0..max(len−w, 0) (one
  *     truncated window when len < w, like `slice`), first-occurrence
  *     distinct like `array_distinct`; NULL/empty input → empty array. The
  *     one intentional divergence: a window whose elements are ALL NULL
  *     contributed a null fingerprint in the HOF form and contributes
  *     nothing here — no library path produces null gram hashes, and a
  *     fingerprint that is null is a bug, not a value.
  *   - [[ChunkWindows]]: the chunk-count law `max(ceil(max(len−overlap,0) /
  *     step), 1)` for non-empty docs (step = size − overlap), 1-based char
  *     offsets, `substr(start, size)`-reconstructible chunks; NULL/empty
  *     input → empty array (the caller's explode drops the row, as before).
  *
  * Reference basis: winnowing is Schleimer/Wilkerson/Aiken (MOSS); the
  * chunk law is the provenance contract LawsSpec's reassembly law states.
  */
object WinnowKernels {
  /** hash32 of each code-point k-gram window; < k chars → empty */
  def gramHashes(s: UTF8String, k: Int): ArrayData = {
    val len = s.numChars()
    if (len < k) return ShingleKernels.EMPTY
    val out = new Array[Any](len - k + 1)
    var i = 1
    while (i <= len - k + 1) {
      out(i - 1) = TextHash.hash32(s.substringSQL(i, k))
      i += 1
    }
    new GenericArrayData(out)
  }

  /** (min hash32 over distinct k-grams, distinct k-gram count) in one pass;
    * md5 runs only on each gram's FIRST occurrence — min over distinct
    * equals min over all. < k chars → (null, 0).
    */
  def fingerprintStats(s: UTF8String, k: Int): InternalRow = {
    val len = s.numChars()
    if (len < k) return new GenericInternalRow(Array[Any](null, 0L))
    val seen = new java.util.HashSet[UTF8String]()
    var minh = Long.MaxValue
    var i = 1
    while (i <= len - k + 1) {
      val g = s.substringSQL(i, k)
      if (seen.add(g)) {
        val h = TextHash.hash32(g)
        if (h < minh) minh = h
      }
      i += 1
    }
    new GenericInternalRow(Array[Any](minh, seen.size.toLong))
  }

  /** distinct window minima, first-occurrence order; empty input → empty */
  def winnowSelect(hs: ArrayData, w: Int): ArrayData = {
    val n = hs.numElements()
    if (n == 0) return ShingleKernels.EMPTY
    val out = new java.util.ArrayList[Any](math.max(n - w + 1, 1))
    val seen = new java.util.HashSet[java.lang.Long]()
    var j = 0
    val lastJ = math.max(n - w, 0)
    while (j <= lastJ) {
      var m = Long.MaxValue
      var found = false
      var i = j
      val end = math.min(j + w, n)
      while (i < end) {
        if (!hs.isNullAt(i)) {
          val v = hs.getLong(i)
          if (!found || v < m) { m = v; found = true }
        }
        i += 1
      }
      if (found && seen.add(m)) out.add(m)
      j += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** distinct (window min, 1-based gram position of its first occurrence)
    * pairs, first-occurrence order — the spans substring removal needs
    */
  def winnowSelectPos(hs: ArrayData, w: Int): ArrayData = {
    val n = hs.numElements()
    if (n == 0) return ShingleKernels.EMPTY
    val out = new java.util.ArrayList[Any](math.max(n - w + 1, 1))
    val seen = new java.util.HashSet[(Long, Long)]()
    var j = 0
    val lastJ = math.max(n - w, 0)
    while (j <= lastJ) {
      var m = Long.MaxValue
      var pos = -1L
      var i = j
      val end = math.min(j + w, n)
      while (i < end) {
        if (!hs.isNullAt(i)) {
          val v = hs.getLong(i)
          // array_position semantics: FIRST occurrence of the min, 1-based
          // within the window, then offset by the window start j
          if (pos < 0 || v < m) { m = v; pos = j + (i - j) + 1L }
        }
        i += 1
      }
      if (pos >= 0 && seen.add((m, pos)))
        out.add(new GenericInternalRow(Array[Any](m, pos)))
      j += 1
    }
    new GenericArrayData(out.toArray)
  }

  /** fixed-size overlapping chunk windows with 1-based offsets; the count
    * law (incl. the one-chunk floor for non-empty docs) matches
    * TextOps.chunkDocuments' documented contract
    */
  def chunkWindows(s: UTF8String, size: Int, overlap: Int): ArrayData = {
    val len = s.numChars().toLong
    if (len == 0L) return ShingleKernels.EMPTY
    val step = (size - overlap).toLong
    val n = math.max((math.max(len - overlap, 0L) + step - 1L) / step, 1L)
    val out = new Array[Any](n.toInt)
    var i = 1L
    while (i <= n) {
      val start = (i - 1L) * step + 1L
      out((i - 1L).toInt) = new GenericInternalRow(
        Array[Any](i, start, s.substringSQL(start.toInt, size)))
      i += 1L
    }
    new GenericArrayData(out)
  }
}

/** Shared shape for the four kernels: never-null array output, NULL child →
  * empty array (the HOF forms' `otherwise(array())` branch — r16 ADVICE:
  * NullType literals must stay legal inputs), codegen casts the child slot
  * through Object so a NullType child's generated value compiles.
  */
private[functions] trait WinnowKernelExpr extends UnaryExpression {
  protected def accepts(t: DataType): Boolean
  protected def expectedName: String
  protected def kernelCall(childRef: String): String
  protected def kernelEval(v: Any): Any

  override def nullable: Boolean = false

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case NullType => TypeCheckResult.TypeCheckSuccess
    case t if accepts(t) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs $expectedName, got ${other.catalogString}")
  }

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) ShingleKernels.EMPTY else kernelEval(v)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    // the (Object) hop keeps the call compilable when the child is a
    // NullType literal (whose generated slot is not the kernel's input type)
    ev.copy(code = code"""
      ${c.code}
      org.apache.spark.sql.catalyst.util.ArrayData ${ev.value} =
        ${c.isNull} ? graft.functions.ShingleKernels.EMPTY()
          : ${kernelCall(s"(Object) ${c.value}")};
      """, isNull = org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral)
  }
}

/** `string → array<long>`: hash32 of every code-point k-gram window */
case class GramHashes(child: Expression, k: Int) extends WinnowKernelExpr {
  require(k >= 1, s"gram width >= 1, got $k")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def accepts(t: DataType): Boolean = t == StringType
  override protected def expectedName: String = "string"
  override protected def kernelEval(v: Any): Any =
    WinnowKernels.gramHashes(v.asInstanceOf[UTF8String], k)
  override protected def kernelCall(ref: String): String =
    s"graft.functions.WinnowKernels.gramHashes((org.apache.spark.unsafe.types.UTF8String) $ref, $k)"
  override protected def withNewChildInternal(newChild: Expression): GramHashes =
    copy(child = newChild)
  override def prettyName: String = "graft_gram_hashes"
}

/** `array<long> → array<long>`: distinct sliding-window minima */
case class WinnowSelect(child: Expression, w: Int) extends WinnowKernelExpr {
  require(w >= 1, s"winnow window >= 1, got $w")
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override protected def accepts(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override protected def expectedName: String = "array<bigint>"
  override protected def kernelEval(v: Any): Any =
    WinnowKernels.winnowSelect(v.asInstanceOf[ArrayData], w)
  override protected def kernelCall(ref: String): String =
    s"graft.functions.WinnowKernels.winnowSelect((org.apache.spark.sql.catalyst.util.ArrayData) $ref, $w)"
  override protected def withNewChildInternal(newChild: Expression): WinnowSelect =
    copy(child = newChild)
  override def prettyName: String = "graft_winnow_select"
}

/** `array<long> → array<struct<fp:long,pos:long>>`: window minima with the
  * 1-based gram position of each min's first occurrence
  */
case class WinnowSelectPos(child: Expression, w: Int) extends WinnowKernelExpr {
  require(w >= 1, s"winnow window >= 1, got $w")
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("fp", LongType, nullable = false),
      StructField("pos", LongType, nullable = false))),
    containsNull = false)
  override protected def accepts(t: DataType): Boolean = t match {
    case ArrayType(LongType, _) => true
    case _ => false
  }
  override protected def expectedName: String = "array<bigint>"
  override protected def kernelEval(v: Any): Any =
    WinnowKernels.winnowSelectPos(v.asInstanceOf[ArrayData], w)
  override protected def kernelCall(ref: String): String =
    s"graft.functions.WinnowKernels.winnowSelectPos((org.apache.spark.sql.catalyst.util.ArrayData) $ref, $w)"
  override protected def withNewChildInternal(newChild: Expression): WinnowSelectPos =
    copy(child = newChild)
  override def prettyName: String = "graft_winnow_select_pos"
}

/** `string → array<struct<chunk_idx:long,start:long,chunk:string>>` */
case class ChunkWindows(child: Expression, size: Int, overlap: Int)
  extends WinnowKernelExpr {
  require(overlap >= 0 && size > overlap,
    s"need size > overlap >= 0, got size=$size overlap=$overlap")
  override def dataType: DataType = ArrayType(
    StructType(Seq(
      StructField("chunk_idx", LongType, nullable = false),
      StructField("start", LongType, nullable = false),
      StructField("chunk", StringType, nullable = false))),
    containsNull = false)
  override protected def accepts(t: DataType): Boolean = t == StringType
  override protected def expectedName: String = "string"
  override protected def kernelEval(v: Any): Any =
    WinnowKernels.chunkWindows(v.asInstanceOf[UTF8String], size, overlap)
  override protected def kernelCall(ref: String): String =
    s"graft.functions.WinnowKernels.chunkWindows((org.apache.spark.unsafe.types.UTF8String) $ref, $size, $overlap)"
  override protected def withNewChildInternal(newChild: Expression): ChunkWindows =
    copy(child = newChild)
  override def prettyName: String = "graft_chunk_windows"
}

/** `string → struct<fingerprint: bigint, n_grams: bigint>` — the document
  * fingerprint gate's two outputs in ONE pass (r19): distinct char k-grams
  * counted via a first-occurrence set, hash32 (md5) computed ONLY on each
  * first occurrence, running min. Bit-identical to the two-expression form
  * `array_min(gramHashes(text, k))` + `size(charShingles(text, k))` —
  * duplicates never change a min, so min over distinct = min over all —
  * while paying one substring walk and one md5 per DISTINCT gram instead of
  * (distinct-set build + array materialization) PLUS (md5 per gram
  * position). < k chars → (null, 0) like (array_min(empty), size(empty)).
  */
case class FingerprintStats(child: Expression, k: Int) extends UnaryExpression {
  require(k >= 1, s"gram width >= 1, got $k")
  override def dataType: DataType = StructType(Seq(
    StructField("fingerprint", LongType, nullable = true),
    StructField("n_grams", LongType, nullable = false)))
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case NullType | StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName needs string, got ${other.catalogString}")
  }

  override def nullSafeEval(input: Any): Any =
    WinnowKernels.fingerprintStats(input.asInstanceOf[UTF8String], k)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, v =>
      s"""${ev.value} = graft.functions.WinnowKernels.fingerprintStats(
         |  (org.apache.spark.unsafe.types.UTF8String) $v, $k);""".stripMargin)

  override protected def withNewChildInternal(newChild: Expression): FingerprintStats =
    copy(child = newChild)
  override def prettyName: String = "graft_fingerprint_stats"
}

object WinnowExprs {
  def gramHashes(c: Column, k: Int): Column =
    GraftSql.column(GramHashes(GraftSql.expression(c), k))
  def fingerprintStats(c: Column, k: Int): Column =
    GraftSql.column(FingerprintStats(GraftSql.expression(c), k))
  def winnowSelect(hs: Column, w: Int): Column =
    GraftSql.column(WinnowSelect(GraftSql.expression(hs), w))
  def winnowSelectPos(hs: Column, w: Int): Column =
    GraftSql.column(WinnowSelectPos(GraftSql.expression(hs), w))
  def chunkWindows(c: Column, size: Int, overlap: Int): Column =
    GraftSql.column(ChunkWindows(GraftSql.expression(c), size, overlap))
}
