package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData, SQLOrderingUtil}
import org.apache.spark.sql.graftbridge.{GraftSql => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, IntegerType, LongType}

/** Product-quantization encode as ONE codegen'd kernel call per row — the
  * broadcast-matrix variant of the literal-struct argmin chain in
  * [[graft.ops.Similarity]] (`nearestL2` over `slice` subvectors), exactly
  * like [[TopCentroids]] is for the IVF cosine argmax.
  *
  * Why (r19 optimization round, measured): the literal encode path builds,
  * PER SUBSPACE, an `array_min` over nCodes structs each holding
  * `round(sqDist(slice(v, s·sub+1, sub), lit(centroid)), 6)` — with sqDist
  * expanded as `dot(a,a) − 2·dot(a,b) + dot(b,b)` that is 3 dot kernels and
  * one fresh `slice` allocation per CANDIDATE, m·nCodes·3 dot calls and
  * m·nCodes array copies per row (m=4 × nCodes=16 → 192 dots + 64 slices),
  * and when the input vector is itself an expression (the OPQ rotation) the
  * producing tree can be re-inlined into every candidate reference. The
  * probe attributed ~2.4 ms/row to this shape (q_ann_pq exec stage: 4 tasks,
  * 4.8 s task-sum for 2 000 rows). This kernel walks the flat codebook
  * matrix in primitive loops: the child vector is evaluated exactly ONCE per
  * row by construction (UnaryExpression), subvectors are read in place
  * (no slice materialization), and each subspace's self-dot X is computed
  * once instead of once per candidate (same VALUE, deterministic — the
  * literal path recomputes it per candidate only because each struct is an
  * independent expression).
  *
  * Bit-exactness contract (pinned by the LawsSpec kernel-vs-literal parity
  * law and the shared PQ oracles):
  *   - per candidate c of subspace s, distance
  *     d = round6((X − 2.0·Y) + Z_c) with X = Σ_j a_j·a_j, Y = Σ_j a_j·b_j,
  *     Z_c = Σ_j b_j·b_j, every sum strictly left-to-right over
  *     a = v[s·sub .. s·sub+sub) (shorter if v is short — `slice`/`dot` zip
  *     semantics) and the full sub-length b — the exact association order of
  *     the `dot(a,a) − lit(2.0)·dot(a,b) + dot(b,b)` tree;
  *   - round6 = Spark `Round(_, 6)` for doubles: BigDecimal HALF_UP,
  *     non-finite passthrough;
  *   - argmin by (d, key) lexicographic with doubles compared via
  *     [[SQLOrderingUtil.compareDoubles]] (NaN greatest, −0.0 = 0.0) — the
  *     `array_min` struct order; candidates are iterated in ascending-key
  *     order and only a STRICTLY smaller d displaces, so ties keep the
  *     smaller key exactly like the struct min.
  *
  * `keys` selects what the argmin returns per subspace: code POSITIONS
  * (0..nCodes−1, `returnInt = true` — the stored-code form) or centroid IDS
  * (`returnInt = false` — the Lloyd-training assignment form). Null input →
  * null (nullSafeEval); null vector ELEMENTS are out of contract, exactly as
  * for the dot kernels.
  */
case class PqCodes(
    child: Expression, keys: Array[Long], booksFlat: Array[Double],
    m: Int, sub: Int, nCodes: Int, returnInt: Boolean)
  extends UnaryExpression {

  require(m >= 1 && sub >= 1 && nCodes >= 1, s"bad PQ shape m=$m sub=$sub nCodes=$nCodes")
  require(keys.length == m * nCodes,
    s"graft_pq_codes: ${keys.length} keys != $m subspaces x $nCodes codes")
  require(booksFlat.length == m * nCodes * sub,
    s"graft_pq_codes: matrix ${booksFlat.length} != $m x $nCodes x $sub")

  override def dataType: DataType =
    ArrayType(if (returnInt) IntegerType else LongType, containsNull = false)

  /** Z_c per (subspace, candidate): left-to-right self-dot, once per plan */
  @transient private lazy val selfDots: Array[Double] = {
    val out = new Array[Double](m * nCodes)
    var sc = 0
    while (sc < m * nCodes) {
      var acc = 0.0
      var j = 0
      while (j < sub) { val x = booksFlat(sc * sub + j); acc += x * x; j += 1 }
      out(sc) = acc
      sc += 1
    }
    out
  }

  // identical to Spark's Round codegen for double (non-finite passthrough)
  private def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  def compute(v: ArrayData): ArrayData = {
    val len = v.numElements()
    val out = new Array[Any](m)
    var s = 0
    while (s < m) {
      val base = s * sub
      val alen = math.max(0, math.min(len - base, sub))
      // X once per subspace: the literal path evaluates dot(a,a) per
      // candidate but the value is identical every time
      var x = 0.0
      var j = 0
      while (j < alen) { val a = v.getDouble(base + j); x += a * a; j += 1 }
      var bestD = 0.0
      var bestKey = 0L
      var c = 0
      while (c < nCodes) {
        val off = (s * nCodes + c) * sub
        var y = 0.0
        j = 0
        while (j < alen) { y += v.getDouble(base + j) * booksFlat(off + j); j += 1 }
        val d = round6((x - 2.0 * y) + selfDots(s * nCodes + c))
        // first candidate seeds; then strictly-smaller-d displaces (keys
        // ascend, so equal d keeps the smaller key — the struct-min order)
        if (c == 0 || SQLOrderingUtil.compareDoubles(d, bestD) < 0) {
          bestD = d
          bestKey = keys(s * nCodes + c)
        }
        c += 1
      }
      out(s) = if (returnInt) bestKey.toInt else bestKey
      s += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // kernel object rides as ONE codegen reference (matrix serialized per
    // task, not per row); the child is evaluated exactly once per row
    val ref = ctx.addReferenceObj("pqCodes", this)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqCodes =
    copy(child = newChild)
  override def prettyName: String = "graft_pq_codes"

  // array fields compare by reference under the case-class equals, which
  // would defeat Catalyst CSE for structurally identical instances —
  // compare content (the TopCentroids discipline)
  override def equals(other: Any): Boolean = other match {
    case t: PqCodes =>
      child == t.child && m == t.m && sub == t.sub && nCodes == t.nCodes &&
        returnInt == t.returnInt && java.util.Arrays.equals(keys, t.keys) &&
        java.util.Arrays.equals(booksFlat, t.booksFlat)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(m), Integer.valueOf(sub),
      Integer.valueOf(nCodes), java.lang.Boolean.valueOf(returnInt),
      Integer.valueOf(java.util.Arrays.hashCode(keys)),
      Integer.valueOf(java.util.Arrays.hashCode(booksFlat)))
}

/** The query-side ADC distance table for ONE subspace as a kernel: the
  * array of round6 sqDists from the query's subvector to every candidate
  * centroid, in candidate (code-position) order — exactly the
  * `array(round(sqDist(slice(qv, s·sub+1, sub), lit(c_pos)), 6) ...)`
  * literal column, with the same per-term arithmetic as [[PqCodes]].
  */
case class PqDistTable(
    child: Expression, booksFlat: Array[Double], s: Int, sub: Int, nCodes: Int)
  extends UnaryExpression {

  require(s >= 0 && sub >= 1 && nCodes >= 1, s"bad PQ shape s=$s sub=$sub nCodes=$nCodes")
  require(booksFlat.length == nCodes * sub,
    s"graft_pq_dist_table: matrix ${booksFlat.length} != $nCodes x $sub")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  @transient private lazy val selfDots: Array[Double] = {
    val out = new Array[Double](nCodes)
    var c = 0
    while (c < nCodes) {
      var acc = 0.0
      var j = 0
      while (j < sub) { val x = booksFlat(c * sub + j); acc += x * x; j += 1 }
      out(c) = acc
      c += 1
    }
    out
  }

  private def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  def compute(v: ArrayData): ArrayData = {
    val len = v.numElements()
    val base = s * sub
    val alen = math.max(0, math.min(len - base, sub))
    var x = 0.0
    var j = 0
    while (j < alen) { val a = v.getDouble(base + j); x += a * a; j += 1 }
    val out = new Array[Any](nCodes)
    var c = 0
    while (c < nCodes) {
      var y = 0.0
      j = 0
      while (j < alen) { y += v.getDouble(base + j) * booksFlat(c * sub + j); j += 1 }
      out(c) = round6((x - 2.0 * y) + selfDots(c))
      c += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("pqDistTable", this)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): PqDistTable =
    copy(child = newChild)
  override def prettyName: String = "graft_pq_dist_table"

  override def equals(other: Any): Boolean = other match {
    case t: PqDistTable =>
      child == t.child && s == t.s && sub == t.sub && nCodes == t.nCodes &&
        java.util.Arrays.equals(booksFlat, t.booksFlat)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(s), Integer.valueOf(sub),
      Integer.valueOf(nCodes), Integer.valueOf(java.util.Arrays.hashCode(booksFlat)))
}

/** Dense matrix–vector product with per-component round6 (and an optional
  * scalar factor applied before the rounding) as ONE kernel call — the
  * broadcast-matrix form of the literal `array(round(dot(v, lit(row_0)) ·
  * scale, 6), …)` column built by [[graft.ops.Similarity.rotateHD]] /
  * `randomProject`. The literal form embeds rows×dim literal doubles into
  * every stage's generated class (the OPQ rotation: 64×64 = 4 096 literals,
  * re-compiled per training/encode/query stage — janino time, not data
  * time). Component j = round6((Σ_i v_i·m_ji) · scale), sums strictly
  * left-to-right over min(len(v), dim) — `dot` zip semantics; `scale = 1.0`
  * is exact identity (IEEE x·1.0 = x), so the unscaled rotation and the
  * scaled JL projection share one kernel.
  */
case class MatVecRound6(
    child: Expression, matFlat: Array[Double], rows: Int, dim: Int, scale: Double)
  extends UnaryExpression {

  require(rows >= 1 && dim >= 1 && matFlat.length == rows * dim,
    s"graft_matvec_r6: matrix ${matFlat.length} != $rows x $dim")

  override def dataType: DataType = ArrayType(DoubleType, containsNull = false)

  private def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  def compute(v: ArrayData): ArrayData = {
    val n = math.min(v.numElements(), dim)
    val out = new Array[Any](rows)
    var j = 0
    while (j < rows) {
      var acc = 0.0
      var i = 0
      while (i < n) { acc += v.getDouble(i) * matFlat(j * dim + i); i += 1 }
      out(j) = round6(acc * scale)
      j += 1
    }
    new GenericArrayData(out)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("matVecR6", this)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($v);")
  }

  override protected def withNewChildInternal(newChild: Expression): MatVecRound6 =
    copy(child = newChild)
  override def prettyName: String = "graft_matvec_r6"

  override def equals(other: Any): Boolean = other match {
    case t: MatVecRound6 =>
      child == t.child && rows == t.rows && dim == t.dim && scale == t.scale &&
        java.util.Arrays.equals(matFlat, t.matFlat)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(rows), Integer.valueOf(dim),
      java.lang.Double.valueOf(scale),
      Integer.valueOf(java.util.Arrays.hashCode(matFlat)))
}

object PqExprs {
  /** flatten `books` (per-subspace (key, centroid) lists) in ascending-key
    * order — the iteration order the kernels' tie-break contract assumes;
    * returns (position keys, centroid-id keys, flat matrix)
    */
  private def flat(books: Seq[Seq[(Long, Seq[Double])]], sub: Int)
      : (Array[Long], Array[Long], Array[Double]) = {
    val m = books.length
    val nCodes = books.head.length
    val keysPos = new Array[Long](m * nCodes)
    val keysId = new Array[Long](m * nCodes)
    val mat = new Array[Double](m * nCodes * sub)
    books.indices.foreach { s =>
      val sorted = books(s).sortBy(_._1)
      require(sorted.length == nCodes, s"subspace $s has ${sorted.length} codes != $nCodes")
      sorted.zipWithIndex.foreach { case ((cid, cv), pos) =>
        require(cv.length == sub, s"centroid ($s,$cid) dim ${cv.length} != $sub")
        keysPos(s * nCodes + pos) = pos.toLong
        keysId(s * nCodes + pos) = cid
        cv.indices.foreach(j => mat((s * nCodes + pos) * sub + j) = cv(j))
      }
    }
    (keysPos, keysId, mat)
  }

  /** m stored-code positions (array<int>) — the PQ encode of `v` */
  def pqCodePositions(v: Column, books: Seq[Seq[(Long, Seq[Double])]], sub: Int): Column = {
    val (keysPos, _, mat) = flat(books, sub)
    ExpressionUtils.column(PqCodes(ExpressionUtils.expression(v), keysPos, mat,
      books.length, sub, books.head.length, returnInt = true))
  }

  /** m assigned centroid IDS (array<bigint>) — the Lloyd-assignment form */
  def pqCodeIds(v: Column, books: Seq[Seq[(Long, Seq[Double])]], sub: Int): Column = {
    val (_, keysId, mat) = flat(books, sub)
    ExpressionUtils.column(PqCodes(ExpressionUtils.expression(v), keysId, mat,
      books.length, sub, books.head.length, returnInt = false))
  }

  /** round6((M·v)·scale) as array<double> — rows given as Seq of dim-length
    * coefficient rows (row order = output component order)
    */
  def matVecRound6(v: Column, rowsCoef: Seq[Array[Double]], scale: Double = 1.0): Column = {
    val rows = rowsCoef.length
    val dim = rowsCoef.head.length
    val mat = new Array[Double](rows * dim)
    rowsCoef.zipWithIndex.foreach { case (r, j) =>
      require(r.length == dim, s"row $j length ${r.length} != $dim")
      System.arraycopy(r, 0, mat, j * dim, dim)
    }
    ExpressionUtils.column(MatVecRound6(ExpressionUtils.expression(v), mat, rows, dim, scale))
  }

  /** subspace-`s` ADC distance table (array<double>, code-position order) */
  def pqDistTable(
      v: Column, books: Seq[Seq[(Long, Seq[Double])]], s: Int, sub: Int): Column = {
    val sorted = books(s).sortBy(_._1)
    val nCodes = sorted.length
    val mat = new Array[Double](nCodes * sub)
    sorted.zipWithIndex.foreach { case ((_, cv), pos) =>
      require(cv.length == sub, s"centroid ($s,pos=$pos) dim ${cv.length} != $sub")
      cv.indices.foreach(j => mat(pos * sub + j) = cv(j))
    }
    ExpressionUtils.column(PqDistTable(ExpressionUtils.expression(v), mat, s, sub, nCodes))
  }
}
