package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{GraftSql => ExpressionUtils}
import org.apache.spark.sql.types.{ArrayType, DataType, LongType}

/** Broadcast-matrix top-n centroid selection — the production-centroid-count
  * variant of the literal-struct argmax in [[graft.ops.Similarity]].
  *
  * The literal path inlines nCents×dim literals into one expression tree:
  * optimal at nCents≈16–256, but thousands of centroids × hundreds of dims
  * would blow past Janino's constant-pool/method-size limits and fall back to
  * interpreted evaluation (or fail analysis). Here the centroid matrix rides
  * along as ONE flat `Array[Double]` reference object (the in-plan analog of
  * a broadcast variable — serialized once per task, not per row), and the
  * whole scan stays a single codegen'd kernel call regardless of nCents.
  *
  * Semantics are bit-identical to the literal path: per-centroid cosine =
  * left-to-right dot / (|v|·|c|) rounded HALF_UP to 6 decimals (the same
  * `BigDecimal.valueOf(...).setScale(6, HALF_UP)` Spark's `round` compiles
  * to), ranked cos desc with smaller-cent-id tiebreak. Centroid norms are
  * precomputed once at plan time. Zero-norm vectors (cos = NaN) are out of
  * contract — the literal path's NaN-max ordering and this kernel's
  * NaN-never-wins differ there.
  *
  * Returns `array<bigint>` of the `n` best centroid ids; `n = 1` is
  * assignment, `n = nprobe` is probe selection — one expression serves both
  * IVF use sites.
  */
case class TopCentroids(
    child: Expression, centIds: Array[Long], centsFlat: Array[Double],
    dim: Int, n: Int)
  extends UnaryExpression {

  require(dim >= 1 && centIds.length * dim == centsFlat.length,
    s"graft_top_centroids: matrix shape ${centsFlat.length} != ${centIds.length} ids x $dim dims")
  require(n >= 1 && n <= centIds.length,
    s"graft_top_centroids: n ($n) must be in [1, ${centIds.length}]")

  override def dataType: DataType = ArrayType(LongType, containsNull = false)

  /** sqrt of each centroid's left-to-right self-dot, computed once per plan */
  @transient private lazy val cnorms: Array[Double] = {
    val out = new Array[Double](centIds.length)
    var c = 0
    while (c < centIds.length) {
      var acc = 0.0
      var i = 0
      while (i < dim) { val x = centsFlat(c * dim + i); acc += x * x; i += 1 }
      out(c) = math.sqrt(acc)
      c += 1
    }
    out
  }

  // identical to Spark's Round codegen for double (non-finite passthrough)
  private def round6(x: Double): Double =
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x)) x
    else java.math.BigDecimal.valueOf(x)
      .setScale(6, java.math.RoundingMode.HALF_UP).doubleValue()

  /** top-n (rounded cos desc, cent id asc) for one vector. Insertion into two
    * fixed n-slot arrays; candidates arrive in ascending-id order and only a
    * STRICTLY greater cosine displaces, so equal-cosine ties keep the smaller
    * id — the literal path's (cos, -cid) struct-max order exactly.
    */
  def compute(v: ArrayData): ArrayData = {
    val vlen = v.numElements()
    var vacc = 0.0
    var i = 0
    while (i < vlen) { val x = v.getDouble(i); vacc += x * x; i += 1 }
    val vnorm = math.sqrt(vacc)
    val m = math.min(vlen, dim)
    val bestCos = Array.fill(n)(Double.NegativeInfinity)
    val bestId = new Array[Long](n)
    var c = 0
    while (c < centIds.length) {
      var acc = 0.0
      var j = 0
      while (j < m) { acc += v.getDouble(j) * centsFlat(c * dim + j); j += 1 }
      val cos = round6(acc / (vnorm * cnorms(c)))
      var pos = 0
      while (pos < n && !(cos > bestCos(pos))) pos += 1
      if (pos < n) {
        var s = n - 1
        while (s > pos) { bestCos(s) = bestCos(s - 1); bestId(s) = bestId(s - 1); s -= 1 }
        bestCos(pos) = cos
        bestId(pos) = centIds(c)
      }
      c += 1
    }
    new GenericArrayData(bestId)
  }

  override def nullSafeEval(input: Any): Any = compute(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // the kernel object (matrix + norms) is a codegen reference: one virtual
    // call per row, primitive loops inside, zero Janino constants per centroid
    val ref = ctx.addReferenceObj("topCentroids", this)
    nullSafeCodeGen(ctx, ev, v =>
      s"${ev.value} = (org.apache.spark.sql.catalyst.util.ArrayData) $ref.compute($v);")
  }

  // case-class equals/hashCode over Array fields compare by reference, which
  // would make two structurally identical instances never semanticEquals —
  // defeating Catalyst common-subexpression elimination when the same
  // centroid set appears twice in a plan. Compare matrix CONTENT instead.
  override def equals(other: Any): Boolean = other match {
    case t: TopCentroids =>
      child == t.child && dim == t.dim && n == t.n &&
        java.util.Arrays.equals(centIds, t.centIds) &&
        java.util.Arrays.equals(centsFlat, t.centsFlat)
    case _ => false
  }
  override def hashCode(): Int =
    java.util.Objects.hash(child, Integer.valueOf(dim), Integer.valueOf(n),
      Integer.valueOf(java.util.Arrays.hashCode(centIds)),
      Integer.valueOf(java.util.Arrays.hashCode(centsFlat)))

  override protected def withNewChildInternal(newChild: Expression): TopCentroids =
    copy(child = newChild)
  override def prettyName: String = "graft_top_centroids"
}

object CentroidExprs {
  /** `array<bigint>` of the `n` nearest centroid ids of `vec` (rounded cos
    * desc, id asc); centroids are flattened in ascending-id order.
    */
  def topCentroids(vec: Column, cents: Seq[(Long, Seq[Double])], n: Int): Column = {
    require(cents.nonEmpty, "graft_top_centroids: empty centroid set")
    val sorted = cents.sortBy(_._1)
    val dim = sorted.head._2.length
    // clamp like the literal path's slice(): nprobe > nCents means "all"
    ExpressionUtils.column(TopCentroids(
      ExpressionUtils.expression(vec), sorted.map(_._1).toArray,
      sorted.flatMap(_._2).toArray, dim, math.min(n, sorted.size)))
  }
}
