package graft.functions

import java.nio.ByteBuffer

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Expression, GenericInternalRow}
import org.apache.spark.sql.catalyst.expressions.aggregate.TypedImperativeAggregate
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.graftbridge.{GraftSql => ExpressionUtils}
import org.apache.spark.sql.types._

/** Per-partition upper-triangle moment buffer: one long slot per (i ≤ j)
  * dim pair for each of the five sums, plus the non-null contribution
  * counters that reproduce SQL `sum`'s all-null → NULL groups, plus the
  * row count (every non-null vector contributes to EVERY pair exactly
  * once, so one counter stands in for the per-group `count(lit(1))`).
  */
case class CovMomentsBuffer(
    var rows: Long,
    sx: Array[Long], sy: Array[Long], sxy: Array[Long],
    sxx: Array[Long], syy: Array[Long],
    cx: Array[Long], cy: Array[Long], cxy: Array[Long])

/** The embedding-covariance moment fold as ONE aggregate — r19.
  *
  * The family's previous forms streamed dim²/2 rows PER VECTOR into a hash
  * aggregate (first as a posexplode + vec_id self-join, then as the
  * streaming twin's nested-transform expansion): ~4.2 M generated rows at
  * 64 dims / sf0.1 and ~17 M at the 256-dim gate, all allocation. This
  * aggregate walks each vector once in a primitive loop — dim²/2
  * multiply-adds straight into per-partition long arrays, no intermediate
  * rows at all — and emits the (i, j, n, sx, sy, sxy, sxx, syy) upper
  * triangle as one array, exploded back to rows by the caller.
  *
  * Bit-parity with the SQL form it replaces, by construction:
  *   - x6 = `cast(round(cast(x as double) * 1e6) as bigint)` per element:
  *     BigDecimal HALF_UP at scale 0 (the same replication CentroidExprs/
  *     PqExprs pin by law), computed once per element per row.
  *   - all five sums are long additions of exactly the same terms, and
  *     long sums are order-independent; `Math.addExact`/`multiplyExact`
  *     reproduce ANSI's loud overflow instead of wrapping.
  *   - `n` = rows whose vector is non-null (each contributes every pair
  *     once — the exploded `count(lit(1))`); a NULL element skips exactly
  *     the sums its NULL would have skipped, and a pair whose contributions
  *     were all NULL yields NULL sums like SQL `sum`.
  *   - a vector shorter than `dim` fails loudly, mirroring ANSI
  *     `element_at` past the end; non-finite elements fail like ANSI
  *     `cast(round(NaN) as bigint)`.
  *   - empty input yields an empty array (SQL groupBy emits no groups).
  */
case class CovMomentsAgg(
    child: Expression, dim: Int,
    mutableAggBufferOffset: Int = 0, inputAggBufferOffset: Int = 0)
  extends TypedImperativeAggregate[CovMomentsBuffer] {

  require(dim >= 1, s"graft_cov_moments: dim must be >= 1, got $dim")
  private val nPairs = dim * (dim + 1) / 2

  override def children: Seq[Expression] = Seq(child)
  override protected def withNewChildrenInternal(
      newChildren: IndexedSeq[Expression]): CovMomentsAgg =
    copy(child = newChildren(0))

  override def checkInputDataTypes(): org.apache.spark.sql.catalyst.analysis.TypeCheckResult = {
    import org.apache.spark.sql.catalyst.analysis.TypeCheckResult._
    child.dataType match {
      case ArrayType(DoubleType | FloatType, _) => TypeCheckSuccess
      case other => TypeCheckFailure(
        s"graft_cov_moments needs array<double|float>, got ${other.catalogString}")
    }
  }

  private lazy val elemIsFloat = child.dataType match {
    case ArrayType(FloatType, _) => true
    case _ => false
  }

  override def createAggregationBuffer(): CovMomentsBuffer =
    CovMomentsBuffer(0L,
      new Array[Long](nPairs), new Array[Long](nPairs), new Array[Long](nPairs),
      new Array[Long](nPairs), new Array[Long](nPairs),
      new Array[Long](nPairs), new Array[Long](nPairs), new Array[Long](nPairs))

  // Spark `cast(round(x, 0) as bigint)` for doubles: BigDecimal HALF_UP;
  // non-finite and out-of-long-range fail loudly like the ANSI cast would
  // (doubleValue().toLong saturates silently — and a saturation to
  // Long.MinValue would collide with the NULL sentinel below)
  @inline private def x6Of(x: Double): Long = {
    if (java.lang.Double.isNaN(x) || java.lang.Double.isInfinite(x))
      throw new ArithmeticException(
        s"graft_cov_moments: non-finite element $x cannot cast to bigint (ANSI)")
    val scaled = x * 1e6
    if (scaled >= 9.223372036854776e18 || scaled <= -9.223372036854776e18)
      throw new ArithmeticException(
        s"graft_cov_moments: element $x overflows bigint after x1e6 scaling (ANSI)")
    java.math.BigDecimal.valueOf(scaled)
      .setScale(0, java.math.RoundingMode.HALF_UP).doubleValue().toLong
  }

  override def update(b: CovMomentsBuffer, input: InternalRow): CovMomentsBuffer = {
    val v = child.eval(input)
    if (v == null) return b
    val a = v.asInstanceOf[ArrayData]
    if (a.numElements() < dim)
      throw new ArrayIndexOutOfBoundsException(
        s"graft_cov_moments: vector of ${a.numElements()} elements, need $dim " +
          "(ANSI element_at past the end)")
    b.rows += 1
    // scale once per element; MinValue marks NULL (true x6 values are
    // bounded by round(|x|·1e6) which never reaches Long.MinValue)
    val x6 = new Array[Long](dim)
    var i = 0
    while (i < dim) {
      x6(i) = if (a.isNullAt(i)) Long.MinValue
        else x6Of(if (elemIsFloat) a.getFloat(i).toDouble else a.getDouble(i))
      i += 1
    }
    var k = 0
    i = 0
    while (i < dim) {
      val xi = x6(i)
      val xiOk = xi != Long.MinValue
      var j = i
      while (j < dim) {
        val yj = x6(j)
        val yjOk = yj != Long.MinValue
        if (xiOk) {
          b.sx(k) = Math.addExact(b.sx(k), xi)
          b.sxx(k) = Math.addExact(b.sxx(k), Math.multiplyExact(xi, xi))
          b.cx(k) += 1
        }
        if (yjOk) {
          b.sy(k) = Math.addExact(b.sy(k), yj)
          b.syy(k) = Math.addExact(b.syy(k), Math.multiplyExact(yj, yj))
          b.cy(k) += 1
        }
        if (xiOk && yjOk) {
          b.sxy(k) = Math.addExact(b.sxy(k), Math.multiplyExact(xi, yj))
          b.cxy(k) += 1
        }
        k += 1
        j += 1
      }
      i += 1
    }
    b
  }

  override def merge(a: CovMomentsBuffer, b: CovMomentsBuffer): CovMomentsBuffer = {
    a.rows += b.rows
    var k = 0
    while (k < nPairs) {
      a.sx(k) = Math.addExact(a.sx(k), b.sx(k))
      a.sy(k) = Math.addExact(a.sy(k), b.sy(k))
      a.sxy(k) = Math.addExact(a.sxy(k), b.sxy(k))
      a.sxx(k) = Math.addExact(a.sxx(k), b.sxx(k))
      a.syy(k) = Math.addExact(a.syy(k), b.syy(k))
      a.cx(k) += b.cx(k); a.cy(k) += b.cy(k); a.cxy(k) += b.cxy(k)
      k += 1
    }
    a
  }

  override def eval(b: CovMomentsBuffer): Any = {
    if (b.rows == 0L) return new GenericArrayData(Array.empty[Any])
    val out = new Array[Any](nPairs)
    var k = 0
    var i = 0
    while (i < dim) {
      var j = i
      while (j < dim) {
        out(k) = new GenericInternalRow(Array[Any](
          i, j, b.rows,
          if (b.cx(k) > 0) b.sx(k) else null,
          if (b.cy(k) > 0) b.sy(k) else null,
          if (b.cxy(k) > 0) b.sxy(k) else null,
          if (b.cx(k) > 0) b.sxx(k) else null,
          if (b.cy(k) > 0) b.syy(k) else null))
        k += 1
        j += 1
      }
      i += 1
    }
    new GenericArrayData(out)
  }

  override def serialize(b: CovMomentsBuffer): Array[Byte] = {
    val buf = ByteBuffer.allocate(8 + 8 * 8 * nPairs)
    buf.putLong(b.rows)
    Seq(b.sx, b.sy, b.sxy, b.sxx, b.syy, b.cx, b.cy, b.cxy).foreach { arr =>
      var k = 0
      while (k < nPairs) { buf.putLong(arr(k)); k += 1 }
    }
    buf.array()
  }

  override def deserialize(bytes: Array[Byte]): CovMomentsBuffer = {
    val buf = ByteBuffer.wrap(bytes)
    val rows = buf.getLong
    def arr(): Array[Long] = Array.fill[Long](nPairs)(buf.getLong)
    CovMomentsBuffer(rows, arr(), arr(), arr(), arr(), arr(), arr(), arr(), arr())
  }

  override def dataType: DataType = CovMomentsAgg.resultType
  override def nullable: Boolean = false
  override def withNewMutableAggBufferOffset(o: Int): CovMomentsAgg =
    copy(mutableAggBufferOffset = o)
  override def withNewInputAggBufferOffset(o: Int): CovMomentsAgg =
    copy(inputAggBufferOffset = o)
  override def prettyName: String = "graft_cov_moments"
}

object CovMomentsAgg {
  val resultType: DataType = ArrayType(StructType(Seq(
    StructField("i", IntegerType, false), StructField("j", IntegerType, false),
    StructField("n", LongType, false),
    StructField("sx", LongType, true), StructField("sy", LongType, true),
    StructField("sxy", LongType, true),
    StructField("sxx", LongType, true), StructField("syy", LongType, true))),
    containsNull = false)

  def covMoments(vec: Column, dim: Int): Column =
    ExpressionUtils.column(
      CovMomentsAgg(ExpressionUtils.expression(vec), dim).toAggregateExpression())
}
