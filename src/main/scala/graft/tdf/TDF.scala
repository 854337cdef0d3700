package graft.tdf

import scala.collection.mutable

import org.apache.spark.sql.{Column, DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

import graft.functions.{Histogram, HistogramAggregator}

/** Lazy result proxy — the Spark analog of the reference's
  * `TActionResultProxy<T>` (reference: TDataFrame.hxx:170-236): first access
  * triggers the shared run of every action booked on the same context; results
  * stay valid afterwards, and further bookings start a fresh batch
  * (reference re-booking semantics, TDataFrame.hxx test_misc TEST 11).
  */
final class Result[T] private[tdf] (ctx: BookingContext) {
  @volatile private[tdf] var v: Option[T] = None
  def isReady: Boolean = v.isDefined
  def apply(): T = {
    if (v.isEmpty) ctx.run()
    v.getOrElse(throw new IllegalStateException("booked action was not filled by the run"))
  }
  /** alias mirroring the reference's dereference */
  def value: T = apply()
}

private[tdf] sealed trait Step
private[tdf] final case class FilterStep(name: Option[String], pred: Column) extends Step
private[tdf] final case class DefineStep(name: String, expr: Column) extends Step

private[tdf] sealed trait ActionSpec
private[tdf] case object CountSpec extends ActionSpec
private[tdf] final case class SumSpec(col: String) extends ActionSpec
private[tdf] final case class MinSpec(col: String) extends ActionSpec
private[tdf] final case class MaxSpec(col: String) extends ActionSpec
private[tdf] final case class MeanSpec(col: String) extends ActionSpec
private[tdf] final case class TakeSpec(col: String) extends ActionSpec
private[tdf] final case class HistoSpec(
    col: String, nbins: Int, range: Option[(Double, Double)],
    weight: Option[String] = None) extends ActionSpec
private[tdf] case object ReportSpec extends ActionSpec
private[tdf] final case class ForeachSpec(
    cols: Seq[String], casts: Seq[Option[DataType]], f: (Int, Row) => Unit)
    extends ActionSpec

private[tdf] final case class Booked(steps: Vector[Step], spec: ActionSpec, result: Result[Any])

/** Shared root registry of booked (plan, action) pairs — the analog of the
  * reference's `TDataFrameImpl` (TDataFrame.hxx:1336-1351, run loop
  * :1362-1421). On first result access it compiles every booked aggregating
  * action into ONE Spark job over ONE scan, using conditional aggregation
  * (`agg(f(when(pred_i, x_i)))` over the common root with all derived columns
  * attached). Auto-ranged histograms need a range pre-pass: their min/max ride
  * along in the first job, then all of them share a single second job. This is
  * the piece Spark does not provide across actions (one job per action is the
  * default); everything inside the fused plan — pushdown, pruning, partial
  * aggregation, codegen — is Catalyst's.
  */
final class BookingContext private[tdf] (val base: DataFrame) {
  // Frame identity captured eagerly so it is still printable after the owning
  // session has been stopped (used by the dangling-frame guard below).
  private val frameDesc = {
    val cs = base.columns
    s"TDataFrame(${cs.take(4).mkString(", ")}${if (cs.length > 4) ", …" else ""})"
  }
  private val pending = mutable.ArrayBuffer.empty[Booked]
  private[tdf] var compat: Boolean = false

  private[tdf] def book[T](steps: Vector[Step], spec: ActionSpec): Result[T] = synchronized {
    // same lock as run(): a booking raced against a concurrent trigger must
    // not be cleared unfilled
    val r = new Result[T](this)
    pending += Booked(steps, spec, r.asInstanceOf[Result[Any]])
    r
  }

  private def fill[T](r: Result[Any], value: T): Unit = r.v = Some(value)

  /** Predicate for a node = conjunction of its filter chain (true if none). */
  private def predOf(steps: Vector[Step]): Column =
    steps.collect { case FilterStep(_, p) => p }
      .reduceOption(_ && _).getOrElse(lit(true))

  /** All defines across booked nodes, in first-occurrence order. Returns None
    * on a name conflict (same name, semantically different expressions on
    * sibling branches) — callers then fall back to per-action jobs.
    */
  private def mergedDefines(booked: Seq[Booked]): Option[Vector[DefineStep]] = {
    val out = mutable.LinkedHashMap.empty[String, DefineStep]
    var conflict = false
    val it = booked.iterator.flatMap(_.steps.iterator)
    while (!conflict && it.hasNext) {
      it.next() match {
        case d @ DefineStep(n, e) =>
          out.get(n) match {
            case None => out(n) = d
            case Some(prev) =>
              // Semantic comparison via Column equality (normalized column
              // nodes, Origin stripped): structurally equal native
              // expressions merge; a UDF keeps its function object in the
              // node, so two DIFFERENT typed lambdas are unequal even though
              // both render as `UDF(x)` — textual toString comparison would
              // silently merge them and every action on the second fork would
              // compute with the first fork's function. Different → per-action
              // fallback (flagged loop, not a non-local return — this sits on
              // the fusion hot path).
              if (prev.expr != e) conflict = true
          }
        case _ => ()
      }
    }
    if (conflict) None else Some(out.values.toVector)
  }

  private def withDefines(defines: Seq[DefineStep]): DataFrame =
    defines.foldLeft(base) { case (df, DefineStep(n, e)) => df.withColumn(n, e) }

  /** Double-valued view of a column for Min/Max/Mean/Sum; arrays are handled
    * elementwise (the reference's container overloads, TDataFrame.hxx:451-459).
    */
  private def isArray(wide: DataFrame, c: String): Boolean =
    wide.schema(c).dataType.isInstanceOf[ArrayType]

  private def dvalOf(wide: DataFrame, c: String): Column =
    if (isArray(wide, c)) col(c).cast(ArrayType(DoubleType)) else col(c).cast(DoubleType)

  /** Compile one booked action into (aggregate columns, result filler).
    * `histoInput`: name of the pre-projected input column for fixed-range
    * histograms — the imperative aggregate then reads a plain attribute while
    * whole-stage codegen computes the conditional value (measurably faster
    * than interpreting the `when` tree per row inside the aggregate).
    */
  private def compile(
      b: Booked, wide: DataFrame, id: Int,
      histoInput: Option[String] = None): (Seq[Column], Row => Unit) = {
    val pred = predOf(b.steps)
    def a(i: Int) = s"__a${id}_$i"
    def dcol(c: String): Column = dvalOf(wide, c)
    b.spec match {
      case CountSpec =>
        (Seq(count(when(pred, lit(1))).as(a(0))),
          row => fill(b.result, row.getAs[Long](a(0))))
      case SumSpec(c) =>
        val v = if (isArray(wide, c))
          sum(when(pred, aggregate(dcol(c), lit(0.0), _ + _)))
        else sum(when(pred, dcol(c)))
        (Seq(coalesce(v, lit(0.0)).as(a(0))),
          row => fill(b.result, row.getAs[Double](a(0))))
      case MinSpec(c) =>
        val v = if (isArray(wide, c)) min(when(pred, array_min(dcol(c)))) else min(when(pred, dcol(c)))
        val dflt = if (compat) Double.MaxValue else Double.NaN
        (Seq(coalesce(v, lit(dflt)).as(a(0))),
          row => fill(b.result, row.getAs[Double](a(0))))
      case MaxSpec(c) =>
        val v = if (isArray(wide, c)) max(when(pred, array_max(dcol(c)))) else max(when(pred, dcol(c)))
        // reference quirk: empty Max → numeric_limits<double>::min() (tiniest
        // positive double), tests/regression_zeroentries.cxx:36
        val dflt = if (compat) java.lang.Double.MIN_NORMAL else Double.NaN
        (Seq(coalesce(v, lit(dflt)).as(a(0))),
          row => fill(b.result, row.getAs[Double](a(0))))
      case MeanSpec(c) =>
        val (s, n) =
          if (isArray(wide, c))
            (sum(when(pred, aggregate(dcol(c), lit(0.0), _ + _))),
              sum(when(pred, size(col(c)).cast(LongType))))
          else (sum(when(pred, dcol(c))), count(when(pred, dcol(c))))
        (Seq(s.as(a(0)), n.as(a(1))), { row =>
          val cnt = Option(row.getAs[Any](a(1))).map(_.toString.toLong).getOrElse(0L)
          val mean =
            if (cnt == 0L) { if (compat) 0.0 else Double.NaN }
            else row.getAs[Double](a(0)) / cnt
          fill(b.result, mean)
        })
      case TakeSpec(c) =>
        (Seq(collect_list(when(pred, col(c))).as(a(0))),
          row => fill(b.result, row.getSeq[Any](row.fieldIndex(a(0)))))
      case HistoSpec(c, nbins, Some((lo, hi)), weightCol) =>
        // native TypedImperativeAggregate (handles double and array<double>)
        val in = histoInput.map(col).getOrElse(when(pred, dcol(c)))
        val agg = weightCol match {
          case Some(wc) => graft.functions.HistogramAggExpr.histoWeighted(
            in, when(pred, col(wc)).cast("long"), nbins, lo, hi)
          case None => graft.functions.HistogramAggExpr.histo(in, nbins, lo, hi)
        }
        (Seq(agg.as(a(0))), { row =>
          val r = row.getStruct(row.fieldIndex(a(0)))
          fill(b.result, structToHistogram(r))
        })
      case HistoSpec(_, _, None, _) =>
        throw new IllegalStateException("auto-range histo must be range-resolved before compile")
      case _: ForeachSpec =>
        throw new IllegalStateException("Foreach actions are executed by runFused, not compiled")
      case ReportSpec =>
        val filters = b.steps.collect { case f: FilterStep => f }
        if (filters.isEmpty)
          // no cuts → empty report; a dummy count keeps the fused agg non-empty
          return (Seq(count(lit(1)).as(a(0))), _ => fill(b.result, Seq.empty[CutInfo]))
        val cols = filters.zipWithIndex.flatMap { case (_, i) =>
          val upTo = filters.take(i + 1).map(_.pred).reduce(_ && _)
          val before = filters.take(i).map(_.pred).reduceOption(_ && _).getOrElse(lit(true))
          Seq(count(when(upTo, lit(1))).as(a(2 * i)), count(when(before, lit(1))).as(a(2 * i + 1)))
        }
        (cols, { row =>
          val rep = filters.zipWithIndex.map { case (f, i) =>
            CutInfo(f.name.getOrElse(s"filter_$i"),
              row.getAs[Long](a(2 * i)), row.getAs[Long](a(2 * i + 1)))
          }
          fill(b.result, rep)
        })
    }
  }

  private def structToHistogram(r: Row): Histogram =
    Histogram(
      r.getAs[Int]("nbins"), r.getAs[Double]("lo"), r.getAs[Double]("hi"),
      r.getSeq[Long](r.fieldIndex("counts")).toArray,
      r.getAs[Long]("underflow"), r.getAs[Long]("overflow"),
      r.getAs[Long]("entries"), r.getAs[Double]("sumx"), r.getAs[Double]("sumx2"))

  /** Execute every pending action; ideally one job (plus one shared job for
    * auto-ranged histograms). Clears the pending list afterwards.
    */
  private[tdf] def run(): Unit = synchronized {
    if (pending.isEmpty) return
    // Dangling-frame parity (reference tests/regression_invalidref.cxx:10-18,
    // TDataFrame.hxx:994-1001): dereferencing a booked result after the owning
    // session is gone must be a clear engine-level error, not a raw Spark
    // exception from deep inside the runtime.
    if (base.sparkSession.sparkContext.isStopped)
      throw new IllegalStateException(
        s"$frameDesc went out of scope: the owning SparkSession was stopped " +
          "before this booked result was dereferenced — trigger the event loop " +
          "(dereference the result) while the session is alive")
    val batch = pending.toVector
    pending.clear()
    mergedDefines(batch) match {
      case Some(defines) => runFused(batch, defines)
      case None => batch.foreach(b => runFused(Vector(b), mergedDefines(Seq(b)).get))
    }
  }

  private def runFused(allBatch: Vector[Booked], defines: Vector[DefineStep]): Unit = {
    val base = withDefines(defines)
    val (foreaches, batch) = allBatch.partition(_.spec.isInstanceOf[ForeachSpec])

    // Pre-project fixed-range histogram inputs (conditional value computed in
    // whole-stage codegen; the imperative aggregate reads a plain attribute).
    val histoInputs = mutable.Map.empty[Int, String]
    val wide = batch.zipWithIndex.foldLeft(base) {
      case (df, (Booked(steps, HistoSpec(c, _, Some(_), _), _), i)) =>
        val name = s"__hin$i"
        histoInputs(i) = name
        df.withColumn(name, when(predOf(steps), dvalOf(base, c)))
      case (df, _) => df
    }

    // Pass-1 aggregates: every fixed action, plus (min,max) probes for
    // auto-ranged histos (mirrors the reference's deferred-axis FillOperation,
    // TDataFrame.hxx:410-480, as a two-pass plan).
    val fixed = mutable.ArrayBuffer.empty[(Seq[Column], Row => Unit)]
    val autos = mutable.ArrayBuffer.empty[(Booked, String, String)] // (action, minAlias, maxAlias)
    batch.zipWithIndex.foreach {
      case (b @ Booked(steps, HistoSpec(c, _, None, _), _), i) =>
        val pred = predOf(steps)
        val (mn, mx) = (s"__hmin$i", s"__hmax$i")
        val base2 =
          if (isArray(wide, c)) (array_min(col(c)).cast(DoubleType), array_max(col(c)).cast(DoubleType))
          else (col(c).cast(DoubleType), col(c).cast(DoubleType))
        fixed += ((Seq(min(when(pred, base2._1)).as(mn), max(when(pred, base2._2)).as(mx)), _ => ()))
        autos += ((b, mn, mx))
      case (b, i) => fixed += compile(b, wide, i, histoInputs.get(i))
    }
    // If side-effecting Foreach actions share the batch with aggregates,
    // persist the common frame so the scan is shared across the jobs
    // (reference: every booked action runs in the same loop as the Foreach
    // trigger, TDFGuide.md:288-291).
    val shareScan = foreaches.nonEmpty && batch.nonEmpty
    if (shareScan) { wide.persist(); () }
    try {
      if (batch.nonEmpty) runAggregates(batch, wide, fixed, autos)
      foreaches.foreach { case Booked(steps, ForeachSpec(cols, casts, f), result) =>
        // UpCast, not cast: widening (int→double) coerces, but a LOSSY
        // narrowing (double column into an Int lambda) fails analysis on the
        // driver instead of silently truncating fractions per row
        val sel = if (casts.isEmpty) cols.map(col)
          else cols.zip(casts).map {
            case (c, Some(dt)) =>
              org.apache.spark.sql.graftbridge.GraftSql.column(
                org.apache.spark.sql.catalyst.expressions.UpCast(
                  org.apache.spark.sql.graftbridge.GraftSql.expression(col(c)), dt))
            case (c, None) => col(c) // opaque argument type: raw passthrough
          }
        wide.where(predOf(steps)).select(sel: _*)
          .foreachPartition { it: Iterator[Row] =>
            val slot = org.apache.spark.TaskContext.getPartitionId()
            it.foreach(r => f(slot, r))
          }
        fill(result, ())
      }
    } finally if (shareScan) { wide.unpersist(); () }
  }

  private def runAggregates(
      batch: Vector[Booked], wide: DataFrame,
      fixed: mutable.ArrayBuffer[(Seq[Column], Row => Unit)],
      autos: mutable.ArrayBuffer[(Booked, String, String)]): Unit = {
    val aggCols = fixed.flatMap(_._1).toSeq
    val row = wide.agg(aggCols.head, aggCols.tail: _*).collect()(0)
    fixed.foreach { case (_, f) => f(row) }

    if (autos.nonEmpty) {
      // Resolve ranges (TH1-style padding for the degenerate lo==hi case),
      // then one more fused job for all auto histos.
      val resolved = autos.toVector.map { case (b, mnA, mxA) =>
        val mn = Option(row.getAs[Any](mnA)).map(_.asInstanceOf[Double]).getOrElse(0.0)
        val mx = Option(row.getAs[Any](mxA)).map(_.asInstanceOf[Double]).getOrElse(1.0)
        val (lo, hi) = if (mn == mx) (mn - 0.5, mx + 0.5) else (mn, mx + (mx - mn) * 1e-9)
        val HistoSpec(c, nbins, _, wc) = b.spec: @unchecked
        Booked(b.steps, HistoSpec(c, nbins, Some((lo, hi)), wc), b.result)
      }
      val wide2 = resolved.zipWithIndex.foldLeft(wide) { case (df, (b, i)) =>
        val HistoSpec(c, _, _, _) = b.spec: @unchecked
        df.withColumn(s"__ain$i", when(predOf(b.steps), dvalOf(wide, c)))
      }
      val compiled = resolved.zipWithIndex.map { case (b, i) =>
        compile(b, wide2, i, Some(s"__ain$i"))
      }
      val cols2 = compiled.flatMap(_._1)
      val row2 = wide2.agg(cols2.head, cols2.tail: _*).collect()(0)
      compiled.foreach { case (_, f) => f(row2) }
    }
  }
}

/** One line of a cut-flow report (reference planned op, TDFGuide.md:269-270). */
final case class CutInfo(name: String, pass: Long, all: Long) {
  def efficiency: Double = if (all == 0) 0.0 else pass.toDouble / all
}

/** The facade — Spark analog of `TDataFrameInterface` (TDataFrame.hxx:706-1100).
  * Immutable: every transformation returns a new TDF sharing the same
  * BookingContext, so call-graph forking (reference TDFGuide.md:235-261) is the
  * natural usage. Transformations are recorded as lineage steps; actions book
  * onto the shared context and return lazy [[Result]]s; the first dereference
  * compiles every booked action into one shared scan.
  */
final class TDF private (
    private[tdf] val ctx: BookingContext,
    private[tdf] val steps: Vector[Step],
    val defaultColumns: Seq[String]) {

  private def spark: SparkSession = ctx.base.sparkSession

  /** Columns visible at this node: physical + path defines. */
  def columns: Seq[String] =
    ctx.base.columns.toSeq ++ steps.collect { case DefineStep(n, _) => n }

  // ---- transformations ------------------------------------------------------

  def Filter(pred: Column): TDF = new TDF(ctx, steps :+ FilterStep(None, pred), defaultColumns)
  /** SQL-string predicate convenience: `d.Filter("z > 1000")` */
  def Filter(predSql: String): TDF = Filter(expr(predSql))
  def Filter(name: String, pred: Column): TDF =
    new TDF(ctx, steps :+ FilterStep(Some(name), pred), defaultColumns)

  /** Reference `AddBranch` (later `Define`): lazy derived column; throws on
    * collision with an existing column (TDataFrame.hxx:290-297).
    */
  def Define(name: String, expr: Column): TDF = {
    if (columns.contains(name))
      throw new IllegalArgumentException(s"branch '$name' already present")
    new TDF(ctx, steps :+ DefineStep(name, expr), defaultColumns)
  }
  def AddBranch(name: String, expr: Column): TDF = Define(name, expr)
  /** SQL-string expression convenience: `d.Define("z", "price * (1-disc)")` */
  def Define(name: String, exprSql: String): TDF = Define(name, expr(exprSql))

  def WithDefaultColumns(cols: Seq[String]): TDF = new TDF(ctx, steps, cols)

  // ---- typed-lambda surface -------------------------------------------------
  // The reference's primary user API is typed callables + a branch list, with
  // argument types deduced via TFunctionTraits (TDataFrame.hxx:44-81; usage
  // README.md:10-16; shapes exercised in tests/test_functiontraits.cxx:24-141).
  // Scala function values cover every reference callable shape — lambda,
  // eta-expanded free function/method, and function object (FunctionN
  // instance) — so one overload set serves all of them. Lambdas are lowered
  // to Spark UDFs with TypeTag-derived schemas; the column list's arity is
  // validated against the callable's arity (reference PickBranchNames arity
  // errors, TDataFrame.hxx:299-314), falling back to the default column list
  // when omitted.
  //
  // Scale note: a UDF is an opaque black box to Catalyst — no predicate
  // pushdown through a lambda Filter, no constant folding inside a lambda
  // Define. The native `Column` overloads above are the fast path; the typed
  // surface exists for API parity and for genuinely imperative row logic.

  private def pickN(cols: Seq[String], n: Int, op: String): Seq[String] = {
    val cs = if (cols.nonEmpty) cols else defaultColumns
    if (cs.size != n)
      throw new IllegalArgumentException(
        s"$op: callable takes $n column(s) but ${if (cols.nonEmpty) "column list"
          else "default column list"} has ${cs.size}")
    cs
  }

  import scala.reflect.runtime.universe.TypeTag

  def Filter[A: TypeTag](f: A => Boolean, cols: Seq[String] = Nil): TDF = {
    val cs = pickN(cols, 1, "Filter")
    Filter(udf(f).apply(col(cs(0))))
  }
  def Filter[A: TypeTag, B: TypeTag](f: (A, B) => Boolean, cols: Seq[String]): TDF = {
    val cs = pickN(cols, 2, "Filter")
    Filter(udf(f).apply(col(cs(0)), col(cs(1))))
  }
  def Filter[A: TypeTag, B: TypeTag, C: TypeTag](
      f: (A, B, C) => Boolean, cols: Seq[String]): TDF = {
    val cs = pickN(cols, 3, "Filter")
    Filter(udf(f).apply(col(cs(0)), col(cs(1)), col(cs(2))))
  }
  def Filter[A: TypeTag, B: TypeTag, C: TypeTag, D: TypeTag](
      f: (A, B, C, D) => Boolean, cols: Seq[String]): TDF = {
    val cs = pickN(cols, 4, "Filter")
    Filter(udf(f).apply(col(cs(0)), col(cs(1)), col(cs(2)), col(cs(3))))
  }

  /** named typed-lambda cut (for cut-flow `Report`) */
  def Filter[A: TypeTag](name: String, f: A => Boolean, cols: Seq[String]): TDF = {
    val cs = pickN(cols, 1, "Filter")
    Filter(name, udf(f).apply(col(cs(0))))
  }

  def Define[R: TypeTag, A: TypeTag](name: String, f: A => R, cols: Seq[String] = Nil): TDF = {
    val cs = pickN(cols, 1, "Define")
    Define(name, udf(f).apply(col(cs(0))))
  }
  def Define[R: TypeTag, A: TypeTag, B: TypeTag](
      name: String, f: (A, B) => R, cols: Seq[String]): TDF = {
    val cs = pickN(cols, 2, "Define")
    Define(name, udf(f).apply(col(cs(0)), col(cs(1))))
  }
  def Define[R: TypeTag, A: TypeTag, B: TypeTag, C: TypeTag](
      name: String, f: (A, B, C) => R, cols: Seq[String]): TDF = {
    val cs = pickN(cols, 3, "Define")
    Define(name, udf(f).apply(col(cs(0)), col(cs(1)), col(cs(2))))
  }
  def AddBranch[R: TypeTag, A: TypeTag](name: String, f: A => R, cols: Seq[String]): TDF =
    Define(name, f, cols)
  def AddBranch[R: TypeTag, A: TypeTag, B: TypeTag](
      name: String, f: (A, B) => R, cols: Seq[String]): TDF = Define(name, f, cols)

  // ---- column resolution (reference PickBranchNames, TDataFrame.hxx:299-314)

  private def pick(c: String, op: String): String =
    if (c.nonEmpty) c
    else defaultColumns match {
      case Seq(one) => one
      case Nil => throw new IllegalArgumentException(s"$op: no column given and no default set")
      case many => throw new IllegalArgumentException(
        s"$op: no column given and ${many.size} defaults — need exactly 1")
    }

  // ---- lazy actions ---------------------------------------------------------

  def Count(): Result[Long] = ctx.book(steps, CountSpec)
  def Sum(column: String = ""): Result[Double] = ctx.book(steps, SumSpec(pick(column, "Sum")))
  def Min(column: String = ""): Result[Double] = ctx.book(steps, MinSpec(pick(column, "Min")))
  def Max(column: String = ""): Result[Double] = ctx.book(steps, MaxSpec(pick(column, "Max")))
  def Mean(column: String = ""): Result[Double] = ctx.book(steps, MeanSpec(pick(column, "Mean")))
  /** Reference `Take<T>`: the full column as a driver-side Seq. Faithful to
    * the reference's semantics (a materialized std::list, TDataFrame.hxx), so
    * the whole column lands in driver memory — for data-scale columns use
    * [[TakeIterator]], which streams partition by partition.
    */
  def Take(column: String = ""): Result[Seq[Any]] =
    ctx.book(steps, TakeSpec(pick(column, "Take")))

  /** Spill-safe `Take` for large collects: streams the column partition by
    * partition (`toLocalIterator`), so the driver holds at most one partition
    * instead of the whole `collect_list` result. Instant action — it returns
    * a live cursor, so it cannot ride the fused batch.
    */
  def TakeIterator(column: String = ""): Iterator[Any] = {
    import scala.jdk.CollectionConverters._
    toDF.select(col(pick(column, "Take"))).toLocalIterator().asScala.map(_.get(0))
  }
  private def checkAxis(nbins: Int, lo: Double, hi: Double): Unit = {
    require(nbins >= 1, s"Histo: nbins must be >= 1, got $nbins")
    require(hi >= lo, s"Histo: hi ($hi) must be >= lo ($lo)")
  }

  /** Reference signature `Histo(branchName = "", nBins = 128, minVal = 0.,
    * maxVal = 0.)` (TDataFrame.hxx:924): `lo == hi` means "axis from data
    * min/max" (TH1 auto-range convention) — the two-pass deferred axis.
    */
  def Histo(column: String, nbins: Int, lo: Double, hi: Double): Result[Histogram] = {
    checkAxis(nbins, lo, hi)
    val range = if (lo == hi) None else Some((lo, hi))
    ctx.book(steps, HistoSpec(pick(column, "Histo"), nbins, range))
  }
  /** auto-ranged: axis from data min/max, two-pass (reference FillOperation). */
  def Histo(column: String, nbins: Int): Result[Histogram] = {
    require(nbins >= 1, s"Histo: nbins must be >= 1, got $nbins")
    ctx.book(steps, HistoSpec(pick(column, "Histo"), nbins, None))
  }
  /** reference TEST 6 `d.Histo()`: default column, 128 bins, auto-range */
  def Histo(): Result[Histogram] = Histo("", 128)
  /** Model overload (reference TDataFrame.hxx:897-904, TEST 6
    * `d.Histo("dv", dvHisto)`): axis copied from the model histogram; the
    * returned histogram is independent of the model. `Histogram.model` builds
    * an empty model.
    */
  def Histo(column: String, model: Histogram): Result[Histogram] =
    Histo(column, model.nbins, model.lo, model.hi)
  /** weighted fill: Fill(x, w) with an integer-valued weight column;
    * `lo == hi` auto-ranges, same convention as the unweighted overloads.
    * DELIBERATE integer restriction: the weight is cast to long (a fractional
    * weight column would silently truncate), because the native aggregate's
    * long bins are what keep weighted counts exact and merge-order-
    * independent. Real-valued weights go through [[HistoWeightedD]], which
    * keeps exactness by decimal-summing quantized weights instead.
    */
  def HistoWeighted(column: String, weightCol: String, nbins: Int, lo: Double,
      hi: Double): Result[Histogram] = {
    checkAxis(nbins, lo, hi)
    val range = if (lo == hi) None else Some((lo, hi))
    ctx.book(steps, HistoSpec(pick(column, "Histo"), nbins, range, Some(weightCol)))
  }
  def Report(): Result[Seq[CutInfo]] = ctx.book(steps, ReportSpec)

  /** 2-D histogram (TH2 analog) as a distributed bucket aggregation — grids
    * can be large, so the result stays a DataFrame rather than a driver proxy.
    */
  def Histo2D(
      xCol: String, yCol: String,
      nx: Int, lox: Double, hix: Double,
      ny: Int, loy: Double, hiy: Double): DataFrame =
    graft.functions.Histo2D(toDF, col(xCol), col(yCol), nx, lox, hix, ny, loy, hiy)

  /** Weighted 2-D histogram (TH2 `Fill(x, y, w)`, real-valued weights) —
    * decimal-summed cells, see [[graft.functions.Histo2D.weighted]].
    */
  def Histo2DWeighted(
      xCol: String, yCol: String, wCol: String,
      nx: Int, lox: Double, hix: Double,
      ny: Int, loy: Double, hiy: Double, wScale: Int = 2): DataFrame =
    graft.functions.Histo2D.weighted(
      toDF, col(xCol), col(yCol), col(wCol), nx, lox, hix, ny, loy, hiy, wScale)

  /** Profile histogram (TProfile analog): per-x-bin count, mean and rms of
    * `yCol`, decimal-summed for cross-engine exactness — see
    * [[graft.functions.ProfileHisto]].
    */
  def HistoProfile(
      xCol: String, yCol: String, nbins: Int, lo: Double, hi: Double,
      yScale: Int = 2): DataFrame =
    graft.functions.ProfileHisto(toDF, col(xCol), col(yCol), nbins, lo, hi, yScale)

  /** Double-weighted 1-D histogram (TH1 `Fill(x, w)` with real-valued w):
    * weights quantized to `wScale` decimal places, bins sum exact scaled
    * longs (order-independent decimal-summed bins), one division back at the
    * end — see [[graft.functions.WeightedHisto]]. Declarative Histo2D-style
    * result (non-empty bins only).
    */
  def HistoWeightedD(
      xCol: String, wCol: String, nbins: Int, lo: Double, hi: Double,
      wScale: Int = 2): DataFrame =
    graft.functions.WeightedHisto(toDF, col(xCol), col(wCol), nbins, lo, hi, wScale)

  // ---- instant actions ------------------------------------------------------

  /** Materialized DataFrame view of this node (defines + filters applied). */
  def toDF: DataFrame = {
    val defines = steps.collect { case d: DefineStep => d }
    val wide = defines.foldLeft(ctx.base) { case (df, DefineStep(n, e)) => df.withColumn(n, e) }
    steps.collect { case FilterStep(_, p) => p }.foldLeft(wide)(_ where _)
  }

  /** Reference `Foreach` (TDataFrame.hxx:805-813): instant — booked into the
    * shared batch and triggered immediately, so every pending action runs in
    * the same pass (TDFGuide.md:288-291; the common frame is persisted across
    * the aggregate and side-effect jobs). User owns thread-safety.
    */
  def Foreach(cols: Seq[String])(f: Row => Unit): Unit = {
    ctx.book[Unit](steps, ForeachSpec(cols, Nil, (_, r) => f(r)))
    ctx.run()
  }

  /** Reference `ForeachSlot`: slot = partition id (TDFGuide.md:220-233). */
  def ForeachSlot(cols: Seq[String])(f: (Int, Row) => Unit): Unit = {
    ctx.book[Unit](steps, ForeachSpec(cols, Nil, f))
    ctx.run()
  }

  /** catalyst type for a lambda argument, so the column can be up-cast to the
    * exact runtime class the callable expects (an Int column handed to a
    * Double lambda would otherwise ClassCastException inside the executor).
    * None for Catalyst-unrepresentable types — those fall back to the raw
    * row path.
    */
  private def dtOf[T: TypeTag]: Option[org.apache.spark.sql.types.DataType] =
    scala.util.Try(
      org.apache.spark.sql.catalyst.ScalaReflection.schemaFor[T].dataType).toOption

  /** Per-argument coercions: a Catalyst-underivable argument type only
    * disables the cast for ITS column (raw value passthrough), not for the
    * whole argument list — a representable Int column bound to a Double
    * parameter still coerces even when a sibling argument is opaque.
    */
  private def foreachCasts(dts: Option[DataType]*): Seq[Option[DataType]] =
    dts.toSeq

  /** Typed-lambda `Foreach` (reference TDataFrame.hxx:805-813 takes a callable
    * + branch list): values handed to the callable directly, no Row plumbing;
    * columns are coerced to the callable's argument types.
    */
  def Foreach[A: TypeTag](f: A => Unit, cols: Seq[String]): Unit = {
    val cs = pickN(cols, 1, "Foreach")
    ctx.book[Unit](steps, ForeachSpec(cs, foreachCasts(dtOf[A]),
      (_, r) => f(r.getAs[A](0))))
    ctx.run()
  }
  def Foreach[A: TypeTag, B: TypeTag](f: (A, B) => Unit, cols: Seq[String]): Unit = {
    val cs = pickN(cols, 2, "Foreach")
    ctx.book[Unit](steps, ForeachSpec(cs, foreachCasts(dtOf[A], dtOf[B]),
      (_, r) => f(r.getAs[A](0), r.getAs[B](1))))
    ctx.run()
  }
  def Foreach[A: TypeTag, B: TypeTag, C: TypeTag](
      f: (A, B, C) => Unit, cols: Seq[String]): Unit = {
    val cs = pickN(cols, 3, "Foreach")
    ctx.book[Unit](steps, ForeachSpec(cs, foreachCasts(dtOf[A], dtOf[B], dtOf[C]),
      (_, r) => f(r.getAs[A](0), r.getAs[B](1), r.getAs[C](2))))
    ctx.run()
  }

  /** Reference planned `Snapshot` (TDFGuide.md:383): persist the skim and
    * return a new frame over it.
    */
  def Snapshot(path: String, cols: Seq[String] = Nil): TDF = {
    val df = if (cols.isEmpty) toDF else toDF.select(cols.map(col): _*)
    df.write.mode("overwrite").parquet(path)
    TDF.read(spark, path)
  }

  /** Snapshot to ORC — same contract, the other pushdown-capable columnar
    * sink ([[TDF.readOrc]] reopens it).
    */
  def SnapshotOrc(path: String, cols: Seq[String] = Nil): TDF = {
    val df = if (cols.isEmpty) toDF else toDF.select(cols.map(col): _*)
    df.write.mode("overwrite").orc(path)
    TDF.readOrc(spark, path)
  }

  /** Snapshot partitioned by columns — downstream filters on the partition
    * columns prune whole directories at the scan (the 100 TB layout lever
    * for selective reads).
    */
  def SnapshotPartitioned(path: String, partitionCols: Seq[String]): TDF = {
    toDF.write.mode("overwrite").partitionBy(partitionCols: _*).parquet(path)
    TDF.read(spark, path)
  }

  /** Snapshot into a bucketed (+ bucket-sorted) table: repeated joins or
    * aggregations on the bucket key then run bucket-to-bucket with NO
    * shuffle exchange (BucketedJoinSpec demonstrates the zero-shuffle join).
    * Bucketed output requires the table catalog, hence a table name rather
    * than a bare path.
    */
  def SnapshotBucketed(
      table: String, bucketCol: String, nBuckets: Int,
      path: Option[String] = None): TDF = {
    val w = toDF.write.mode("overwrite")
      .bucketBy(nBuckets, bucketCol).sortBy(bucketCol)
    // explicit path -> an EXTERNAL bucketed table (data where the caller
    // says, catalog entry only for the bucketing metadata); otherwise the
    // session warehouse holds it as a managed table
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
    TDF(spark.table(table))
  }

  /** Snapshot range-sorted by columns: `repartitionByRange` then
    * `sortWithinPartitions` before the write, so each output file covers a
    * disjoint key range and every row-group's parquet min/max statistics are
    * tight — downstream range filters skip whole files and row-groups at the
    * scan. The sort-based layout lever (z-order's 1-D case) next to
    * [[SnapshotPartitioned]] (directory pruning, for low-cardinality keys)
    * and [[SnapshotBucketed]] (shuffle-free joins).
    */
  def SnapshotSorted(path: String, sortCols: Seq[String], numFiles: Int = 0): TDF = {
    val cs = sortCols.map(col)
    val ranged =
      if (numFiles > 0) toDF.repartitionByRange(numFiles, cs: _*)
      else toDF.repartitionByRange(cs: _*)
    ranged.sortWithinPartitions(cs: _*).write.mode("overwrite").parquet(path)
    TDF.read(spark, path)
  }

  /** Snapshot z-ordered by two integer columns: rows are range-partitioned
    * and sorted by the Morton-interleaved value
    * ([[graft.functions.ZOrder.zorder2]]), so each file clusters BOTH
    * dimensions and parquet min/max statistics prune range filters on either
    * column — the multi-dimensional layout lever next to [[SnapshotSorted]].
    */
  def SnapshotZOrdered(
      path: String, xCol: String, yCol: String,
      numFiles: Int, bits: Int = 16): TDF =
    SnapshotZOrderedN(path, Seq(xCol, yCol), numFiles, bits)

  /** the N-column form ([[graft.functions.ZOrder.zorderN]]) — the 3+-column
    * clustering a real table wants (`cols.size * bits` ≤ 63)
    */
  def SnapshotZOrderedN(
      path: String, cols: Seq[String], numFiles: Int, bits: Int = 16): TDF = {
    val z = graft.functions.ZOrder.zorderN(cols.map(col), bits)
    toDF.withColumn("__z", z)
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions(col("__z"))
      .drop("__z")
      .write.mode("overwrite").parquet(path)
    TDF.read(spark, path)
  }

  /** Driver-side reduce over a double column (reference planned op,
    * TDFGuide.md:379-381). Runs as its own job (it carries a closure).
    */
  def Reduce(column: String)(f: (Double, Double) => Double): Double = {
    val ds = toDF.select(col(pick(column, "Reduce")).cast(DoubleType))
      .as[Double](org.apache.spark.sql.Encoders.scalaDouble)
    ds.reduce(f)
  }

  /** Reference planned `Accumulate` (TDFGuide.md:379-381): general fold with
    * a typed accumulator — per-partition fold from `init`, partials combined
    * with `merge` (the reference's per-slot Operation + end-of-loop merge
    * shape, TDataFrame.hxx:385-684). `merge` must be associative and
    * commutative for a deterministic result under any partitioning.
    */
  def Accumulate[U: scala.reflect.ClassTag](column: String, init: U)(
      acc: (U, Double) => U)(
      merge: (U, U) => U): U = {
    val ds = toDF.select(col(pick(column, "Accumulate")).cast(DoubleType))
      .as[Double](org.apache.spark.sql.Encoders.scalaDouble)
    ds.rdd.aggregate(init)(acc, merge)
  }
}

object TDF {
  /** Adopt an existing DataFrame (reference ctor TDataFrame.hxx:725). */
  def apply(df: DataFrame, defaultColumns: Seq[String] = Nil, compat: Boolean = false): TDF = {
    val ctx = new BookingContext(df)
    ctx.compat = compat
    new TDF(ctx, Vector.empty, defaultColumns)
  }
  /** Open a dataset from storage (reference ctor TDataFrame.hxx:716); parquet
    * path or glob — multi-file is the TChain analog.
    */
  def read(spark: SparkSession, path: String, defaultColumns: Seq[String] = Nil): TDF =
    apply(spark.read.parquet(path), defaultColumns)

  /** CSV source (header + schema inference by default — pass an explicit
    * schema for production reads; inference scans the data twice).
    */
  def readCsv(
      spark: SparkSession, path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      defaultColumns: Seq[String] = Nil): TDF = {
    val r = spark.read.option("header", "true")
    val df = schema match {
      case Some(s) => r.schema(s).csv(path)
      case None => r.option("inferSchema", "true").csv(path)
    }
    apply(df, defaultColumns)
  }

  /** JSON-lines source (explicit schema recommended at scale). */
  def readJson(
      spark: SparkSession, path: String,
      schema: Option[org.apache.spark.sql.types.StructType] = None,
      defaultColumns: Seq[String] = Nil): TDF = {
    val df = schema match {
      case Some(s) => spark.read.schema(s).json(path)
      case None => spark.read.json(path)
    }
    apply(df, defaultColumns)
  }

  /** ORC source — the other columnar format with full pushdown/pruning
    * support in Spark's native readers (schema travels in the file, like
    * parquet).
    */
  def readOrc(spark: SparkSession, path: String, defaultColumns: Seq[String] = Nil): TDF =
    apply(spark.read.orc(path), defaultColumns)

  /** Compact a parquet directory toward `targetFileBytes` per output file —
    * the small-files remedy. Directories accreted by incremental writes
    * (streaming micro-batches, many-task jobs) degrade scans with per-file
    * open/footer costs; this rewrites to `ceil(totalBytes / targetFileBytes)`
    * files via `coalesce` (narrow — no shuffle, tasks merge whole input
    * files). Sizing uses the Hadoop FileSystem listing, so it works on any
    * supported storage, not just local paths. Writes to `destPath` (a scan
    * cannot overwrite its own input) and returns the reopened frame.
    * Caveat: write parallelism equals the output file count — a petabyte
    * directory compacting to few files serialises onto few tasks; at that
    * scale run compact per partition directory (the unit
    * [[SnapshotPartitioned]] produces) so compactions parallelise across
    * partitions while each stays narrow.
    */
  def compact(
      spark: SparkSession, srcPath: String, destPath: String,
      targetFileBytes: Long = 128L << 20): TDF = {
    compactInto(spark, srcPath, destPath, targetFileBytes)
    read(spark, destPath)
  }

  /** the write half of [[compact]], without reopening the destination —
    * [[compactPartitions]] fans many of these out and reopens the root once
    */
  private def compactInto(
      spark: SparkSession, srcPath: String, destPath: String,
      targetFileBytes: Long): Unit = {
    require(targetFileBytes > 0, s"targetFileBytes must be > 0, got $targetFileBytes")
    val p = new org.apache.hadoop.fs.Path(srcPath)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val totalBytes = fs.getContentSummary(p).getLength
    val nFiles = math.max(1L, (totalBytes + targetFileBytes - 1) / targetFileBytes).toInt
    spark.read.parquet(srcPath).coalesce(nFiles)
      .write.mode("overwrite").parquet(destPath)
  }

  /** Per-partition compaction — the petabyte-scale form of [[compact]]:
    * each LEAF partition directory of a [[TDF.SnapshotPartitioned]] layout
    * (nested `key1=…/key2=…` layouts are walked to their leaves, so inner
    * partition columns keep their directories — and their pruning) compacts
    * independently, with its own Hadoop-FS sizing and its own narrow
    * `coalesce`. The per-directory jobs are SUBMITTED CONCURRENTLY from a
    * bounded thread pool (Spark's scheduler runs concurrent jobs fine): each
    * compaction is narrow and small by construction, so with serial
    * submission a thousand-partition dataset would wait on a thousand
    * driver round-trips; `parallelism` bounds the in-flight jobs instead.
    * Partition discovery on the destination restores the partition columns.
    */
  def compactPartitions(
      spark: SparkSession, srcPath: String, destPath: String,
      targetFileBytes: Long = 128L << 20, parallelism: Int = 8): TDF = {
    require(parallelism >= 1, s"parallelism must be >= 1, got $parallelism")
    val root = new org.apache.hadoop.fs.Path(srcPath)
    val fs = root.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def leaves(dir: org.apache.hadoop.fs.Path, rel: String): Seq[String] = {
      val subs = fs.listStatus(dir)
        .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      if (subs.isEmpty) Seq(rel)
      else subs.toSeq.flatMap(s => leaves(s.getPath, s"$rel/${s.getPath.getName}"))
    }
    val parts = fs.listStatus(root)
      .filter(s => s.isDirectory && s.getPath.getName.contains("="))
      .flatMap(s => leaves(s.getPath, s.getPath.getName))
    require(parts.nonEmpty, s"compactPartitions: no key=value directories under $srcPath")
    val pool = java.util.concurrent.Executors.newFixedThreadPool(
      math.min(parallelism, parts.length))
    implicit val ec: scala.concurrent.ExecutionContext =
      scala.concurrent.ExecutionContext.fromExecutorService(pool)
    try {
      val jobs = parts.toSeq.map { rel =>
        scala.concurrent.Future {
          compactInto(spark, s"$srcPath/$rel", s"$destPath/$rel", targetFileBytes)
        }
      }
      scala.concurrent.Await.result(
        scala.concurrent.Future.sequence(jobs),
        scala.concurrent.duration.Duration.Inf)
    } finally pool.shutdown()
    read(spark, destPath)
  }

  /** Binary-file source (`binaryFile` format): one row per file with
    * `(path, modificationTime, length, content)` — the ingest edge for
    * multimodal corpora, where raw image/audio/video files land on
    * distributed storage before being packed into parquet
    * ([[graft.ops.Multimodal]] consumes the same binary-column shape).
    * `glob` filters by name at the LISTING (`pathGlobFilter`), so non-matching
    * files are never opened; a `length` predicate prunes on file metadata
    * before any content is read.
    */
  def readBinaryFiles(spark: SparkSession, path: String, glob: Option[String] = None): TDF = {
    val reader = spark.read.format("binaryFile")
    apply(glob.fold(reader)(g => reader.option("pathGlobFilter", g)).load(path))
  }
}
