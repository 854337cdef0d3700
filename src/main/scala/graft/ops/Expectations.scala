package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Declarative data-quality EXPECTATIONS over a frame — the
  * Delta-constraints / dbt-tests / Great-Expectations shape: a rule set is
  * validated in bulk and the result is an auditable REPORT (one row per
  * rule: violations found, pass flag), not an exception — the contract
  * gate a 100 TB ingest runs before promoting a batch into the curated
  * table. (Not in the reference — it has no data-quality surface; this
  * extends the profiling family, which observes, with enforcement, which
  * judges.)
  *
  * Scale shape: every SCALAR rule (not-null, range, set-membership,
  * regex, custom predicate) compiles to one conditional-count aggregate,
  * and ALL scalar rules ride ONE scan of the frame (the
  * [[graft.tdf.TDF]] fused-aggregation discipline applied to validation).
  * UNIQUE rules need their key shuffle (one per distinct key set);
  * referential rules are a counted anti-join against the dimension (the
  * dim side broadcast when small, exactly like any dim join). No rule
  * ever materializes the violating rows themselves — [[violations]]
  * fetches examples on demand for debugging.
  */
object Expectations {

  sealed trait Rule { def name: String }
  /** `col` must never be null. */
  case class NotNull(col: String) extends Rule {
    def name = s"not_null($col)"
  }
  /** `col` must lie in [lo, hi] (inclusive; nulls violate). */
  case class InRange(col: String, lo: Double, hi: Double) extends Rule {
    def name = s"in_range($col, $lo, $hi)"
  }
  /** `col` must be one of `values` (nulls violate). */
  case class InSet(col: String, values: Seq[String]) extends Rule {
    def name = s"in_set($col)"
  }
  /** `cols` together must be unique across the frame. */
  case class Unique(cols: Seq[String]) extends Rule {
    def name = s"unique(${cols.mkString(",")})"
  }
  /** every non-null `col` value must exist in `dimCol` of the dimension
    * frame (foreign-key integrity).
    */
  case class RefIntegrity(col: String, dimName: String, dimCol: String) extends Rule {
    def name = s"ref($col -> $dimName.$dimCol)"
  }
  /** rows where `pred` is FALSE or NULL violate (escape hatch for
    * arbitrary row-level contracts).
    */
  case class Check(label: String, pred: Column) extends Rule {
    def name = s"check($label)"
  }

  /** A scalar rule's violation count as a conditional-count aggregate
    * Column (None for rules that need their own job). The counts are
    * ADDITIVE across partitions AND micro-batches — what lets the
    * streaming cell maintain them in complete mode with one-row state.
    */
  private[graft] def scalarViol(r: Rule): Option[Column] = r match {
    case NotNull(c) => Some(count(when(col(c).isNull, 1)))
    case InRange(c, lo, hi) => Some(count(when(
      col(c).isNull || col(c) < lo || col(c) > hi, 1)))
    case InSet(c, vs) => Some(count(when(
      col(c).isNull || !col(c).isInCollection(vs), 1)))
    case Check(_, p) => Some(count(when(p.isNull || !p, 1)))
    case _ => None
  }

  /** Validate `df` against `rules`; `dims` resolves [[RefIntegrity]]
    * dimension names. Returns (rule string, n_violations long, pass long
    * 0/1), one row per rule, in the given rule order (`rule_idx` carries
    * it through engines that reorder).
    */
  def validate(
      df: DataFrame, rules: Seq[Rule],
      dims: Map[String, DataFrame] = Map.empty): DataFrame = {
    require(rules.nonEmpty, "validate needs at least one rule")
    val spark = df.sparkSession
    import org.apache.spark.sql.types._

    // all scalar rules in ONE aggregate over one scan
    val scalarRules = rules.zipWithIndex
      .flatMap { case (r, i) => scalarViol(r).map(c => (r, i, c)) }
    val scalarRows: Seq[(Int, String, Long)] =
      if (scalarRules.isEmpty) Nil
      else {
        val aggd = df.agg(scalarRules.head._3.as("c0"),
          scalarRules.tail.zipWithIndex.map { case ((_, _, c), j) =>
            c.as(s"c${j + 1}") }: _*).head()
        scalarRules.zipWithIndex.map { case ((r, i, _), j) =>
          (i, r.name, aggd.getLong(j))
        }
      }

    val otherRows: Seq[(Int, String, Long)] = rules.zipWithIndex.collect {
      case (r @ Unique(cols), i) =>
        val dups = df.groupBy(cols.map(col): _*)
          .agg(count(lit(1)).as("__n")).filter(col("__n") > 1)
          .agg(coalesce(sum(col("__n")), lit(0L))).head().getLong(0)
        (i, r.name, dups)
      case (r @ RefIntegrity(c, dimName, dimCol), i) =>
        val dim = dims.getOrElse(dimName, throw new IllegalArgumentException(
          s"RefIntegrity references unknown dimension '$dimName'"))
        val orphans = df.filter(col(c).isNotNull)
          .join(dim.select(col(dimCol).as(c)).distinct(), Seq(c), "left_anti")
          .count()
        (i, r.name, orphans)
    }

    val rows = (scalarRows ++ otherRows).sortBy(_._1).map { case (i, n, v) =>
      Row(i.toLong, n, v, if (v == 0L) 1L else 0L)
    }
    spark.createDataFrame(
      spark.sparkContext.parallelize(rows, 1),
      StructType(Seq(
        StructField("rule_idx", LongType, false),
        StructField("rule", StringType, false),
        StructField("n_violations", LongType, false),
        StructField("pass", LongType, false))))
  }
  private type Row = org.apache.spark.sql.Row
  private val Row = org.apache.spark.sql.Row

  /** A scalar rule's per-ROW violation predicate (None for rules that need
    * a join) — the row-level sibling of [[scalarViol]], shared by batch
    * [[quarantineRows]] and the streaming quarantine cell (pure scan-level,
    * so it runs identically on a stream).
    */
  private[graft] def scalarRowViol(r: Rule): Option[Column] = r match {
    case NotNull(c) => Some(col(c).isNull)
    case InRange(c, lo, hi) => Some(col(c).isNull || col(c) < lo || col(c) > hi)
    case InSet(c, vs) => Some(col(c).isNull || !col(c).isInCollection(vs))
    case Check(_, p) => Some(p.isNull || !p)
    case _ => None
  }

  /** The `;`-joined failed-rule tag over SCALAR rules only — pure
    * scan-level, usable on streaming frames (concat_ws drops the null
    * elements of untripped rules, so the tag lists exactly the tripped
    * rules in rule order).
    */
  def scalarFailedTag(rules: Seq[Rule]): Column = {
    val fs = rules.flatMap(r => scalarRowViol(r).map(c => when(c, lit(r.name))))
    require(fs.nonEmpty, "scalarFailedTag needs at least one scalar rule")
    concat_ws(";", fs: _*)
  }

  /** Row-level QUARANTINE — the enforcement side of [[validate]]: every
    * row tagged with the rules it violates (rule-order `;`-joined names),
    * violating rows returned for the side sink while clean rows continue.
    * Scalar rules are pure scan-level conditionals on the one pass;
    * [[Unique]] joins the duplicate KEY set back (key-sized frame);
    * [[RefIntegrity]] left-joins the distinct dimension keys. No rule adds
    * a data-sized shuffle beyond its own keyed join.
    */
  def quarantineRows(
      df: DataFrame, idCols: Seq[String], rules: Seq[Rule],
      dims: Map[String, DataFrame] = Map.empty): DataFrame = {
    require(rules.nonEmpty, "quarantineRows needs at least one rule")
    var base = df
    val flags = scala.collection.mutable.ArrayBuffer.empty[(String, Column)]
    rules.zipWithIndex.foreach {
      case (r, _) if scalarRowViol(r).isDefined =>
        flags += r.name -> scalarRowViol(r).get
      case (r @ Unique(cols), i) =>
        val fc = s"__dup_$i"
        val dup = df.groupBy(cols.map(col): _*)
          .agg(count(lit(1)).as("__n")).filter(col("__n") > 1)
          .select(cols.map(col): _*).withColumn(fc, lit(true))
        base = base.join(dup, cols, "left_outer")
        flags += r.name -> coalesce(col(fc), lit(false))
      case (r @ RefIntegrity(c, dimName, dimCol), i) =>
        val fc = s"__ref_$i"
        val dim = dims.getOrElse(dimName, throw new IllegalArgumentException(
          s"RefIntegrity references unknown dimension '$dimName'"))
          .select(col(dimCol).as(c)).distinct().withColumn(fc, lit(true))
        base = base.join(dim, Seq(c), "left_outer")
        flags += r.name -> (col(c).isNotNull && col(fc).isNull)
    }
    // concat_ws drops null elements, so the failed list is the rule-order
    // join of exactly the tripped rules — engine-identical
    base
      .withColumn("failed", concat_ws(";",
        flags.toSeq.map { case (n, c) => when(c, lit(n)) }: _*))
      .filter(length(col("failed")) > 0)
      .select(idCols.map(col) :+ col("failed"): _*)
  }

  /** Example violating rows for ONE rule (debugging aid; `limit` caps the
    * fetch so it stays driver-safe at any scale).
    */
  def violations(
      df: DataFrame, rule: Rule, limitN: Int = 20,
      dims: Map[String, DataFrame] = Map.empty): DataFrame = rule match {
    case NotNull(c) => df.filter(col(c).isNull).limit(limitN)
    case InRange(c, lo, hi) =>
      df.filter(col(c).isNull || col(c) < lo || col(c) > hi).limit(limitN)
    case InSet(c, vs) =>
      df.filter(col(c).isNull || !col(c).isInCollection(vs)).limit(limitN)
    case Check(_, p) => df.filter(p.isNull || !p).limit(limitN)
    case Unique(cols) =>
      val dupKeys = df.groupBy(cols.map(col): _*)
        .agg(count(lit(1)).as("__n")).filter(col("__n") > 1).drop("__n")
      df.join(broadcast(dupKeys.limit(limitN)), cols).limit(limitN)
    case RefIntegrity(c, dimName, dimCol) =>
      val dim = dims.getOrElse(dimName, throw new IllegalArgumentException(
        s"RefIntegrity references unknown dimension '$dimName'"))
      df.filter(col(c).isNotNull)
        .join(dim.select(col(dimCol).as(c)).distinct(), Seq(c), "left_anti")
        .limit(limitN)
  }
}
