package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.types.PhysicalDataType
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graftbridge.GraftSql

/** AS-OF JOIN as a first-class custom operator — the SURVEY §7 preference-
  * ladder (c) path (`LogicalPlan` + `Strategy` + `SparkPlan`): for every left
  * row, the single right row with the same key and the greatest timestamp
  * strictly below the left timestamp (inner semantics — unmatched left rows
  * drop), i.e. DuckDB's `ASOF JOIN ... ON l.key = r.key AND l.ts > r.ts`.
  *
  * Physical execution is a co-partitioned streaming merge: EnsureRequirements
  * hash-partitions both children on the key and sorts them by (key, ts); each
  * partition pair then merges with O(1) state — ONE shuffle per side, no
  * windowing, no buffering of whole groups. This is the shape that survives
  * 100 TB: state per task is a single retained right row.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): AsOfJoinPlan = copy(left = l, right = r)
}

final case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lAttrs = left.output
    val rAttrs = right.output
    val lKeyB = BindReferences.bindReference(leftKey, lAttrs)
    val lTsB = BindReferences.bindReference(leftTs, lAttrs)
    val rKeyB = BindReferences.bindReference(rightKey, rAttrs)
    val rTsB = BindReferences.bindReference(rightTs, rAttrs)
    // interpreted orderings → any orderable key/ts type (long, string,
    // timestamp, ...), matching the sort order EnsureRequirements installed
    val keyOrd = PhysicalDataType.ordering(leftKey.dataType)
      .asInstanceOf[Ordering[Any]]
    val tsOrd = PhysicalDataType.ordering(leftTs.dataType)
      .asInstanceOf[Ordering[Any]]
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val out = UnsafeProjection.create(lAttrs ++ rAttrs, lAttrs ++ rAttrs)
      val joined = new JoinedRow

      // both sides sorted by (key, ts); stream the right side keeping, for the
      // current left row, the latest right row with rk == lk && rts < lts
      var rHead: InternalRow = null          // next unconsumed right row
      var rHeadKey: Any = null
      var rHeadTs: Any = null
      var candidate: InternalRow = null      // best match for current left key
      var candidateKey: Any = null
      var candidateValid = false

      new Iterator[InternalRow] {
        // lazy advance: the output projection reuses its buffer, so the next
        // row may only be computed after the consumer is done with the
        // previous one (standard SparkPlan iterator contract)
        private var nextRow: InternalRow = null

        private def advance(): Unit = {
          nextRow = null
          while (nextRow == null && lIter.hasNext) {
            val l = lIter.next()
            val lk = lKeyB.eval(l)
            val lt = lTsB.eval(l)
            if (lk != null && lt != null) {
              // drop candidate from a previous key
              if (candidateValid && keyOrd.compare(candidateKey, lk) != 0)
                candidateValid = false
              // consume right rows up to (lk, lt)
              var continue = true
              while (continue) {
                while (rHead == null && rIter.hasNext) {
                  val r = rIter.next()
                  val k = rKeyB.eval(r)
                  val t = rTsB.eval(r)
                  if (k != null && t != null) { rHead = r.copy(); rHeadKey = k; rHeadTs = t }
                }
                if (rHead == null) continue = false
                else {
                  val kc = keyOrd.compare(rHeadKey, lk)
                  if (kc < 0 || (kc == 0 && tsOrd.compare(rHeadTs, lt) < 0)) {
                    if (kc == 0) {
                      candidate = rHead; candidateKey = rHeadKey; candidateValid = true
                    }
                    rHead = null // consumed
                  } else continue = false
                }
              }
              if (candidateValid && keyOrd.compare(candidateKey, lk) == 0)
                nextRow = out(joined(l, candidate))
            }
          }
        }

        override def hasNext: Boolean = {
          if (nextRow == null) advance()
          nextRow != null
        }
        override def next(): InternalRow = {
          if (nextRow == null) advance()
          val r = nextRow
          nextRow = null
          r
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): AsOfJoinExec = copy(left = l, right = r)
}

/** Planner strategy mapping the logical node to the exec node. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt) :: Nil
    case _ => Nil
  }
}

object AsOfJoin {
  /** Register the strategy once per session. */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.exists(_ eq AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  /** left as-of right on long keys and micros timestamps (strictly earlier).
    * Columns are named and resolved here against each side's output (injected
    * Column objects would bypass the classic API's node conversion).
    */
  def join(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String): DataFrame = {
    val spark = left.sparkSession
    register(spark)
    val lPlan = GraftSql.logicalPlan(left)
    val rPlan = GraftSql.logicalPlan(right)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"as-of: no column '$n' in ${p.output.map(_.name)}"))
    val (lk, rk) = (attr(lPlan, leftKey), attr(rPlan, rightKey))
    val (lt, rt) = (attr(lPlan, leftTs), attr(rPlan, rightTs))
    // the merge orderings come from the LEFT types — mismatched sides would
    // fail with executor ClassCastExceptions; reject on the driver instead
    require(lk.dataType == rk.dataType,
      s"as-of: key types differ: ${lk.dataType} vs ${rk.dataType}")
    require(lt.dataType == rt.dataType,
      s"as-of: ts types differ: ${lt.dataType} vs ${rt.dataType}")
    GraftSql.ofRows(spark, AsOfJoinPlan(lPlan, rPlan, lk, rk, lt, rt))
  }
}
