package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.execution.SparkStrategy
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Ascending, Attribute, BindReferences, Descending, Expression, JoinedRow, SortOrder, UnsafeProjection}
import org.apache.spark.sql.catalyst.types.PhysicalDataType
import org.apache.spark.sql.catalyst.plans.logical.{BinaryNode, LogicalPlan}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution}
import org.apache.spark.sql.execution.{BinaryExecNode, SparkPlan}
import org.apache.spark.sql.graftbridge.GraftSql
import org.apache.spark.sql.types.{LongType, TimestampType}

/** AS-OF JOIN as a first-class custom operator — the SURVEY §7 preference-
  * ladder (c) path (`LogicalPlan` + `Strategy` + `SparkPlan`): for every left
  * row, the single right row with the same key and the greatest timestamp
  * strictly below the left timestamp (inner semantics — unmatched left rows
  * drop), i.e. DuckDB's `ASOF JOIN ... ON l.key = r.key AND l.ts > r.ts`.
  * With `forward = true` the direction flips: the single right row with the
  * SMALLEST timestamp strictly above the left's (`l.ts < r.ts`). An optional
  * `toleranceMicros` bounds the match gap (pandas `merge_asof` parity): the
  * best candidate is by construction the only possible in-tolerance match,
  * so out-of-tolerance rows simply drop.
  *
  * Physical execution is a co-partitioned streaming merge: EnsureRequirements
  * hash-partitions both children on the key and sorts them by (key, ts) —
  * ts DESCENDING in forward mode, which makes the forward merge the mirror
  * image of the backward one (same one-retained-row state machine over the
  * reversed comparator); each partition pair then merges with O(1) state —
  * ONE shuffle per side, no windowing, no buffering of whole groups. This is
  * the shape that survives 100 TB: state per task is a single retained right
  * row.
  */
final case class AsOfJoinPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    toleranceMicros: Option[Long] = None,
    forward: Boolean = false) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): AsOfJoinPlan = copy(left = l, right = r)
}

final case class AsOfJoinExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    toleranceMicros: Option[Long],
    forward: Boolean) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  // forward mode consumes timestamps largest-first so "the first right row
  // after lts" is the last one consumed — the same merge loop serves both
  // directions, only the sort direction and comparator flip
  private def tsDir = if (forward) Descending else Ascending

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, tsDir)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, tsDir)))

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
    val tsOrdBase = PhysicalDataType.ordering(leftTs.dataType)
      .asInstanceOf[Ordering[Any]]
    val fwd = forward
    val tol = toleranceMicros
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val out = UnsafeProjection.create(lAttrs ++ rAttrs, lAttrs ++ rAttrs)
      val joined = new JoinedRow
      // in forward mode the streams arrive ts-descending; negating the
      // comparator makes "earlier in stream order" read as "less than" and
      // the backward merge below works unchanged
      def tsCmp(a: Any, b: Any): Int =
        if (fwd) -tsOrdBase.compare(a, b) else tsOrdBase.compare(a, b)
      // timestamps and longs are both physically Long — the only types the
      // facade admits when a tolerance is set
      def withinTol(lt: Any, ct: Any): Boolean = tol.forall { t =>
        val gap =
          if (fwd) ct.asInstanceOf[Long] - lt.asInstanceOf[Long]
          else lt.asInstanceOf[Long] - ct.asInstanceOf[Long]
        gap <= t
      }

      // both sides sorted by (key, ts-in-stream-order); stream the right side
      // keeping, for the current left row, the right row latest in stream
      // order with rk == lk && rts strictly before lts in stream order
      var rHead: InternalRow = null          // next unconsumed right row
      var rHeadKey: Any = null
      var rHeadTs: Any = null
      var candidate: InternalRow = null      // best match for current left key
      var candidateKey: Any = null
      var candidateTs: Any = null
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
                  if (kc < 0 || (kc == 0 && tsCmp(rHeadTs, lt) < 0)) {
                    if (kc == 0) {
                      candidate = rHead; candidateKey = rHeadKey
                      candidateTs = rHeadTs; candidateValid = true
                    }
                    rHead = null // consumed
                  } else continue = false
                }
              }
              if (candidateValid && keyOrd.compare(candidateKey, lk) == 0 &&
                  withinTol(lt, candidateTs))
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

/** AS-OF LAST-K — the sequence-model serving shape: for every left row, the
  * k right rows with the same key and the greatest timestamps strictly below
  * the left timestamp, emitted one output row per match with `rank` (1 = most
  * recent). Same co-partitioned streaming merge as [[AsOfJoinPlan]] — ONE
  * shuffle per side, both sides sorted by (key, ts) — but the retained state
  * is a k-bounded deque instead of a single row: consumed right rows push at
  * the tail, the head evicts past k, a key change clears it. State per task
  * is O(k) rows regardless of history depth — the 100 TB posture is identical
  * to the single-row as-of. `rightTieBreak` (when set) extends the right-side
  * required ordering so same-timestamp history rows rank deterministically.
  */
final case class AsOfLastKPlan(
    left: LogicalPlan, right: LogicalPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    k: Int, rankAttr: Attribute,
    rightTieBreak: Option[Expression]) extends BinaryNode {
  override def output: Seq[Attribute] = left.output ++ right.output :+ rankAttr
  // rank is minted by this node, not pulled from a child — without this the
  // analyzer reports it MISSING_ATTRIBUTES
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)
  override protected def withNewChildrenInternal(
      l: LogicalPlan, r: LogicalPlan): AsOfLastKPlan = copy(left = l, right = r)
}

final case class AsOfLastKExec(
    left: SparkPlan, right: SparkPlan,
    leftKey: Expression, rightKey: Expression,
    leftTs: Expression, rightTs: Expression,
    k: Int, rankAttr: Attribute,
    rightTieBreak: Option[Expression]) extends BinaryExecNode {

  override def output: Seq[Attribute] = left.output ++ right.output :+ rankAttr
  override def producedAttributes: org.apache.spark.sql.catalyst.expressions.AttributeSet =
    org.apache.spark.sql.catalyst.expressions.AttributeSet(rankAttr :: Nil)

  override def requiredChildDistribution: Seq[Distribution] =
    ClusteredDistribution(leftKey :: Nil) :: ClusteredDistribution(rightKey :: Nil) :: Nil

  override def requiredChildOrdering: Seq[Seq[SortOrder]] = Seq(
    Seq(SortOrder(leftKey, Ascending), SortOrder(leftTs, Ascending)),
    Seq(SortOrder(rightKey, Ascending), SortOrder(rightTs, Ascending)) ++
      rightTieBreak.map(SortOrder(_, Ascending)))

  override protected def doExecute(): RDD[InternalRow] = {
    val lAttrs = left.output
    val rAttrs = right.output
    val lKeyB = BindReferences.bindReference(leftKey, lAttrs)
    val lTsB = BindReferences.bindReference(leftTs, lAttrs)
    val rKeyB = BindReferences.bindReference(rightKey, rAttrs)
    val rTsB = BindReferences.bindReference(rightTs, rAttrs)
    val keyOrd = PhysicalDataType.ordering(leftKey.dataType)
      .asInstanceOf[Ordering[Any]]
    val tsOrd = PhysicalDataType.ordering(leftTs.dataType)
      .asInstanceOf[Ordering[Any]]
    val kk = k
    left.execute().zipPartitions(right.execute()) { (lIter, rIter) =>
      val out = UnsafeProjection.create(output, lAttrs ++ rAttrs :+ rankAttr)
      val joinedLR = new JoinedRow
      val joinedAll = new JoinedRow
      val rankRow = new org.apache.spark.sql.catalyst.expressions.GenericInternalRow(1)

      var rHead: InternalRow = null
      var rHeadKey: Any = null
      var rHeadTs: Any = null
      // the k-deque: consumed right rows for the CURRENT key in stream order
      // (oldest at head); capped at k by evicting the head. Rows are copies
      // (the child iterator reuses its buffer).
      val deque = new java.util.ArrayDeque[InternalRow](kk + 1)
      var dequeKey: Any = null
      var dequeValid = false

      new Iterator[InternalRow] {
        // current left row's matches, emitted newest-first with rank 1..n;
        // projection happens in next() (the output buffer is reused)
        private var curLeft: InternalRow = null
        private var curMatches: Array[InternalRow] = null
        private var curIdx = 0

        private def advance(): Unit = {
          curLeft = null
          while (curLeft == null && lIter.hasNext) {
            val l = lIter.next()
            val lk = lKeyB.eval(l)
            val lt = lTsB.eval(l)
            if (lk != null && lt != null) {
              if (dequeValid && keyOrd.compare(dequeKey, lk) != 0) {
                deque.clear(); dequeValid = false
              }
              var continue = true
              while (continue) {
                while (rHead == null && rIter.hasNext) {
                  val r = rIter.next()
                  val rk = rKeyB.eval(r)
                  val rt = rTsB.eval(r)
                  if (rk != null && rt != null) { rHead = r.copy(); rHeadKey = rk; rHeadTs = rt }
                }
                if (rHead == null) continue = false
                else {
                  val kc = keyOrd.compare(rHeadKey, lk)
                  if (kc < 0 || (kc == 0 && tsOrd.compare(rHeadTs, lt) < 0)) {
                    if (kc == 0) {
                      if (!dequeValid) { dequeKey = rHeadKey; dequeValid = true }
                      deque.addLast(rHead)
                      if (deque.size > kk) { deque.removeFirst(): Unit }
                    }
                    rHead = null
                  } else continue = false
                }
              }
              if (dequeValid && !deque.isEmpty &&
                  keyOrd.compare(dequeKey, lk) == 0) {
                curLeft = l.copy()
                curMatches = deque.toArray(new Array[InternalRow](deque.size))
                curIdx = 0
              }
            }
          }
        }

        override def hasNext: Boolean = {
          if (curLeft == null || curIdx >= curMatches.length) advance()
          curLeft != null && curIdx < curMatches.length
        }
        override def next(): InternalRow = {
          if (!hasNext) throw new NoSuchElementException("empty as-of-last-k iterator")
          // rank 1 = newest = deque tail = last array slot
          val r = curMatches(curMatches.length - 1 - curIdx)
          rankRow.update(0, (curIdx + 1).toLong)
          curIdx += 1
          out(joinedAll(joinedLR(curLeft, r), rankRow))
        }
      }
    }
  }

  override protected def withNewChildrenInternal(
      l: SparkPlan, r: SparkPlan): AsOfLastKExec = copy(left = l, right = r)
}

/** Planner strategy mapping the logical nodes to the exec nodes. */
object AsOfJoinStrategy extends SparkStrategy {
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case AsOfJoinPlan(l, r, lk, rk, lt, rt, tol, fwd) =>
      AsOfJoinExec(planLater(l), planLater(r), lk, rk, lt, rt, tol, fwd) :: Nil
    case AsOfLastKPlan(l, r, lk, rk, lt, rt, k, rank, tie) =>
      AsOfLastKExec(planLater(l), planLater(r), lk, rk, lt, rt, k, rank, tie) :: Nil
    case _ => Nil
  }
}

object AsOfJoin {
  /** Register the strategy once per session. */
  def register(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.exists(_ eq AsOfJoinStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ AsOfJoinStrategy

  /** left as-of right (strictly earlier match; `forward = true` → strictly
    * later). `toleranceMicros` bounds the gap — requires long or timestamp
    * ts columns (physically Long). Columns are named and resolved here
    * against each side's output (injected Column objects would bypass the
    * classic API's node conversion).
    */
  def join(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      toleranceMicros: Option[Long] = None,
      forward: Boolean = false): DataFrame = {
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
    toleranceMicros.foreach { t =>
      require(t >= 0, s"as-of: tolerance must be non-negative, got $t")
      require(lt.dataType == TimestampType || lt.dataType == LongType,
        s"as-of: tolerance needs long/timestamp ts columns, got ${lt.dataType}")
    }
    GraftSql.ofRows(spark, AsOfJoinPlan(lPlan, rPlan, lk, rk, lt, rt,
      toleranceMicros, forward))
  }

  /** left as-of-last-k right: for each left row, the k most recent right
    * rows with the same key strictly before the left ts — one output row
    * per match, carrying `asof_rank` (1 = most recent). `rightTieBreak`
    * names a right column that orders same-timestamp history rows (higher
    * value = more recent) so ranks are deterministic under ts ties; pass
    * it whenever the right side can hold two rows at one (key, ts).
    */
  def joinLastK(
      left: DataFrame, right: DataFrame,
      leftKey: String, rightKey: String,
      leftTs: String, rightTs: String,
      k: Int, rightTieBreak: Option[String] = None): DataFrame = {
    require(k >= 1, s"as-of-last-k: k must be >= 1, got $k")
    val spark = left.sparkSession
    register(spark)
    val lPlan = GraftSql.logicalPlan(left)
    val rPlan = GraftSql.logicalPlan(right)
    def attr(p: LogicalPlan, n: String): Attribute =
      p.output.find(_.name == n).getOrElse(
        throw new IllegalArgumentException(s"as-of: no column '$n' in ${p.output.map(_.name)}"))
    val (lk, rk) = (attr(lPlan, leftKey), attr(rPlan, rightKey))
    val (lt, rt) = (attr(lPlan, leftTs), attr(rPlan, rightTs))
    require(lk.dataType == rk.dataType,
      s"as-of: key types differ: ${lk.dataType} vs ${rk.dataType}")
    require(lt.dataType == rt.dataType,
      s"as-of: ts types differ: ${lt.dataType} vs ${rt.dataType}")
    val rank = org.apache.spark.sql.catalyst.expressions.AttributeReference(
      "asof_rank", LongType, nullable = false)()
    GraftSql.ofRows(spark, AsOfLastKPlan(lPlan, rPlan, lk, rk, lt, rt, k,
      rank, rightTieBreak.map(attr(rPlan, _))))
  }
}
