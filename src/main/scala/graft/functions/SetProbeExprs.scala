package graft.functions

import java.util.concurrent.ConcurrentHashMap

import org.apache.spark.broadcast.Broadcast
import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.graftbridge.GraftSql
import org.apache.spark.sql.types.{ArrayType, BooleanType, DataType, StringType}
import org.apache.spark.unsafe.types.UTF8String

/** Codegen'd "any array element in a broadcast string set" predicate — the
  * hash-probe replacement for `arrays_overlap(doc_grams, huge_literal_list)`.
  *
  * `ArraysOverlap` hash-builds the SMALLER side and linearly scans the
  * larger, so probing a per-document shingle array (tens of entries) against
  * a held-out n-gram list (easily 10⁵–10⁶ entries) degenerates to a per-row
  * scan of the full list. Here the roles are fixed the right way around
  * regardless of relative size: the gram list is hashed ONCE, each row pays
  * O(|doc shingles|) probes.
  *
  * Scale posture (the 100 TB crawl this guards): the set rides a real Spark
  * `Broadcast` — the task binary carries only the broadcast handle, each
  * executor fetches the value once from the block manager — and the built
  * `HashSet` is memoized per executor JVM in a companion cache keyed by the
  * driver-computed content digest, so neither the bytes nor the build cost
  * are per-task. The digest also stands in for content equality (Catalyst
  * CSE sees two probes of the same set as the same expression).
  */
case class AnyInBroadcastSet(
    child: Expression, set: Broadcast[Array[Array[Byte]]], digest: String)
  extends UnaryExpression {

  override def dataType: DataType = BooleanType

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"graft_any_in_set needs ARRAY<STRING>, got ${other.catalogString}")
  }

  @transient private lazy val probe: java.util.HashSet[UTF8String] =
    AnyInBroadcastSet.cached(digest, set)

  /** true iff any non-null element of `arr` is in the set */
  def anyIn(arr: ArrayData): Boolean = {
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i) && probe.contains(arr.getUTF8String(i))) return true
      i += 1
    }
    false
  }

  override protected def nullSafeEval(v: Any): Any = anyIn(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    // one virtual call per row; the set lives behind the broadcast handle
    val ref = ctx.addReferenceObj("graftAnyInSet", this)
    defineCodeGen(ctx, ev, c => s"$ref.anyIn($c)")
  }

  // content identity = the driver-computed digest; the Broadcast handle
  // itself never equals another instance's, which would defeat CSE
  override def equals(other: Any): Boolean = other match {
    case a: AnyInBroadcastSet => child == a.child && digest == a.digest
    case _ => false
  }
  override def hashCode(): Int = java.util.Objects.hash(child, digest)

  override protected def withNewChildInternal(newChild: Expression): AnyInBroadcastSet =
    copy(child = newChild)
  override def prettyName: String = "graft_any_in_set"
}

object AnyInBroadcastSet {
  // per-executor-JVM memo of built sets; entries are dropped with the JVM
  // (bounded: one entry per distinct held-out set in flight)
  private val cache = new ConcurrentHashMap[String, java.util.HashSet[UTF8String]]()

  private[functions] def cached(
      digest: String, set: Broadcast[Array[Array[Byte]]]): java.util.HashSet[UTF8String] =
    cache.computeIfAbsent(digest, _ => {
      val elems = set.value
      val s = new java.util.HashSet[UTF8String](math.max(16, elems.length * 2))
      elems.foreach(b => s.add(UTF8String.fromBytes(b)))
      s
    })
}

object SetProbeExprs {

  /** Predicate: any element of the string-array column `arr` is one of
    * `elems`. The element list is deduplicated and sorted driver-side (a
    * deterministic digest needs a canonical order) and broadcast once.
    */
  def anyInSet(spark: SparkSession, arr: Column, elems: Seq[String]): Column = {
    val canonical = elems.distinct.sorted
      .map(_.getBytes(java.nio.charset.StandardCharsets.UTF_8)).toArray
    val md = java.security.MessageDigest.getInstance("MD5")
    canonical.foreach { b =>
      // length-prefix each element so ["ab","c"] and ["a","bc"] differ
      md.update(java.nio.ByteBuffer.allocate(4).putInt(b.length).array())
      md.update(b)
    }
    val digest = md.digest().map(b => f"$b%02x").mkString
    val bc = spark.sparkContext.broadcast(canonical)
    GraftSql.column(AnyInBroadcastSet(GraftSql.expression(arr), bc, digest))
  }
}
