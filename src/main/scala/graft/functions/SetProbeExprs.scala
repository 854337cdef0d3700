package graft.functions

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
  /** LRU bound on the per-executor-JVM memo of built sets: a long-lived
    * session cycling many distinct held-out sets retains at most this many
    * built `HashSet`s — an evicted set is rebuilt from its broadcast on the
    * next probe (cheap relative to the probe volume that justified building
    * it). 8 × a 10⁶-gram set is comfortably inside executor heap; "every set
    * ever seen" was not.
    */
  private[graft] val MaxCachedSets = 8

  // access-ordered LinkedHashMap = LRU; all access synchronized (probe volume
  // is per-row but `cached` is hit once per task via the lazy val, so the
  // lock is not on the hot path)
  private val cache =
    new java.util.LinkedHashMap[String, java.util.HashSet[UTF8String]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, java.util.HashSet[UTF8String]]): Boolean =
        size() > MaxCachedSets
    }

  private[graft] def cached(
      digest: String, set: Broadcast[Array[Array[Byte]]]): java.util.HashSet[UTF8String] =
    cache.synchronized {
      val hit = cache.get(digest)
      if (hit != null) hit
      else {
        val elems = set.value
        val s = new java.util.HashSet[UTF8String](math.max(16, elems.length * 2))
        elems.foreach(b => s.add(UTF8String.fromBytes(b)))
        cache.put(digest, s)
        s
      }
    }

  private[graft] def cachedCount: Int = cache.synchronized(cache.size())
}

object SetProbeExprs {

  /** Driver-side broadcast memo, same LRU bound as the executor set cache:
    * repeated probes of the same held-out set (every gate run, every
    * restarted stream) reuse ONE broadcast instead of shipping a fresh copy
    * each call. Eviction drops the strong reference only — Spark's
    * ContextCleaner reclaims the broadcast's blocks once no live plan holds
    * the expression, which an explicit `destroy` here could not know; keys
    * carry the applicationId so a restarted context never resurrects a dead
    * context's handle.
    */
  private val bcCache =
    new java.util.LinkedHashMap[String, Broadcast[Array[Array[Byte]]]](16, 0.75f, true) {
      override def removeEldestEntry(
          e: java.util.Map.Entry[String, Broadcast[Array[Array[Byte]]]]): Boolean =
        size() > AnyInBroadcastSet.MaxCachedSets
    }

  private[graft] def broadcastCacheCount: Int = bcCache.synchronized(bcCache.size())

  /** Predicate: any element of the string-array column `arr` is one of
    * `elems`. The element list is deduplicated and sorted driver-side (a
    * deterministic digest needs a canonical order) and broadcast once per
    * distinct set content, not once per call.
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
    val key = s"${spark.sparkContext.applicationId}:$digest"
    val bc = bcCache.synchronized {
      val hit = bcCache.get(key)
      if (hit != null) hit
      else {
        val fresh = spark.sparkContext.broadcast(canonical)
        bcCache.put(key, fresh)
        fresh
      }
    }
    GraftSql.column(AnyInBroadcastSet(GraftSql.expression(arr), bc, digest))
  }
}
