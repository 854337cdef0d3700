package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Join helpers for skewed data at scale.
  *
  * `salted` spreads a skewed build-side key over `salt` sub-keys: the probe
  * (large, skewed) side gets a deterministic salt from a row hash, the build
  * side is replicated `salt` times. One shuffle either way, but the hot key's
  * rows now land on `salt` reducers instead of one. AQE's skew-join split
  * handles moderate skew on its own; explicit salting is for the pathological
  * key that exceeds a single executor even after AQE splits.
  */
object Joins {

  /** Inner-join `big` (skew-prone) with `small` on `key`, salting `salt`
    * ways. Result columns = big.* ++ small.* (minus the duplicate key).
    */
  def salted(big: DataFrame, small: DataFrame, key: String, salt: Int): DataFrame = {
    // deterministic salt: stable under retries, uniform over rows
    val saltedBig = big.withColumn("__salt",
      pmod(xxhash64(col(key), monotonically_increasing_id()), lit(salt)))
    val saltedSmall = small
      .withColumn("__salt", explode(array((0 until salt).map(lit): _*)))
    saltedBig.join(saltedSmall, Seq(key, "__salt")).drop("__salt")
  }

  /** Bloom-prefiltered inner join for the "selective build side too large to
    * broadcast" case: build a Bloom filter over the build side's long keys,
    * drop probe rows that cannot match BEFORE the join shuffle (the codegen'd
    * [[graft.functions.BloomMightContain]] probe — no per-row UDF). At 100 TB
    * the probe-side shuffle is the dominant cost; with a selective build side
    * this cuts it by ~the selectivity, and the join itself then removes the
    * `fpp` false positives, so the result is EXACTLY the plain join's.
    */
  def bloomPrefiltered(
      probe: DataFrame, build: DataFrame, probeKey: String, buildKey: String,
      expectedKeys: Long, fpp: Double = 0.01): DataFrame = {
    val bloom = build.stat.bloomFilter(buildKey, expectedKeys, fpp)
    // DataFrame-qualified key references: unqualified col() would be
    // ambiguous when the probe and build key columns share a name (the
    // common case for same-named join keys)
    val filtered = probe
      .filter(graft.functions.BloomExprs.mightContain(col(probeKey), bloom))
    val joined = filtered.join(build, filtered(probeKey) === build(buildKey))
    // same-named keys: keep only the probe side, or any downstream
    // select(probeKey) hits an ambiguous-reference AnalysisException (the
    // values are equal under the inner equi-join anyway)
    if (probeKey == buildKey) joined.drop(build(buildKey)) else joined
  }

  /** Bucketized range join: `points` rows matched to every `ranges` row with
    * `lo <= point <= hi`. Spark plans a bare range predicate as a
    * nested-loop/cartesian join — O(|points|·|ranges|), dead at scale. This
    * chops the value domain into `bucketWidth` buckets: each range is
    * replicated to the buckets it covers (+1 per `bucketWidth` of span), each
    * point lives in exactly ONE bucket, and the join becomes a hash equi-join
    * on the bucket id with the exact range predicate re-checked after. No
    * duplicates by construction (a point meets each range only in the
    * point's own bucket), so no distinct pass. Pick `bucketWidth` near the
    * typical range span: cost is |points| + Σ spans/width replicated rows.
    */
  def rangeBucketed(
      points: DataFrame, ranges: DataFrame, pointCol: String,
      loCol: String, hiCol: String, bucketWidth: Double,
      maxBucketsPerRange: Int = 1 << 16): DataFrame = {
    require(bucketWidth > 0, "rangeBucketed: bucketWidth must be positive")
    // a NULL bound can never satisfy `lo <= p AND p <= hi`, so a plain range
    // join drops that row; drop it here too (otherwise the NULL falls through
    // when()'s NULL condition into otherwise(raise_error) and kills the job)
    val boundedRanges = ranges.filter(col(loCol).isNotNull && col(hiCol).isNotNull)
    val loB = floor(col(loCol) / bucketWidth).cast("long")
    val hiB = floor(col(hiCol) / bucketWidth).cast("long")
    // one outlier range (sentinel hi, malformed row) would otherwise explode
    // sequence() into span/width elements and kill the job — fail loudly with
    // the offending row instead. The raise_error lives INSIDE the explode
    // child so column pruning cannot drop the check.
    val guarded = when(hiB - loB < lit(maxBucketsPerRange.toLong),
      sequence(loB, hiB))
      .otherwise(raise_error(concat(
        lit(s"rangeBucketed: range spans >= $maxBucketsPerRange buckets "),
        lit("(lo="), col(loCol), lit(", hi="), col(hiCol),
        lit(s", bucketWidth=$bucketWidth) — widen bucketWidth or clean the range"))))
    val rb = boundedRanges.withColumn("__bucket", explode(guarded))
    val pb = points.withColumn("__bucket",
      floor(col(pointCol) / bucketWidth).cast("long"))
    pb.join(rb, Seq("__bucket"))
      .filter(col(pointCol) >= col(loCol) && col(pointCol) <= col(hiCol))
      .drop("__bucket")
  }

  /** Interval-OVERLAP join (range × range) — the shape [[rangeBucketed]]'s
    * point-in-range cannot express: emit every (a, b) pair whose closed
    * intervals [aLo, aHi] and [bLo, bHi] intersect (genomics region overlap,
    * concurrent sessions, reservation conflicts). Same bucketization scheme:
    * both sides explode to the buckets their interval touches (guarded
    * against runaway spans exactly like [[rangeBucketed]]), pairs meet
    * through an equi-join on the bucket, and each overlapping pair survives
    * in EXACTLY one bucket — the one containing the overlap start
    * max(aLo, bLo) — so no distinct pass at any scale. Cost is the honest
    * interval-join cost: Σ span/width replicated rows per side plus pairs
    * actually sharing a bucket; pick `bucketWidth` near the typical span.
    * Column names must be disjoint (rename upstream — keeps the op free of
    * silent alias surprises).
    */
  def intervalOverlapBucketed(
      a: DataFrame, b: DataFrame,
      aLo: String, aHi: String, bLo: String, bHi: String,
      bucketWidth: Double, maxBucketsPerRange: Int = 1 << 16): DataFrame = {
    require(bucketWidth > 0, "intervalOverlapBucketed: bucketWidth must be positive")
    val clash = a.columns.toSet intersect b.columns.toSet
    require(clash.isEmpty,
      s"intervalOverlapBucketed: column names must be disjoint, both sides have $clash")
    def exploded(df: DataFrame, lo: String, hi: String): DataFrame = {
      val bounded = df.filter(col(lo).isNotNull && col(hi).isNotNull)
      val loB = floor(col(lo) / bucketWidth).cast("long")
      val hiB = floor(col(hi) / bucketWidth).cast("long")
      val guarded = when(hiB - loB < lit(maxBucketsPerRange.toLong),
        sequence(loB, hiB))
        .otherwise(raise_error(concat(
          lit(s"intervalOverlapBucketed: interval spans >= $maxBucketsPerRange buckets "),
          lit("(lo="), col(lo), lit(", hi="), col(hi),
          lit(s", bucketWidth=$bucketWidth) — widen bucketWidth or clean the interval"))))
      bounded.withColumn("__bucket", explode(guarded))
    }
    exploded(a, aLo, aHi).join(exploded(b, bLo, bHi), Seq("__bucket"))
      .filter(col(aLo) <= col(bHi) && col(bLo) <= col(aHi))
      .filter(floor(greatest(col(aLo), col(bLo)) / bucketWidth).cast("long")
        === col("__bucket"))
      .drop("__bucket")
  }
}
