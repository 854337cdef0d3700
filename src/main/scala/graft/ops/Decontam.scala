package graft.ops

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import TextOps.{shingles, tokens}

/** Benchmark decontamination — the training-data step the reference's domain
  * never needed but every LLM corpus pipeline runs: drop (or flag) corpus
  * documents that leak a held-out evaluation set, by
  *
  *  (a) exact text match (md5 digest), and
  *  (b) word n-gram overlap: any n-gram of the document appearing in the
  *      held-out set (the standard "13-gram rule", n configurable).
  *
  * Scale posture for 100 TB: the held-out side is tiny (benchmark sets are
  * MBs), so BOTH probe structures — the digest set and the distinct n-gram
  * set — broadcast; the corpus streams through one scan with map-side
  * semi-joins. The only shuffle is the per-doc distinct of n-gram hits. No
  * state grows with corpus size.
  */
object Decontam {

  /** Every corpus row with integer flags `exact_hit`, `ngram_hit`, `kept`
    * (kept = neither flag). Deterministic, SQL-reproducible.
    */
  def flags(
      corpus: DataFrame, idCol: String, textCol: String,
      heldout: DataFrame, heldTextCol: String, n: Int): DataFrame = {
    val heldDigests = heldout.select(md5(col(heldTextCol)).as("__digest")).distinct()
    val heldGrams = heldout
      .withColumn("__toks", tokens(col(heldTextCol)))
      .select(explode(shingles("__toks", n)).as("__g")).distinct()
    val gramHits = corpus
      .withColumn("__toks", tokens(col(textCol)))
      .select(col(idCol), explode(shingles("__toks", n)).as("__g"))
      .join(broadcast(heldGrams), Seq("__g"), "left_semi")
      .select(col(idCol)).distinct()
      .withColumn("__ng", lit(1))
    // hit count is bounded by CONTAMINATED docs — tiny under the
    // decontamination premise — but that premise is data-dependent (one
    // boilerplate n-gram shared with the eval set could flag a large slice
    // of the corpus), so the broadcast decision must come from the ACTUAL
    // size. The distinct above already ends in a shuffle exchange, which is
    // exactly what AQE measures at runtime to flip a sort-merge join to
    // broadcast — no driver-side persist/count (which would leak cached
    // blocks for the session lifetime; this is a plan constructor, there is
    // no hook to unpersist after the caller materializes). Without AQE that
    // runtime re-plan never happens and the left join would shuffle the FULL
    // corpus by id, so fall back to the static broadcast hint (safe under the
    // decontamination premise; AQE sessions get the size-aware behavior).
    val aqeOn = corpus.sparkSession.conf
      .get("spark.sql.adaptive.enabled", "true").toBoolean
    val hits = if (aqeOn) gramHits else broadcast(gramHits)
    corpus
      .withColumn("__d", md5(col(textCol)))
      .join(broadcast(heldDigests.withColumn("__ex", lit(1))),
        col("__d") === col("__digest"), "left")
      .join(hits, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("__ex"), lit(0)).as("exact_hit"),
        coalesce(col("__ng"), lit(0)).as("ngram_hit"))
      .withColumn("kept",
        when(col("exact_hit") === 0 && col("ngram_hit") === 0, 1).otherwise(0))
  }

  /** Graded contamination MEASUREMENT (vs [[flags]]' binary rule): per
    * corpus doc, the fraction of its distinct n-grams that appear anywhere
    * in the held-out set — the train/test-overlap statistic reported by
    * model cards and ablations, where a 13-gram-rule flag alone is too
    * blunt. Zero shuffle: the held-out gram set rides one broadcast row and
    * each doc scores itself scan-level via array_intersect; docs too short
    * to form an n-gram score 0. The flag compares the UNROUNDED fraction
    * (both engines fold identical doubles), the reported column is round6.
    */
  def overlapScores(
      corpus: DataFrame, idCol: String, textCol: String,
      heldout: DataFrame, heldTextCol: String, n: Int,
      threshold: Double): DataFrame = {
    // r19: the hit count used to be size(array_intersect(__sh, __gl))
    // against ONE collected gram row — which rebuilds a hash set over the
    // ENTIRE held-out gram list (≈ held_docs × grams) for EVERY corpus row
    // (probe: ~1.25 ms/doc, the row's whole exec). Restructured as
    // explode + broadcast hash join on the DISTINCT held grams (the hash
    // set is built once per task by the join) + a doc-keyed count —
    // identical n_hit (both sides distinct, so the left join never
    // duplicates), and the per-row cost is now O(|doc grams|) instead of
    // O(|held grams|). At 100 TB this is also the right shape: per-row
    // work must not scale with the held-out set.
    val heldGrams = heldout
      .withColumn("__toks", tokens(col(heldTextCol)))
      .select(explode(shingles("__toks", n)).as("__g")).distinct()
      .withColumn("__m", lit(1L))
    val frac = col("n_hit").cast("double") / col("n_grams")
    corpus
      .withColumn("__toks", tokens(col(textCol)))
      .withColumn("__sh", shingles("__toks", n))
      .select(col(idCol), size(col("__sh")).cast("long").as("n_grams"),
        explode_outer(col("__sh")).as("__g"))
      .join(broadcast(heldGrams), Seq("__g"), "left")
      .groupBy(col(idCol), col("n_grams"))
      .agg(sum(coalesce(col("__m"), lit(0L))).as("n_hit"))
      .select(col(idCol), col("n_grams"), col("n_hit"))
      .withColumn("overlap",
        round(when(col("n_grams") > 0, frac).otherwise(lit(0.0)), 6))
      .withColumn("contaminated",
        when(col("n_grams") > 0 && frac >= threshold, 1L).otherwise(0L))
  }

  /** [[flags]] for the held-out side too large to broadcast — decontaminating
    * against a PRIOR TRAINING CORPUS or a big benchmark suite rather than a
    * megabytes-sized eval set. The broadcast gram probe of [[flags]] stops
    * working there; the naive alternative (shuffle-join all corpus grams
    * against all held grams) moves ~n grams per corpus doc through the wire —
    * the dominant cost at 100 TB.
    *
    * Shape: a Bloom filter over xxhash64 of the held grams (bits ∝
    * `expectedGrams`, built once with one pass over the held side) rides the
    * corpus scan as a codegen'd [[graft.functions.BloomMightContain]] probe
    * and drops non-matching grams BEFORE any shuffle; only the survivors —
    * true hits + the `fpp` false-positive slice — reach the exact string
    * verify join (which AQE sizes at runtime; with tiny survivors it
    * broadcasts THEM). The verify is on the gram STRING, not its hash, so
    * the result is bit-exactly [[flags]]' output: the Bloom pass can only
    * let extra candidates through, never drop a true hit, and the verify
    * removes every false positive. The EXACT-match path gets the same
    * treatment (a digest Bloom + survivor verify — no broadcast of the
    * held digest set, which is corpus-sized under the same premise);
    * `expectedDocs` sizes that second Bloom (0 = fall back to
    * `expectedGrams`, an over-size that only lowers its fpp).
    */
  def flagsBloomed(
      corpus: DataFrame, idCol: String, textCol: String,
      heldout: DataFrame, heldTextCol: String, n: Int,
      expectedGrams: Long, fpp: Double = 0.01,
      expectedDocs: Long = 0L): DataFrame = {
    // the digest side gets the SAME treatment as the gram side: under the
    // "held side too large to broadcast" premise this function exists for,
    // the held digest set is corpus-sized too — a broadcast hint on it
    // (flags' shape) would OOM the driver at exactly the target scale. So a
    // second Bloom (over xxhash64 of the md5 digest; `expectedDocs` items,
    // ≤ expectedGrams when unset) rides the corpus scan, the tiny survivor
    // set (true exact dups + the fpp slice) meets the held digests through a
    // semi-join whose SMALL side is the survivors, and the verified ids come
    // back by id like the gram hits. Read twice (bloom build + verify) —
    // pinned like heldGrams.
    val heldDigests = heldout.select(md5(col(heldTextCol)).as("__digest")).distinct()
      .localCheckpoint(false)
    val digestBloom = heldDigests.select(xxhash64(col("__digest")).as("__dh"))
      .stat.bloomFilter("__dh", if (expectedDocs > 0L) expectedDocs else expectedGrams, fpp)
    val exactHits = corpus
      .select(col(idCol), md5(col(textCol)).as("__d"))
      .filter(graft.functions.BloomExprs.mightContain(xxhash64(col("__d")), digestBloom))
      .join(heldDigests, col("__d") === col("__digest"), "left_semi")
      .select(col(idCol)).distinct()
      .withColumn("__ex", lit(1))
    // read twice (bloom build action + verify join) — pin so the held-side
    // tokenize/explode/distinct runs once; the bloom build's job
    // materializes the lazy checkpoint
    val heldGrams = heldout
      .withColumn("__toks", tokens(col(heldTextCol)))
      .select(explode(shingles("__toks", n)).as("__g")).distinct()
      .localCheckpoint(false)
    val bloom = heldGrams.select(xxhash64(col("__g")).as("__gh"))
      .stat.bloomFilter("__gh", expectedGrams, fpp)
    val gramHits = corpus
      .withColumn("__toks", tokens(col(textCol)))
      .select(col(idCol), explode(shingles("__toks", n)).as("__g"))
      .filter(graft.functions.BloomExprs.mightContain(xxhash64(col("__g")), bloom))
      .join(heldGrams, Seq("__g"), "left_semi")
      .select(col(idCol)).distinct()
      .withColumn("__ng", lit(1))
    // both hit sets are contaminated-doc-sized but data-dependent: AQE sizes
    // the joins at runtime (the flags discipline); without AQE fall back to
    // the static hint — the hit sets, unlike the held inputs, are small
    // under the decontamination premise
    val aqeOn = corpus.sparkSession.conf
      .get("spark.sql.adaptive.enabled", "true").toBoolean
    val hits = if (aqeOn) gramHits else broadcast(gramHits)
    val exact = if (aqeOn) exactHits else broadcast(exactHits)
    corpus
      .join(exact, Seq(idCol), "left")
      .join(hits, Seq(idCol), "left")
      .select(
        col(idCol),
        coalesce(col("__ex"), lit(0)).as("exact_hit"),
        coalesce(col("__ng"), lit(0)).as("ngram_hit"))
      .withColumn("kept",
        when(col("exact_hit") === 0 && col("ngram_hit") === 0, 1).otherwise(0))
  }

  /** The filtering form: corpus minus contaminated docs. */
  def clean(
      corpus: DataFrame, idCol: String, textCol: String,
      heldout: DataFrame, heldTextCol: String, n: Int): DataFrame = {
    val contaminated = flags(corpus, idCol, textCol, heldout, heldTextCol, n)
      .filter(col("kept") === 0).select(col(idCol))
    corpus.join(contaminated, Seq(idCol), "left_anti")
  }
}
