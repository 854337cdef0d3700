package graft.ops

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Importance-resampling DATA SELECTION (the DSIR recipe, Xie et al. 2023,
  * arXiv:2302.03169): score every raw document by how much more likely its
  * hashed n-gram stream is under a TARGET domain's distribution than under
  * the raw pool's, then sample the training subset with importance weights —
  * the standard "make the crawl look like the target corpus" pretraining
  * selection step, here as pure DataFrame ops.
  *
  * Features are word unigrams + adjacent bigrams hashed into `buckets`
  * buckets with the repo-wide md5 [[TextOps.hash32]] construction
  * (multiplicity kept — DSIR scores the gram STREAM, not the gram set).
  * Both distributions are add-1 smoothed over the bucket space, so every
  * bucket has nonzero mass and the log-ratio is always defined.
  *
  * Shape at 100 TB: gram extraction is scan-level (array transforms — no
  * posexplode self-join); the distribution fit is ONE corpus scan into a
  * ≤ `buckets`-row aggregate (map-side combined — bucket count is the
  * bound, not vocabulary); scoring joins the gram stream to the broadcast
  * bucket table and sums exact scaled longs per doc; resampling is a
  * deterministic Gumbel-top-k (`TakeOrderedAndProject` — per-partition
  * heaps, no global sort). Nothing vocabulary-sized ever shuffles and the
  * only broadcast is `buckets` rows.
  *
  * Determinism: log-ratios round to 6 decimals and per-doc totals are exact
  * scaled-long sums (the [[TextOps.unigramLogProb]] discipline); the Gumbel
  * noise derives from md5 of the doc id — bit-reproducible on any engine,
  * which is what makes a *sampled* selection oracle-checkable at all.
  */
object Selection {

  /** word unigrams + adjacent bigrams, multiplicity kept — the DSIR
    * hashed-feature gram stream (empty docs yield an empty array)
    */
  private def gramStream(textCol: Column): Column = {
    val toks = when(length(trim(textCol)) > 0, TextOps.tokens(textCol))
      .otherwise(array().cast("array<string>"))
    concat(toks, TextOps.shinglesAll(toks, 2))
  }

  /** (doc_id, isTarget, bucket) — one row per gram occurrence */
  private def docBuckets(
      docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int): DataFrame =
    docs.select(col(idCol).as("doc_id"), isTarget.cast("int").as("is_t"),
        gramStream(col(textCol)).as("__g"))
      .select(col("doc_id"), col("is_t"),
        explode(col("__g")).as("gram"))
      .withColumn("bucket", TextOps.hash32(col("gram")) % buckets)
      .drop("gram")

  /** The fitted per-bucket importance table: `bucket, n_target, n_all,
    * logr` with logr = round₆(ln p − ln q), p = (n_target+1)/(N_target+B),
    * q = (n_all+1)/(N_all+B) — add-1 smoothing over the B-bucket space on
    * both sides. ≤ B rows: the artifact you persist/broadcast.
    */
  def dsirBucketTable(
      docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int): DataFrame = {
    val g = docBuckets(docs, idCol, textCol, isTarget, buckets)
    val dist = g.groupBy(col("bucket")).agg(
      sum(col("is_t")).cast("long").as("n_target"),
      count(lit(1)).as("n_all"))
    val tot = g.agg(
      sum(col("is_t")).cast("long").as("__Nt"),
      count(lit(1)).as("__Na"))
    dist.crossJoin(broadcast(tot))
      .withColumn("logr", round(
        log((col("n_target") + lit(1.0)) / (col("__Nt") + lit(buckets.toDouble))) -
          log((col("n_all") + lit(1.0)) / (col("__Na") + lit(buckets.toDouble))), 6))
      .select(col("bucket"), col("n_target"), col("n_all"), col("logr"))
  }

  /** Per-document importance log-weight: `doc_id, n_grams, logw` where
    * logw = round₆(Σ_grams logr(bucket)) summed as exact scaled longs.
    * Docs with no grams drop (no evidence either way — same contract as
    * the bigram LM).
    */
  def dsirScores(
      docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int): DataFrame =
    dsirScoresAgainst(docs, idCol, textCol,
      dsirBucketTable(docs, idCol, textCol, isTarget, buckets), buckets)

  /** Scoring against an EXPLICIT (possibly persisted) [[dsirBucketTable]] —
    * the serving form: fit once on a reference crawl + target sample, score
    * any later batch against the stored artifact.
    */
  def dsirScoresAgainst(
      docs: DataFrame, idCol: String, textCol: String,
      bucketTable: DataFrame, buckets: Int): DataFrame = {
    val g = docBuckets(docs, idCol, textCol, lit(false), buckets)
      .drop("is_t")
    g.join(broadcast(bucketTable.select(col("bucket"), col("logr"))), Seq("bucket"))
      .withColumn("lr6", round(col("logr") * 1e6).cast("long"))
      .groupBy(col("doc_id"))
      .agg(count(lit(1)).as("n_grams"), sum(col("lr6")).as("__s6"))
      .withColumn("logw", round(col("__s6").cast("double") / 1e6, 6))
      .select(col("doc_id"), col("n_grams"), col("logw"), col("__s6"))
  }

  /** Gumbel-top-k importance RESAMPLING — the paper's sampling step, made
    * deterministic: pick the k docs maximizing logw + Gumbel(g) with
    * g = −ln(−ln(u)), u = (md5₃₂("dsir:"+doc_id) mod 10⁶ + 0.5)/10⁶ — i.e.
    * a true weighted sample without replacement (Gumbel-max trick), but
    * bit-reproducible across engines/runs because the noise comes from the
    * same md5 construction every op here uses. Ties (exactly equal keys)
    * break by doc_id. Output: `doc_id, n_grams, logw, key, rank`.
    */
  def dsirResample(
      docs: DataFrame, idCol: String, textCol: String,
      isTarget: Column, buckets: Int, k: Int): DataFrame = {
    val scores = dsirScores(docs, idCol, textCol, isTarget, buckets)
    val u = (TextOps.hash32(concat(lit("dsir:"), col("doc_id").cast("string")))
      % lit(1000000L) + lit(0.5)) / lit(1e6)
    val keyed = scores
      .withColumn("__g6", round(-log(-log(u)) * 1e6).cast("long"))
      .withColumn("__k6", col("__s6") + col("__g6"))
    // global top-k: orderBy+limit plans as TakeOrderedAndProject (per-
    // partition heaps), never a full sort — the same shape every top-k
    // here uses
    keyed.orderBy(col("__k6").desc, col("doc_id").asc).limit(k)
      .withColumn("key", round(col("__k6").cast("double") / 1e6, 6))
      // the unpartitioned rank window runs AFTER the limit — k rows, not
      // the corpus (the documented metric-scale window exception)
      .withColumn("rank",
        row_number().over(org.apache.spark.sql.expressions.Window
          .orderBy(col("__k6").desc, col("doc_id").asc)))
      .select(col("doc_id"), col("n_grams"), col("logw"), col("key"), col("rank"))
  }
}
