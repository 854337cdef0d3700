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
  * bound, not vocabulary); scoring is SCAN-LEVEL — the fitted table rides
  * a `buckets`-long literal array and each doc folds its gram stream
  * against it in one codegen'd expression (no explode, no join, no
  * shuffle — batch and streaming share [[scoreLr6]] verbatim); resampling
  * is a deterministic Gumbel-top-k (`TakeOrderedAndProject` —
  * per-partition heaps, no global sort). Nothing vocabulary-sized ever
  * shuffles and nothing larger than `buckets` rows ever leaves the
  * executors.
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

  /** (doc_id, isTarget, bucket) — one row per gram occurrence. FIT-ONLY:
    * the one explode in the family, feeding the ≤ `buckets`-row count
    * aggregate (map-side combined); scoring never explodes.
    */
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
    val observed = g.groupBy(col("bucket")).agg(
      sum(col("is_t")).cast("long").as("n_target"),
      count(lit(1)).as("n_all"))
    // DENSE over the full bucket space: a bucket unseen in the fit corpus
    // still gets its add-1-smoothed log-ratio, so scoring LATER data (the
    // serving/streaming path) is defined for any input — zero-count rows
    // fall out of the same formula
    val dist = docs.sparkSession.range(buckets.toLong)
      .select(col("id").as("bucket"))
      .join(observed, Seq("bucket"), "left")
      .na.fill(0L, Seq("n_target", "n_all"))
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
    * any later batch against the stored artifact. Fetches the table
    * driver-side ([[dsirLr6Array]] — a BOUNDED `buckets`-row collect, the
    * centroid/model-literal convention) and scores scan-level through
    * [[scoreLr6]]: no explode, no join, no shuffle. Bit-identical to the
    * historical explode→broadcast-join→groupBy form (law-pinned in
    * OpsSpec): same rounded lr6 longs per gram (the dense table joins
    * every gram exactly once), same exact long sums, same zero-gram drop.
    */
  def dsirScoresAgainst(
      docs: DataFrame, idCol: String, textCol: String,
      bucketTable: DataFrame, buckets: Int): DataFrame =
    scoreLr6(docs, idCol, textCol, dsirLr6Array(bucketTable, buckets), buckets)
      .select(col("doc_id"), col("n_grams"), col("logw"))

  /** CCNet-style per-language HEAD/MIDDLE/TAIL quality buckets (Wenzek et
    * al. 2020, arXiv:1911.00359): each document is scored by its mean
    * bigram log-probability under ITS OWN language's corpus statistics
    * (low perplexity = typical, clean text), then each language splits at
    * its own tercile cutpoints — head = the most LM-typical third, the
    * slice CCNet keeps for pretraining. The per-language conditioning is
    * the point: a fluent-German doc must not land in `tail` because the
    * corpus is mostly English.
    *
    * Exactness: per-bigram log-probs round to 6 decimals and per-doc means
    * use exact scaled-long sums ([[TextOps.unigramLogProb]] discipline);
    * cutpoints are SQL-standard `percentile_disc` values (existing scores,
    * no interpolation) compared with broadcast membership — the RFM-segment
    * pattern, grouped per language so the cutpoint pass parallelizes across
    * languages. Docs with < 2 tokens drop (no bigrams).
    *
    * Shape at 100 TB: bigram extraction is scan-level; counts shuffle on
    * (lang, bigram) — bigram-vocab-sized, never assumed broadcastable; the
    * per-doc mean is one doc-keyed aggregation; the cutpoint aggregate
    * buffers per-language score lists (the accepted RFM trade — if a single
    * language's corpus outgrows one task's memory, the bucket-bracketed
    * [[Quantiles]] machinery per language is the upgrade path) and
    * broadcasts back a |langs|-row table.
    */
  def ccnetBuckets(
      docs: DataFrame, idCol: String, textCol: String,
      langCol: String): DataFrame = {
    val lp = ccnetLpTable(docs, idCol, textCol, langCol)
    val scored = ccnetScore(docs, idCol, textCol, langCol, lp)
    ccnetBucketize(scored, ccnetCuts(scored))
  }

  /** (doc_id, lang, bg) exploded bigram stream with the leading word kept —
    * shared by the fit and scoring passes
    */
  private def ccnetBigrams(
      docs: DataFrame, idCol: String, textCol: String,
      langCol: String): DataFrame =
    docs.select(col(idCol).as("doc_id"), col(langCol).as("lang"),
        TextOps.tokens(col(textCol)).as("toks"))
      .filter(size(col("toks")) >= 2)
      .select(col("doc_id"), col("lang"),
        explode(TextOps.shinglesAll(col("toks"), 2)).as("bg"))
      .withColumn("w1", substring_index(col("bg"), " ", 1))

  /** The per-language bigram LM: `lang, bg, lp6` with lp6 the round-6
    * scaled-long log10 conditional probability n(lang,w1w2)/n(lang,w1·).
    * Bigram-vocab-sized — the persistable half of the CCNet artifact.
    */
  def ccnetLpTable(
      docs: DataFrame, idCol: String, textCol: String,
      langCol: String): DataFrame = {
    val cnt2 = ccnetBigrams(docs, idCol, textCol, langCol)
      .groupBy(col("lang"), col("w1"), col("bg"))
      .agg(count(lit(1)).as("n2"))
      // r20: LM-sized pin — feeds the marginal aggregate AND the join;
      // unpinned, the corpus bigram explode + count ran twice
      .localCheckpoint(false)
    // n(lang, w1·) derived from the bigram table itself (position-specific
    // marginal, the PMI convention) — no second corpus pass
    val cnt1 = cnt2.groupBy(col("lang"), col("w1"))
      .agg(sum(col("n2")).as("n1"))
    cnt2.join(cnt1, Seq("lang", "w1"))
      .withColumn("lp6", round(round(
        log10(col("n2").cast("double") / col("n1").cast("double")), 6) * 1e6)
        .cast("long"))
      .select(col("lang"), col("bg"), col("lp6"))
  }

  /** Mean bigram log-prob per doc under an explicit LM: `doc_id, lang,
    * n_bigrams, avg_logp`. Fit-corpus bigrams all hit the LM; on LATER data
    * an unseen bigram drops out of the mean (the inner join — only observed
    * evidence scores, the same contract as [[dsirScoresAgainst]]'s grams).
    */
  def ccnetScore(
      docs: DataFrame, idCol: String, textCol: String,
      langCol: String, lp: DataFrame): DataFrame =
    ccnetBigrams(docs, idCol, textCol, langCol)
      .join(lp, Seq("lang", "bg"))
      .groupBy(col("doc_id"), col("lang"))
      .agg(count(lit(1)).as("n_bigrams"), sum(col("lp6")).as("__s6"))
      .withColumn("avg_logp", round(
        col("__s6").cast("double") / (col("n_bigrams") * lit(1e6)), 6))

  /** Per-language tercile cutpoints of a scored frame — |langs| rows */
  def ccnetCuts(scored: DataFrame): DataFrame =
    scored.groupBy(col("lang")).agg(
      expr("percentile_disc(0.3333333333333333) WITHIN GROUP (ORDER BY avg_logp)")
        .as("c_lo"),
      expr("percentile_disc(0.6666666666666666) WITHIN GROUP (ORDER BY avg_logp)")
        .as("c_hi"))

  private def ccnetBucketize(scored: DataFrame, cuts: DataFrame): DataFrame =
    scored.join(broadcast(cuts), Seq("lang"))
      .withColumn("bucket",
        when(col("avg_logp") >= col("c_hi"), lit("head"))
          .when(col("avg_logp") >= col("c_lo"), lit("middle"))
          .otherwise(lit("tail")))
      .select(col("doc_id"), col("lang"), col("n_bigrams"), col("avg_logp"),
        col("bucket"))

  /** The SERVING form: bucket later documents against a PRE-FITTED CCNet
    * artifact (LM table + frozen cutpoints — fit once on the reference
    * corpus via [[ccnetLpTable]] + [[ccnetCuts]], persist both, assign any
    * later batch). Stateless per input row, so it streams per micro-batch
    * unchanged.
    */
  def ccnetAssign(
      docs: DataFrame, idCol: String, textCol: String, langCol: String,
      lp: DataFrame, cuts: DataFrame): DataFrame =
    ccnetBucketize(ccnetScore(docs, idCol, textCol, langCol, lp), cuts)

  /** Gopher-style document QUALITY RULES (Rae et al. 2021,
    * arXiv:2112.11446 Table A1): the repetition/format heuristics every
    * pretraining pipeline applies before LM-based selection. The five rules
    * meaningful for a whitespace-token corpus (the line-layout and
    * symbol-density rules need raw formatting this corpus doesn't carry;
    * they compose the same way):
    *
    *   r_words    word count within [minWords, maxWords]
    *   r_wordlen  mean word length within [minMeanLen, maxMeanLen]
    *   r_stop     ≥ minStopHits DISTINCT stopwords present (the "is this
    *              natural language at all" check)
    *   r_alpha    ≥ minAlphaFrac of words contain an alphabetic character
    *   r_rep      most-frequent word bigram ≤ maxTop2Frac of all bigrams
    *              (Gopher's duplicate-2-gram rule)
    *
    * `keep` = all five. Everything is ONE scan-level expression chain per
    * document — no explode, no shuffle, no join (the stopword list is a
    * literal array; the per-doc bigram mode is an in-row array fold over a
    * ≤ doc-length array) — so the filter runs at read speed on any corpus
    * size and composes into streaming ingest unchanged.
    *
    * Exactness: ratios round to 6 decimals; rule comparisons are on the
    * rounded values, so bucket membership is engine-exact.
    */
  def gopherRules(
      docs: DataFrame, idCol: String, textCol: String,
      minWords: Int, maxWords: Int,
      minMeanLen: Double, maxMeanLen: Double,
      stopwords: Seq[String], minStopHits: Int,
      minAlphaFrac: Double, maxTop2Frac: Double): DataFrame =
    withGopherFlags(docs.select(col(idCol).as("doc_id"), col(textCol)),
        textCol, minWords, maxWords, minMeanLen, maxMeanLen, stopwords,
        minStopHits, minAlphaFrac, maxTop2Frac)
      .select(col("doc_id"), col("n_words"), col("mean_wlen"), col("stop_hits"),
        col("alpha_frac"), col("top2_frac"), col("r_words"), col("r_wordlen"),
        col("r_stop"), col("r_alpha"), col("r_rep"), col("keep"))

  /** the column-preserving core of [[gopherRules]]: appends the five rule
    * diagnostics + `keep` to the input, KEEPING every input column — so a
    * streaming admission chain can filter on `keep` inside the same scan
    * instead of computing the report and semi-joining the batch back to
    * itself (the r15 q_stream_admit shape: two extra batch scans + a join
    * per trigger). One body, two entry points — the report's and the
    * filter's values can never diverge.
    */
  def withGopherFlags(
      docs: DataFrame, textCol: String,
      minWords: Int, maxWords: Int,
      minMeanLen: Double, maxMeanLen: Double,
      stopwords: Seq[String], minStopHits: Int,
      minAlphaFrac: Double, maxTop2Frac: Double): DataFrame = {
    val stopLit = array(stopwords.map(lit(_)): _*)
    docs.withColumn("__t", TextOps.tokens(col(textCol)))
      .withColumn("n_words", size(col("__t")).cast("long"))
      .withColumn("mean_wlen", round(
        aggregate(col("__t"), lit(0L), (a, t) => a + length(t))
          .cast("double") / col("n_words"), 6))
      .withColumn("stop_hits",
        size(array_intersect(array_distinct(col("__t")), stopLit)).cast("long"))
      .withColumn("alpha_frac", round(
        size(filter(col("__t"), t => t.rlike("[a-zA-Z]")))
          .cast("double") / col("n_words"), 6))
      .withColumn("__bg", array_sort(TextOps.shinglesAll(col("__t"), 2)))
      // max multiplicity as the longest EQUAL-RUN of the sorted array — one
      // O(L log L) sort + one linear fold. The count-per-distinct-element
      // form (transform(array_distinct(bg), b -> size(filter(bg, ...))))
      // computes the same value but re-evaluates its `bg` argument inside
      // the nested lambda: when a caller FILTERS on `keep`, predicate
      // pushdown substitutes this whole tree into the predicate, where
      // codegen gets no subexpression elimination and the re-evaluation
      // compounds to O(L³) per document — measured 130 s vs 3 s on the
      // funnel keep-set at sf0.1. The run-length fold touches each element
      // once no matter where Catalyst splices it.
      .withColumn("top2_frac",
        when(size(col("__bg")) === 0, lit(0.0))
          .otherwise(round(
            aggregate(col("__bg"),
              struct(lit("").as("prev"), lit(0).as("run"), lit(0).as("best")),
              (acc, x) => {
                val run = when(x === acc.getField("prev"),
                  acc.getField("run") + 1).otherwise(lit(1))
                struct(x.as("prev"), run.as("run"),
                  greatest(acc.getField("best"), run).as("best"))
              },
              acc => acc.getField("best"))
              .cast("double") / size(col("__bg")), 6)))
      .withColumn("r_words", col("n_words").between(minWords, maxWords))
      .withColumn("r_wordlen", col("mean_wlen").between(minMeanLen, maxMeanLen))
      .withColumn("r_stop", col("stop_hits") >= minStopHits)
      .withColumn("r_alpha", col("alpha_frac") >= minAlphaFrac)
      .withColumn("r_rep", col("top2_frac") <= maxTop2Frac)
      .withColumn("keep", col("r_words") && col("r_wordlen") && col("r_stop") &&
        col("r_alpha") && col("r_rep"))
      .drop("__t", "__bg")
  }

  /** Driver-side fetch of the fitted artifact as a dense lr6 array — a
    * BOUNDED collect (exactly `buckets` rows, the centroid/model-literal
    * convention; never corpus-sized). The array feeds the scan-level
    * serving form below.
    */
  def dsirLr6Array(bucketTable: DataFrame, buckets: Int): Array[Long] = {
    val rows = bucketTable
      .select(col("bucket"), round(col("logr") * 1e6).cast("long").as("lr6"))
      .collect()
    // LOUD on partial artifacts: a sparse/filtered table would silently
    // score its missing buckets as 0 instead of the smoothed default the
    // dense [[dsirBucketTable]] carries — refuse rather than bias
    require(rows.length == buckets &&
        rows.map(_.getLong(0)).toSet == (0L until buckets).toSet,
      s"bucket table must be DENSE over 0..${buckets - 1} " +
        s"(got ${rows.length} rows) - fit it with dsirBucketTable(buckets = $buckets)")
    val arr = Array.fill[Long](buckets)(0L)
    rows.foreach(r => arr(r.getLong(0).toInt) = r.getLong(1))
    arr
  }

  /** Scoring against an already-fetched lr6 array — the streaming/online
    * entry point (a micro-batch cannot collect the artifact itself). Same
    * [[scoreLr6]] body as the batch serving form, so the two schemas and
    * values can never diverge.
    */
  def dsirScoreStream(
      docs: DataFrame, idCol: String, textCol: String,
      lr6: Array[Long], buckets: Int): DataFrame =
    scoreLr6(docs, idCol, textCol, lr6, buckets)
      .select(col("doc_id"), col("n_grams"), col("logw"))

  /** THE scorer — one body for batch serving, streaming serving and the
    * resampler: the whole per-doc weight is one codegen'd expression chain
    * (hash → bucket → literal-array lookup → exact long fold), no join, no
    * shuffle, no state — safe on an unbounded stream and the fastest batch
    * form alike. Docs with no grams drop (no evidence either way). Keeps
    * the internal exact total `__s6` for [[dsirResample]]; public callers
    * project it away.
    */
  private def scoreLr6(
      docs: DataFrame, idCol: String, textCol: String,
      lr6: Array[Long], buckets: Int): DataFrame = {
    // one array Literal (the trained-classifier convention, TextOps:625) —
    // not 256 CreateArray children inlined per-gram into the lambda
    val lrLit = lit(lr6)
    docs
      .withColumn("__g", gramStream(col(textCol)))
      .withColumn("__s6", aggregate(col("__g"), lit(0L), (acc, g) =>
        acc + element_at(lrLit,
          (TextOps.hash32(g) % buckets).cast("int") + lit(1))))
      .withColumn("n_grams", size(col("__g")).cast("long"))
      .filter(col("n_grams") > 0)
      .withColumn("logw", round(col("__s6").cast("double") / 1e6, 6))
      .select(col(idCol).as("doc_id"), col("n_grams"), col("logw"), col("__s6"))
  }

  /** Selection-cascade ATTRIBUTION report — the per-stage retention funnel
    * every production pretraining pipeline publishes ("N docs in, how many
    * survived quality rules, how many the dedup pass, …"). `stages` are
    * (name, keep-set) pairs applied IN ORDER; the output has one row per
    * stage: `stage_idx, stage, n_in, n_out` with n_in the survivors
    * entering the stage.
    *
    * Shape at 100 TB: each keep-set joins the id spine by id ONLY (no text,
    * no signals — the stage frames project their id column before the
    * join); all cumulative-survival counts come from ONE aggregation over
    * the joined spine (conditional sums — a single pass, |stages| longs of
    * state), and the row-per-stage unpivot explodes the 1-row aggregate,
    * never data. Attribution is sequential (a doc dropped by stage 2 is
    * never charged to stage 3), matching how cascade reports read.
    */
  def cascadeReport(
      docs: DataFrame, idCol: String,
      stages: Seq[(String, DataFrame)]): DataFrame =
    // the global funnel IS the grouped funnel over one constant slice (the
    // per-dim-sums-to-global law, run in reverse) — one body to maintain
    cascadeReportBy(
      docs.select(col(idCol)).withColumn("__alldim", lit("all")),
      idCol, "__alldim", stages)
      .select(col("stage_idx"), col("stage"), col("n_in"), col("n_out"))

  /** [[cascadeReport]] grouped by a DIMENSION (language, source, domain) —
    * "which languages is the quality cascade eating?", the per-slice funnel
    * a mixture-aware pipeline actually reviews (a cascade that keeps 60%
    * overall but 5% of one language is a data-mix bug the global funnel
    * hides). Output: `dim, stage_idx, stage, n_in, n_out`, one funnel per
    * dimension value.
    *
    * Same single-pass shape as the global form — id-only keep-set joins,
    * ONE grouped conditional-sum aggregation (|dims| rows of state), and
    * the per-stage unpivot explodes the |dims|-row aggregate, never data.
    */
  def cascadeReportBy(
      docs: DataFrame, idCol: String, dimCol: String,
      stages: Seq[(String, DataFrame)]): DataFrame = {
    require(stages.nonEmpty, "cascadeReport needs at least one stage")
    stages.foreach { case (name, ks) =>
      // keep-sets are ID-ONLY by contract; a multi-column frame would
      // silently join the spine on whatever column happens to be first
      require(ks.columns.length == 1,
        s"stage '$name' keep-set must be a single id column, " +
          s"got ${ks.columns.mkString(", ")}")
    }
    var spine = docs.select(col(idCol).as("__id"), col(dimCol).as("dim"))
    stages.zipWithIndex.foreach { case ((_, ks), i) =>
      spine = spine.join(
        ks.select(col(ks.columns.head).as("__id")).distinct()
          .withColumn(s"__k$i", lit(1)),
        Seq("__id"), "left")
    }
    val cums = stages.indices.map { i =>
      sum((0 to i).map(j => coalesce(col(s"__k$j"), lit(0))).reduce(_ * _))
        .as(s"__c$i")
    }
    val agg = spine.groupBy(col("dim"))
      .agg(count(lit(1)).as("__n0"), cums: _*)
    val rows = stages.map(_._1).zipWithIndex.map { case (name, i) =>
      val nIn = if (i == 0) col("__n0") else col(s"__c${i - 1}")
      struct(lit(i + 1).as("stage_idx"), lit(name).as("stage"),
        nIn.as("n_in"), col(s"__c$i").as("n_out"))
    }
    agg.select(col("dim"), explode(array(rows: _*)).as("__r"))
      .select(col("dim"), col("__r.*"))
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
      isTarget: Column, buckets: Int, k: Int): DataFrame =
    dsirResampleAgainst(docs, idCol, textCol,
      dsirLr6Array(dsirBucketTable(docs, idCol, textCol, isTarget, buckets),
        buckets), buckets, k)

  /** [[dsirResample]] against an already-fetched lr6 artifact — the serving
    * form (fit once on the reference crawl, resample any later batch): the
    * scoring is the same scan-level [[scoreLr6]] chain, so the whole pick
    * is one corpus scan + one `TakeOrderedAndProject`.
    */
  def dsirResampleAgainst(
      docs: DataFrame, idCol: String, textCol: String,
      lr6: Array[Long], buckets: Int, k: Int): DataFrame = {
    val scores = scoreLr6(docs, idCol, textCol, lr6, buckets)
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
