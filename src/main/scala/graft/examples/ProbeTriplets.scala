package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Dedup, Retrieval}

/** Stage-by-stage timing of the q_mine_triplets chain (dev probe). */
object ProbeTriplets {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t[A](name: String)(f: => A): A = {
      val t0 = System.nanoTime()
      val r = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val K = 32; val BAND = 4; val NGRAM = 3; val BM25_TOPK = 10
    val docs = Tables.documents(spark, dir)
    t("docs.count")(docs.count())
    val dups = Dedup.nearDuplicatesLsh(docs, "doc_id", "text", K, BAND, NGRAM)
      .filter(col("jaccard") >= 0.2).localCheckpoint(false)
    t("dups.count")(println("  dups=" + dups.count()))
    val dupBoth = dups.select(col("id_a"), col("id_b"), col("jaccard"))
      .unionByName(dups.select(col("id_b").as("id_a"), col("id_a").as("id_b"),
        col("jaccard")))
    val wp = org.apache.spark.sql.expressions.Window
      .partitionBy(col("id_a")).orderBy(col("jaccard").desc, col("id_b").asc)
    val pos = dupBoth.withColumn("__rn", row_number().over(wp))
      .filter(col("__rn") === 1)
      .select(col("id_a").as("query_id"), col("id_b").as("pos_id"))
    t("pos.count")(println("  anchors=" + pos.count()))
    val qdocs = docs.join(pos.select(col("query_id").as("doc_id")), Seq("doc_id"))
    val stats = t("stats build")(
      Retrieval.bm25StatsTable(docs, "doc_id", "text").localCheckpoint(true))
    t("stats.count")(println("  stats rows=" + stats.count()))
    val qterms = qdocs
      .select(col("doc_id").as("query_id"),
        explode(array_distinct(graft.ops.TextOps.tokens(col("text")))).as("tok"))
      .filter(col("tok") =!= "")
      .localCheckpoint(true)
    t("qterms.count")(println("  qterms=" + qterms.count()))
    val matched = stats.join(broadcast(qterms), Seq("tok"))
      .filter(col("doc_id") =!= col("query_id"))
    t("matched.count")(println("  matched=" + matched.count()))
    val agg = matched.groupBy(col("query_id"), col("doc_id"))
      .agg(count(lit(1)).as("n_terms"))
    t("agg noop")(agg.write.format("noop").mode("overwrite").save())
    // full scoring shape step by step: agg with sum, then + window
    val idf6 = round(log10(
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5))), 6)
    val avgdl = col("sumdl") / col("n_docs").cast("double")
    val tfn = (col("tf").cast("double") * lit(2.2)) /
      (col("tf").cast("double") +
        lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / avgdl)))
    val scored = stats.withColumn("__c6",
      round(round(idf6 * tfn, 6) * lit(1e6)).cast("long"))
    val matched2 = scored.join(broadcast(qterms), Seq("tok"))
      .filter(col("doc_id") =!= col("query_id"))
    val agg2 = matched2.groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__c6")).as("__s"), count(lit(1)).as("n_terms"))
    t("agg2 noop")(agg2.write.format("noop").mode("overwrite").save())
    val agg2p = t("agg2 pin")(agg2.localCheckpoint(true))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("query_id")).orderBy(col("__s").desc, col("doc_id").asc)
    val ranked = agg2p.withColumn("rank",
      org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rank") <= BM25_TOPK)
    t("window on pinned agg")(ranked.write.format("noop").mode("overwrite").save())
    // same agg with the scored stats MATERIALIZED before the join — does a
    // barrier stop Catalyst deferring the __c6 projection past the join?
    val scoredPinned = t("scored pin")(
      scored.select(col("tok"), col("doc_id"), col("__c6")).localCheckpoint(true))
    val agg3 = scoredPinned.join(broadcast(qterms), Seq("tok"))
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__c6")).as("__s"), count(lit(1)).as("n_terms"))
    t("agg3 noop (pinned scored)")(agg3.write.format("noop").mode("overwrite").save())
    // variant: scored stats REPARTITIONED BY doc_id before the pin — does
    // HashPartitioning(doc_id) satisfy the (query_id, doc_id) grouping so
    // the 42M-row pre-agg exchange disappears?
    val scoredPart = t("scored part pin")(
      scored.repartition(col("doc_id"))
        .select(col("tok"), col("doc_id"), col("__c6")).localCheckpoint(true))
    val agg4 = scoredPart.join(broadcast(qterms), Seq("tok"))
      .filter(col("doc_id") =!= col("query_id"))
      .groupBy(col("query_id"), col("doc_id"))
      .agg(sum(col("__c6")).as("__s"), count(lit(1)).as("n_terms"))
    val nExch = agg4.queryExecution.executedPlan.toString
      .split("\n").count(_.contains("Exchange"))
    println("  agg4 exchanges in plan = " + nExch)
    t("agg4 noop (doc_id part)")(agg4.write.format("noop").mode("overwrite").save())
    val ranked4 = agg4.withColumn("rank",
      org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rank") <= BM25_TOPK)
    t("agg4 + window noop")(ranked4.write.format("noop").mode("overwrite").save())
    val hits = Retrieval.bm25TopKStoredForward(stats, qdocs, "doc_id", "text",
      BM25_TOPK, excludeSelf = true)
    t("hits noop (forward)")(hits.write.format("noop").mode("overwrite").save())
    t("hits noop (forward 2nd)")(hits.write.format("noop").mode("overwrite").save())
    // forward sub-stages
    val scored6 = stats.withColumn("__c6",
      round(round(idf6 * tfn, 6) * lit(1e6)).cast("long"))
    val fwd = scored6
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("tok"), col("__c6")))).as("__ts"))
      .select(col("doc_id"),
        transform(col("__ts"), x => x.getField("tok")).as("__dtoks"),
        transform(col("__ts"), x => x.getField("__c6")).as("__dc6"))
    t("fwd index noop")(fwd.write.format("noop").mode("overwrite").save())
    val fwdPin = t("fwd pin")(fwd.localCheckpoint(true))
    val qarr = qterms.groupBy(col("query_id"))
      .agg(sort_array(collect_set(col("tok"))).as("__qtoks"))
    val pairs0 = fwdPin.crossJoin(broadcast(qarr))
      .withColumn("__sn", graft.functions.SortedTermsScore(
        col("__dtoks"), col("__dc6"), col("__qtoks")))
      .filter(col("__sn").getField("n") > 0)
      .filter(col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("doc_id"),
        col("__sn").getField("s").as("__s"),
        col("__sn").getField("n").as("n_terms"))
    t("pair scan noop")(pairs0.write.format("noop").mode("overwrite").save())
    val ranked5 = pairs0.withColumn("rank",
      org.apache.spark.sql.functions.row_number().over(w))
      .filter(col("rank") <= BM25_TOPK)
    t("pair scan + window noop")(ranked5.write.format("noop").mode("overwrite").save())
    val hitsOld = Retrieval.bm25TopKStored(stats, qdocs, "doc_id", "text",
      BM25_TOPK, excludeSelf = true)
    t("hits noop (postings)")(hitsOld.write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
