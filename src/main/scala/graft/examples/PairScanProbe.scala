package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Retrieval

/** Isolates the forward-scorer pair-scan cost (dev probe). */
object PairScanProbe {
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
      println(f"[probe] $name%-34s ${(System.nanoTime() - t0) / 1e9}%7.2f s")
      r
    }
    val docs = Tables.documents(spark, dir)
    val stats = Retrieval.bm25StatsTable(docs, "doc_id", "text").localCheckpoint(true)
    val qdocs = docs.filter(col("doc_id") % 10 === 0) // ~500 queries at sf0.1
    val qterms = qdocs
      .select(col("doc_id").as("query_id"),
        explode(array_distinct(graft.ops.TextOps.tokens(col("text")))).as("tok"))
      .filter(col("tok") =!= "")
    val idf6 = round(log10(
      (col("n_docs").cast("double") - col("df").cast("double") + lit(0.5)) /
        (col("df").cast("double") + lit(0.5))), 6)
    val avgdl = col("sumdl") / col("n_docs").cast("double")
    val tfn = (col("tf").cast("double") * lit(2.2)) /
      (col("tf").cast("double") +
        lit(1.2) * (lit(0.25) + lit(0.75) * (col("dl").cast("double") / avgdl)))
    val fwd = stats.withColumn("__c6", round(round(idf6 * tfn, 6) * lit(1e6)).cast("long"))
      .groupBy(col("doc_id"))
      .agg(sort_array(collect_list(struct(col("tok"), col("__c6")))).as("__ts"))
      .select(col("doc_id"),
        transform(col("__ts"), x => x.getField("tok")).as("__dtoks"),
        transform(col("__ts"), x => x.getField("__c6")).as("__dc6"))
      .localCheckpoint(true)
    println("  fwd rows=" + fwd.count() + " parts=" + fwd.rdd.getNumPartitions)
    val qarr = qterms.groupBy(col("query_id"))
      .agg(sort_array(collect_set(col("tok"))).as("__qtoks"))
      .localCheckpoint(true)
    println("  qarr rows=" + qarr.count())
    val joined = fwd.crossJoin(broadcast(qarr))
    t("bare crossJoin count")(println("  pairs=" + joined.count()))
    val trivial = joined.select((size(col("__dtoks")) + size(col("__qtoks"))).as("z"))
    t("crossJoin + trivial proj noop")(
      trivial.write.format("noop").mode("overwrite").save())
    val one = joined.withColumn("__sn", graft.functions.SortedTermsScore(
        col("__dtoks"), col("__dc6"), col("__qtoks")))
      .select(col("query_id"), col("doc_id"), col("__sn"))
    t("score eval once noop")(one.write.format("noop").mode("overwrite").save())
    val three = joined.withColumn("__sn", graft.functions.SortedTermsScore(
        col("__dtoks"), col("__dc6"), col("__qtoks")))
      .filter(col("__sn").getField("n") > 0)
      .filter(col("doc_id") =!= col("query_id"))
      .select(col("query_id"), col("doc_id"),
        col("__sn").getField("s").as("__s"),
        col("__sn").getField("n").as("n_terms"))
    t("score gate shape noop")(three.write.format("noop").mode("overwrite").save())
    println(three.queryExecution.executedPlan.toString.split("\n")
      .filter(l => l.contains("Join") || l.contains("Codegen") || l.contains("Filter"))
      .mkString("\n"))
    spark.stop()
  }
}
