package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.{SparkEntry, Tables}
import graft.tdf.TDF

/** Plan-inspection utility: prints formatted physical plans for the hot
  * queries so scan pruning / pushdown / broadcast / codegen spans can be
  * reviewed. `sbt "runMain graft.examples.Explain [queryName ...]"`
  */
object Explain {
  def main(args: Array[String]): Unit = {
    val dir = "/root/testdata/sf0.01"
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // the facade's fused multi-action aggregate over the flagship chain
    val d = TDF(Tables.lineitem(spark, dir))
      .Define("z", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .Filter(col("z") > 1000.0)
    println("=== facade fused agg (count+sum+min+max conditional aggregate) ===")
    Tables.lineitem(spark, dir)
      .withColumn("z", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .agg(count(when(col("z") > 1000.0, lit(1))).as("n"),
        min(when(col("z") > 1000.0, col("z"))).as("mn"))
      .explain("formatted")

    println("=== facade direct filter plan (pushdown check) ===")
    d.toDF.select(col("l_quantity")).explain("formatted")

    val names = if (args.nonEmpty) args.toSeq
      else Seq("q_groupby_agg", "q_join_bcast", "q_window_topk", "q_dedup_minhash_lsh",
        "q_ann_bruteforce", "q_asof_join",
        // round-9 compressed-search family: projection must be scan-only,
        // PQ encode scan-level, IVF+PQ probe join broadcast + DPP-pruned
        "q_embed_project", "q_ann_pq", "q_ann_ivf_pq")
    names.foreach { n =>
      println(s"=== $n ===")
      SparkEntry.queries(n)(spark, dir).explain("formatted")
    }
    spark.stop()
  }
}
