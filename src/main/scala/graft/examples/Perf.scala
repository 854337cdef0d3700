package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.functions.HistogramAggregator

/** Micro-benchmarks for the histogram hot path and similarity kernels.
  * sbt "runMain graft.examples.Perf [sfDir]"
  */
object Perf {
  def time(name: String)(f: => Unit): Unit = {
    f // warmup
    val runs = 3
    val t0 = System.nanoTime()
    (0 until runs).foreach(_ => f)
    println(f"[perf] $name%-32s ${(System.nanoTime() - t0) / 1e9 / runs}%8.3f s")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val li = Tables.lineitem(spark, dir)
    def z = col("l_extendedprice") * (lit(1.0) - col("l_discount"))
    def zdf = li.withColumn("z", z).withColumn("z2", col("z") * col("l_quantity"))
      .filter(col("z") > 1000.0)

    time("scan+count")(li.count(): Unit)
    time("fused agg count+min+max+mean")(
      zdf.agg(count(lit(1)), min("z2"), max("z2"), avg("z2")).collect(): Unit)
    time("histo via udaf Aggregator")(
      zdf.agg(HistogramAggregator.histo(array(col("z2")), 128, 0.0, 6000000.0)).collect(): Unit)
    time("histo via native TypedImpAgg")(
      zdf.agg(graft.functions.HistogramAggExpr.histo(col("z2"), 128, 0.0, 6000000.0))
        .collect(): Unit)
    time("histo native, pre-projected input")(
      zdf.select(col("z2").as("__hin"))
        .agg(graft.functions.HistogramAggExpr.histo(col("__hin"), 128, 0.0, 6000000.0))
        .collect(): Unit)
    time("histo via bucket groupBy")(
      zdf.select(least(floor(col("z2") / lit(6000000.0 / 128)), lit(127)).as("b"))
        .groupBy("b").count().collect(): Unit)
    time("histo via width_bucket gb")(
      zdf.select(width_bucket(col("z2"), lit(0.0), lit(6000000.0), lit(128)).as("b"))
        .groupBy("b").count().collect(): Unit)

    // NOTE: a repartition(p)-based scaling sweep was tried and removed — the
    // repartition shuffle dominates at sf0.1 file sizes and masks the agg
    // scaling; the meaningful local evidence is the p1-vs-parallel flagship
    // rows in Bench plus the plan-shape assertions in ScaleSpec.

    val orders = Tables.orders(spark, dir)
    val cust = Tables.customer(spark, dir)
    val nat = Tables.nation(spark, dir)
    def rev = (col("l_extendedprice") * (lit(1.0) - col("l_discount"))).cast("decimal(18,4)")
    time("join: li->o->c->n direct") {
      li.withColumn("rev", rev)
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name")).agg(sum(col("rev")), count(lit(1))).collect(): Unit
    }
    time("join: pre-agg li by orderkey") {
      li.withColumn("rev", rev).groupBy(col("l_orderkey"))
        .agg(sum(col("rev")).as("rev"), count(lit(1)).as("n"))
        .join(orders, col("l_orderkey") === col("o_orderkey"))
        .join(broadcast(cust), col("o_custkey") === col("c_custkey"))
        .join(broadcast(nat), col("c_nationkey") === col("n_nationkey"))
        .groupBy(col("n_name")).agg(sum(col("rev")), sum(col("n"))).collect(): Unit
    }

    val emb = Tables.embeddings(spark, dir)
    val q = emb.filter(col("vec_id") < 10)
    time("ann brute: HOF aggregate/zip_with") {
      import graft.ops.Similarity
      Similarity.bruteForceTopK(emb, q, "vec_id", "embedding", 5).count(): Unit
    }
    spark.stop()
  }
}
