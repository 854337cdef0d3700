package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.tdf.TDF

/** Benchmark main — one JSON line for the driver (BENCH_r{N}.json).
  *
  * Mirrors the reference protocol (benchmarks/benchmark.cxx:24-35,159-189):
  * warm-up pass then one measured pass per workload. The flagship workload is
  * the reference benchmark chain (Define → Filter → Define → Histo,
  * benchmarks/benchmark.cxx:113-122) through the facade, measured both
  * single-partition (the "1-thread TDF" row) and fully parallel; the rest are
  * headline queries covering joins, grouped agg, windows, dedup, ANN and
  * sessionization at the round's scale factor.
  */
object Bench {

  private def flagship(s: SparkSession, dir: String, partitions: Int): Unit = {
    val base = Tables.lineitem(s, dir)
    // coalesce (not repartition): the 1-partition row must measure
    // single-threaded execution, not an extra shuffle
    val src = if (partitions > 0) base.coalesce(partitions) else base
    val d = TDF(src)
      .Define("z", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .Filter(col("z") > 1000.0)
      .Define("z2", col("z") * col("l_quantity"))
    val h = d.Histo("z2", 128, 0.0, 6000000.0)
    val c = d.Count()
    h(); c() // one fused job
  }

  /** The reference benchmark histograms a per-event COLLECTION
    * (tracks_pts: vector<double>, benchmarks/benchmark.cxx:120-122); lineitem
    * has no array column, so a 3-element derived array stands in — elementwise
    * fill through the same native aggregate.
    */
  private def flagshipArray(s: SparkSession, dir: String): Unit = {
    val d = TDF(Tables.lineitem(s, dir))
      .Define("z", col("l_extendedprice") * (lit(1.0) - col("l_discount")))
      .Filter(col("z") > 1000.0)
      .Define("zs", array(col("z"), col("z") * 0.5, col("z") * col("l_quantity")))
    d.Histo("zs", 128, 0.0, 6000000.0)()
  }

  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .appName("graft-bench")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      // local testdata files are ~10 MB; the 128 MB default would hand each
      // table to ONE task and leave 31 cores idle. On a real cluster this is
      // the same lever, sized so scan tasks cover the executor cores.
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // noop sink: executes the FULL plan users run (a bare .count() would let
    // Catalyst drop final orderBy / unreferenced projections and under-measure
    // the ordered outputs)
    def sink(name: String): () => Unit =
      () => SparkEntry.queries(name)(spark, sfDir)
        .write.format("noop").mode("overwrite").save()

    val headline: Seq[(String, () => Unit)] = Seq(
      "flagship_histo_chain_p1" -> (() => flagship(spark, sfDir, 1)),
      "flagship_histo_chain" -> (() => flagship(spark, sfDir, 0)),
      "flagship_histo_array" -> (() => flagshipArray(spark, sfDir)),
      "q_groupby_agg" -> sink("q_groupby_agg"),
      "q_join_bcast" -> sink("q_join_bcast"),
      "q_window_topk" -> sink("q_window_topk"),
      "q_dedup_minhash_lsh" -> sink("q_dedup_minhash_lsh"),
      "q_dedup_exact" -> sink("q_dedup_exact"),
      "q_ann_bruteforce" -> sink("q_ann_bruteforce"),
      "q_text_quality" -> sink("q_text_quality"),
      "q_sessionize" -> sink("q_sessionize"))

    val results = headline.map { case (name, run) =>
      run() // warm-up (I/O cache, codegen, broadcast reuse)
      val t0 = System.nanoTime()
      try run() catch { case e: Throwable => System.err.println(s"[bench] $name: $e") }
      name -> (System.nanoTime() - t0) / 1e9
    }

    val qs = results.map { case (k, v) => f""""$k":$v%.3f""" }.mkString("{", ",", "}")
    val total = results.map(_._2).sum
    println(f"""{"metric":"total","value":$total%.3f,"unit":"sec","queries":$qs,"sf":"$sfDir"}""")
    spark.stop()
  }
}
