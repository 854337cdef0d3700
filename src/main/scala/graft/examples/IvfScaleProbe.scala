package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Similarity

/** Dev probe for the ivf_search_scaled leg's knobs, in the leg's own
  * persisted-search shape (prebuilt int8 index, search-only timing, the
  * un-amplified 100-query set): sweep (centroid sizing, nprobe, Lloyd
  * iterations, train sample) at 10× and 100× shards and print search wall +
  * recall@3 per config — the measurement that picks the sizing baked into
  * [[ScaleCurves.ivfScaledLeg]].
  *
  * Finding r14 (sf0.1): recall@3 vs the amplified exact truth sits at
  * ~0.35 (10×) / ~0.25 (100×) and NO training configuration moves it —
  * Lloyd 1–2 iterations, full or 0.2-sampled, land within noise of the
  * init-only build. The `diag` mode explains why: the exact truth itself
  * is 91% / 99.7% cross-shard Rademacher extreme-value noise at those
  * sizes (see the ScaleCurves header caveat), so the recall ceiling is set
  * by the fixture, not by centroid placement; nprobe is the only live
  * lever (p8 lifts recall to 0.53/0.35 at ~2× probe cost).
  */
object IvfScaleProbe {

  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-ivf-scale-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val queries = Tables.embeddings(spark, sfDir).filter(col("vec_id") < 100)

    def build(tag: String, copies: Int, cents: Int, iters: Int, ts: Double): String = {
      val path = Tables.scratch(s"ivfprobe_${tag}_$copies", sfDir)
      Similarity.writeIvfInt8Index(
        ScaleCurves.amplifyEmbeddings(Tables.embeddings(spark, sfDir), copies),
        "vec_id", "embedding", path, cents,
        trainIters = iters, trainSample = ts, assignKernel = true)
      path
    }
    def search(path: String, nprobe: Int) =
      Similarity.searchIvfInt8Index(spark, path, queries, "vec_id", "embedding",
        3, nprobe, assignKernel = true)
    def recall(path: String, copies: Int, nprobe: Int): Double = {
      val emb = ScaleCurves.amplifyEmbeddings(Tables.embeddings(spark, sfDir), copies)
      val exact = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 3)
      Similarity.recallAtK(search(path, nprobe), exact, 3)
        .agg(avg(col("recall"))).head().getDouble(0)
    }
    def wall(path: String, nprobe: Int): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        search(path, nprobe).write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up
      Seq(once(), once(), once()).sorted.apply(1)
    }

    // (name, cents@10x, cents@100x, nprobe, iters, trainSample)
    val configs = Seq(
      ("sqrtN_p4_it1", 51, 160, 4, 1, 1.0),
      ("sqrtN_p4_it2", 51, 160, 4, 2, 1.0),
      ("sqrtN_p4_it2_ts02", 51, 160, 4, 2, 0.2),
      ("sqrtN_p8_it2", 51, 160, 8, 2, 1.0))
    // `diag` arg: skip the sweep, print only the cross-shard diagnostic
    val sweep = if (args.contains("diag")) Seq.empty else configs
    sweep.foreach { case (name, c1, c10, np, it, ts) =>
      val p1 = build(name, 10, c1, it, ts)
      val p10 = build(name, 100, c10, it, ts)
      val (w1, w10) = (wall(p1, np), wall(p10, np))
      val (r1, r10) = (recall(p1, 10, np), recall(p10, 100, np))
      println(f"[probe] $name%-18s x1=$w1%6.3f s x10=$w10%6.3f s ratio=${w10 / w1}%5.2f " +
        f"recall_x1=$r1%.3f recall_x10=$r10%.3f")
    }

    // WHY recall declines with amplification, verified: the fraction of the
    // EXACT top-3 that is cross-shard (a Rademacher-masked replica of some
    // unrelated vector). Cross-shard cosines are mean-0 noise with std
    // ~1/√dim ≈ 0.125, but the MAX over 450k of them reaches ~0.125·√(2·ln
    // 450k) ≈ 0.64 — extreme-value noise displaces genuine neighbors from
    // the ground truth itself at 100×, and neither an index nor any ANN can
    // (or should) find a foreign shard's noise alignment. The recall pin
    // therefore measures the amplification protocol's limit at 100×, not
    // an operator defect — this diagnostic quantifies exactly how much.
    Seq(10, 100).foreach { copies =>
      val emb = ScaleCurves.amplifyEmbeddings(Tables.embeddings(spark, sfDir), copies)
      val cross = Similarity.bruteForceTopK(emb, queries, "vec_id", "embedding", 3)
        .agg(avg((col("neighbor_id") >= 10000000L).cast("double")).as("f"))
        .head().getDouble(0)
      println(f"[probe] exact-top3 cross-shard fraction at ${copies}x: $cross%.3f")
    }
    spark.stop()
  }
}
