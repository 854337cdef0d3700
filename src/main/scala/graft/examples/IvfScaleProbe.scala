package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Similarity

/** Dev probe for the ivf_search_scaled leg's knobs: sweep (nCents growth,
  * nprobe growth, trainIters, trainSample) at 1× and 10× rows and print
  * wall + recall@3 per config — the measurement that picks the production
  * sizing baked into [[ScaleCurves.ivfScaledLeg]].
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

    def leg(copies: Int, cents: Int, nprobe: Int, iters: Int, ts: Double) = {
      val emb = ScaleCurves.amplifyEmbeddings(Tables.embeddings(spark, sfDir), copies)
      Similarity.ivfTopK(emb, emb.filter(col("vec_id") < 10), "vec_id", "embedding",
        3, cents, nprobe, trainIters = iters, trainSample = ts, assignKernel = true)
    }
    def recall(copies: Int, cents: Int, nprobe: Int, iters: Int, ts: Double): Double = {
      val emb = ScaleCurves.amplifyEmbeddings(Tables.embeddings(spark, sfDir), copies)
      val qs = emb.filter(col("vec_id") < 10)
      val exact = Similarity.bruteForceTopK(emb, qs, "vec_id", "embedding", 3)
      Similarity.recallAtK(leg(copies, cents, nprobe, iters, ts), exact, 3)
        .agg(avg(col("recall"))).head().getDouble(0)
    }
    def wall(copies: Int, cents: Int, nprobe: Int, iters: Int, ts: Double): Double = {
      def once(): Double = {
        val t0 = System.nanoTime()
        leg(copies, cents, nprobe, iters, ts)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      once() // warm-up
      Seq(once(), once(), once()).sorted.apply(1)
    }

    // (name, cents@1x, cents@10x, nprobe@1x, nprobe@10x, iters, trainSample)
    val configs = Seq(
      ("sqrtN_p2", 16, 51, 2, 2, 0, 1.0),
      ("sqrtN_p4", 16, 51, 2, 4, 0, 1.0),
      ("linN_p2", 16, 160, 2, 2, 0, 1.0),
      ("sqrtN_p2_lloyd", 16, 51, 2, 2, 1, 0.5),
      ("sqrtN_p3_lloyd", 16, 51, 2, 3, 1, 0.5))
    configs.foreach { case (name, c1, c10, p1, p10, it, ts) =>
      val w1 = wall(1, c1, p1, it, ts)
      val w10 = wall(10, c10, p10, it, ts)
      val r1 = recall(1, c1, p1, it, ts)
      val r10 = recall(10, c10, p10, it, ts)
      println(f"[probe] $name%-16s x1=$w1%6.3f s x10=$w10%6.3f s ratio=${w10 / w1}%5.2f " +
        f"recall_x1=$r1%.3f recall_x10=$r10%.3f")
    }
    spark.stop()
  }
}
