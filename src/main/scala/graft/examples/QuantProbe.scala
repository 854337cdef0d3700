package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.ops.Similarity

/** Piece-timing probe for the long-flat ~3.6 s q_embed_quantize row (stable
  * r15→r18): a 2000-row × 64-dim scan-level quantization should cost
  * milliseconds, so the wall is structural — this isolates which piece
  * (scan, HOF chain, digest, orderBy, noop sink, codegen) owns it.
  */
object QuantProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Unit): Unit = {
      val t0 = System.nanoTime(); f
      println(f"[quant] $name%-34s ${(System.nanoTime() - t0) / 1e9}%6.2f s")
    }
    def noop(df: DataFrame): Unit =
      df.write.format("noop").mode("overwrite").save()
    val emb = graft.Tables.embeddings(spark, dir)
    t("warm scan count")(emb.count())
    val full = Similarity.quantizeInt8(emb, "vec_id", "embedding")
      .orderBy(col("vec_id"))
    t("full gate 1st")(noop(full))
    t("full gate 2nd (same df)")(noop(full))
    t("rebuilt gate")(noop(
      Similarity.quantizeInt8(emb, "vec_id", "embedding").orderBy(col("vec_id"))))
    t("no orderBy")(noop(Similarity.quantizeInt8(emb, "vec_id", "embedding")))
    t("no orderBy 2nd")(noop(Similarity.quantizeInt8(emb, "vec_id", "embedding")))
    val vd = transform(col("embedding"), x => x.cast("double"))
    t("digest only")(noop(emb.select(col("vec_id"),
      md5(array_join(transform(vd, x => x.cast("string")), ",")).as("d"))))
    t("maxabs only")(noop(emb.select(col("vec_id"),
      array_max(transform(vd, x => abs(x))).as("m"))))
    spark.stop()
  }
}
