package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.TextOps

/** r19 micro-probe: which half of the fingerprint gate costs — the DISTINCT
  * char-shingle set build (ShingleExprs kernel) or the md5 gram hashing
  * (WinnowExprs.gramHashes kernel)? Times each expression alone via noop.
  */
object FpProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", 32)
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = Tables.documents(spark, sfDir)
    def t(name: String)(f: => Unit): Unit = (1 to 3).foreach { i =>
      val t0 = System.nanoTime()
      f
      println(f"[fp] $name%-28s rep=$i ${(System.nanoTime() - t0) / 1e9}%7.3f s")
    }
    t("scan_only") {
      docs.select(col("doc_id"), length(col("text"))).write.format("noop").mode("overwrite").save()
    }
    t("gram_hashes_min") {
      docs.select(col("doc_id"),
        array_min(TextOps.gramHashes(col("text"), 8)).as("fp"))
        .write.format("noop").mode("overwrite").save()
    }
    t("distinct_shingles_size") {
      docs.select(col("doc_id"),
        size(TextOps.charShingles("text", 8)).cast("long").as("n"))
        .write.format("noop").mode("overwrite").save()
    }
    t("hof_md5_over_distinct") {
      docs.withColumn("__grams", TextOps.charShingles("text", 8))
        .select(col("doc_id"),
          array_min(transform(col("__grams"), g => TextOps.hash32(g))).as("fp"))
        .write.format("noop").mode("overwrite").save()
    }
    t("fused_then_orderby") {
      TextOps.withFingerprint(docs, "text", 8)
        .select(col("doc_id"), col("fingerprint"), col("n_grams"))
        .orderBy(col("doc_id"))
        .write.format("noop").mode("overwrite").save()
    }
    t("orderby_then_fused") {
      TextOps.withFingerprint(docs.orderBy(col("doc_id")), "text", 8)
        .select(col("doc_id"), col("fingerprint"), col("n_grams"))
        .write.format("noop").mode("overwrite").save()
    }
    spark.stop()
  }
}
