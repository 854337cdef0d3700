package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.{Dedup, Selection}

/** Dev probe: bisect q_select_funnel's wall time — each keep-set alone,
  * then cascadeReport with growing stage lists.
  */
object FunnelProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-funnel-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    def t(name: String)(f: => Long): Unit = {
      val t0 = System.nanoTime()
      val n = f
      println(f"[probe] $name%-28s ${(System.nanoTime() - t0) / 1e9}%8.2f s  ($n rows)")
    }
    val docs = Tables.documents(spark, dir)
    def gop = Selection.gopherRules(docs, "doc_id", "text",
      20, 1000, 3.0, 4.7, Seq("the", "a", "and", "of", "to", "in", "is", "that"),
      2, 0.8, 0.06).filter(col("keep")).select(col("doc_id"))
    def cc = Selection.ccnetBuckets(docs, "doc_id", "text", "lang")
      .filter(col("bucket") =!= "tail").select(col("doc_id"))
    def ded = Dedup.softDedupWeights(docs, "doc_id", "text", 16, 4, 3, 0.2)
      .filter(col("doc_id") === col("label")).select(col("doc_id"))
    def dec = graft.ops.Decontam.flags(docs, "doc_id", "text",
      docs.filter(col("doc_id") % 97 === 0), "text", 5)
      .filter(col("kept") === 1).select(col("doc_id"))
    def funnel = Selection.cascadeReport(docs, "doc_id",
      Seq("gopher" -> gop, "ccnet" -> cc, "dedup" -> ded, "decontam" -> dec))
    t("funnel warm")(funnel.count())
    t("funnel run1")(funnel.count())
    t("funnel run2")(funnel.count())
    def funnelLang = Selection.cascadeReportBy(docs, "doc_id", "lang",
      Seq("gopher" -> gop, "ccnet" -> cc, "dedup" -> ded, "decontam" -> dec))
    t("funnel_lang run1")(funnelLang.count())
    spark.stop()
  }
}
