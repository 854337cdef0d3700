package graft.examples
import org.apache.spark.sql.SparkSession
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val docs = graft.Tables.documents(spark, "/root/testdata/sf0.001")
    val lex = graft.ops.Retrieval.bm25TopK(docs, "doc_id", "text",
      docs.filter(org.apache.spark.sql.functions.col("doc_id") < 3), "doc_id", "text", 10, excludeSelf = true)
    val p = lex.queryExecution.executedPlan.toString
    println("GENERATES=" + "Generate explode".r.findAllIn(p).size)
    println("DOCSCANS=" + "documents.parquet".r.findAllIn(p).size)
    println("RDDSCANS=" + "Scan ExistingRDD".r.findAllIn(p).size)
    println("BHJ=" + p.contains("BroadcastHashJoin"))
    spark.stop()
  }
}
