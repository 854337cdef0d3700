package graft.examples
import org.apache.spark.sql.SparkSession
object PlanProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("GRAFT_PROBE_SF_DIR", "/root/testdata/sf0.001")
    for (name <- args) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      val p = df.queryExecution.executedPlan.toString
      val bc = "BroadcastExchange".r.findAllIn(p).size
      val reused = "ReusedExchange".r.findAllIn(p).size
      val ex = "Exchange".r.findAllIn(p).size
      val cart = "CartesianProduct".r.findAllIn(p).size +
        "BroadcastNestedLoopJoin BuildRight, Inner".r.findAllIn(p).size
      println(s"PLAN $name shuffles=${ex - bc - reused} broadcasts=$bc " +
        s"reused=$reused cartesians=$cart")
    }
    spark.stop()
  }
}
