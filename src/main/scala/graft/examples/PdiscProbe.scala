package graft.examples
import org.apache.spark.sql.SparkSession
/** One-off dev probe: Spark's percentile_disc semantics vs DuckDB's. */
object PdiscProbe {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    import spark.implicits._
    Seq(1,2,2,2,3,4,5,5,6,10).toDF("v").createOrReplaceTempView("t")
    spark.sql("""SELECT
      percentile_disc(0.25) WITHIN GROUP (ORDER BY v) AS a25,
      percentile_disc(0.5)  WITHIN GROUP (ORDER BY v) AS a50,
      percentile_disc(0.75) WITHIN GROUP (ORDER BY v) AS a75,
      percentile_disc(0.25) WITHIN GROUP (ORDER BY v DESC) AS d25,
      percentile_disc(0.5)  WITHIN GROUP (ORDER BY v DESC) AS d50,
      percentile_disc(0.75) WITHIN GROUP (ORDER BY v DESC) AS d75
      FROM t""").show()
    spark.stop()
  }
}
