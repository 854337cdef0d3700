package graft.examples

import org.apache.spark.sql.SparkSession

/** Convergence probe for the q_graph_ppr drift adjudication (r16 verdict
  * ask #2): the row moved 3.2 → 4.3–4.6 s across r16/r17 quiet runs with
  * byte-identical code (since r13) and identical plans, so box noise is not
  * a sufficient explanation and cold ONLY-runs (declining 7.0 → 4.7 over 3
  * samples) cannot settle it. This main times the exact gate body N times
  * in ONE otherwise-empty session: if the in-session converged wall returns
  * to the r15 era's ~3.2 s, the in-suite value is context (block-manager /
  * JIT pressure from the 340 preceding rows); if it stays ~4.3 s, the
  * slowdown is environmental/persistent and bisectable.
  */
object PprProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val n = args.lift(1).map(_.toInt).getOrElse(8)
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .appName("graft-ppr-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val walls = (0 until n).map { _ =>
      val t0 = System.nanoTime()
      graft.SparkEntry.queries("q_graph_ppr")(spark, sfDir)
        .write.format("noop").mode("overwrite").save()
      (System.nanoTime() - t0) / 1e9
    }
    println(walls.map(t => f"$t%.3f").mkString("ppr_walls=[", ",", "]"))
    spark.stop()
  }
}
