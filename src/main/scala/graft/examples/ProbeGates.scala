package graft.examples

import org.apache.spark.sql.SparkSession

import graft.SparkEntry

/** Time arbitrary gate queries by name under the Bench session config —
  * the subset-bench dev harness (`runMain graft.examples.ProbeGates
  * q_mine_triplets q_text_boilerplate [sf0.1]`). Mirrors Bench's noop-sink
  * protocol (full plan executes, ordered outputs not dropped); prints one
  * line per query with 3 raw samples.
  */
object ProbeGates {
  def main(args: Array[String]): Unit = {
    val (sfArgs, names) = args.partition(_.startsWith("sf"))
    val dir = "/root/testdata/" + sfArgs.headOption.getOrElse("sf0.1")
    val privRoot = s"/tmp/graft_probe_${ProcessHandle.current().pid()}"
    System.setProperty("graft.scratch.root", s"$privRoot/scratch")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.sql.warehouse.dir", s"$privRoot/wh")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    for (n <- names) {
      val samples = (1 to 3).map { _ =>
        val t0 = System.nanoTime()
        SparkEntry.queries(n)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[gate] $n%-28s ${samples.map(s => f"$s%6.2f").mkString(" ")} s")
    }
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    rm(new java.io.File(privRoot))
    spark.stop()
  }
}
