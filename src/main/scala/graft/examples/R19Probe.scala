package graft.examples

import org.apache.spark.sql.SparkSession

import graft.{SparkEntry, Tables}

/** Round-19 measurement probe: splits each gate's wall into DataFrame
  * CONSTRUCTION (driver-side fits/collects inside the query builder) vs
  * EXECUTION (noop sink of the returned frame), the attribution the
  * optimization round needs before touching anything. Matches the bench's
  * session shape (local[N] from SPARK_GRAFT_CPUS, AQE on, per-PID scratch).
  *
  * `sbt "runMain graft.examples.R19Probe q_a q_b ..."` or
  * `tools/jrun.sh graft.examples.R19Probe q_a q_b ...`; env
  * SPARK_GRAFT_SF_DIR picks the data (default sf0.1), R19_PROBE_REPS the
  * per-gate sample count (default 3; first sample is labeled cold).
  */
object R19Probe {
  def main(args: Array[String]): Unit = {
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val reps = sys.env.getOrElse("R19_PROBE_REPS", "3").toInt
    val scratch = s"/tmp/graft_r19probe_${ProcessHandle.current().pid()}"
    System.setProperty("graft.scratch.root", scratch)
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir", s"$scratch/spark")
      // match the bench session: without the small-split override every
      // ~10 MB testdata table scans as ONE task and the probe measures a
      // single core (first probe run was 3-10x the bench walls)
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.sql.files.openCostInBytes", "262144")
      .config("spark.sql.warehouse.dir", s"$scratch/wh")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    // stage-level attribution: wall between stage submit and completion per
    // stage (captures scheduling + run), plus summed task run time
    val stages = new java.util.concurrent.ConcurrentLinkedQueue[(String, Int, Long, Long)]()
    spark.sparkContext.addSparkListener(new org.apache.spark.scheduler.SparkListener {
      override def onStageCompleted(
          sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
        val si = sc.stageInfo
        val wall = (for {
          s <- si.submissionTime; c <- si.completionTime
        } yield c - s).getOrElse(-1L)
        stages.add((si.name.takeWhile(_ != '\n').take(60), si.numTasks,
          wall, si.taskMetrics.executorRunTime))
      }
    })
    val detail = sys.env.get("R19_PROBE_STAGES").exists(_ == "1")

    val names = if (args.nonEmpty) args.toSeq else Seq("q_ann_opq")
    names.foreach { n =>
      (1 to reps).foreach { i =>
        stages.clear()
        val t0 = System.nanoTime()
        val df = SparkEntry.queries(n)(spark, sfDir)
        val t1 = System.nanoTime()
        val nStagesBuild = stages.size()
        df.write.format("noop").mode("overwrite").save()
        val t2 = System.nanoTime()
        println(f"[r19probe] $n%-28s rep=$i build=${(t1 - t0) / 1e9}%7.3f exec=${(t2 - t1) / 1e9}%7.3f total=${(t2 - t0) / 1e9}%7.3f stages=${nStagesBuild}+${stages.size() - nStagesBuild}")
        if (detail && i == reps) {
          import scala.jdk.CollectionConverters._
          stages.asScala.toSeq.sortBy(-_._3).take(12).foreach { case (nm, nt, w, rt) =>
            println(f"[r19stage]   wall=${w / 1e3}%7.3f taskSum=${rt / 1e3}%8.3f tasks=$nt%4d $nm")
          }
        }
      }
    }
    spark.stop()
    // best-effort scratch cleanup (mirrors the bench's per-PID discipline)
    def rm(p: java.io.File): Unit = {
      if (p.isDirectory) p.listFiles().foreach(rm)
      p.delete()
    }
    rm(new java.io.File(scratch))
  }
}
