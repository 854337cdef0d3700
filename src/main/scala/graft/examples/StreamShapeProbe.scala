package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.streaming.StreamingQueryListener

/** Print each stream twin's state shape — stateful operator count and the
  * distinct state-store shuffle-partition counts — from the twin's own
  * StreamingQueryProgress, with the SESSION batch default set to a sentinel
  * (7) so the [[graft.streaming.Streams.withStreamShuffle]] dispatch is
  * observable per twin. Used to record the golden table StreamShapeSpec
  * pins (r18 verdict ask #5).
  *
  * sbt "runMain graft.examples.StreamShapeProbe [sfDir]"
  */
object StreamShapeProbe {

  /** last-generation progress collector (same run-id attribution scheme as
    * Bench.StreamStats, reduced to what the shape pin needs)
    */
  final class ShapeStats extends StreamingQueryListener {
    import StreamingQueryListener._
    private val gen = new java.util.concurrent.atomic.AtomicInteger(0)
    private val runGen =
      new java.util.concurrent.ConcurrentHashMap[java.util.UUID, Integer]()
    // per query-id: (stateful operator count, distinct numShufflePartitions)
    private val shapes =
      new java.util.concurrent.ConcurrentHashMap[java.util.UUID, (Int, Set[Long])]()
    val batches = new java.util.concurrent.atomic.AtomicInteger(0)
    def reset(): Unit = { gen.incrementAndGet(); batches.set(0); shapes.clear() }
    def shape: (Int, Set[Long]) = {
      var ops = 0; var parts = Set.empty[Long]
      shapes.values.forEach { case (o, p) => ops = math.max(ops, o); parts ++= p }
      (ops, parts)
    }
    override def onQueryStarted(e: QueryStartedEvent): Unit =
      runGen.put(e.runId, Integer.valueOf(gen.get()))
    override def onQueryProgress(e: QueryProgressEvent): Unit = {
      val g = runGen.get(e.progress.runId)
      if (g != null && g.intValue == gen.get()) {
        batches.incrementAndGet()
        val ops = e.progress.stateOperators.length
        val parts = e.progress.stateOperators.map(_.numShufflePartitions).toSet
        shapes.put(e.progress.id, (ops, parts))
      }
    }
    override def onQueryTerminated(e: QueryTerminatedEvent): Unit = {
      runGen.remove(e.runId); ()
    }
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.001")
    val privRoot = s"/tmp/graft_sshape_${ProcessHandle.current().pid()}"
    System.setProperty("graft.scratch.root", s"$privRoot/scratch")
    val spark = SparkSession.builder()
      .master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.warehouse.dir", s"$privRoot/wh")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val stats = new ShapeStats
    spark.streams.addListener(stats)
    def settle(): Unit = {
      var stable = 0; var last = stats.batches.get(); var spins = 0
      while (stable < 2 && spins < 60) {
        Thread.sleep(100)
        val b = stats.batches.get()
        if (b == last) stable += 1 else { stable = 0; last = b }
        spins += 1
      }
    }
    val twins = graft.SparkEntry.queries.keys.filter(_.startsWith("q_stream_"))
      .toSeq.sorted
    twins.foreach { name =>
      stats.reset()
      // sentinel batch default: a twin that silently skips the 4-partition
      // dispatch shows 7-partition state stores here
      spark.conf.set("spark.sql.shuffle.partitions", "7")
      try {
        graft.SparkEntry.queries(name)(spark, dir)
          .write.format("noop").mode("overwrite").save()
        settle()
        val (ops, parts) = stats.shape
        println(s"SHAPE $name ops=$ops parts=${parts.toSeq.sorted.mkString("/")}")
      } catch {
        case e: Throwable => println(s"SHAPE $name ERR ${e.getClass.getSimpleName}")
      } finally spark.conf.set("spark.sql.shuffle.partitions", "4")
    }
    def rm(f: java.io.File): Unit = {
      if (f.isDirectory) Option(f.listFiles()).foreach(_.foreach(rm))
      f.delete(): Unit
    }
    rm(new java.io.File(privRoot))
    spark.stop()
  }
}
