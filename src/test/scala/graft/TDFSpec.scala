package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.tdf.TDF

/** Port of the reference's core e2e suite (tests/test_misc.cxx TESTs 1-13) and
  * regression files onto Spark fixtures (FIXTURES.md F1/F2/F4).
  */
class TDFSpec extends AnyFunSuite {
  lazy val spark: SparkSession = SparkTest.session
  import spark.implicits._

  // F2-analog fixture: b1 = 0..19 double, b2 = i*i int, dv growing array
  def fixture = {
    val rows = (0 until 20).map { i =>
      (i.toDouble, i * i, Seq(-1.0, 2.0, 3.0, 4.0) ++ (0 to i).map(_.toDouble))
    }
    rows.toDF("b1", "b2", "dv")
  }

  test("TEST 1: no-op filter does not change count") {
    val d = TDF(fixture)
    assert(d.Filter(lit(true)).Count()() == 20L)
  }

  test("TEST 2: forked actions on a shared filter, one trigger") {
    val d = TDF(fixture)
    val f = d.Filter($"b1" % 2 === 0)
    val c1 = f.Count()
    val c2 = f.Filter($"b2" > 25).Count()
    assert(c1() == 10L)
    assert(c2.isReady, "sibling action must be filled by the same shared run")
    assert(c2() == 7L) // b1 even and b1*b1>25 → b1 in {6,8,10,12,14,16,18}
  }

  test("TEST 3: default columns") {
    val d = TDF(fixture, defaultColumns = Seq("b1"))
    assert(d.Min()() == 0.0 && d.Max()() == 19.0)
    intercept[IllegalArgumentException] { TDF(fixture).Min()() }
  }

  test("TEST 4: laziness — nothing runs until first deref, then all run") {
    val d = TDF(fixture)
    val c = d.Count()
    val m = d.Mean("b1")
    assert(!c.isReady && !m.isReady)
    assert(c() == 20L)
    assert(m.isReady)
  }

  test("TEST 7/8: Define, filter on derived column, Define after Filter") {
    val d = TDF(fixture)
    val z = d.Define("z", $"b1" * 2).Filter($"z" >= 20)
    assert(z.Count()() == 10L)
    val zz = z.Define("z2", $"z" * $"z")
    assert(zz.Min("z2")() == 400.0)
  }

  test("TEST 9: Min/Max/Mean on scalar and array columns (golden values)") {
    val d = TDF(fixture)
    assert(d.Min("b2")() == 0.0)
    assert(d.Max("b2")() == 361.0)
    assert(d.Mean("b2")() == 123.5)
    // array golden values from FIXTURES.md F2
    assert(d.Min("dv")() == -1.0)
    assert(d.Max("dv")() == 19.0)
    assert(math.abs(d.Mean("dv")() - 5.1379310344827589) < 1e-12)
  }

  test("TEST 10: Take") {
    val d = TDF(fixture)
    val t = d.Filter($"b1" < 3).Take("b2")
    assert(t().map(_.toString.toInt).sorted == Seq(0, 1, 4))
  }

  test("TEST 11: re-booking after a run starts a fresh batch") {
    val d = TDF(fixture)
    assert(d.Count()() == 20L)
    val again = d.Filter($"b1" > 15).Count()
    assert(!again.isReady)
    assert(again() == 4L)
  }

  test("Define name collision throws (test_branchoverwrite)") {
    intercept[IllegalArgumentException] { TDF(fixture).Define("b1", lit(1)) }
    intercept[IllegalArgumentException] {
      TDF(fixture).Define("x", lit(1)).Define("x", lit(2))
    }
  }

  test("empty-input identities (regression_zeroentries), compat sentinels") {
    val d = TDF(fixture, compat = true).Filter(lit(false))
    assert(d.Count()() == 0L)
    assert(d.Min("b1")() == Double.MaxValue)
    assert(d.Max("b1")() == java.lang.Double.MIN_NORMAL)
    assert(d.Mean("b1")() == 0.0)
    assert(d.Take("b1")().isEmpty)
    val h = d.Histo("b1", 10, 0.0, 10.0)()
    assert(h.entries == 0L && h.counts.forall(_ == 0L))
  }

  test("histogram fixed-range: bins, under/overflow, stats") {
    val d = TDF(fixture)
    val h = d.Histo("b1", 4, 0.0, 20.0)()
    assert(h.counts.toSeq == Seq(5L, 5L, 5L, 5L))
    assert(h.underflow == 0L && h.overflow == 0L && h.entries == 20L)
    assert(h.mean == 9.5)
    val h2 = d.Histo("b1", 2, 5.0, 15.0)()
    assert(h2.underflow == 5L && h2.overflow == 5L)
    assert(h2.counts.toSeq == Seq(5L, 5L))
  }

  test("histogram auto-range covers min..max; array fill is elementwise") {
    val d = TDF(fixture)
    val h = d.Histo("b1", 10)()
    assert(h.lo == 0.0 && h.entries == 20L)
    assert(h.underflow == 0L && h.overflow == 0L)
    assert(h.counts.sum == 20L)
    val ha = d.Histo("dv", 5)()
    assert(ha.entries == fixture.select(sum(size($"dv"))).as[Long].head)
  }

  test("Report cut-flow with named filters") {
    val d = TDF(fixture)
    val rep = d.Filter("even", $"b2" % 2 === 0)
      .Filter("big", $"b2" > 25).Report()()
    assert(rep.map(c => (c.name, c.pass, c.all)) ==
      Seq(("even", 10L, 20L), ("big", 7L, 10L)))
  }

  test("Foreach via accumulator; ForeachSlot slot ids") {
    val d = TDF(fixture)
    val acc = spark.sparkContext.longAccumulator("n")
    d.Filter($"b1" > 9).Foreach(Seq("b2"))(r => acc.add(r.getInt(0)))
    assert(acc.value == (10 until 20).map(i => i * i).sum)
  }

  test("Foreach shares the batch: pending aggregates fill in the same trigger") {
    val d = TDF(fixture)
    val c = d.Count()
    val m = d.Mean("b1")
    val acc = spark.sparkContext.longAccumulator("x")
    d.Filter($"b1" < 5).Foreach(Seq("b1"))(_ => acc.add(1))
    assert(c.isReady && m.isReady, "pending aggregates must fill with the Foreach trigger")
    assert(c() == 20L && m() == 9.5 && acc.value == 5L)
  }

  test("Sum and Reduce") {
    val d = TDF(fixture)
    assert(d.Sum("b1")() == 190.0)
    assert(d.Reduce("b1")(_ + _) == 190.0)
    assert(d.Filter(lit(false)).Sum("b1")() == 0.0)
  }

  test("Accumulate: general typed fold (planned op, TDFGuide.md:379-381)") {
    val d = TDF(fixture)
    // accumulate (count, sum) in one typed fold
    val (n, s) = d.Accumulate("b1", (0L, 0.0)) {
      case ((c, sm), v) => (c + 1, sm + v)
    } { case ((c1, s1), (c2, s2)) => (c1 + c2, s1 + s2) }
    assert(n == 20L && s == 190.0)
    // respects upstream filters; empty input returns init
    assert(d.Filter($"b1" > 100).Accumulate("b1", 7.0)(_ + _)(_ + _) == 7.0)
  }

  test("partition invariance: 1 vs 8 partitions give identical results") {
    val one = TDF(fixture.repartition(1))
    val eight = TDF(fixture.repartition(8))
    assert(one.Mean("b2")() == eight.Mean("b2")())
    val h1 = one.Histo("b1", 7, 0.0, 20.0)()
    val h8 = eight.Histo("b1", 7, 0.0, 20.0)()
    assert(h1.counts.toSeq == h8.counts.toSeq && h1.sumx == h8.sumx)
  }

  test("one fused Spark job per batch; cached results re-deref without new jobs") {
    // count distinct SQL executions (AQE legitimately splits one query into a
    // job per stage, so job count is the wrong fidelity metric)
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val execs = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val listener = new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = {
        val id = s.properties.getProperty("spark.sql.execution.id")
        if (id != null) { execs.add(id); () }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val d = TDF(fixture).Define("z", $"b1" * 3)
      val f = d.Filter($"z" > 10)
      val actions = Seq(f.Count(), f.Sum("z"), d.Mean("b2"), f.Min("z"), d.Max("b1"))
      actions.head() // trigger
      Thread.sleep(600) // let listener events drain
      val afterRun = execs.size()
      assert(afterRun == 1,
        s"5 fused aggregating actions must run as ONE SQL execution, got $afterRun")
      actions.foreach(_.apply()) // all cached — no new executions
      Thread.sleep(600)
      assert(execs.size() == afterRun,
        "re-dereferencing filled results must not launch executions")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("sibling forks: same-named defines with DIFFERENT lambdas do not merge") {
    // Two typed lambdas both lower to ScalaUDFs that render identically
    // (`UDF(b1)`), so textual comparison would silently merge them and the
    // second fork would compute with the FIRST fork's function. Canonicalized
    // semanticEquals keeps the function object in the comparison → per-action
    // fallback, each fork keeps its own lambda.
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val execs = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val listener = new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = {
        val id = s.properties.getProperty("spark.sql.execution.id")
        if (id != null) { execs.add(id); () }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val d = TDF(fixture)
      val f1 = d.Define("z", (x: Double) => x * 2.0, Seq("b1"))
      val f2 = d.Define("z", (x: Double) => x * 10.0, Seq("b1"))
      val s1 = f1.Sum("z")
      val s2 = f2.Sum("z")
      assert(s1() == 380.0) // sum(b1) = 190, lambda ×2
      assert(s2.isReady, "fallback still fills the whole batch in one trigger")
      assert(s2() == 1900.0, "second fork must compute with ITS lambda (×10)")
      Thread.sleep(600)
      assert(execs.size() == 2,
        s"conflicting same-named defines must fall back to per-action jobs, got ${execs.size()}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("sibling forks: same-named semantically-equal native defines still fuse") {
    import org.apache.spark.scheduler.{SparkListener, SparkListenerJobStart}
    val execs = java.util.concurrent.ConcurrentHashMap.newKeySet[String]()
    val listener = new SparkListener {
      override def onJobStart(s: SparkListenerJobStart): Unit = {
        val id = s.properties.getProperty("spark.sql.execution.id")
        if (id != null) { execs.add(id); () }
      }
    }
    spark.sparkContext.addSparkListener(listener)
    try {
      val d = TDF(fixture)
      // two distinct Column objects, same canonical expression → one batch
      val s1 = d.Define("z", $"b1" * 3).Sum("z")
      val s2 = d.Define("z", $"b1" * 3).Filter($"z" > 30).Sum("z")
      assert(s1() == 570.0)
      assert(s2.isReady && s2() == (11 until 20).map(_ * 3.0).sum)
      Thread.sleep(600)
      assert(execs.size() == 1,
        s"semantically equal defines must stay fused in ONE execution, got ${execs.size()}")
    } finally spark.sparkContext.removeSparkListener(listener)
  }

  test("review fixes: filterless Report, invalid histo axis, type mismatches") {
    // Report with zero filters → empty cut-flow, not empty.head crash
    assert(TDF(fixture).Report()().isEmpty)
    // invalid histogram axes rejected at booking
    intercept[IllegalArgumentException] { TDF(fixture).Histo("b1", 0, 0.0, 1.0) }
    intercept[IllegalArgumentException] { TDF(fixture).Histo("b1", 10, 5.0, 1.0) }
    intercept[IllegalArgumentException] { TDF(fixture).Histo("b1", 0) }
    // lo == hi is NOT an error: TH1 auto-range convention (reference default
    // Histo(branch, 128, 0., 0.) means "axis from data")
    val auto = TDF(fixture).Histo("b1", 10, 0.0, 0.0)()
    assert(auto.entries == 20L && auto.lo == 0.0 && auto.counts.sum == 20L)
    // as-of key-type mismatch rejected on the driver
    val l = Seq((1L, 1L)).toDF("k", "t")
    val r = Seq((1, 1L)).toDF("rk", "rt") // Int key vs Long key
    intercept[IllegalArgumentException] {
      graft.plans.AsOfJoin.join(l, r, "k", "rk", "t", "rt")
    }
    // non-double histogram input → analysis error, not executor crash
    val ex = intercept[Exception] {
      fixture.agg(graft.functions.HistogramAggExpr.histo(
        org.apache.spark.sql.functions.col("b2"), 4, 0.0, 10.0)).collect()
    }
    assert(ex.getMessage.contains("graft_histogram"))
  }

  test("CSV, JSON and ORC sources round-trip through the facade") {
    val csvDir = "/tmp/graft_src_csv"
    val jsonDir = "/tmp/graft_src_json"
    fixture.select($"b1", $"b2").write.mode("overwrite")
      .option("header", "true").csv(csvDir)
    fixture.select($"b1", $"b2").write.mode("overwrite").json(jsonDir)
    val fromCsv = TDF.readCsv(spark, csvDir)
    assert(fromCsv.Count()() == 20L && fromCsv.Sum("b1")() == 190.0)
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("b1",
        org.apache.spark.sql.types.DoubleType),
      org.apache.spark.sql.types.StructField("b2",
        org.apache.spark.sql.types.IntegerType)))
    val fromJson = TDF.readJson(spark, jsonDir, Some(schema))
    assert(fromJson.Filter($"b2" > 25).Count()() == 14L) // i*i > 25 → i in 6..19
    // ORC round-trip: snapshot the skim to ORC, reopen, identical results
    val orc = TDF(fixture).Filter($"b2" > 25).SnapshotOrc("/tmp/graft_snap_orc")
    assert(orc.Count()() == 14L && orc.Sum("b1")() ==
      (6 until 20).map(_.toDouble).sum)
  }

  test("SnapshotPartitioned prunes; SnapshotBucketed joins shuffle-free") {
    val dir = "/tmp/graft_snap_part"
    val d = TDF(fixture).Define("par", ($"b2" % 2).cast("string"))
      .SnapshotPartitioned(dir, Seq("par"))
    assert(d.Count()() == 20L)
    val pruned = spark.read.parquet(dir).filter($"par" === "0")
    assert(pruned.queryExecution.executedPlan.toString
      .contains("PartitionFilters: [isnotnull(par"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try {
      val t = TDF(fixture).SnapshotBucketed("graft_snap_bucketed", "b2", 4)
      assert(t.Count()() == 20L)
      val self = spark.table("graft_snap_bucketed")
        .join(spark.table("graft_snap_bucketed").select($"b2", $"b1".as("b1r")), Seq("b2"))
      assert(!self.queryExecution.executedPlan.toString
        .contains("Exchange hashpartitioning"), "bucketed self-join must not shuffle")
    } finally {
      spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
      spark.sql("DROP TABLE IF EXISTS graft_snap_bucketed")
    }
  }

  test("SnapshotSorted writes range-disjoint files; binaryFile source lists by glob") {
    val dir = "/tmp/graft_snap_sorted"
    val d = TDF(fixture).SnapshotSorted(dir, Seq("b1"), numFiles = 4)
    assert(d.Count()() == 20L)
    // each part file must cover a disjoint b1 range (this is what makes the
    // parquet min/max stats actionable for file/row-group skipping)
    val ranges = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map { f =>
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min($"b1"), max($"b1")).collect()(0)
        (r.getDouble(0), r.getDouble(1))
      }.sortBy(_._1)
    assert(ranges.length == 4)
    assert(ranges.sliding(2).forall { case Array((_, hi), (lo, _)) => hi < lo },
      s"file ranges must be disjoint: ${ranges.mkString(",")}")

    // binaryFile ingest: two files on disk, glob selects one at the listing
    val binDir = new java.io.File("/tmp/graft_bin_src")
    binDir.mkdirs()
    java.nio.file.Files.write(
      new java.io.File(binDir, "a.jpg").toPath, Array[Byte](1, 2, 3, 4))
    java.nio.file.Files.write(
      new java.io.File(binDir, "b.txt").toPath, Array[Byte](9))
    val jpgs = TDF.readBinaryFiles(spark, binDir.getAbsolutePath, Some("*.jpg"))
    val row = jpgs.toDF.select($"path", $"length", $"content").collect()
    assert(row.length == 1 && row(0).getLong(1) == 4L &&
      row(0).getAs[Array[Byte]](2).toSeq == Seq[Byte](1, 2, 3, 4))
  }

  test("SnapshotZOrdered clusters both dimensions into z-range-disjoint files") {
    val dir = "/tmp/graft_snap_zorder"
    val d = TDF(fixture).SnapshotZOrdered(dir, "b2", "b1", numFiles = 4)
    assert(d.Count()() == 20L)
    val ranges = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map { f =>
        val z = graft.functions.ZOrder.zorder2($"b2", $"b1")
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min(z), max(z)).collect()(0)
        (r.getLong(0), r.getLong(1))
      }.sortBy(_._1)
    assert(ranges.length == 4)
    assert(ranges.sliding(2).forall { case Array((_, hi), (lo, _)) => hi < lo },
      s"z ranges must be disjoint: ${ranges.mkString(",")}")
  }

  test("SnapshotZOrderedN clusters three dimensions into z-range-disjoint files") {
    val dir = "/tmp/graft_snap_zorder3"
    val d = TDF(fixture.withColumn("b3", ($"b2" * 7) % 20))
      .SnapshotZOrderedN(dir, Seq("b2", "b1", "b3"), numFiles = 4)
    assert(d.Count()() == 20L)
    val ranges = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map { f =>
        val z = graft.functions.ZOrder.zorderN(Seq($"b2", $"b1", $"b3"), 16)
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min(z), max(z)).collect()(0)
        (r.getLong(0), r.getLong(1))
      }.sortBy(_._1)
    assert(ranges.length == 4)
    assert(ranges.sliding(2).forall { case Array((_, hi), (lo, _)) => hi < lo },
      s"z ranges must be disjoint: ${ranges.mkString(",")}")
  }

  test("SnapshotZOrderedN at 4 columns: 60-bit budget clusters, 64 bits rejected") {
    val dir = "/tmp/graft_snap_zorder4"
    val src = fixture
      .withColumn("b3", ($"b2" * 7) % 20)
      .withColumn("b4", ($"b1" * 3) % 20)
    // 4 cols x 15 bits = 60 <= 63: fine, and files stay z-range-disjoint
    val d = TDF(src).SnapshotZOrderedN(dir, Seq("b2", "b1", "b3", "b4"),
      numFiles = 4, bits = 15)
    assert(d.Count()() == 20L)
    val ranges = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      .map { f =>
        val z = graft.functions.ZOrder.zorderN(Seq($"b2", $"b1", $"b3", $"b4"), 15)
        val r = spark.read.parquet(f.getAbsolutePath)
          .agg(min(z), max(z)).collect()(0)
        (r.getLong(0), r.getLong(1))
      }.sortBy(_._1)
    assert(ranges.length == 4)
    assert(ranges.sliding(2).forall { case Array((_, hi), (lo, _)) => hi < lo },
      s"z ranges must be disjoint: ${ranges.mkString(",")}")
    // 4 cols x default 16 bits = 64 > 63: the sign bit would corrupt the
    // interleave order — must be rejected up front
    intercept[IllegalArgumentException] {
      TDF(src).SnapshotZOrderedN("/tmp/graft_snap_zorder4_bad",
        Seq("b2", "b1", "b3", "b4"), numFiles = 4)
    }
  }

  test("compact rewrites a many-small-files directory into few files, data intact") {
    val src = "/tmp/graft_compact_src"
    val dst = "/tmp/graft_compact_dst"
    fixture.repartition(13).write.mode("overwrite").parquet(src)
    def parts(dir: String) = new java.io.File(dir).listFiles()
      .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
    assert(parts(src) > 1) // exact count varies (AQE may coalesce the shuffle)
    val c = TDF.compact(spark, src, dst) // 20 rows << 128 MB target -> 1 file
    assert(parts(dst) == 1)
    assert(c.Count()() == 20L && c.Sum("b1")() == (0 until 20).map(_.toDouble).sum)
    // plan check: coalesce is narrow — no exchange in the rewrite
    val plan = spark.read.parquet(src).coalesce(1).queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), "compaction must not shuffle")
  }

  test("compactPartitions compacts each partition dir independently") {
    val src = "/tmp/graft_compactp_src"
    val dst = "/tmp/graft_compactp_dst"
    fixture.withColumn("par", ($"b2" % 2).cast("string"))
      .repartition(6).write.mode("overwrite").partitionBy("par").parquet(src)
    val c = TDF.compactPartitions(spark, src, dst)
    assert(c.Count()() == 20L)
    // each partition dir collapses to one file; the partition column survives
    Seq("par=0", "par=1").foreach { d =>
      val n = new java.io.File(s"$dst/$d").listFiles()
        .count(f => f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      assert(n == 1, s"$d has $n files")
    }
    assert(c.toDF.filter($"par" === "0").count() ==
      fixture.filter(($"b2" % 2) === 0).count())
  }

  test("compactPartitions recurses nested layouts and overlaps job execution") {
    val src = "/tmp/graft_compactn_src"
    val dst = "/tmp/graft_compactn_dst"
    fixture
      .withColumn("pa", ($"b2" % 2).cast("string"))
      .withColumn("pb", ($"b2" % 3).cast("string"))
      .repartition(6).write.mode("overwrite").partitionBy("pa", "pb").parquet(src)
    val started = new java.util.concurrent.atomic.AtomicInteger(0)
    val running = new java.util.concurrent.atomic.AtomicInteger(0)
    val maxRunning = new java.util.concurrent.atomic.AtomicInteger(0)
    val listener = new org.apache.spark.scheduler.SparkListener {
      override def onJobStart(js: org.apache.spark.scheduler.SparkListenerJobStart): Unit = {
        started.incrementAndGet()
        val r = running.incrementAndGet()
        maxRunning.updateAndGet(m => math.max(m, r))
      }
      override def onJobEnd(je: org.apache.spark.scheduler.SparkListenerJobEnd): Unit =
        running.decrementAndGet()
    }
    spark.sparkContext.addSparkListener(listener)
    val c =
      try TDF.compactPartitions(spark, src, dst)
      finally {
        // drain the async listener bus before reading the counters
        val deadline = System.nanoTime() + 10_000_000_000L
        while ((running.get() != 0 || started.get() == 0) && System.nanoTime() < deadline)
          Thread.sleep(20)
        spark.sparkContext.removeSparkListener(listener)
      }
    assert(c.Count()() == 20L)
    // every LEAF dir (pa=?/pb=?) compacts to one file; inner dirs survive
    val leafDirs = for {
      a <- new java.io.File(dst).listFiles().toSeq if a.getName.startsWith("pa=")
      b <- a.listFiles().toSeq if b.getName.startsWith("pb=")
    } yield b
    assert(leafDirs.nonEmpty)
    leafDirs.foreach { d =>
      val n = d.listFiles().count(f =>
        f.getName.startsWith("part-") && f.getName.endsWith(".parquet"))
      assert(n == 1, s"${d.getPath} has $n files")
    }
    // both partition columns restored by discovery, values intact
    assert(c.toDF.filter($"pb" === "1").count() ==
      fixture.filter(($"b2" % 3) === 1).count())
    assert(maxRunning.get() >= 2,
      s"per-directory compactions must overlap (max concurrent = ${maxRunning.get()})")
  }

  test("profile histogram survives |y| beyond the long-square bound") {
    // yu*yu at yScale=0: 1.6e19 and 3.6e19 both exceed Long.MaxValue
    // (~9.22e18) — a long product would wrap silently; the decimal path keeps
    // the per-row squares exact. mean = 5e9, rms = 1e9.
    val df = Seq((1.0, 4.0e9), (1.0, 6.0e9)).toDF("x", "y")
    val r = TDF(df).HistoProfile("x", "y", 4, 0.0, 8.0, yScale = 0)
      .filter($"bin" === 0).collect()(0)
    assert(r.getLong(1) == 2L)
    assert(math.abs(r.getDouble(2) - 5.0e9) < 1.0, s"y_mean = ${r.getDouble(2)}")
    assert(math.abs(r.getDouble(3) - 1.0e9) < 1.0, s"y_rms = ${r.getDouble(3)}")
  }

  test("TEST 6: Histo model overload and no-arg default Histo") {
    val d = TDF(fixture, defaultColumns = Seq("b1"))
    // h3 analog: model axis copied, result independent of the model
    val model = graft.functions.Histogram.model(64, -8.0, 8.0)
    val h3 = d.Histo("dv", model)()
    assert(h3.nbins == 64 && h3.lo == -8.0 && h3.hi == 8.0)
    val expectedInRange = fixture.select(explode($"dv").as("e"))
      .where($"e" >= -8.0 && $"e" < 8.0).count()
    assert(h3.counts.sum == expectedInRange)
    assert(h3.entries == fixture.select(sum(size($"dv"))).as[Long].head)
    assert(model.entries == 0L, "model histogram must stay untouched")
    // identical to the explicit-axis overload
    val direct = d.Histo("dv", 64, -8.0, 8.0)()
    assert(h3.counts.toSeq == direct.counts.toSeq && h3.overflow == direct.overflow)
    // h1 analog: Histo() = default column, 128 bins, auto-range
    val h1 = d.Histo()()
    assert(h1.nbins == 128 && h1.entries == 20L && h1.underflow == 0L && h1.overflow == 0L)
  }

  test("TakeIterator streams large collects partition-by-partition") {
    // a size where a single collect_list row would be unreasonable
    val big = spark.range(0, 500000, 1, 32).toDF("v")
    val it = TDF(big).Filter($"v" % 2 === 0).TakeIterator("v")
    var n = 0L
    var sum = 0L
    it.foreach { v => n += 1; sum += v.asInstanceOf[Long] }
    assert(n == 250000L)
    assert(sum == (0L until 500000L by 2).sum)
  }

  test("review fixes: HistoWeighted auto-range, typed Foreach coerces columns") {
    // lo == hi auto-ranges for the weighted overload too (was: silent
    // degenerate axis with everything in under/overflow)
    val hw = TDF(fixture).HistoWeighted("b1", "b2", 10, 0.0, 0.0)()
    assert(hw.underflow == 0L && hw.overflow == 0L)
    assert(hw.counts.sum == (0 until 20).map(i => i * i).sum)
    // Int column through a Double-typed Foreach lambda: coerced, not CCE
    val acc = spark.sparkContext.doubleAccumulator("coerce")
    TDF(fixture).Foreach((x: Double) => acc.add(x), Seq("b2"))
    assert(acc.value == (0 until 20).map(i => i * i).sum.toDouble)
  }

  test("HistoWeightedD: decimal-summed bins exact, partition-invariant") {
    // weights chosen binary-exact so quantization is unambiguous:
    // 0.125*100 = 12.5 rounds HALF_UP to 13 units -> two fills = 0.26 exactly
    val df = Seq((0.5, 0.125), (0.5, 0.125), (1.5, -0.25), (2.5, 1.0), (-1.0, 2.0))
      .toDF("x", "w")
    def run(p: Int) = TDF(df.repartition(p))
      .HistoWeightedD("x", "w", 2, 0.0, 2.0, wScale = 2)
      .orderBy($"bin").collect()
      .map(r => (r.getInt(0), r.getDouble(1), r.getLong(2))).toSeq
    val expected = Seq((-1, 2.0, 1L), (0, 0.26, 2L), (1, -0.25, 1L), (2, 1.0, 1L))
    assert(run(1) == expected)
    assert(run(7) == expected)
  }

  test("error paths: unknown column, multi-default ambiguity (TEST 12/13 analog)") {
    val d = TDF(fixture)
    val r = d.Min("no_such_column")
    intercept[Exception] { r() } // surfaces at the shared run, like the reference trigger
    intercept[IllegalArgumentException] {
      TDF(fixture, defaultColumns = Seq("b1", "b2")).Min()
    }
  }

  test("typed-lambda surface: every reference callable shape (test_functiontraits)") {
    val d = TDF(fixture)
    // lambda (reference lambda2 analog)
    assert(d.Filter((x: Double) => x >= 10.0, Seq("b1")).Count()() == 10L)
    // eta-expanded free function (reference freeFun1 analog)
    assert(d.Filter(TDFSpecFns.isBigSquare _, Seq("b2")).Count()() == 10L)
    // function object / functor class (reference Functor1 analog)
    assert(d.Filter(TDFSpecFns.LessThan5, Seq("b1")).Count()() == 5L)
    // function value in a val (reference std::function analog)
    val stdFun: (Double, Int) => Boolean = (b1, b2) => b2 > b1
    assert(d.Filter(stdFun, Seq("b1", "b2")).Count()() == 18L) // b1*b1>b1 fails for 0,1
    // 3-arg shape
    assert(d.Filter((a: Double, b: Int, dv: Seq[Double]) => dv.length > a + b / 100,
      Seq("b1", "b2", "dv")).Count()() == 20L)
  }

  test("typed-lambda Define equals native-Column Define; Foreach typed") {
    val d = TDF(fixture)
    val lam = d.Define("y", (a: Double, b: Int) => a * 2 + b, Seq("b1", "b2")).Sum("y")()
    val nat = TDF(fixture).Define("y", $"b1" * 2 + $"b2").Sum("y")()
    assert(lam == nat)
    // named typed cut feeds the cut-flow Report
    val rep = TDF(fixture).Filter("pos", (x: Double) => x > 0.0, Seq("b1")).Report()()
    assert(rep.head.name == "pos" && rep.head.pass == 19L && rep.head.all == 20L)
    // typed Foreach: values arrive unwrapped
    val acc = spark.sparkContext.doubleAccumulator("tdf_typed_foreach")
    d.Foreach((x: Double) => acc.add(x), Seq("b1"))
    assert(acc.value == (0 until 20).sum.toDouble)
  }

  test("typed-lambda arity errors and default-column fallback (PickBranchNames)") {
    val d = TDF(fixture, defaultColumns = Seq("b1"))
    // default list satisfies arity 1
    assert(d.Filter((x: Double) => x >= 10.0).Count()() == 10L)
    // wrong explicit arity throws
    val e1 = intercept[IllegalArgumentException] {
      d.Filter((x: Double) => x > 0.0, Seq("b1", "b2"))
    }
    assert(e1.getMessage.contains("1 column"))
    // default list can't satisfy arity 2
    val e2 = intercept[IllegalArgumentException] {
      d.Filter((a: Double, b: Int) => b > a, Nil)
    }
    assert(e2.getMessage.contains("default"))
  }

  test("concurrent bookings and derefs on one shared context are thread-safe") {
    import scala.concurrent.{Await, Future}
    import scala.concurrent.ExecutionContext.Implicits.global
    import scala.concurrent.duration.Duration
    val d = TDF(fixture)
    val futs = (0 until 8).map { i =>
      Future { d.Filter($"b1" >= i.toDouble).Count()() }
    }
    val got = futs.map(Await.result(_, Duration.Inf))
    assert(got == (0 until 8).map(i => (20 - i).toLong),
      s"racing book/run must not lose or double-fill results, got $got")
  }

  test("TChain analog: multi-path read concatenates files") {
    val n1 = spark.read.parquet("/root/testdata/sf0.001/lineitem.parquet").count()
    val n2 = spark.read.parquet("/root/testdata/sf0.01/lineitem.parquet").count()
    val chained = spark.read.parquet(
      "/root/testdata/sf0.001/lineitem.parquet",
      "/root/testdata/sf0.01/lineitem.parquet")
    assert(TDF(chained).Count()() == n1 + n2)
  }

  test("histogram chi2 comparison: identical → 0, shifted → positive") {
    val d = TDF(fixture)
    val h1 = d.Histo("b1", 10, 0.0, 20.0)
    val h2 = d.Histo("b1", 10, 0.0, 20.0)
    val h3 = d.Define("b1s", $"b1" + 7.0).Histo("b1s", 10, 0.0, 20.0)
    assert(h1().chi2Test(h2())._1 == 0.0)
    assert(h1().chi2Test(h3())._1 > 0.0)
    intercept[IllegalArgumentException] {
      h1().chi2Test(d.Histo("b1", 5, 0.0, 20.0)())
    }
  }

  test("Snapshot writes a skim and reopens it") {
    val dir = java.nio.file.Files.createTempDirectory("graft_snap").toString + "/skim"
    val d = TDF(fixture).Filter($"b1" < 5).Snapshot(dir, Seq("b1", "b2"))
    assert(d.Count()() == 5L)
    assert(d.columns == Seq("b1", "b2"))
  }
}

/** top-level free functions for the eta-expansion shape in the
  * functiontraits tests (reference freeFun1/freeFun2)
  */
object TDFSpecFns {
  def isBigSquare(b2: Int): Boolean = b2 >= 100

  /** standalone function object (reference Functor1): must be serializable on
    * its own, unlike an anonymous Function1 in a test class (outer capture)
    */
  object LessThan5 extends (Double => Boolean) with Serializable {
    def apply(x: Double): Boolean = x < 5.0
  }
}
