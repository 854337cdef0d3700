package graft.examples

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Dev probe for the q_stream_admit / q_stream_decontaminate per-trigger
  * cost (r16): runs the admission lambda's pieces as BATCH queries over a
  * one-third slice of documents (the same rows a trigger sees) and times
  * each, so the expensive piece is identified by measurement instead of
  * theory — the r15 forward-scorer protocol (PairScanProbe).
  */
object AdmitProbe {
  def main(args: Array[String]): Unit = {
    val sfDir = if (args.nonEmpty) args(0) else "/root/testdata/sf0.1"
    val spark = SparkSession.builder()
      .master("local[32]")
      .appName("graft-admit-probe")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = graft.Tables.documents(spark, sfDir)
    val thresholds = graft.ops.Splits.temperatureThresholds(docs, "lang", 0.5)
    val held = docs.filter(col("doc_id") % 97 === 0)
    val heldDigests = held.select(md5(col("text")).as("__digest")).distinct()
      .localCheckpoint(false)
    val heldGrams = held
      .withColumn("__toks", graft.ops.TextOps.tokens(col("text")))
      .select(explode(graft.ops.TextOps.shingles("__toks", 5)).as("__g"))
      .distinct()
      .localCheckpoint(false)
    val stopwords = Seq("the", "of", "and", "to", "in", "a", "is", "that",
      "for", "with")
    val gramSetPre = heldGrams.collect().map(_.getString(0)).toSeq

    // one trigger's worth of rows, materialized like a staged batch file
    val batch = docs.filter(col("doc_id") % 3 === 0).localCheckpoint(false)

    val explain = sys.env.contains("GRAFT_PROBE_EXPLAIN")
    def timed(name: String)(f: => DataFrame): Unit = {
      if (explain)
        println(s"=== $name ===\n" + f.queryExecution.executedPlan.toString.take(3500))
      // warm + 2 samples
      f.write.format("noop").mode("overwrite").save()
      val ts = (0 until 2).map { _ =>
        val t0 = System.nanoTime()
        f.write.format("noop").mode("overwrite").save()
        (System.nanoTime() - t0) / 1e9
      }
      println(f"[probe] $name%-28s ${ts.map(t => f"$t%.2f").mkString(" ")}")
    }

    def gopherT(b: DataFrame): DataFrame =
      graft.ops.Splits.applyPpmThresholds(
        graft.ops.Selection.withGopherFlags(b, "text",
          20, 1000, 3.0, 4.7, stopwords, 2, 0.8, 0.06)
          .filter(col("keep")),
        "lang", "doc_id", thresholds)
        .select(b.columns.map(col).toSeq: _*)

    val wide = batch.repartition(32)
    timed("tokens_once") {
      wide.select(size(graft.ops.TextOps.tokens(col("text"))).as("n"))
    }
    timed("gopher_report_nofilter") {
      graft.ops.Selection.withGopherFlags(wide, "text",
        20, 1000, 3.0, 4.7, stopwords, 2, 0.8, 0.06)
    }
    timed("gopher_filter_spliced") {
      graft.ops.Selection.withGopherFlags(wide, "text",
        20, 1000, 3.0, 4.7, stopwords, 2, 0.8, 0.06)
        .filter(col("keep")).select(wide.columns.map(col).toSeq: _*)
    }
    timed("gopher_filter_barrier") {
      // monotonically_increasing_id is non-deterministic → Catalyst cannot
      // push the keep filter through the projection: flags evaluate ONCE
      graft.ops.Selection.withGopherFlags(wide, "text",
        20, 1000, 3.0, 4.7, stopwords, 2, 0.8, 0.06)
        .withColumn("__rid", monotonically_increasing_id())
        .filter(col("keep")).select(wide.columns.map(col).toSeq: _*)
    }
    timed("gopher_ppm_only")(gopherT(wide))
    timed("gopher_ppm_narrow")(gopherT(batch))

    // candidate fixes: materialize the flags (or the keep-id set) so the
    // downstream filter reads attributes instead of splicing the rule trees
    timed("full_fold_ckpt") {
      val scored = graft.ops.Selection.withGopherFlags(wide, "text",
        20, 1000, 3.0, 4.7, stopwords, 2, 0.8, 0.06).localCheckpoint(false)
      val t = graft.ops.Splits.applyPpmThresholds(
        scored.filter(col("keep")), "lang", "doc_id", thresholds)
        .select(wide.columns.map(col).toSeq: _*)
      val gramHits = t
        .withColumn("__toks", graft.ops.TextOps.tokens(col("text")))
        .select(col("doc_id"),
          explode(graft.ops.TextOps.shingles("__toks", 5)).as("__g"))
        .join(broadcast(heldGrams), Seq("__g"), "left_semi")
        .select(col("doc_id")).distinct()
      t.join(broadcast(heldDigests), md5(col("text")) === col("__digest"),
          "left_anti")
        .join(gramHits, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"))
    }
    timed("full_fold_keepids") {
      val keepIds = graft.ops.Splits.applyPpmThresholds(
        graft.ops.Selection.withGopherFlags(wide, "text",
          20, 1000, 3.0, 4.7, stopwords, 2, 0.8, 0.06)
          .filter(col("keep")).select(col("doc_id"), col("lang")),
        "lang", "doc_id", thresholds)
        .select(col("doc_id")).localCheckpoint(false)
      val t = wide.join(broadcast(keepIds), Seq("doc_id"), "left_semi")
      val gramHits = t
        .withColumn("__toks", graft.ops.TextOps.tokens(col("text")))
        .select(col("doc_id"),
          explode(graft.ops.TextOps.shingles("__toks", 5)).as("__g"))
        .join(broadcast(heldGrams), Seq("__g"), "left_semi")
        .select(col("doc_id")).distinct()
      t.join(broadcast(heldDigests), md5(col("text")) === col("__digest"),
          "left_anti")
        .join(gramHits, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"))
    }
    timed("decon_barrier_bottom") {
      // streaming-compatible: a non-deterministic column in the SAME project
      // as the heavy token array stops filter pushdown from splicing
      // tokens(text) inside the shingle lambda (where it would re-evaluate
      // per element); the predicate then evaluates shingles(attr) per row
      docs.filter(col("doc_id") % 97 =!= 0)
        .repartition(32)
        .select(col("doc_id"), md5(col("text")).as("__d"),
          graft.ops.TextOps.tokens(col("text")).as("__toks"),
          monotonically_increasing_id().as("__rid"))
        .filter(!graft.functions.SetProbeExprs.anyInSet(spark,
          graft.ops.TextOps.shingles("__toks", 5), gramSetPre))
        .join(broadcast(heldDigests.withColumnRenamed("__digest", "digest")),
          col("__d") === col("digest"), "left_anti")
        .select(col("doc_id"))
    }
    timed("decon_proj_barrier") {
      // heavy HOFs in PROJECTIONS (where they evaluate once per row, fast),
      // filter reads only the boolean attribute; the non-det column in the
      // SAME project as __hit stops pushdown from splicing the probe into
      // the predicate
      docs.filter(col("doc_id") % 97 =!= 0)
        .repartition(32)
        .select(col("doc_id"), md5(col("text")).as("__d"),
          graft.ops.TextOps.tokens(col("text")).as("__toks"))
        .select(col("doc_id"), col("__d"),
          graft.functions.SetProbeExprs.anyInSet(spark,
            graft.ops.TextOps.shingles("__toks", 5), gramSetPre).as("__hit"),
          monotonically_increasing_id().as("__rid"))
        .filter(!col("__hit"))
        .join(broadcast(heldDigests.withColumnRenamed("__digest", "digest")),
          col("__d") === col("digest"), "left_anti")
        .select(col("doc_id"))
    }
    timed("decon_ckpt") {
      val scored = docs.filter(col("doc_id") % 97 =!= 0)
        .repartition(32)
        .withColumn("__d", md5(col("text")))
        .withColumn("__toks", graft.ops.TextOps.tokens(col("text")))
        .withColumn("__hit",
          graft.functions.SetProbeExprs.anyInSet(spark,
            graft.ops.TextOps.shingles("__toks", 5), gramSetPre))
        .select(col("doc_id"), col("__d"), col("__hit"))
        .localCheckpoint(false)
      scored.filter(!col("__hit"))
        .join(broadcast(heldDigests.withColumnRenamed("__digest", "digest")),
          col("__d") === col("digest"), "left_anti")
        .select(col("doc_id"))
    }

    val t = gopherT(wide)
    timed("digest_anti") {
      t.join(broadcast(heldDigests), md5(col("text")) === col("__digest"),
        "left_anti").select(col("doc_id"), col("lang"))
    }
    timed("gram_hits_only") {
      t.withColumn("__toks", graft.ops.TextOps.tokens(col("text")))
        .select(col("doc_id"),
          explode(graft.ops.TextOps.shingles("__toks", 5)).as("__g"))
        .join(broadcast(heldGrams), Seq("__g"), "left_semi")
        .select(col("doc_id")).distinct()
    }
    timed("full_fold") {
      val gramHits = t
        .withColumn("__toks", graft.ops.TextOps.tokens(col("text")))
        .select(col("doc_id"),
          explode(graft.ops.TextOps.shingles("__toks", 5)).as("__g"))
        .join(broadcast(heldGrams), Seq("__g"), "left_semi")
        .select(col("doc_id")).distinct()
      t.join(broadcast(heldDigests), md5(col("text")) === col("__digest"),
          "left_anti")
        .join(gramHits, Seq("doc_id"), "left_anti")
        .select(col("doc_id"), col("lang"))
    }
    // the r15 shape for contrast
    timed("r15_shape") {
      val g = graft.ops.Selection.gopherRules(batch, "doc_id", "text",
        20, 1000, 3.0, 4.7, stopwords, 2, 0.8, 0.06)
        .filter(col("keep")).select(col("doc_id"))
      val tt = graft.ops.Splits.applyPpmThresholds(
        batch.join(g, Seq("doc_id"), "left_semi"), "lang", "doc_id", thresholds)
      val clean = graft.ops.Decontam.flags(tt, "doc_id", "text", held, "text", 5)
        .filter(col("kept") === 1).select(col("doc_id"))
      tt.join(clean, Seq("doc_id"), "left_semi")
        .select(col("doc_id"), col("lang"))
    }
    // decontaminate-twin core: per-row probe filter over the full corpus
    val gramSet = heldGrams.collect().map(_.getString(0)).toSeq
    timed("decon_probe_filter") {
      docs.filter(col("doc_id") % 97 =!= 0)
        .repartition(32)
        .withColumn("__d", md5(col("text")))
        .withColumn("__toks", graft.ops.TextOps.tokens(col("text")))
        .withColumn("__sh", graft.ops.TextOps.shingles("__toks", 5))
        .join(broadcast(heldDigests.withColumnRenamed("__digest", "digest")),
          col("__d") === col("digest"), "left_anti")
        .filter(!graft.functions.SetProbeExprs.anyInSet(spark, col("__sh"), gramSet))
        .select(col("doc_id"))
    }
    spark.stop()
  }
}
