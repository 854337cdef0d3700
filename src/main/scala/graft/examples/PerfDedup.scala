package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.Tables
import graft.ops.Dedup

/** Stage-by-stage timing of the MinHash+LSH near-dup pipeline, to find where
  * the bench seconds actually go. sbt "runMain graft.examples.PerfDedup [sfDir]"
  */
object PerfDedup {
  def time(name: String)(f: => Unit): Unit = {
    f // warmup
    val runs = 3
    val t0 = System.nanoTime()
    (0 until runs).foreach(_ => f)
    println(f"[perf] $name%-40s ${(System.nanoTime() - t0) / 1e9 / runs}%8.3f s")
  }

  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.1")
    val spark = SparkSession.builder()
      .master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.files.maxPartitionBytes", "1m")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    val docs = Tables.documents(spark, dir)
    val K = 16; val BAND = 4; val NGRAM = 3

    time("docs scan+count")(docs.count(): Unit)
    val sets = Dedup.shingleSets(docs, "doc_id", "text", NGRAM)
    time("shingle sets compute")(
      sets.write.format("noop").mode("overwrite").save())
    val sig = Dedup.minhashSignatures(docs, "doc_id", "text", K, NGRAM)
    time("signatures (one-pass expr)")(
      sig.write.format("noop").mode("overwrite").save())
    // Isolate the candidate stage: sig is a lazy plan, so timing
    // lshCandidates(sig) directly would re-execute the signature stage on
    // every run and the per-stage seconds would overlap. Persist +
    // materialize the input first, unpersist after.
    sig.persist()
    sig.count()
    val cands = Dedup.lshCandidates(sig, "doc_id", K, BAND)
    time("lsh candidates (sig persisted)")(
      cands.write.format("noop").mode("overwrite").save())
    sig.unpersist()
    time("full nearDuplicatesLsh persistSets=true")(
      Dedup.nearDuplicatesLsh(docs, "doc_id", "text", K, BAND, NGRAM)
        .orderBy(col("id_a"), col("id_b"))
        .write.format("noop").mode("overwrite").save())
    time("full nearDuplicatesLsh persistSets=false")(
      Dedup.nearDuplicatesLsh(docs, "doc_id", "text", K, BAND, NGRAM,
        persistSets = false)
        .orderBy(col("id_a"), col("id_b"))
        .write.format("noop").mode("overwrite").save())
    spark.stop()
  }
}
