package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-generated TPC-H-ish parquet tables (TESTDATA.md).
  * One parquet file per table under `sfDir`. Reads are plain
  * `spark.read.parquet` so Catalyst gets full pushdown/pruning.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def apply(spark: SparkSession, sfDir: String, name: String): DataFrame =
    spark.read.parquet(s"$sfDir/$name.parquet")

  def lineitem(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "lineitem")
  def orders(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "orders")
  def customer(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "customer")
  def supplier(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "supplier")
  def part(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "part")
  def nation(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "nation")
  def region(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "region")
  /** events.parquet stores TIMESTAMP(NANOS), which Spark's vectorized reader
    * rejects. Read nanos as long (legacy conf) and truncate to microseconds —
    * the same truncation DuckDB applies — so `ts` is a normal timestamp.
    */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    apply(spark, sfDir, "events")
      .withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
  }
  def documents(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "documents")

  /** [[documents]] with INGEST PARALLELIZED: the driver-generated parquet
    * has a single row group, so a plain scan is one task and every
    * scan-level expression chain downstream runs on one core — for the
    * md5-heavy text operators (winnowing, hashed-feature classification)
    * that serializes the whole map stage. One narrow hash repartition of
    * the raw docs (~hundreds of KB here) buys full-width map stages;
    * deterministic (hash of doc_id, not round-robin) so results and laws
    * are unaffected. At production scale the scan already yields thousands
    * of splits and this shuffle would be pure waste — use the plain reader
    * there; this is the documented small-input lever, applied only in the
    * expensive text queries' glue.
    */
  def documentsParallel(spark: SparkSession, sfDir: String): DataFrame = {
    val p = spark.sparkContext.defaultParallelism
    documents(spark, sfDir)
      .repartition(p, org.apache.spark.sql.functions.col("doc_id"))
  }
  def embeddings(spark: SparkSession, sfDir: String): DataFrame = apply(spark, sfDir, "embeddings")
}
