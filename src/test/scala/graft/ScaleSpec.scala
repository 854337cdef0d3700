package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Scale-mechanics tests: typed Dataset surface, partition-pruned reads,
  * plan-shape assertions for the hot paths.
  */
case class Item(key: Long, grp: String, qty: Double)

class ScaleSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session
  import spark.implicits._

  test("typed Dataset surface: case-class Encoder round trip with typed ops") {
    val ds = (0L until 100L).map(i => Item(i, s"g${i % 4}", (i % 10).toDouble)).toDS()
    val agg = ds.filter(_.qty > 4.0).groupByKey(_.grp)
      .mapValues(_.qty.toLong).reduceGroups(_ + _)
      .collect().toMap
    assert(agg.size == 4 && agg.values.sum == ds.filter(_.qty > 4.0).map(_.qty.toLong).reduce(_ + _))
  }

  test("partitioned write + read prunes partitions in the scan") {
    val dir = "/tmp/graft_part_test"
    (0L until 1000L).map(i => (i, s"g${i % 5}", i % 7))
      .toDF("id", "grp", "v")
      .write.mode("overwrite").partitionBy("grp").parquet(dir)
    val pruned = spark.read.parquet(dir).filter($"grp" === "g3")
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(grp"),
      s"expected partition filters in scan:\n$scan")
    assert(pruned.count() == 200L)
  }

  test("facade fused job reads only referenced columns (pruning)") {
    val li = Tables.lineitem(spark, "/root/testdata/sf0.001")
    val agg = li
      .withColumn("z", $"l_extendedprice" * (lit(1.0) - $"l_discount"))
      .agg(count(when($"z" > 1000.0, lit(1))).as("n"))
    val scan = agg.queryExecution.executedPlan.toString
    assert(scan.contains("ReadSchema: struct<l_extendedprice:double,l_discount:double>"),
      s"expected 2-column pruned scan:\n$scan")
  }

  test("dimension join broadcasts, fact side never shuffles before the join") {
    val dir = "/root/testdata/sf0.001"
    val joined = Tables.lineitem(spark, dir)
      .join(broadcast(Tables.supplier(spark, dir)), $"l_suppkey" === $"s_suppkey")
      .groupBy($"s_name").agg(sum($"l_quantity"))
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin"))
    // the only hash-exchange allowed is the post-join groupBy aggregation
    val exchanges = "Exchange hashpartitioning".r.findAllIn(plan).size
    assert(exchanges <= 1, s"fact side must not shuffle before join:\n$plan")
  }
}
