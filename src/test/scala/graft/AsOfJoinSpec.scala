package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.plans.AsOfJoin

/** The custom as-of operator: semantics + plan shape. */
class AsOfJoinSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session
  import spark.implicits._

  private def ts(s: String) = Timestamp.valueOf(s)

  test("as-of picks the latest strictly-earlier right row per key") {
    val left = Seq(
      (1L, ts("2024-01-01 10:00:00"), "l1"),
      (1L, ts("2024-01-01 12:00:00"), "l2"),
      (2L, ts("2024-01-01 09:00:00"), "l3"), // no earlier right row → dropped
      (3L, ts("2024-01-01 09:00:00"), "l4")  // key with no right rows → dropped
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, ts("2024-01-01 09:30:00"), "r1"),
      (1L, ts("2024-01-01 11:00:00"), "r2"),
      (1L, ts("2024-01-01 12:00:00"), "r3"), // equal ts — strict, must NOT match l2
      (2L, ts("2024-01-01 09:30:00"), "r4")
    ).toDF("rk", "rt", "rtag")

    val got = AsOfJoin.join(left, right, "k", "rk", "t", "rt")
      .select($"tag", $"rtag").as[(String, String)].collect().toSet
    assert(got == Set(("l1", "r1"), ("l2", "r2")))
  }

  test("generalized types: string keys, long ts, null keys skipped") {
    val left = Seq(("a", 10L, 1), ("a", 20L, 2), ("b", 10L, 3), (null, 10L, 4))
      .toDF("k", "t", "id")
    val right = Seq(("a", 5L, 100), ("a", 15L, 101), ("b", 20L, 102), (null.asInstanceOf[String], 1L, 103))
      .toDF("rk", "rt", "rid")
    val got = AsOfJoin.join(left, right, "k", "rk", "t", "rt")
      .select($"id", $"rid").as[(Int, Int)].collect().toSet
    // a@10 → a@5; a@20 → a@15; b@10 has no earlier b row; nulls drop entirely
    assert(got == Set((1, 100), (2, 101)))
  }

  test("tolerance bounds the gap; forward flips the direction") {
    val left = Seq(
      (1L, 100L, "l1"),   // backward match r@90 (gap 10); forward match r@110
      (1L, 500L, "l2"),   // backward match r@110 (gap 390 > tol → drops)
      (2L, 100L, "l3")    // no right rows for key 2
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 90L, "r90"), (1L, 110L, "r110"), (1L, 600L, "r600")
    ).toDF("rk", "rt", "rtag")

    val tol = AsOfJoin.join(left, right, "k", "rk", "t", "rt",
      toleranceMicros = Some(50L))
      .select($"tag", $"rtag").as[(String, String)].collect().toSet
    assert(tol == Set(("l1", "r90")), s"got $tol")

    val fwd = AsOfJoin.join(left, right, "k", "rk", "t", "rt", forward = true)
      .select($"tag", $"rtag").as[(String, String)].collect().toSet
    // l1@100 → earliest later = r110; l2@500 → r600
    assert(fwd == Set(("l1", "r110"), ("l2", "r600")), s"got $fwd")

    val both = AsOfJoin.join(left, right, "k", "rk", "t", "rt",
      toleranceMicros = Some(20L), forward = true)
      .select($"tag", $"rtag").as[(String, String)].collect().toSet
    // forward gaps: l1→r110 is 10 (keeps), l2→r600 is 100 (drops)
    assert(both == Set(("l1", "r110")), s"got $both")

    // equal-ts stays strict in forward mode too
    val eq = AsOfJoin.join(
      Seq((1L, 110L, "le")).toDF("k", "t", "tag"), right, "k", "rk", "t", "rt",
      forward = true)
      .select($"tag", $"rtag").as[(String, String)].collect().toSet
    assert(eq == Set(("le", "r600")), s"got $eq")

    // tolerance rejects non-numeric ts types loudly on the driver
    intercept[IllegalArgumentException] {
      AsOfJoin.join(
        Seq((1L, "x", 1)).toDF("k", "t", "id"),
        Seq((1L, "y", 2)).toDF("rk", "rt", "rid"),
        "k", "rk", "t", "rt", toleranceMicros = Some(1L))
    }
  }

  test("plan: custom exec node, one exchange per side, partition-count invariant") {
    val left = (0L until 400L).map(i =>
      (i % 7, new Timestamp(1700000000000L + i * 60000), i)).toDF("k", "t", "v")
    val right = (0L until 900L).map(i =>
      (i % 7, new Timestamp(1700000000000L + i * 27000), i)).toDF("rk", "rt", "rv")

    val joined = AsOfJoin.join(left.repartition(5), right.repartition(3), "k", "rk", "t", "rt")
    val plan = joined.queryExecution.executedPlan.toString
    assert(plan.contains("AsOfJoin"), s"custom exec missing:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2)

    // equivalence with the window-based composition, any partitioning
    val viaWindow = {
      import org.apache.spark.sql.expressions.Window
      val c = left.select($"k".as("u"), $"t", lit(0).as("o"), $"v",
        lit(null).cast("timestamp").as("vt"))
      val vv = right.select($"rk".as("u"), $"rt".as("t"), lit(1).as("o"),
        lit(null).cast("long").as("v"), $"rt".as("vt"))
      val w = Window.partitionBy($"u").orderBy($"t", $"o")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
      c.unionByName(vv).withColumn("pv", max($"vt").over(w))
        .filter($"o" === 0 && $"pv".isNotNull)
        .select($"v", $"pv").as[(Long, Timestamp)].collect().toSet
    }
    val viaCustom = joined.select($"v", $"rt").as[(Long, Timestamp)].collect().toSet
    assert(viaCustom == viaWindow)
  }

  test("last-k: the k most recent strictly-earlier rows, rank 1 = newest") {
    val left = Seq(
      (1L, 100L, "l1"), // sees r10,r20,r30 → top-3 of 3
      (1L, 25L, "l2"),  // sees r10,r20 → 2 rows
      (1L, 10L, "l3"),  // nothing strictly earlier → drops
      (2L, 50L, "l4")   // key 2: one row
    ).toDF("k", "t", "tag")
    val right = Seq(
      (1L, 10L, "r10"), (1L, 20L, "r20"), (1L, 30L, "r30"), (1L, 40L, "r40"),
      (2L, 40L, "r2a")
    ).toDF("rk", "rt", "rtag")
    val got = AsOfJoin.joinLastK(left, right, "k", "rk", "t", "rt", 3)
      .select($"tag", $"rtag", $"asof_rank").as[(String, String, Long)]
      .collect().toSet
    // l1@100: last-3 of {10,20,30,40} = 40,30,20
    assert(got == Set(
      ("l1", "r40", 1L), ("l1", "r30", 2L), ("l1", "r20", 3L),
      ("l2", "r20", 1L), ("l2", "r10", 2L),
      ("l4", "r2a", 1L)), s"got $got")
  }

  test("last-k: tiebreak column orders same-timestamp rows deterministically") {
    val left = Seq((7L, 100L, "p")).toDF("k", "t", "tag")
    val right = Seq(
      (7L, 50L, 1L, "a"), (7L, 50L, 3L, "c"), (7L, 50L, 2L, "b")
    ).toDF("rk", "rt", "rid", "rtag")
    val got = AsOfJoin.joinLastK(left, right, "k", "rk", "t", "rt", 2,
        rightTieBreak = Some("rid"))
      .select($"rtag", $"asof_rank").as[(String, Long)].collect().toSet
    // higher rid = more recent among ties: rank1=c(rid 3), rank2=b(rid 2)
    assert(got == Set(("c", 1L), ("b", 2L)), s"got $got")
  }

  test("last-k law: equals the window-ranked top-k under any partitioning") {
    val left = (0L until 300L).map(i =>
      (i % 5, 1000L + (i * 37) % 900, i)).toDF("k", "t", "v")
    val right = (0L until 800L).map(i =>
      (i % 5, 1000L + (i * 13) % 900, i)).toDF("rk", "rt", "rid")
    val viaCustom = AsOfJoin.joinLastK(
        left.repartition(7), right.repartition(4), "k", "rk", "t", "rt", 4,
        rightTieBreak = Some("rid"))
      .select($"v", $"rid", $"asof_rank").as[(Long, Long, Long)].collect().toSet
    val viaWindow = {
      import org.apache.spark.sql.expressions.Window
      val j = left.join(right, $"k" === $"rk" && $"rt" < $"t")
        .withColumn("rnk", row_number().over(
          Window.partitionBy($"k", $"v").orderBy($"rt".desc, $"rid".desc)))
        .filter($"rnk" <= 4)
      j.select($"v", $"rid", $"rnk".cast("long")).as[(Long, Long, Long)]
        .collect().toSet
    }
    assert(viaCustom == viaWindow)
  }

  test("last-k plan: custom exec, one exchange per side, no window/product") {
    val left = (0L until 100L).map(i => (i % 3, 100L + i, i)).toDF("k", "t", "v")
    val right = (0L until 100L).map(i => (i % 3, 50L + i, i)).toDF("rk", "rt", "rid")
    val plan = AsOfJoin.joinLastK(left, right, "k", "rk", "t", "rt", 5)
      .queryExecution.executedPlan.toString
    assert(plan.contains("AsOfLastK"), s"custom exec missing:\n$plan")
    assert("Exchange hashpartitioning".r.findAllIn(plan).size == 2, plan)
    assert(!plan.contains("WindowExec") && !plan.contains("CartesianProduct") &&
      !plan.contains("BroadcastNestedLoopJoin"),
      s"last-k must stay a merge, not a rank-then-filter or product:\n$plan")
  }
}
