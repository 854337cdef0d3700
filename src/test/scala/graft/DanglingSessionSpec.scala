package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

import graft.tdf.TDF

/** Dangling-frame regression (reference tests/regression_invalidref.cxx:10-18):
  * dereferencing a booked result after the owning session is gone must throw a
  * clear engine-level "frame went out of scope" error.
  *
  * This suite STOPS its SparkSession, so build.sbt runs it in its own forked
  * JVM (Test / testGrouping) — it must never share a JVM with the suites that
  * use [[SparkTest.session]].
  */
class DanglingSessionSpec extends AnyFunSuite {

  test("result deref after session stop throws a clear dangling-frame error") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-dangling-test")
      .config("spark.sql.shuffle.partitions", "2")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import spark.implicits._

    val d = TDF(Seq((1, 2.0), (3, 4.0)).toDF("a", "b"))
    val cnt = d.Count()
    val sum = d.Filter("a > 1").Sum("b")
    spark.stop()

    val e1 = intercept[IllegalStateException] { cnt() }
    assert(e1.getMessage.contains("went out of scope"))
    assert(e1.getMessage.contains("TDataFrame(a, b)"))
    // Every booked result on the dead frame fails the same way.
    val e2 = intercept[IllegalStateException] { sum.value }
    assert(e2.getMessage.contains("went out of scope"))
  }
}
