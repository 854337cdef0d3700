package graft

import org.scalatest.funsuite.AnyFunSuite

/** SQL registration of the custom expressions. */
class ExtensionsSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session
  import spark.implicits._

  test("graft_dot and graft_histogram callable from SQL") {
    GraftExtensions.register(spark)
    val dot = spark.sql("SELECT graft_dot(array(1.0d, 2.0d, 3.0d), array(4.0d, 5.0d, 6.0d))")
      .as[Double].head
    assert(dot == 32.0)

    Seq(1.0, 2.0, 3.0, 15.0).toDF("x").createOrReplaceTempView("hx")
    val h = spark.sql("SELECT graft_histogram(x, 4, 0.0d, 8.0d) AS h FROM hx")
      .select($"h.counts", $"h.overflow", $"h.entries")
      .as[(Seq[Long], Long, Long)].head
    assert(h._1 == Seq(1L, 2L, 0L, 0L) && h._2 == 1L && h._3 == 4L)
  }
}
