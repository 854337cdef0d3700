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

    // integer twin: exact bigint dot over int8 code arrays
    val idot = spark.sql("SELECT graft_dot_int8(array(127, -5, 3), array(2, 10, -1))")
      .as[Long].head
    assert(idot == 127L * 2 - 5 * 10 - 3)

    Seq(1.0, 2.0, 3.0, 15.0).toDF("x").createOrReplaceTempView("hx")
    val h = spark.sql("SELECT graft_histogram(x, 4, 0.0d, 8.0d) AS h FROM hx")
      .select($"h.counts", $"h.overflow", $"h.entries")
      .as[(Seq[Long], Long, Long)].head
    assert(h._1 == Seq(1L, 2L, 0L, 0L) && h._2 == 1L && h._3 == 4L)
  }

  test("graft_minhash and graft_simhash callable from SQL, bit-identical to Scala API") {
    GraftExtensions.register(spark)
    val sqlRow = spark.sql(
      "SELECT graft_minhash(array('a','b','c'), 4) AS mh, graft_simhash(array('a','b','c')) AS sh")
      .as[(Seq[Long], Long)].head

    import org.apache.spark.sql.functions.{array, lit}
    val (as, bs) = graft.ops.Dedup.seedArrays(4)
    val apiRow = Seq(1).toDF("one").select(
      graft.functions.TextHashExprs.minhashSig(array(lit("a"), lit("b"), lit("c")), as, bs).as("mh"),
      graft.functions.TextHashExprs.simhash(array(lit("a"), lit("b"), lit("c"))).as("sh"))
      .as[(Seq[Long], Long)].head
    assert(sqlRow == apiRow)
    assert(sqlRow._1.length == 4)
  }

  test("graft_bloom_might_contain callable from SQL with a serialized filter") {
    GraftExtensions.register(spark)
    val bloom = org.apache.spark.util.sketch.BloomFilter.create(1000, 0.01)
    (1L to 100L).foreach(bloom.putLong)
    val hex = graft.functions.BloomExprs.serialize(bloom)
      .map(b => f"$b%02x").mkString
    val got = spark.sql(
      s"SELECT k, graft_bloom_might_contain(k, X'$hex') AS hit " +
        "FROM VALUES (CAST(50 AS BIGINT)), (CAST(12345678 AS BIGINT)) AS t(k)")
      .as[(Long, Boolean)].collect().toMap
    assert(got(50L), "inserted key must hit")
    assert(got(12345678L) == bloom.mightContainLong(12345678L),
      "probe must agree with the driver-side filter exactly")
  }
}
