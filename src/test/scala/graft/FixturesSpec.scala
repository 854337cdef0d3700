package graft

import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the driver-generated testdata's on-file contract.
  *
  * The generator regenerating the fixtures is a demonstrated hazard: in
  * round 10 `events.ts` silently switched from TIMESTAMP(NANOS) to
  * TIMESTAMP_NTZ micros and thirteen gate queries failed or vanished with no
  * named signal. This spec converts the next drift into one assertion with
  * the table and column in its message. It checks the RAW footer schema
  * (what the generator wrote) and the ADAPTED schema (what the engine
  * promises downstream), not query results.
  */
class FixturesSpec extends AnyFunSuite {
  lazy val spark = SparkTest.session
  private val sfDir = "/root/testdata/sf0.001"
  private def have = new java.io.File(s"$sfDir/events.parquet").exists()

  private def raw(name: String) = spark.read.parquet(s"$sfDir/$name.parquet")
  private def fields(name: String): Map[String, DataType] =
    raw(name).schema.fields.map(f => f.name -> f.dataType).toMap

  test("events: raw ts is a known encoding and adapts to TimestampType") {
    assume(have)
    val rawTs = fields("events")("ts")
    assert(
      rawTs == TimestampNTZType || rawTs == TimestampType || rawTs == LongType,
      s"events.ts on-file type $rawTs is none of the encodings Tables.adaptTs handles - " +
        "the generator changed the contract again")
    val adapted = Tables.events(spark, sfDir)
    assert(adapted.schema("ts").dataType == TimestampType,
      s"Tables.events must yield TimestampType ts, got ${adapted.schema("ts").dataType}")
    // epoch fence: adapted timestamps must land in the generator's era
    val r = adapted.agg(min(year(col("ts"))), max(year(col("ts")))).head()
    assert(r.getInt(0) >= 2000 && r.getInt(1) < 2100,
      s"events.ts adapted to years [${r.getInt(0)}, ${r.getInt(1)}] - wrong epoch, " +
        "the encoding likely drifted (see Tables.adaptTs)")
  }

  test("events: remaining columns keep their assumed types; props is JSON") {
    assume(have)
    val f = fields("events")
    assert(f("event_id") == LongType && f("user_id") == LongType &&
      f("event_type") == StringType && f("value") == DoubleType &&
      f("props") == StringType, s"events schema drifted: $f")
    // q_json_funcs depends on props holding parseable JSON objects
    val parsed = raw("events").limit(50)
      .select(count(when(get_json_object(col("props"), "$").isNotNull, 1)).as("n"),
        count(lit(1)).as("total")).head()
    assert(parsed.getLong(0) == parsed.getLong(1),
      "events.props no longer parses as JSON - q_json_funcs contract broken")
  }

  test("embeddings: float array vectors with long ids") {
    assume(have)
    val f = fields("embeddings")
    assert(f("vec_id") == LongType, s"embeddings.vec_id drifted: ${f("vec_id")}")
    assert(f("embedding").isInstanceOf[ArrayType] &&
      f("embedding").asInstanceOf[ArrayType].elementType == FloatType,
      s"embeddings.embedding must be array<float>, got ${f("embedding")} - " +
        "every ANN kernel assumes float elements")
    assert(f("label") == IntegerType, s"embeddings.label drifted: ${f("label")}")
  }

  test("documents: text corpus columns") {
    assume(have)
    val f = fields("documents")
    assert(f("doc_id") == LongType && f("text") == StringType &&
      f("lang") == StringType && f("source") == StringType &&
      f("n_chars") == LongType, s"documents schema drifted: $f")
  }

  test("lineitem/orders: keys, measures and dates") {
    assume(have)
    val l = fields("lineitem")
    assert(l("l_orderkey") == LongType && l("l_quantity") == DoubleType &&
      l("l_extendedprice") == DoubleType && l("l_returnflag") == StringType,
      s"lineitem schema drifted: $l")
    // date-typed or timestamp-typed shipdate both work for the date family,
    // but a silent switch should still be named here
    val ship = l("l_shipdate")
    assert(ship == DateType || ship == TimestampType || ship == TimestampNTZType,
      s"lineitem.l_shipdate drifted to $ship")
    val o = fields("orders")
    assert(o("o_orderkey") == LongType && o("o_custkey") == LongType &&
      o("o_totalprice") == DoubleType, s"orders schema drifted: $o")
    assert(o("o_orderdate") == ship,
      s"orders.o_orderdate (${o("o_orderdate")}) and lineitem.l_shipdate ($ship) " +
        "diverged - date-join queries assume one temporal encoding")
  }
}
