package graft

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.FunctionIdentifier
import org.apache.spark.sql.catalyst.analysis.FunctionRegistry
import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}

import graft.functions.{BloomExprs, BloomMightContain, DotProduct, DotProductInt, HistogramAggExpr, MinhashSignature, Simhash32}

/** SQL surface for graft's custom expressions, injectable at session build
  * time (`SparkSession.builder().withExtensions(new GraftExtensions)`) or via
  * `spark.sql.extensions=graft.GraftExtensions`:
  *
  *   SELECT graft_dot(a, b)                          -- codegen'd dot product
  *   SELECT graft_dot_int8(qa, qb)                   -- integer dot over int8 codes
  *   SELECT graft_histogram(x, 128, 0.0, 100.0)      -- native histogram agg
  *   SELECT graft_minhash(shingles, 16)              -- k-wide one-pass MinHash
  *   SELECT graft_simhash(tokens)                    -- 32-bit one-pass SimHash
  *   SELECT graft_bloom_might_contain(key, X'...')   -- Bloom probe (serialized
  *                                                      filter as binary literal)
  *
  * `graft_minhash(arr, k)` uses the engine's standard md5-derived seed vectors
  * ([[graft.ops.Dedup.seedArrays]]), so SQL results are bit-identical to the
  * Scala API's.
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import GraftExtensions.{builders, info}

  override def apply(ext: SparkSessionExtensions): Unit =
    builders.foreach { case (name, builder) =>
      ext.injectFunction((new FunctionIdentifier(name), info(name), builder))
    }
}

object GraftExtensions {

  private def lit[T](fn: String, e: Expression, what: String): T = e match {
    case Literal(v, _) => v.asInstanceOf[T]
    case other => throw new IllegalArgumentException(
      s"$fn: $what must be a literal, got $other")
  }

  /** one builder per SQL function — shared by the extension injector and the
    * imperative [[register]] path so the two surfaces cannot drift
    */
  private val builders: Seq[(String, Seq[Expression] => Expression)] = Seq(
    "graft_dot" -> (args => DotProduct(args(0), args(1))),
    "graft_dot_int8" -> (args => DotProductInt(args(0), args(1))),
    "graft_histogram" -> (args => HistogramAggExpr(
      args(0),
      lit[Int]("graft_histogram", args(1), "nbins"),
      lit[Number]("graft_histogram", args(2), "lo").doubleValue(),
      lit[Number]("graft_histogram", args(3), "hi").doubleValue())),
    "graft_minhash" -> { args =>
      val k = lit[Int]("graft_minhash", args(1), "k")
      val (as, bs) = graft.ops.Dedup.seedArrays(k)
      MinhashSignature(args(0), as, bs)
    },
    "graft_simhash" -> (args => Simhash32(args(0))),
    "graft_bloom_might_contain" -> (args => BloomMightContain(
      args(0),
      BloomExprs.deserialize(
        lit[Array[Byte]]("graft_bloom_might_contain", args(1), "serialized bloom filter")))),
  )

  private val exprClass: Map[String, String] = Map(
    "graft_dot" -> classOf[DotProduct].getName,
    "graft_dot_int8" -> classOf[DotProductInt].getName,
    "graft_histogram" -> classOf[HistogramAggExpr].getName,
    "graft_minhash" -> classOf[MinhashSignature].getName,
    "graft_simhash" -> classOf[Simhash32].getName,
    "graft_bloom_might_contain" -> classOf[BloomMightContain].getName,
  )

  private def info(name: String) = new ExpressionInfo(exprClass(name), name)

  /** Imperative registration on an existing session (tests, REPL). */
  def register(spark: org.apache.spark.sql.SparkSession): Unit = {
    val reg = spark.sessionState.functionRegistry
    builders.foreach { case (name, builder) =>
      reg.createOrReplaceTempFunction(name, builder, "scala_udf")
    }
  }
}
