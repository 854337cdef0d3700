package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, HigherOrderFunction, LambdaFunction}
import org.apache.spark.sql.catalyst.plans.logical.Filter
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Mechanical guard against the lambda-splice perf trap (r17 verdict ask
  * #5; verify-skill "PERF TRAP" entry): filter pushdown inlines producing
  * projections into predicates UNCONDITIONALLY and lambda trees get no CSE,
  * so a higher-order function whose LAMBDA BODY captures an outer column
  * re-evaluates that producer once per array element per predicate
  * evaluation when it lands inside a `Filter` — the r15-era winnow/chunk
  * HOF forms (`transform(sequence(1, len), i -> hash(substr(text, i, k)))`
  * under a filter) cost 5–10× until the codegen'd kernels replaced them
  * (functions/WinnowExprs.scala, ShingleExprs.scala). The kernel migration
  * closed the class for current code; this spec keeps it closed across
  * every batch gate's optimized plan.
  *
  * Deliberately NOT flagged: HOFs in projections (evaluated once per row —
  * the two remaining attribute-capturing sites live there), and HOFs in
  * predicates whose lambdas capture nothing (`w -> w IN (...)` over a
  * computed array, e.g. the langid scoring q_pipeline_e2e splices) — those
  * duplicate a per-ROW producer, which codegen subexpression elimination
  * absorbs, not a per-ELEMENT one.
  */
class PlanGuardSpec extends AnyFunSuite {
  private lazy val spark: SparkSession = SparkTest.session
  private val dir = "/root/testdata/sf0.001"

  /** HOFs under a Filter condition in the optimized plan whose lambda body
    * references an outer attribute — the per-element producer re-evaluation
    * shape the optimizer cannot undo.
    */
  private def splicedHofs(df: DataFrame): Seq[String] = {
    val out = Seq.newBuilder[String]
    df.queryExecution.optimizedPlan.foreach {
      case f: Filter =>
        f.condition.foreach {
          case h: HigherOrderFunction =>
            val capturing = h.functions.exists {
              case LambdaFunction(body, _, _) =>
                body.exists(_.isInstanceOf[AttributeReference])
              case _ => false
            }
            if (capturing) out += s"${h.prettyName}(${h.sql.take(120)})"
          case _ => ()
        }
      case _ => ()
    }
    out.result()
  }

  test("the detector fires on the r15-era HOF-in-pushed-predicate form") {
    // the exact trap shape WinnowExprs replaced: per-position fingerprints
    // via transform(sequence(...)) with the text producer captured in the
    // lambda, then a filter over the derived column — PushDownPredicates
    // substitutes the definition into the predicate. Built over parquet (a
    // literal LocalRelation would be constant-folded away entirely).
    val df = spark.read.parquet(s"$dir/documents.parquet")
      .withColumn("fps", transform(
        sequence(lit(1), length(col("text")) - 4),
        i => hash(col("text").substr(i, lit(5)))))
      .filter(size(filter(col("fps"), f => f % 7 === 0)) > 0)
      .select(col("doc_id"))
    assert(splicedHofs(df).nonEmpty,
      "control failed: the optimizer no longer splices the r15 form into " +
        "a predicate — re-validate the detector against the current optimizer")
  }

  test("no batch gate's optimized plan has a capturing HOF in a filter predicate") {
    // stream gates excluded: their returned frame is a post-hoc memory-sink
    // read (the stream already ran), and constructing one executes the
    // whole stream — their logic is pinned by the kernel laws instead
    val names = SparkEntry.queries.keys.filterNot(_.startsWith("q_stream_")).toSeq.sorted
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    var scanned = 0
    names.foreach { name =>
      try {
        val hofs = splicedHofs(SparkEntry.queries(name)(spark, dir))
        scanned += 1
        if (hofs.nonEmpty) offenders += s"$name: ${hofs.mkString("; ")}"
      } catch {
        // a gate whose CONSTRUCTION throws here is a correctness-gate
        // problem, not a plan-shape one — don't double-report it, but keep
        // the scanned floor honest below
        case e: Throwable =>
          info(s"skipped $name (construction threw: ${e.getClass.getSimpleName})")
      }
    }
    assert(scanned >= 250,
      s"only $scanned gate plans scanned — the guard lost most of its coverage")
    assert(offenders.isEmpty,
      s"capturing HOF spliced into a filter predicate (the r15 lambda-splice " +
        s"trap — use a codegen'd kernel or keep the filter reading a " +
        s"materialized attribute):\n  " + offenders.mkString("\n  "))
  }
}
