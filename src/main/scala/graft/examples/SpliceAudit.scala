package graft.examples

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.catalyst.expressions.{AttributeReference, Expression, HigherOrderFunction, LambdaFunction, Literal, NamedLambdaVariable}

/** Projection-side lambda-splice audit: for each gate, walk every
  * expression in the OPTIMIZED plan and report higher-order functions
  * whose lambda body contains a non-trivial producer (anything that is not
  * a lambda variable, attribute, literal, or a cheap wrapper over those) —
  * the O(elements × producer) shape. PlanGuardSpec pins the FILTER case;
  * this is the eyeball tool for projections, where cost is per-row ×
  * per-element rather than correctness-gated (the quantize O(d²) find).
  */
object SpliceAudit {
  private def heavy(e: Expression): Boolean = e match {
    case _: NamedLambdaVariable | _: AttributeReference | _: Literal => false
    case _ =>
      // a producer is "heavy" if its subtree computes over an attribute
      // through >1 level (split/slice/regexp/hash over an attribute, or an
      // aggregate/array op over a computed array)
      e.children.nonEmpty && e.exists {
        case a: AttributeReference => a.dataType.typeName.startsWith("array") ||
          a.dataType.typeName == "string"
        case _ => false
      }
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val dir = sys.env.getOrElse("GRAFT_PROBE_SF_DIR", "/root/testdata/sf0.001")
    for (name <- args) {
      val df = graft.SparkEntry.queries(name)(spark, dir)
      var hits = 0
      df.queryExecution.optimizedPlan.foreach { node =>
        node.expressions.foreach(_.foreach {
          case h: HigherOrderFunction =>
            h.functions.foreach {
              case LambdaFunction(body, _, _) =>
                val producers = body.collect {
                  case e if heavy(e) && !e.exists(_.isInstanceOf[LambdaFunction]) => e
                }
                // report the deepest offenders once per HOF
                if (producers.nonEmpty) {
                  hits += 1
                  println(s"AUDIT $name ${h.prettyName}: " +
                    producers.map(_.sql.take(90)).distinct.take(3).mkString(" | "))
                }
              case _ => ()
            }
          case _ => ()
        })
      }
      if (hits == 0) println(s"AUDIT $name clean")
    }
    spark.stop()
  }
}
