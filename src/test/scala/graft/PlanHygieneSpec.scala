package graft

import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Scale-hygiene net over EVERY driver entry: a CartesianProductExec in
  * a plan means Spark found no join keys AND no broadcastable side — at
  * 100 TB that is rows² work appearing silently after an innocuous
  * refactor (a renamed join column, a lost broadcast bound). Building
  * each entry's physical plan at sf0.001 catches that class in CI;
  * execution is NOT required (entries whose CONSTRUCTION runs jobs —
  * trainers, kv scenarios, Pregel loops — run them at sf0.001 cost).
  */
class PlanHygieneSpec extends SparkSpec {

  private def flatten(p: SparkPlan): Seq[SparkPlan] = p match {
    case a: AdaptiveSparkPlanExec => p +: flatten(a.executedPlan)
    case q: QueryStageExec => p +: flatten(q.plan)
    case _ => p +: p.children.flatMap(flatten)
  }

  test("no driver entry plans a CartesianProductExec or an unpartitioned window") {
    import org.apache.spark.sql.execution.window.WindowExec
    val cartesian = Seq.newBuilder[String]
    val windows = Seq.newBuilder[String]
    val failures = Seq.newBuilder[String]
    SparkEntry.queries.foreach { case (name, fn) =>
      try {
        val plan = fn(spark, SF).queryExecution.executedPlan
        val nodes = flatten(plan)
        if (nodes.exists(_.isInstanceOf[CartesianProductExec]))
          cartesian += name
        // an EMPTY partitionSpec moves the whole input to one task —
        // Spark logs "No Partition Defined for Window operation!";
        // provably-tiny inputs must say so via partitionBy(lit(0))
        nodes.foreach {
          case w: WindowExec if w.partitionSpec.isEmpty => windows += name
          case _ => ()
        }
      } catch {
        case e: Throwable => failures += s"$name: ${e.getMessage.take(120)}"
      }
    }
    assert(failures.result().isEmpty, failures.result().mkString("; "))
    assert(cartesian.result().isEmpty,
      s"cartesian product planned in: ${cartesian.result().mkString(", ")}")
    assert(windows.result().isEmpty,
      s"unpartitioned WindowExec planned in: ${windows.result().distinct.mkString(", ")}")
  }
}
