package graft

import org.apache.spark.sql.catalyst.plans.logical.Window
import org.scalatest.funsuite.AnyFunSuite

/** Suite-level plan invariants over EVERY graded query — the properties
  * a 100 TB deployment depends on, asserted structurally (on the
  * optimized logical plan) rather than by grepping execution logs, so a
  * regression fails a test instead of a warning scroll.
  *
  * The one whitelisted unpartitioned window is vocab_growth's running
  * sum over its checkpoint frame (TextAnalysis.vocabGrowth): the frame
  * is ≤ max_id/step rows BY CONSTRUCTION (driver-scale, documented
  * deliberate). Every rank-top-k shape that used to run as a global
  * `row_number` window now goes through [[graft.operators.TopK.ranked]]
  * (sort+limit → TakeOrderedAndProject) and must stay that way.
  */
class PlanInvariantsSpec extends AnyFunSuite {
  lazy val spark = TestSpark.spark
  private val dir = "/root/testdata/sf0.001"

  // corpus_budget_select's global window runs over the BIN-TOTALS frame
  // (≤ score-range/binWidth rows by construction — the phase-1 output of
  // its two-phase prefix sum), same driver-scale class as vocab_growth's
  // checkpoint frame
  private val whitelist = Set("vocab_growth", "corpus_budget_select")

  // AQE roots every eligible physical plan in AdaptiveSparkPlanExec —
  // a LEAF node, so a plain plan.collect inspects NOTHING inside it
  // (verified r13: a literal crossJoin's CartesianProductExec was
  // invisible to the old traversal). Unwrap recursively.
  private def allNodes(p: org.apache.spark.sql.execution.SparkPlan)
      : Seq[org.apache.spark.sql.execution.SparkPlan] = p match {
    case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
      p +: allNodes(a.executedPlan)
    case _ => p +: p.children.flatMap(allNodes)
  }

  test("no cartesian product in any graded query") {
    // a CartesianProductExec multiplies partitions x partitions — at
    // 100 TB that is a run-forever plan. The deliberate scalar
    // crossJoins (1-row totals/thresholds) plan as
    // BroadcastNestedLoopJoin over a broadcast single row, which is
    // fine and NOT matched here.
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val cart = allNodes(fn(spark, dir).queryExecution.executedPlan)
          .collect {
            case c: org.apache.spark.sql.execution.joins.CartesianProductExec => c
          }
        if (cart.nonEmpty) Some(name) else None
    }
    assert(offenders.isEmpty, s"cartesian product in: $offenders")
  }

  test("no unpartitioned window in any graded query outside the whitelist") {
    val offenders = SparkEntry.queries.toSeq.sortBy(_._1).flatMap {
      case (name, fn) =>
        val plan = fn(spark, dir).queryExecution.optimizedPlan
        val global = plan.collect {
          case w: Window if w.partitionSpec.isEmpty => w
        }
        if (global.nonEmpty) Some(name) else None
    }
    assert(offenders.toSet.subsetOf(whitelist),
      s"unpartitioned window in: ${offenders.filterNot(whitelist).sorted}")
    // the whitelist itself stays honest: drop entries that no longer
    // carry a global window so the list cannot rot into a blanket pass
    assert(whitelist.subsetOf(offenders.toSet),
      s"stale whitelist entries: ${whitelist -- offenders.toSet}")
  }
}
