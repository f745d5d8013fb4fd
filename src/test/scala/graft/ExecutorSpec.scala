package graft

import graft.exec.Executor
import graft.plans.JoinEdge
import graft.stats.PredicateOp
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Executor folds a left-deep edge order into DataFrame joins: new-side
  * attachment from either edge orientation, residual predicates when
  * both sides are already joined, and theta conditions.
  */
class ExecutorSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private lazy val tables = Map(
    "a" -> Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("a_k", "a_v"),
    "b" -> Seq((1L, 100L), (2L, 200L)).toDF("b_k", "b_v"),
    "c" -> Seq((100L, "x"), (200L, "y")).toDF("c_k", "c_n"))

  test("chains joins, attaching the un-joined side regardless of orientation") {
    val order = Vector(
      JoinEdge("a", "b", "a_k", "b_k", PredicateOp.EQ),
      // edge written c-then-b; b is already joined so c attaches
      JoinEdge("c", "b", "c_k", "b_v", PredicateOp.EQ))
    val out = Executor.execute(tables, order)
      .select("a_k", "c_n").collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(out == Set((1L, "x"), (2L, "y")))
  }

  test("edge between two already-joined tables becomes a residual filter") {
    val order = Vector(
      JoinEdge("a", "b", "a_k", "b_k", PredicateOp.EQ),
      JoinEdge("a", "b", "a_v", "b_v", PredicateOp.LT)) // residual: 10<100, 20<200
    val out = Executor.execute(tables, order)
      .select("a_k").as[Long].collect().toSet
    assert(out == Set(1L, 2L))
  }

  test("theta edges produce non-equi conditions") {
    val order = Vector(JoinEdge("a", "b", "a_v", "b_v", PredicateOp.GE))
    val n = Executor.execute(tables, order).count()
    // a_v in {10,20,30} >= b_v in {100,200}: none
    assert(n == 0L)
  }

  test("broadcast hint requires small bytes, not just small row count") {
    import graft.stats.TableStats
    def hasBroadcastHint(plan: org.apache.spark.sql.catalyst.plans.logical.LogicalPlan): Boolean =
      plan.collect {
        case j: org.apache.spark.sql.catalyst.plans.logical.Join
            if j.hint.leftHint.orElse(j.hint.rightHint)
              .exists(_.strategy.isDefined) => j
      }.nonEmpty
    val order = Vector(JoinEdge("a", "b", "a_k", "b_k", PredicateOp.EQ))
    // few rows AND few pages -> hinted
    val narrow = Map("b" -> TableStats.fromHistograms(2L, 100.0, 1L, IndexedSeq.empty))
    assert(hasBroadcastHint(
      Executor.execute(tables, order, narrow).queryExecution.optimizedPlan))
    // few rows but ~8 GB of pages (wide rows) -> NOT hinted
    val wide = Map("b" -> TableStats.fromHistograms(
      2L, 100.0, 1000000L, IndexedSeq.empty))
    assert(!hasBroadcastHint(
      Executor.execute(tables, order, wide).queryExecution.optimizedPlan))
    // a small dimension placed on the LEFT of the first edge is hinted
    // too — only hinting the right side would shuffle the dim whenever
    // file-size stats are unavailable (the case the hint exists for)
    val leftOrder = Vector(JoinEdge("b", "a", "b_k", "a_k", PredicateOp.EQ))
    val narrowLeft = Map("b" -> TableStats.fromHistograms(2L, 100.0, 1L, IndexedSeq.empty))
    assert(hasBroadcastHint(
      Executor.execute(tables, leftOrder, narrowLeft).queryExecution.optimizedPlan))
  }
}
