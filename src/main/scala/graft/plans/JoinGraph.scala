package graft.plans

import graft.stats.PredicateOp

/** A binary theta-join spec between two base tables — the analogue of the
  * reference's `LogicalJoinNode`
  * (`/root/reference/src/include/optimizer/join_optimizer.h:17-48`).
  *
  * Fields are referenced by column NAME (Spark-idiomatic); the reference
  * used integer column indices with the convention "index 0 ⇔ primary
  * key", which callers reproduce via the `isPkey` predicate passed to
  * [[JoinOptimizer.orderJoins]].
  *
  * NOTE the reference's set-identity ignores `op` (`join_optimizer.h:26-33`)
  * — a documented wart we do NOT replicate: two edges differing only in op
  * are distinct here. The DP's subset iteration order still matches the
  * reference's `std::set` order (sorted by (leftTable, rightTable,
  * leftField, rightField)) so plan-shape tests port 1:1.
  */
final case class JoinEdge(
    leftTable: String,
    rightTable: String,
    leftField: String,
    rightField: String,
    op: PredicateOp) {
  def swapInnerOuter: JoinEdge = {
    val swappedOp = op match {
      case PredicateOp.LT => PredicateOp.GT
      case PredicateOp.LE => PredicateOp.GE
      case PredicateOp.GT => PredicateOp.LT
      case PredicateOp.GE => PredicateOp.LE
      case other => other
    }
    JoinEdge(rightTable, leftTable, rightField, leftField, swappedOp)
  }
  def touches(table: String): Boolean =
    leftTable == table || rightTable == table
}

object JoinEdge {
  /** Reference std::set iteration order (op-insensitive, like the
    * reference's `operator<`).
    */
  implicit val ordering: Ordering[JoinEdge] =
    Ordering.by(e => (e.leftTable, e.rightTable, e.leftField, e.rightField))
}

/** Cost + cardinality + left-deep order for one join subset — the
  * reference's `CostCard` (`join_optimizer.h:52-60`).
  */
final case class CostCard(cost: Double, card: Long, plan: Vector[JoinEdge])

/** Memo table of the Selinger DP: best plan per join subset — the
  * reference's `PlanCache` (`join_optimizer.h:64-112`). Keys are
  * op-insensitive edge identity sets, matching the reference's
  * `std::set<LogicalJoinNode>` keys.
  */
final class PlanCache {
  private type Key = Set[(String, String, String, String)]
  private def keyOf(s: Iterable[JoinEdge]): Key =
    s.map(e => (e.leftTable, e.rightTable, e.leftField, e.rightField)).toSet

  private val best = scala.collection.mutable.Map.empty[Key, CostCard]

  def addPlan(s: Iterable[JoinEdge], cc: CostCard): Unit =
    best(keyOf(s)) = cc

  def get(s: Iterable[JoinEdge]): Option[CostCard] = best.get(keyOf(s))
}
