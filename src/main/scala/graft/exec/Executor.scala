package graft.exec

import graft.plans.JoinEdge
import graft.stats.{PredicateOp, TableStats}

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions.broadcast

/** Folds a left-deep join order (the output of
  * [[graft.plans.JoinOptimizer.orderJoins]]) into a chained
  * `DataFrame.join` pipeline — the execution half the reference never had
  * (its optimizer produced an order but owned no join executor;
  * `/root/reference/src/optimizer/join_optimizer.cc:108-137` returns the
  * order and stops).
  *
  * Spark-first division of labor: our planner decides the join ORDER
  * (Catalyst's CBO reorder stays off by default, so the emitted order is
  * honored); Catalyst/Tungsten decide the physical algorithm
  * (broadcast-hash / shuffled-hash / sort-merge), predicate pushdown,
  * column pruning and codegen. We add an explicit `broadcast()` hint for
  * sides whose estimated post-filter cardinality is small, so dimension
  * tables never shuffle even when file-size stats are missing.
  */
object Executor {

  /** Row-count threshold under which a join side is broadcast-hinted. */
  val BroadcastRows: Long = 500000L

  /** Byte threshold for the broadcast hint: estimated post-filter bytes
    * (table pages × page size × selectivity) must also fit — a 500k-row
    * table of wide rows would OOM the driver/executors if hinted on row
    * count alone.
    */
  val BroadcastBytes: Long = 64L << 20

  def condition(left: DataFrame, right: DataFrame, e: JoinEdge): Column = {
    val (l, r) = (left(e.leftField), right(e.rightField))
    e.op match {
      case PredicateOp.EQ => l === r
      case PredicateOp.NE => l =!= r
      case PredicateOp.LT => l < r
      case PredicateOp.LE => l <= r
      case PredicateOp.GT => l > r
      case PredicateOp.GE => l >= r
    }
  }

  /** @param tables  per-table DataFrames (already filtered — push filters
    *                in before joining so Catalyst sees them at the scan)
    * @param order   left-deep edge order from the optimizer
    * @param stats   optional stats for broadcast decisions
    */
  def execute(
      tables: Map[String, DataFrame],
      order: Seq[JoinEdge],
      stats: Map[String, TableStats] = Map.empty,
      filterSel: Map[String, Double] = Map.empty): DataFrame = {
    require(order.nonEmpty, "empty join order")

    def hinted(name: String): DataFrame = {
      val df = tables(name)
      val small = stats.get(name).exists { s =>
        val sel = filterSel.getOrElse(name, 1.0)
        val bytes = s.numPages * TableStats.PageSizeBytes
        s.estimateTableCardinality(sel) <= BroadcastRows &&
          (bytes * sel).toLong <= BroadcastBytes
      }
      if (small) broadcast(df) else df
    }

    val first = order.head
    var joined = Set(first.leftTable, first.rightTable)
    // hint BOTH sides of the first edge: the optimizer may place a
    // dimension table on the left, and an unhinted small left side
    // would shuffle whenever file-size stats are unavailable (the exact
    // case the hint exists for). With both sides hinted Catalyst picks
    // the build side as usual.
    var current = hinted(first.leftTable).join(
      hinted(first.rightTable),
      condition(tables(first.leftTable), tables(first.rightTable), first),
      "inner")

    order.tail.foreach { e =>
      val cond = condition(tables(e.leftTable), tables(e.rightTable), e)
      if (joined.contains(e.leftTable) && joined.contains(e.rightTable)) {
        current = current.where(cond) // both sides present: residual predicate
      } else {
        val newSide = if (joined.contains(e.leftTable)) e.rightTable else e.leftTable
        current = current.join(hinted(newSide), cond, "inner")
        joined += newSide
      }
    }
    current
  }
}
