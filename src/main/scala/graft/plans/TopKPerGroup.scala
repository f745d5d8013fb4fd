package graft.plans

import org.apache.spark.rdd.RDD
import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.catalyst.InternalRow
import org.apache.spark.sql.catalyst.expressions.{Attribute, Expression, SortOrder, UnsafeProjection, UnsafeRow}
import org.apache.spark.sql.catalyst.expressions.codegen.GenerateOrdering
import org.apache.spark.sql.catalyst.plans.logical.{LogicalPlan, UnaryNode}
import org.apache.spark.sql.catalyst.plans.physical.{ClusteredDistribution, Distribution, Partitioning, UnspecifiedDistribution}
import org.apache.spark.sql.execution.{SparkPlan, UnaryExecNode}

/** Top-k rows per group in a given sort order, as a whole custom
  * operator: logical node + planner strategy + two physical stages
  * (partial heaps before the shuffle, final heaps after).
  *
  * The composed alternative — `row_number().over(partitionBy(keys)
  * .orderBy(ord)) <= k` — shuffles EVERY row of every group and sorts
  * whole partitions. This operator keeps a bounded heap of k rows per
  * group on the map side, so at 100 TB the shuffle carries at most
  * k * upstream-partitions rows per group, independent of group size,
  * and nothing is ever fully sorted. (The skew case — one hot group —
  * is exactly where the map-side bound matters most.)
  *
  * MEMORY CONTRACT: the map-side state is a plain on-heap map of
  * (group key → k-row heap) with no Spark memory accounting or spill
  * path, so per-partition memory is O(distinct groups per partition × k
  * rows). That is the right trade for the operator's target shape —
  * bounded group cardinality with arbitrarily large groups (per-source
  * caps, per-category rankings) — and the wrong one for a near-unique
  * group column, where the row_number window form (which sorts with a
  * spilling external sorter) should be used instead.
  *
  * Exercises the custom-operator extension path end-to-end (SURVEY §7.3's
  * option (c)): `LogicalPlan` -> `Strategy` -> `SparkPlan` with proper
  * `requiredChildDistribution`, registered either via
  * [[GraftExtensions]] or per-session `experimental.extraStrategies`.
  */
final case class TopKPerGroup(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    child: LogicalPlan) extends UnaryNode {
  override def output: Seq[Attribute] = child.output
  override protected def withNewChildInternal(newChild: LogicalPlan): TopKPerGroup =
    copy(child = newChild)
}

object TopKStrategy extends org.apache.spark.sql.execution.SparkStrategy {
  import org.apache.spark.sql.execution.PlanLater
  override def apply(plan: LogicalPlan): Seq[SparkPlan] = plan match {
    case TopKPerGroup(groups, order, k, child) =>
      val planned = PlanLater(child)
      TopKPerGroupExec(groups, order, k, partial = false,
        TopKPerGroupExec(groups, order, k, partial = true, planned)) :: Nil
    case _ => Nil
  }
}

final case class TopKPerGroupExec(
    groupExprs: Seq[Expression],
    order: Seq[SortOrder],
    k: Int,
    partial: Boolean,
    child: SparkPlan) extends UnaryExecNode {

  override def output: Seq[Attribute] = child.output
  override def outputPartitioning: Partitioning = child.outputPartitioning
  override def requiredChildDistribution: Seq[Distribution] =
    if (partial) UnspecifiedDistribution :: Nil
    else ClusteredDistribution(groupExprs) :: Nil

  override protected def doExecute(): RDD[InternalRow] = {
    val groupsBound = groupExprs
    val orderBound = order
    val schema = child.output
    val limit = k
    child.execute().mapPartitions { iter =>
      val keyProj = UnsafeProjection.create(groupsBound, schema)
      val cmp = GenerateOrdering.generate(orderBound, schema)
      // per group: max-heap under cmp so the WORST kept row is on top
      val heaps = new java.util.HashMap[UnsafeRow,
        scala.collection.mutable.PriorityQueue[InternalRow]]()
      val heapOrd: Ordering[InternalRow] = (a, b) => cmp.compare(a, b)
      while (iter.hasNext) {
        val row = iter.next()
        val key = keyProj(row)
        var heap = heaps.get(key)
        if (heap == null) {
          heap = scala.collection.mutable.PriorityQueue.empty(heapOrd)
          heaps.put(key.copy(), heap)
        }
        if (heap.size < limit) heap.enqueue(row.copy())
        else if (cmp.compare(row, heap.head) < 0) {
          heap.dequeue()
          heap.enqueue(row.copy())
        }
      }
      // stream the heaps directly — buffering every kept row into a
      // second collection transiently doubled the retained footprint per
      // partition (worst exactly at high group cardinality)
      import scala.jdk.CollectionConverters._
      heaps.values().iterator().asScala.flatMap(_.iterator)
    }
  }

  override protected def withNewChildInternal(newChild: SparkPlan): TopKPerGroupExec =
    copy(child = newChild)
}

object TopK {
  /** Top-k rows per group; output order within/among groups is
    * unspecified (like any unsorted relational result).
    *
    * Columns are referenced by name and resolved against the analyzed
    * child plan (Column-derived expressions drag non-serializable
    * column-node origin metadata into task closures).
    *
    * @param orderCols (columnName, ascending)
    */
  def perGroup(df: DataFrame, groupCols: Seq[String],
      orderCols: Seq[(String, Boolean)], k: Int): DataFrame = {
    // fail at the call site, not as an executor NoSuchElementException
    // (k <= 0 dereferenced an empty heap) or an EnsureRequirements
    // require about AllTuples nowhere near the caller (empty grouping)
    require(k > 0, s"top-k needs k > 0, got $k")
    require(groupCols.nonEmpty,
      "perGroup needs at least one group column (global top-k is orderBy.limit)")
    require(orderCols.nonEmpty, "perGroup needs at least one order column")
    val spark = df.sparkSession
    ensureStrategy(spark)
    val child = GraftSqlBridge.logicalPlan(df)
    // exact-name match first, case-insensitive as the fallback; EITHER
    // tier matching more than one attribute is ambiguous and fails by
    // name — `find` used to silently bind whichever same-named column
    // appeared first in the output
    def attr(n: String): Attribute = {
      val exact = child.output.filter(_.name == n)
      val found =
        if (exact.nonEmpty) exact
        else child.output.filter(_.name.equalsIgnoreCase(n))
      found match {
        case Seq(one) => one
        case Seq() => throw new IllegalArgumentException(
          s"column $n not in ${child.output.map(_.name)}")
        case many => throw new IllegalArgumentException(
          s"column $n is ambiguous: matches ${many.map(_.name)} — " +
            "rename or select to disambiguate")
      }
    }
    import org.apache.spark.sql.catalyst.expressions.{Ascending, Descending}
    import org.apache.spark.sql.catalyst.optimizer.NormalizeNaNAndZero
    import org.apache.spark.sql.types.{DoubleType, FloatType}
    // normalize floating-point GROUP keys: the custom node bypasses
    // Catalyst's NormalizeFloatingNumbers rule (it rewrites only
    // Aggregate/Window/Join keys), so raw UnsafeRow key bytes would
    // split -0.0 vs 0.0 (and distinct NaN bit patterns) into separate
    // groups where SQL GROUP BY merges them
    def groupKey(n: String): Expression = attr(n) match {
      case a if a.dataType == FloatType || a.dataType == DoubleType =>
        NormalizeNaNAndZero(a)
      case a => a
    }
    val plan = TopKPerGroup(
      groupCols.map(groupKey),
      orderCols.map { case (n, asc) =>
        SortOrder(attr(n), if (asc) Ascending else Descending)
      },
      k, child)
    GraftSqlBridge.datasetOfRows(spark, plan)
  }

  /** Idempotently register the strategy on sessions without
    * [[GraftExtensions]].
    */
  def ensureStrategy(spark: SparkSession): Unit =
    if (!spark.experimental.extraStrategies.contains(TopKStrategy))
      spark.experimental.extraStrategies =
        spark.experimental.extraStrategies :+ TopKStrategy
}
