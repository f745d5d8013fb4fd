package graft.plans

import graft.stats.{PredicateOp, TableStats}

import org.apache.spark.sql.SparkSessionExtensions
import org.apache.spark.sql.catalyst.expressions.{Attribute, EqualTo, Expression, PredicateHelper}
import org.apache.spark.sql.catalyst.plans.Inner
import org.apache.spark.sql.catalyst.plans.logical.{Filter, Join, JoinHint, LogicalPlan, Project}
import org.apache.spark.sql.catalyst.rules.Rule
import org.apache.spark.sql.catalyst.trees.TreeNodeTag

/** Catalyst integration of the Selinger DP (SURVEY §4.3): an optimizer
  * rule that detects chains of inner equi-joins over base relations and
  * rewrites them into the left-deep order chosen by
  * [[JoinOptimizer.orderJoins]] under the reference's NLJ cost model.
  *
  * This is the Spark-first packaging of the reference's core deliverable:
  * instead of an external planner producing a call sequence, the DP runs
  * inside Catalyst where it applies to ANY DataFrame/SQL query. Physical
  * algorithm selection (broadcast/hash/merge) stays with Spark's
  * JoinSelection — this rule only fixes the ORDER, exactly like the
  * reference (`/root/reference/src/optimizer/join_optimizer.cc:108-137`
  * produces an order and owns no executor).
  *
  * Statistics: per-relation row counts come from the logical plan's
  * size-in-bytes statistics (Spark's file-index stats), mapped into the
  * reference's cost model (scanCost = 2 * io * pages at 8196 B/page).
  * The column-histogram path ([[TableStats.build]]) remains available for
  * callers that pre-compute stats; inside the rule we stay with plan
  * stats so optimization never triggers jobs.
  *
  * Registered via [[GraftExtensions]]
  * (`spark.sql.extensions=graft.plans.GraftExtensions`) or applied
  * directly to an optimized plan.
  */
object SelingerJoinReorder extends Rule[LogicalPlan] with PredicateHelper {

  private val MaxEdges = 12 // DP is exponential; the reference caps at ~10

  /** Marks joins this rule already settled, so the fixed-point optimizer
    * batch converges instead of re-deriving sub-chains each iteration.
    */
  private val OrderedTag = TreeNodeTag[Boolean]("graft.selinger.ordered")

  override def apply(plan: LogicalPlan): LogicalPlan = plan.transformDown {
    case j @ Join(_, _, Inner, _, _) if j.getTagValue(OrderedTag).isEmpty =>
      reorder(j) match {
        case Some(out) =>
          // Tag only settled trees; an ineligible join (e.g. conditions
          // not yet pushed into it) must stay eligible for later
          // fixed-point iterations.
          out.foreach {
            case jj: Join => jj.setTagValue(OrderedTag, true)
            case _ =>
          }
          out
        case None => j
      }
  }

  /** Flatten a tree of unhinted inner joins into (relations, conjunctive
    * conditions), looking through the attribute-only Projects that column
    * pruning interleaves between joins (the rebuilt tree restores the
    * final output order, and pruning re-runs in the same fixed-point
    * batch).
    */
  private def flatten(p: LogicalPlan): (Seq[LogicalPlan], Seq[Expression]) =
    p match {
      case Join(l, r, Inner, cond, JoinHint.NONE) =>
        val (lr, lc) = flatten(l)
        val (rr, rc) = flatten(r)
        (lr ++ rr, lc ++ rc ++ cond.toSeq.flatMap(splitConjunctivePredicates))
      case Project(projectList, j @ Join(_, _, Inner, _, JoinHint.NONE))
          if projectList.forall(_.isInstanceOf[Attribute]) =>
        flatten(j)
      case other => (Seq(other), Seq.empty)
    }

  private def reorder(root: Join): Option[LogicalPlan] = {
    val (rels, conds) = flatten(root)
    if (rels.size < 3 || rels.size > MaxEdges + 1) return None

    val names: Map[LogicalPlan, String] =
      rels.zipWithIndex.map { case (r, i) => r -> s"r$i" }.toMap
    def relOf(a: Attribute): Option[LogicalPlan] =
      rels.find(_.outputSet.contains(a))

    // every conjunct must be an equi-join between two distinct relations
    val edges = conds.map {
      case EqualTo(a: Attribute, b: Attribute) =>
        (relOf(a), relOf(b)) match {
          case (Some(ra), Some(rb)) if ra != rb =>
            Some((JoinEdge(names(ra), names(rb), a.name, b.name, PredicateOp.EQ),
              Map(names(ra) -> a, names(rb) -> b)))
          case _ => None
        }
      case _ => None
    }
    if (edges.exists(_.isEmpty)) return None
    val joinEdges = edges.flatten.map(_._1).toVector
    if (joinEdges.isEmpty || joinEdges.size > MaxEdges) return None
    // duplicate edges on the same table pair break the DP's memo keys
    if (joinEdges.map(e => Set(e.leftTable, e.rightTable)).distinct.size !=
      joinEdges.size) return None

    val byName = names.map(_.swap)
    val stats: Map[String, TableStats] = byName.map { case (n, rel) =>
      val s = rel.stats
      val bytes = s.sizeInBytes
      val pages = ((bytes + 8195) / 8196).max(1).toLong
      val rowSize = math.max(8L, 8L * rel.output.size)
      val rows = s.rowCount.map(_.toLong)
        .getOrElse((bytes / rowSize).max(1).toLong)
      n -> TableStats.fromHistograms(rows, 100.0, pages, IndexedSeq.empty)
    }
    // reference pkey convention: the relation's first output column
    val isPkey = (tbl: String, colName: String) =>
      byName(tbl).output.headOption.exists(_.name == colName)

    val order = new JoinOptimizer(joinEdges)
      .orderJoins(stats, Map.empty, isPkey)
    if (order.isEmpty) return None

    // fold the order back into a left-deep Join tree
    val attrFor: Map[JoinEdge, Map[String, Attribute]] =
      edges.flatten.map { case (e, m) => e -> m }.toMap ++
        edges.flatten.map { case (e, m) => e.swapInnerOuter -> m }.toMap

    var joined: Set[String] = Set(order.head.leftTable, order.head.rightTable)
    def cond(e: JoinEdge): Expression =
      EqualTo(attrFor(e)(e.leftTable), attrFor(e)(e.rightTable))
    var tree: LogicalPlan = Join(byName(order.head.leftTable),
      byName(order.head.rightTable), Inner, Some(cond(order.head)), JoinHint.NONE)
    order.tail.foreach { e =>
      if (joined(e.leftTable) && joined(e.rightTable)) {
        tree = Filter(cond(e), tree)
      } else {
        val newSide = if (joined(e.leftTable)) e.rightTable else e.leftTable
        tree = Join(tree, byName(newSide), Inner, Some(cond(e)), JoinHint.NONE)
        joined += newSide
      }
    }

    if (tree.canonicalized == root.canonicalized) None
    // Reordering permutes the join output's attribute order; restore the
    // original order for parents that are position-sensitive (same move
    // as Catalyst's CostBasedJoinReorder).
    else if (tree.output == root.output) Some(tree)
    else Some(Project(root.output, tree))
  }
}

/** `spark.sql.extensions` entry point: injects the Selinger reorder rule,
  * the TopKPerGroup planner strategy, and SQL bindings for the native
  * expressions (`word_shingles`, `minhash_sig`, `simhash64`,
  * `dot_product`).
  */
class GraftExtensions extends (SparkSessionExtensions => Unit) {
  import org.apache.spark.sql.catalyst.FunctionIdentifier
  import org.apache.spark.sql.catalyst.expressions.{Expression, ExpressionInfo, Literal}
  import graft.functions._

  private def info(name: String, usage: String) =
    new ExpressionInfo("graft.functions", name, usage)

  private def intArg(e: Expression, what: String): Int = e match {
    case Literal(v: Int, _) => v
    case other => throw new IllegalArgumentException(
      s"$what must be an integer literal, got $other")
  }

  override def apply(ext: SparkSessionExtensions): Unit = {
    ext.injectOptimizerRule(_ => SelingerJoinReorder)
    ext.injectPlannerStrategy(_ => TopKStrategy)

    ext.injectFunction((FunctionIdentifier("word_shingles"),
      info("word_shingles", "word_shingles(text, w) - distinct word w-shingles"),
      (args: Seq[Expression]) =>
        WordShingles(args.head, intArg(args(1), "shingle width"))))

    ext.injectFunction((FunctionIdentifier("minhash_sig"),
      info("minhash_sig", "minhash_sig(shingles, k) - k-permutation minhash signature"),
      (args: Seq[Expression]) => {
        val k = intArg(args(1), "numHashes")
        MinHashSignature(args.head,
          graft.operators.Dedup.minHashCoeffArray(k),
          graft.operators.Dedup.HashPrime)
      }))

    ext.injectFunction((FunctionIdentifier("simhash64"),
      info("simhash64", "simhash64(tokens) - 64-bit simhash of a token array"),
      (args: Seq[Expression]) => SimHash64(args.head)))

    ext.injectFunction((FunctionIdentifier("dot_product"),
      info("dot_product", "dot_product(a, b) - float/double array dot product"),
      (args: Seq[Expression]) => DotProduct(args.head, args(1))))
  }
}
