package graft

import graft.operators.Graph
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Connected components vs a driver-side union-find oracle on random
  * graphs, plus the adversarial shapes for star-contraction algorithms:
  * long chains (where naive label propagation needs O(diameter) rounds)
  * and hubs (where neighborhood-array implementations OOM).
  */
object GraphSpec extends Properties("Graph") {
  private lazy val spark = SharedSpark.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private def unionFind(n: Long, edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val parent = scala.collection.mutable.Map[Long, Long]()
    def find(x: Long): Long = {
      val p = parent.getOrElse(x, x)
      if (p == x) x else { val r = find(p); parent(x) = r; r }
    }
    edges.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb)
    }
    val ids = (edges.flatMap(e => Seq(e._1, e._2)) ++ (0L until n)).distinct
    ids.map(i => i -> find(i)).toMap
  }

  private def check(n: Long, edges: Seq[(Long, Long)]): Prop = {
    import spark.implicits._
    val vertices = (0L until n).toDF("id")
    val e = edges.toDF("a", "b")
    val got = Graph.componentsFor(vertices, "id", e, "a", "b")
      .as[(Long, Long)].collect().toMap
    val want = unionFind(n, edges).filter(_._1 < n)
    Prop(got == want) :| s"got ${got.toSeq.sorted.take(20)} want ${want.toSeq.sorted.take(20)}"
  }

  property("random graphs match union-find") = {
    val edgeGen = for {
      n <- Gen.choose(2, 60)
      m <- Gen.choose(0, 80)
      es <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
    } yield (n.toLong, es)
    Prop.forAllNoShrink(edgeGen) { case (n, es) => check(n, es) }
  }

  property("long chain collapses to one component") = {
    val n = 200L
    val chain = (0L until n - 1).map(i => (i, i + 1))
    check(n, chain)
  }

  property("hub star plus chain tail") = {
    val hub = (1L until 150L).map(i => (0L, i))
    val tail = (150L until 180L).map(i => (i - 1, i))
    check(180L, hub ++ tail)
  }

  property("self-loops, duplicates, reversed edges ignored") = {
    val es = Seq((5L, 5L), (1L, 2L), (2L, 1L), (1L, 2L), (3L, 4L))
    check(6L, es)
  }

  property("exhausting maxIter without convergence fails loudly") = {
    import spark.implicits._
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("a", "b")
    val threw =
      try { Graph.connectedComponents(chain, "a", "b", maxIter = 1).count(); false }
      catch { case _: IllegalStateException => true }
    // and the opt-out returns best-effort partial clusters without throwing
    val partial = Graph.connectedComponents(chain, "a", "b", maxIter = 1,
      requireConvergence = false)
    Prop(threw) :| "maxIter=1 on a 200-chain must throw" &&
      Prop(partial.count() > 0L) :| "opt-out must return partial clusters"
  }
}
