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

  private def check(n: Long, edges: Seq[(Long, Long)],
      localFinishEdges: Long): Prop = {
    import spark.implicits._
    val vertices = (0L until n).toDF("id")
    val e = edges.toDF("a", "b")
    val got = Graph.componentsFor(vertices, "id", e, "a", "b",
        localFinishEdges = localFinishEdges)
      .as[(Long, Long)].collect().toMap
    val want = unionFind(n, edges).filter(_._1 < n)
    Prop(got == want) :| s"got ${got.toSeq.sorted.take(20)} want ${want.toSeq.sorted.take(20)}"
  }

  private val ccEdgeGen = for {
    n <- Gen.choose(2, 60)
    m <- Gen.choose(0, 80)
    es <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
  } yield (n.toLong, es)

  // default hybrid: these graphs are under the threshold, so this
  // fuzzes the driver union-find finish
  property("random graphs match union-find") =
    Prop.forAllNoShrink(ccEdgeGen) { case (n, es) => check(n, es, 500000L) }

  // localFinishEdges = 0 forces every star round to run distributed —
  // the path a 100 TB graph takes before contraction crosses the
  // threshold
  property("random graphs match union-find (pure star rounds)") =
    Prop.forAllNoShrink(ccEdgeGen) { case (n, es) => check(n, es, 0L) }

  // the MID-LOOP switch: a dense graph whose edge count starts above the
  // threshold but contracts below it after one star round (K25 plus a
  // chain tail: 300 + 29 edges → ~n-1 stars), so localFinish receives a
  // PARTIALLY contracted edge set — the exact path a big graph takes
  property("dense graph crosses the local-finish threshold mid-loop") = {
    val k25 = for (a <- 0L until 25L; b <- 0L until 25L if a < b) yield (a, b)
    val tail = (25L until 54L).map(i => (i - 1, i))
    check(54L, k25 ++ tail, 100L)
  }

  /** Driver-side replay of [[Graph.pageRank]]'s exact integer
    * recurrence: r' = base + 85·Σ(r(v) div deg(v)) div 100 over the
    * symmetrized deduped edge set. Long `/` on nonnegative values is
    * the same floor division Spark's `div` performs.
    */
  private def pageRankRef(n: Long, edges: Seq[(Long, Long)],
      iters: Int, scale: Long): Map[Long, Long] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val sym = und ++ und.map(e => (e._2, e._1))
    val deg = sym.groupBy(_._1).map { case (k, v) => k -> v.size.toLong }
    val base = scale * 15L / 100L
    var r = (0L until n).map(i => i -> scale).toMap
    for (_ <- 1 to iters) {
      val contrib = sym.groupBy(_._2).map { case (dst, es) =>
        dst -> es.map { case (src, _) => r(src) / deg(src) }.sum
      }
      r = r.map { case (id, _) =>
        id -> (base + 85L * contrib.getOrElse(id, 0L) / 100L)
      }
    }
    r
  }

  property("pageRank matches the driver-side integer recurrence") = {
    import spark.implicits._
    val edgeGen = for {
      n <- Gen.choose(2, 40)
      m <- Gen.choose(0, 60)
      es <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
      iters <- Gen.choose(1, 4)
    } yield (n.toLong, es, iters)
    Prop.forAllNoShrink(edgeGen) { case (n, es, iters) =>
      val vertices = (0L until n).toDF("id")
      val e = es.toDF("a", "b")
      val got = Graph.pageRank(vertices, "id", e, "a", "b",
        iterations = iters).as[(Long, Long)].collect().toMap
      val want = pageRankRef(n, es, iters, 1L << 20)
      Prop(got == want) :| s"iters=$iters got ${got.toSeq.sorted.take(10)} want ${want.toSeq.sorted.take(10)}"
    }
  }

  property("pageRank: symmetric nodes tie, hubs outrank leaves") = {
    import spark.implicits._
    // triangle 0-1-2 plus hub 10 with leaves 11..15, plus isolated 20
    val es = Seq((0L, 1L), (1L, 2L), (2L, 0L)) ++
      (11L to 15L).map(i => (10L, i))
    val vertices = (Seq(0L, 1L, 2L, 10L, 20L) ++ (11L to 15L)).toDF("id")
    val r = Graph.pageRank(vertices, "id", es.toDF("a", "b"), "a", "b")
      .as[(Long, Long)].collect().toMap
    val base = (1L << 20) * 15L / 100L
    Prop(r(0L) == r(1L) && r(1L) == r(2L)) :| "triangle symmetry" &&
      Prop(r(10L) > r(11L)) :| "hub beats leaf" &&
      Prop((11L to 15L).map(r).distinct.size == 1) :| "leaves tie" &&
      Prop(r(20L) == base) :| s"isolated node holds dangling base rank ${r(20L)} vs $base"
  }

  // the adversarial star-contraction shapes force the distributed path
  // (localFinishEdges = 0) — they exist to exercise the star rounds
  property("long chain collapses to one component") = {
    val n = 200L
    val chain = (0L until n - 1).map(i => (i, i + 1))
    check(n, chain, 0L)
  }

  property("hub star plus chain tail") = {
    val hub = (1L until 150L).map(i => (0L, i))
    val tail = (150L until 180L).map(i => (i - 1, i))
    check(180L, hub ++ tail, 0L)
  }

  property("self-loops, duplicates, reversed edges ignored") = {
    val es = Seq((5L, 5L), (1L, 2L), (2L, 1L), (1L, 2L), (3L, 4L))
    check(6L, es, 0L) && check(6L, es, 500000L)
  }

  /** Driver-side BFS model: min hop distance from seeds, ≤ maxHops. */
  private def bfsRef(edges: Seq[(Long, Long)], seeds: Seq[Long],
      maxHops: Int): Map[Long, Long] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).distinct
    val adj = (und ++ und.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var dist = seeds.distinct.map(_ -> 0L).toMap
    var frontier = seeds.distinct
    for (k <- 1 to maxHops) {
      val next = frontier.flatMap(adj.getOrElse(_, Nil))
        .distinct.filterNot(dist.contains)
      dist = dist ++ next.map(_ -> k.toLong)
      frontier = next
    }
    dist
  }

  property("bfsHops matches driver-side BFS on random graphs") = {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(2, 50)
      m <- Gen.choose(0, 70)
      es <- Gen.listOfN(m, Gen.zip(Gen.choose(0L, n - 1L), Gen.choose(0L, n - 1L)))
      nSeeds <- Gen.choose(1, 3)
      seeds <- Gen.listOfN(nSeeds, Gen.choose(0L, n - 1L))
      hops <- Gen.choose(1, 4)
    } yield (es, seeds, hops)
    Prop.forAllNoShrink(gen) { case (es, seeds, hops) =>
      val got = Graph.bfsHops(es.toDF("a", "b"), "a", "b",
        seeds.toDF("s"), "s", hops)
        .as[(Long, Long)].collect().toMap
      val want = bfsRef(es, seeds, hops)
      Prop(got == want) :| s"got ${got.toSeq.sorted} want ${want.toSeq.sorted}"
    }
  }

  property("bfsHops chain: exact distances, bound respected") = {
    import spark.implicits._
    val chain = (0L until 9L).map(i => (i, i + 1))
    val d = Graph.bfsHops(chain.toDF("a", "b"), "a", "b",
      Seq(0L).toDF("s"), "s", maxHops = 3)
      .as[(Long, Long)].collect().toMap
    Prop(d == Map(0L -> 0L, 1L -> 1L, 2L -> 2L, 3L -> 3L)) :|
      s"chain distances $d"
  }

  /** Driver-side brute-force triangle reference: all id-ordered vertex
    * triples with all three edges present.
    */
  private def triRef(edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val und = edges.filter(e => e._1 != e._2)
      .map(e => (math.min(e._1, e._2), math.max(e._1, e._2))).toSet
    val verts = und.flatMap(e => Seq(e._1, e._2)).toSeq.sorted
    val tris = for {
      a <- verts; b <- verts if a < b && und((a, b))
      c <- verts if b < c && und((b, c)) && und((a, c))
    } yield (a, b, c)
    tris.flatMap(t => Seq(t._1, t._2, t._3))
      .groupBy(identity).map { case (k, v) => k -> v.size.toLong }
  }

  property("triangleCounts matches brute force on random graphs") = {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(4, 24)
      m <- Gen.choose(0, n * 3)
      es <- Gen.listOfN(m, for {
        a <- Gen.choose(0L, n.toLong - 1)
        b <- Gen.choose(0L, n.toLong - 1)
      } yield (a, b))
    } yield es
    Prop.forAll(gen) { es =>
      val got =
        if (es.isEmpty) Map.empty[Long, Long]
        else Graph.triangleCounts(es.toDF("a", "b"), "a", "b")
          .as[(Long, Long)].collect().toMap
      val want = triRef(es)
      Prop(got == want) :| s"got ${got.toSeq.sorted} want ${want.toSeq.sorted}"
    }
  }

  property("triangleCounts shapes: K4, square, square+diagonal") = {
    import spark.implicits._
    def counts(es: Seq[(Long, Long)]): Map[Long, Long] =
      Graph.triangleCounts(es.toDF("a", "b"), "a", "b")
        .as[(Long, Long)].collect().toMap
    // K4: every vertex in C(3,2)=3 triangles
    val k4 = for (a <- 0L to 3L; b <- 0L to 3L if a < b) yield (a, b)
    // 4-cycle: no triangles at all
    val square = Seq((0L, 1L), (1L, 2L), (2L, 3L), (3L, 0L))
    // square + one diagonal: two triangles sharing the diagonal
    val diag = square :+ (0L, 2L)
    Prop(counts(k4) == Map(0L -> 3L, 1L -> 3L, 2L -> 3L, 3L -> 3L)) :| "K4" &&
      Prop(counts(square) == Map.empty[Long, Long]) :| "square" &&
      Prop(counts(diag) == Map(0L -> 2L, 2L -> 2L, 1L -> 1L, 3L -> 1L)) :| "square+diag"
  }

  property("exhausting maxIter without convergence fails loudly") = {
    import spark.implicits._
    val chain = (0L until 199L).map(i => (i, i + 1)).toDF("a", "b")
    // localFinishEdges = 0 forces the pure star-round path — the default
    // hybrid would finish this driver-sized chain locally and never
    // exercise the maxIter contract under test
    val threw =
      try {
        Graph.connectedComponents(chain, "a", "b", maxIter = 1,
          localFinishEdges = 0L).count(); false
      } catch { case _: IllegalStateException => true }
    // and the opt-out returns best-effort partial clusters without throwing
    val partial = Graph.connectedComponents(chain, "a", "b", maxIter = 1,
      requireConvergence = false, localFinishEdges = 0L)
    Prop(threw) :| "maxIter=1 on a 200-chain must throw" &&
      Prop(partial.count() > 0L) :| "opt-out must return partial clusters"
  }
}
