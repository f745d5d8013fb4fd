package graft.operators

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Distributed connected components — the clustering stage that turns
  * pairwise duplicate evidence ([[Dedup.minHashPairs]], simhash pairs,
  * shared blocking keys) into dedup groups: every document gets the
  * minimum doc-id of its transitive duplicate cluster as a canonical
  * representative.
  *
  * Algorithm: alternating large-star / small-star (Kiveris et al.,
  * "Connected Components in MapReduce and Beyond", SoCC'14) — converges
  * in O(log n) rounds on any graph, vs O(diameter) for naive label
  * propagation (a 100 TB web-crawl dup graph has long chains).
  *
  * Scale posture: each round is TWO hash aggregations and TWO joins on
  * the edge list — neighborhoods are never materialized as arrays
  * (no `collect_list`), so the component minimum accumulating millions
  * of neighbors costs shuffle volume, not a single aggregation buffer.
  * Per-round lineage is cut with `localCheckpoint` (iterative plans
  * otherwise grow exponentially). Driver traffic per round is one
  * (count, checksum) pair for the convergence test.
  *
  * (No graph surface exists in the reference engine — north-star
  * operator for the dedup pipeline, built Spark-first.)
  */
object Graph {

  /** Connected components of the undirected graph given by `edges`.
    * Edge direction and duplicate edges are ignored; self-loops are
    * dropped. Returns ("id", "component") for every node incident to at
    * least one edge, where component = min node id of the cluster.
    * Nodes absent from `edges` are absent from the output (union the
    * vertex set in yourself — the caller knows it; we don't).
    *
    * Node ids must be non-null longs (or castable to long).
    *
    * Throws `IllegalStateException` if the star rounds exhaust `maxIter`
    * without the edge-set signature converging — a silent return there
    * would hand the caller PARTIALLY merged clusters indistinguishable
    * from real ones. Pass `requireConvergence = false` to get the
    * best-effort components anyway (each reported cluster is a subset of
    * a true component — star rounds only ever merge, never split).
    *
    * Hybrid finish: once the (contracted) edge set is at most
    * `localFinishEdges` rows — known for free from the per-round
    * convergence signature's count — the remaining O(log n) star rounds
    * (each a multi-stage distributed job whose fixed cost dwarfs the
    * data at that size) are replaced by ONE bounded collect + driver
    * union-find. Driver traffic ≤ localFinishEdges × 16 bytes (two
    * longs): 8 MB at the 500k default — model-sized, independent of the
    * input scale, because on a 100 TB dup graph the star rounds keep
    * contracting until the edge count crosses the threshold. Pass
    * `localFinishEdges = 0` to force the pure distributed path.
    */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 50,
      requireConvergence: Boolean = true,
      localFinishEdges: Long = 500000L): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._

    // Canonical undirected edge list (lo < hi), deduped.
    var e = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .where(col("u").isNotNull && col("v").isNotNull && col("u") =!= col("v"))
      .select(least($"u", $"v").as("lo"), greatest($"u", $"v").as("hi"))
      .distinct()
      // lazy checkpoint: the signature aggregation right after is the
      // materializing action — one job per round, not two
      .localCheckpoint(eager = false)

    var converged = false
    var iter = 0
    val t0 = System.nanoTime()
    var last = signature(e)
    if (sys.env.contains("GRAFT_CC_TRACE"))
      System.err.println(f"[cc] init sig ${(System.nanoTime() - t0) / 1e9}%.2fs")
    if (last._1 <= localFinishEdges) return localFinish(e)
    while (!converged && iter < maxIter) {
      val tr = System.nanoTime()
      val next = smallStar(largeStar(e)).localCheckpoint(eager = false)
      val sig = signature(next)
      if (sys.env.contains("GRAFT_CC_TRACE"))
        System.err.println(f"[cc] round ${iter + 1} ${(System.nanoTime() - tr) / 1e9}%.2fs edges=${sig._1}")
      if (sig._1 <= localFinishEdges) return localFinish(next)
      converged = sig == last
      last = sig
      e = next
      iter += 1
    }
    if (!converged && requireConvergence)
      throw new IllegalStateException(
        s"connectedComponents did not converge within maxIter=$maxIter star " +
          "rounds (rounds are O(log n) — a legitimate graph hitting this is " +
          "enormous or maxIter tiny); pass requireConvergence=false for " +
          "best-effort partial clusters")
    if (!converged)
      System.err.println(s"[graft] WARN connectedComponents unconverged at " +
        s"maxIter=$maxIter — returning partial (under-merged) clusters")

    // Post-convergence the edges form stars rooted at component minima;
    // one min-agg per node closes any final one-hop indirection.
    val sym = e.select($"lo".as("id"), $"hi".as("nb"))
      .union(e.select($"hi".as("id"), $"lo".as("nb")))
    sym.groupBy("id")
      .agg(min($"nb").as("mn"))
      .select($"id", least($"id", $"mn").as("component"))
  }

  /** Driver-side completion of [[connectedComponents]] on a
    * threshold-bounded contracted edge set: path-compressed union-find
    * with min-rooted unions, so every find returns the cluster minimum —
    * the same component id the star rounds converge to. The collect is
    * bounded by the caller's `localFinishEdges` gate (≤ 8 MB at the
    * default), never by input scale.
    */
  private def localFinish(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val arr = e.select($"lo", $"hi").as[(Long, Long)].collect() // ≤ localFinishEdges rows (caller-gated)
    val parent = scala.collection.mutable.LongMap.empty[Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) { val p = parent(c); parent(c) = r; c = p }
      r
    }
    arr.foreach { case (a, b) =>
      val (ra, rb) = (find(a), find(b))
      if (ra != rb) parent(math.max(ra, rb)) = math.min(ra, rb) // min-rooted
    }
    val nodes = scala.collection.mutable.LongMap.empty[Unit]
    arr.foreach { case (a, b) => nodes(a) = (); nodes(b) = () }
    val out = nodes.keysIterator.map(i => (i, find(i))).toSeq
    spark.createDataset(out).toDF("id", "component")
  }

  /** Component assignment for a full vertex set: like
    * [[connectedComponents]] but every id in `vertices` appears in the
    * output — isolated nodes map to themselves.
    */
  def componentsFor(
      vertices: DataFrame,
      idCol: String,
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 50,
      requireConvergence: Boolean = true,
      localFinishEdges: Long = 500000L): DataFrame = {
    val comps = connectedComponents(edges, srcCol, dstCol, maxIter,
      requireConvergence, localFinishEdges)
    vertices.select(col(idCol).cast("long").as("id")).distinct()
      .join(comps, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
  }

  /** Fixed-iteration damped PageRank in exact integer fixed point
    * (rank units of `scale` = 2^20), over the UNDIRECTED graph given by
    * `edges` (symmetrized, deduplicated, self-loops dropped) — the
    * crawl-centrality score a corpus-curation pipeline ranks documents
    * by (Page et al., "The PageRank Citation Ranking", 1999).
    *
    * Exact-arithmetic form (floating-point-free, so any ANSI SQL engine
    * reproduces it bit-for-bit):
    *
    *   r_0(u)     = scale
    *   r_{k+1}(u) = (15*scale) div 100
    *              + (85 * Σ_{v∈N(u)} (r_k(v) div deg(v))) div 100
    *
    * Every term is a nonnegative long and every division floors, so
    * Spark's `div` and DuckDB's `//` agree. Ranks are unnormalized
    * (they sum to ≈ N·scale, not 1) — ordering and ratios are what a
    * ranking consumer uses. Vertices in `vertices` but incident to no
    * edge hold the dangling base rank (15*scale) div 100 after the
    * first iteration.
    *
    * Scale posture: each iteration is one edge-sized equi-join
    * (ranks ⋈ adjacency on src), one hash agg keyed by dst (map-side
    * partial sums), and one left join back to the vertex set — the
    * shuffle carries a (dst, contrib) long pair per edge, never
    * adjacency arrays, so a billion-edge iteration is three ordinary
    * shuffles. `iterations` is fixed (no driver-side convergence
    * actions): building the query composes a static plan, keeping
    * plan audits plan-only.
    */
  def pageRank(
      vertices: DataFrame,
      idCol: String,
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      iterations: Int = 3,
      scale: Long = 1L << 20): DataFrame = {
    require(iterations >= 1, s"iterations must be >= 1, got $iterations")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .where($"u".isNotNull && $"v".isNotNull && $"u" =!= $"v")
      .select(least($"u", $"v").as("lo"), greatest($"u", $"v").as("hi"))
      .distinct()
    val sym = e.select($"lo".as("src"), $"hi".as("dst"))
      .union(e.select($"hi".as("src"), $"lo".as("dst")))
    val deg = sym.groupBy($"src").agg(count(lit(1)).as("deg"))
    // Lazy checkpoint (same discipline as the CC rounds): the adjacency
    // feeds every iteration — without the cut, iteration k's plan
    // re-derives sym+deg k times (46 exchanges in the 3-iteration q113
    // plan before this). Lazy = no job at build time, plan audits stay
    // plan-only; materialized once at the first action.
    val adj = sym.join(deg, "src").localCheckpoint(eager = false) // (src, dst, deg)
    // same cut for the vertex set: it seeds r0 AND anchors every
    // iteration's left join — without it each iteration re-scans the
    // vertex source and re-runs the distinct exchange
    val nodes = vertices.select(col(idCol).cast("long").as("id")).distinct()
      .localCheckpoint(eager = false)
    val base = scale * 15L / 100L
    var r = nodes.select($"id", lit(scale).as("rank"))
    for (k <- 1 to iterations) {
      val sums = adj.join(r, adj("src") === r("id"))
        .selectExpr("dst AS id", "rank div deg AS c")
        .groupBy("id").agg(sum($"c").as("s"))
      r = nodes.join(sums, Seq("id"), "left")
        .selectExpr("id",
          s"CAST($base AS BIGINT) + (85 * coalesce(s, CAST(0 AS BIGINT))) div 100 AS rank")
      // cut per-iteration lineage (ranks are 2 longs per vertex — far
      // smaller than the edge lists the CC rounds already cache)
      if (k < iterations) r = r.localCheckpoint(eager = false)
    }
    r
  }

  /** Large-star: every node connects its LARGER neighbors to the minimum
    * of its closed neighborhood. Computed as a min-agg joined back to
    * the symmetric edge list — no neighborhood arrays.
    */
  private def largeStar(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    val sym = e.select($"lo".as("u"), $"hi".as("v"))
      .union(e.select($"hi".as("u"), $"lo".as("v")))
    val m = sym.groupBy($"u").agg(min($"v").as("minN"))
      .select($"u", least($"u", $"minN").as("m"))
    // No distinct here: keeping v > u leaves exactly one row per input
    // edge (≤|e| rows, no growth), and duplicate (lo,hi) pairs are
    // min-agg-invariant in smallStar, whose round-ending distinct bounds
    // the edge set — dropping it saves one full shuffle per CC round.
    sym.join(m, "u")
      .where($"v" > $"u")
      .select($"m".as("lo"), $"v".as("hi"))
      .where($"lo" =!= $"hi")
  }

  /** Small-star: orient edges large→small; every node connects its
    * smaller neighbors (and itself) to the minimum among them.
    */
  private def smallStar(e: DataFrame): DataFrame = {
    val spark = e.sparkSession
    import spark.implicits._
    // e is already (lo, hi): hi is the large endpoint, lo the small.
    val m = e.groupBy($"hi").agg(min($"lo").as("m"))
    e.join(m, "hi")
      .select($"m".as("lo"), $"lo".as("hi")) // smaller neighbors → min
      .union(m.select($"m".as("lo"), $"hi")) // the center itself → min
      .where($"lo" =!= $"hi")
      .distinct()
  }

  /** Bounded multi-hop BFS: minimum hop distance from a seed set over
    * the UNDIRECTED graph, up to `maxHops`. Level-synchronous frontier
    * expansion — iteration k joins the hop-(k−1) frontier to the
    * checkpointed adjacency (one shuffle carrying (dst, hop) pairs,
    * never neighborhood arrays) and folds it into the distance table
    * with a min-aggregation, so visited vertices are never re-expanded
    * and each round's work is frontier-sized. Same lazy-localCheckpoint
    * discipline as [[pageRank]]/CC: adjacency cut once, per-round
    * distance lineage cut, static plan (fixed `maxHops`, no driver
    * convergence actions).
    *
    * Returns (id, hops) for every vertex within `maxHops` of a seed —
    * seeds themselves at hops = 0. O(diameter) rounds; the 100 TB
    * posture is the CC argument: shuffles carry two longs per frontier
    * edge.
    */
  def bfsHops(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      seeds: DataFrame,
      seedCol: String,
      maxHops: Int = 3): DataFrame = {
    require(maxHops >= 1, s"maxHops must be >= 1, got $maxHops")
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .where($"u".isNotNull && $"v".isNotNull && $"u" =!= $"v")
      .select(least($"u", $"v").as("lo"), greatest($"u", $"v").as("hi"))
      .distinct()
    val adj = e.select($"lo".as("src"), $"hi".as("dst"))
      .union(e.select($"hi".as("src"), $"lo".as("dst")))
      .localCheckpoint(eager = false)
    var dist = seeds.select(col(seedCol).cast("long").as("id")).distinct()
      .withColumn("hops", lit(0L))
      .localCheckpoint(eager = false)
    for (k <- 1 to maxHops) {
      val frontier = dist.where($"hops" === (k - 1))
      val next = adj.join(frontier, adj("src") === frontier("id"))
        .select($"dst".as("id"), lit(k.toLong).as("hops"))
      dist = dist.unionByName(next)
        .groupBy("id").agg(min($"hops").as("hops"))
      if (k < maxHops) dist = dist.localCheckpoint(eager = false)
    }
    dist
  }

  /** Exact per-vertex triangle counts over the undirected graph —
    * degree-oriented wedge counting (Suri & Vassilvitskii's fix for the
    * "curse of the last reducer"). Each undirected edge is oriented
    * from its (degree, id)-smaller endpoint to the larger, so every
    * triangle {a,b,c} (ordered by that total order) is discovered
    * exactly once: as the wedge (b,c) rooted at a, closed by probing
    * the undirected edge set for {b,c}. After orientation the maximum
    * out-degree is O(√m), so the wedge stage — the only super-linear
    * step — is bounded by m^1.5 TOTAL and no single hub vertex owns a
    * quadratic neighborhood (the naive a<b<c id orientation would give
    * a low-id hub all its wedges regardless of degree).
    *
    * Three shuffles: degree agg, the wedge self-join on the shared
    * source, and the closing-edge probe (an equi-join on the canonical
    * (lo, hi) pair — never a cross join). Shuffles carry 2–3 longs per
    * row. Returns (id, n_tri) for every vertex in at least one
    * triangle.
    */
  def triangleCounts(
      edges: DataFrame,
      srcCol: String,
      dstCol: String): DataFrame = {
    val spark = edges.sparkSession
    import spark.implicits._
    val e = edges
      .select(col(srcCol).cast("long").as("u"), col(dstCol).cast("long").as("v"))
      .where($"u".isNotNull && $"v".isNotNull && $"u" =!= $"v")
      .select(least($"u", $"v").as("lo"), greatest($"u", $"v").as("hi"))
      .distinct()
      .localCheckpoint(eager = false) // reused: degrees, orientation, probe
    val deg = e.select($"lo".as("id")).union(e.select($"hi".as("id")))
      .groupBy("id").agg(count(lit(1)).as("deg"))
    val withDeg = e
      .join(deg.select($"id".as("lo"), $"deg".as("dlo")), "lo")
      .join(deg.select($"id".as("hi"), $"deg".as("dhi")), "hi")
    val dir = withDeg.select(
      when($"dlo" < $"dhi" || ($"dlo" === $"dhi" && $"lo" < $"hi"), $"lo")
        .otherwise($"hi").as("s"),
      when($"dlo" < $"dhi" || ($"dlo" === $"dhi" && $"lo" < $"hi"), $"hi")
        .otherwise($"lo").as("d"))
    val wedges = dir.select($"s", $"d".as("b"))
      .join(dir.select($"s", $"d".as("c")), "s")
      .where($"b" < $"c") // canonical id order so each wedge appears once
      .select($"s".as("a"), $"b", $"c")
    val tris = wedges.join(e, wedges("b") === e("lo") && wedges("c") === e("hi"))
      .select($"a", $"b", $"c")
    tris.select(explode(array($"a", $"b", $"c")).as("id"))
      .groupBy("id").agg(count(lit(1)).as("n_tri"))
  }

  /** Cheap convergence fingerprint: (edge count, order-independent
    * checksum). Collision odds over ≤50 iterations are negligible; a
    * false "converged" would need two DIFFERENT consecutive edge sets
    * with equal count and equal xxhash64 sum.
    */
  private def signature(e: DataFrame): (Long, String) = {
    // Sum in decimal(38,0): full-range longs would overflow a long sum
    // (ANSI mode throws).
    val row = e.agg(
      count(lit(1)).as("n"),
      coalesce(sum(xxhash64(col("lo"), col("hi")).cast("decimal(38,0)")),
        lit(0).cast("decimal(38,0)")).as("h")
    ).head()
    (row.getLong(0), row.getDecimal(1).toString)
  }
}
