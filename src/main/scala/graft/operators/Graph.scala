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
    */
  def connectedComponents(
      edges: DataFrame,
      srcCol: String,
      dstCol: String,
      maxIter: Int = 50,
      requireConvergence: Boolean = true): DataFrame = {
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
    var last = signature(e)
    while (!converged && iter < maxIter) {
      val next = smallStar(largeStar(e)).localCheckpoint(eager = false)
      val sig = signature(next)
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
      requireConvergence: Boolean = true): DataFrame = {
    val comps = connectedComponents(edges, srcCol, dstCol, maxIter, requireConvergence)
    vertices.select(col(idCol).cast("long").as("id")).distinct()
      .join(comps, Seq("id"), "left")
      .select(col("id"), coalesce(col("component"), col("id")).as("component"))
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
    sym.join(m, "u")
      .where($"v" > $"u")
      .select($"m".as("lo"), $"v".as("hi"))
      .where($"lo" =!= $"hi")
      .distinct()
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
