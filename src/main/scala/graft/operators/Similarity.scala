package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbor search over an embedding column
  * (`array<float>`). Two paths:
  *
  *   - [[bruteForceTopK]]: exact cosine top-k via a broadcast
  *     nested-loop join — the correctness baseline. Right for a small
  *     query set against an arbitrarily large corpus (the corpus side
  *     streams, queries broadcast; no shuffle of the corpus).
  *   - [[ivfTopK]]: the scale path — IVF-style partitioning. Corpus
  *     vectors are assigned to their nearest centroid once (one pass);
  *     queries probe only the `nprobe` nearest centroid cells, so the
  *     scanned fraction is ~nprobe/nlist of the corpus.
  *
  * Dot products / norms are `aggregate`/`zip_with` higher-order
  * expressions — codegen'd, no UDFs. (No similarity surface exists in the
  * reference; north-star pipeline operator, built Spark-first.)
  */
object Similarity {

  /** Sequential-fold dot product (deterministic order, matches the SQL
    * oracle's loop order bit-for-bit). Native codegen'd expression
    * ([[graft.functions.DotProduct]]) — the interpreted
    * `aggregate(zip_with(...))` walk was the ANN bottleneck.
    */
  def dot(a: Column, b: Column): Column =
    graft.functions.exprs.dotProduct(a, b)

  def norm(v: Column): Column = sqrt(dot(v, v))

  /** Cosine similarity, NULL where undefined: a zero-norm vector makes
    * the denominator 0, and under the session's ANSI mode a plain
    * division would kill the whole job with DIVIDE_BY_ZERO deep in
    * codegen the moment ONE padding/broken embedding appears.
    * try_divide returns null instead, and every consumer treats a null
    * similarity as "not a neighbor / not a pair".
    *
    * PER-PAIR USE WARNING: in a pair projection this recomputes BOTH
    * norms for every pair (three dot products where one suffices). The
    * operators in this file instead carry a per-row `norm(vec)` column
    * on each side and divide by their product — same arithmetic
    * bit-for-bit, one dot per pair (round-11 measured ~2x on the
    * brute-force pair queries). Prefer that shape anywhere the
    * expression runs per candidate pair.
    */
  def cosine(a: Column, b: Column): Column =
    try_divide(dot(a, b), norm(a) * norm(b))

  /** Exact top-k cosine neighbors for each query vector.
    *
    * @param queries (queryIdCol, vecCol) — assumed small enough to
    *                broadcast (the usual ANN-serving shape)
    * @param corpus  (idCol, vecCol) — arbitrarily large; streamed
    */
  def bruteForceTopK(
      queries: DataFrame,
      corpus: DataFrame,
      queryIdCol: String,
      corpusIdCol: String,
      vecCol: String,
      k: Int): DataFrame = {
    // usableVec on BOTH inputs (not a per-pair cos guard downstream):
    // a pushed-down filter on cos inlines the whole cosine into the
    // join condition — measured 2x on the family — while the per-ROW
    // prefilter is O(corpus + queries) and makes cos non-null/non-NaN
    // by construction (rankTopK's documented precondition)
    // norms per ROW (each side carries its own), not per pair: an inline
    // cosine() in the pair projection recomputes BOTH norms for every
    // (query, corpus) pair — two extra dim-length dot products on the
    // corpus-sized pair stream. Same arithmetic bit-for-bit.
    val q = broadcast(queries.where(usableVec(col(vecCol))).select(
      col(queryIdCol).as("query_id"), col(vecCol).as("__qv"),
      norm(col(vecCol)).as("__qn")))
    val c = corpus.where(usableVec(col(vecCol)))
      .select(col(corpusIdCol).as("neighbor_id"), col(vecCol).as("__cv"),
        norm(col(vecCol)).as("__cn"))
    val scored = c.crossJoin(q) // broadcast nested-loop join
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        try_divide(dot(col("__qv"), col("__cv")),
          col("__qn") * col("__cn")).as("cos"))
    rankTopK(scored, k)
  }

  /** Hard-negative mining — the contrastive-training pair generator:
    * for each anchor, the k most cosine-similar corpus vectors with a
    * DIFFERENT label (the negatives most likely to confuse the model,
    * which is exactly what makes them worth training on). Same shape
    * as [[bruteForceTopK]]: anchors broadcast, corpus streams, the
    * label-mismatch predicate rides the broadcast join, selection
    * through the bounded-heap TopKPerGroup — the corpus-sized score
    * stream is never fully shuffled. For anchor sets too large to
    * broadcast, the IVF path composes the same way (probe cells, then
    * filter labels in-cell) at the documented recall trade.
    */
  def hardNegatives(
      anchors: DataFrame,
      corpus: DataFrame,
      idCol: String,
      vecCol: String,
      labelCol: String,
      k: Int): DataFrame = {
    // per-row usableVec prefilter + per-row norms, same rationale as
    // bruteForceTopK
    val q = broadcast(anchors.where(usableVec(col(vecCol)))
      .select(col(idCol).as("query_id"),
        col(vecCol).as("__qv"), col(labelCol).as("__ql"),
        norm(col(vecCol)).as("__qn")))
    val c = corpus.where(usableVec(col(vecCol)))
      .select(col(idCol).as("neighbor_id"),
        col(vecCol).as("__cv"), col(labelCol).as("__cl"),
        norm(col(vecCol)).as("__cn"))
    val scored = c.crossJoin(q)
      .where(col("neighbor_id") =!= col("query_id") &&
        col("__cl") =!= col("__ql"))
      .select(col("query_id"), col("neighbor_id"),
        try_divide(dot(col("__qv"), col("__cv")),
          col("__qn") * col("__cn")).as("cos"))
    rankTopK(scored, k)
  }

  /** A vector the index can actually use: non-null, non-zero norm (a
    * zero vector has no direction — cosine against it is undefined),
    * NaN-free (NaN poisons every dot product it touches, and Spark
    * orders NaN as the largest double), and FINITE-normed: a squared
    * norm that overflows to +Infinity passes both the isnan and the > 0
    * tests, and Inf/Inf through try_divide yields NaN downstream — which
    * rankTopK would rank as every query's NEAREST neighbor. Unreachable
    * for float32-ranged embeddings (max dot ~1e77) but live for the
    * double-array inputs the dot kernel equally supports, so the guard
    * stays per-row here and the per-pair path stays filter-free.
    * isnan(dot(v,v)) catches a NaN in ANY element because NaN propagates
    * through the sum.
    */
  private[operators] def usableVec(v: Column): Column =
    v.isNotNull && !isnan(dot(v, v)) && dot(v, v) > 0 &&
      dot(v, v) < lit(Double.MaxValue)

  /** Per-query top-k + rank. Selection runs through the custom
    * TopKPerGroup operator (bounded map-side heaps: the corpus-sized
    * score stream never gets fully shuffled or sorted); the final
    * row_number window only orders the surviving queries x k rows.
    *
    * PRECONDITION: every caller prefilters BOTH vector inputs with
    * [[usableVec]], which makes `cos` non-null and non-NaN by
    * construction (finite non-null elements, positive norms — so
    * try_divide never nulls and the dot can't NaN). The guard must NOT
    * be a per-pair filter on `cos` here: Catalyst pushes it through
    * the select into the join condition, inlining the full cosine
    * (three dot products) TWICE more per candidate pair — measured 2x
    * on q28/q30 in round 10. A NaN slipping through WOULD be ranked as
    * everyone's nearest (Spark orders NaN largest), which is why the
    * precondition is a contract, not advice.
    */
  private def rankTopK(scored: DataFrame, k: Int): DataFrame = {
    val top = graft.plans.TopK.perGroup(
      scored,
      Seq("query_id"), Seq("cos" -> false, "neighbor_id" -> true), k)
    val w = Window.partitionBy("query_id")
      .orderBy(col("cos").desc, col("neighbor_id").asc)
    top.withColumn("rank", row_number().over(w).cast("long"))
      .select("query_id", "rank", "neighbor_id")
  }

  /** Per-row (sim, cell) struct array against a driver-side centroid list
    * (nlist × dim doubles — model metadata, not data). Every element is a
    * codegen'd [[graft.functions.DotProduct]] against a literal vector, so
    * cell scoring is map-only: the corpus is never shuffled or replicated
    * nlist times (the old crossJoin + row_number argmax shuffled nlist
    * copies of the corpus per pass — once per Lloyd iteration).
    */
  private def cellSims(vec: Column, cents: Seq[(Long, Seq[Double])]): Column =
    array(cents.map { case (id, ctr) =>
      // Rank by dot/‖ctr‖, not full cosine: ‖vec‖ is a constant positive
      // factor across cells (cannot change the ordering) and ‖ctr‖
      // constant-folds to a literal, so each cell costs ONE dim-length
      // dot product per row instead of three.
      struct((-(dot(vec, typedLit(ctr)) / norm(typedLit(ctr)))).as("neg_sim"),
        lit(id).as("cell_id"))
    }: _*)

  /** argmax cell per row (ties → lowest cell_id), zero shuffle. */
  private def bestCell(vec: Column, cents: Seq[(Long, Seq[Double])]): Column =
    array_min(cellSims(vec, cents)).getField("cell_id")

  /** The nprobe best cells per row (sim desc, ties cell_id asc), zero
    * shuffle: sort_array on (neg_sim, cell_id) structs + slice.
    */
  private def probeCells(vec: Column, cents: Seq[(Long, Seq[Double])], nprobe: Int): Column =
    slice(sort_array(cellSims(vec, cents)), 1, nprobe).getField("cell_id")

  /** Query-side IVF probe assignment: one row per (query, probed cell),
    * nprobe best cells by centroid similarity (ties cell_id asc) — the
    * index-inspection surface behind [[ivfTopK]], and what RecallProbe
    * uses to measure the scanned-candidate fraction of an operating
    * point. Map-only explode, zero shuffle.
    */
  def probeAssignments(queries: DataFrame, queryIdCol: String, vecCol: String,
      cents: Seq[(Long, Seq[Double])], nprobe: Int): DataFrame =
    // zero centroids (empty/untrainable index) = zero probes; the
    // expression form would be array_min over an EMPTY literal array,
    // which Catalyst rejects as an unrelated-looking VOID extraction
    if (cents.isEmpty)
      queries.select(col(queryIdCol).as("query_id"), col(vecCol).as("__qv"),
        lit(null).cast("long").as("cell_id")).where(lit(false))
    else
      // usableVec: a null/zero/NaN query vector has no meaningful cell
      // ordering (every cellSims entry is null/NaN) and would feed NaN
      // similarities into rankTopK's heap, which requires non-NaN input
      // by contract — unusable queries participate in nothing, like
      // every other similarity entry point
      queries.where(usableVec(col(vecCol)))
        .select(col(queryIdCol).as("query_id"), col(vecCol).as("__qv"))
        .select(col("query_id"), col("__qv"),
          explode(probeCells(col("__qv"), cents, nprobe)).as("cell_id"))

  /** Map-only nearest-centroid assignment for externally supplied
    * centroids (classification / cluster-purity eval): the same
    * argmax-over-literal-centroids shape as the IVF cell assignment —
    * one codegen'd dot product per (row, centroid), zero shuffle, ties
    * to the lowest centroid id.
    */
  def assignNearest(df: DataFrame, vecCol: String,
      cents: Seq[(Long, Seq[Double])], outCol: String = "assigned"): DataFrame = {
    // an argmax over zero centroids has no answer — fail by name, not as
    // Catalyst's VOID-extraction error on array_min(array())
    require(cents.nonEmpty, "assignNearest: empty centroid list — train or " +
      "supply at least one centroid")
    // a zero/NaN centroid divides by zero in cellSims at constant-fold
    // time, surfacing as an internals-pointing DIVIDE_BY_ZERO
    require(cents.forall { case (_, ctr) =>
      ctr != null && ctr.exists(_ != 0.0) && !ctr.exists(_.isNaN) },
      "assignNearest: centroids must be non-null, non-zero, NaN-free")
    // a null/NaN/zero-norm INPUT row makes every cellSims entry
    // identically null/NaN, and the argmax then falls through to the
    // LOWEST centroid id — silently inflating one cluster with every
    // broken row. Drop them like every other similarity entry point
    // (usableVec is the established contract: unusable vectors
    // participate in nothing).
    df.where(usableVec(col(vecCol)))
      .withColumn(outCol,
        bestCell(col(vecCol).cast("array<double>"), cents))
  }

  /** Lloyd iterations refining IVF centroids: assign every vector to its
    * best cell (one map-only pass — [[bestCell]]), recompute element-wise
    * means. The model (nlist × dim centroids) lives on the driver between
    * iterations, so each round costs exactly ONE distributed aggregation
    * + one collect of nlist × dim mean cells — metadata, never data rows
    * — and training scales with the corpus. Empty cells keep their
    * previous centroid.
    */
  /** REQUIRED INPUT SHAPE: `c0` must carry the columns `neighbor_id`
    * (long id) and `__cv` (the vector) — the pre-shaped corpus relation
    * [[ivfTopK]] builds; external callers (RecallProbe) rename their
    * columns to match. Fails by name otherwise.
    */
  def kmeansCentroids(c0: DataFrame, nlist: Int, iters: Int): Seq[(Long, Seq[Double])] = {
    require(c0.columns.contains("neighbor_id") && c0.columns.contains("__cv"),
      s"kmeansCentroids needs columns neighbor_id and __cv (got " +
        s"${c0.columns.mkString(", ")}) — select/rename the id and vector " +
        "columns to the ivfTopK corpus shape first")
    require(nlist >= 1, s"kmeansCentroids nlist must be >= 1, got $nlist")
    val spark = c0.sparkSession
    import spark.implicits._
    // a null/zero/NaN vector can neither seed a centroid (typedLit(null)
    // model entries; a zero seed makes cellSims divide by zero at
    // constant-fold time) nor contribute to a mean — drop before training
    val c = c0.where(usableVec(col("__cv")))
    // deterministic seeds: the nlist lowest-id vectors (a TakeOrdered)
    var cents: Seq[(Long, Seq[Double])] = c.orderBy(col("neighbor_id")).limit(nlist)
      .select(col("neighbor_id"), col("__cv").cast("array<double>"))
      .as[(Long, Seq[Double])].collect().toSeq
    // empty corpus: nothing to seed from and the Lloyd pass's bestCell
    // would be an argmax over zero centroids — return the empty model
    if (cents.isEmpty) return Seq.empty
    for (_ <- 1 to iters) {
      val means = c
        .withColumn("cell_id", bestCell(col("__cv"), cents))
        .select(col("cell_id"), posexplode(col("__cv")).as(Seq("__i", "__x")))
        .groupBy("cell_id", "__i").agg(avg(col("__x")).as("__m"))
        .collect() // <= nlist * dim rows; the iteration's only collect
        .groupBy(_.getLong(0))
        .map { case (cell, rows) =>
          cell -> rows.sortBy(_.getInt(1)).map(_.getDouble(2)).toSeq
        }
      // a cell's mean CAN be the zero vector (opposed members cancel) or
      // NaN-free-but-degenerate; keep the previous centroid then — a
      // zero/NaN centroid would divide-by-zero in cellSims at fold time
      cents = cents.map { case (cell, prev) =>
        (cell, means.get(cell)
          .filter(m => m.exists(_ != 0.0) && !m.exists(_.isNaN))
          .getOrElse(prev))
      }
    }
    cents
  }

  /** IVF-style ANN: deterministic seed centroids refined by `trainIters`
    * k-means rounds, one-pass cell assignment, query probes nprobe
    * cells. Returns (query_id, rank, neighbor_id) like the brute-force
    * baseline.
    */
  def ivfTopK(
      queries: DataFrame,
      corpus: DataFrame,
      queryIdCol: String,
      corpusIdCol: String,
      vecCol: String,
      k: Int,
      nlist: Int = 16,
      nprobe: Int = 4,
      trainIters: Int = 2): DataFrame = {
    // degenerate index params used to take the EMPTY-CORPUS early return
    // silently: nlist = 0 seeds zero centroids and nprobe = 0 probes
    // zero cells, so every query got an empty top-k over a FULL corpus
    // with no error — the siblings (assignNearest, TopK.perGroup,
    // pageRank) all fail fast on parameters like these
    require(nlist >= 1, s"ivfTopK nlist must be >= 1, got $nlist")
    require(nprobe >= 1, s"ivfTopK nprobe must be >= 1, got $nprobe")
    require(k >= 1, s"ivfTopK k must be >= 1, got $k")
    // null/zero/NaN corpus rows can't be indexed, assigned, or returned
    val c = corpus.select(col(corpusIdCol).as("neighbor_id"), col(vecCol).as("__cv"))
      .where(usableVec(col("__cv")))

    val spark = corpus.sparkSession
    import spark.implicits._
    val cents: Seq[(Long, Seq[Double])] =
      if (trainIters > 0) kmeansCentroids(c, nlist, trainIters)
      else c.orderBy(col("neighbor_id")).limit(nlist)
        .select(col("neighbor_id"), col("__cv").cast("array<double>"))
        .as[(Long, Seq[Double])].collect().toSeq

    // An EMPTY corpus has no cells and no neighbors: every query's
    // top-k is empty, which is what the plain join would also produce —
    // return that shape instead of letting bestCell crash on zero cells.
    if (cents.isEmpty)
      return queries.select(col(queryIdCol).as("query_id"),
        lit(1L).as("rank"),
        lit(null).cast(corpus.schema(corpusIdCol).dataType).as("neighbor_id"))
        .where(lit(false))

    // Assign corpus vectors to their best cell — map-only, zero shuffle.
    val assigned = c
      .withColumn("cell_id", bestCell(col("__cv"), cents))
      .select("cell_id", "neighbor_id", "__cv")

    // Each query probes its nprobe closest cells — map-only explode.
    // Norms per ROW on both sides (probe rows = queries x nprobe; the
    // assigned relation already carries one row per corpus vector), so
    // the in-cell pair projection runs ONE dot per pair, not three.
    val probes = probeAssignments(queries, queryIdCol, vecCol, cents, nprobe)
      .withColumn("__qn", norm(col("__qv")))

    val scored = broadcast(probes).join(
        assigned.withColumn("__cn", norm(col("__cv"))), Seq("cell_id"))
      .where(col("neighbor_id") =!= col("query_id"))
      .select(col("query_id"), col("neighbor_id"),
        try_divide(dot(col("__qv"), col("__cv")),
          col("__qn") * col("__cn")).as("cos"))
    rankTopK(scored, k)
  }

  /** Sparse all-pairs cosine similarity over TERM-FREQUENCY vectors —
    * the classic AP-SS / similarity-join shape, third leg of the
    * near-dup family (set-based MinHash q26, bit-based SimHash q27,
    * dense-embedding q28): pairs of documents whose tf vectors point
    * the same way, found WITHOUT an all-pairs comparison.
    *
    * Candidates ride the inverted index: tf postings self-join on the
    * token key, with tokens above `maxDf` document frequency dropped
    * from PAIRING ONLY (the q85/q138 df-cap contract — ubiquitous
    * tokens generate quadratic candidates and carry no signal; recall
    * loss is the documented trade-off, identical in the oracle). The
    * dot product then re-runs over the FULL tf vectors of surviving
    * candidate pairs — the minHashPairs verification-rejoin pattern —
    * so the similarity itself is exact, only candidate recall is
    * capped.
    *
    * All-integer arithmetic end-to-end: tf counts, dot = Σ tf_a·tf_b,
    * n2 = Σ tf², and the cosine threshold is applied SQUARED and
    * cross-multiplied — 1000·dot² ≥ minCos2Permille·n2_a·n2_b — so
    * both engines agree bit-for-bit with no sqrt anywhere. Overflow
    * envelope is PER-DOCUMENT and corpus-size-free: dot² ≤ n2_a·n2_b
    * by Cauchy–Schwarz, so 1000·(max Σtf²)² < 2^63 holds whenever a
    * document's Σtf² stays under ~9.6×10^7 — ~96M tokens if tf is
    * mostly 1, ~9.8k occurrences of a SINGLE repeated token at the
    * degenerate extreme.
    *
    * Returns (id_a, id_b, dot, n2_a, n2_b, cos2_permille), id_a < id_b.
    */
  def sparseCosinePairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDf: Int = 20,
      minCos2Permille: Int = 500): DataFrame = {
    require(maxDf > 1 && minCos2Permille >= 0 && minCos2Permille <= 1000)
    // The tf relation feeds FIVE consumers (norms, the frequent-vocab
    // cap, both candidate sides, both dot-rejoin sides); persist the
    // compact (id, tok, tf) form once rather than re-exploding the
    // corpus per consumer — the minHashPairs signature-cache pattern.
    //
    // Cache layout sized by input volume (r17; guide §5/§2.2): the
    // aggregate lands on the full shuffle-partition count and persist
    // PINS that layout — at sf0.1 that is 32 near-empty cache
    // partitions for a KB-scale relation, and the materialization job
    // plus every first-touch consumer stage pays a task per partition
    // (AQE's coalescing never re-plans the cached layout itself, only
    // stages that read it). Coalesce — no extra shuffle — to
    // ceil(inputBytes / 32 MB) partitions, clamped to the session's
    // shuffle-partition count: unknown or huge size estimates keep the
    // current layout (clamp binds), a large corpus keeps full
    // parallelism, and only the tiny-relation case loses its empty
    // partitions. Size comes from the already-planned input stats (a
    // file scan reports file bytes), not a job. Target: 4 MB of INPUT
    // bytes per cache partition — the tokenize-explode-aggregate work
    // the consumers re-read is ~10x the raw text bytes, so 4 MB of
    // input is ~40 MB of per-task work; measured at 10x sf0.1 (14 MB
    // input), a 32 MB target collapsed the cache to ONE partition and
    // serialized the 2 s consumer stages the coalesce exists to shrink.
    val tfParts = {
      val shuffleParts = df.sparkSession.sessionState.conf.numShufflePartitions
      val inBytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
      ((inBytes / (4L << 20)) + 1).min(BigInt(shuffleParts)).max(BigInt(1)).toInt
    }
    val tf = df
      .select(col(idCol).as("__id"),
        explode(split(col(textCol), " ")).as("__tok"))
      .groupBy("__id", "__tok").agg(count(lit(1)).as("__tf"))
      .coalesce(tfParts)
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)
    val norms = tf.groupBy("__id").agg(sum(col("__tf") * col("__tf")).as("__n2"))
    // df cap: (id, tok) is distinct post-agg, so count == document
    // frequency. Keep sub-cap postings by ANTI-joining the FREQUENT
    // vocab — under Zipf the head (df > maxDf) is the small side while
    // the rare tail grows with the corpus, so it is usually the
    // broadcastable direction; the aggregation itself map-side-combines,
    // no count-over-window hot partition. NO broadcast hint (the q187
    // class): the head still grows with the (Heap's-law) vocabulary at
    // a fixed absolute maxDf, so stats/AQE broadcast it while small
    // and fall back to the shuffle anti-join — the unavoidable shape
    // anyway once the head outgrows a broadcast — when it is not.
    val frequentVocab = tf.groupBy("__tok").agg(count(lit(1)).as("__df"))
      .where(col("__df") > maxDf)
      .select("__tok")
    val rare = tf.join(frequentVocab, Seq("__tok"), "left_anti")
    val cand = rare.as("a")
      .join(rare.as("b"),
        col("a.__tok") === col("b.__tok") && col("a.__id") < col("b.__id"))
      .select(col("a.__id").as("id_a"), col("b.__id").as("id_b"))
      .distinct()
    // exact dot over FULL tf vectors, candidate-bounded rejoin
    val pairs = cand
      .join(tf.select(col("__id").as("id_a"), col("__tok"),
        col("__tf").as("__tf_a")), "id_a")
      .join(tf.select(col("__id").as("id_b"), col("__tok"),
        col("__tf").as("__tf_b")), Seq("id_b", "__tok"))
      .groupBy("id_a", "id_b")
      .agg(sum(col("__tf_a") * col("__tf_b")).as("dot"))
    val result = pairs
      .join(norms.select(col("__id").as("id_a"), col("__n2").as("n2_a")), "id_a")
      .join(norms.select(col("__id").as("id_b"), col("__n2").as("n2_b")), "id_b")
      .where(lit(1000L) * col("dot") * col("dot") >=
        lit(minCos2Permille.toLong) * col("n2_a") * col("n2_b"))
      .select(col("id_a"), col("id_b"), col("dot"), col("n2_a"), col("n2_b"),
        expr("(1000 * dot * dot) div (n2_a * n2_b)").as("cos2_permille"))
    // Materialize the surviving-pair set (ids + four longs — small) so
    // the tf cache can be released NOW rather than leaking blocks for
    // the session lifetime — the minHashPairs lifecycle.
    val out = result.localCheckpoint(true)
    tf.unpersist(false)
    out
  }
}
