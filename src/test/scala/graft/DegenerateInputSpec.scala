package graft

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import graft.operators._

/** Degenerate-input contracts for the operator surface: EMPTY input and
  * all-NULL payload columns must produce either an empty (correctly
  * typed) result or a NAMED error — never an obscure executor crash or,
  * worse, silently wrong rows. Each fixed defect found by the round-9
  * sweep is pinned here:
  *   - ivfTopK/kmeansCentroids/probeAssignments on an empty corpus died
  *     with Catalyst's VOID-extraction error (argmax over zero literal
  *     centroids);
  *   - BloomPrune.buildFilter on an empty/all-null dim NPE'd inside
  *     sketch serialization (never-allocated bit buffer);
  *   - BloomPrune.reducedJoin could never run with factKey == dimKey
  *     (AMBIGUOUS_REFERENCE), contradicting its plain-join contract;
  *   - null-embedding corpus rows rode the bounded top-k heap into
  *     bruteForceTopK/ivfTopK results and ranked as "nearest" neighbors
  *     with a NULL similarity.
  */
class DegenerateInputSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private lazy val docs0 = Seq.empty[(Long, String)].toDF("doc_id", "text")
  private lazy val edges0 = Seq.empty[(Long, Long)].toDF("src", "dst")
  private lazy val verts0 = Seq.empty[Long].toDF("id")
  private lazy val vecs0 = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
  private lazy val kv0 = Seq.empty[(Long, Long, Long)].toDF("id", "ts", "v")

  private def assertEmpty(df: DataFrame): Unit = assert(df.count() === 0L)

  test("empty input yields an empty result across the dedup/text surface") {
    assertEmpty(Dedup.exact(docs0, "doc_id", Seq("text")))
    assertEmpty(Dedup.minHashPairs(docs0, "doc_id", "text"))
    assertEmpty(Dedup.simHashPairs(docs0, "doc_id", "text"))
    assertEmpty(Dedup.winnowingPairs(docs0, "doc_id", "text"))
    assertEmpty(Dedup.containmentPairs(docs0, "doc_id", "text", 3, 3, 5,
      allowUncapped = true))
    assertEmpty(Dedup.containmentPairs(docs0, "doc_id", "text", 3, 3, 5, Some(2L)))
    assertEmpty(Dedup.prefixJaccardPairs(docs0, "doc_id", "text", 1, 2))
    // the fan-out probe on an empty (or all-null-text) corpus: zeroed
    // stats, no hazard, no recommendation — and the adaptive wrapper
    // then runs uncapped on the empty corpus without a crash
    for (d0 <- Seq(docs0,
        Seq((1L, null: String), (2L, null: String)).toDF("doc_id", "text"))) {
      val probe = Dedup.containmentFanout(d0, "doc_id", "text", 3, 3, 5)
      assert(probe.nDocs === 0L && probe.vocab === 0L &&
        probe.maxShingleDf === 0L && probe.uncappedCandidates === 0L)
      assert(!probe.uncappedHazard && probe.recommendedMaxDf.isEmpty)
      probe.requireUncappedSafe()
      assertEmpty(Dedup.containmentPairsAdaptive(d0, "doc_id", "text", 3, 3, 5)._1)
    }
    assertEmpty(FuzzyJoin.editDistanceSelfJoin(docs0, "doc_id", "text", 2))
    assertEmpty(TextAnalysis.chunkTokens(docs0, "doc_id", "text"))
    assertEmpty(TextAnalysis.oovStats(docs0, "doc_id", "text"))
    assertEmpty(TextAnalysis.vocabEncode(docs0, "doc_id", "text"))
  }

  test("empty input yields an empty result across joins/graph/order/sampling") {
    assertEmpty(Graph.connectedComponents(edges0, "src", "dst"))
    assertEmpty(Graph.pageRank(verts0, "id", edges0, "src", "dst"))
    assertEmpty(Graph.bfsHops(edges0, "src", "dst", verts0, "id"))
    assertEmpty(Graph.triangleCounts(edges0, "src", "dst"))
    assertEmpty(GlobalOrder.rowNumber(docs0, Seq(col("doc_id"))))
    val iv0 = Seq.empty[(Long, Long, Long)].toDF("iid", "s", "e")
    assertEmpty(IntervalJoin.overlapJoin(
      iv0, iv0, col("s"), col("e"), col("s"), col("e"), 10L))
    assertEmpty(TableDiff.diff(kv0, kv0, Seq("id")))
    assertEmpty(Skyline.skyline2D(kv0, "ts", "v"))
    assertEmpty(Sampling.ppsSystematic(kv0, col("v"), col("id"), 5L))
    assertEmpty(Packing.shardByTokenBudget(kv0, col("v"), col("id"), 100L))
    assertEmpty(Packing.shardByTokenBudgetGlobal(kv0, "v", "id", 100L, 4))
    assertEmpty(graft.plans.TopK.perGroup(kv0, Seq("id"), Seq("v" -> true), 3))
  }

  test("collect-based samplers fail BY NAME on empty input, not downstream") {
    val e1 = intercept[IllegalArgumentException](
      Sampling.temperatureSample(docs0, "text", "doc_id"))
    assert(e1.getMessage.contains("empty input"))
    val e2 = intercept[IllegalArgumentException](
      Sampling.epochRepeat(docs0, "text", "doc_id", 2L, 1L))
    assert(e2.getMessage.contains("empty input"))
    val e3 = intercept[IllegalArgumentException](
      Sampling.mixtureSample(docs0, "text", lit(1L), Seq("en" -> 1L),
        Sampling.idMix(col("doc_id"))))
    assert(e3.getMessage.contains("no tokens in any weighted stratum"))
  }

  test("ivfTopK over an empty corpus returns the empty top-k, typed like the full one") {
    val out = Similarity.ivfTopK(vecs0, vecs0, "vec_id", "vec_id", "embedding", 3)
    assert(out.columns.toSeq === Seq("query_id", "rank", "neighbor_id"))
    assert(out.count() === 0L)
    // and the pieces it is built from hold the same contract
    assert(Similarity.kmeansCentroids(
      vecs0.select(col("vec_id").as("neighbor_id"), col("embedding").as("__cv")),
      nlist = 4, iters = 2).isEmpty)
    assertEmpty(Similarity.probeAssignments(vecs0, "vec_id", "embedding",
      cents = Seq.empty, nprobe = 2))
    val e = intercept[IllegalArgumentException](
      Similarity.assignNearest(vecs0, "embedding", Seq.empty))
    assert(e.getMessage.contains("assignNearest"))
  }

  test("a Bloom filter of an empty or all-null dim matches nothing (and serializes)") {
    val fact = Seq(1L, 2L, 3L).toDF("id")
    val bytes = BloomPrune.buildFilter(kv0, col("id"), 100L)
    assert(bytes.nonEmpty)
    assert(BloomPrune.prune(fact, col("id"), bytes).count() === 0L)
    val dimNull = Seq(Option.empty[Long], Option.empty[Long]).toDF("id")
    val bytesN = BloomPrune.buildFilter(dimNull, col("id"), 100L)
    assert(BloomPrune.prune(fact, col("id"), bytesN).count() === 0L)
  }

  test("reducedJoin works when fact and dim share the key column name") {
    val fact = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("id", "v")
    val dim = Seq((2L, "b"), (3L, "c"), (9L, "z")).toDF("id", "name")
    val out = BloomPrune.reducedJoin(fact, dim, "id", "id", 10L)
    assert(out.count() === 2L) // identical to the plain join: keys 2 and 3
    // ... including the SCHEMA: the shared key coalesces to ONE column,
    // exactly like fact.join(dim, Seq("id")), so downstream name-based
    // references to the key stay unambiguous
    assert(out.columns.toSeq === fact.join(dim, Seq("id")).columns.toSeq)
    assert(out.columns.count(_ == "id") === 1)
    assert(out.select("id").as[Long].collect().sorted === Array(2L, 3L))
  }

  test("null-embedding corpus rows are never returned as neighbors") {
    val corpus = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0.9f, 0.1f)), (3L, null: Array[Float]))
      .toDF("vec_id", "embedding")
    val queries = Seq((1L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val brute = Similarity.bruteForceTopK(
      queries, corpus, "vec_id", "vec_id", "embedding", 5)
    assert(brute.select("neighbor_id").as[Long].collect().toSet === Set(2L))
    val ivf = Similarity.ivfTopK(
      queries, corpus, "vec_id", "vec_id", "embedding", 5, nlist = 2, nprobe = 2)
    assert(ivf.select("neighbor_id").as[Long].collect().toSet === Set(2L))
  }

  test("zero-norm and NaN vectors are never neighbors and never kill the job") {
    // zero vector: cosine denominator 0 — ANSI DIVIDE_BY_ZERO before the
    // try_divide fix; NaN vector: Spark orders NaN as the LARGEST double,
    // so it would rank as everyone's NEAREST neighbor
    val corpus = Seq(
      (1L, Array(1f, 0f)), (2L, Array(0.9f, 0.1f)),
      (3L, Array(0f, 0f)), (4L, Array(Float.NaN, 1f)))
      .toDF("vec_id", "embedding")
    val queries = Seq((10L, Array(1f, 0f))).toDF("vec_id", "embedding")
    val brute = Similarity.bruteForceTopK(
      queries, corpus, "vec_id", "vec_id", "embedding", 5)
    assert(brute.select("neighbor_id").as[Long].collect().toSet === Set(1L, 2L))
    val ivf = Similarity.ivfTopK(
      queries, corpus, "vec_id", "vec_id", "embedding", 5, nlist = 2, nprobe = 2)
    assert(ivf.select("neighbor_id").as[Long].collect().toSet === Set(1L, 2L))
    // near-dup pairs: the two good vectors pair; zero/NaN pair with nothing
    val nd = Dedup.embeddingNearDupPairs(
      corpus.union(Seq((5L, Array(0f, 0f)), (6L, Array(Float.NaN, 1f)))
        .toDF("vec_id", "embedding")),
      "vec_id", "embedding", dim = 2, planes = 4, minCosine = 0.95)
    assert(nd.select("id_a", "id_b").as[(Long, Long)].collect().toSet ===
      Set((1L, 2L)))
    // a zero/NaN centroid is refused by name, not as a fold-time crash
    val e = intercept[IllegalArgumentException](
      Similarity.assignNearest(queries, "embedding",
        Seq((0L, Seq(0.0, 0.0)))))
    assert(e.getMessage.contains("non-null, non-zero, NaN-free"))
  }

  test("overflow-norm double vectors are never neighbors (Inf/Inf would NaN-rank first)") {
    // dot(v,v) of (1e200, 1e200) overflows to +Infinity: NOT NaN and > 0,
    // so the pre-r12 usableVec passed it, and Inf/Inf through try_divide
    // is NaN — which Spark ranks ABOVE every real cosine, making the
    // broken vector every query's "nearest" neighbor. Unreachable for
    // float32-ranged embeddings (max dot ~1e77) but live for the
    // double-array inputs the dot kernel equally supports. usableVec now
    // also requires a FINITE squared norm, per-row (the per-pair path
    // stays filter-free).
    val corpus = Seq(
      (1L, Array(1.0, 0.0)), (2L, Array(0.9, 0.1)),
      (3L, Array(1e200, 1e200)))
      .toDF("vec_id", "embedding")
    val queries = Seq((10L, Array(1.0, 0.0))).toDF("vec_id", "embedding")
    val brute = Similarity.bruteForceTopK(
      queries, corpus, "vec_id", "vec_id", "embedding", 5)
    assert(brute.select("neighbor_id").as[Long].collect().toSet === Set(1L, 2L))
    // as a QUERY the overflow vector returns no neighbors rather than a
    // NaN-similarity ranking of the whole corpus
    val asQuery = Similarity.bruteForceTopK(
      Seq((10L, Array(1e200, 1e200))).toDF("vec_id", "embedding"),
      corpus, "vec_id", "vec_id", "embedding", 5)
    assert(asQuery.count() === 0)
  }

  test("AsOfJoin null-key contract: null-keyed lefts match null-keyed rights") {
    // DELIBERATE divergence from SQL join semantics, pinned per the
    // AsOfJoin scaladoc's NULL-KEY CONTRACT: null keys share the window's
    // null partition (GROUP BY-style null grouping), so a null-keyed left
    // attaches the latest null-keyed right at-or-before its ts. SQL
    // equi-join / pandas merge_asof would emit no-match; callers wanting
    // that pre-filter left.where(key.isNotNull).
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (1L, Option(10L), ts("2024-01-05 00:00:00")),
      (2L, Option.empty[Long], ts("2024-01-05 00:00:00")))
      .toDF("eid", "k", "ts")
    val right = Seq(
      (Option(10L), ts("2024-01-02 00:00:00"), 100L),
      (Option.empty[Long], ts("2024-01-03 00:00:00"), 200L),
      (Option.empty[Long], ts("2024-01-09 00:00:00"), 201L)) // after: ignored
      .toDF("k", "rts", "oid")
    val out = AsOfJoin(left, right, "k", "ts", "k", "rts",
      tieBreak = "oid", payloadCols = Seq("oid"))
      .select("eid", "oid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(out === Set((1L, 100L), (2L, 200L)),
      "null-keyed left must attach the null-keyed right (window null partition)")
  }

  test("Validate.Unique null-key contract: null keys group as duplicates") {
    // DELIBERATE divergence from SQL UNIQUE (nulls never conflict),
    // pinned per the Unique scaladoc: three null-keyed rows = 2
    // violations, exactly like any other thrice-repeated key — a
    // quality gate must surface the null population, not exempt it.
    val df = Seq(Option(1L), Option(1L), Option(2L),
      Option.empty[Long], Option.empty[Long], Option.empty[Long]).toDF("k")
    val out = Validate.validate(df, Seq(Validate.Unique(Seq("k"))))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    assert(out === Map("unique(k)" -> 3L)) // (1,1)->1 + (null x3)->2
  }

  test("Merge null-key contract: null keys group in the survivor window") {
    // Same family as the AsOfJoin / Validate.Unique pins: a null-keyed
    // change UPSERTS/DELETES the null-keyed snapshot row (window null
    // grouping), where SQL MERGE's equi-match would no-match and insert
    // a second null-keyed row. Pinned per the Merge scaladoc contract.
    val snap = Seq((Option(1L), "a"), (Option.empty[Long], "b"))
      .toDF("k", "v")
    val up = Seq((Option.empty[Long], "b2", "U")).toDF("k", "v", "op")
    val out = Merge.upsert(snap, up, Seq("k"))
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        r.getString(1))).toSet
    assert(out === Set((1L, "a"), (-1L, "b2")),
      "null-keyed change must replace the null-keyed snapshot row")
    val del = Seq((Option.empty[Long], null: String, "D")).toDF("k", "v", "op")
    val out2 = Merge.upsert(snap, del, Seq("k"))
      .collect().map(r => (if (r.isNullAt(0)) -1L else r.getLong(0),
        r.getString(1))).toSet
    assert(out2 === Set((1L, "a")),
      "null-keyed delete must drop the null-keyed snapshot row")
  }

  test("resample/chunkTokens null-row contract: null ts/text rows drop silently") {
    // DELIBERATE (= SQL null semantics, matching window()/session_window
    // and the streaming sessionizer), pinned per the resample and
    // chunkTokens scaladocs: a null grid point / null token array
    // contributes zero output rows, and the result equals running the
    // operator on the null-free input.
    import java.sql.Timestamp
    def ts(s: String) = Timestamp.valueOf(s)
    val ev = Seq(
      (1L, Option(ts("2024-01-01 00:10:00")), 5.0),
      (1L, Option(ts("2024-01-01 02:20:00")), 7.0),
      (1L, Option.empty[Timestamp], 99.0)) // null ts: silently dropped
      .toDF("uid", "ts", "v")
    def run(df: org.apache.spark.sql.DataFrame) =
      graft.operators.TimeSeries.resample(df, "uid",
        date_trunc("hour", col("ts")), "interval 1 hour",
        Seq(count(lit(1)).as("n"), sum(col("v")).as("sv")),
        zeroFill = Seq("n"), ffill = Seq("sv"))
        .orderBy("bucket").select("n", "sv")
        .as[(Long, Double)].collect().toSeq
    val withNull = run(ev)
    assert(withNull === run(ev.where(col("ts").isNotNull)))
    assert(withNull === Seq((1L, 5.0), (0L, 5.0), (1L, 7.0))) // no 99.0 anywhere
    val docs = Seq((1L, Option("a b c")), (2L, Option.empty[String]))
      .toDF("doc_id", "text")
    val chunks = TextAnalysis.chunkTokens(docs, "doc_id", "text", 2, 1)
    assert(chunks.select("doc_id").as[Long].collect().toSet === Set(1L),
      "null-text doc must emit zero chunks, not crash or emit a null chunk")
  }

  test("skyline2D fails BY NAME on a null coordinate") {
    val rows = Seq((Option(1L), Option(2L)), (Option.empty[Long], Option(3L)))
      .toDF("x", "y")
    val t = intercept[Throwable](Skyline.skyline2D(rows, "x", "y").count())
    assert(SharedSpark.messages(t).exists(_.contains("Skyline.skyline2D")))
  }

  test("round-10 guards: null strata, all-null order keys, bad params fail or drop by contract") {
    // sqrtQuotas: a NULL stratum can never match the string-keyed keep
    // predicates, so its rows must not inflate the budget/denominator —
    // quotas over (a + nulls) must equal quotas over (a) alone
    val withNulls = (Seq.fill(16)(("a", 1)) ++ Seq.fill(16)((null: String, 1)))
      .toDF("lang", "x").withColumn("doc_id", monotonically_increasing_id())
    val justA = Seq.fill(16)(("a", 1)).toDF("lang", "x")
      .withColumn("doc_id", monotonically_increasing_id())
    val sampled = Sampling.temperatureSample(withNulls, "lang", "doc_id")
    val sampledA = Sampling.temperatureSample(justA, "lang", "doc_id")
    assert(sampled.count() == sampledA.count(),
      "null-stratum rows must not shrink real strata's quotas")
    // hashSplit: a negative weight silently zeroed its split's range
    intercept[IllegalArgumentException](
      Sampling.hashSplit(justA, "doc_id", Seq(("train", 0.9), ("val", -0.1), ("test", 0.2))))
    // global shard packing: an all-null order column used to tag every
    // row shard 0 via the empty-input early return
    val allNull = Seq((1L, 10L), (2L, 20L)).toDF("id", "v")
      .withColumn("ord", lit(null).cast("long"))
    val e = intercept[IllegalArgumentException](
      Packing.shardByTokenBudgetGlobal(allNull, "v", "ord", 100L, 4))
    assert(e.getMessage.contains("entirely null"))
    // ivfTopK: nlist/nprobe = 0 used to take the empty-corpus early
    // return silently — every query got zero neighbors over a full corpus
    val vecs = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    intercept[IllegalArgumentException](
      Similarity.ivfTopK(vecs, vecs, "vec_id", "vec_id", "embedding", 1, nlist = 0))
    intercept[IllegalArgumentException](
      Similarity.ivfTopK(vecs, vecs, "vec_id", "vec_id", "embedding", 1, nprobe = 0))
    // assignNearest: a broken (null/NaN/zero) input vector used to land
    // in the LOWEST centroid id; it now participates in nothing
    val mixed = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 0.0f)),
      (3L, null: Array[Float])).toDF("id", "embedding")
    val assigned = Similarity.assignNearest(mixed, "embedding",
      Seq((0L, Seq(1.0, 0.0)), (1L, Seq(0.0, 1.0))))
    assert(assigned.select("id").as[Long].collect().toSet == Set(1L),
      "only the usable vector is assigned")
    // ppsSystematic: caller columns named like the bookkeeping must fail
    // fast, not vanish from the result
    intercept[IllegalArgumentException](
      Sampling.ppsSystematic(justA.withColumn("__cum", lit(1L)),
        lit(1L), col("doc_id"), 2L))
  }

  test("all-null payload columns flow through as empty results, not crashes") {
    val docsN = Seq((1L, null: String), (2L, null: String)).toDF("doc_id", "text")
    assertEmpty(Dedup.minHashPairs(docsN, "doc_id", "text"))
    assertEmpty(Dedup.containmentPairs(docsN, "doc_id", "text", 3, 3, 5,
      allowUncapped = true))
    assertEmpty(FuzzyJoin.editDistanceSelfJoin(docsN, "doc_id", "text", 2))
    assertEmpty(TextAnalysis.vocabEncode(docsN, "doc_id", "text"))
    val vecsN = Seq((1L, null: Array[Float]), (2L, null: Array[Float]))
      .toDF("vec_id", "embedding")
    assertEmpty(Similarity.bruteForceTopK(
      vecsN, vecsN, "vec_id", "vec_id", "embedding", 3))
    assertEmpty(Similarity.ivfTopK(
      vecsN, vecsN, "vec_id", "vec_id", "embedding", 3))
    assertEmpty(Dedup.embeddingNearDupPairs(vecsN, "vec_id", "embedding", dim = 8))
  }
}
