package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deduplication operators for web-scale corpora. All variants follow the
  * same scale discipline: per-row signature computation is a codegen'd
  * expression (no UDFs), candidate generation is a single shuffle on a
  * bucket key (never an all-pairs cross join), and verification runs only
  * inside buckets. At 100 TB the only O(n^2) work left is within LSH
  * buckets, which banding keeps tiny.
  *
  * (The reference engine has no dedup surface — these are north-star
  * pipeline operators, built Spark-first.)
  */
object Dedup {
  val HashPrime = 2038074743L // large prime < 2^31 for minhash permutations

  /** Exact dedup: one representative row id (min) per identical value of
    * `keyCols`. A single hash-aggregate shuffle.
    */
  def exact(df: DataFrame, idCol: String, keyCols: Seq[String]): DataFrame =
    df.groupBy(keyCols.map(col): _*)
      .agg(min(col(idCol)).as(idCol))
      .select(idCol)

  /** Token-set dedup: documents with the same SET of word tokens collapse
    * to one representative. Group key = sorted distinct token array.
    */
  def tokenSet(df: DataFrame, idCol: String, textCol: String): DataFrame =
    df.groupBy(array_sort(array_distinct(split(col(textCol), " "))).as("__sig"))
      .agg(min(col(idCol)).as(idCol), count(lit(1)).as("n_dups"))
      .select(idCol, "n_dups")

  /** Word w-shingles of a document, distinct (native codegen'd
    * expression; texts shorter than w tokens yield themselves).
    */
  def shingles(text: Column, w: Int): Column =
    graft.functions.exprs.wordShingles(text, w)

  /** Deterministic seeded (a_i, b_i) coefficients for the minhash
    * permutation family h_i(x) = (a_i * x + b_i) mod prime.
    */
  private def minHashCoeffs(numHashes: Int): Seq[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Seq.fill(numHashes)(
      (1 + rnd.nextLong().abs % (HashPrime - 1), rnd.nextLong().abs % HashPrime))
  }

  /** Packed (a_0, b_0, a_1, b_1, ...) coefficient form for the SQL
    * function registration.
    */
  def minHashCoeffArray(numHashes: Int): Array[Long] =
    minHashCoeffs(numHashes).flatMap { case (a, b) => Seq(a, b) }.toArray

  /** MinHash signature: for permutation i, min over shingles of
    * ((a_i * xxhash64(s) + b_i) mod prime). Derived from the classic
    * Broder MinHash scheme; deterministic seeded coefficients. Runs as a
    * native codegen'd expression ([[graft.functions.MinHashSignature]]) —
    * one compiled pass per row instead of numHashes interpreted
    * higher-order-function walks.
    */
  def minHashSignature(shingleArr: Column, numHashes: Int): Column =
    graft.functions.exprs.minhashSig(shingleArr, minHashCoeffs(numHashes), HashPrime)

  /** MinHash + LSH near-duplicate pairs.
    *
    * Pipeline: shingle → signature (numHashes minhashes) → split into
    * `bands` bands of numHashes/bands rows → explode one row per band →
    * shuffle on (band index, band hash) → join within buckets → distinct
    * candidate pairs → estimate Jaccard as the fraction of matching
    * minhashes → filter by `threshold`.
    *
    * Cost at scale: rows × bands exploded rows, one shuffle, and a
    * self-join that only ever matches within identical band buckets.
    *
    * EAGER, one-shot semantics: the returned frame is a
    * `localCheckpoint(eager = true)` — the full LSH pipeline runs INSIDE
    * this call (so the signature cache can be released immediately
    * rather than leak for the session's lifetime), and the result is a
    * materialized block set, not a recomputable lineage. Compose further
    * transforms freely, but on a multi-executor cluster a lost executor
    * invalidates the blocks — long-lived cluster callers that need
    * fault-tolerant reuse should write the (small) pair set to a table
    * instead of holding the handle.
    */
  /** Banded candidate pairs from a signature relation: explode one row
    * per band, shuffle on (band index, band hash), join within buckets.
    * Only (id, band key) rides the shuffle — signatures (numHashes
    * longs, duplicated per band) would multiply shuffle volume ~bands×.
    * Band keys come from the fused native
    * [[graft.functions.MinHashBandKeys]] expression — the earlier
    * `xxhash64(concat_ws(slice(...)))` form rendered every signature
    * long to a string per band before hashing.
    */
  private def bandedCandidates(sigs: DataFrame, bands: Int): DataFrame = {
    val banded = sigs.select(
      col("__id"),
      posexplode(graft.functions.exprs.minhashBandKeys(col("__sig"), bands))
        .as(Seq("__band", "__bkey")))
    banded.select(col("__band"), col("__bkey"), col("__id").as("id_a"))
      .join(banded.select(col("__band"), col("__bkey"), col("__id").as("id_b")),
        Seq("__band", "__bkey"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
  }

  /** LSH candidate pairs only (id_a, id_b) — no signature rejoin, no
    * estimated-Jaccard filter, no materialization. This is the recall
    * surface a verification stage (exact Jaccard, or q26's invariant
    * check) consumes; [[minHashPairs]] adds the verification pass.
    */
  def minHashCandidates(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleWidth: Int = 3): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")
    val sigs = df.select(col(idCol).as("__id"),
      minHashSignature(shingles(col(textCol), shingleWidth), numHashes).as("__sig"))
    bandedCandidates(sigs, bands)
  }

  def minHashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      numHashes: Int = 64,
      bands: Int = 16,
      shingleWidth: Int = 3,
      threshold: Double = 0.5): DataFrame = {
    require(numHashes % bands == 0, "bands must divide numHashes")

    // One native-expression projection per row; persisted because the
    // relation is consumed three times (two self-join sides + the
    // verification rejoin) and recomputing shingles+signatures per
    // consumer would triple the dominant cost. The cached form is tiny
    // relative to the input text (id + numHashes longs).
    val sigs = df
      .select(col(idCol).as("__id"),
        minHashSignature(shingles(col(textCol), shingleWidth), numHashes).as("__sig"))
      .persist(org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK)

    val candidates = bandedCandidates(sigs, bands)

    // Verification: re-attach full signatures only for surviving pairs.
    val pairs = candidates
      .join(sigs.select(col("__id").as("id_a"), col("__sig").as("sig_a")), Seq("id_a"))
      .join(sigs.select(col("__id").as("id_b"), col("__sig").as("sig_b")), Seq("id_b"))
      .select(col("id_a"), col("id_b"),
        aggregate(zip_with(col("sig_a"), col("sig_b"),
          (x, y) => when(x === y, 1L).otherwise(0L)),
          lit(0L), (acc, v) => acc + v).as("n_match"))
      .where(col("n_match") >= lit((threshold * numHashes).ceil.toLong))
      .select(col("id_a"), col("id_b"),
        (col("n_match").cast("double") / lit(numHashes.toDouble)).as("est_jaccard"))

    // Materialize eagerly (the surviving-pairs set is small: ids + one
    // double) so the signature cache can be released NOW instead of
    // leaking MEMORY_AND_DISK blocks for the session lifetime across
    // repeated invocations. The checkpointed result itself is freed by the
    // ContextCleaner once the returned DataFrame is unreachable.
    val out = pairs.localCheckpoint(true)
    sigs.unpersist(false)
    out
  }

  /** Exact n-gram (word w-shingle) Jaccard similarity pairs:
    * |A ∩ B| / |A ∪ B| >= threshold. Candidates come from MinHash-LSH
    * banding (single shuffle); the exact set arithmetic runs only inside
    * candidate pairs, so the full O(n²) comparison never materializes.
    * For oracle-checkable exactness, `bruteForce = true` compares every
    * pair below the id cap instead (test/verification path).
    */
  def ngramJaccardPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      shingleWidth: Int = 3,
      threshold: Double = 0.5,
      bruteForce: Boolean = false): DataFrame = {
    val sh = df.select(col(idCol).as("__id"),
      array_sort(shingles(col(textCol), shingleWidth)).as("__sh"))

    val candidates =
      if (bruteForce) {
        sh.select(col("__id").as("id_a")).crossJoin(sh.select(col("__id").as("id_b")))
          .where(col("id_a") < col("id_b"))
      } else {
        // LSH banding over the same shingles: recall-biased candidates
        minHashPairs(df, idCol, textCol, numHashes = 64, bands = 32,
          shingleWidth = shingleWidth, threshold = math.max(0.0, threshold - 0.2))
          .select("id_a", "id_b")
      }

    candidates
      .join(sh.select(col("__id").as("id_a"), col("__sh").as("sh_a")), Seq("id_a"))
      .join(sh.select(col("__id").as("id_b"), col("__sh").as("sh_b")), Seq("id_b"))
      // i via the allocation-free sorted two-pointer count (__sh is
      // array_sort'd and distinct), and |union| = |A| + |B| - i by
      // inclusion-exclusion over distinct sets — replaces TWO per-pair
      // hash-set allocations (array_intersect AND array_union) with
      // none; same values bit-for-bit (r17, guide §1.2 per-task work)
      .withColumn("__i", graft.functions.exprs.sortedIntersectCount(
        col("sh_a"), col("sh_b")))
      .select(col("id_a"), col("id_b"),
        (col("__i").cast("double") /
          (size(col("sh_a")).cast("long") + size(col("sh_b")) - col("__i")))
          .as("jaccard"))
      .where(col("jaccard") >= threshold)
  }

  /** Benchmark decontamination: flag corpus documents sharing word
    * w-shingles with a benchmark/eval set (the standard n-gram-overlap
    * decontamination step of LLM training pipelines). The benchmark
    * shingle set is distinct-reduced and broadcast (eval suites are
    * tiny next to a 100 TB corpus); the corpus streams through one
    * semi-join + one aggregation — no corpus shuffle beyond the final
    * per-doc count.
    *
    * @return (idCol, n_overlap) for corpus docs with ≥ 1 shared shingle
    */
  def decontaminate(
      corpus: DataFrame,
      benchmark: DataFrame,
      idCol: String,
      textCol: String,
      shingleWidth: Int = 3): DataFrame = {
    def exploded(df: DataFrame) = df.select(
      col(idCol), explode(shingles(col(textCol), shingleWidth)).as("__sh"))
    val benchSet = exploded(benchmark).select("__sh").distinct()
    exploded(corpus)
      .join(broadcast(benchSet), Seq("__sh"), "left_semi")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_overlap"))
  }

  /** 64-bit SimHash of the word tokens: bit j of the signature is the
    * sign of the sum over tokens of ±1 according to bit j of
    * xxhash64(token). Native codegen'd expression
    * ([[graft.functions.SimHash64]]).
    */
  def simHash(text: Column): Column =
    graft.functions.exprs.simhash64(split(text, " "))

  /** SimHash near-duplicate pairs with Hamming distance <= maxDist.
    * Pigeonhole banding: split the 64-bit signature into maxDist+1
    * chunks; any pair within distance maxDist agrees exactly on at least
    * one chunk, so candidates = bucket-join per chunk, verified with
    * bit_count(xor).
    */
  def simHashPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      maxDist: Int = 3): DataFrame = {
    val chunks = maxDist + 1
    val bitsPer = 64 / chunks

    val sigs = df.select(col(idCol).as("__id"), simHash(col(textCol)).as("__sim"))
    val banded = sigs.select(col("__id"), col("__sim"),
      posexplode(array((0 until chunks).map(c =>
        shiftright(col("__sim"), c * bitsPer)
          .bitwiseAND(lit((1L << bitsPer) - 1))): _*)).as(Seq("__chunk", "__ckey")))

    val l = banded.select(col("__chunk"), col("__ckey"),
      col("__id").as("id_a"), col("__sim").as("sim_a"))
    val r = banded.select(col("__chunk"), col("__ckey"),
      col("__id").as("id_b"), col("__sim").as("sim_b"))

    l.join(r, Seq("__chunk", "__ckey"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).cast("long").as("hamming"))
      .where(col("hamming") <= maxDist)
      .distinct()
  }

  /** Embedding near-duplicate pairs: random-hyperplane LSH buckets, then
    * exact cosine verification inside buckets. `planes` sign bits form
    * the bucket key; near-identical vectors collide with high
    * probability while the shuffle stays one-pass.
    */
  def embeddingNearDupPairs(
      df: DataFrame,
      idCol: String,
      vecCol: String,
      dim: Int,
      planes: Int = 16,
      minCosine: Double = 0.95): DataFrame = {
    val rnd = new scala.util.Random(7)
    val hyper: Seq[Array[Double]] =
      Seq.fill(planes)(Array.fill(dim)(rnd.nextGaussian()))

    def dotConst(v: Column, h: Array[Double]): Column =
      graft.functions.exprs.dotProduct(v, lit(h))

    // usableVec per ROW, not a null/NaN guard per PAIR: the old
    // `where(cosine >= t && !isnan(cosine))` pushed through the select
    // into the bucket-join condition, inlining the dot product into the
    // condition TWICE on top of the project's copy (measured 2x on q28
    // in round 10). Prefiltered vectors have non-null finite elements
    // and positive norms, so the pair cosine is non-null/non-NaN by
    // construction and one threshold compare suffices.
    val keyed = df.where(Similarity.usableVec(col(vecCol))).select(
      col(idCol).as("__id"), col(vecCol).as("__v"),
      Similarity.norm(col(vecCol)).as("__n"),
      concat_ws("", hyper.map(h =>
        when(dotConst(col(vecCol), h) >= 0, lit("1")).otherwise(lit("0"))): _*)
        .as("__bucket"))

    val l = keyed.select(col("__bucket"), col("__id").as("id_a"),
      col("__v").as("va"), col("__n").as("na"))
    val r = keyed.select(col("__bucket"), col("__id").as("id_b"),
      col("__v").as("vb"), col("__n").as("nb"))

    // The threshold filter pushes into the join condition (good — the
    // dot runs once per candidate pair there); the select recomputes the
    // cosine only for SURVIVING pairs. try_divide stays for the oracle's
    // exact divide arithmetic, but with prefiltered vectors the norms
    // are positive and the dot finite, so it never nulls or NaNs —
    // Spark's NaN-is-largest ordering can no longer smuggle a broken
    // vector past the threshold.
    l.join(r, Seq("__bucket"))
      .where(col("id_a") < col("id_b"))
      .select(col("id_a"), col("id_b"),
        org.apache.spark.sql.functions.try_divide(
          Similarity.dot(col("va"), col("vb")),
          col("na") * col("nb")).as("cosine"))
      .where(col("cosine") >= minCosine)
      .distinct()
  }

  /** Repeated-substring statistics — the distributed surrogate of
    * suffix-array substring dedup (Lee et al., "Deduplicating Training
    * Data Makes Language Models Better", ACL 2022): per document, how
    * many of its fixed-`width` character windows (taken every `stride`
    * chars) also occur in at least one OTHER document. High `nDup`
    * flags boilerplate/licence blocks and cross-page template text that
    * whole-document dedup can't see.
    *
    * Sensitivity note: a shared span is detected when it is
    * stride-aligned in both documents; stride=1 is exhaustive at
    * width× the row volume (policy knob, same trade-off as the paper's
    * suffix-array minimum match length).
    *
    * Scale posture: windows explode to (doc_id, window) pairs, dedup +
    * df-count are two hash-agg shuffles keyed by window content, and
    * the dup set joins back on the same key — no pairwise comparisons
    * anywhere. With `hashWindows` the shuffle carries an 8-byte
    * xxhash64 instead of `width` chars (the 100 TB setting; a collision
    * can bias BOTH counts — cross-doc it overcounts a window as
    * duplicated, intra-doc it merges two distinct windows and shrinks
    * n_windows — with probability ~n²/2⁶⁴ either way).
    * Output: (idCol, n_windows, n_dup) for EVERY input document
    * (short docs have 0 windows — whole-doc dedup covers them).
    */
  /** Winnowing document fingerprints (Schleimer, Wilkerson, Aiken,
    * SIGMOD 2003 — the MOSS algorithm): hash every k-gram of the
    * document with the q25 rolling hash, slide a window of `w`
    * consecutive gram hashes, keep each window's MINIMUM, output the
    * distinct minima as the document's fingerprint set.
    *
    * The published guarantee this buys over stride sampling
    * ([[repeatedWindowStats]]): any substring shared between two
    * documents of length >= w + k - 1 contributes at least one
    * IDENTICAL fingerprint to both (the shared span contains a full
    * hash window, and min-selection is position-independent), while
    * expected density is only ~2/(w+1) of the grams — position-robust
    * plagiarism/overlap detection at a fraction of the gram volume.
    * Documents shorter than k chars hash as one whole-text gram.
    *
    * All selection is per-row array arithmetic (transform + slice +
    * array_min over the codegen'd native rolling hash) — ZERO shuffle
    * until the caller aggregates fingerprints; the explode emits
    * (id, 8-byte fp) pairs, never text.
    *
    * Returns (idCol, fp), distinct per document.
    */
  def winnowingFingerprints(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      w: Int = 16): DataFrame = {
    require(k >= 1 && w >= 1, s"need k >= 1 and w >= 1, got k=$k w=$w")
    val mod = graft.operators.TextAnalysis.FingerprintMod
    // the native one-pass expression; equivalence with the
    // transform+substr+array_min formulation is pinned by
    // [[winnowingMinimaHof]]'s parity spec
    df.select(col(idCol),
      explode(array_distinct(graft.functions.exprs.winnowingMinima(
        col(textCol), k, w, mod))).as("fp"))
  }

  /** The declarative HOF formulation of the winnowing window minima —
    * O(n·k) re-hash per gram, superseded by the native one-pass
    * [[graft.functions.WinnowingMinima]] but kept as the independent
    * reference the parity spec checks the native expression against
    * (same role as the HOF fingerprint form for q25).
    */
  def winnowingMinimaHof(textCol: Column, k: Int, w: Int): Column = {
    val mod = graft.operators.TextAnalysis.FingerprintMod
    val nGrams = greatest(length(textCol) - lit(k - 1), lit(1))
    val grams = transform(sequence(lit(1), nGrams),
      i => graft.functions.exprs.rollingFingerprint(textCol.substr(i, lit(k)), mod))
    val nWins = greatest(size(grams) - lit(w - 1), lit(1))
    transform(sequence(lit(0), nWins - 1),
      j => array_min(slice(grams, j + lit(1), lit(w))))
  }

  /** Winnowing near-dup candidate pairs: fingerprint-bucket self-join
    * (the minhash-band shape — shuffles carry (fp, id) pairs, never
    * documents, and never go all-pairs), counting shared fingerprints
    * per pair. `maxDf` prunes fingerprints present in more than that
    * many documents BEFORE the join — corpus-wide boilerplate spans
    * would otherwise fan out quadratically (the q85 stopword-cap
    * argument); pruning costs recall only on content that many
    * documents already share. Output: (id_a, id_b, n_shared) with
    * id_a < id_b and n_shared >= minShared.
    */
  def winnowingPairs(
      df: DataFrame,
      idCol: String,
      textCol: String,
      k: Int = 8,
      w: Int = 16,
      maxDf: Int = 50,
      minShared: Int = 2): DataFrame = {
    val fps = winnowingFingerprints(df, idCol, textCol, k, w)
    val keep = fps.groupBy("fp").agg(count(lit(1)).as("__df"))
      .where(col("__df") <= maxDf).select("fp")
    val pruned = fps.join(keep, Seq("fp"))
    pruned.as("a")
      .join(pruned.as("b"),
        col("a.fp") === col("b.fp") &&
          col(s"a.$idCol") < col(s"b.$idCol"))
      .groupBy(col(s"a.$idCol").as("id_a"), col(s"b.$idCol").as("id_b"))
      .agg(count(lit(1)).as("n_shared"))
      .where(col("n_shared") >= minShared)
  }

  def repeatedWindowStats(
      df: DataFrame,
      idCol: String,
      textCol: String,
      width: Int = 40,
      stride: Int = 10,
      hashWindows: Boolean = false): DataFrame = {
    require(width >= 1 && stride >= 1, s"width/stride must be >= 1")
    val rawWin = expr(
      s"transform(sequence(0, (length($textCol) - $width) div $stride), " +
        s"i -> substring($textCol, 1 + $stride * i, $width))")
    val wins = df.where(length(col(textCol)) >= width)
      .select(col(idCol), explode(rawWin).as("__w"))
      .select(col(idCol),
        (if (hashWindows) xxhash64(col("__w")) else col("__w")).as("__w"))
      .distinct()
    val dup = wins.groupBy("__w").agg(count(lit(1)).as("__nd"))
      .where(col("__nd") >= 2)
      .select(col("__w"), lit(1L).as("__d"))
    val per = wins.join(dup, Seq("__w"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_windows"), count(col("__d")).as("n_dup"))
    df.select(col(idCol)).join(per, Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_windows"), lit(0L)).as("n_windows"),
        coalesce(col("n_dup"), lit(0L)).as("n_dup"))
  }

  /** Prefix-filtered CONTAINMENT self-join — the production path for the
    * asymmetric dedup rule C(A,B) = |A∩B| / |A| ≥ num/den that catches
    * quotes/subsets symmetric Jaccard misses (q130's verification form).
    *
    * Same exact-recall blocking principle as [[prefixJaccardPairs]], in
    * its ASYMMETRIC form: order all shingles by ascending global document
    * frequency (rarest first, ties by value); if C(A,B) ≥ num/den then
    * |A∩B| ≥ o = ⌈|A|·num/den⌉, so A's first p = |A| − o + 1 tokens in
    * that order cannot ALL be absent from B — blocking A's prefix tokens
    * against B's FULL token postings loses nothing (deterministic, no
    * probability — which is also why this beats MinHash-LSH banding here:
    * containment pairs with |B| ≫ |A| have arbitrarily small Jaccard, so
    * any symmetric-signature banding has unbounded false-negative rate on
    * exactly the pairs containment exists to find; LSH-Ensemble-style
    * partitioned banding recovers recall only probabilistically).
    * Verification recomputes |A∩B| exactly inside candidates with the
    * cross-multiplied integer gate i·den ≥ |A|·num — no floats anywhere.
    *
    * Shuffles at scale: one vocab-sized df agg, one set build, the
    * prefix(A) ⋈ tokens(B) candidate equi-join, and the verify rejoin —
    * all hash-partitioned equi-joins; nothing all-pairs. The B side posts
    * its full token set, so corpus-wide boilerplate tokens fan out —
    * that cost is inherent to EXACT containment (the rarest-first prefix
    * keeps the A side small); at 100 TB set `maxDf` (below) to cap the
    * B-side postings like q85, or pre-dedup boilerplate with
    * [[winnowingPairs]].
    *
    * `maxDf` — the 100 TB skew/fan-out lever, an EXPLICIT recall trade:
    * with `Some(cap)`, B-side postings of shingles with document
    * frequency > cap are dropped from CANDIDATE GENERATION ONLY (a
    * corpus-wide boilerplate shingle is both the hot reducer key and the
    * quadratic fan-out in the prefix(A) ⋈ tokens(B) join). The
    * verification sets stay UNCAPPED, so every emitted pair still
    * carries the exact (i, na) of the uncapped relation — capping can
    * only LOSE pairs, never corrupt one. The precise recall contract
    * (certified by q232 and fuzzed in OperatorsSpec): the capped output
    * is exactly the uncapped pairs (A, B) for which some shingle in
    * prefix(A) ∩ B has df ≤ cap — a pair is missed iff EVERY prefix
    * token it shares is corpus-boilerplate above the cap. `None` (the
    * default, q231's gate) is exact.
    *
    * PRODUCTION DEFAULT: call [[containmentPairsAdaptive]], not this
    * method directly. It probes the corpus's candidate volume first
    * ([[containmentFanout]] — blocking stages only, safe where the
    * uncapped join would not finish; ~2.6 s at 1×) and runs UNCAPPED
    * (exact, identical to calling this with `maxDf = None`) whenever
    * the volume fits the budget — so below the hazard threshold the
    * probe costs a few seconds and loses nothing, while above it the
    * uncapped default DNFs (measured: 322 M candidates, 77 GB of spill
    * at 100×). Call this method directly only where a gate REQUIRES
    * exact recall regardless of cost (the q231/q232 certification
    * pattern) or the cap is pinned externally.
    *
    * Choosing a manual cap: [[containmentFanout]] measures this
    * corpus's candidate volume analytically and
    * [[ContainmentFanout.recommendedMaxDf]] answers with the largest
    * knee-safe cap, or None when exact recall is free.
    *
    * Output: one row per ORDERED pair (id_a, id_b, i, na) with
    * i = |A∩B|, na = |A| and i·den ≥ na·num — containment of A in B
    * (both directions of a pair can appear, each with its own quotient).
    */
  def containmentPairs(df: DataFrame, idCol: String, textCol: String,
      shingleWidth: Int, num: Int, den: Int,
      maxDf: Option[Long] = None, allowUncapped: Boolean = false): DataFrame = {
    require(num > 0 && den >= num, s"threshold must be in (0,1]: $num/$den")
    maxDf.foreach(cap => require(cap >= 1, s"maxDf must be >= 1, got $cap"))
    // The uncapped invocation is the measured 100x DNF mode (SCALE.md
    // §Scale knee: 322 M candidates, 77 GB of spill) and it was still
    // the DEFAULT-callable path (r15 verdict next-round #5) — an
    // uncapped run now requires the caller to say so. The refusal names
    // the production entry so a pipeline hitting it knows the fix.
    require(maxDf.isDefined || allowUncapped,
      "containmentPairs called UNCAPPED (maxDf=None) without allowUncapped=true. " +
        "The uncapped prefix(A) x postings(B) candidate join is the measured " +
        "100x DNF mode (SCALE.md: 322 M candidates filled 77 GB of spill). Use " +
        "containmentPairsAdaptive — it probes the corpus's candidate volume " +
        "first and runs exact whenever that fits the budget — or pass " +
        "allowUncapped=true where a gate requires exact recall regardless of " +
        "cost (the q231/q232 certification pattern).")
    val toks = df
      .select(col(idCol).as("__id"),
        explode(array_distinct(shingles(col(textCol), shingleWidth))).as("__t"))
    val dfreq = toks.groupBy("__t").agg(count(lit(1)).as("__df"))
    // global rarest-first total order; rank is the blocking key. The
    // single-partition window runs over the VOCAB, not the corpus (the
    // q206 argument). __df rides along for the maxDf posting cap below.
    val ranked = dfreq.select(col("__t"), col("__df"),
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("__df"), col("__t"))).cast("long").as("__rank"))
    // Deliberately NOT persisted despite the multi-consumer reuse of
    // rankedToks/sets: measured at 10× sf0.1, persisting both (q26's
    // discipline) REGRESSED the operator 12 s → 37 s cold — the
    // InMemoryRelation boundaries freeze pre-cache size estimates and
    // AQE's runtime join re-planning across them, flipping the verify
    // joins off their broadcast shapes; the recompute the cache avoids
    // is cheaper than the plan it forecloses. (Negative result recorded
    // in SCALE.md §Prefix-filtered containment join.)
    val rankedToks = toks.join(ranked, "__t").select("__id", "__rank")
    // B-side postings for candidate generation: capped if maxDf is set
    // (scaladoc above) — the df filter lands on the vocab-sized ranked
    // relation BEFORE the corpus join, so capped postings never shuffle.
    val bPostings = maxDf match {
      case Some(cap) => toks
        .join(ranked.where(col("__df") <= cap), "__t")
        .select("__id", "__rank")
      case None => rankedToks
    }
    val sets = rankedToks
      .groupBy("__id")
      .agg(sort_array(collect_list(col("__rank"))).as("__set"))
      .withColumn("__n", size(col("__set")).cast("long"))
      // containment prefix: p = n − ⌈n·num/den⌉ + 1
      .withColumn("__p", expr(s"__n - ((__n * $num + $den - 1) div $den) + 1"))
    val prefixes = sets.select(col("__id"),
      explode(expr("slice(__set, 1, CAST(__p AS INT))")).as("__k"))
    // asymmetric block: A's prefix tokens against B's postings (full by
    // default; df-capped when maxDf is set)
    val cands = prefixes.select(col("__k"), col("__id").as("id_a"))
      .join(bPostings.select(col("__rank").as("__k"), col("__id").as("id_b")),
        Seq("__k"))
      .where(col("id_a") =!= col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    val verified = cands
      .join(sets.select(col("__id").as("id_a"), col("__set").as("sa"),
        col("__n").as("na")), Seq("id_a"))
      .join(sets.select(col("__id").as("id_b"), col("__set").as("sb"),
        col("__n").as("nb")), Seq("id_b"))
      // length filter: |A∩B| ≤ |B|, so C(A,B) ≥ t needs |B|·den ≥ |A|·num
      // — prunes candidates on two longs before the array intersection
      .where(col("nb") * den >= col("na") * num)
      // sorted_intersect_count, not size(array_intersect): the sets are
      // sort_array'd, and the two-pointer count allocates NOTHING where
      // array_intersect builds a hash set + output array per candidate
      // pair — the verify stages' allocation rate was the measured GC
      // owner of q232's slow mode under low heap headroom (r17, §5)
      .withColumn("i", graft.functions.exprs.sortedIntersectCount(
        col("sa"), col("sb")))
      .where(col("i") * den >= col("na") * num)
      .select("id_a", "id_b", "i", "na")
    verified
  }

  /** Candidate caps at which [[containmentFanout]] evaluates the
    * fan-out curve: a ~1.3× geometric ladder from 1 with a sentinel, so
    * any recommendation is exact at a ladder point and within ~30% of
    * the true optimum. Shared verbatim with the q233 oracle SQL — the
    * two engines must walk the SAME ladder.
    */
  val MaxDfLadder: Vector[Long] = {
    val body = Iterator.iterate(1L)(c => math.max(c + 1, c * 13 / 10))
      .takeWhile(_ <= 4000000000000L).toVector
    body :+ Long.MaxValue
  }

  /** Default candidate budget for [[containmentFanout]], in candidates
    * per document — calibrated against the measured knee curve
    * (SCALE.md §Scale knee, all points on the rotated probe corpora):
    * 166 candidates/doc ran CLEAN at every measured absolute scale
    * (sf0.1 base, and its density-preserving copies to 10×), the knee
    * surfaced at 211/doc (30×, completed with superlinear growth), and
    * 644/doc DNF'd (100×, 77 GB of spill). 192 sits between the
    * highest measured-clean density and the knee onset: a corpus under
    * it matches every shape measured safe; one over it has entered the
    * measured knee regime.
    */
  val DefaultCandidatesPerDoc: Long = 192L

  /** Driver-side fan-out diagnosis for [[containmentPairs]] — the
    * measured 100× DNF of the UNCAPPED form (SCALE.md §Scale knee:
    * candidate volume Σ_t dfPrefix(t)·df(t) went 31.6 M at 30× → 322 M
    * at 100× and filled 77 GB of spill) turned into API instead of
    * prose. Computed ANALYTICALLY from the same blocking relations the
    * operator builds (shingle dfs, rarest-first ranks, per-doc prefix
    * lengths) WITHOUT running the candidate join: the prefix(A) ⋈
    * postings(B) join emits exactly Σ_t dfPrefix(t)·df(t) rows, and
    * capping at `cap` keeps the df ≤ cap terms of that sum. Probe cost
    * is the operator's blocking stages once (two jobs, vocab-sized
    * aggregates; no candidate fan-out, no verify arrays) — safe to run
    * on a corpus whose uncapped join would DNF.
    *
    * `ladder` holds (cap, candidates-if-capped-at-cap) at the present
    * [[MaxDfLadder]] points, ascending; the last point equals
    * `uncappedCandidates`.
    */
  final case class ContainmentFanout(
      nDocs: Long,
      vocab: Long,
      maxShingleDf: Long,
      uncappedCandidates: Long,
      maxCandidatesPerDoc: Long,
      ladder: Vector[(Long, Long)]) {

    /** Total candidate budget: `maxCandidatesPerDoc · nDocs` — candidate
      * volume that grows linearly with the corpus is by construction
      * knee-free (the measured DNF regime is the SUPERLINEAR regime
      * where boilerplate dfs square into the candidate product).
      */
    def budget: Long = maxCandidatesPerDoc * math.max(nDocs, 1L)

    private def candidatesAt(cap: Long): Long =
      ladder.takeWhile(_._1 <= cap).lastOption.map(_._2).getOrElse(0L)

    /** True iff the uncapped invocation's candidate volume exceeds the
      * budget — the analytic signature of the measured DNF regime.
      */
    def uncappedHazard: Boolean = uncappedCandidates > budget

    /** Largest [[MaxDfLadder]] cap whose capped candidate volume fits
      * the budget — i.e. the MOST recall the budget buys (capping drops
      * only pairs whose every shared prefix shingle is above the cap;
      * see [[containmentPairs]]'s recall contract). `None` when the
      * uncapped run already fits: recall is then free, run exact.
      * `Some(1)` when even cap=1 exceeds the budget (best possible).
      */
    def recommendedMaxDf: Option[Long] = recommendedMaxDfFor(maxCandidatesPerDoc)

    /** [[recommendedMaxDf]] at a caller-chosen budget. */
    def recommendedMaxDfFor(budgetPerDoc: Long): Option[Long] = {
      val b = budgetPerDoc * math.max(nDocs, 1L)
      if (uncappedCandidates <= b) None
      else Some(MaxDfLadder.filter(c => candidatesAt(c) <= b)
        .lastOption.getOrElse(1L))
    }

    /** Named fail-fast for pipelines that must not enter the measured
      * DNF regime unnoticed: throws iff [[uncappedHazard]].
      */
    def requireUncappedSafe(): Unit =
      if (uncappedHazard) throw new IllegalStateException(
        s"containmentPairs uncapped-invocation hazard: the prefix(A) x postings(B) " +
          s"candidate join would emit $uncappedCandidates rows over $nDocs docs " +
          s"(> budget $budget = $maxCandidatesPerDoc/doc) — the measured DNF regime " +
          s"(SCALE.md: 322 M candidates filled 77 GB of spill at 100x). Set " +
          s"maxDf = Some(${recommendedMaxDf.getOrElse(1L)}) (this corpus's largest " +
          "budget-fitting cap) and pay the certified recall trade, or raise the budget.")
  }

  /** Compute [[ContainmentFanout]] for a [[containmentPairs]] invocation
    * with the same (shingleWidth, num, den). The default budget is
    * [[DefaultCandidatesPerDoc]] (knee-calibrated; see its doc).
    */
  def containmentFanout(df: DataFrame, idCol: String, textCol: String,
      shingleWidth: Int, num: Int, den: Int,
      maxCandidatesPerDoc: Long = DefaultCandidatesPerDoc): ContainmentFanout = {
    require(num > 0 && den >= num, s"threshold must be in (0,1]: $num/$den")
    require(maxCandidatesPerDoc >= 1, s"budget must be >= 1: $maxCandidatesPerDoc")
    val toks = df
      .select(col(idCol).as("__id"),
        explode(array_distinct(shingles(col(textCol), shingleWidth))).as("__t"))
    val dfreq = toks.groupBy("__t").agg(count(lit(1)).as("__df"))
    val ranked = dfreq.select(col("__t"), col("__df"),
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("__df"), col("__t"))).cast("long").as("__rank"))
    val sets = toks.join(ranked.select("__t", "__rank"), "__t")
      .groupBy("__id")
      .agg(sort_array(collect_list(col("__rank"))).as("__set"))
      .withColumn("__n", size(col("__set")).cast("long"))
      .withColumn("__p", expr(s"__n - ((__n * $num + $den - 1) div $den) + 1"))
    val prefixDf = sets
      .select(col("__id"), explode(expr("slice(__set, 1, CAST(__p AS INT))")).as("__k"))
      .groupBy("__k").agg(count(lit(1)).as("__pdf"))
    // every vocab token, its df, and its candidate contribution
    // dfPrefix·df (0 for tokens outside every prefix), bucketed to the
    // smallest ladder cap >= df so candidates(cap) = Σ buckets <= cap is
    // EXACT at ladder points; the collect is <= |MaxDfLadder| rows
    val ladderLit = lit(MaxDfLadder.toArray)
    val buckets = ranked
      .join(prefixDf, ranked("__rank") === prefixDf("__k"), "left")
      .select(col("__df"),
        (coalesce(col("__pdf"), lit(0L)) * col("__df")).as("__c"))
      .withColumn("__cap", array_min(filter(ladderLit, c => c >= col("__df"))))
      .groupBy("__cap")
      .agg(sum(col("__c")).as("c"), max(col("__df")).as("mx"),
        count(lit(1)).as("v"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3)))
      .sortBy(_._1)
    // participating docs = docs with >= 1 shingle = DISTINCT non-null
    // ids with non-null text (shingles of a short/empty text is the
    // text itself, never an empty array; the candidate model's unit is
    // the per-id token SET, so repeated ids are one doc, not several) —
    // an id-only distinct count instead of a second tokenize+distinct
    // pass over the corpus. count(DISTINCT) drops a null id in both
    // engines; a null-id group still contributes candidates, so on such
    // a (contract-violating) corpus the budget is conservative by one.
    val nDocs = df.where(col(textCol).isNotNull)
      .agg(count_distinct(col(idCol))).head().getLong(0)
    var cum = 0L
    val ladder = buckets.map { case (cap, c, _, _) => cum += c; (cap, cum) }.toVector
    ContainmentFanout(
      nDocs = nDocs,
      vocab = buckets.map(_._4).sum,
      maxShingleDf = if (buckets.isEmpty) 0L else buckets.map(_._3).max,
      uncappedCandidates = cum,
      maxCandidatesPerDoc = maxCandidatesPerDoc,
      ladder = ladder)
  }

  /** [[containmentPairs]] with the cap chosen FROM THE CORPUS: probes
    * the fan-out first and runs uncapped (exact) when the candidate
    * volume fits the budget, capped at [[ContainmentFanout.recommendedMaxDf]]
    * otherwise — the executable form of SCALE.md's "set maxDf to the
    * knee-side of the df distribution". Returns the pairs and the probe
    * (so callers can log what was decided and why).
    */
  def containmentPairsAdaptive(df: DataFrame, idCol: String, textCol: String,
      shingleWidth: Int, num: Int, den: Int,
      maxCandidatesPerDoc: Long = DefaultCandidatesPerDoc): (DataFrame, ContainmentFanout) = {
    val probe = containmentFanout(df, idCol, textCol, shingleWidth, num, den,
      maxCandidatesPerDoc)
    // allowUncapped here is PROBE-CERTIFIED: recommendedMaxDf = None
    // means the uncapped candidate volume fits the budget — this is the
    // auto-routed safe path the bare entry's refusal points at
    (containmentPairs(df, idCol, textCol, shingleWidth, num, den,
      probe.recommendedMaxDf, allowUncapped = true), probe)
  }

  /** PREFIX-FILTERED set-similarity self-join (AllPairs/PPJoin family,
    * Chaudhuri/Bayardo) — the DETERMINISTIC-complete counterpart of the
    * MinHash-LSH candidates: token sets sort by ascending global
    * document frequency (rarest first, ties by token), and two sets
    * with Jaccard ≥ num/den MUST share a token inside their first
    * p = n − ⌈n·num/den⌉ + 1 tokens — so blocking on prefix tokens
    * loses NOTHING (exact recall by construction, no probability
    * anywhere), while frequent tokens stay out of the block keys.
    * Verification computes exact Jaccard cross-multiplied
    * (i·(den+num) ≥ (|a|+|b|)·num ⟺ i/u ≥ num/den) inside candidate
    * pairs only.
    *
    * Shuffles: one df agg (vocab-sized), one set build, the
    * prefix-token candidate join, and the verify rejoin of sets to
    * candidate pairs — prefixes shrink as sets grow, and the rare-
    * token-first order keeps any single block key's posting list small
    * (the df-skew argument of the q85 inverted index).
    */
  def prefixJaccardPairs(df: DataFrame, idCol: String, textCol: String,
      num: Int, den: Int): DataFrame = {
    require(num > 0 && den >= num, s"threshold must be in (0,1]: $num/$den")
    val toks = df
      .select(col(idCol).as("__id"),
        explode(array_distinct(split(col(textCol), " "))).as("__t"))
    val dfreq = toks.groupBy("__t").agg(count(lit(1)).as("__df"))
    // global rarest-first total order; rank is the blocking key
    val ranked = dfreq.select(col("__t"),
      row_number().over(org.apache.spark.sql.expressions.Window
        .orderBy(col("__df"), col("__t"))).cast("long").as("__rank"))
    val sets = toks.join(ranked, "__t")
      .groupBy("__id")
      .agg(sort_array(collect_list(col("__rank"))).as("__set"))
      .withColumn("__n", size(col("__set")).cast("long"))
      .withColumn("__p", expr(
        s"__n - ((__n * $num + $den - 1) div $den) + 1"))
    val prefixes = sets
      .select(col("__id"), explode(expr("slice(__set, 1, CAST(__p AS INT))")).as("__k"))
    val cands = prefixes.select(col("__k"), col("__id").as("id_a"))
      .join(prefixes.select(col("__k"), col("__id").as("id_b")), Seq("__k"))
      .where(col("id_a") < col("id_b"))
      .select("id_a", "id_b")
      .distinct()
    cands
      .join(sets.select(col("__id").as("id_a"), col("__set").as("sa"),
        col("__n").as("na")), Seq("id_a"))
      .join(sets.select(col("__id").as("id_b"), col("__set").as("sb"),
        col("__n").as("nb")), Seq("id_b"))
      // allocation-free sorted two-pointer count (sets are sort_array'd;
      // same rationale as containmentPairs' verify — r17)
      .withColumn("i", graft.functions.exprs.sortedIntersectCount(
        col("sa"), col("sb")))
      .withColumn("u", col("na") + col("nb") - col("i"))
      .where(col("i") * (den + num) >= (col("na") + col("nb")) * num)
      .select("id_a", "id_b", "i", "u")
  }
}
