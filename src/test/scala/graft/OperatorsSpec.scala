package graft

import graft.operators._
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Specs for the pipeline operators (dedup, similarity, as-of join, text
  * analysis, multimodal plumbing) on small handcrafted inputs with
  * hand-computed expectations. The sf-scale correctness gate is the
  * DuckDB oracle (Verify + tools/check_oracle.py); these pin down operator
  * semantics at the unit level.
  */
class OperatorsSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  // ------------------------------------------------------------- dedup

  test("Dedup.exact keeps one min-id representative per identical key") {
    val df = Seq((1L, "x"), (2L, "x"), (3L, "y")).toDF("id", "t")
    val out = Dedup.exact(df, "id", Seq("t")).as[Long].collect().sorted
    assert(out.toSeq == Seq(1L, 3L))
  }

  test("Dedup.tokenSet collapses same token set regardless of order/dups") {
    val df = Seq((1L, "a b c"), (2L, "c b a a"), (3L, "a b d")).toDF("id", "t")
    val out = Dedup.tokenSet(df, "id", "t")
      .orderBy("id").as[(Long, Long)].collect()
    assert(out.toSeq == Seq((1L, 2L), (3L, 1L)))
  }

  test("Dedup.minHashPairs finds near-duplicates, skips distinct docs") {
    val base = (1 to 40).map(i => s"tok$i").mkString(" ")
    val near = (1 to 39).map(i => s"tok$i").mkString(" ") + " tokX"
    val far = (100 to 140).map(i => s"other$i").mkString(" ")
    val df = Seq((1L, base), (2L, near), (3L, far), (4L, base)).toDF("id", "t")
    val pairs = Dedup.minHashPairs(df, "id", "t",
      numHashes = 64, bands = 16, shingleWidth = 3, threshold = 0.5)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 4L))) // identical -> jaccard 1
    assert(pairs.contains((1L, 2L)) || pairs.contains((2L, 4L))) // near-dup
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L)) // disjoint doc
  }

  test("Dedup.simHashPairs: identical docs at distance 0, disjoint docs absent") {
    val a = (1 to 30).map(i => s"w$i").mkString(" ")
    val b = (100 to 130).map(i => s"v$i").mkString(" ")
    val df = Seq((1L, a), (2L, a), (3L, b)).toDF("id", "t")
    val pairs = Dedup.simHashPairs(df, "id", "t", maxDist = 3)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)))
    assert(!pairs.exists(p => p._1 == 3L || p._2 == 3L))
  }

  test("Dedup.embeddingNearDupPairs: parallel vectors match, orthogonal don't") {
    val e1 = Array.tabulate(8)(i => if (i == 0) 1.0f else 0.0f)
    val e2 = Array.tabulate(8)(i => if (i == 0) 2.0f else 0.0f) // same direction
    val e3 = Array.tabulate(8)(i => if (i == 7) 1.0f else 0.0f) // orthogonal
    val df = Seq((1L, e1.toSeq), (2L, e2.toSeq), (3L, e3.toSeq)).toDF("id", "v")
    val pairs = Dedup.embeddingNearDupPairs(df, "id", "v", dim = 8,
      planes = 8, minCosine = 0.99)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs == Set((1L, 2L)))
  }

  // -------------------------------------------------------- similarity

  test("Similarity.bruteForceTopK ranks by cosine") {
    val q = Seq((0L, Seq(1.0f, 0.0f))).toDF("id", "v")
    val corpus = Seq(
      (0L, Seq(1.0f, 0.0f)),
      (1L, Seq(0.9f, 0.1f)),
      (2L, Seq(0.5f, 0.5f)),
      (3L, Seq(0.0f, 1.0f))).toDF("id", "v")
    val out = Similarity.bruteForceTopK(q, corpus, "id", "id", "v", k = 2)
      .orderBy("rank").as[(Long, Long, Long)].collect()
    assert(out.toSeq == Seq((0L, 1L, 1L), (0L, 2L, 2L)))
  }

  test("Similarity.ivfTopK matches brute force when probing all cells") {
    val rnd = new scala.util.Random(5)
    val corpus = (0L until 64L).map(i =>
      (i, Seq.fill(8)(rnd.nextGaussian().toFloat))).toDF("id", "v")
    val queries = corpus.where(col("id") < 4)
    val brute = Similarity.bruteForceTopK(queries, corpus, "id", "id", "v", k = 3)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val ivf = Similarity.ivfTopK(queries, corpus, "id", "id", "v", k = 3,
      nlist = 4, nprobe = 4) // nprobe = nlist -> exhaustive, must equal brute
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(ivf == brute)
  }

  test("IVF with k-means training finds cluster neighbors at nprobe=1") {
    // 4 well-separated direction clusters; a query probing ONE cell must
    // still retrieve neighbors from its own cluster
    val rnd = new scala.util.Random(11)
    def cluster(base: Int, n: Int, offset: Long) = (0 until n).map { i =>
      val v = Array.fill(8)(rnd.nextGaussian().toFloat * 0.05f)
      v(base) = 1.0f
      (offset + i, v.toSeq)
    }
    val corpus = (cluster(0, 16, 0L) ++ cluster(2, 16, 100L) ++
      cluster(4, 16, 200L) ++ cluster(6, 16, 300L)).toDF("id", "v")
    val queries = corpus.where(col("id").isin(0L, 100L, 200L, 300L))
    val out = Similarity.ivfTopK(queries, corpus, "id", "id", "v",
      k = 3, nlist = 4, nprobe = 1, trainIters = 3)
      .collect().map(r => (r.getLong(0), r.getLong(2)))
    // every returned neighbor comes from the query's own 100-block
    assert(out.nonEmpty && out.forall { case (q, n) => (n / 100) == (q / 100) })
    // and each query got a full k=3 result
    assert(out.groupBy(_._1).forall(_._2.length == 3))
  }

  // -------------------------------------------------------- as-of join

  test("AsOfJoin attaches greatest right ts <= left ts per key") {
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (1L, 10L, ts("2024-01-05 00:00:00")),
      (2L, 10L, ts("2024-01-01 00:00:00")), // before any right row
      (3L, 20L, ts("2024-06-01 12:00:00"))).toDF("eid", "k", "ts")
    val right = Seq(
      (10L, ts("2024-01-02 00:00:00"), 100L),
      (10L, ts("2024-01-04 00:00:00"), 101L),
      (10L, ts("2024-01-04 00:00:00"), 102L), // tie -> greater tieBreak wins
      (10L, ts("2024-01-06 00:00:00"), 103L), // after left ts 1 -> ignored
      (20L, ts("2024-06-01 12:00:00"), 200L)).toDF("k", "rts", "oid")
    val out = AsOfJoin(left, right, "k", "ts", "k", "rts",
      tieBreak = "oid", payloadCols = Seq("oid"))
      .select("eid", "oid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(out == Set((1L, 102L), (2L, -1L), (3L, 200L)))
  }

  test("AsOfJoin: null timestamps never match (right filtered, left no-match)") {
    def ts(s: String) = Timestamp.valueOf(s)
    // regression: a null right ts sorted FIRST under the ascending
    // backward window (Spark asc = nulls first) and masqueraded as the
    // "earliest" right row, matching left rows that have no true match
    val left = Seq(
      (1L, 10L, ts("2024-01-01 00:00:00")), // before any REAL right row
      (2L, 10L, null.asInstanceOf[Timestamp])). // null left ts: no position
      toDF("eid", "k", "ts")
    val right = Seq(
      (10L, null.asInstanceOf[Timestamp], 666L), // must never attach
      (10L, ts("2024-01-05 00:00:00"), 100L)).toDF("k", "rts", "oid")
    for (dir <- Seq("backward", "forward")) {
      val out = AsOfJoin(left, right, "k", "ts", "k", "rts",
        tieBreak = "oid", payloadCols = Seq("oid"), direction = dir)
        .select("eid", "oid").collect()
        .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
      val expect1 = if (dir == "backward") -1L else 100L
      assert(out == Set((1L, expect1), (2L, -1L)),
        s"direction=$dir: null-ts rows must not fabricate matches, got $out")
    }
  }

  test("AsOfJoin forward attaches smallest right ts >= left ts per key") {
    def ts(s: String) = Timestamp.valueOf(s)
    val left = Seq(
      (1L, 10L, ts("2024-01-03 00:00:00")),
      (2L, 10L, ts("2024-01-07 00:00:00")), // after any right row
      (3L, 20L, ts("2024-06-01 12:00:00"))).toDF("eid", "k", "ts")
    val right = Seq(
      (10L, ts("2024-01-02 00:00:00"), 100L), // before left ts 1 -> ignored
      (10L, ts("2024-01-04 00:00:00"), 101L),
      (10L, ts("2024-01-04 00:00:00"), 102L), // tie -> SMALLER tieBreak wins
      (10L, ts("2024-01-06 00:00:00"), 103L),
      (20L, ts("2024-06-01 12:00:00"), 200L)).toDF("k", "rts", "oid") // equal ts matches
    val out = AsOfJoin(left, right, "k", "ts", "k", "rts",
      tieBreak = "oid", payloadCols = Seq("oid"), direction = "forward")
      .select("eid", "oid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toSet
    assert(out == Set((1L, 101L), (2L, -1L), (3L, 200L)))
  }

  test("AsOfJoin forward/backward agree with a brute-force model on random data") {
    val rnd = new scala.util.Random(7)
    val left = (1L to 60L).map(i => (i, rnd.nextInt(4).toLong,
      new Timestamp(86400000L + rnd.nextInt(1000) * 1000L)))
    val right = (1L to 80L).map(i => (rnd.nextInt(4).toLong,
      new Timestamp(86400000L + rnd.nextInt(1000) * 1000L), i))
    val lDf = left.toDF("eid", "k", "ts")
    val rDf = right.toDF("k", "rts", "oid")
    def run(dir: String) = AsOfJoin(lDf, rDf, "k", "ts", "k", "rts",
      tieBreak = "oid", payloadCols = Seq("oid"), direction = dir)
      .select("eid", "oid").collect()
      .map(r => (r.getLong(0), if (r.isNullAt(1)) -1L else r.getLong(1))).toMap
    val fwd = run("forward"); val bwd = run("backward")
    left.foreach { case (eid, k, t) =>
      val cands = right.filter(_._1 == k)
      val fModel = cands.filter(!_._2.before(t))
        .sortBy(c => (c._2.getTime, c._3)).headOption.map(_._3).getOrElse(-1L)
      val bModel = cands.filter(!_._2.after(t))
        .sortBy(c => (-c._2.getTime, -c._3)).headOption.map(_._3).getOrElse(-1L)
      assert(fwd(eid) == fModel, s"forward mismatch for eid=$eid")
      assert(bwd(eid) == bModel, s"backward mismatch for eid=$eid")
    }
  }

  // ------------------------------------------- native session_window

  test("session_window merges INCLUSIVELY at the exact gap boundary") {
    // load-bearing for q125's oracle: the corpus has µs-random
    // timestamps, so the gate data can never contain an exact-gap pair
    // — this pins the boundary the oracle's `diff > gap` rule assumes.
    val day = 86_400_000L
    val df = Seq(
      (1L, new Timestamp(day)),
      (1L, new Timestamp(day + 30 * 60_000L)),     // exactly gap later
      (2L, new Timestamp(day)),
      (2L, new Timestamp(day + 30 * 60_000L + 1))  // 1 ms past the gap
    ).toDF("user_id", "ts")
    val sessions = df
      .groupBy(session_window(col("ts"), "30 minutes"), col("user_id"))
      .agg(count(lit(1)).as("n"))
      .select("user_id", "n").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSeq
      .groupBy(_._1).view.mapValues(_.map(_._2).sorted).toMap
    assert(sessions(1L) == Seq(2L), "exact-gap pair must MERGE (inclusive)")
    assert(sessions(2L) == Seq(1L, 1L), "past-gap pair must split")
  }

  // ------------------------------------------------------ text analysis

  test("TextAnalysis token count / mean length / stopword ratio") {
    val df = Seq(Tuple1("the cat sat on the mat")).toDF("t")
    val r = df.select(
      TextAnalysis.tokenCount(col("t")).as("n"),
      TextAnalysis.meanTokenLen(col("t")).as("m"),
      TextAnalysis.stopwordRatio(col("t")).as("s")).head()
    assert(r.getLong(0) == 6L)
    assert(math.abs(r.getDouble(1) - 17.0 / 6.0) < 1e-12)
    assert(math.abs(r.getDouble(2) - 2.0 / 6.0) < 1e-12) // "the" twice
    // DOCUMENTED adjacent-repeat convention pinned (see the
    // wordOccurrences scaladoc): the non-overlapping replace counts
    // ceil(n/2) of an n-long repeat run — the exact alternatives were
    // measured and rejected (interpreted HOF +50%, space-doubling
    // 0.8 -> 2.9 s on the confusion queries); this pin is the record
    // that the undercount is deliberate, engine-paired behavior
    val rep = Seq(Tuple1("the the the"), Tuple1("the the"), Tuple1("the"))
      .toDF("t")
      .select(TextAnalysis.wordOccurrences(col("t"), "the").as("n"))
      .as[Long].collect().toSeq
    assert(rep == Seq(2L, 1L, 1L), s"adjacent-repeat convention drifted: $rep")
    // null text has no language — the CASE chain used to fall through
    // its ELSE and classify a null document as the last-listed language
    val nullLang = Seq(Tuple1(null: String)).toDF("t")
      .select(TextAnalysis.langId(col("t"))).head()
    assert(nullLang.isNullAt(0), "langId(null) must be null, not 'zh'")
  }

  test("winnowing guarantee: a shared span of w+k-1 chars yields a shared fingerprint") {
    // k=8, w=16: any shared substring of length >= 23 contains a full
    // window of gram hashes, and min-selection is position-independent
    // — so the pair MUST share that window's minimum (SIGMOD'03 §2).
    val rnd = new scala.util.Random(7)
    def randStr(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val span = randStr(23)
    val docs = Seq(
      (1L, randStr(40) + span + randStr(40)),   // span at different offsets
      (2L, randStr(7) + span + randStr(90)),
      (3L, randStr(80)), (4L, randStr(80))      // unrelated noise docs
    ).toDF("id", "t")
    val pairs = graft.operators.Dedup
      .winnowingPairs(docs, "id", "t", minShared = 1)
      .select("id_a", "id_b").as[(Long, Long)].collect().toSet
    assert(pairs.contains((1L, 2L)),
      "planted 23-char shared span must produce a shared fingerprint")
    // fuzz: 50 random corpora, the planted pair is ALWAYS found
    for (trial <- 1 to 50) {
      val sp = randStr(23)
      val d = Seq(
        (1L, randStr(rnd.nextInt(60)) + sp + randStr(rnd.nextInt(60))),
        (2L, randStr(rnd.nextInt(60)) + sp + randStr(rnd.nextInt(60)))
      ).toDF("id", "t")
      val p = graft.operators.Dedup.winnowingPairs(d, "id", "t", minShared = 1)
        .select("id_a", "id_b").as[(Long, Long)].collect().toSet
      assert(p.contains((1L, 2L)), s"trial $trial lost the planted span")
    }
  }

  test("native winnowing minima match the HOF formulation incl. multibyte/short/empty") {
    val rnd = new scala.util.Random(11)
    def randAscii(n: Int) = (1 to n).map(_ => ('a' + rnd.nextInt(26)).toChar).mkString
    val cases = Seq(
      "", "x", "shorter", "exactly8", randAscii(23), randAscii(100),
      randAscii(500),
      "日本語のテキストです、これは複数バイト文字の列",  // 3-byte CJK
      "mixed 日本語 and ascii with 🚀 astral 🎯 chars",   // 4-byte astral
      "aaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaaa"             // all-equal hashes (tie storm)
    ) ++ (1 to 20).map(_ => randAscii(1 + rnd.nextInt(200)))
    val df = cases.zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "t")
    for ((k, w) <- Seq((8, 16), (3, 4), (1, 1), (5, 30))) {
      val got = df.select(col("id"),
        graft.functions.exprs.winnowingMinima(col("t"), k, w,
          graft.operators.TextAnalysis.FingerprintMod).as("m"))
        .as[(Long, Seq[Long])].collect().toMap
      val want = df.select(col("id"),
        graft.operators.Dedup.winnowingMinimaHof(col("t"), k, w).as("m"))
        .as[(Long, Seq[Long])].collect().toMap
      assert(got == want, s"native/HOF divergence at k=$k w=$w")
    }
  }

  test("native hash expressions: NULL elements skip, never hash as the seed constant") {
    // Spark's hash of a NULL value is the SEED (42), so hashing a null
    // array slot would make every null a phantom shared shingle / a
    // constant simhash vote. The expressions now skip nulls — the HOF
    // forms' semantics (null maps through pmod(xxhash64) to null, which
    // array_min / sum ignore). Pinned: null-bearing array == the same
    // array with nulls removed, for both signatures.
    val df = Seq(
      (1L, Seq[String]("alpha", null, "beta", null)),
      (2L, Seq[String]("alpha", "beta"))
    ).toDF("id", "toks")
    val coeffs = (1 to 4).map(i => (i.toLong * 2 + 1, i.toLong * 7 + 3))
    val sigs = df.select(col("id"),
      graft.functions.exprs.minhashSig(col("toks"), coeffs, 2038074743L).as("sig"),
      graft.functions.exprs.simhash64(col("toks")).as("sim"))
      .as[(Long, Seq[Long], Long)].collect().map(r => r._1 -> (r._2, r._3)).toMap
    assert(sigs(1L) == sigs(2L),
      "null elements must contribute nothing to minhash/simhash")
    // dot: a NULL element yields NaN (routes into the similarity NaN
    // guards), never a silent 0.0 term
    val vecs = Seq((Seq[java.lang.Float](1.0f, null, 3.0f), Seq[java.lang.Float](1.0f, 2.0f, 3.0f)))
      .toDF("a", "b")
    val d = vecs.select(graft.functions.exprs.dotProduct(col("a"), col("b")))
      .as[Double].head()
    assert(d.isNaN, s"null element must yield NaN, got $d")
    // constructor fail-fasts (the WordShingles convention)
    intercept[IllegalArgumentException](
      graft.functions.exprs.winnowingMinima(col("t"), 0, 4, 97L))
    intercept[IllegalArgumentException](
      graft.functions.exprs.winnowingMinima(col("t"), 8, 0, 97L))
    intercept[IllegalArgumentException](
      graft.functions.exprs.winnowingMinima(col("t"), 8, 4, (1L << 42) + 1))
    intercept[IllegalArgumentException](
      graft.functions.exprs.rollingFingerprint(col("t"), 1L))
    intercept[IllegalArgumentException](
      graft.functions.exprs.minhashBandKeys(col("s"), 0))
  }

  test("winnowing density: fingerprints are a subset of gram hashes, bounded by windows") {
    val df = Seq((1L, "x" * 5), (2L, ('a' to 'z').mkString * 10)).toDF("id", "t")
    val fps = graft.operators.Dedup.winnowingFingerprints(df, "id", "t")
      .groupBy("id").agg(count(lit(1)).as("n")).as[(Long, Long)].collect().toMap
    // doc 1: shorter than k -> one whole-text gram, exactly one fp
    assert(fps(1L) == 1L)
    // doc 2: 260 chars -> 253 grams, 238 windows; distinct minima in
    // [1, 238], and the 26-char period makes most windows repeat
    assert(fps(2L) >= 1L && fps(2L) <= 238L)
    // maxDf prune: a fp present in 3 docs is dropped at maxDf=2
    val tri = Seq((1L, "z" * 30), (2L, "z" * 30), (3L, "z" * 30)).toDF("id", "t")
    assert(graft.operators.Dedup.winnowingPairs(tri, "id", "t", maxDf = 2,
      minShared = 1).count() == 0)
    assert(graft.operators.Dedup.winnowingPairs(tri, "id", "t", maxDf = 3,
      minShared = 1).count() == 3)
  }

  test("TextAnalysis.spanCorrupt: lossless round-trip, sentinel structure, determinism") {
    import graft.operators.TextAnalysis
    val docs = Seq(
      (1L, "a b c d e f g h i j k l m"),
      (2L, "x"),
      (3L, (1 to 40).map(i => s"t$i").mkString(" "))).toDF("doc_id", "text")
    val out = TextAnalysis.spanCorrupt(docs, "doc_id", "text",
      spanWidth = 3, maskOneIn = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4))).toMap
    val orig = docs.collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    for ((id, (input, target, nTok, nMask)) <- out) {
      assert(nTok == orig(id).split(" ").length.toLong)
      // n_masked = tokens reachable from target (strip sentinels)
      val targetToks = target.split(" ").filterNot(_.startsWith("<extra_"))
      assert(targetToks.count(_.nonEmpty).toLong == nMask)
      // round-trip: substitute each target span back at its sentinel
      val spans = "<extra_(\\d+)> ((?:(?!<extra_)\\S+ ?)*)".r
        .findAllMatchIn(target)
        .map(m => m.group(1).toInt -> m.group(2).trim).toMap
      val rebuilt = input.split(" ").flatMap { t =>
        if (t.startsWith("<extra_"))
          spans(t.stripPrefix("<extra_").stripSuffix(">").toInt).split(" ")
        else Array(t)
      }.mkString(" ")
      assert(rebuilt == orig(id), s"doc $id round-trip")
    }
    // maskOneIn = 2 actually masks something across 3 docs
    assert(out.values.map(_._4).sum > 0)
    // map-only determinism under repartition
    val again = TextAnalysis.spanCorrupt(docs.repartition(5), "doc_id",
      "text", spanWidth = 3, maskOneIn = 2)
      .collect().map(r => r.getLong(0) ->
        (r.getString(1), r.getString(2), r.getLong(3), r.getLong(4))).toMap
    assert(again == out)
  }

  test("TextAnalysis.unigramDrift: exact TV arithmetic, single-group zero") {
    import graft.operators.TextAnalysis
    val docs = Seq(("g1", "a a b"), ("g2", "b c")).toDF("src", "text")
    val out = TextAnalysis.unigramDrift(docs, "src", "text")
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4))).toMap
    // hand-computed: t_all = 5; g1 (a:2 b:1, t=3): |2*5-2*3|+|1*5-2*3| = 5,
    // present 4, missing 3*(5-4) = 3 -> 8; g2 (b:1 c:1, t=2):
    // |1*5-2*2|+|1*5-1*2| = 4, present 3, missing 2*(5-3) = 4 -> 8
    assert(out("g1") == (8L, 3L, 5L, (500L * 8) / (3 * 5)))
    assert(out("g2") == (8L, 2L, 5L, (500L * 8) / (2 * 5)))
    // a lone group IS the blend: drift is exactly zero
    val solo = TextAnalysis.unigramDrift(
      Seq(("g", "p q r p")).toDF("src", "text"), "src", "text").collect()
    assert(solo.length == 1 && solo(0).getLong(1) == 0L &&
      solo(0).getLong(4) == 0L)
  }

  test("bookkeeping-column collisions fail by name, never silently drop data") {
    // withColumn REPLACES a same-named caller column and the trailing
    // drop() then deletes the caller's DATA column from the output —
    // the Merge/AsOfJoin guard discipline, extended to the operators
    // that were still silently vulnerable
    val iv = Seq((1L, 2L, 5L)).toDF("id", "s", "__bin")
    val e1 = intercept[IllegalArgumentException] {
      IntervalJoin.overlapJoin(iv, iv.withColumnRenamed("__bin", "e"),
        col("s"), col("s"), col("s"), col("e"), binWidth = 10L)
    }
    assert(e1.getMessage.contains("__bin"))
    val sk = Seq((1L, 2L)).toDF("k", "__salt")
    val e2 = intercept[IllegalArgumentException] {
      Skew.saltedJoin(sk, Seq((1L, "x")).toDF("dk", "name"),
        "k", "dk", col("k"), buckets = 4)
    }
    assert(e2.getMessage.contains("__salt"))
    val e3 = intercept[IllegalArgumentException] {
      Skew.saltedAggregate(sk, Seq("k"), col("k"), buckets = 4,
        Seq(("n", "count", col("k"))))
    }
    assert(e3.getMessage.contains("__salt"))
    // Compaction: a __grp data column in the partitioned input would be
    // replaced by the grouping key — a layout rewrite that ALTERED the
    // relation. Flat inputs never add __grp (coalesce path, no guard).
    val dir = java.nio.file.Files.createTempDirectory("graft-compact-clash").toString
    Seq((1L, "a", 2L)).toDF("id", "part", "__grp")
      .write.mode("overwrite").partitionBy("part").parquet(s"$dir/in")
    val e4 = intercept[IllegalArgumentException] {
      Compaction.compactParquet(spark, s"$dir/in", s"$dir/out", 1L << 20)
    }
    assert(e4.getMessage.contains("__grp"))
    // ZOrder bookkeeping and hashSplit's output column, same discipline
    val zc = Seq((1L, 2L)).toDF("k", "__zb")
    val e5 = intercept[IllegalArgumentException] {
      graft.core.ZOrder.writeZOrdered(zc, s"$dir/z", Seq("k"), numFiles = 2)
    }
    assert(e5.getMessage.contains("__zb"))
    val e6 = intercept[IllegalArgumentException] {
      Sampling.hashSplit(Seq((1L, "old")).toDF("id", "split"), "id",
        Seq("train" -> 0.8, "val" -> 0.2))
    }
    assert(e6.getMessage.contains("split"))
  }

  test("IntervalJoin.overlapJoin: fuzz vs brute force, duplicate-free, bin widths") {
    import graft.operators.IntervalJoin
    val rnd = new scala.util.Random(42)
    val aIv = (1L to 60L).map(i =>
      { val s = rnd.nextInt(1000).toLong; (i, s, s + rnd.nextInt(90)) })
    val bIv = (1L to 60L).map(i =>
      { val s = rnd.nextInt(1000).toLong; (i, s, s + rnd.nextInt(90)) })
    val a = aIv.toDF("a_id", "s_a", "e_a")
    val b = bIv.toDF("b_id", "s_b", "e_b")
    val expected = (for {
      (ai, as_, ae) <- aIv; (bi, bs, be) <- bIv
      if as_ <= be && bs <= ae
    } yield (ai, bi)).toSet
    for (w <- Seq(1L, 7L, 64L, 4096L)) {
      val got = IntervalJoin.overlapJoin(a, b,
          col("s_a"), col("e_a"), col("s_b"), col("e_b"), binWidth = w)
        .select("a_id", "b_id").collect().map(r => (r.getLong(0), r.getLong(1)))
      // duplicate-free WITHOUT distinct: list size == set size
      assert(got.length == got.toSet.size, s"dupes at binWidth=$w")
      assert(got.toSet == expected, s"mismatch at binWidth=$w")
    }
    // touching endpoints overlap (closed intervals)
    val t1 = Seq((1L, 0L, 10L)).toDF("a_id", "s_a", "e_a")
    val t2 = Seq((2L, 10L, 20L)).toDF("b_id", "s_b", "e_b")
    assert(IntervalJoin.overlapJoin(t1, t2, col("s_a"), col("e_a"),
      col("s_b"), col("e_b"), binWidth = 8L).count() == 1)
  }

  test("IntervalJoin.overlapJoin: contract violations fail fast, not silently") {
    import graft.operators.IntervalJoin
    val good = Seq((1L, 0L, 100L)).toDF("b_id", "s_b", "e_b")
    // inverted/negative bounds previously corrupted results SILENTLY:
    // inverted emitted pairs for an EMPTY interval (descending sequence
    // bins), negative broke the div-floor counting-cell dedup
    val cases = Seq(
      ("inverted", Seq((1L, Option(10L), Option(5L)))),
      ("negative", Seq((1L, Option(-3L), Option(10L)))))
    for ((label, rows) <- cases) {
      val bad = rows.toDF("a_id", "s_a", "e_a")
      val e = intercept[Exception] {
        IntervalJoin.overlapJoin(bad, good, col("s_a"), col("e_a"),
          col("s_b"), col("e_b"), binWidth = 8L).count()
      }
      assert(SharedSpark.messages(e).exists(_.contains("IntervalJoin.overlapJoin")),
        s"$label: expected the named guard error, got $e")
    }
    // null bounds follow SQL join semantics: match nothing, no error —
    // INCLUDING a negative bound paired with a null bound on the same
    // side (the documented guard-scope edge: Catalyst's inferred
    // isnotnull filters prune the row below the guarded CASE, so it
    // drops under null semantics rather than raising; this pins the
    // scaladoc's "guard applies to rows with BOTH bounds non-null")
    val nulls = Seq((1L, Option.empty[Long], Option(10L)),
      (2L, Option(0L), Option.empty[Long]),
      (3L, Option(-3L), Option.empty[Long]),
      (4L, Option.empty[Long], Option(-7L))).toDF("a_id", "s_a", "e_a")
    assert(IntervalJoin.overlapJoin(nulls, good, col("s_a"), col("e_a"),
      col("s_b"), col("e_b"), binWidth = 8L).count() == 0)
    // untouched valid rows still join (the guard is per-row, not per-run)
    val ok = Seq((7L, 20L, 30L)).toDF("a_id", "s_a", "e_a")
    assert(IntervalJoin.overlapJoin(ok, good, col("s_a"), col("e_a"),
      col("s_b"), col("e_b"), binWidth = 8L).count() == 1)
  }

  test("TextAnalysis.vocabEncode: rank order, position order, determinism") {
    import graft.operators.TextAnalysis
    // counts: b=4, a=3, c=1 -> ids b=0, a=1, c=2; ties broken by token
    val docs = Seq((1L, "a b b"), (2L, "b a c b a")).toDF("doc_id", "text")
    val out = TextAnalysis.vocabEncode(docs, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(out(1L) == (3L, "1 0 0"))
    assert(out(2L) == (5L, "0 1 2 0 1"))
    // tie on count -> lexicographic token order pins ids
    val ties = Seq((1L, "z y x")).toDF("doc_id", "text")
    val t = TextAnalysis.vocabEncode(ties, "doc_id", "text").collect()(0)
    assert(t.getString(2) == "2 1 0")
    // partition-layout independence
    val again = TextAnalysis.vocabEncode(docs.repartition(7), "doc_id", "text")
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2))).toMap
    assert(again == out)
  }

  test("Similarity.sparseCosinePairs: exact arithmetic, df cap, full-vector verify") {
    import graft.operators.Similarity
    // docs 1/2 share rare token "q" (df 2); doc 3 shares only the
    // ubiquitous "x" (df 3 > maxDf 2) with them -> no candidate
    val docs = Seq(
      (1L, "x x q a"), (2L, "x q a"), (3L, "x b")).toDF("id", "t")
    val out = Similarity.sparseCosinePairs(docs, "id", "t",
      maxDf = 2, minCos2Permille = 0)
      .collect().map(r => (r.getLong(0), r.getLong(1)) ->
        (r.getLong(2), r.getLong(3), r.getLong(4), r.getLong(5))).toMap
    // dot over FULL vectors: 2*1 (x) + 1*1 (q) + 1*1 (a) = 4;
    // n2_1 = 4+1+1 = 6, n2_2 = 3; cos2 permille = 16000/18 = 888
    assert(out.keySet == Set((1L, 2L)))
    assert(out((1L, 2L)) == (4L, 6L, 3L, 888L))
    // threshold prunes: 889 permille excludes the pair, 888 keeps it
    assert(Similarity.sparseCosinePairs(docs, "id", "t", 2, 889).count() == 0)
    assert(Similarity.sparseCosinePairs(docs, "id", "t", 2, 888).count() == 1)
    // a pair sharing TWO rare tokens is still one output row
    val two = Seq((1L, "q r"), (2L, "q r")).toDF("id", "t")
    val p2 = Similarity.sparseCosinePairs(two, "id", "t", 2, 900).collect()
    assert(p2.length == 1 && p2(0).getLong(2) == 2L &&
      p2(0).getLong(5) == 1000L)
  }

  test("Merge.upsertLatest: value-ordered survivor is batch-order independent") {
    import graft.operators.Merge
    val snap = Seq((1L, 10L, 5L)).toDF("k", "ord", "v")
    val b1 = Seq((1L, 20L, 7L), (2L, 5L, 1L)).toDF("k", "ord", "v")
    val b2 = Seq((1L, 15L, 6L), (2L, 8L, 2L)).toDF("k", "ord", "v")
    def run(batches: Seq[org.apache.spark.sql.DataFrame]) =
      batches.foldLeft(snap) { (st, b) =>
        Merge.upsertLatest(st, b, Seq("k"), Seq(col("ord").desc))
      }.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    val expect = Set((1L, 20L, 7L), (2L, 8L, 2L))
    assert(run(Seq(b1, b2)) == expect)
    // REVERSED batch order: same state — the property upsert (which
    // gives the last-applied change priority) cannot provide
    assert(run(Seq(b2, b1)) == expect)
    val viaPrio = Seq(b2, b1).foldLeft(snap) { (st, b) =>
      Merge.upsert(st, b.withColumn("op", lit("U")), Seq("k"))
    }.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    assert(viaPrio != expect, "prio-based upsert is batch-order dependent here")
  }

  test("Sampling.temperatureSample: sqrt flattening, exact quotas, layout independence") {
    import graft.operators.Sampling
    // 900 "en" + 100 "de": raw shares 90/10; sqrt shares 30/10 -> de
    // gets 25% of the budget instead of 10%
    val docs = ((1L to 900L).map(i => (i, "en")) ++
      (1001L to 1100L).map(i => (i, "de"))).toDF("id", "lang")
    val out = Sampling.temperatureSample(docs, "lang", "id", budgetDiv = 10L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byLang = out.groupBy(_._2).view.mapValues(_.length).toMap
    // budget = 100; isq: en 30, de 10; quotas: 100*30/40 = 75, 100*10/40 = 25
    assert(byLang == Map("en" -> 75, "de" -> 25))
    // ranks are exactly 1..quota per stratum
    assert(out.filter(_._2 == "de").map(_._3).sorted.toSeq == (1L to 25L))
    // same winners under adversarial repartition
    val again = Sampling.temperatureSample(docs.repartition(13, col("id")),
      "lang", "id", budgetDiv = 10L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(again.toSet == out.toSet)
  }

  test("TableDiff.diff: only_a / only_b / changed, unchanged absent, null-safe") {
    import graft.operators.TableDiff
    val a = Seq((1L, "x", 5L), (2L, "y", 6L), (3L, "z", 7L),
      (4L, null.asInstanceOf[String], 8L)).toDF("k", "s", "v")
    val b = Seq((2L, "y", 6L), (3L, "z", 9L), (5L, "w", 1L),
      (4L, null.asInstanceOf[String], 8L)).toDF("k", "s", "v")
    val out = TableDiff.diff(a, b, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    // 2 unchanged, 4 unchanged (null content equal on both sides)
    assert(out == Map(1L -> "only_a", 3L -> "changed", 5L -> "only_b"))
    // schema mismatch rejected
    intercept[IllegalArgumentException] {
      TableDiff.diff(a, b.withColumnRenamed("v", "w"), Seq("k"))
    }
  }

  test("q194 cogroup convert: duplicate click timestamps equal to prev don't count") {
    import org.apache.spark.sql.functions._
    // regression: binarySearch on a duplicated key returns an ARBITRARY
    // matching index, so with two clicks at exactly prev the old code
    // could count a click == prev as "strictly after prev". Constructed
    // tape: user 1 has clicks [T, T] and purchases [T, T+10s]. Purchase
    // @T: no click strictly BEFORE T (the window is (prev, ts), both
    // strict). Purchase @T+10: no click strictly inside (T, T+10) —
    // both clicks sit exactly at T. n_converted must be 0.
    val dir = java.nio.file.Files.createTempDirectory("graft-q194").toString
    def ts(sec: Long) = new java.sql.Timestamp(86400000L + sec * 1000L)
    val events = Seq(
      (1L, ts(100), 1L, "click", 0.0, "{}"),
      (2L, ts(100), 1L, "click", 0.0, "{}"),
      (3L, ts(100), 1L, "purchase", 0.0, "{}"),
      (4L, ts(110), 1L, "purchase", 0.0, "{}"))
      .toDF("event_id", "ts", "user_id", "event_type", "value", "props")
    events.write.mode("overwrite").parquet(s"$dir/events.parquet")
    val out = Queries.q194_cogroup_convert(spark, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
    // purchase@100: clicks strictly inside (-inf, 100) — none at T=100
    // itself? The click at 100 is NOT < 100, so not converted. purchase
    // @110: clicks strictly inside (100, 110) — none (both clicks == 100).
    assert(out == Set((1L, 2L, 0L)),
      s"clicks at exactly prev must not convert, got $out")
  }

  test("TableDiff.diff: null-shifted rows are CHANGED, not hash-collided") {
    import graft.operators.TableDiff
    // Spark's XxHash64 skips null inputs, so before the isnull-marker
    // interleave, ('x', null) and (null, 'x') both hashed to hash('x')
    // and a real change was silently reported as unchanged. Same for a
    // value moving between two string columns with the other null.
    val a = Seq((1L, "x", null.asInstanceOf[String]),
      (2L, "p", null.asInstanceOf[String])).toDF("k", "c1", "c2")
    val b = Seq((1L, null.asInstanceOf[String], "x"),
      (2L, "p", null.asInstanceOf[String])).toDF("k", "c1", "c2")
    val out = TableDiff.diff(a, b, Seq("k"))
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(out == Map(1L -> "changed"),
      s"null-shift must surface as changed (k=2 stays unchanged): $out")
  }

  test("Validate: every constraint class counts its violations exactly") {
    import graft.operators.Validate
    import graft.operators.Validate._
    val df = Seq(
      (1L, Some(5L), "a"), (2L, Some(-1L), "b"), (2L, Some(7L), null),
      (3L, None, "c"), (9L, Some(3L), "d")).toDF("k", "v", "s")
    val ref = Seq(1L, 2L, 3L).toDF("rk")
    val out = Validate.validate(df, Seq(
      NotNull("s"),                                  // 1 null
      Check("v_pos", col("v") > 0),                  // -1 fails, null v fails
      Unique(Seq("k")),                              // k=2 twice -> 1 extra
      ForeignKey("k", ref, "rk")))                   // k=9 dangling
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(out == Map(
      "not_null(s)" -> 1L, "v_pos" -> 2L,
      "unique(k)" -> 1L, "fk(k)" -> 1L))
    // all-clean table: every declared constraint still emits a zero row
    val clean = Validate.validate(
      Seq((1L, Some(1L), "x")).toDF("k", "v", "s"),
      Seq(NotNull("s"), Unique(Seq("k")), ForeignKey("k", ref, "rk")))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(clean.values.forall(_ == 0L) && clean.size == 3)
  }

  test("Sampling.epochRepeat: exact quota appearances, repeat factors, subset degeneracy") {
    import graft.operators.Sampling
    val docs = ((1L to 900L).map(i => (i, "en")) ++
      (1001L to 1100L).map(i => (i, "de"))).toDF("id", "lang")
    // budget 2N = 2000; isq en 30, de 10; quotas 1500, 500
    val out = Sampling.epochRepeat(docs, "lang", "id", 2L, 1L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    val byLang = out.groupBy(_._2)
    // EXACTLY quota appearances per stratum
    assert(byLang("en").length == 1500 && byLang("de").length == 500)
    // de: 500 = 5*100 -> every doc exactly 5 epochs, no remainder
    assert(byLang("de").groupBy(_._1).values.forall(_.length == 5))
    // en: 1500 = 1*900 + 600 -> epochs 1 or 2, 600 docs get the extra
    val enEpochs = byLang("en").groupBy(_._1).view.mapValues(_.length)
    assert(enEpochs.values.forall(e => e == 1 || e == 2))
    assert(enEpochs.values.count(_ == 2) == 600)
    // quota < n degenerates to temperatureSample's subset at epoch 1
    val sub = Sampling.epochRepeat(docs, "lang", "id", 1L, 10L)
      .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
    assert(sub.forall(_._3 == 1L))
    val ts = Sampling.temperatureSample(docs, "lang", "id", budgetDiv = 10L)
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet
    assert(sub.map(t => (t._1, t._2)).toSet == ts)
  }

  test("Similarity.hardNegatives: skips same-label neighbors however close") {
    import graft.operators.Similarity
    // anchor 1 (label A) is nearly identical to 2 (label A) — the
    // hard NEGATIVE must be 3 (label B), not the closer same-label 2
    val vecs = Seq(
      (1L, Array(1.0f, 0.0f, 0.0f), 0),
      (2L, Array(0.99f, 0.14f, 0.0f), 0),
      (3L, Array(0.8f, 0.6f, 0.0f), 1),
      (4L, Array(0.0f, 1.0f, 0.0f), 1),
      (5L, Array(0.0f, 0.0f, 1.0f), 2)).toDF("vec_id", "embedding", "label")
    val out = Similarity.hardNegatives(
      vecs.where(col("vec_id") === 1L), vecs,
      "vec_id", "embedding", "label", k = 3)
      .orderBy("rank")
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    assert(out.toSeq == Seq((1L, 3L), (2L, 4L), (3L, 5L)),
      s"got ${out.toSeq}")
  }

  test("q158 time decay: exact halving weights, horizon cutoff") {
    val dir = java.nio.file.Files.createTempDirectory("graft-decay").toString
    def ts(day: Int) = java.sql.Timestamp.valueOf(f"2024-01-$day%02d 12:00:00")
    // user 1: events on the anchor day, 1 day back, 2 back, 25 back (past
    // horizon); all value 1.00 -> v = 100 cents
    Seq((1L, ts(26), 1L, "t", 1.0), (2L, ts(25), 1L, "t", 1.0),
      (3L, ts(24), 1L, "t", 1.0), (4L, ts(1), 1L, "t", 1.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", unix_timestamp(col("ts")) * 1000000000L)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    val r = graft.Queries.q158_time_decay(spark, dir).collect()(0)
    assert(r.getLong(1) == 4L)
    // 100*(2^20 + 2^19 + 2^18) + 0 = 100 * 1835008
    assert(r.getLong(2) == 183500800L)
    assert(r.getLong(3) == 3L)
  }

  test("q162: dynamic partition pruning fires on the fact scan") {
    val df = graft.Queries.q162_dynamic_pruning(spark, "/root/testdata/sf0.001")
    val plan = df.queryExecution.executedPlan.toString
    // the fact scan must carry the runtime pruning subquery — static
    // PartitionFilters alone would mean the dim filter was constant-folded
    // and the demo proves nothing
    assert(plan.contains("dynamicpruning"),
      s"no dynamicpruning in plan:\n${plan.take(2000)}")
    assert(df.count() > 0)
  }

  test("q157 winsorize: exact order-statistic thresholds and clamp arithmetic") {
    // write a tiny deterministic events table and run the query on it:
    // values 1..100 in one type -> k_lo = 1+99*5/100 = 5, k_hi = 1+99*95/100
    // = 95 -> thresholds are the 5th and 95th smallest values
    val dir = java.nio.file.Files.createTempDirectory("graft-winsor").toString
    val ts0 = java.sql.Timestamp.valueOf("2024-01-01 00:00:00")
    (1 to 100).map(i => (i.toLong, ts0, i.toLong, "t", i.toDouble / 100.0))
      .toDF("event_id", "ts", "user_id", "event_type", "value")
      .withColumn("ts", unix_timestamp(col("ts")) * 1000000000L)
      .write.mode("overwrite").parquet(s"$dir/events.parquet")
    // cents(value) = i; order statistics of 1..100
    val out = graft.Queries.q157_winsorize(spark, dir).collect()
    assert(out.length == 1)
    val r = out(0)
    assert(r.getLong(1) == 100L)              // n
    assert(r.getLong(2) == 5L && r.getLong(3) == 95L)  // p_lo, p_hi
    assert(r.getLong(4) == 5050L)             // sum_raw = sum 1..100
    // winsorized: 1..4 -> 5 (adds 4+3+2+1 = 10), 96..100 -> 95 (subtracts
    // 1+2+3+4+5 = 15): 5050 + 10 - 15 = 5045
    assert(r.getLong(5) == 5045L)
    assert(r.getLong(6) == 9L)                // 4 below + 5 above
  }

  test("Sampling.ppsSystematic: k crossings, weight-proportional, saturation, zero weights") {
    import graft.operators.Sampling
    // uniform weights: exactly k sampled, evenly spaced
    val uni = (1L to 100L).map(i => (i, 10L)).toDF("id", "w")
    val s1 = Sampling.ppsSystematic(uni, col("w"), col("id"), k = 10)
      .select("id").as[Long].collect().sorted.toSeq
    assert(s1.size == 10)
    // a heavy row spanning multiple boundaries is kept ONCE -> < k rows
    val heavy = ((1L to 9L).map(i => (i, 1L)) :+ (10L, 991L)).toDF("id", "w")
    val s2 = Sampling.ppsSystematic(heavy, col("w"), col("id"), k = 10)
      .select("id").as[Long].collect().toSeq
    assert(s2.contains(10L) && s2.size < 10,
      s"heavy row saturates: got $s2")
    // zero-weight rows are never selected; sample is ALWAYS <= k
    val zeros = (1L to 50L).map(i => (i, if (i % 2 == 0) 0L else 7L)).toDF("id", "w")
    val s3 = Sampling.ppsSystematic(zeros, col("w"), col("id"), k = 5)
      .select("id").as[Long].collect().toSeq
    assert(s3.forall(_ % 2 == 1) && s3.size <= 5)
    // layout-independence: same result after an adversarial repartition
    val s1b = Sampling.ppsSystematic(uni.repartition(7, col("w")),
      col("w"), col("id"), k = 10).select("id").as[Long].collect().sorted.toSeq
    assert(s1b == s1)
  }

  test("TextAnalysis.oovStats: multiplicity OOV counts vs a df-threshold vocab") {
    // 4 docs: "a" in 4/4 (df 100%), "b" in 2/4 (50%), "x"/"y"/"z" in 1/4
    // (25%). vocabPct 50 -> vocab = {a, b}; OOV counts carry multiplicity.
    val df = Seq(
      (1L, "a b a"),        // 0 oov / 3
      (2L, "a b x x"),      // 2 oov / 4 (x twice: multiplicity)
      (3L, "a y"),          // 1 oov / 2
      (4L, "a z")           // 1 oov / 2
    ).toDF("id", "t")
    val out = TextAnalysis.oovStats(df, "id", "t", vocabPct = 50)
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    assert(out == Seq((1L, 3L, 0L), (2L, 4L, 2L), (3L, 2L, 1L), (4L, 2L, 1L)))
    // boundary: df*100 >= n*vocabPct is INCLUSIVE — "b" at exactly 50%
    // is in-vocab (asserted by doc 2's n_oov counting only the x's)
  }

  test("TextAnalysis.langId picks marker-majority language") {
    val df = Seq(
      (1L, "the house of the king and to the north in winter"),
      (2L, "der hund und die katze das ist gut"),
      (3L, "le chat et la maison les portes des villes")).toDF("id", "t")
    val out = df.select(col("id"), TextAnalysis.langId(col("t")).as("l"))
      .orderBy("id").as[(Long, String)].collect()
    assert(out.toSeq == Seq((1L, "en"), (2L, "de"), (3L, "fr")))
  }

  test("TextAnalysis.fingerprint equals driver-side rolling hash") {
    val text = "hello world"
    val expected = text.foldLeft(0L)((acc, c) =>
      (acc * 31 + c.toLong) % TextAnalysis.FingerprintMod)
    val got = Seq(Tuple1(text)).toDF("t")
      .select(TextAnalysis.fingerprint(col("t"))).head().getLong(0)
    assert(got == expected)
  }

  test("native fingerprint matches the HOF formulation incl. multibyte") {
    // the native RollingFingerprint replaced an aggregate-HOF chain;
    // pin bit parity on ASCII, BMP CJK, an astral (surrogate-pair)
    // code point, and the empty string
    val texts = Seq("hello world", "的是了 在我", "mix 的 x", "a𝄞b", "")
    val df = texts.map(Tuple1(_)).toDF("t")
    val hof = org.apache.spark.sql.functions.aggregate(
      filter(split(col("t"), ""), c => c =!= lit("")),
      lit(0L),
      (acc, c) => pmod(acc * lit(31L) + ascii(c),
        lit(TextAnalysis.FingerprintMod)))
    val rows = df.select(TextAnalysis.fingerprint(col("t")).as("native"),
      hof.as("hof")).as[(Long, Long)].collect()
    rows.zip(texts).foreach { case ((n, h), t) =>
      assert(n == h, s"mismatch on '$t': native=$n hof=$h")
    }
  }

  test("Dedup.repeatedWindowStats flags stride-aligned shared spans") {
    val boiler = "0123456789" * 5 // 50 chars: windows at offsets 0 and 10
    val a = boiler + "A" * 30 // windows: 2 boiler-aligned + mixed tails
    val b = boiler + "B" * 30
    val short = "tiny"
    val df = Seq((1L, a), (2L, b), (3L, short)).toDF("id", "t")
    val got = Dedup.repeatedWindowStats(df, "id", "t", width = 40, stride = 10)
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    // 80-char docs: positions 1,11,21,31,41 → 5 windows each; the
    // periodic boiler prefix makes windows@1,11 IDENTICAL (both "0123…"
    // repeated), so each doc has 4 DISTINCT windows, 1 shared across
    // docs; short docs report 0 windows.
    assert(got == Seq((1L, 4L, 1L), (2L, 4L, 1L), (3L, 0L, 0L)))
    // hashed form must agree exactly (8-byte shuffle key at scale)
    val hashed = Dedup.repeatedWindowStats(df, "id", "t", width = 40,
      stride = 10, hashWindows = true)
      .orderBy("id").as[(Long, Long, Long)].collect().toSeq
    assert(hashed == got)
  }

  test("TextAnalysis.chunkTokens: overlap coverage, short docs, exact tails") {
    val words = (1 to 80).map(i => s"w$i")
    val df = Seq((1L, words.mkString(" ")), (2L, "a b c")).toDF("id", "t")
    val got = TextAnalysis.chunkTokens(df, "id", "t", chunkSize = 32, overlap = 8)
      .orderBy("id", "chunk_id")
      .as[(Long, Long, String, Long)].collect().toSeq
    // 80 tokens, stride 24: chunks at 1..32, 25..56, 49..80 → 3 chunks
    assert(got.map(_._1).count(_ == 1L) == 3)
    assert(got.filter(_._1 == 1L).map(_._4) == Seq(32L, 32L, 32L))
    assert(got.filter(_._1 == 1L).head._3.startsWith("w1 w2 "))
    assert(got.filter(_._1 == 1L).last._3.endsWith(" w80"))
    // consecutive chunks share exactly `overlap` tokens
    val Seq(c0, c1, _) = got.filter(_._1 == 1L).map(_._3.split(" ").toSeq)
    assert(c0.takeRight(8) == c1.take(8))
    // every token appears in some chunk (no token dropped)
    assert(got.filter(_._1 == 1L).flatMap(_._3.split(" ")).toSet == words.toSet)
    // short doc: one chunk, its own length
    assert(got.filter(_._1 == 2L) == Seq((2L, 0L, "a b c", 3L)))
  }

  test("TextAnalysis.redactPii masks emails then phones then IPs") {
    val dirty = "mail bob.smith+x@corp.example.org now call 555-0142 " +
      "from 192.168.0.12 ok"
    val r = Seq(Tuple1(dirty)).toDF("t").select(
      TextAnalysis.redactPii(col("t")).as("clean"),
      TextAnalysis.piiCount(col("t"), TextAnalysis.EmailPattern).as("ne"),
      TextAnalysis.piiCount(col("t"), TextAnalysis.PhonePattern).as("np"),
      TextAnalysis.piiCount(col("t"), TextAnalysis.IpPattern).as("ni")).head()
    assert(r.getString(0) ==
      "mail <EMAIL> now call <PHONE> from <IP> ok")
    assert((r.getLong(1), r.getLong(2), r.getLong(3)) == ((1L, 1L, 1L)))
    // email-first ordering: the email's dotted domain must never be
    // half-eaten by the IP pattern
    val clean2 = Seq(Tuple1("x a1.b2.c3.d4@host.example.net y")).toDF("t")
      .select(TextAnalysis.redactPii(col("t"))).head().getString(0)
    assert(clean2 == "x <EMAIL> y")
  }

  // -------------------------------------------------------- multimodal

  test("Multimodal decode: non-image payloads fall back to raw metadata") {
    val media = Multimodal.fromText(
      Seq((7L, "abcdef")).toDF("id", "t"), "id", "t")
    val meta = Multimodal.decodeImages(spark, media).collect()
    assert(meta.length == 1)
    val m = meta.head
    assert(m.media_id == 7L && m.format == "raw" && m.n_bytes == 6L &&
      m.width == 7 && m.height == 43 && m.channels == 3)
  }

  test("ImageHeader parses PNG IHDR, JPEG SOF, GIF descriptors") {
    import Multimodal.ImageHeader
    def bytes(hex: String): Array[Byte] =
      hex.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    // PNG 640x480, color type 6 (RGBA)
    val png = bytes("89504E470D0A1A0A0000000D49484452" +
      "0000028000000" + "1E0" + "0806000000" + "00000000")
    assert(ImageHeader.parse(png).contains(ImageHeader.Info("png", 640, 480, 4)))
    // JPEG with an APP0 segment before SOF0: 123x77, 3 components
    val jpeg = bytes("FFD8" + "FFE00004" + "0000" + // APP0 len 4 (2 payload)
      "FFC00011" + "08" + "004D" + "007B" + "03" + "011100021101031101" + "FFD9")
    assert(ImageHeader.parse(jpeg).contains(ImageHeader.Info("jpeg", 123, 77, 3)))
    // progressive JPEG (SOF2)
    val jpeg2 = bytes("FFD8" + "FFC20011" + "08" + "0001" + "0002" + "01" +
      "011100021101031101" + "FFD9")
    assert(ImageHeader.parse(jpeg2).contains(ImageHeader.Info("jpeg", 2, 1, 1)))
    // GIF89a 3x5 (little-endian dims)
    val gif = bytes("474946383961" + "0300" + "0500" + "00000000")
    assert(ImageHeader.parse(gif).contains(ImageHeader.Info("gif", 3, 5, 3)))
    // truncated / garbage
    assert(ImageHeader.parse(bytes("FFD8FFC0")).isEmpty)
    assert(ImageHeader.parse("not an image".getBytes).isEmpty)
  }

  test("synthetic containers round-trip through the real header parser") {
    val df = Seq(4L, 7L).toDF("id")
    val meta = Multimodal.decodeImages(spark, Multimodal.syntheticImages(df, "id"))
      .collect().sortBy(_.media_id)
    assert(meta(0) == Multimodal.ImageMeta(4L, "png", 33L, 5, 29, 3))
    assert(meta(1) == Multimodal.ImageMeta(7L, "jpeg", 23L, 8, 50, 3))
  }

  test("decontaminate flags corpus docs sharing shingles with the benchmark") {
    val bench = Seq((1L, "the quick brown fox jumps")).toDF("id", "t")
    val corpus = Seq(
      (10L, "lazy dog sleeps all day"),          // no overlap
      (11L, "the quick brown fox runs far"),     // shares 2 shingles
      (12L, "a b the quick brown c")).toDF("id", "t") // shares 1
    val out = Dedup.decontaminate(corpus, bench, "id", "t")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toMap
    assert(out == Map(11L -> 2L, 12L -> 1L))
  }

  test("MP4 box trees round-trip; non-MP4 bytes degrade to raw") {
    val df = Seq(10L).toDF("id")
    val meta = Multimodal.decodeVideos(spark, Multimodal.syntheticMp4s(df, "id"))
      .collect()
    // id=10: w=26, h=46, dur=1010ms
    assert(meta.head == Multimodal.VideoMeta(10L, "mp4", 232L, 26, 46, 1010L))
    val raw = Multimodal.decodeVideo(
      Multimodal.MediaFile(1L, "video", "not an iso bmff stream!!".getBytes))
    assert(raw.format == "raw" && raw.width == 0)
  }

  test("WAV headers round-trip; non-RIFF bytes degrade to raw") {
    val df = Seq(5L).toDF("id")
    val meta = Multimodal.decodeAudios(spark, Multimodal.syntheticWavs(df, "id"))
      .collect()
    // id=5: rate 8000+5*1000, 2 channels, 100+65%900=165 samples
    assert(meta.head == Multimodal.AudioMeta(5L, "wav", 44L, 13000, 2, 16, 165L))
    val raw = Multimodal.decodeAudio(
      Multimodal.MediaFile(1L, "audio", "definitely not riff".getBytes))
    assert(raw.format == "raw" && raw.n_samples == 0L)
  }

  test("Multimodal frame sampling: one row per sampled frame") {
    val media = Multimodal.fromText(
      Seq((1L, "0123456789")).toDF("id", "t"), "id", "t")
    val frames = Multimodal.sampleFrames(spark, media, everyNth = 3).collect()
    assert(frames.map(_.frame_no).sorted.toSeq == Seq(0, 3, 6, 9))
  }

  // ------------------------------------------------------- maintenance

  test("Merge.upsert applies updates, deletes, inserts; keeps the rest") {
    val snap = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("k", "v")
    val changes = Seq((2L, "B", "U"), (3L, "c", "D"), (9L, "z", "I"))
      .toDF("k", "v", "op")
    val out = Merge.upsert(snap, changes, Seq("k"))
      .orderBy("k").as[(Long, String)].collect().toSeq
    assert(out == Seq((1L, "a"), (2L, "B"), (9L, "z")))
  }

  test("Merge.upsert refuses malformed op values and bookkeeping collisions by name") {
    val snap = Seq((1L, "a"), (2L, "b")).toDF("k", "v")
    // a lowercase 'd' (or 'DELETE', or a typo) used to fall through the
    // != 'D' filter and be treated as an upsert: the malformed DELETE
    // marker's payload silently REPLACED the snapshot row instead of
    // deleting the key
    val badOp = Seq((2L, "x", "d")).toDF("k", "v", "op")
    val e = intercept[Exception](Merge.upsert(snap, badOp, Seq("k")).collect())
    assert(SharedSpark.messages(e).exists(_.contains("must be one of I/U/D")),
      s"expected the op-domain error, got: ${SharedSpark.messages(e).take(3)}")
    // a changes DATA column named like the bookkeeping used to be
    // silently overwritten by the priority tag and vanish
    val clobber = Seq((2L, "x", "U", 7L)).toDF("k", "v", "op", "__prio")
    val e2 = intercept[IllegalArgumentException](
      Merge.upsert(snap, clobber, Seq("k")))
    assert(e2.getMessage.contains("collides with upsert bookkeeping"))
  }

  test("Streams.enrichWithDim with a shared key name keeps ONE key column") {
    val events = Seq((1L, "click"), (2L, "view")).toDF("user_id", "event_type")
    val dim = Seq((1L, "gold"), (2L, "free")).toDF("user_id", "tier")
    val out = graft.streaming.Streams.enrichWithDim(events, dim, "user_id", "user_id")
    // the expression-form join kept BOTH user_id columns, so any
    // downstream reference hit AMBIGUOUS_REFERENCE
    assert(out.columns.count(_ == "user_id") == 1)
    assert(out.select("user_id", "tier").count() == 2)
  }

  test("Packing.shardByTokenBudget: exclusive prefix sum, per-stratum") {
    val docs = Seq(
      ("en", 1L, 600L), ("en", 2L, 600L), ("en", 3L, 600L),
      ("de", 1L, 2500L), ("de", 2L, 10L)).toDF("lang", "id", "ntok")
    val out = Packing
      .shardByTokenBudget(docs, col("ntok"), col("id"), 1000L, Seq(col("lang")))
      .select("lang", "id", "shard_id").as[(String, Long, Long)]
      .collect().toSet
    // en: cum-before 0/600/1200 -> shards 0,0,1; de: 0/2500 -> 0,2
    assert(out == Set(("en", 1L, 0L), ("en", 2L, 0L), ("en", 3L, 1L),
      ("de", 1L, 0L), ("de", 2L, 2L)))
  }

  test("bpeishTokenCount splits digits and punctuation, not letter runs") {
    val df = Seq(
      ("hello world", 2L),        // two letter runs
      ("w0rld", 3L),              // letters, digit, letters
      ("42", 2L),                 // each digit its own token
      ("it's x9!", 6L),           // it ' s x 9 !
      ("", 0L)).toDF("t", "expect")
    val got = df.select(col("expect"),
      TextAnalysis.bpeishTokenCount(col("t")).as("n")).collect()
    got.foreach(r => assert(r.getLong(1) == r.getLong(0), r.toString))
  }

  test("Packing global prefix-sum sharding equals the window form") {
    // the distributed (bucketed offsets) implementation must produce the
    // IDENTICAL global sequence sharding as the single-window form, for
    // any bucket count — including buckets that hash-collide into the
    // same partition (numBuckets > partitions exercises the per-bucket
    // cum reset)
    val docs = graft.core.Catalog.table(spark, "/root/testdata/sf0.001", "documents")
      .select(col("doc_id"), (length(col("text")) % 97 + 1).cast("long").as("ntok"))
    val windowed = Packing
      .shardByTokenBudget(docs, col("ntok"), col("doc_id"), budget = 500L)
      .select("doc_id", "shard_id").as[(Long, Long)].collect().toMap
    for (buckets <- Seq(1, 3, 16, 64)) {
      val global = Packing
        .shardByTokenBudgetGlobal(docs, "ntok", "doc_id", budget = 500L, buckets)
        .select("doc_id", "shard_id").as[(Long, Long)].collect().toMap
      assert(global == windowed, s"mismatch at numBuckets=$buckets")
    }
  }

  test("Packing: global and window forms agree on null tokens; null order keys fail loudly") {
    val docs = Seq((1L, java.lang.Long.valueOf(300L)), (2L, null.asInstanceOf[java.lang.Long]),
      (3L, java.lang.Long.valueOf(300L)), (4L, java.lang.Long.valueOf(300L)))
      .toDF("id", "ntok")
    val windowed = Packing.shardByTokenBudget(docs, col("ntok"), col("id"), budget = 500L)
      .select("id", "shard_id").as[(Long, Long)].collect().toMap
    val global = Packing.shardByTokenBudgetGlobal(docs, "ntok", "id", budget = 500L, 3)
      .select("id", "shard_id").as[(Long, Long)].collect().toMap
    assert(global == windowed) // null token counts 0 in both forms
    val nullKey = Seq((java.lang.Long.valueOf(1L), 10L), (null.asInstanceOf[java.lang.Long], 10L))
      .toDF("id", "ntok")
    val err = intercept[Exception] {
      Packing.shardByTokenBudgetGlobal(nullKey, "ntok", "id", budget = 5L, 2).count()
    }
    assert(err.getMessage.contains("total order"))
  }

  test("Packing fails fast on bookkeeping/output column collisions") {
    val df = Seq((1L, 10L, 0L)).toDF("id", "ntok", "shard_id")
    intercept[IllegalArgumentException] {
      Packing.shardByTokenBudget(df, col("ntok"), col("id"), budget = 5L)
    }
    intercept[IllegalArgumentException] {
      Packing.shardByTokenBudgetGlobal(df, "ntok", "id", budget = 5L, 2)
    }
  }

  test("InvertedIndex.build drops exactly the tokens with df > maxDf") {
    // 20 docs: "stop" in all 20, "mid" in docs 0-9, "rare" only in doc 3
    val docs = (0L until 20L).map { i =>
      val toks = Seq("stop") ++
        (if (i < 10) Seq("mid") else Nil) ++
        (if (i == 3) Seq("rare") else Nil)
      (i, toks.mkString(" "))
    }.toDF("id", "text")
    val full = InvertedIndex.build(docs, "id", "text", maxDf = 20L)
      .select("token", "df", "postings").as[(String, Long, String)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    for (maxDf <- Seq(1L, 9L, 10L, 19L, 20L)) {
      val capped = InvertedIndex.build(docs, "id", "text", maxDf)
        .select("token", "df", "postings").as[(String, Long, String)].collect()
        .map(r => r._1 -> ((r._2, r._3))).toMap
      // kept = exactly the tokens at or under the threshold...
      assert(capped.keySet == full.filter(_._2._1 <= maxDf).keySet,
        s"wrong token set at maxDf=$maxDf")
      // ...and their postings/df are bit-identical to the uncapped build
      assert(capped == full.view.filterKeys(capped.keySet).toMap,
        s"surviving postings changed at maxDf=$maxDf")
    }
    assert(full("stop")._2 == (0L until 20L).mkString(","))
    assert(full("rare") == ((1L, "3")))
  }

  test("InvertedIndex.boundedSmallest keeps the bound smallest ids under partial merge") {
    // ids arrive shuffled across 8 partitions; bound smaller than the group
    val ids = scala.util.Random.shuffle((0L until 500L).toList)
    val df = ids.map(i => ("g", i)).toDF("g", "id").repartition(8)
    for (bound <- Seq(1, 7, 100, 500, 600)) {
      val got = df.groupBy("g")
        .agg(InvertedIndex.boundedSmallest(col("id"), bound).as("s"))
        .select("s").as[Seq[Long]].head()
      assert(got == (0L until math.min(bound, 500).toLong),
        s"wrong survivors at bound=$bound")
    }
  }

  test("InvertedIndex.buildRelative equals the capped-heap build at the same cap") {
    val docs = graft.core.Catalog.table(spark, "/root/testdata/sf0.001", "documents")
    val maxDf = docs.count() * 78 / 100
    val viaHeap = InvertedIndex.build(docs, "doc_id", "text", maxDf)
      .collect().map(_.toSeq).toSet
    val viaPlan = InvertedIndex.buildRelative(docs, "doc_id", "text", 78, 100)
      .collect().map(_.toSeq).toSet
    assert(viaHeap == viaPlan)
    assert(viaHeap.nonEmpty)
  }

  test("InvertedIndex.phraseMatches: overlaps, 3-token phrases, boundaries") {
    val docs = Seq(
      (1L, "a b a b a"),   // "a b a" overlaps: pos 0 and 2
      (2L, "a b"),         // too short for "a b a"
      (3L, "x a b a"),     // hit at pos 1, phrase ends at doc end
      (4L, "a a b a b"),   // "a b a" at pos 1 only
      (5L, "c c c")        // no phrase tokens at all
    ).toDF("id", "t")
    def hits(phrase: String*): Set[(Long, Int)] =
      InvertedIndex.phraseMatches(docs, "id", "t", phrase)
        .as[(Long, Int)].collect().toSet
    assert(hits("a", "b", "a") == Set((1L, 0), (1L, 2), (3L, 1), (4L, 1)))
    assert(hits("a", "b") == Set((1L, 0), (1L, 2), (2L, 0), (3L, 1), (4L, 1), (4L, 3)))
    assert(hits("c") == Set((5L, 0), (5L, 1), (5L, 2)))
    assert(hits("b", "b").isEmpty)
  }

  test("Dedup.prefixJaccardPairs: exact recall vs brute force, several thresholds") {
    // random small docs over a tiny vocabulary → real overlap structure
    val rnd = new scala.util.Random(7)
    val vocab = ('a' to 'j').map(_.toString)
    val docs = (0L until 40L).map { i =>
      val n = 2 + rnd.nextInt(6)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val df = docs.toDF("id", "t")
    def brute(num: Int, den: Int): Set[(Long, Long, Long, Long)] = {
      val sets = docs.map { case (i, t) => i -> t.split(" ").toSet }.toMap
      (for {
        a <- docs.map(_._1); b <- docs.map(_._1) if a < b
        i = (sets(a) intersect sets(b)).size.toLong
        u = (sets(a) union sets(b)).size.toLong
        if i * (den + num) >= (sets(a).size + sets(b).size) * num
      } yield (a, b, i, u)).toSet
    }
    for ((num, den) <- Seq((1, 2), (3, 4), (1, 3))) {
      val got = Dedup.prefixJaccardPairs(df, "id", "t", num, den)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == brute(num, den), s"mismatch at t=$num/$den")
    }
  }

  test("Dedup.containmentPairs: exact recall vs brute force, both directions, several thresholds") {
    // random small docs over a tiny vocabulary → real containment
    // structure (short docs often fully contained in longer ones)
    val rnd = new scala.util.Random(11)
    val vocab = ('a' to 'j').map(_.toString)
    val docs = (0L until 40L).map { i =>
      val n = 2 + rnd.nextInt(8)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val df = docs.toDF("id", "t")
    // w=1 shingles are the word tokens themselves
    def brute(num: Int, den: Int): Set[(Long, Long, Long, Long)] = {
      val sets = docs.map { case (i, t) => i -> t.split(" ").toSet }.toMap
      (for {
        a <- docs.map(_._1); b <- docs.map(_._1) if a != b
        i = (sets(a) intersect sets(b)).size.toLong
        na = sets(a).size.toLong
        if i * den >= na * num
      } yield (a, b, i, na)).toSet
    }
    for ((num, den) <- Seq((1, 2), (3, 5), (4, 5))) {
      val got = Dedup.containmentPairs(df, "id", "t", shingleWidth = 1, num, den,
        allowUncapped = true)
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == brute(num, den), s"mismatch at t=$num/$den")
      // asymmetry must be live: some pair where A⊆-ish B but not back
      if ((num, den) == (4, 5)) {
        val oneWay = got.filter { case (a, b, _, _) => !got.exists(p => p._1 == b && p._2 == a) }
        assert(oneWay.nonEmpty, "expected at least one asymmetric containment pair")
      }
    }
    // shingleWidth=3: the q231 form — brute model over word 3-shingles
    // (docs shorter than 3 tokens shingle as their whole text)
    def sh3(t: String): Set[String] = {
      val toks = t.split(" ", -1)
      if (toks.length >= 3) toks.sliding(3).map(_.mkString(" ")).toSet else Set(t)
    }
    val sets3 = docs.map { case (i, t) => i -> sh3(t) }.toMap
    val brute3 = (for {
      a <- docs.map(_._1); b <- docs.map(_._1) if a != b
      i = (sets3(a) intersect sets3(b)).size.toLong
      na = sets3(a).size.toLong
      if i * 5L >= na * 3L
    } yield (a, b, i, na)).toSet
    val got3 = Dedup.containmentPairs(df, "id", "t", shingleWidth = 3, num = 3,
      den = 5, allowUncapped = true)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(got3 == brute3, "3-shingle containment mismatch")

    // unicode vocabulary (CJK + an astral-plane surrogate pair): the
    // rarest-first rank order ties by TOKEN VALUE, so exact recall must
    // survive multi-byte and surrogate-pair comparisons end-to-end
    val uvocab = Seq("文", "書", "語", "😀", "été")
    val udocs = (0L until 25L).map { i =>
      val n = 2 + rnd.nextInt(6)
      (i, Seq.fill(n)(uvocab(rnd.nextInt(uvocab.size))).mkString(" "))
    }
    val usets = udocs.map { case (i, t) => i -> t.split(" ").toSet }.toMap
    val ubrute = (for {
      a <- udocs.map(_._1); b <- udocs.map(_._1) if a != b
      i = (usets(a) intersect usets(b)).size.toLong
      na = usets(a).size.toLong
      if i * 5L >= na * 3L
    } yield (a, b, i, na)).toSet
    val ugot = Dedup.containmentPairs(udocs.toDF("id", "t"), "id", "t",
      shingleWidth = 1, num = 3, den = 5, allowUncapped = true)
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(ugot == ubrute, "unicode containment mismatch")
  }

  test("Dedup.containmentPairs maxDf cap: exact-measure subset, misses all cap-explained") {
    // the recall contract of the 100 TB posting-cap lever, pinned against
    // an independent model of the capped blocking: capped output must be
    // EXACTLY the uncapped pairs that share >= 1 prefix(A)-token with
    // df <= cap in B (verification sets stay uncapped, so survivors keep
    // exact (i, na); a miss is legal iff every shared prefix token is
    // boilerplate above the cap)
    val rnd = new scala.util.Random(23)
    val vocab = ('a' to 'h').map(_.toString)
    val docs = (0L until 45L).map { i =>
      val n = 2 + rnd.nextInt(7)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val df = docs.toDF("id", "t")
    val sets = docs.map { case (i, t) => i -> t.split(" ").toSet }.toMap
    val dfreq = sets.values.flatten.groupBy(identity).map { case (t, xs) => t -> xs.size }
    for ((num, den, cap) <- Seq((3, 5, 2L), (1, 2, 5L), (4, 5, 10L))) {
      val exact = (for {
        a <- docs.map(_._1); b <- docs.map(_._1) if a != b
        i = (sets(a) intersect sets(b)).size.toLong
        na = sets(a).size.toLong
        if i * den >= na * num
      } yield (a, b, i, na)).toSet
      def prefix(a: Long): Set[String] = {
        val ordered = sets(a).toSeq.sortBy(t => (dfreq(t), t))
        val n = ordered.size
        ordered.take(n - ((n * num + den - 1) / den) + 1).toSet
      }
      val model = exact.filter { case (a, b, _, _) =>
        (prefix(a) intersect sets(b)).exists(t => dfreq(t) <= cap)
      }
      val got = Dedup.containmentPairs(df, "id", "t",
        shingleWidth = 1, num, den, maxDf = Some(cap))
        .as[(Long, Long, Long, Long)].collect().toSet
      assert(got == model, s"capped containment mismatch at t=$num/$den cap=$cap")
      assert(got.subsetOf(exact), s"cap invented/mutated a pair at t=$num/$den cap=$cap")
      // the cap must actually bite at least once across the matrix
      if ((num, den, cap) == ((3, 5, 2L))) {
        assert(model.size < exact.size,
          "cap=2 was expected to lose pairs on this corpus — test is vacuous")
      }
    }
  }

  test("Dedup.containmentFanout: analytic volume exact, recommendation budget-correct, hazard named") {
    // brute model of the probe: candidate volume = Σ_t dfPrefix(t)·df(t)
    // (the prefix(A) ⋈ postings(B) join's row count, self-pairs included)
    def model(docs: Seq[(Long, String)], num: Int, den: Int) = {
      val sets = docs.map { case (i, t) => i -> t.split(" ").toSet }.toMap
      val dfreq = sets.values.flatten.groupBy(identity)
        .map { case (t, xs) => t -> xs.size.toLong }
      def prefix(a: Long): Set[String] = {
        val ordered = sets(a).toSeq.sortBy(t => (dfreq(t), t))
        val n = ordered.size
        ordered.take(n - ((n * num + den - 1) / den) + 1).toSet
      }
      val pdf = docs.map(_._1).flatMap(prefix)
        .groupBy(identity).map { case (t, xs) => t -> xs.size.toLong }
      (dfreq, (cap: Long) =>
        pdf.map { case (t, p) => if (dfreq(t) <= cap) p * dfreq(t) else 0L }.sum)
    }
    // healthy corpus: the cap test's shape — modest dfs, no boilerplate
    val rnd = new scala.util.Random(31)
    val vocab = ('a' to 'p').map(_.toString)
    val healthy = (0L until 50L).map { i =>
      val n = 3 + rnd.nextInt(6)
      (i, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val (hdf, hvol) = model(healthy, 1, 2)
    val hprobe = Dedup.containmentFanout(healthy.toDF("id", "t"), "id", "t",
      shingleWidth = 1, num = 1, den = 2, maxCandidatesPerDoc = 10000L)
    assert(hprobe.nDocs === 50L)
    assert(hprobe.vocab === hdf.size.toLong)
    assert(hprobe.maxShingleDf === hdf.values.max)
    assert(hprobe.uncappedCandidates === hvol(Long.MaxValue))
    // every present ladder point matches the brute capped volume EXACTLY
    hprobe.ladder.foreach { case (cap, c) =>
      assert(c === hvol(cap), s"ladder point $cap") }
    // generous budget → no hazard, no cap, exact recall free
    assert(!hprobe.uncappedHazard && hprobe.recommendedMaxDf.isEmpty)
    hprobe.requireUncappedSafe() // must not throw
    // the adaptive wrapper then runs UNCAPPED — identical to exact
    val (adaptive, aprobe) = Dedup.containmentPairsAdaptive(
      healthy.toDF("id", "t"), "id", "t", 1, 1, 2,
      maxCandidatesPerDoc = 10000L)
    assert(aprobe.recommendedMaxDf.isEmpty)
    assert(adaptive.as[(Long, Long, Long, Long)].collect().toSet ===
      Dedup.containmentPairs(healthy.toDF("id", "t"), "id", "t", 1, 1, 2,
        allowUncapped = true)
        .as[(Long, Long, Long, Long)].collect().toSet)

    // boilerplate corpus: every doc shares a common chunk (the measured
    // DNF shape — corpus-wide shingles square the candidate product)
    val boiler = (0L until 60L).map { i =>
      (i, s"u$i v$i w x y z") // 3 boilerplate tokens df=60, 2 rare df=1
    }
    val budgetPerDoc = 32L
    val (bdf, bvol) = model(boiler, 1, 2)
    val bprobe = Dedup.containmentFanout(boiler.toDF("id", "t"), "id", "t",
      shingleWidth = 1, num = 1, den = 2, maxCandidatesPerDoc = budgetPerDoc)
    assert(bprobe.uncappedCandidates === bvol(Long.MaxValue))
    assert(bprobe.uncappedHazard, "boilerplate corpus must trip the hazard")
    val err = intercept[IllegalStateException] { bprobe.requireUncappedSafe() }
    assert(err.getMessage.contains("uncapped-invocation hazard")
      && err.getMessage.contains("maxDf"))
    // recommendation = the LARGEST ladder cap whose brute capped volume
    // fits the budget (max recall subject to budget) — and it must sit
    // below the boilerplate df (the knee-safe side of the distribution)
    val budget = budgetPerDoc * 60L
    val expected = Dedup.MaxDfLadder.filter(c => bvol(c) <= budget).max
    assert(bprobe.recommendedMaxDf === Some(expected))
    assert(expected < bdf.values.max,
      "recommendation must exclude the boilerplate df")
    assert(bvol(expected) <= budget)
    // capped at the recommendation: subset of exact with identical
    // measures (the q232 contract), and the rare-token pairs survive
    val exactPairs = Dedup.containmentPairs(boiler.toDF("id", "t"),
      "id", "t", 1, 1, 2, allowUncapped = true)
      .as[(Long, Long, Long, Long)].collect().toSet
    val cappedPairs = Dedup.containmentPairs(boiler.toDF("id", "t"),
      "id", "t", 1, 1, 2, maxDf = Some(expected))
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(cappedPairs.subsetOf(exactPairs))

    // nDocs counts DISTINCT ids (the candidate model's unit is the
    // per-id token SET — groupBy merges repeated ids into one doc) and
    // ignores null-text rows, matching the q233 oracle's
    // count(DISTINCT doc_id) over the non-null-text corpus
    val dup = healthy ++ Seq((0L, "q r s"), (999L, null: String))
    val dprobe = Dedup.containmentFanout(dup.toDF("id", "t"), "id", "t",
      shingleWidth = 1, num = 1, den = 2, maxCandidatesPerDoc = 10000L)
    assert(dprobe.nDocs === 50L,
      "repeated ids are one doc and null-text rows are no doc")
  }

  test("uncapped containment requires explicit opt-in (r15 verdict #5)") {
    // the uncapped candidate join is the measured 100x DNF mode — it was
    // still the default-callable path; a bare uncapped call now refuses
    // BEFORE any job runs, and the refusal names the production entry
    val df = Seq((1L, "a b c"), (2L, "a b d")).toDF("id", "t")
    val err = intercept[IllegalArgumentException] {
      Dedup.containmentPairs(df, "id", "t", shingleWidth = 1, num = 1, den = 2)
    }
    assert(err.getMessage.contains("containmentPairsAdaptive"),
      "refusal must name the adaptive production entry")
    assert(err.getMessage.contains("allowUncapped"),
      "refusal must name the explicit opt-in")
    // both sanctioned forms still run: capped, and explicitly-uncapped
    assert(Dedup.containmentPairs(df, "id", "t", 1, 1, 2,
      maxDf = Some(1L)).count() >= 0)
    assert(Dedup.containmentPairs(df, "id", "t", 1, 1, 2,
      allowUncapped = true).count() >= 0)
  }

  test("Compaction merges small files without changing content") {
    val src = java.nio.file.Files.createTempDirectory("graft-compact-in").toString
    val dst = java.nio.file.Files.createTempDirectory("graft-compact-out").toString
    val orders = graft.core.Catalog.table(spark, "/root/testdata/sf0.001", "orders")
    orders.repartition(64).write.mode("overwrite").parquet(src) // the small-file mess
    def partFiles(d: String) = new java.io.File(d).listFiles()
      .filter(_.getName.startsWith("part-"))
    assert(partFiles(src).length == 64)
    val totalBytes = partFiles(src).map(_.length).sum
    val n = Compaction.compactParquet(spark, src, dst, targetBytes = totalBytes / 4)
    val written = partFiles(dst).length
    assert(n <= 5 && written <= n && written >= 1, s"cap $n, wrote $written")
    assert(spark.read.parquet(dst).collect().map(_.toSeq).toSet ==
      orders.collect().map(_.toSeq).toSet)
    intercept[IllegalArgumentException] { // in-place rewrite refused
      Compaction.compactParquet(spark, src, src, targetBytes = 1L)
    }
  }

  test("Compaction preserves a Hive-partitioned layout and sizes per partition") {
    val src = java.nio.file.Files.createTempDirectory("graft-compact-pin").toString
    val dst = java.nio.file.Files.createTempDirectory("graft-compact-pout").toString
    val orders = graft.core.Catalog.table(spark, "/root/testdata/sf0.001", "orders")
      // non-numeric partition values: partition-column type inference on
      // the read side would otherwise turn "1".."5" into ints
      .withColumn("pri", substring(col("o_orderpriority"), 3, 3))
    orders.repartition(16).write.mode("overwrite")
      .partitionBy("pri").parquet(src) // small-file mess inside each pri=X dir
    def filesUnder(d: String) = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(d)).filter(_.getName.startsWith("part-"))
    }
    val inFiles = filesUnder(src)
    assert(inFiles.length > 16, s"expected a per-partition small-file mess, got ${inFiles.length}")
    val totalBytes = inFiles.map(_.length).sum
    val n = Compaction.compactParquet(spark, src, dst, targetBytes = totalBytes)
    // one file budget per partition dir (each dir is far under targetBytes)
    val partDirs = new java.io.File(src).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(n == partDirs.size, s"budget $n, partitions ${partDirs.size}")
    val outDirs = new java.io.File(dst).listFiles().filter(_.isDirectory)
      .map(_.getName).toSet
    assert(outDirs == partDirs, s"layout lost: $outDirs vs $partDirs")
    assert(filesUnder(dst).length == partDirs.size, "expected one compacted file per partition")
    assert(spark.read.parquet(dst).select(orders.columns.map(col): _*)
      .collect().map(_.toSeq).toSet == orders.collect().map(_.toSeq).toSet)
  }

  test("IncrementalAgg: chained delta merges equal the from-scratch aggregate") {
    import spark.implicits._
    val rows = (0L until 300L).map(i => (s"k${i % 7}", i * 3 % 101))
    val df = rows.toDF("k", "v")
    val full = graft.operators.IncrementalAgg.partials(df, Seq("k"), Seq("v"))
      .collect().map(_.toSeq).toSet
    val parts = Seq(df.where($"v" % 3 === 0), df.where($"v" % 3 === 1),
      df.where($"v" % 3 === 2))
      .map(graft.operators.IncrementalAgg.partials(_, Seq("k"), Seq("v")))
    // merge in two different orders — associative/commutative
    val m1 = graft.operators.IncrementalAgg.merge(
      graft.operators.IncrementalAgg.merge(parts(0), parts(1), Seq("k"), Seq("v")),
      parts(2), Seq("k"), Seq("v")).collect().map(_.toSeq).toSet
    val m2 = graft.operators.IncrementalAgg.merge(
      parts(2), graft.operators.IncrementalAgg.merge(parts(1), parts(0),
        Seq("k"), Seq("v")), Seq("k"), Seq("v")).collect().map(_.toSeq).toSet
    assert(m1 == full && m2 == full)
  }

  test("BloomPrune.reducedJoin is identical to the plain join; prune has no false negatives") {
    import spark.implicits._
    val fact = (0L until 5000L).map(i => (i % 997, i)).toDF("k", "payload")
    val dim = (0L until 997L by 3).map(i => (i, s"d$i")).toDF("dk", "name")
    val plain = fact.join(dim, $"k" === $"dk").collect().map(_.toSeq).toSet
    val reduced = graft.operators.BloomPrune
      .reducedJoin(fact, dim, "k", "dk", expectedItems = 400L, fpp = 0.05)
      .collect().map(_.toSeq).toSet
    assert(reduced == plain)
    // the prune alone keeps every true match (Bloom: no false negatives)
    val bytes = graft.operators.BloomPrune.buildFilter(dim, $"dk", 400L, 0.05)
    val kept = graft.operators.BloomPrune.prune(fact, $"k", bytes)
      .select("k").as[Long].collect().toSet
    val trueKeys = dim.select("dk").as[Long].collect().toSet
    assert(fact.select("k").as[Long].collect().toSet
      .filter(trueKeys.contains).subsetOf(kept))
  }

  test("Sampling.mixtureSample keeps binding stratum whole, rates others") {
    import spark.implicits._
    // en: 600 tokens over 60 docs, de: 90 over 9, zh: 300 over 30
    val docs = ((0L until 60L).map(i => (i, "en", 10L)) ++
      (100L until 109L).map(i => (i, "de", 10L)) ++
      (200L until 230L).map(i => (i, "zh", 10L)) ++
      (300L until 310L).map(i => (i, "fr", 10L))).toDF("id", "lang", "toks")
    val bucket = pmod(xxhash64(col("id")), lit(10000L))
    val kept = graft.operators.Sampling.mixtureSample(
      docs, "lang", col("toks"), Seq("en" -> 2L, "de" -> 3L, "zh" -> 1L), bucket)
      .groupBy("lang").count().as[(String, Long)].collect().toMap
    // binding stratum = argmin T/w: en 300, de 30, zh 300 -> de kept whole
    assert(kept("de") == 9L)
    assert(!kept.contains("fr")) // unweighted stratum dropped
    // expected rates: en = (2*90)/(3*600) = 0.1, zh = (1*90)/(3*300) = 0.1
    assert(kept.getOrElse("en", 0L) < 20L && kept.getOrElse("zh", 0L) < 12L)
  }

  test("TimeSeries.resample fills gaps: zero counts, forward-filled values") {
    import spark.implicits._
    val ev = Seq(
      (1L, "2024-01-01 00:10:00", 5.0),
      (1L, "2024-01-01 03:20:00", 7.0),
      (2L, "2024-01-01 01:00:00", 1.0)
    ).toDF("uid", "ts", "v").withColumn("ts", to_timestamp(col("ts")))
    val out = graft.operators.TimeSeries.resample(ev, "uid",
      date_trunc("hour", col("ts")), "interval 1 hour",
      Seq(count(lit(1)).as("n"), sum(col("v")).as("sv")),
      zeroFill = Seq("n"), ffill = Seq("sv"))
      .orderBy("uid", "bucket")
      .select("uid", "n", "sv").as[(Long, Long, Double)].collect()
    assert(out.toSeq == Seq((1L, 1L, 5.0), (1L, 0L, 5.0), (1L, 0L, 5.0),
      (1L, 1L, 7.0), (2L, 1L, 1.0)))
  }

  test("Sampling.stratifiedSample keeps per-stratum fractions, drops rest") {
    val df = (0L until 1000L).map(i => (i, if (i % 2 == 0) "en" else "fr"))
      .toDF("id", "lang")
    val out = Sampling.stratifiedSample(df, "lang", Map("en" -> 0.5))
      .as[(Long, String)].collect()
    assert(out.forall(_._2 == "en"))
    // hash-bucket sampling: expect ~250 of the 500 en rows, loosely bounded
    assert(out.length > 150 && out.length < 350)
    // deterministic: the same rows every time
    val again = Sampling.stratifiedSample(df, "lang", Map("en" -> 0.5))
      .as[(Long, String)].collect()
    assert(out.toSet == again.toSet)
  }
}
