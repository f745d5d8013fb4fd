package graft.operators

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Text-analysis operators for large-scale training-data pipelines:
  * language ID, quality scoring, token counting, document fingerprinting.
  *
  * Everything here is a pure `Column` expression built from
  * `org.apache.spark.sql.functions` — fully whole-stage-codegen'd, no
  * UDFs, no driver round-trips — so each operator runs at scan speed and
  * scales linearly with input splits. (The reference has no text/function
  * surface at all — `/root/reference/src/` contains only int-tuple scans —
  * so these are the north-star pipeline additions built Spark-first.)
  *
  * Each function is deliberately expressible in portable SQL (same
  * replace/length/ascii arithmetic) so the DuckDB oracle can verify it
  * bit-for-bit.
  */
object TextAnalysis {
  val FingerprintMod = 1000000007L

  /** Plain (non-regex) string replace — same operator the DuckDB oracle's
    * `replace()` uses, and ~10x cheaper than regexp_replace.
    */
  private def strReplace(text: Column, find: String, repl: String): Column =
    call_function("replace", text, lit(find), lit(repl))

  /** Whitespace token count: single-space-separated text. */
  def tokenCount(text: Column): Column =
    (length(text) - length(strReplace(text, " ", "")) + 1).cast("long")

  /** Word tokens. */
  def tokens(text: Column): Column = split(text, " ")

  /** BPE-ish pre-tokenization pattern: letter runs, single digits,
    * single non-alphanumeric marks — the GPT-2-style split (digits
    * individually, punctuation separate from words). ASCII classes
    * only, so Java regex (Spark) and RE2 (DuckDB) agree; the
    * alternatives have disjoint first-character classes, so greedy
    * matching is unambiguous in both engines.
    */
  val BpeishPattern = "[A-Za-z]+|[0-9]|[^A-Za-z0-9 ]"

  /** Subword-shaped token count under [[BpeishPattern]] — the closer
    * proxy for model token budgets than whitespace counting (digits and
    * punctuation cost tokens).
    */
  def bpeishTokenCount(text: Column): Column =
    size(regexp_extract_all(text, lit(BpeishPattern), lit(0))).cast("long")

  /** Occurrences of `word` as a whole token — NON-OVERLAPPING replace
    * counting, identical arithmetic to the SQL oracle's occSql.
    *
    * DOCUMENTED CONVENTION (round-10 audit, measured negative result):
    * adjacent repeats of the word share their delimiting space, so the
    * single replace pass counts ⌈n/2⌉ of an n-long repeat run ("the the
    * the" counts 2, not 3). Exact alternatives were built and measured:
    * the HOF form `size(filter(split(...)))` is evaluated INTERPRETED
    * (+50% on the quality-chain queries), and a space-doubled replace
    * (each occurrence gets its own delimiters) doubled the string
    * passes without CSE rescuing it (q227/q228 warm 0.8 → 2.9 s). The
    * undercount only nudges HEURISTIC scores (langId margins, stopword
    * ratios) on repeat-heavy documents, which the Gopher `repetitive`
    * flag targets independently — so the cheap convention stays, on
    * BOTH engines, and this comment is the record of why.
    */
  def wordOccurrences(text: Column, word: String): Column = {
    val padded = concat(lit(" "), text, lit(" "))
    val needle = s" $word "
    ((length(padded) - length(strReplace(padded, needle, ""))) / lit(needle.length))
      .cast("long")
  }

  /** Language marker words (public stopword lists, most-frequent tokens
    * per language). Scoring = total marker occurrences; argmax with a
    * fixed tie-break order (en, de, fr, es, zh).
    */
  val langMarkers: Seq[(String, Seq[String])] = Seq(
    "en" -> Seq("the", "of", "and", "to", "in"),
    "de" -> Seq("der", "die", "und", "das", "ist"),
    "fr" -> Seq("le", "la", "et", "les", "des"),
    "es" -> Seq("el", "de", "que", "los", "las"),
    "zh" -> Seq("的", "是", "了", "在", "我"))

  def langScore(text: Column, lang: String): Column =
    langMarkers.toMap.apply(lang)
      .map(w => wordOccurrences(text, w))
      .reduce(_ + _)

  /** N-gram-heuristic language ID: argmax of marker scores; on ties the
    * first-listed language wins (CASE chain, same shape as the oracle SQL).
    */
  def langId(text: Column): Column = {
    val scores = langMarkers.map { case (l, _) => l -> langScore(text, l) }
    val cases = scores.zipWithIndex.init.map { case ((l, s), i) =>
      val later = scores.drop(i + 1)
      (later.map(x => s >= x._2).reduce(_ && _), lit(l))
    }
    // NULL text has no language: every score is null, every `>=` is
    // null, so the chain falls to the ELSE — which used to confidently
    // classify the null document as the LAST-listed language. The guard
    // lives on the ELSE LEAF (when(text.isNotNull, last)), NOT as a
    // wrapper around the whole chain: wrapping pushed the 25 score
    // subexpressions into a conditional branch, which DISABLES Spark's
    // subexpression elimination and measured 2× on the confusion
    // queries (q227 warm 0.98 → 1.9 s). The oracle's CASE carries the
    // equivalent leading `WHEN s_en IS NULL THEN NULL` branch.
    cases.foldRight(when(text.isNotNull, lit(scores.last._1)): Column) {
      case ((cond, v), els) => when(cond, v).otherwise(els)
    }
  }

  /** Quality heuristics: token count, mean token length, stopword ratio,
    * and a combined score. All integer/exact arithmetic so the oracle
    * matches bitwise.
    */
  def meanTokenLen(text: Column): Column =
    (length(strReplace(text, " ", "")).cast("double")) / tokenCount(text)

  val stopwords: Seq[String] = Seq("the", "a", "of", "and", "to", "in", "is")

  def stopwordCount(text: Column): Column =
    stopwords.map(w => wordOccurrences(text, w)).reduce(_ + _)

  def stopwordRatio(text: Column): Column =
    stopwordCount(text).cast("double") / tokenCount(text)

  /** Gopher-style (Rae et al. 2021, "Scaling Language Models") document
    * quality rules, each in exact cross-multiplied integer arithmetic so
    * the oracle matches bit-for-bit — no float ratios anywhere:
    *
    *   - `too_short`     n_tokens < 30 (the word-count floor)
    *   - `repetitive`    distinct/total token ratio < 0.45
    *                     (the duplicate-content analogue of Gopher's
    *                     duplicate-line fraction; this corpus has no
    *                     newlines, so the unit is the token)
    *   - `long_words`    mean token length > 4.5 (as `sum_len*2 > n*9`)
    *   - `low_stopword`  stopword ratio < 0.05 (Gopher's "no stop words"
    *                     rule, against [[stopwords]])
    *
    * Thresholds sit inside this corpus's observed spread so BOTH branch
    * populations stay live at every SF (probed at sf0.001/0.01/0.1).
    * Pure codegen'd HOF arithmetic — zero shuffles until the caller
    * aggregates.
    */
  def gopherFlags(text: Column): Column = {
    val tk = tokens(text)
    val n = size(tk).cast("long")
    val nd = size(array_distinct(tk)).cast("long")
    val sumLen = length(strReplace(text, " ", "")).cast("long")
    val stop = stopwordCount(text)
    struct(
      (n < 30).as("too_short"),
      (nd * 100 < n * 45).as("repetitive"),
      (sumLen * 2 > n * 9).as("long_words"),
      (stop * 20 < n).as("low_stopword"))
  }

  def qualityScore(text: Column): Column =
    least(tokenCount(text).cast("double") / lit(64.0), lit(1.0)) * lit(0.5) +
      stopwordRatio(text) * lit(0.5)

  /** PII patterns for training-corpus scrubbing. ASCII-only classes keep
    * the patterns portable between Java regex (Spark) and RE2 (the
    * DuckDB oracle) — same portability rule as [[BpeishPattern]] — but
    * the unbounded greedy `+` quantifiers mean equivalence is PINNED
    * EMPIRICALLY by q114's oracle sweep, not guaranteed by construction
    * (Java is leftmost-first, RE2 leftmost-longest; adversarial text
    * could in principle split a match differently — the oracle gate is
    * the authority). Deliberately simple recall-oriented shapes (the
    * standard scrubbing pass runs BEFORE tokenization; precision tuning
    * is a policy knob, not an engine concern).
    */
  val EmailPattern = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
  val PhonePattern = "555-[0-9]{4}"
  val IpPattern = "[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}\\.[0-9]{1,3}"

  /** Count of non-overlapping matches of `pattern` — codegen'd
    * regexp_count, no UDF.
    */
  def piiCount(text: Column, pattern: String): Column =
    regexp_count(text, lit(pattern)).cast("long")

  /** Redact emails, then phone numbers, then IPs (email first: its
    * domain contains dots that the IP pattern must never see). Three
    * chained codegen'd regexp_replace passes — scan speed, linear in
    * document length.
    */
  def redactPii(text: Column): Column = {
    val noEmail = regexp_replace(text, EmailPattern, "<EMAIL>")
    val noPhone = regexp_replace(noEmail, PhonePattern, "<PHONE>")
    regexp_replace(noPhone, IpPattern, "<IP>")
  }

  /** Overlapping token-window chunking — the context-window preparation
    * stage: split each document's whitespace tokens into chunks of
    * `chunkSize` tokens advancing by `chunkSize - overlap`, so
    * consecutive chunks share `overlap` tokens and no token is dropped
    * (the final chunk may be shorter; a doc of ≤ chunkSize tokens is one
    * chunk). All-integer position arithmetic + array slicing — pure
    * codegen'd map work, zero shuffle at any corpus size.
    *
    * Returns one row per chunk: (idCol, chunk_id, chunk, n_tokens).
    */
  /** NULL-TEXT CONTRACT (deliberate, = SQL null semantics, shared by
    * the per-doc text operators): a row with NULL text emits ZERO
    * chunks and drops silently — split(null) is null, and the explode
    * over a null chunk sequence expands to no rows, the same way the
    * scalar operators here map null text to null scores (langId,
    * qualityScore) and the event-time operators drop null-ts rows.
    * Failing by name was considered and DECLINED: null text is a
    * routine corpus state (empty crawl records), and a pipeline-killing
    * error for it would force every caller to pre-filter; callers
    * auditing the volume use [[Validate]] NotNull. Pinned by
    * DegenerateInputSpec ("resample/chunkTokens null-row contract").
    */
  def chunkTokens(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      chunkSize: Int = 32,
      overlap: Int = 8): org.apache.spark.sql.DataFrame = {
    require(chunkSize > overlap && overlap >= 0,
      s"need chunkSize > overlap >= 0, got chunkSize=$chunkSize overlap=$overlap")
    val stride = chunkSize - overlap
    df.select(col(idCol), split(col(textCol), " ").as("__toks"))
      .withColumn("__n", size(col("__toks")))
      // chunks = 1 + ceil((n - chunkSize) / stride) for n > chunkSize
      .withColumn("__nc", expr(
        s"CASE WHEN __n <= $chunkSize THEN 1 " +
          s"ELSE 1 + (__n - $chunkSize + ${stride - 1}) div $stride END"))
      .select(col(idCol), col("__toks"), col("__n"),
        explode(expr("sequence(0, __nc - 1)")).as("__i"))
      .withColumn("__start", lit(1) + lit(stride) * col("__i"))
      .withColumn("__len",
        least(lit(chunkSize), col("__n") - col("__start") + lit(1)))
      .select(col(idCol), col("__i").cast("long").as("chunk_id"),
        concat_ws(" ", slice(col("__toks"), col("__start"), col("__len")))
          .as("chunk"),
        col("__len").cast("long").as("n_tokens"))
  }

  /** Per-document out-of-vocabulary stats against a corpus-derived
    * reference vocabulary — the OOV-rate curation filter (drop docs
    * whose tokens mostly fall outside the common vocabulary: boilerplate
    * codes, mangled encodings, wrong-domain text).
    *
    * Vocabulary = tokens whose document frequency reaches `vocabPct` %
    * of the corpus, computed IN-PLAN (one distinct + one agg + a 1-row
    * count join, the q85 buildRelative shape). The vocab is
    * corpus-size-INDEPENDENT by construction: tokens with df >=
    * p%·N number at most (avg distinct tokens/doc)·100/p, so the
    * broadcast stays model-sized at 100 TB while the corpus only ever
    * streams through one explode + one per-doc aggregation.
    *
    * Returns (idCol, n_tokens, n_oov) — n_oov counts occurrences (with
    * multiplicity) outside the vocabulary. Callers gate with exact
    * integer cross-multiplication, e.g. n_oov·5 <= n_tokens for a 20%
    * ceiling.
    */
  def oovStats(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      vocabPct: Int = 5): org.apache.spark.sql.DataFrame = {
    require(vocabPct > 0 && vocabPct <= 100, s"vocabPct in (0,100], got $vocabPct")
    val toks = df.select(col(idCol), explode(tokens(col(textCol))).as("__tok"))
    val nDocs = df.agg(count(lit(1)).as("__n"))
    val vocab = toks.select(col(idCol), col("__tok")).distinct()
      .groupBy("__tok").agg(count(lit(1)).as("__df"))
      .join(broadcast(nDocs))
      .where(col("__df") * 100 >= col("__n") * vocabPct)
      .select(col("__tok"), lit(1).as("__in"))
    // the vocab broadcast is SAFE at any corpus size (unlike the q187
    // class): the RELATIVE df threshold bounds it by construction —
    // tokens in >= vocabPct% of docs number at most
    // (avg distinct tokens per doc) x 100/vocabPct, independent of N
    toks.join(broadcast(vocab), Seq("__tok"), "left")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        sum(when(col("__in").isNull, 1L).otherwise(0L)).as("n_oov"))
  }

  /** Deterministic T5-style span corruption — the denoising-objective
    * pair generator: group each document's whitespace tokens into
    * consecutive spans of `spanWidth`, mask one span in `maskOneIn`
    * (selected by a deterministic multiplicative mix over (doc id, span
    * index) — the q82 RNG-free pattern, so the DuckDB oracle replays
    * the selection bit-for-bit), and emit the (input, target) pair:
    * input keeps unmasked tokens with each masked span collapsed to its
    * `<extra_N>` sentinel; target carries the masked spans, each
    * prefixed by its sentinel.
    *
    * All work is `transform`/`filter` higher-order functions over the
    * token array plus one hash per row — pure codegen'd map work, ZERO
    * shuffles at any corpus size. Overflow envelope: the doc-id mix
    * reduces mod 1e9+7 before the span mix, so every intermediate stays
    * under (1e9+7 + n_spans)·2654435761 < 2^63 for any document below
    * ~2.4e9 spans (2^63/2654435761 ≈ 3.47e9 minus the 1e9+7 hash
    * headroom — SCALE.md §Integer-overflow envelope).
    *
    * Returns (idCol, input, target, n_tokens, n_masked); a document
    * with no masked span keeps input = text, target = ''.
    */
  def spanCorrupt(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String,
      spanWidth: Int = 3,
      maskOneIn: Int = 5): org.apache.spark.sql.DataFrame = {
    require(spanWidth > 0 && maskOneIn > 1,
      s"need spanWidth > 0 and maskOneIn > 1, got $spanWidth / $maskOneIn")
    val w = spanWidth
    val m = maskOneIn
    // per-doc hash, reduced mod 1e9+7 so the per-span remix can't overflow
    val h = Sampling.idMix(col(idCol))
    val masked = s"((__h + i div $w) * 2654435761) % $m = 0"
    df.select(col(idCol), col(textCol).as("__text"))
      .withColumn("__h", h)
      .withColumn("__toks", split(col("__text"), " "))
      .select(col(idCol),
        expr(s"""array_join(transform(__toks, (t, i) -> CASE
              WHEN NOT ($masked) THEN t
              WHEN i % $w = 0 THEN concat('<extra_', CAST(i div $w AS STRING), '>')
            END), ' ')""").as("input"),
        expr(s"""array_join(transform(__toks, (t, i) -> CASE
              WHEN ($masked) AND i % $w = 0
                THEN concat('<extra_', CAST(i div $w AS STRING), '> ', t)
              WHEN ($masked) THEN t
            END), ' ')""").as("target"),
        size(col("__toks")).cast("long").as("n_tokens"),
        expr(s"size(filter(__toks, (t, i) -> $masked))").cast("long")
          .as("n_masked"))
  }

  /** Per-group unigram distribution drift vs the whole corpus, as EXACT
    * total-variation distance over cross-multiplied integer counts —
    * the corpus-mixture monitor (is one source's token distribution
    * diverging from the blend it feeds?). With per-group count c, group
    * total t_g, global count c_gl and global total t_all:
    *
    *   tv_num = Σ_{tok∈g} |c·t_all − c_gl·t_g| + t_g·(t_all − Σ_{tok∈g} c_gl)
    *
    * (the second term is the mass of tokens the group never emits),
    * and TV = tv_num / (2·t_g·t_all) ∈ [0,1]. All integer arithmetic —
    * both engines agree bit-for-bit; `tv_permille` = (500·tv_num) div
    * (t_g·t_all) is the human-readable projection.
    *
    * Shuffle shape: ONE hash aggregation on (group, token); the global
    * and per-group totals are re-aggregations of that same relation
    * (exchange-reused at physical planning, the q123 tf/df shape), the
    * token-level rejoin rides the same token key, and both totals
    * broadcast. Overflow envelope: the binding product is
    * (max per-group token count)·t_all < 2^63 — a token holding a
    * constant fraction f of the corpus binds at t_all ~ sqrt(2^63/f),
    * ~10^10 tokens at f = 0.1; past that, downscale counts to
    * fixed-point probabilities first (the distance is scale-invariant
    * — SCALE.md).
    */
  def unigramDrift(
      df: org.apache.spark.sql.DataFrame,
      groupCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    val cnt = df
      .select(col(groupCol).as("__g"), explode(tokens(col(textCol))).as("__tok"))
      .groupBy("__g", "__tok").agg(count(lit(1)).as("__c"))
    val glob = cnt.groupBy("__tok").agg(sum("__c").as("__cgl"))
    val totG = cnt.groupBy("__g").agg(sum("__c").as("__tg"))
    val totAll = glob.agg(sum("__cgl").as("__tall"))
    cnt.join(glob, "__tok")
      .join(broadcast(totG), "__g")
      .join(broadcast(totAll))
      .groupBy(col("__g"), col("__tg"), col("__tall"))
      .agg(sum(abs(col("__c") * col("__tall") - col("__cgl") * col("__tg")))
          .as("__main"),
        sum(col("__cgl")).as("__present"))
      .select(col("__g").as(groupCol),
        (col("__main") + col("__tg") * (col("__tall") - col("__present")))
          .as("tv_num"),
        col("__tg").as("n_group"), col("__tall").as("n_total"))
      .withColumn("tv_permille",
        expr("(500 * tv_num) div (n_group * n_total)"))
  }

  /** Frequency-ranked dictionary encoding — the "tokenize to ids"
    * stage of a training pipeline: build the vocabulary token→id map
    * with ids assigned by (count DESC, token ASC) rank, then encode
    * every document as its id sequence (space-joined string, so the
    * oracle compares exactly).
    *
    * The vocabulary ranking runs in a single-partition window — correct
    * BY DESIGN, not a bottleneck: the vocab is model-sized (distinct
    * tokens, not occurrences; bounded by the token inventory however
    * large the corpus), the same contract as oovStats' broadcast. The
    * corpus itself only ever streams through one posexplode + one
    * broadcast join + one per-doc aggregation; position order is
    * restored by array_sort over (pos, id) structs, never by
    * collect_list arrival order.
    */
  def vocabEncode(
      df: org.apache.spark.sql.DataFrame,
      idCol: String,
      textCol: String): org.apache.spark.sql.DataFrame = {
    import org.apache.spark.sql.expressions.Window
    val tk = df.select(col(idCol),
      posexplode(tokens(col(textCol))).as(Seq("__pos", "__tok")))
    val vocab = tk.groupBy("__tok").agg(count(lit(1)).as("__c"))
      .select(col("__tok"),
        (row_number().over(
          Window.orderBy(col("__c").desc, col("__tok").asc)) - 1)
          .cast("long").as("__tid"))
    tk.join(broadcast(vocab), "__tok")
      .groupBy(idCol)
      .agg(count(lit(1)).as("n_tokens"),
        array_join(
          transform(
            array_sort(collect_list(struct(col("__pos"), col("__tid")))),
            s => s.getField("__tid").cast("string")),
          " ").as("ids"))
  }

  /** Rolling polynomial hash over the characters of the document:
    * fold acc = (acc * 31 + codepoint) mod 1e9+7. Order-sensitive,
    * O(len). Runs as the native codegen'd
    * [[graft.functions.RollingFingerprint]] — the original `aggregate`
    * HOF evaluated an interpreted expression tree per CHARACTER, the
    * per-row hot loop this file otherwise avoids; semantics unchanged
    * (OperatorsSpec pins the driver-side replay, q25's oracle pins
    * DuckDB parity).
    */
  def fingerprint(text: Column): Column =
    graft.functions.exprs.rollingFingerprint(text, FingerprintMod)
}
