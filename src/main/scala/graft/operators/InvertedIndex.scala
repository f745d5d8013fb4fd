package graft.operators

import org.apache.spark.sql.{Column, DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Inverted-index build (token -> document frequency + sorted posting
  * list) with the stopword-skew cap SCALE.md calls for.
  *
  * The naive `groupBy(token).agg(collect_list(doc_id))` is a
  * single-reducer OOM at 100 TB: a stopword's posting list is
  * corpus-sized and lands in ONE aggregation buffer. The fix is
  * two-fold, both inside one shuffle:
  *
  *   - postings accumulate through [[BoundedSmallestAgg]], a typed
  *     Aggregator whose buffer is a max-heap capped at `maxDf + 1`
  *     elements (the smallest ids win), with map-side partial merge —
  *     a stopword costs O(maxDf) memory per buffer, never O(corpus);
  *   - tokens whose exact `count` exceeds `maxDf` are dropped after the
  *     agg (stopword pruning). Kept tokens have df <= maxDf, so their
  *     capped list is provably the COMPLETE sorted posting list — the
  *     cap never truncates a surviving row.
  *
  * (No index surface exists in the reference; north-star retrieval
  * operator, built Spark-first.)
  */
object InvertedIndex {

  /** Accumulates the `bound` smallest non-null longs seen, as a sorted
    * sequence. Buffer layout: `buf(0)` = current size n, `buf(1..n)` = a
    * binary max-heap (root at 1), capacity grown geometrically up to
    * `bound + 1` — so small groups stay small and heavy groups stay
    * capped. O(log bound) per row, O(bound) merge.
    */
  final class BoundedSmallestAgg(bound: Int)
      extends Aggregator[java.lang.Long, Array[Long], Seq[Long]] {
    require(bound > 0, s"bound must be positive, got $bound")

    override def zero: Array[Long] = Array(0L)

    private def siftDown(h: Array[Long], i0: Int): Unit = {
      val n = h(0).toInt
      var i = i0
      var done = false
      while (!done) {
        val l = 2 * i; val r = l + 1
        var m = i
        if (l <= n && h(l) > h(m)) m = l
        if (r <= n && h(r) > h(m)) m = r
        if (m == i) done = true
        else { val t = h(i); h(i) = h(m); h(m) = t; i = m }
      }
    }

    private def push(h0: Array[Long], v: Long): Array[Long] = {
      val n = h0(0).toInt
      if (n < bound) {
        val h = if (n + 1 >= h0.length) {
          val grown = new Array[Long](math.min(bound + 1, math.max(h0.length * 2, 2)))
          System.arraycopy(h0, 0, grown, 0, h0.length)
          grown
        } else h0
        // sift up
        var i = n + 1
        h(i) = v
        h(0) = n + 1
        while (i > 1 && h(i / 2) < h(i)) {
          val t = h(i); h(i) = h(i / 2); h(i / 2) = t; i = i / 2
        }
        h
      } else if (v < h0(1)) { // full: replace the largest kept value
        h0(1) = v
        siftDown(h0, 1)
        h0
      } else h0
    }

    override def reduce(b: Array[Long], v: java.lang.Long): Array[Long] =
      if (v == null) b else push(b, v.longValue())

    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var h = a
      var i = 1
      val n = b(0).toInt
      while (i <= n) { h = push(h, b(i)); i += 1 }
      h
    }

    override def finish(b: Array[Long]): Seq[Long] =
      b.slice(1, b(0).toInt + 1).sorted.toIndexedSeq

    override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
    override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
  }

  /** `bounded_smallest(col, bound)` as a Column for any `agg(...)`. */
  def boundedSmallest(c: Column, bound: Int): Column =
    udaf(new BoundedSmallestAgg(bound), Encoders.LONG).apply(c)

  /** Build the index over (idCol, textCol): whitespace tokens, distinct
    * per doc, tokens with df > maxDf dropped. One explode + ONE
    * aggregation shuffle; every agg buffer is bounded by maxDf + 1.
    * Postings serialize as a comma-joined string (the export format).
    */
  def build(docs: DataFrame, idCol: String, textCol: String, maxDf: Long): DataFrame = {
    val cap = math.min(maxDf + 1, Int.MaxValue.toLong).toInt
    docs
      // a NULL doc id would count into df (count(lit(1))) but be skipped
      // by the bounded-smallest postings aggregator — breaking the
      // documented "df == |postings| for surviving tokens" completeness
      // invariant that intersection sizing trusts. A document without an
      // id cannot be indexed; exclude it from BOTH sides.
      .where(col(idCol).isNotNull)
      .select(col(idCol).as("__doc_id"),
        explode(array_distinct(split(col(textCol), " "))).as("token"))
      .groupBy("token")
      .agg(count(lit(1)).as("df"),
        boundedSmallest(col("__doc_id"), cap).as("__postings"))
      .where(col("df") <= maxDf)
      .select(col("token"), col("df"),
        array_join(transform(col("__postings"), _.cast("string")), ",").as("postings"))
  }

  /** [[build]] with a RELATIVE cap — drop tokens present in more than
    * num/den of all documents — computed entirely IN-PLAN: constructing
    * the query runs no Spark jobs (so a plan-only audit stays plan-only),
    * and the doc count rides along as a broadcast single-row join
    * instead of a driver-side action.
    *
    * The price of not knowing the cap at plan-build time is a second
    * pass over the exploded token stream (df-filter first, collect
    * postings for survivors only) instead of [[build]]'s single capped-
    * heap aggregation. Both are skew-safe: here every collect_list
    * buffer is bounded by the survivor guarantee df <= cap. With a KNOWN
    * absolute cap, prefer [[build]] — one shuffle instead of two.
    */
  def buildRelative(docs: DataFrame, idCol: String, textCol: String,
      num: Int, den: Int): DataFrame = {
    require(num > 0 && den > 0, s"cap fraction must be positive, got $num/$den")
    val exploded = docs
      .select(col(idCol).as("__doc_id"),
        explode(array_distinct(split(col(textCol), " "))).as("token"))
    // integer threshold: floor(count * num / den), SQL `div` (never `/`
    // — Column./ is double division; float-parity discipline)
    val thresh = docs.agg(expr(s"count(1) * $num div $den").as("__max_df"))
    val kept = exploded
      .join(broadcast(thresh)) // 1-row broadcast: lazy scalar "subquery"
      .groupBy("token")
      .agg(count(lit(1)).as("df"), first(col("__max_df")).as("__max_df"))
      .where(col("df") <= col("__max_df"))
      .select("token", "df")
    exploded.join(kept, Seq("token"))
      .groupBy("token")
      .agg(first(col("df")).as("df"),
        sort_array(collect_list(col("__doc_id"))).as("__postings"))
      .select(col("token"), col("df"),
        array_join(transform(col("__postings"), _.cast("string")), ",").as("postings"))
  }

  /** Positional phrase matching — the POSITIONAL-index query the plain
    * df/postings index can't answer: every occurrence of the exact
    * consecutive token sequence `phrase`, as one (id, pos) row per hit
    * (pos = 0-based position of the phrase's first token).
    *
    * The token stream is filtered to the phrase's own tokens BEFORE any
    * shuffle, so the joins move per-phrase-token postings (two longs a
    * row), never the corpus: a k-token phrase is k−1 equi-joins on
    * (doc, pos + offset) — the standard positional-postings
    * intersection, with AQE free to broadcast the rarest token's side.
    * Adjacency lives in the join KEY (pos arithmetic), so there is no
    * per-document array materialization and a 100 TB corpus shuffles
    * only its occurrences of the phrase tokens.
    */
  def phraseMatches(docs: DataFrame, idCol: String, textCol: String,
      phrase: Seq[String]): DataFrame = {
    require(phrase.nonEmpty, "phrase must have at least one token")
    require(phrase.forall(w => w.nonEmpty && !w.contains(" ")),
      s"phrase tokens must be non-empty and space-free, got $phrase")
    val p = docs
      .select(col(idCol).as("__doc_id"),
        posexplode(split(col(textCol), " ")).as(Seq("__pos", "__w")))
      .where(col("__w").isin(phrase.distinct: _*))
    val first = p.where(col("__w") === phrase.head)
      .select(col("__doc_id"), col("__pos"))
    phrase.zipWithIndex.drop(1).foldLeft(first) { case (acc, (w, k)) =>
      val nxt = p.where(col("__w") === w)
        .select(col("__doc_id").as("__d2"), col("__pos").as("__p2"))
      acc.join(nxt, acc("__doc_id") === nxt("__d2") &&
          nxt("__p2") === acc("__pos") + k)
        .select(acc("__doc_id"), acc("__pos"))
    }
  }
}
