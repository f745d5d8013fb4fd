package graft.stats

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Space-Saving heavy-hitters sketch (Metwally et al., ICDT'05) as a
  * mergeable typed [[Aggregator]]: fixed k counters per group, O(k)
  * reduce worst case, pairwise merge per the mergeable-summaries
  * construction (Agarwal et al., PODS'12) — an absent key charges the
  * other sketch's minimum counter as both estimate and error, sums
  * stay overestimates, and the result truncates back to the top k.
  *
  * Invariants maintained through ANY merge tree (the q112 gate):
  *   est − err ≤ true-count ≤ est   for every reported item, and
  *   |reported| = min(k, distinct items in the group).
  * Item SET beyond the guarantees may vary with partitioning (inherent
  * to the sketch); contracts, not contents, are what is stable.
  *
  * At 100 TB: exact per-group top-k term counting re-keys the corpus
  * by (group, token); this ships k counters per partition per group —
  * the same partial-aggregation shape as the histogram and HLL stats.
  */
final class SpaceSavingAgg(k: Int)
    extends Aggregator[String, Map[String, (Long, Long)], Seq[(String, Long, Long)]] {
  require(k >= 1, "k must be >= 1")

  override def zero: Map[String, (Long, Long)] = Map.empty

  override def reduce(b: Map[String, (Long, Long)], v: String): Map[String, (Long, Long)] = {
    if (v == null) b
    else b.get(v) match {
      case Some((est, err)) => b.updated(v, (est + 1, err))
      case None if b.size < k => b.updated(v, (1L, 0L))
      case None =>
        // evict the deterministic minimum: (est, item) ordering
        val (evKey, (m, _)) = b.minBy { case (key, (est, _)) => (est, key) }
        (b - evKey).updated(v, (m + 1, m))
    }
  }

  override def merge(a: Map[String, (Long, Long)],
      b: Map[String, (Long, Long)]): Map[String, (Long, Long)] = {
    if (a.isEmpty) b
    else if (b.isEmpty) a
    else {
      // a non-full sketch saw its whole substream: absent key truly
      // has count 0 there; a full sketch charges its min counter
      val ma = if (a.size < k) 0L else a.values.map(_._1).min
      val mb = if (b.size < k) 0L else b.values.map(_._1).min
      val combined = (a.keySet ++ b.keySet).toSeq.map { x =>
        val (e1, r1) = a.getOrElse(x, (ma, ma))
        val (e2, r2) = b.getOrElse(x, (mb, mb))
        x -> (e1 + e2, r1 + r2)
      }
      combined.sortBy { case (key, (est, _)) => (-est, key) }.take(k).toMap
    }
  }

  override def finish(b: Map[String, (Long, Long)]): Seq[(String, Long, Long)] =
    b.toSeq.map { case (key, (est, err)) => (key, est, err) }
      .sortBy { case (key, est, _) => (-est, key) }

  override def bufferEncoder: Encoder[Map[String, (Long, Long)]] =
    ExpressionEncoder[Map[String, (Long, Long)]]()
  override def outputEncoder: Encoder[Seq[(String, Long, Long)]] =
    ExpressionEncoder[Seq[(String, Long, Long)]]()
}

object SpaceSavingAgg {
  /** Column form: `space_saving(col)` usable in any `agg(...)`. */
  def column(c: Column, k: Int): Column =
    udaf(new SpaceSavingAgg(k), Encoders.STRING).apply(c)
}
