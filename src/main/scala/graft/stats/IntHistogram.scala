package graft.stats

/** Predicate comparison ops — mirrors the six ops of the reference
  * (`/root/reference/src/include/operators/seq_scan.h:19-26`).
  */
sealed abstract class PredicateOp(val sql: String)
object PredicateOp {
  case object EQ extends PredicateOp("=")
  case object NE extends PredicateOp("<>")
  case object LT extends PredicateOp("<")
  case object LE extends PredicateOp("<=")
  case object GT extends PredicateOp(">")
  case object GE extends PredicateOp(">=")
  val all: Seq[PredicateOp] = Seq(EQ, NE, LT, LE, GT, GE)
}

/** Equi-width integer histogram with O(1) add and O(buckets) space.
  *
  * Semantics follow the reference's IntHistogram
  * (`/root/reference/src/optimizer/table_stats.cc:25-139`):
  *   - span  = max(1.0, (1 + max - min) / buckets)   [real-valued]
  *   - bucket(v) = min(floor((v - min) / span), buckets - 1)
  *   - out-of-range adds are ignored; ntups counts in-range rows only.
  *
  * A second REPLICATED quirk (cite-and-decide, like the integer-division
  * wart below): the reference's range shortcuts test `v <= min_v` BEFORE
  * `v >= max_v` (`table_stats.cc:83-90`), so on a CONSTANT column
  * (min == max == c) GT(c) returns 1.0 where the truth is 0.0, and LE(c)
  * = 1 − GT(c) returns 0.0 where the truth is 1.0 — and on any histogram
  * GT(min)/LT(max) round the boundary value's own frequency away to 1.0.
  * Kept because the estimates feed only join-ORDER costs (never
  * results), the ported reference tests pin the formulas as written,
  * and IntHistogramSpec pins this boundary behavior by name so the
  * divergence from truth is documented, not accidental.
  *
  * One deliberate fix vs the reference: its GT branch computes the
  * partial-bucket term as `(h/ntups) * ((min + (b+1)*span - v)/span)`
  * with C++ integer division (`table_stats.cc:96`, `h / ntups` on ints),
  * which truncates the whole term to 0. The real-valued version of that
  * exact formula would OVERcount (the exclusive right edge counts `v`
  * itself as "greater than v"), breaking the reference's own LtTest
  * contract. We use the integer-domain strictly-greater fraction
  * `(min + (b+1)*span - (v+1)) / span`, clamped to [0, 1] — zero for
  * unit-span buckets (agreeing with the truncated reference on all its
  * tests) and the right value for wide buckets.
  *
  * The class is driver-side and tiny; the *distributed* build happens in
  * [[TableStats]] via a Spark aggregation, which then feeds bucket counts
  * in through [[addBucketCount]].
  */
/** THE definition of the reference span/bucket formulas — shared by the
  * driver-side class below and the distributed [[HistogramAgg]] build:
  * the two used to carry hand-mirrored copies, and a drift in either
  * would mis-assign every bucket with no error (addBucketCount only
  * range-checks the index).
  */
object IntHistogram {
  @inline def spanOf(minV: Long, maxV: Long, buckets: Int): Double =
    math.max(1.0, (1.0 + maxV - minV) / buckets)
  // v - minV in DOUBLE: long subtraction wraps when the column range
  // exceeds Long.MaxValue (minV = -2^62, v = 2^62 → -2^63) — a negative
  // index or silent mis-bucketing. Double precision at that magnitude is
  // approximate, but so are the bucket boundaries themselves.
  @inline def bucketIdx(v: Long, minV: Long, span: Double, buckets: Int): Int =
    math.min(((v.toDouble - minV) / span).toInt, buckets - 1)
}

final class IntHistogram(val buckets: Int, val minV: Long, val maxV: Long)
    extends Serializable {
  require(buckets > 0, "buckets must be positive")

  val span: Double = IntHistogram.spanOf(minV, maxV, buckets)
  private val counts = new Array[Long](buckets)
  private var nt: Long = 0L

  def ntups: Long = nt
  def bucketCounts: IndexedSeq[Long] = counts.toIndexedSeq

  // one shared formula (companion) — the overflow rationale lives there
  @inline def bucketOf(v: Long): Int =
    IntHistogram.bucketIdx(v, minV, span, buckets)

  /** O(1) ingest of one value; ignores out-of-range values. */
  def addValue(v: Long): Unit = {
    if (v >= minV && v <= maxV) {
      counts(bucketOf(v)) += 1
      nt += 1
    }
  }

  /** Bulk ingest used by the distributed build: `c` rows landed in
    * `bucket` (already computed with the same span formula).
    */
  def addBucketCount(bucket: Int, c: Long): Unit = {
    require(bucket >= 0 && bucket < buckets, s"bucket $bucket out of range")
    counts(bucket) += c
    nt += c
  }

  /** Estimated fraction of rows satisfying `value op v`. */
  def estimateSelectivity(op: PredicateOp, v: Long): Double = op match {
    case PredicateOp.EQ =>
      if (v < minV || v > maxV || nt == 0L) 0.0
      else (counts(bucketOf(v)) / span) / nt
    case PredicateOp.NE =>
      1.0 - estimateSelectivity(PredicateOp.EQ, v)
    case PredicateOp.GT =>
      if (v <= minV) 1.0
      else if (v >= maxV) 0.0
      else if (nt == 0L) 0.0
      else {
        val b = bucketOf(v)
        val h = counts(b).toDouble
        val frac = math.min(1.0, math.max(0.0,
          (minV + (b + 1) * span - (v + 1)) / span))
        val partial = (h / nt) * frac
        var right = 0L
        var i = b + 1
        while (i < buckets) { right += counts(i); i += 1 }
        partial + right.toDouble / nt
      }
    case PredicateOp.GE =>
      if (v < minV) 1.0
      // v - 1 would wrap to Long.MaxValue and price a keep-everything
      // predicate as keep-nothing (only reachable when minV is also
      // Long.MinValue — otherwise the v < minV branch caught it)
      else if (v == Long.MinValue) 1.0
      else if (v > maxV) 0.0
      else estimateSelectivity(PredicateOp.GT, v - 1)
    case PredicateOp.LT =>
      if (v <= minV) 0.0
      else if (v >= maxV) 1.0
      else 1.0 - estimateSelectivity(PredicateOp.GE, v)
    case PredicateOp.LE =>
      if (v < minV) 0.0
      else if (v > maxV) 1.0
      else 1.0 - estimateSelectivity(PredicateOp.GT, v)
  }
}
