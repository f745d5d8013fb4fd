package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Interval-overlap join WITHOUT an equi key — the class Spark's
  * planner turns into a broadcast-nested-loop or cartesian product if
  * expressed naively as `a.start <= b.end && b.start <= a.end`.
  *
  * Implementation is the grid-bucketing rewrite (the published "range
  * join optimization" technique): quantize every interval to the
  * `binWidth` grid cells it touches, equi-join on the cell id (a plain
  * shuffled hash join), then re-check the exact overlap predicate
  * inside each cell. A pair of intervals can share MANY cells, so the
  * join would emit duplicates; instead of a `distinct()` (an extra
  * corpus-sized shuffle) each surviving pair is kept exactly once by
  * the counting-cell rule: keep iff the joined cell is the FIRST cell
  * of the overlap region, `bin == floor(max(aStart, bStart) / W)` —
  * every true overlap has exactly one such cell, so the output is
  * duplicate-free by construction.
  *
  * Scale posture: shuffle volume is rows × (interval span / binWidth
  * + 1) — choose binWidth near the median interval length so the
  * fan-out is a small constant; the cell key spreads uniformly, and a
  * pathological hot cell (everything overlapping one instant) is the
  * data's own output size, not an artifact of the algorithm. No
  * cross join, no bnlj, no distinct — two explodes and ONE equi-join
  * shuffle.
  */
object IntervalJoin {

  /** Overlap pairs of `a` × `b` where [aStart, aEnd] ∩ [bStart, bEnd]
    * is non-empty (closed intervals, long grid units). Callers prefix
    * their columns distinctly; the result carries all columns of both
    * sides.
    */
  def overlapJoin(
      a: DataFrame,
      b: DataFrame,
      aStart: Column, aEnd: Column,
      bStart: Column, bEnd: Column,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    // `div` truncates toward zero = floor on the NONNEGATIVE grid units
    // this operator contracts for (epoch-based times already are)
    val aBinned = a
      .withColumn("__s_a", aStart.cast("long"))
      .withColumn("__e_a", aEnd.cast("long"))
      .withColumn("__bin",
        explode(expr(s"sequence(__s_a div $binWidth, __e_a div $binWidth)")))
    val bBinned = b
      .withColumn("__s_b", bStart.cast("long"))
      .withColumn("__e_b", bEnd.cast("long"))
      .withColumn("__bin",
        explode(expr(s"sequence(__s_b div $binWidth, __e_b div $binWidth)")))
    aBinned.join(bBinned, Seq("__bin"))
      .where(col("__s_a") <= col("__e_b") && col("__s_b") <= col("__e_a"))
      // counting-cell rule: exactly one cell owns each overlapping pair
      .where(col("__bin") ===
        expr(s"greatest(__s_a, __s_b) div $binWidth"))
      .drop("__bin", "__s_a", "__e_a", "__s_b", "__e_b")
  }
}
