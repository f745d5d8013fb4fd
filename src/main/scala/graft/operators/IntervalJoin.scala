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
    *
    * NULL bounds follow SQL join semantics: the overlap predicate is
    * null-valued, so a null-bounded row matches NOTHING and drops from
    * the output (Catalyst infers the isnotnull constraint and prunes at
    * the scan — same result either way). Bounds must otherwise be
    * NONNEGATIVE with start ≤ end — each violation would corrupt
    * results SILENTLY rather than loudly (inverted bounds: `sequence`
    * infers a NEGATIVE step, emits descending bins, and an empty
    * interval can still "overlap"; negative bounds: `div` truncates
    * toward zero ≠ floor, breaking the counting-cell dedup rule). The
    * operator fails fast with a named per-row error on those (the
    * [[Skyline]] discipline) — filter or impute before the join.
    *
    * Guard scope, precisely: the fail-fast applies to rows with BOTH
    * bounds non-null. A row pairing a negative bound with a NULL bound
    * (e.g. start = -3, end = NULL) is pruned by the inferred isnotnull
    * filters BEFORE the guarded bin expression evaluates, so it drops
    * silently under the null semantics above rather than raising — it
    * matches nothing either way (the corruption modes the guard exists
    * for need two concrete bounds), but the error is not raised for it.
    * Pinned by OperatorsSpec ("contract violations fail fast").
    */
  def overlapJoin(
      a: DataFrame,
      b: DataFrame,
      aStart: Column, aEnd: Column,
      bStart: Column, bEnd: Column,
      binWidth: Long): DataFrame = {
    require(binWidth > 0, s"binWidth must be positive, got $binWidth")
    // bookkeeping-name collision fail-fast (the AsOfJoin/Merge
    // discipline): withColumn REPLACES a same-named caller column
    // silently, and the final drop() then deletes the caller's data
    // column from the output
    locally {
      val reserved = Seq("__s_a", "__e_a", "__s_b", "__e_b", "__bin")
      val clash = (a.columns ++ b.columns).filter(reserved.contains)
      require(clash.isEmpty,
        s"IntervalJoin.overlapJoin: input column(s) ${clash.distinct.mkString(", ")} " +
          "collide with join bookkeeping — rename them first")
    }
    // the guard rides inside the bin expression so column pruning can
    // never drop it; raise_error's NullType coerces into the CASE.
    // Null bounds make both comparisons null -> ELSE -> sequence(null,…)
    // is null -> explode drops the row, matching the SQL semantics above.
    // coalesce in the MESSAGE only: if the raise branch is ever reached
    // with one null bound (plan-shape drift past today's isnotnull
    // pruning), raise_error must still throw a NAMED error, not a null
    // message that no error-matching caller would recognize.
    def guardedBins(s: String, e: String, side: String) = expr(
      s"""CASE WHEN $s < 0 OR $e < $s
         |THEN raise_error(concat(
         |  'IntervalJoin.overlapJoin: $side interval must have',
         |  ' nonnegative start <= end; got [',
         |  coalesce(cast($s as string), 'NULL'),
         |  ', ', coalesce(cast($e as string), 'NULL'),
         |  '] - filter or impute before the join'))
         |ELSE sequence($s div $binWidth, $e div $binWidth) END""".stripMargin)
    // `div` truncates toward zero = floor on the NONNEGATIVE grid units
    // the guard above enforces (epoch-based times already are)
    val aBinned = a
      .withColumn("__s_a", aStart.cast("long"))
      .withColumn("__e_a", aEnd.cast("long"))
      .withColumn("__bin", explode(guardedBins("__s_a", "__e_a", "left")))
    val bBinned = b
      .withColumn("__s_b", bStart.cast("long"))
      .withColumn("__e_b", bEnd.cast("long"))
      .withColumn("__bin", explode(guardedBins("__s_b", "__e_b", "right")))
    aBinned.join(bBinned, Seq("__bin"))
      .where(col("__s_a") <= col("__e_b") && col("__s_b") <= col("__e_a"))
      // counting-cell rule: exactly one cell owns each overlapping pair
      .where(col("__bin") ===
        expr(s"greatest(__s_a, __s_b) div $binWidth"))
      .drop("__bin", "__s_a", "__e_a", "__s_b", "__e_b")
  }
}
