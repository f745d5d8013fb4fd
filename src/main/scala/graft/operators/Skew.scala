package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Skew-mitigation operators for heavy-hitter keys. AQE's skew-join
  * handling (`spark.sql.adaptive.skewJoin.enabled`) covers sort-merge
  * joins at runtime; these explicit forms cover the cases AQE can't —
  * skewed aggregation input and broadcast-ineligible skewed joins — and
  * make the salting strategy deterministic and testable.
  */
object Skew {

  /** Deterministic salt in [0, buckets): spreads one hot group key over
    * `buckets` reducers. Uses a hash of salt-source columns (e.g. a
    * unique id) so re-runs partition identically.
    */
  def salt(saltSource: Column, buckets: Int): Column = {
    // fail at the driver, by name: buckets = 0 dies mid-job as an
    // ANSI DIVIDE_BY_ZERO deep inside pmod, and a negative count
    // "works" (pmod is non-negative) while silently hashing every row
    // into salt values no replicated side will carry
    require(buckets >= 1, s"salt buckets must be >= 1, got $buckets")
    pmod(xxhash64(saltSource), lit(buckets)).cast("int")
  }

  /** Two-stage salted aggregation: stage 1 aggregates on
    * (keys..., salt) — spreading each hot key over `buckets` partial
    * groups — stage 2 merges partials on the true keys. Supported
    * merges: count / sum / min / max (the algebraic ones that re-merge
    * losslessly).
    *
    * aggs: (outputName, "count" | "sum" | "min" | "max", valueColumn)
    */
  def saltedAggregate(
      df: DataFrame,
      keys: Seq[String],
      saltSource: Column,
      buckets: Int,
      aggs: Seq[(String, String, Column)]): DataFrame = {
    require(!df.columns.contains("__salt"),
      "saltedAggregate: input column '__salt' collides with the salt " +
        "bookkeeping — rename it first")
    val stage1 = df
      .withColumn("__salt", salt(saltSource, buckets))
      .groupBy((keys :+ "__salt").map(col): _*)
      .agg(
        aggs.head match { case (n, f, c) => partial(f, c).as(s"__p_$n") },
        aggs.tail.map { case (n, f, c) => partial(f, c).as(s"__p_$n") }: _*)
    stage1
      .groupBy(keys.map(col): _*)
      .agg(
        aggs.head match { case (n, f, _) => merge(f, col(s"__p_${n}")).as(n) },
        aggs.tail.map { case (n, f, _) => merge(f, col(s"__p_${n}")).as(n) }: _*)
  }

  private def partial(f: String, c: Column): Column = f match {
    case "count" => count(c)
    case "sum" => sum(c)
    case "min" => min(c)
    case "max" => max(c)
    case other => throw new IllegalArgumentException(s"unsupported agg: $other")
  }
  private def merge(f: String, c: Column): Column = f match {
    case "count" => sum(c) // counts merge by summing
    case "sum" => sum(c)
    case "min" => min(c)
    case "max" => max(c)
    case other => throw new IllegalArgumentException(s"unsupported agg: $other")
  }

  /** Salted equi-join for a skewed LEFT side against a smaller right
    * side: left rows get a deterministic salt in [0, buckets); the right
    * side is replicated once per salt value. The join key becomes
    * (key, salt), so one hot key spreads across `buckets` tasks instead
    * of stalling one. Replication factor = buckets (size the right side
    * accordingly — this is the shuffled-join fallback when the right
    * side is too big to broadcast but small enough to replicate).
    */
  def saltedJoin(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      rightKey: String,
      saltSource: Column,
      buckets: Int): DataFrame = {
    // salt() validates buckets >= 1 — without it this join is SILENTLY
    // EMPTY (explode of a zero-length salt array drops every right row)
    locally {
      val clash = (left.columns ++ right.columns).filter(_ == "__salt")
      require(clash.isEmpty,
        "saltedJoin: input column '__salt' collides with the salt " +
          "bookkeeping — rename it first (withColumn would silently " +
          "replace it and drop() would delete the data column)")
    }
    val saltedLeft = left.withColumn("__salt", salt(saltSource, buckets))
    val replicatedRight = right.withColumn("__salt",
      explode(array((0 until buckets).map(lit): _*)))
    saltedLeft.join(replicatedRight,
      saltedLeft(leftKey) === replicatedRight(rightKey) &&
        saltedLeft("__salt") === replicatedRight("__salt"))
      .drop("__salt")
  }
}
