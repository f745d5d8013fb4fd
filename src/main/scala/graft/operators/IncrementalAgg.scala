package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Incremental aggregate maintenance: keep per-key ALGEBRAIC partials
  * (sum / count / min / max) as the materialized state, and fold new
  * data in by merging partials — the 100 TB move that turns "recompute
  * the corpus-wide stats nightly" into "aggregate today's delta
  * (tiny) and merge with yesterday's state (#keys rows, not #rows)".
  * The base corpus is never rescanned.
  *
  * Only lossless-merge aggregates are offered; averages derive as
  * sum/count at read time. (Non-algebraic stats — exact medians,
  * distinct counts — need sketches instead: see the GK / HLL operators.)
  */
object IncrementalAgg {

  /** Per-key partial state of `values`: `<v>_sum`, `<v>_cnt`,
    * `<v>_min`, `<v>_max` for each value column (long-typed inputs —
    * follow the exact-cents discipline for monetary doubles).
    */
  def partials(df: DataFrame, keys: Seq[String], values: Seq[String]): DataFrame = {
    require(keys.nonEmpty && values.nonEmpty)
    val aggs = values.flatMap { v =>
      Seq(sum(col(v)).as(s"${v}_sum"), count(col(v)).as(s"${v}_cnt"),
        min(col(v)).as(s"${v}_min"), max(col(v)).as(s"${v}_max"))
    }
    df.groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Merge two partial states (same schema): one union + one #keys-row
    * agg. Associative and commutative — state can be merged across any
    * number of deltas in any order.
    */
  def merge(a: DataFrame, b: DataFrame, keys: Seq[String],
      values: Seq[String]): DataFrame = {
    // mirror partials' contract checks: empty args crashed on aggs.head
    // with a bare NoSuchElementException, and a missing partial column
    // surfaced as a raw Catalyst resolution error nowhere near the call
    require(keys.nonEmpty && values.nonEmpty,
      "merge needs at least one key and one value column")
    values.foreach { v =>
      Seq("sum", "cnt", "min", "max").foreach { s =>
        require(a.columns.contains(s"${v}_$s") && b.columns.contains(s"${v}_$s"),
          s"merge: partial column '${v}_$s' missing — both inputs must be " +
            "partials() outputs over the same value columns")
      }
    }
    val aggs = values.flatMap { v =>
      Seq(sum(col(s"${v}_sum")).as(s"${v}_sum"),
        sum(col(s"${v}_cnt")).as(s"${v}_cnt"),
        min(col(s"${v}_min")).as(s"${v}_min"),
        max(col(s"${v}_max")).as(s"${v}_max"))
    }
    a.unionByName(b).groupBy(keys.map(col): _*).agg(aggs.head, aggs.tail: _*)
  }

  /** Read-time mean from the maintained partials. */
  def mean(v: String): Column =
    col(s"${v}_sum").cast("double") / col(s"${v}_cnt")
}
