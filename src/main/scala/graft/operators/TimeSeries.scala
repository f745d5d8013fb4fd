package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Time-series regularization: resample an event stream onto a fixed
  * per-key time grid (no missing buckets), zero-filling counts and
  * forward-filling last-observation columns — the feature-engineering
  * step that turns irregular event logs into fixed-step model inputs.
  *
  * Scale shape: the spine is generated PER KEY from that key's own
  * [min, max] bucket range (`sequence` + `explode` after a small
  * bounds agg) — there is no global calendar cross join. Cost is two
  * hash aggs on (key, bucket) / (key), one join back, and one per-key
  * window for the forward fill; every stage partitions by key, so a
  * 1000-executor run never concentrates more than one key's grid in a
  * task. Keys with pathological time spans surface as big per-key
  * grids (data property, not a plan property) — bound the step
  * accordingly.
  */
object TimeSeries {

  /** Resample `df` onto a fixed grid of `step` (e.g. "interval 1 hour")
    * buckets per key.
    *
    * @param bucket    timestamp bucketing expression over the raw time
    *                  column, e.g. `date_trunc("hour", col("ts"))`; must
    *                  be aligned to `step` or grid points won't match
    *                  observed buckets
    * @param aggs      named aggregates computed per (key, bucket),
    *                  e.g. `count(lit(1)).as("n")`
    * @param zeroFill  agg columns set to 0 on empty buckets
    * @param ffill     agg columns carried forward from the last
    *                  non-empty bucket (still null before the first
    *                  observation unless also zero-filled; listing a
    *                  column in both fills gaps with the last value and
    *                  leading nulls with 0)
    *
    * NULL-TS CONTRACT (deliberate, = SQL null semantics): rows whose
    * raw time column is NULL drop SILENTLY — `bucket` evaluates to a
    * null grid point, the spine's min/max skip nulls, and the null
    * bucket never equi-joins back. The alternative (fail by name, or a
    * dedicated "unbucketed" output row) was considered and DECLINED:
    * every event-time operator in this engine — window()/
    * session_window() expand a null ts to zero windows, the streaming
    * sessionizer filters null ts per the same rule — drops such rows,
    * and resample diverging would make batch and streaming disagree on
    * the same data. Callers auditing null-ts volume count it with
    * [[Validate]] (a NotNull constraint) before resampling. Pinned by
    * DegenerateInputSpec ("resample/chunkTokens null-row contract").
    */
  def resample(
      df: DataFrame,
      keyCol: String,
      bucket: Column,
      step: String,
      aggs: Seq[Column],
      zeroFill: Seq[String] = Nil,
      ffill: Seq[String] = Nil): DataFrame = {
    require(aggs.nonEmpty, "need at least one aggregate")
    require(!df.columns.contains("__b") && !df.columns.contains("bucket"),
      "input already has a __b/bucket column")
    val observed = df.groupBy(col(keyCol), bucket.as("__b")).agg(aggs.head, aggs.tail: _*)
    // the guard above covers the INPUT; an agg ALIASED "bucket"/"__b"/
    // keyCol (aggs is caller-supplied) would equally duplicate an output
    // or join name, throwing AMBIGUOUS_REFERENCE far downstream
    val aggClash = observed.columns.drop(2)
      .filter(c => c == "bucket" || c == "__b" || c == keyCol)
    require(aggClash.isEmpty,
      s"resample: aggregate alias(es) ${aggClash.mkString(", ")} collide with " +
        "the reserved bucket/__b/key output names - alias them differently")
    val spine = df
      .groupBy(col(keyCol))
      .agg(min(bucket).as("__lo"), max(bucket).as("__hi"))
      .select(col(keyCol),
        explode(sequence(col("__lo"), col("__hi"), expr(step))).as("__b"))
    val joined = spine.join(observed, Seq(keyCol, "__b"), "left")
    val w = Window.partitionBy(keyCol).orderBy("__b")
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    val filled = ffill.foldLeft(joined) { (d, c) =>
      d.withColumn(c, last(col(c), ignoreNulls = true).over(w))
    }
    zeroFill.foldLeft(filled) { (d, c) =>
      d.withColumn(c, coalesce(col(c), lit(0L)))
    }.withColumnRenamed("__b", "bucket")
  }
}
