package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Token-budget sharding for training-data export: assign documents to
  * contiguous fixed-budget shards (pretraining batch files) by a
  * running token count in a deterministic order.
  *
  * shard_id = floor(exclusive-prefix-sum(tokens) / budget): every shard
  * holds ~budget tokens of consecutive documents, the assignment is a
  * pure function of the data (stable across runs/layouts), and the
  * whole operator is ONE window aggregation — a single shuffle on the
  * stratum key, running-sum within partitions, no driver state. At
  * 100 TB the stratum (e.g. language) bounds each window partition;
  * for a single global sequence, range-partition on the order column
  * and compute per-partition offsets (the classic distributed
  * prefix-sum), which [[graft.plans.TopKPerGroup]]-style custom ops
  * could fold in if a stratum ever exceeds one executor's share.
  */
object Packing {

  /** Adds `shard_id`: exclusive running sum of `tokensCol` (ordered by
    * `orderCol` within `stratumCols`) integer-divided by `budget`.
    * Exact long arithmetic end-to-end. Token counts must be
    * NONNEGATIVE — a negative count walks the running sum backward and
    * silently corrupts every later shard id in the stratum, so the
    * operator fails fast on one (nulls count 0).
    */
  def shardByTokenBudget(df: DataFrame, tokensCol: Column, orderCol: Column,
      budget: Long, stratumCols: Seq[Column] = Seq.empty): DataFrame = {
    require(budget > 0, "token budget must be positive")
    guardBookkeeping(df)
    val w0 = if (stratumCols.isEmpty) Window.partitionBy()
      else Window.partitionBy(stratumCols: _*)
    val w = w0.orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    // the guard rides inside the summed expression so no rewrite drops it
    val guarded = when(tokensCol.cast("long") < 0,
      raise_error(concat(
        lit("Packing.shardByTokenBudget: negative token count "),
        tokensCol.cast("string"),
        lit(" corrupts the running sum - filter or clamp first")))
        .cast("long"))
      .otherwise(tokensCol.cast("long"))
    df.withColumn("__cum", coalesce(sum(guarded).over(w), lit(0L)))
      .withColumn("shard_id", expr(s"__cum div ${budget}L"))
      .drop("__cum")
  }

  /** The 100 TB form of [[shardByTokenBudget]] for ONE global sequence:
    * an empty-partitionBy window funnels every row through a single
    * task, so this runs the classic distributed prefix sum instead.
    *
    * Deliberately NOT `repartitionByRange`: range partitioning samples
    * per job, so two actions over the same plan can land rows in
    * different partitions — and the offsets computed in pass 1 would be
    * wrong in pass 2. Instead rows bucket by a PURE function of the
    * (numeric, unique) order key — uniform-width ranges over [min, max]
    * — which is identical in every job with no caching:
    *   pass 0: one agg for (min, max);
    *   pass 1: per-bucket token totals (numBuckets longs — the only
    *           driver traffic), folded into exclusive offsets;
    *   pass 2: shuffle by bucket, sort within partitions, stream each
    *           partition once resetting the running sum at each bucket
    *           boundary (buckets are key ranges, so a partition holding
    *           several buckets sees them contiguously).
    * Skewed key distributions give uneven buckets — acceptable for id
    * keys; use explicit quantile bounds if keys cluster.
    */
  def shardByTokenBudgetGlobal(df: DataFrame, tokensCol: String,
      orderCol: String, budget: Long, numBuckets: Int): DataFrame = {
    require(budget > 0, "token budget must be positive")
    require(numBuckets > 0, "need at least one bucket")
    guardBookkeeping(df)
    val r0 = df.agg(min(col(orderCol)).cast("long"),
      max(col(orderCol)).cast("long")).head()
    if (r0.isNullAt(0)) {
      // null min means EITHER an empty input (return the typed empty
      // with the output schema) OR a non-empty input whose order column
      // is ENTIRELY null — the latter used to take this early return and
      // tag every row shard_id = 0 regardless of token totals, while the
      // pass-1 null check below (and the window form) fail loudly on
      // mixed nulls. All-null must fail the same way.
      require(df.isEmpty,
        s"order column '$orderCol' is entirely null — global shard " +
          "packing needs a total order")
      return df.withColumn("shard_id", lit(0L))
    }
    val (lo, hi) = (r0.getLong(0), r0.getLong(1))
    // hi - lo in plain long WRAPS once the key range exceeds
    // Long.MaxValue — the natural shape when the order key is a 64-bit
    // hash (hash-ordered packing). BigInt on the driver, and a decimal
    // SQL path only when the range genuinely needs it: the common case
    // keeps codegen'd long arithmetic in both passes.
    val range = BigInt(hi) - BigInt(lo)
    val longSafe = range.isValidLong
    // both divisions below are nonneg/positive, so SQL div, BigInt /,
    // and long / all truncate identically (floor == truncate)
    val bucketOf: Long => Long =
      if (longSafe) {
        val span = math.max(1L, range.toLong / numBuckets + 1L)
        key => (key - lo) / span
      } else {
        val span = range / numBuckets + 1
        key => ((BigInt(key) - BigInt(lo)) / span).toLong
      }

    // `div`, not `/`: long / long is DOUBLE division in Spark and would
    // drift from the executor-side bucketOf at large keys
    val bucketCol =
      if (longSafe) {
        val span = math.max(1L, range.toLong / numBuckets + 1L)
        expr(s"(CAST(`$orderCol` AS BIGINT) - ${lo}L) div ${span}L")
      } else {
        val span = range / numBuckets + 1
        expr(s"(CAST(`$orderCol` AS DECIMAL(20,0)) - CAST($lo AS DECIMAL(20,0)))" +
          s" div CAST('$span' AS DECIMAL(20,0))")
      }
    val totals = df
      .groupBy(bucketCol.as("b"))
      .agg(coalesce(sum(col(tokensCol).cast("long")), lit(0L)).as("tot"))
      .collect().map { r =>
        // a null bucket means a null order key: the window form would
        // silently sort it first; here the bucket math has no home for
        // it, so fail loudly instead of diverging between the two forms
        require(!r.isNullAt(0),
          s"order column '$orderCol' contains nulls — global shard packing needs a total order")
        r.getLong(0) -> r.getLong(1)
      }.toMap
    val offsets: Map[Long, Long] = {
      var acc = 0L
      totals.keys.toSeq.sorted.map { b =>
        val o = b -> acc; acc += totals(b); o
      }.toMap
    }

    val schema = df.schema
      .add("shard_id", org.apache.spark.sql.types.LongType, nullable = false)
    val tokIdx = df.schema.fieldIndex(tokensCol)
    val ordIdx = df.schema.fieldIndex(orderCol)
    val rowEnc = org.apache.spark.sql.Encoders.row(schema)
    df.repartition(numBuckets, bucketCol)
      .sortWithinPartitions(col(orderCol))
      .mapPartitions { it =>
        var curBucket = Long.MinValue
        var cum = 0L
        it.map { r =>
          val key = r.getAs[Number](ordIdx).longValue()
          val b = bucketOf(key)
          if (b != curBucket) { curBucket = b; cum = offsets.getOrElse(b, 0L) }
          val shard = cum / budget
          // null tokens count 0, matching the window form's sum-ignores-null
          val tv = r.get(tokIdx)
          val t = if (tv == null) 0L else tv.asInstanceOf[Number].longValue()
          // same fail-fast as the window form's in-plan guard
          if (t < 0) throw new IllegalArgumentException(
            s"Packing.shardByTokenBudgetGlobal: negative token count $t " +
              "corrupts the running sum - filter or clamp first")
          cum += t
          org.apache.spark.sql.Row.fromSeq(r.toSeq :+ shard)
        }
      }(rowEnc)
  }

  /** Fail fast instead of silently clobbering a caller's column named
    * like our bookkeeping/output columns (mirrors Merge.upsert).
    */
  private def guardBookkeeping(df: DataFrame): Unit =
    Seq("__cum", "shard_id").foreach { c =>
      require(!df.columns.contains(c),
        s"input column '$c' collides with shard-packing bookkeeping/output")
    }
}
