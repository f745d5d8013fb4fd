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
    * Exact long arithmetic end-to-end.
    */
  def shardByTokenBudget(df: DataFrame, tokensCol: Column, orderCol: Column,
      budget: Long, stratumCols: Seq[Column] = Seq.empty): DataFrame = {
    require(budget > 0, "token budget must be positive")
    val w0 = if (stratumCols.isEmpty) Window.partitionBy()
      else Window.partitionBy(stratumCols: _*)
    val w = w0.orderBy(orderCol)
      .rowsBetween(Window.unboundedPreceding, -1)
    df.withColumn("__cum", coalesce(sum(tokensCol.cast("long")).over(w), lit(0L)))
      .withColumn("shard_id", expr(s"__cum div ${budget}L"))
      .drop("__cum")
  }
}
