package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deterministic GLOBAL row numbering under a total order with NO
  * single-partition window — the scalable `row_number() OVER (ORDER BY
  * ...)`: range-partition on the order columns, rank locally inside
  * each range, then add per-partition offsets (an exclusive prefix sum
  * over #partitions counts — driver traffic is #partitions longs, the
  * q83 shard-packing discipline).
  *
  * A naive global window forces every row through ONE reducer; this
  * form's widest single task is one range bucket. The range boundaries
  * come from sampling, so the partitioned relation is pinned with an
  * eager localCheckpoint before it is consumed twice (counts job +
  * numbering job) — re-planning could otherwise re-sample different
  * boundaries between the two jobs and misalign the offsets.
  *
  * `orderCols` MUST be a total order (include a unique tiebreak);
  * numbering is then independent of the partitioning entirely.
  */
object GlobalOrder {
  def rowNumber(df: DataFrame, orderCols: Seq[Column],
      out: String = "rn", partitions: Int = 32): DataFrame = {
    require(orderCols.nonEmpty, "need at least one order column")
    val local = df
      .repartitionByRange(partitions, orderCols: _*)
      .withColumn("__pid", spark_partition_id())
      .withColumn("__lrn", row_number().over(
        Window.partitionBy("__pid").orderBy(orderCols: _*)).cast("long"))
      .localCheckpoint(true) // pin sampled range boundaries across jobs
    val counts = local.groupBy("__pid").agg(count(lit(1)).as("__c"))
      .collect().map(r => r.getInt(0) -> r.getLong(1)).toMap
    val offsets = {
      var acc = 0L
      (0 until partitions).map { p =>
        val o = acc; acc += counts.getOrElse(p, 0L); p -> o
      }
    }
    val offsetMap = map(offsets.flatMap { case (p, o) =>
      Seq(lit(p), lit(o)) }: _*)
    local
      .withColumn(out, col("__lrn") + element_at(offsetMap, col("__pid")))
      .drop("__pid", "__lrn")
  }
}
