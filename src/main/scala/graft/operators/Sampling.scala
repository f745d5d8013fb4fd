package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines. Unlike
  * `df.sample` (seeded per-partition RNG — results change under
  * repartitioning), these are pure functions of row CONTENT: the same
  * row lands in the same split on any cluster layout, any run, any
  * engine — the property that makes 100 TB train/val/test splits
  * reproducible and join-stable across pipeline stages.
  */
object Sampling {

  private val Buckets = 10000

  /** Stable bucket in [0, 10000) from the id column. */
  def bucket(idCol: Column): Column = pmod(xxhash64(idCol), lit(Buckets))

  /** Add a `split` column ("train" / "val" / ...) with the given
    * fractional weights (must sum to <= 1; remainder goes to the last
    * split).
    */
  def hashSplit(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum <= 1.0 + 1e-9)
    val b = bucket(col(idCol))
    val bounds = splits.scanLeft(0.0)(_ + _._2).tail.map(f => (f * Buckets).toLong)
    val expr = splits.zip(bounds).init.foldRight(lit(splits.last._1): Column) {
      case (((name, _), hi), els) => when(b < hi, lit(name)).otherwise(els)
    }
    df.withColumn("split", expr)
  }

  /** Deterministic fraction-sample: keeps rows whose id-hash bucket
    * falls below `fraction` — stable across runs and layouts.
    */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.where(bucket(col(idCol)) < (fraction * Buckets).toLong)

  /** Per-stratum deterministic sampling (e.g. rebalance a corpus by
    * language): keep rows whose bucket falls below the stratum's
    * fraction; strata without an entry are dropped. Pure row-content
    * predicate — no shuffle, no RNG, scan-speed at any scale.
    *
    * `bucketOf` defaults to the xxhash64 bucket; pass an explicit
    * column (e.g. a multiplicative id mix) when the downstream system
    * must reproduce the assignment in another engine.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String,
      fractions: Map[String, Double],
      bucketOf: Option[Column] = None, idCol: String = "id"): DataFrame = {
    require(fractions.nonEmpty && fractions.values.forall(f => f >= 0 && f <= 1))
    val b = bucketOf.getOrElse(bucket(col(idCol)))
    val threshold = fractions.foldLeft(lit(-1L): Column) {
      case (els, (stratum, f)) =>
        when(col(stratumCol) === stratum, lit((f * Buckets).toLong)).otherwise(els)
    }
    df.where(b < threshold)
  }
}
