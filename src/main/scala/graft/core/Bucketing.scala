package graft.core

import org.apache.spark.sql.{DataFrame, SaveMode, SparkSession}

/** Bucketed-table helpers: co-located joins and aggregations.
  *
  * Writing both sides of a recurring join bucketed (and sorted) by the
  * join key lets Spark plan a sort-merge join with NO shuffle exchange on
  * either side — at 100 TB the difference between re-shuffling the fact
  * table on every query and never shuffling it at all. This is the
  * Spark-native analogue of the reference's (absent) physical design
  * layer, and the right strategy for the `lineitem ⋈ orders`-shaped joins
  * every TPC-H query repeats.
  */
object Bucketing {

  /** Write `df` as a bucketed+sorted managed table. `buckets` should be
    * sized so one bucket of the LARGEST table fits an executor's memory
    * comfortably (bucket count is fixed at write time and both join sides
    * must match).
    */
  def writeBucketed(
      df: DataFrame,
      table: String,
      bucketCol: String,
      buckets: Int,
      mode: SaveMode = SaveMode.Overwrite,
      path: Option[String] = None): Unit = {
    // Cluster by the bucket key BEFORE the bucketed write (r16, guide
    // §6 / the Iceberg hash distribution-mode analogue): without it,
    // EVERY input task local-sorts and writes a file for EVERY bucket
    // it sees — T×B small files at scale (the exact accretion
    // Compaction exists to clean up) and a write whose parallelism is
    // the upstream partitioning, not the bucket count (measured at
    // sf0.1: q107's lineitem write ran as 3 scan-shaped tasks).
    // repartition(n, col) hash-partitions with the same Murmur3 the
    // bucket spec uses, so each task holds exactly one bucket: one
    // file per bucket, write parallelism = bucket count. The explicit
    // count keeps AQE from coalescing it back (REPARTITION_BY_NUM).
    // SKEW TRADEOFF (ADVICE r16): this also caps write parallelism and
    // per-task data at one bucket per task — a hot bucket key funnels
    // its whole bucket through a single task (previously spread across
    // upstream tasks). It is the standard hash-distribution trade;
    // size `buckets` with key skew in mind (more buckets spread a hot
    // key's neighbors, nothing spreads one degenerate key — pre-salt
    // upstream if a single key ever dominates a table).
    val w = df.repartition(buckets, org.apache.spark.sql.functions.col(bucketCol))
      .write
      .mode(mode)
      .bucketBy(buckets, bucketCol)
      .sortBy(bucketCol)
      .format("parquet")
    path.fold(w)(p => w.option("path", p)).saveAsTable(table)
  }

  /** Join two bucketed tables on their bucket keys — planned shuffle-free
    * when both were written with the same bucket count.
    */
  def coLocatedJoin(
      spark: SparkSession,
      leftTable: String,
      rightTable: String,
      leftKey: String,
      rightKey: String): DataFrame = {
    val l = spark.table(leftTable)
    val r = spark.table(rightTable)
    l.join(r, l(leftKey) === r(rightKey))
  }
}
