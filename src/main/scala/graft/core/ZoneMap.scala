package graft.core

import org.apache.spark.sql.{Column, DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** File-level zone maps — the lakehouse min/max file-skipping layer
  * (Iceberg/Delta data-skipping, ORC stripe stats) built from plain
  * parquet plus a sidecar stats table. Completes the layout trio with
  * [[ZOrder]] (multi-column clustering) and
  * [[graft.operators.Compaction]] (file sizing):
  *
  *  - [[write]] range-clusters the data on one column
  *    (`repartitionByRange` → each file owns a contiguous value range)
  *    and records per-file (file, lo, hi) in `_zonemap/` under the
  *    table path (underscore-prefixed, so plain readers of the table
  *    dir ignore it — the same convention as `_SUCCESS`).
  *  - [[prunedRead]] consults ONLY the stats table (files-sized, not
  *    data-sized) to drop files whose [lo, hi] zone cannot intersect
  *    the requested range, then reads the survivors.
  *
  * At 100 TB the stats table is #files rows (~10⁵ for 1 GB files) —
  * the prune is a metadata operation, exactly like partition pruning
  * but at file granularity and without directory explosion; a range
  * predicate over the cluster column reads only the files it must.
  * The driver-side collect in [[prunedRead]] is the surviving FILE
  * LIST (paths only), never data.
  */
object ZoneMap {

  /** Range-cluster `df` on `clusterCol` into `numFiles` files at
    * `path`, then build the per-file zone map. Two jobs: the clustered
    * write (one range shuffle) and a (file → min/max) aggregation over
    * the written files.
    */
  def write(df: DataFrame, path: String, clusterCol: String,
      numFiles: Int): Unit = {
    require(numFiles >= 1, s"numFiles must be >= 1, got $numFiles")
    df.repartitionByRange(numFiles, col(clusterCol))
      .write.mode("overwrite").parquet(path)
    val spark = df.sparkSession
    spark.read.parquet(path)
      .groupBy(col("_metadata.file_path").as("file"))
      .agg(min(col(clusterCol)).as("lo"), max(col(clusterCol)).as("hi"))
      .coalesce(1)
      .write.mode("overwrite").parquet(s"$path/_zonemap")
  }

  /** The surviving file paths for a [lo, hi] range probe — exposed so
    * callers (and specs) can assert how much was skipped. Null bounds
    * (all-null zones) never match a range probe.
    */
  def survivingFiles(spark: SparkSession, path: String,
      lo: Column, hi: Column): Seq[String] =
    spark.read.parquet(s"$path/_zonemap")
      .where(col("hi") >= lo && col("lo") <= hi)
      .select("file").collect().map(_.getString(0)).toSeq

  /** Read only the files whose zone intersects [lo, hi]. Callers still
    * apply their row-level predicate — the zone map is file-granular
    * (a surviving file may hold out-of-range rows at its edges).
    * Returns an empty (correctly-typed) relation when every file
    * prunes away.
    */
  def prunedRead(spark: SparkSession, path: String,
      lo: Column, hi: Column): DataFrame = {
    val files = survivingFiles(spark, path, lo, hi)
    if (files.isEmpty) spark.read.parquet(path).limit(0)
    else spark.read.parquet(files: _*)
  }
}
