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

  /** Driver-materialization bound for [[survivingFiles]]/[[prunedRead]]:
    * the surviving-file list is the ONE driver-side collect in this
    * layer, and while it is metadata-sized by design (paths only, never
    * data), it is proportional to #files — at 100 TB with the 1 GB
    * target file size that is ~10⁵ paths (~10 MB), inside this default,
    * but a pathological small-file layout (≥10⁶ files) would
    * materialize an unbounded list. The collect is therefore CAPPED:
    * past `maxFiles` the read fails BY NAME (the repo's fail-fast
    * discipline) rather than silently ballooning the driver — at that
    * point file-level pruning is the wrong layer and the caller should
    * compact ([[graft.operators.Compaction]]) or read the unpruned
    * table with a pushed row-level predicate. Overridable per call for
    * deployments that deliberately size their driver for more.
    */
  val MaxSurvivingFiles = 100000

  /** The surviving file paths for a [lo, hi] range probe — exposed so
    * callers (and specs) can assert how much was skipped. Null bounds
    * (all-null zones) never match a range probe. The driver collect is
    * bounded by `maxFiles` (see [[MaxSurvivingFiles]]) — the limit is
    * applied IN-PLAN, so an over-limit zone map fails by name after
    * materializing at most maxFiles + 1 paths, never the full list.
    */
  def survivingFiles(spark: SparkSession, path: String,
      lo: Column, hi: Column, maxFiles: Int = MaxSurvivingFiles): Seq[String] = {
    // < MaxValue so the probe's limit(maxFiles + 1) can't wrap — a caller
    // "disabling" the cap with MaxValue would otherwise get limit(MinValue)
    require(maxFiles >= 1 && maxFiles < Int.MaxValue,
      s"maxFiles must be in [1, ${Int.MaxValue - 1}], got $maxFiles")
    val files = spark.read.parquet(s"$path/_zonemap")
      .where(col("hi") >= lo && col("lo") <= hi)
      .select("file").limit(maxFiles + 1)
      .collect().map(_.getString(0)).toSeq
    if (files.size > maxFiles) throw new IllegalStateException(
      s"ZoneMap.survivingFiles($path): more than $maxFiles files survive the " +
        "[lo, hi] probe — the driver-side file list would be unbounded. " +
        "File-level pruning is the wrong layer at this file count: compact " +
        "the table (Compaction.compactParquet), narrow the probe range, or " +
        "raise maxFiles explicitly if the driver is sized for it.")
    files
  }

  /** Read only the files whose zone intersects [lo, hi]. Callers still
    * apply their row-level predicate — the zone map is file-granular
    * (a surviving file may hold out-of-range rows at its edges).
    * Returns an empty (correctly-typed) relation when every file
    * prunes away. Driver cost is the capped path list only
    * ([[MaxSurvivingFiles]]), never data.
    */
  def prunedRead(spark: SparkSession, path: String,
      lo: Column, hi: Column, maxFiles: Int = MaxSurvivingFiles): DataFrame = {
    val files = survivingFiles(spark, path, lo, hi, maxFiles)
    if (files.isEmpty) spark.read.parquet(path).limit(0)
    else spark.read.parquet(files: _*)
  }
}
