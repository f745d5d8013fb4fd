package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession

/** Small-file compaction for long-lived corpus directories. Streaming
  * sinks, CDC merges, and per-batch exports accrete thousands of tiny
  * files; at 100 TB the file COUNT (listing RPCs, scan task overhead,
  * parquet footer reads) becomes the bottleneck long before the bytes
  * do. Compaction rewrites a directory into ~targetBytes files.
  *
  * The size survey is a driver-side LISTING (metadata only — no data
  * read), and the rewrite uses `coalesce`, not `repartition`: merging
  * files needs NO shuffle — each output task just reads several input
  * files end-to-end. (No compaction surface exists in the reference;
  * north-star maintenance operator, built Spark-first.)
  */
object Compaction {

  /** Parquet-to-parquet compaction of `inPath` into `outPath` (must
    * differ — an in-place rewrite would destroy the input on job
    * failure; swap directories after success). Returns the file-count
    * cap passed to coalesce; the actual count can be lower when the
    * reader already packed the small files into fewer partitions.
    * Output sizes track targetBytes only approximately: re-encoding
    * changes compression ratios.
    */
  def compactParquet(spark: SparkSession, inPath: String, outPath: String,
      targetBytes: Long): Int = {
    require(targetBytes > 0, "targetBytes must be positive")
    val conf = spark.sparkContext.hadoopConfiguration
    val fs = new Path(inPath).getFileSystem(conf)
    // qualify both sides (scheme + authority + absolute path): a
    // relative alias of the same directory must not slip past the
    // in-place guard — overwrite would delete the input before reading
    val inQ = fs.makeQualified(new Path(inPath))
    val outQ = new Path(outPath).getFileSystem(conf).makeQualified(new Path(outPath))
    require(inQ != outQ,
      "refusing in-place compaction — write to a fresh directory and swap")
    val files = fs.listStatus(new Path(inPath))
      .filter(s => s.isFile && s.getPath.getName.startsWith("part-"))
    val totalBytes = files.map(_.getLen).sum
    val nFiles = math.max(1L, (totalBytes + targetBytes - 1) / targetBytes).toInt
    spark.read.parquet(inPath)
      .coalesce(nFiles)
      .write.mode("overwrite").parquet(outPath)
    nFiles
  }
}
