package graft.operators

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** Small-file compaction for long-lived corpus directories. Streaming
  * sinks, CDC merges, and per-batch exports accrete thousands of tiny
  * files; at 100 TB the file COUNT (listing RPCs, scan task overhead,
  * parquet footer reads) becomes the bottleneck long before the bytes
  * do. Compaction rewrites a directory into ~targetBytes files.
  *
  * The size survey is a driver-side RECURSIVE listing (metadata only —
  * no data read), so Hive-partitioned layouts (key=value directories,
  * the common shape for the streaming sinks this targets) are sized
  * correctly, per partition directory.
  *
  *   - Flat layout: the rewrite uses `coalesce`, not `repartition` —
  *     merging files needs NO shuffle; each output task reads several
  *     input files end-to-end.
  *   - Partitioned layout: the directory structure is PRESERVED
  *     (`partitionBy` on write) and each partition directory gets its
  *     own ceil(bytes/targetBytes) file budget. This path costs one
  *     shuffle, keyed by (partition dir, file-hash salt): whole input
  *     files ride together to an output task, so shuffle volume = data
  *     volume with no row-level skew surprises, and every output task
  *     holds exactly one partition value (one output file per task,
  *     modulo hash collisions between groups).
  *
  * (No compaction surface exists in the reference; north-star
  * maintenance operator, built Spark-first.)
  */
object Compaction {

  /** Parquet-to-parquet compaction of `inPath` into `outPath` (must
    * differ — an in-place rewrite would destroy the input on job
    * failure; swap directories after success). Returns the total output
    * file-count budget; the actual count can differ slightly (coalesce
    * may pack tighter; group hash collisions may split). Output sizes
    * track targetBytes only approximately: re-encoding changes
    * compression ratios.
    *
    * Accepts flat directories and Hive-partitioned (key=value) trees;
    * any other nested layout is refused loudly rather than read
    * incorrectly.
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

    // Recursive survey: bytes per partition subpath ("" for flat files).
    val it = fs.listFiles(inQ, true)
    val bytesByPart = scala.collection.mutable.LinkedHashMap[String, Long]()
    var partCols: Seq[String] = null
    while (it.hasNext) {
      val st = it.next()
      if (st.isFile && st.getPath.getName.startsWith("part-")) {
        val segs = scala.collection.mutable.ListBuffer[String]()
        var p = st.getPath.getParent
        while (p != null && fs.makeQualified(p) != inQ) {
          segs.prepend(p.getName); p = p.getParent
        }
        require(segs.forall(sg => sg.indexOf('=') > 0),
          s"non-partition subdirectory '${segs.mkString("/")}' under $inPath — " +
            "compaction expects a flat or Hive-partitioned (key=value) layout")
        val cols = segs.map(sg => sg.substring(0, sg.indexOf('='))).toList
        if (partCols == null) partCols = cols
        else require(partCols == cols,
          s"inconsistent partition structure under $inPath: $partCols vs $cols")
        val key = segs.mkString("/")
        bytesByPart(key) = bytesByPart.getOrElse(key, 0L) + st.getLen
      }
    }
    require(bytesByPart.nonEmpty, s"no part- data files found under $inPath")
    def filesFor(b: Long): Int = math.max(1L, (b + targetBytes - 1) / targetBytes).toInt

    if (partCols == null || partCols.isEmpty) {
      val n = filesFor(bytesByPart.values.sum)
      spark.read.parquet(inPath)
        .coalesce(n)
        .write.mode("overwrite").parquet(outPath)
      n
    } else {
      val kByPart: Map[String, Int] =
        bytesByPart.map { case (k, b) => k -> filesFor(b) }.toMap
      val total = kByPart.values.sum
      val depth = partCols.size
      // Recover the partition subpath from the scanned file's URI by
      // position from the END (…/key1=v1/…/keyN=vN/part-xyz) — robust to
      // scheme/prefix normalization differences between the listing and
      // input_file_name(). Salting by the file hash keeps whole input
      // files in one group (files are small — that's the premise).
      val relKey = array_join(
        slice(split(input_file_name(), "/"), -(depth + 1), depth), "/")
      val k = element_at(typedLit(kByPart), relKey)
      val grp = concat_ws("#", relKey,
        pmod(xxhash64(input_file_name()), k.cast("long")).cast("string"))
      val in = spark.read.parquet(inPath)
      // compaction is a LAYOUT rewrite — it must never alter the
      // relation. A data column named __grp would be silently replaced
      // by the grouping key and then dropped: data loss in the output.
      require(!in.columns.contains("__grp"),
        s"compactParquet: $inPath has a '__grp' column, which collides " +
          "with compaction bookkeeping — rename it first")
      in
        .withColumn("__grp", grp)
        .repartition(total, col("__grp"))
        .drop("__grp")
        .write.mode("overwrite").partitionBy(partCols: _*).parquet(outPath)
      total
    }
  }
}
