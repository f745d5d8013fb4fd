package graft.core

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) clustering for multi-dimensional data skipping.
  *
  * Partitioning prunes on ONE dimension and bucketing co-locates on ONE
  * key; a corpus that gets filtered on several independent columns
  * (date AND customer, size AND price) needs file layout where parquet
  * row-group min/max stats are selective on ALL of them. Sorting by the
  * bit-interleaved z-value of the normalized dimensions gives every
  * file a tight bounding box in the filter space, so a predicate on ANY
  * clustered dimension skips most files at the footer — the same
  * mechanism behind Delta/Iceberg OPTIMIZE ZORDER, built here from
  * plain column expressions.
  *
  * All arithmetic is exact integer math on codegen'd expressions; the
  * only driver traffic is one agg for per-column (min, max).
  */
object ZOrder {

  /** Bit-interleaved z-value of `cols`, each normalized from its
    * [lo, hi] range to a `bits`-wide integer rank via a power-of-two
    * stride (a pure right shift — exact at any magnitude, where a
    * multiply-then-divide normalization overflows wide ranges; the ≤1
    * bit of lost resolution is irrelevant for file layout). Monotone
    * per dimension — values outside [lo, hi] (stale or approximate
    * ranges from a direct caller) SATURATE at the range ends rather
    * than wrapping into the middle of the z-curve. Bit i of dimension j
    * lands at position i·k + j.
    */
  def zValue(cols: Seq[(Column, Long, Long)], bits: Int = 16): Column = {
    require(cols.nonEmpty && bits * cols.size <= 62,
      s"${cols.size} dims x $bits bits must fit a long")
    val k = cols.size
    val scaled = cols.map { case (c, lo, hi) =>
      require(hi >= lo && (BigInt(hi) - BigInt(lo)).isValidLong,
        s"range [$lo, $hi] wider than a long")
      val width = hi - lo // rank domain is [0, width]
      val needed = 64 - java.lang.Long.numberOfLeadingZeros(math.max(1L, width))
      // clamp BEFORE subtracting, not after: the saturate contract
      // admits values far outside [lo, hi], where (c - lo) itself can
      // exceed the long envelope — ANSI would throw on the very rows
      // this clamp exists to absorb. Clamped-first, the difference is
      // always within [0, width].
      val d = greatest(least(c.cast("long"), lit(hi)), lit(lo)) - lit(lo)
      // shift every dimension to the SAME effective width: narrow dims
      // stretch left, wide dims compress right — otherwise a narrow
      // dimension only touches low-order z bits and the file splits are
      // governed entirely by the widest dimension
      val sh = needed - bits
      if (sh >= 0) shiftright(d, sh)
      else shiftleft(d, -sh)
    }
    val parts = for {
      (s, j) <- scaled.zipWithIndex
      i <- 0 until bits
    } yield shiftleft(shiftright(s, i).bitwiseAND(lit(1L)), i * k + j)
    parts.reduce(_.bitwiseOR(_))
  }

  /** Write `df` z-ordered on `colNames` into `numFiles` quadrant
    * parquet files (plus one overflow file for rows with a null in any
    * clustered column, when such rows exist): one agg for the ranges,
    * partition + sort on the z-value, drop the helper columns
    * (projection preserves the sort), write.
    *
    * Files split at BIT-ALIGNED z boundaries (`numFiles` must be a
    * power of two): every file is a union of whole z-quadrants, whose
    * bounding box per dimension is exact — a quantile split (what a
    * balanced-size-first writer would do) puts boundaries mid-quadrant,
    * and a file whose z-range crosses a high-bit transition spans the
    * full width of the other dimensions, measured to roughly double the
    * files touched per band predicate. The trade is file-size balance
    * under skew; z-ranks are near-uniform for id-like keys.
    */
  def writeZOrdered(df: DataFrame, path: String, colNames: Seq[String],
      numFiles: Int, bits: Int = 16): Unit = {
    require(numFiles > 0 && (numFiles & (numFiles - 1)) == 0,
      s"numFiles must be a power of two for bit-aligned splits, got $numFiles")
    // bookkeeping-name collision fail-fast (the Merge/IntervalJoin/Skew
    // discipline): withColumn would silently replace a same-named data
    // column and the trailing drop() would delete it from the written
    // table — a layout write that altered the relation
    locally {
      val clash = df.columns.filter(Seq("__z", "__zb", "__zp").contains)
      require(clash.isEmpty,
        s"writeZOrdered: input column(s) ${clash.mkString(", ")} collide " +
          "with z-order bookkeeping — rename them first")
    }
    // more files than z-value buckets would make bucketShift negative:
    // shiftright masks the count and every row lands in bucket 0 — one
    // file written, clustering silently destroyed
    require(bits * colNames.size >= 31 ||
        numFiles.toLong <= (1L << (bits * colNames.size)),
      s"numFiles $numFiles exceeds the 2^(bits*cols) z-bucket count")
    val aggs = colNames.flatMap(c =>
      Seq(min(col(c).cast("long")).as(s"__lo_$c"), max(col(c).cast("long")).as(s"__hi_$c")))
    val r = df.agg(aggs.head, aggs.tail: _*).head()
    // empty input (or an all-null dimension) has no ranges to cluster on
    // — write as-is rather than NPE on the null min/max
    if (colNames.exists(c => r.isNullAt(r.fieldIndex(s"__lo_$c")))) {
      df.write.mode("overwrite").parquet(path)
      return
    }
    val ranges = colNames.map { c =>
      (col(c), r.getLong(r.fieldIndex(s"__lo_$c")), r.getLong(r.fieldIndex(s"__hi_$c")))
    }
    val zbits = bits * colNames.size
    val bucketShift = zbits - (63 - java.lang.Long.numberOfLeadingZeros(numFiles.toLong))
    // Deterministic bucket -> partition placement. repartitionByRange
    // SAMPLES per job, so with exactly numFiles distinct bucket values it
    // can merge adjacent quadrants into one file and leave others empty;
    // plain hash repartition is deterministic but collides buckets.
    // Instead remap each bucket b to a key whose Spark shuffle hash
    // (Murmur3 seed 42 — HashPartitioning's contract) lands in partition
    // b exactly: every file holds exactly ONE whole z-quadrant, every
    // run. The search is driver-side, ~numFiles probes per bucket.
    // dense ARRAY literal indexed by bucket, not a map literal:
    // element_at over ArrayBasedMapData is an O(numFiles) linear key
    // scan PER ROW; the domain is exactly 0..numFiles-1 so array
    // indexing (1-based) is the same lookup at O(1)
    // Rows with a null in ANY clustered column have no z-value; without
    // an explicit route they would all hash into one arbitrary QUADRANT
    // file (null __zp hashes to a fixed partition), widening that file's
    // min/max stats to near-full width and silently degrading its
    // skipping. Route them to a dedicated overflow partition instead:
    // quadrant files keep exact bounding boxes, null rows get one file
    // of their own (empty when no nulls exist).
    val keyFor = hashPreimages(numFiles + 1)
    val keyArr = Array.tabulate(numFiles)(b => keyFor(b.toLong))
    val anyNullDim = colNames.map(col(_).isNull).reduce(_ or _)
    df.withColumn("__z", zValue(ranges, bits))
      .withColumn("__zb", shiftright(col("__z"), bucketShift))
      .withColumn("__zp", when(anyNullDim, lit(keyFor(numFiles.toLong)))
        .otherwise(element_at(typedLit(keyArr.toSeq), (col("__zb") + 1).cast("int"))))
      .repartition(numFiles + 1, col("__zp"))
      .sortWithinPartitions(col("__z"))
      .drop("__z", "__zb", "__zp")
      .write.mode("overwrite").parquet(path)
  }

  /** bucket b -> a long key whose Spark shuffle-hash partition IS b.
    * This hardcodes HashPartitioning's contract (Murmur3_x86_32.hashLong,
    * seed 42, pmod) — a Spark upgrade changing shuffle hashing would
    * silently break the one-quadrant-per-file layout, so ZOrderSpec pins
    * this map at runtime against Spark's own repartition placement
    * (spark_partition_id) and the Murmur3Hash expression.
    */
  private[graft] def hashPreimages(numFiles: Int): Map[Long, Long] =
    (0 until numFiles).map { b =>
      var k = 0L
      while (pmod(org.apache.spark.unsafe.hash.Murmur3_x86_32.hashLong(k, 42),
          numFiles) != b) {
        k += 1
        require(k < 100000000L, s"no hash preimage found for bucket $b")
      }
      b.toLong -> k
    }.toMap

  private def pmod(a: Int, n: Int): Int = { val r = a % n; if (r < 0) r + n else r }
}
