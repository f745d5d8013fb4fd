package graft.stats

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Per-table statistics: row count, per-column min/max and equi-width
  * histograms, plus the reference's cost/cardinality estimators
  * (`/root/reference/src/optimizer/table_stats.cc:156-268`).
  *
  * Unlike the reference (two full single-threaded scans per table), the
  * build is two distributed Spark aggregation jobs over the DataFrame —
  * pass 1: one `agg` computing count + min/max of every integral column;
  * pass 2: one bucketize + `groupBy(col, bucket).count()` over all columns
  * at once (stacked via `posexplode`, so it is a single shuffle regardless
  * of column count). Both passes are aggregation-only — nothing row-sized
  * ever reaches the driver, so the build scales to arbitrarily large
  * tables.
  */
final class TableStats private (
    val numTuples: Long,
    val ioCostPerPage: Double,
    val numPages: Long,
    val columns: IndexedSeq[String],
    hists: Map[String, IntHistogram],
    ranges: Map[String, (Long, Long)],
    ndvs: Map[String, Long])
    extends Serializable {

  /** `2 * io_cost * num_pages` — reference `table_stats.cc:228-231`
    * (the factor 2 is the reference's, kept consistently since join costs
    * build on scan costs).
    */
  def estimateScanCost(): Double = 2.0 * ioCostPerPage * numPages

  /** `floor(selectivity * num_tups)` — reference `table_stats.cc:243-246`. */
  def estimateTableCardinality(selectivity: Double): Long =
    (selectivity * numTuples).toLong

  def histogram(col: String): IntHistogram = hists(col)

  /** Whether a histogram was built for `col` (integral/timestamp,
    * non-all-null, `withHistograms` build, and not excluded by the
    * build's column filter). Light builds expose NO histograms — an
    * empty histogram would answer range predicates with garbage.
    */
  def hasHistogram(col: String): Boolean = hists.contains(col)

  /** Observed (min, max) of `col` — known even for light builds (pass 1
    * computes it); the basis for domain-capped ndv estimates.
    */
  def columnRange(col: String): Option[(Long, Long)] = ranges.get(col)

  /** Distinct-count estimate for `col`: the measured HLL sketch value
    * from the build's pass 1 when available (works for ANY atomic type,
    * including string join keys), else capped by the integer domain
    * width; always capped by the row count.
    */
  def estimateNdv(col: String): Option[Long] = {
    val measured = ndvs.get(col)
    // hi - lo + 1 overflows Long for hash/id-width ranges on light builds
    // (no HLL sketch); a wrapped-negative width would clamp to ndv=1 and
    // price EQ joins as cross products — saturate to numTuples instead.
    val domain = ranges.get(col).map { case (lo, hi) =>
      val width = hi - lo
      if (width < 0L || width + 1L <= 0L) numTuples else width + 1L
    }
    measured.orElse(domain).map(n => math.max(1L, math.min(n, numTuples)))
  }

  /** Serialization views for the persisted stats catalog
    * ([[StatsRegistry.save]]) — package-private: the raw parts are an
    * implementation detail everywhere else.
    */
  private[stats] def histsMap: Map[String, IntHistogram] = hists
  private[stats] def rangesMap: Map[String, (Long, Long)] = ranges
  private[stats] def ndvsMap: Map[String, Long] = ndvs

  def estimateSelectivity(col: String, op: PredicateOp, v: Long): Double =
    hists(col).estimateSelectivity(op, v)

  /** By-index variant mirroring the reference signature. */
  def estimateSelectivity(field: Int, op: PredicateOp, v: Long): Double =
    estimateSelectivity(columns(field), op, v)
}

object TableStats {
  val NumHistBins = 100 // reference NUM_HIST_BINS, table_stats.h:53
  val PageSizeBytes = 8196L // reference BUFFER_PAGE_SIZE, macros.h:19

  private def isIntegral(dt: DataType): Boolean = dt match {
    case ByteType | ShortType | IntegerType | LongType => true
    case _ => false
  }

  /** Timestamps histogram as epoch MICROSECONDS — the same unit Catalyst
    * stores timestamp literals in, so
    * [[graft.plans.SelingerJoinReorder]]'s literal extraction feeds
    * date-range predicates straight into these histograms.
    */
  private def isTimestamp(dt: DataType): Boolean = dt match {
    case TimestampType | TimestampNTZType => true
    case _ => false
  }

  // NTZ timestamps cast through TimestampType (sessions run UTC, so the
  // micros match the NTZ literal micros Catalyst compares against)
  private def histExpr(name: String, dt: DataType) =
    if (isTimestamp(dt)) unix_micros(col(name).cast(TimestampType))
    else col(name).cast(LongType)

  /** Distributed two-pass build over the integral columns of `df`.
    *
    * @param numPagesOverride page count for the scan-cost model; when
    *        absent it is derived from the relation's size-in-bytes at the
    *        reference's 8196-byte page size.
    */
  /** @param withHistograms false skips pass 2 entirely — enough for
    *        callers that only need row counts and scan costs (the join
    *        DP receives filter selectivities pre-computed, like the
    *        reference's order_joins contract).
    * @param columns restrict histogram building to these columns — at
    *        100 TB every extra column is an extra per-partition buffer in
    *        both passes, so callers that read one histogram shouldn't pay
    *        for ten. None = all integral + timestamp columns.
    */
  def build(
      df: DataFrame,
      ioCostPerPage: Double = 100.0,
      numPagesOverride: Option[Long] = None,
      numBins: Int = NumHistBins,
      withHistograms: Boolean = true,
      columns: Option[Seq[String]] = None): TableStats = {

    val histCols: IndexedSeq[(String, DataType)] =
      df.schema.fields
        .filter(f => isIntegral(f.dataType) || isTimestamp(f.dataType))
        .map(f => (f.name, f.dataType))
        .filter { case (n, _) => columns.forall(_.contains(n)) }.toIndexedSeq
    val intCols = histCols.map(_._1)
    val exprOf: Map[String, org.apache.spark.sql.Column] =
      histCols.map { case (n, dt) => n -> histExpr(n, dt) }.toMap

    // ndv via HLL sketch for every atomic column (strings included —
    // join keys are often strings); arrays/structs are skipped (hashing
    // a wide embedding per row for a distinct count nobody consults is
    // pure waste).
    def atomic(dt: DataType): Boolean = dt match {
      case _: NumericType => true
      case StringType | BooleanType | DateType | TimestampType |
           TimestampNTZType => true
      case _ => false
    }
    // ndv sketches ride in pass 2 (full builds only): light builds stay
    // a single count/min-max job, and their consumers fall back to the
    // domain-cap ndv estimate.
    val ndvCols: IndexedSeq[String] =
      if (!withHistograms) IndexedSeq.empty
      else df.schema.fields.collect { case f if atomic(f.dataType) => f.name }
        .toIndexedSeq

    // Pass 1: count + min/max for every histogrammed column in ONE job.
    val aggExprs = Seq(count(lit(1)).as("__n")) ++ intCols.flatMap { c =>
      Seq(min(exprOf(c)).as(s"__min_$c"), max(exprOf(c)).as(s"__max_$c"))
    }
    val row: Row = df.agg(aggExprs.head, aggExprs.tail: _*).head()
    val n = row.getLong(row.fieldIndex("__n"))

    val ranges: IndexedSeq[(String, Long, Long)] = intCols.flatMap { c =>
      val mi = row.fieldIndex(s"__min_$c")
      val ma = row.fieldIndex(s"__max_$c")
      if (row.isNullAt(mi) || row.isNullAt(ma)) None
      else Some((c, row.getLong(mi), row.getLong(ma)))
    }

    // No histogram objects on light builds: an all-zero histogram would
    // answer selectivity queries with garbage (e.g. LT mid-domain = 1.0).
    val hists: Map[String, IntHistogram] =
      if (!withHistograms) Map.empty
      else ranges.map { case (c, lo, hi) =>
        c -> new IntHistogram(numBins, lo, hi)
      }.toMap

    // Pass 2 (full builds): all histograms in ONE job via the typed
    // HistogramAgg aggregator — each column contributes one Array[Long]
    // buffer, merged tree-wise; no row ever re-keys through a shuffle
    // (the explode + groupBy(col, bucket) alternative shuffles
    // numCols x rows) — plus the HLL ndv sketches in the SAME job.
    var ndvs: Map[String, Long] = Map.empty
    if (withHistograms && (ranges.nonEmpty || ndvCols.nonEmpty) && n > 0) {
      val aggCols = ranges.map { case (c, lo, hi) =>
        HistogramAgg.column(exprOf(c), lo, hi, numBins).as(s"__h_$c")
      } ++ ndvCols.map(c => approx_count_distinct(col(c)).as(s"__ndv_$c"))
      val hrow = df.agg(aggCols.head, aggCols.tail: _*).head()
      ranges.zipWithIndex.foreach { case ((c, _, _), i) =>
        val counts = hrow.getSeq[Long](i)
        var b = 0
        while (b < counts.length) {
          if (counts(b) > 0) hists(c).addBucketCount(b, counts(b))
          b += 1
        }
      }
      ndvs = ndvCols.flatMap { c =>
        val i = hrow.fieldIndex(s"__ndv_$c")
        if (hrow.isNullAt(i)) None else Some(c -> hrow.getLong(i))
      }.toMap
    }

    val pages = numPagesOverride.getOrElse {
      val bytes = df.queryExecution.optimizedPlan.stats.sizeInBytes
      math.max(1L, ((bytes + PageSizeBytes - 1) / PageSizeBytes).toLong)
    }

    new TableStats(n, ioCostPerPage, pages, intCols, hists,
      ranges.map { case (c, lo, hi) => c -> (lo, hi) }.toMap, ndvs)
  }

  /** Build stats for several tables with their Spark jobs submitted
    * concurrently — each build is 1-2 independent jobs, and on an
    * otherwise-idle scheduler (driver-side planning time) running them
    * sequentially leaves the cluster idle between jobs. Thread-safe:
    * Spark job submission is designed for multi-threaded drivers.
    */
  def buildMany(
      tables: Map[String, DataFrame],
      ioCostPerPage: Double = 100.0,
      withHistograms: Boolean = true): Map[String, TableStats] = {
    import scala.concurrent.{Await, ExecutionContext, Future, blocking}
    import scala.concurrent.duration.Duration
    implicit val ec: ExecutionContext = ExecutionContext.global
    // blocking{}: each build awaits Spark jobs, so without it a large
    // table map would pin every global fork-join worker for the whole
    // Await and starve unrelated users of the shared pool.
    val futures = tables.map { case (n, df) =>
      Future(blocking { n -> build(df, ioCostPerPage, withHistograms = withHistograms) })
    }
    Await.result(Future.sequence(futures), Duration.Inf).toMap
  }

  /** Reconstruction from persisted parts ([[StatsRegistry.load]]) —
    * package-private: only the persistence path may bypass the
    * distributed build.
    */
  private[stats] def fromParts(
      numTuples: Long,
      ioCostPerPage: Double,
      numPages: Long,
      columns: IndexedSeq[String],
      hists: Map[String, IntHistogram],
      ranges: Map[String, (Long, Long)],
      ndvs: Map[String, Long]): TableStats =
    new TableStats(numTuples, ioCostPerPage, numPages, columns, hists,
      ranges, ndvs)

  /** Test/bench constructor from pre-built histograms (no Spark). */
  def fromHistograms(
      numTuples: Long,
      ioCostPerPage: Double,
      numPages: Long,
      hists: IndexedSeq[(String, IntHistogram)]): TableStats =
    new TableStats(numTuples, ioCostPerPage, numPages,
      hists.map(_._1), hists.toMap,
      hists.map { case (c, h) => c -> (h.minV, h.maxV) }.toMap, Map.empty)
}
