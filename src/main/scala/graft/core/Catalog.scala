package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry: name → DataFrame over the driver-provided parquet
  * TESTDATA layout (`<dir>/<name>.parquet`). The analogue of the
  * reference's trivial catalog (`/root/reference/src/include/optimizer/
  * catalog.h:13-20` — a map table_id → page count), generalized to real
  * schemas: Spark's file index supplies size/row statistics.
  */
object Catalog {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  // Per-process parquet SCHEMA cache for the fixture tables (r16
  // optimization round, guide §1/§6): `spark.read.parquet` without a
  // schema re-reads parquet footers on the DRIVER on every call —
  // measured 77 ms/call at sf0.1 vs 8 ms with the schema supplied — and
  // a bench pass constructs every query 2-3 times, each construction
  // re-reading 1-4 tables. A production catalog serves schemas from
  // metadata (the reference's Catalog holds table metadata for exactly
  // this reason); schema-on-read per query is pure driver overhead at
  // any scale and grows with footer count at 100 TB. METADATA only —
  // never rows, never results. Staleness guard: the cached entry is
  // keyed to a cheap directory stamp (dir mtime + entry count), so a
  // rewritten fixture (test temp dirs, regenerated tapes) re-infers
  // instead of serving a stale schema.
  private val schemaCache = new java.util.concurrent.ConcurrentHashMap[
    String, (Long, org.apache.spark.sql.types.StructType)]()

  private def dirStamp(path: String): Long = {
    val f = new java.io.File(path)
    val children = f.listFiles()
    if (children == null) f.lastModified // plain file or missing: mtime alone
    else {
      // Fold child (name, mtime, length) into the stamp (ADVICE r16:
      // dir mtime + entry count alone misses an in-place rewrite of a
      // part file's CONTENTS — no entry added/removed/renamed — and
      // rewrites landing in the same mtime tick). Sorted by name so the
      // stamp is independent of listing order; fixture dirs hold a
      // handful of entries, so this stays a cheap metadata walk.
      var h = f.lastModified * 1000003L + children.length
      children.sortBy(_.getName).foreach { c =>
        h = h * 1000003L + c.getName.hashCode
        h = h * 1000003L + c.lastModified
        h = h * 1000003L + c.length()
      }
      h
    }
  }

  /** The table's parquet schema, inferred once per (path, dir-stamp) and
    * then served from process memory. `probe` performs the one-time
    * inference (the events branch needs a legacy conf live around it).
    */
  private def cachedSchema(path: String)(
      probe: => org.apache.spark.sql.types.StructType):
      org.apache.spark.sql.types.StructType = {
    val stamp = dirStamp(path)
    val hit = schemaCache.get(path)
    if (hit != null && hit._1 == stamp) hit._2
    else {
      val sch = probe
      schemaCache.put(path, (stamp, sch))
      sch
    }
  }

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    val path = s"$dir/$name.parquet"
    // events.ts has shipped as parquet TIMESTAMP(NANOS) in some testdata
    // generations (Spark 4 rejects it unless read as a raw long) and as
    // TIMESTAMP(MICROS, NTZ) in others. Normalize BOTH to a session-local
    // TimestampType column so downstream operators always see the same
    // schema. The legacy conf must be live while a NANOS generation's
    // scan plans/executes (task-side schema reconciliation consults it),
    // so it stays set in that case — INCLUDING on schema-cache hits,
    // where the probe ran in an earlier call (possibly on a DIFFERENT
    // session of this SparkContext: conf is per-session, the cache is
    // per-process); for a MICROS generation it was only a schema probe
    // and is RESTORED — leaving it set would silently decode NANOS
    // columns as long in every later parquet read of the session,
    // defeating the fail-loudly contract those reads rely on.
    if (name == "events") {
      import org.apache.spark.sql.functions._
      import org.apache.spark.sql.types.{LongType, TimestampNTZType}
      val key = "spark.sql.legacy.parquet.nanosAsLong"
      val rawSchema = cachedSchema(path) {
        val prev = spark.conf.getOption(key)
        spark.conf.set(key, "true")
        def restore(): Unit = prev match {
          case Some(v) => spark.conf.set(key, v)
          case None => spark.conf.unset(key)
        }
        // restore on ANY failure (missing/corrupt file, absent ts
        // column): leaking the conf would silently decode NANOS columns
        // as long in every later parquet read of the session
        try {
          val s = spark.read.parquet(path).schema
          s("ts").dataType match {
            case LongType => () // NANOS generation: conf stays set
            case _ => restore()
          }
          s
        } catch { case t: Throwable => restore(); throw t }
      }
      rawSchema("ts").dataType match {
        case LongType => // nanos-as-long generation: nanos -> micros
          // cache hit may come from another session: (re)set the conf so
          // THIS session's scan reconciles NANOS as long (idempotent)
          spark.conf.set(key, "true")
          spark.read.schema(rawSchema).parquet(path)
            .withColumn("ts", timestamp_micros(expr("ts div 1000")))
        case TimestampNTZType => // micros NTZ: same wall-clock
          spark.read.schema(rawSchema).parquet(path)
            .withColumn("ts", col("ts").cast("timestamp"))
        case _ => spark.read.schema(rawSchema).parquet(path)
      }
    } else {
      // Probe with the NANOS legacy conf explicitly CLEAR (ADVICE r16:
      // the cache is per-process but inference runs under per-session
      // conf — after an events NANOS probe leaves nanosAsLong=true in
      // its session, a first-time probe of another table here would
      // cache a conf-dependent LongType schema and serve it to sessions
      // without the conf). With the conf clear, a non-events fixture
      // that ever shipped NANOS timestamps fails the probe LOUDLY
      // (Spark 4 rejects NANOS without the conf) instead of poisoning
      // the process-wide cache.
      val sch = cachedSchema(path) {
        val key = "spark.sql.legacy.parquet.nanosAsLong"
        val prev = spark.conf.getOption(key)
        prev.foreach(_ => spark.conf.unset(key))
        try spark.read.parquet(path).schema
        finally prev.foreach(v => spark.conf.set(key, v))
      }
      spark.read.schema(sch).parquet(path)
    }
  }

  def loadAll(spark: SparkSession, dir: String): Map[String, DataFrame] =
    tableNames.map(n => n -> table(spark, dir, n)).toMap

  // value: (stats, whether histograms were built) — a light (row-count
  // only) entry upgrades in place when a caller first needs histograms
  private val statsCache = new java.util.concurrent.ConcurrentHashMap[
    (String, String), (graft.stats.TableStats, Boolean)]()

  /** Where built statistics persist ACROSS PROCESSES — the true analogue
    * of the reference's `Catalog.txt` (`test/utils/utils.cc:43-46`): a
    * fresh driver loads histogram/ndv/row-count stats from this sidecar
    * instead of re-running the two-pass distributed build (two full
    * corpus scans per table per process at 100 TB, for statistics that
    * only change when the data does). Staleness is guarded by the
    * per-entry file-set signature ([[graft.stats.StatsRegistry]]) — a
    * regenerated table fails the signature check by name and rebuilds.
    * `GRAFT_STATS_DIR` overrides the default `<cwd>/stats-catalog`;
    * `GRAFT_STATS_DIR=none` disables persistence (builds stay
    * process-local). An empty value fails by name, like the probe levers.
    * Concurrent PROCESSES sharing the default dir (Bench/Verify/
    * ScaleProbe overlap in driver rounds) are safe as of r15: save and
    * load hold an OS file lock on `<dir>.lock`, and save merges a
    * peer's entries forward instead of last-writer-wins
    * ([[graft.stats.StatsRegistry.save]]).
    */
  private lazy val statsPersistDir: Option[String] = {
    val raw = sys.env.getOrElse("GRAFT_STATS_DIR",
      s"${sys.props("user.dir")}/stats-catalog")
    require(raw.trim.nonEmpty,
      "GRAFT_STATS_DIR must name a directory or 'none', got an empty string")
    if (raw.trim == "none") None else Some(raw.trim)
  }

  // one load per process; the sidecar write is guarded so concurrent
  // builds (statsMany's futures racing a query-path stats() call) never
  // interleave two Spark overwrites of the same directory
  private val statsLoaded = new java.util.concurrent.atomic.AtomicBoolean(false)
  private val statsSaveLock = new Object

  private def ensureStatsLoaded(spark: SparkSession): Unit =
    if (statsLoaded.compareAndSet(false, true)) statsPersistDir.foreach { d =>
      // under the SAME lock as saveStats: a load racing a concurrent
      // save (statsMany's futures vs a query-path stats() call) would
      // read a mid-overwrite sidecar, drop the whole catalog, and the
      // racing save would then rewrite it with only its own entries —
      // silently shrinking the persisted set (review r14)
      statsSaveLock.synchronized {
        if (java.nio.file.Files.exists(java.nio.file.Paths.get(d, "_SUCCESS")))
          try {
            val n = graft.stats.StatsRegistry.load(spark, d)
            System.err.println(s"[stats] loaded $n persisted table-stats " +
              s"entries from $d (signature-checked lazily on first use)")
          } catch {
            // a corrupt sidecar must not take down every query — name it
            // and fall back to building (the pre-persistence behavior)
            case scala.util.control.NonFatal(e) =>
              System.err.println(s"[stats] persisted stats at $d unreadable " +
                s"($e) — falling back to distributed builds")
          }
      }
    }

  // Cost note (review r14): this rewrites the whole sidecar — one tiny
  // coalesce(1) job over kilobytes — and runs at most once per table per
  // process (the statsCache gates rebuilds), with statsMany batching all
  // its builds into one save. Correctness-first: every completed build
  // is durable immediately, so a later crash never loses it.
  private def saveStats(spark: SparkSession): Unit = statsPersistDir.foreach { d =>
    statsSaveLock.synchronized {
      try graft.stats.StatsRegistry.save(spark, d)
      catch {
        case scala.util.control.NonFatal(e) =>
          System.err.println(s"[stats] persisting stats to $d failed ($e) — " +
            "this process keeps its in-memory registry; the next process rebuilds")
      }
    }
  }

  /** [[graft.stats.TableStats]] memoized per (dir, table), and persisted
    * across processes via the stats sidecar ([[statsPersistDir]]) — the
    * analogue of the reference's persisted Catalog.txt: the fixtures are
    * immutable, so stats built once serve every later query in the
    * process, and a FRESH process loads them (signature-guarded) instead
    * of re-scanning every table. Each
    * build also registers with [[graft.stats.StatsRegistry]], so
    * [[graft.plans.SelingerJoinReorder]] sees true row counts (and, once
    * built, histogram selectivities) for SQL-path queries over these
    * tables. Histograms are a second aggregation job per table, so
    * callers that only need cardinalities pass `withHistograms = false`
    * and the histogram pass stays lazy until someone asks.
    */
  def stats(spark: SparkSession, dir: String, name: String,
      withHistograms: Boolean = true): graft.stats.TableStats = {
    val key = (dir, name)
    val cached = statsCache.get(key)
    if (cached != null && (cached._2 || !withHistograms)) cached._1
    else {
      ensureStatsLoaded(spark)
      val df = table(spark, dir, name)
      // persisted-catalog hit: signature-fresh and at least as complete
      // as requested → zero scans (the whole point of the sidecar)
      graft.stats.StatsRegistry.lookupVerified(df, needFull = withHistograms) match {
        case Some((ts, entryFull)) =>
          statsCache.merge(key, (ts, entryFull),
            (oldV, newV) => if (oldV._2 && !newV._2) oldV else newV)._1
        case None =>
          val ts = graft.stats.TableStats.build(df, withHistograms = withHistograms)
          // merge, never blind put: the check-then-put had a window where a
          // LIGHT (histogram-less) build racing a completed FULL build could
          // overwrite it in both the cache and the registry — silently
          // degrading every later Selinger decision to System R constants
          val kept = statsCache.merge(key, (ts, withHistograms),
            (oldV, newV) => if (oldV._2 && !newV._2) oldV else newV)
          if (kept._1 eq ts) {
            graft.stats.StatsRegistry.register(df, ts, full = withHistograms)
            saveStats(spark)
          }
          kept._1
      }
    }
  }

  /** Batch variant: builds only the missing tables, their Spark jobs
    * submitted concurrently via [[graft.stats.TableStats.buildMany]].
    */
  def statsMany(spark: SparkSession, dir: String, names: Seq[String],
      withHistograms: Boolean = true): Map[String, graft.stats.TableStats] = {
    val missing = names.filterNot { n =>
      val c = statsCache.get((dir, n))
      c != null && (c._2 || !withHistograms)
    }
    if (missing.nonEmpty) {
      ensureStatsLoaded(spark)
      // build the DataFrames once and reuse them for registration — a
      // second table() per name would repeat the driver-side file
      // listing/footer read (and the events ts-normalization branch)
      val dfs = missing.map(n => n -> table(spark, dir, n)).toMap
      // split persisted-catalog hits (signature-fresh, complete enough)
      // from the tables that genuinely need the distributed build
      val hits = dfs.flatMap { case (n, df) =>
        graft.stats.StatsRegistry.lookupVerified(df, needFull = withHistograms)
          .map(n -> _)
      }
      hits.foreach { case (n, (ts, entryFull)) =>
        statsCache.merge((dir, n), (ts, entryFull),
          (oldV, newV) => if (oldV._2 && !newV._2) oldV else newV)
      }
      val toBuild = dfs -- hits.keys
      if (toBuild.nonEmpty) {
        val built = graft.stats.TableStats.buildMany(toBuild,
          withHistograms = withHistograms)
        built.foreach { case (n, ts) =>
          // same full-beats-light merge as stats() — see the race note there
          val kept = statsCache.merge((dir, n), (ts, withHistograms),
            (oldV, newV) => if (oldV._2 && !newV._2) oldV else newV)
          if (kept._1 eq ts)
            graft.stats.StatsRegistry.register(dfs(n), ts, full = withHistograms)
        }
        saveStats(spark)
      }
    }
    names.map(n => n -> statsCache.get((dir, n))._1).toMap
  }

  /** Standard session factory: 32 shuffle partitions to match local[32]
    * (not the 200 default sized for clusters), AQE on for runtime
    * coalescing and skew-join handling.
    */
  def newSession(master: String = "local[32]"): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      // AQE on cached-plan consumers — see Bench.scala (r16)
      .config("spark.sql.optimizer.canChangeCachedPlanOutputPartitioning", "true")
      // 64k coalescing floor for CPU-dense sub-MB stages — see Bench.scala (r16)
      .config("spark.sql.adaptive.coalescePartitions.minPartitionSize", "64k")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions()(_))
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
