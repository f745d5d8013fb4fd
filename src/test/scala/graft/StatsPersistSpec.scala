package graft

import graft.stats.{PredicateOp, StatsRegistry, TableStats}
import org.apache.spark.sql.DataFrame
import org.scalatest.funsuite.AnyFunSuite

/** The persisted statistics catalog (r13 verdict #1): register → save →
  * fresh registry → load → forPlan must round-trip with BIT-IDENTICAL
  * selectivities (the sidecar is the reference's `Catalog.txt` analogue
  * — `test/utils/utils.cc:43-46` — so a fresh driver process gets
  * histogram-driven Selinger reordering without re-running the two-pass
  * distributed build), and the staleness guard must drop an entry by
  * name when the file set behind the scan changes.
  */
class StatsPersistSpec extends AnyFunSuite {

  private def scratch(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft-statspersist-$tag")
    d.toFile.deleteOnExit()
    d.toString
  }

  private def writeTable(path: String, seed: Int, n: Int = 5000): DataFrame = {
    val spark = SharedSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(seed)
    Seq.fill(n)((1 + rnd.nextInt(97), rnd.nextInt(1000).toLong, s"s${rnd.nextInt(50)}"))
      .toDF("k", "v", "tag")
      .coalesce(2).write.mode("overwrite").parquet(path)
    spark.read.parquet(path)
  }

  // the full probe grid a Selinger decision would consult: every op at
  // boundary and interior values, plus row count / ndv / scan cost
  private def probeGrid(ts: TableStats): Seq[Double] = {
    val vals = Seq(0L, 1L, 13L, 49L, 97L, 98L)
    (for {
      c <- Seq("k", "v"); op <- PredicateOp.all; v <- vals
    } yield ts.estimateSelectivity(c, op, v)) ++
      Seq(ts.numTuples.toDouble, ts.estimateScanCost(),
        ts.estimateNdv("k").get.toDouble, ts.estimateNdv("v").get.toDouble,
        ts.estimateNdv("tag").get.toDouble,
        ts.estimateTableCardinality(0.37).toDouble)
  }

  test("register → save → fresh registry → load → forPlan: bit-identical selectivities") {
    val spark = SharedSpark.spark
    val tableDir = scratch("table")
    val sidecar = scratch("sidecar")
    val df = writeTable(tableDir, seed = 42)
    val built = TableStats.build(df)
    StatsRegistry.register(df, built, full = true)
    val before = probeGrid(built)
    val saved = StatsRegistry.save(spark, sidecar)
    assert(saved >= 1, "the registered entry must persist")

    StatsRegistry.clear() // fresh process simulation
    assert(StatsRegistry.forPlan(df.queryExecution.analyzed).isEmpty)
    val loaded = StatsRegistry.load(spark, sidecar)
    assert(loaded == saved)

    // the loaded entry resolves through the SAME plan-key path Selinger
    // uses, passes the signature check, and answers every probe with the
    // exact doubles the in-process build answered (== on Double: the
    // persisted counts/ranges feed the identical arithmetic)
    val freshDf = spark.read.parquet(tableDir)
    val got = StatsRegistry.forPlan(freshDf.queryExecution.analyzed)
    assert(got.isDefined, "loaded entry must resolve for the same parquet dir")
    val after = probeGrid(got.get)
    assert(before == after,
      s"selectivity grid must round-trip bit-identically; diffs at " +
        before.zip(after).zipWithIndex.filter(p => p._1._1 != p._1._2).take(3))
    // second lookup takes the verified fast path and still answers
    assert(StatsRegistry.forPlan(freshDf.queryExecution.analyzed).isDefined)
  }

  test("staleness guard: a changed file set drops the loaded entry (named refusal → rebuild)") {
    val spark = SharedSpark.spark
    val tableDir = scratch("stale")
    val sidecar = scratch("stale-sidecar")
    val df = writeTable(tableDir, seed = 7)
    StatsRegistry.register(df, TableStats.build(df), full = true)
    assert(StatsRegistry.save(spark, sidecar) >= 1)

    // the data changes: same directory, regenerated content (new part
    // files — exactly the driver-regenerates-testdata scenario)
    val df2 = writeTable(tableDir, seed = 8, n = 7000)

    StatsRegistry.clear()
    StatsRegistry.load(spark, sidecar)
    // the loaded entry's stored signature no longer matches the live file
    // set → dropped, NOT served (optimizing on stale histograms is the
    // failure mode the guard exists for)
    assert(StatsRegistry.forPlan(df2.queryExecution.analyzed).isEmpty,
      "stale entry must be refused")
    // and the refusal is terminal for the entry: a rebuild re-registers
    val rebuilt = TableStats.build(df2)
    StatsRegistry.register(df2, rebuilt, full = true)
    val got = StatsRegistry.forPlan(df2.queryExecution.analyzed)
    assert(got.exists(_.numTuples == 7000L))
  }

  test("completeness guard: a light entry never satisfies a with-histograms request") {
    val spark = SharedSpark.spark
    val tableDir = scratch("light")
    val sidecar = scratch("light-sidecar")
    val df = writeTable(tableDir, seed = 9)
    StatsRegistry.register(df, TableStats.build(df, withHistograms = false),
      full = false)
    StatsRegistry.save(spark, sidecar)
    StatsRegistry.clear()
    StatsRegistry.load(spark, sidecar)
    assert(StatsRegistry.lookupVerified(df, needFull = true).isEmpty,
      "a row-count-only entry must not answer a histogram request")
    val light = StatsRegistry.lookupVerified(df, needFull = false)
    assert(light.exists { case (ts, full) => !full && ts.numTuples == 5000L })
    // a full entry DOES satisfy a light request (full beats light)
    StatsRegistry.register(df, TableStats.build(df), full = true)
    assert(StatsRegistry.lookupVerified(df, needFull = false).exists(_._2))
  }

  test("save refuses to delete a non-sidecar target (ADVICE r14 delete guard)") {
    val spark = SharedSpark.spark
    val tableDir = scratch("guard")
    val df = writeTable(tableDir, seed = 21)
    StatsRegistry.clear()
    StatsRegistry.register(df, TableStats.build(df), full = true)
    // a dir holding innocent non-sidecar content: the misconfigured
    // GRAFT_STATS_DIR scenario (pointed at testdata / an output dir) —
    // pre-guard, save() recursively destroyed it on the first build
    val victim = scratch("victim")
    val innocent = java.nio.file.Paths.get(victim, "precious.txt")
    java.nio.file.Files.writeString(innocent, "not a sidecar")
    val e = intercept[IllegalArgumentException] { StatsRegistry.save(spark, victim) }
    assert(e.getMessage.contains("refusing to delete"))
    assert(java.nio.file.Files.exists(innocent), "the guarded dir must be untouched")
    assert(java.nio.file.Files.readString(innocent) == "not a sidecar")
    // an empty dir IS a legal target, and so is a prior sidecar (the
    // overwrite path the guard must not break)
    val ok = scratch("guard-ok")
    assert(StatsRegistry.save(spark, ok) >= 1)
    assert(StatsRegistry.save(spark, ok) >= 1)
    // a plain FILE at the target refuses by name too
    val filePath = java.nio.file.Paths.get(scratch("guard-file"), "f")
    java.nio.file.Files.writeString(filePath, "x")
    val e2 = intercept[IllegalArgumentException] {
      StatsRegistry.save(spark, filePath.toString)
    }
    assert(e2.getMessage.contains("not a directory"))
    assert(java.nio.file.Files.readString(filePath) == "x")
    // a SPARK OUTPUT directory (parquet table: part-*.parquet +
    // _SUCCESS) is the canonical misconfigured-GRAFT_STATS_DIR victim —
    // _SUCCESS alone must NOT read as a sidecar marker (review r15)
    val parquetDir = scratch("guard-parquet")
    writeTable(parquetDir, seed = 22, n = 100)
    val e3 = intercept[IllegalArgumentException] {
      StatsRegistry.save(spark, parquetDir)
    }
    assert(e3.getMessage.contains("refusing to delete"))
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(parquetDir, "_SUCCESS")),
      "the parquet table must be untouched")
    // and a trailing-slash target resolves the SAME lock/guard paths as
    // its normalized form (a naive dir+'.lock' would land the lock file
    // INSIDE the target and refuse every save of a fresh dir)
    val slashed = scratch("guard-slash")
    assert(StatsRegistry.save(spark, slashed + "/") >= 1)
    assert(java.nio.file.Files.exists(
      java.nio.file.Paths.get(slashed + ".lock")),
      "the lock file must be a SIBLING of the normalized target")
  }

  test("format version: future and pre-versioning rows are refused by name (r14 verdict #5)") {
    val spark = SharedSpark.spark
    val tableDir = scratch("ver")
    val sidecar = scratch("ver-sidecar")
    val df = writeTable(tableDir, seed = 31)
    StatsRegistry.clear()
    StatsRegistry.register(df, TableStats.build(df), full = true)
    assert(StatsRegistry.save(spark, sidecar) == 1)
    // doctor the sidecar rows in place (drop the .crc twins so the local
    // checksum filesystem does not veto the edited bytes)
    def rewrite(f: String => String): Unit = {
      import scala.jdk.CollectionConverters._
      val entries = scala.util.Using.resource(
        java.nio.file.Files.list(java.nio.file.Paths.get(sidecar)))(
        _.iterator().asScala.toList)
      entries.foreach { p =>
        val n = p.getFileName.toString
        if (n.startsWith(".") && n.endsWith(".crc")) java.nio.file.Files.delete(p)
        else if (n.startsWith("part-") && n.endsWith(".json"))
          java.nio.file.Files.writeString(p, f(java.nio.file.Files.readString(p)))
      }
    }
    // a FUTURE format version: deserializing it by name would read
    // arbitrarily-reinterpreted fields as live statistics
    rewrite(_.replace("\"version\":2", "\"version\":99"))
    StatsRegistry.clear()
    assert(StatsRegistry.load(spark, sidecar) == 0, "future-version rows must not load")
    assert(StatsRegistry.forPlan(df.queryExecution.analyzed).isEmpty)
    // the pre-versioning r14 format: no version field at all
    rewrite(_.replace(",\"version\":99}", "}"))
    StatsRegistry.clear()
    assert(StatsRegistry.load(spark, sidecar) == 0, "pre-versioning rows must be refused")
    // a rebuild + save rewrites the sidecar in the current format (the
    // merge-on-save re-read must refuse the doctored rows too, not carry
    // them forward)
    StatsRegistry.register(df, TableStats.build(df), full = true)
    assert(StatsRegistry.save(spark, sidecar) == 1)
    StatsRegistry.clear()
    assert(StatsRegistry.load(spark, sidecar) == 1)
    assert(StatsRegistry.forPlan(df.queryExecution.analyzed).isDefined)
  }

  test("two-process save survivorship: merge-on-save keeps a peer's entries (ADVICE r14)") {
    val spark = SharedSpark.spark
    val sidecar = scratch("merge-sidecar")
    val dfA = writeTable(scratch("merge-a"), seed = 41)
    val dirB = scratch("merge-b")
    val dfB = writeTable(dirB, seed = 43, n = 6000)
    StatsRegistry.clear()
    StatsRegistry.register(dfA, TableStats.build(dfA), full = true)
    assert(StatsRegistry.save(spark, sidecar) == 1)
    // "process 2": a fresh registry that only ever built B saves to the
    // SAME dir — pre-merge this was last-writer-wins and silently erased
    // A's entry (ADVICE r14 / r14 verdict #5)
    StatsRegistry.clear()
    StatsRegistry.register(dfB, TableStats.build(dfB), full = true)
    assert(StatsRegistry.save(spark, sidecar) == 2, "the save must carry A forward")
    StatsRegistry.clear()
    assert(StatsRegistry.load(spark, sidecar) == 2)
    assert(StatsRegistry.forPlan(dfA.queryExecution.analyzed).exists(_.numTuples == 5000L))
    assert(StatsRegistry.forPlan(dfB.queryExecution.analyzed).exists(_.numTuples == 6000L))
    // key conflict: the in-memory (fresher) build wins over the carried
    // disk row — B regenerated at 7000 rows replaces the 6000-row entry
    val dfB2 = writeTable(dirB, seed = 44, n = 7000)
    StatsRegistry.clear()
    StatsRegistry.register(dfB2, TableStats.build(dfB2), full = true)
    assert(StatsRegistry.save(spark, sidecar) == 2)
    StatsRegistry.clear()
    StatsRegistry.load(spark, sidecar)
    assert(StatsRegistry.forPlan(dfB2.queryExecution.analyzed).exists(_.numTuples == 7000L))
    // and the sidecar lock released cleanly: a fresh exclusive claim on
    // the lock file succeeds immediately after save/load returned
    val ch = java.nio.channels.FileChannel.open(
      java.nio.file.Paths.get(sidecar + ".lock"),
      java.nio.file.StandardOpenOption.WRITE)
    try {
      val l = ch.tryLock()
      assert(l != null, "sidecar lock must be free after save/load")
      l.release()
    } finally ch.close()
  }

  test("future-format rows survive an older binary's save verbatim (ADVICE r15)") {
    val spark = SharedSpark.spark
    val sidecar = scratch("future-sidecar")
    val dfA = writeTable(scratch("future-a"), seed = 51)
    StatsRegistry.clear()
    StatsRegistry.register(dfA, TableStats.build(dfA), full = true)
    assert(StatsRegistry.save(spark, sidecar) == 1)
    // a NEWER binary's row lands in the sidecar (format version 99, a
    // shape this binary's PStats schema does not know)
    val futureLine = """{"key":"file:/future/table.parquet","version":99,""" +
      """"new_field_this_binary_never_heard_of":{"a":[1,2,3]}}"""
    import scala.jdk.CollectionConverters._
    val part = scala.util.Using.resource(
      java.nio.file.Files.list(java.nio.file.Paths.get(sidecar)))(
      _.iterator().asScala.toList)
      .find { p =>
        val n = p.getFileName.toString
        n.startsWith("part-") && n.endsWith(".json")
      }.get
    // drop the .crc twin so the local checksum fs accepts the edit
    scala.util.Using.resource(
      java.nio.file.Files.list(java.nio.file.Paths.get(sidecar)))(
      _.iterator().asScala.toList)
      .filter(p => p.getFileName.toString.endsWith(".crc"))
      .foreach(java.nio.file.Files.delete)
    java.nio.file.Files.writeString(part,
      java.nio.file.Files.readString(part) + futureLine + "\n")
    // this (older) binary saves a second table over the same sidecar:
    // pre-fix, merge-on-save carried only current-version rows and the
    // newer peer's row was permanently DELETED
    val dfB = writeTable(scratch("future-b"), seed = 52, n = 6000)
    StatsRegistry.clear()
    StatsRegistry.register(dfB, TableStats.build(dfB), full = true)
    assert(StatsRegistry.save(spark, sidecar) == 2, "A carried + B fresh")
    val rawAfter = scala.util.Using.resource(
      java.nio.file.Files.list(java.nio.file.Paths.get(sidecar)))(
      _.iterator().asScala.toList)
      .filter { p =>
        val n = p.getFileName.toString
        n.startsWith("part-") && n.endsWith(".json")
      }
      .map(java.nio.file.Files.readString(_)).mkString
    assert(rawAfter.contains(futureLine),
      "the future-format row must ride through the rewrite verbatim")
    // this binary still refuses it at load; the typed rows still work
    StatsRegistry.clear()
    assert(StatsRegistry.load(spark, sidecar) == 2)
    assert(StatsRegistry.forPlan(dfA.queryExecution.analyzed).isDefined)
    assert(StatsRegistry.forPlan(dfB.queryExecution.analyzed).isDefined)
    // and a THIRD save keeps preserving it (stable across rewrites)
    StatsRegistry.clear()
    StatsRegistry.register(dfB, TableStats.build(dfB), full = true)
    assert(StatsRegistry.save(spark, sidecar) == 2)
    val rawThird = scala.util.Using.resource(
      java.nio.file.Files.list(java.nio.file.Paths.get(sidecar)))(
      _.iterator().asScala.toList)
      .filter(p => p.getFileName.toString.endsWith(".json"))
      .map(java.nio.file.Files.readString(_)).mkString
    assert(rawThird.contains(futureLine))
  }

  test("delete guard: a sidecar-LIKE dir mixing foreign files refuses (ADVICE r15)") {
    val spark = SharedSpark.spark
    val dfA = writeTable(scratch("mixed-a"), seed = 61)
    StatsRegistry.clear()
    StatsRegistry.register(dfA, TableStats.build(dfA), full = true)
    // pre-fix: ONE part-*.json anywhere in the dir licensed a recursive
    // delete of EVERYTHING in it — a user dir that happens to hold a
    // sidecar-like file plus unrelated content was still destroyed
    val victim = scratch("mixed-victim")
    java.nio.file.Files.writeString(
      java.nio.file.Paths.get(victim, "part-00000.json"), "{}")
    val innocent = java.nio.file.Paths.get(victim, "precious.txt")
    java.nio.file.Files.writeString(innocent, "user data")
    val e = intercept[IllegalArgumentException] { StatsRegistry.save(spark, victim) }
    assert(e.getMessage.contains("refusing to delete"))
    assert(e.getMessage.contains("precious.txt"),
      "the refusal must name the foreign entry")
    assert(java.nio.file.Files.readString(innocent) == "user data")
    // a PURE prior sidecar (only _SUCCESS/part-*.json/.crc) still saves
    val ok = scratch("mixed-ok")
    assert(StatsRegistry.save(spark, ok) >= 1)
    assert(StatsRegistry.save(spark, ok) >= 1)
  }

  test("save GCs entries whose local file set is gone (dead scratch paths)") {
    val spark = SharedSpark.spark
    val tableDir = scratch("gone")
    val sidecar = scratch("gone-sidecar")
    val df = writeTable(tableDir, seed = 11)
    StatsRegistry.clear()
    StatsRegistry.register(df, TableStats.build(df), full = true)
    // delete the table out from under the registry entry
    import scala.jdk.CollectionConverters._
    scala.util.Using.resource(
      java.nio.file.Files.walk(java.nio.file.Paths.get(tableDir))) { w =>
      w.sorted(java.util.Comparator.reverseOrder())
        .iterator().asScala.foreach(java.nio.file.Files.delete)
    }
    assert(StatsRegistry.save(spark, sidecar) == 0,
      "a dead path's entry must not be written to the sidecar")
  }
}
