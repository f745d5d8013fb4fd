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
