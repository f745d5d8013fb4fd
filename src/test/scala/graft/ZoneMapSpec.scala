package graft

import graft.core.ZoneMap
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** File-skipping contract of the zone-map layer: range-clustered files
  * carry disjoint-ish zones, a range probe reads only intersecting
  * files, and the pruned read + row predicate equals the full scan.
  */
class ZoneMapSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def freshDir(tag: String): String = {
    val d = java.nio.file.Files
      .createTempDirectory(s"graft-zonemap-$tag").toString
    d
  }

  test("range probe prunes most files; result equals the full-scan filter") {
    val dir = freshDir("prune")
    val df = (0L until 1000L).map(i => (i, s"row$i")).toDF("v", "payload")
    ZoneMap.write(df, dir, "v", numFiles = 16)
    val all = spark.read.parquet(dir)
    assert(all.count() == 1000L)
    val survivors = ZoneMap.survivingFiles(spark, dir, lit(100L), lit(150L))
    assert(survivors.nonEmpty && survivors.size < 16,
      s"expected a real prune, got ${survivors.size} of 16 files")
    val got = ZoneMap.prunedRead(spark, dir, lit(100L), lit(150L))
      .where(col("v").between(100L, 150L))
      .as[(Long, String)].collect().toSet
    val want = (100L to 150L).map(i => (i, s"row$i")).toSet
    assert(got == want)
  }

  test("a probe outside every zone reads zero files and returns empty, typed") {
    val dir = freshDir("empty")
    val df = (0L until 100L).map(i => (i, i * 2)).toDF("v", "w")
    ZoneMap.write(df, dir, "v", numFiles = 4)
    assert(ZoneMap.survivingFiles(spark, dir, lit(5000L), lit(6000L)).isEmpty)
    val out = ZoneMap.prunedRead(spark, dir, lit(5000L), lit(6000L))
    assert(out.columns.toSeq == Seq("v", "w"))
    assert(out.count() == 0L)
  }

  test("zone boundaries are honored: edge values survive in exactly one file's zone") {
    val dir = freshDir("edge")
    val df = (0L until 64L).map(i => (i, i)).toDF("v", "w")
    ZoneMap.write(df, dir, "v", numFiles = 8)
    // probe exactly one value: at most a couple of files can claim it
    val survivors = ZoneMap.survivingFiles(spark, dir, lit(17L), lit(17L))
    assert(survivors.nonEmpty && survivors.size <= 2, s"got $survivors")
    val got = ZoneMap.prunedRead(spark, dir, lit(17L), lit(17L))
      .where(col("v") === 17L).as[(Long, Long)].collect().toSeq
    assert(got == Seq((17L, 17L)))
  }

  test("the driver-side file list is capped: over-limit survivors fail by name") {
    // the ONE unbounded driver materialization the r11 verdict flagged:
    // survivingFiles collects paths only, but at >=10^6 files that list
    // itself is the hazard — the limit is in-plan (at most maxFiles + 1
    // paths ever reach the driver) and the failure is named, steering
    // callers to compaction instead of a ballooning collect
    val dir = freshDir("cap")
    val df = (0L until 64L).map(i => (i, i)).toDF("v", "w")
    ZoneMap.write(df, dir, "v", numFiles = 8)
    val e = intercept[IllegalStateException](
      ZoneMap.prunedRead(spark, dir, lit(0L), lit(63L), maxFiles = 4).count())
    assert(e.getMessage.contains("more than 4 files survive"))
    assert(e.getMessage.contains("Compaction"))
    // at the default cap the same probe reads everything, unchanged
    assert(ZoneMap.prunedRead(spark, dir, lit(0L), lit(63L)).count() === 64L)
    val bad = intercept[IllegalArgumentException](
      ZoneMap.survivingFiles(spark, dir, lit(0L), lit(1L), maxFiles = 0))
    assert(bad.getMessage.contains("maxFiles"))
  }
}
