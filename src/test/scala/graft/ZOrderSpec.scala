package graft

import graft.core.ZOrder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Z-order layout spec: after clustering on two independent columns, a
  * narrow band predicate on EITHER column must touch only a fraction of
  * the files (each file has a tight bounding box in both dimensions),
  * whereas a hash layout spreads every value range over every file.
  * File-level containment is exactly what parquet footer min/max
  * skipping acts on at scale.
  */
class ZOrderSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private def filesTouched(dir: String, predicate: org.apache.spark.sql.Column): (Int, Int) = {
    val parts = new java.io.File(dir).listFiles()
      .filter(f => f.getName.startsWith("part-")).map(_.getPath).sorted
    val touched = parts.count(p => spark.read.parquet(p).where(predicate).limit(1).count() > 0)
    (touched, parts.length)
  }

  test("band predicates on either z-ordered dimension touch few files") {
    val orders = graft.core.Catalog.table(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val zDir = Files.createTempDirectory("graft-zorder").toString
    val hashDir = Files.createTempDirectory("graft-hash").toString
    ZOrder.writeZOrdered(orders, zDir, Seq("o_custkey", "o_totalprice"), numFiles = 8)
    orders.repartition(8).write.mode("overwrite").parquet(hashDir)

    val r = orders.agg(min("o_custkey"), max("o_custkey"),
      min("o_totalprice"), max("o_totalprice")).head()
    val (cLo, cHi) = (r.getLong(0), r.getLong(1))
    val (pLo, pHi) = (r.getDouble(2), r.getDouble(3))
    // ~10% bands in the middle of each domain
    val custBand = col("o_custkey").between(
      cLo + (cHi - cLo) * 45 / 100, cLo + (cHi - cLo) * 55 / 100)
    val priceBand = col("o_totalprice").between(
      pLo + (pHi - pLo) * 0.45, pLo + (pHi - pLo) * 0.55)

    for (band <- Seq(custBand, priceBand)) {
      val (zTouched, zTotal) = filesTouched(zDir, band)
      val (hTouched, hTotal) = filesTouched(hashDir, band)
      assert(zTotal == 8 && hTotal == 8)
      // hash spreads the band everywhere; z-order confines it
      assert(hTouched >= 7, s"hash layout unexpectedly selective: $hTouched")
      assert(zTouched <= 4, s"z-order not selective: $zTouched of $zTotal files")
    }

    // layout changes bytes, not data: full content identical
    assert(spark.read.parquet(zDir).collect().map(_.toSeq).toSet ==
      orders.collect().map(_.toSeq).toSet)
  }

  test("each file holds exactly one z-quadrant, at the same index every run") {
    val orders = graft.core.Catalog.table(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
    val r = orders.agg(
      min(col("o_custkey").cast("long")), max(col("o_custkey").cast("long")),
      min(col("o_totalprice").cast("long")), max(col("o_totalprice").cast("long"))).head()
    val ranges = Seq((col("o_custkey"), r.getLong(0), r.getLong(1)),
      (col("o_totalprice"), r.getLong(2), r.getLong(3)))
    val bucketShift = 16 * 2 - 3 // zbits - log2(numFiles)

    val dirs = Seq.fill(2)(Files.createTempDirectory("graft-zquad").toString)
    dirs.foreach(d => ZOrder.writeZOrdered(orders, d,
      Seq("o_custkey", "o_totalprice"), numFiles = 8))
    for (dir <- dirs) {
      val parts = new java.io.File(dir).listFiles()
        .filter(_.getName.startsWith("part-")).map(_.getPath).sorted
      assert(parts.length == 8)
      val quadrantsByFile = parts.zipWithIndex.map { case (p, i) =>
        val zbs = spark.read.parquet(p)
          .select(shiftright(ZOrder.zValue(ranges), bucketShift).as("zb"))
          .distinct().collect().map(_.getLong(0)).toSet
        assert(zbs.size == 1, s"file $i spans quadrants $zbs")
        i -> zbs.head
      }
      // direct placement: partition index IS the quadrant id
      assert(quadrantsByFile.toSeq == (0 until 8).map(i => i -> i.toLong))
    }
  }

  test("hash preimages pin Spark's shuffle-hash contract at runtime") {
    import spark.implicits._
    // hashPreimages hardcodes HashPartitioning's Murmur3(seed 42) + pmod
    // contract; if a Spark upgrade changes shuffle hashing, this breaks
    // HERE instead of silently destroying the one-quadrant-per-file
    // layout. Checked two ways, for each numFiles the writer uses:
    for (n <- Seq(2, 4, 8, 16)) {
      val pre = ZOrder.hashPreimages(n)
      assert(pre.keySet == (0L until n.toLong).toSet)
      val df = pre.toSeq.toDF("bucket", "key")
      // (a) against Spark's Murmur3Hash EXPRESSION (the codegen'd form)
      val viaExpr = df.select($"bucket", pmod(hash($"key"), lit(n)).as("p"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(viaExpr.forall { case (b, p) => p.toLong == b }, s"expr mismatch at n=$n: $viaExpr")
      // (b) against the ACTUAL shuffle placement repartition produces
      val placed = df.repartition(n, $"key")
        .select($"bucket", spark_partition_id().as("pid"))
        .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
      assert(placed.forall { case (b, pid) => pid.toLong == b }, s"shuffle mismatch at n=$n: $placed")
    }
  }

  test("zValue saturates out-of-range inputs instead of aliasing") {
    import spark.implicits._
    val df = Seq(5L, 9L, 10L, 15L, 20L, 21L, 300L).toDF("v")
    val zs = df.select(col("v"),
      ZOrder.zValue(Seq((col("v"), 10L, 20L)), bits = 8).as("z"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(zs(5L) == zs(10L) && zs(9L) == zs(10L))   // below range -> lo
    assert(zs(21L) == zs(20L) && zs(300L) == zs(20L)) // above range -> hi
    assert(zs(10L) < zs(15L) && zs(15L) < zs(20L))    // monotone inside
    // EXTREME out-of-range values against a negative lo: (v - lo) alone
    // exceeds the long envelope, so subtract-then-clamp threw ANSI
    // ARITHMETIC_OVERFLOW on exactly the rows saturation must absorb
    val ext = Seq(Long.MinValue, -100L, 0L, 100L, Long.MaxValue).toDF("v")
    val ez = ext.select(col("v"),
      ZOrder.zValue(Seq((col("v"), -100L, 100L)), bits = 8).as("z"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(ez(Long.MinValue) == ez(-100L) && ez(Long.MaxValue) == ez(100L))
    assert(ez(-100L) < ez(0L) && ez(0L) < ez(100L))
  }

  test("rows with a null clustered dimension land in a dedicated overflow file") {
    import spark.implicits._
    // without the explicit route, null-__zp rows all hash into one
    // arbitrary QUADRANT file, widening its min/max to near-full width
    // and silently defeating that file's skipping
    val df = (0L until 256L).map(i => (i, i % 16, i / 16))
      .toDF("id", "x", "y")
      .withColumn("x", when(col("id") % 64 === 0, lit(null).cast("long"))
        .otherwise(col("x")))
    val dir = Files.createTempDirectory("graft-znull").toString
    ZOrder.writeZOrdered(df, dir, Seq("x", "y"), numFiles = 4)
    val back = spark.read.parquet(dir)
    assert(back.count() == 256) // nothing dropped
    val perFile = back
      .groupBy(input_file_name().as("f"))
      .agg(sum(when(col("x").isNull, 1L).otherwise(0L)).as("nulls"),
        count(lit(1)).as("n"))
      .collect().map(r => (r.getLong(1), r.getLong(2)))
    // no file mixes null-dim rows with quadrant rows, and exactly one
    // file holds all of them
    assert(perFile.forall { case (nulls, n) => nulls == 0L || nulls == n },
      s"mixed quadrant/overflow file: ${perFile.mkString(", ")}")
    assert(perFile.count(_._1 > 0L) == 1)
    assert(perFile.map(_._1).sum == 4L)
  }

  test("empty input writes an empty table instead of failing on ranges") {
    val empty = graft.core.Catalog.table(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .where(lit(false))
    val dir = Files.createTempDirectory("graft-zempty").toString
    ZOrder.writeZOrdered(empty, dir, Seq("o_custkey", "o_totalprice"), numFiles = 4)
    assert(spark.read.parquet(dir).count() == 0)
  }
}
