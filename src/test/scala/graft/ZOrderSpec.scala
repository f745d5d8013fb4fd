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

  test("empty input writes an empty table instead of failing on ranges") {
    val empty = graft.core.Catalog.table(spark, "/root/testdata/sf0.001", "orders")
      .select("o_orderkey", "o_custkey", "o_totalprice")
      .where(lit(false))
    val dir = Files.createTempDirectory("graft-zempty").toString
    ZOrder.writeZOrdered(empty, dir, Seq("o_custkey", "o_totalprice"), numFiles = 4)
    assert(spark.read.parquet(dir).count() == 0)
  }
}
