package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.nio.file.Files

/** Source/sink format coverage (SURVEY §2 row 2): the engine's tables
  * round-trip losslessly through parquet, CSV (with explicit schema) and
  * JSON lines, and partitioned writes prune at read time.
  */
class SourcesSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private val dir = "/root/testdata/sf0.001"

  test("CSV and JSON round-trip the nation table losslessly") {
    val nation = graft.core.Catalog.table(spark, dir, "nation")
    val expected = nation.collect().map(_.toSeq).toSet

    val csvDir = Files.createTempDirectory("graft-csv").toString
    nation.write.mode("overwrite").option("header", "true").csv(csvDir)
    val fromCsv = spark.read.schema(nation.schema)
      .option("header", "true").csv(csvDir)
    assert(fromCsv.collect().map(_.toSeq).toSet == expected)

    val jsonDir = Files.createTempDirectory("graft-json").toString
    nation.write.mode("overwrite").json(jsonDir)
    val fromJson = spark.read.schema(nation.schema).json(jsonDir)
    assert(fromJson.collect().map(_.toSeq).toSet == expected)
  }

  test("XML round-trips the nation table through the native Spark 4 source") {
    val nation = graft.core.Catalog.table(spark, dir, "nation")
    val expected = nation.collect().map(_.toSeq).toSet
    val xmlDir = Files.createTempDirectory("graft-xml").toString
    graft.sources.Formats.writeXml(nation, xmlDir, rowTag = "nation")
    val back = graft.sources.Formats.readXml(spark, xmlDir, nation.schema,
      rowTag = "nation")
    assert(back.collect().map(_.toSeq).toSet == expected)
  }

  test("XML round-trip preserves surrounding whitespace in strings") {
    import spark.implicits._
    // corpus text is whitespace-significant; the source's
    // ignoreSurroundingSpaces default would trim these
    val rows = Seq((1L, "  leading"), (2L, "trailing  "), (3L, " both "),
      (4L, "inner  kept"))
    val df = rows.toDF("id", "text")
    val xmlDir = Files.createTempDirectory("graft-xml-ws").toString
    graft.sources.Formats.writeXml(df, xmlDir, rowTag = "doc")
    val back = graft.sources.Formats.readXml(spark, xmlDir, df.schema,
      rowTag = "doc").as[(Long, String)].collect().toSet
    assert(back == rows.toSet)
  }

  test("binaryFile source feeds the multimodal decode pipeline") {
    val binDir = Files.createTempDirectory("graft-bin")
    def be32(v: Int): Array[Byte] =
      Array(((v >> 24) & 0xff).toByte, ((v >> 16) & 0xff).toByte,
        ((v >> 8) & 0xff).toByte, (v & 0xff).toByte)
    def hexBytes(s: String): Array[Byte] =
      s.grouped(2).map(Integer.parseInt(_, 16).toByte).toArray
    def png(w: Int, h: Int): Array[Byte] =
      hexBytes("89504E470D0A1A0A0000000D49484452") ++ be32(w) ++ be32(h) ++
        hexBytes("080200000000000000")
    Files.write(binDir.resolve("a.png"), png(5, 7))
    Files.write(binDir.resolve("b.png"), png(640, 480))
    Files.write(binDir.resolve("noise.txt"), "not an image".getBytes)

    // glob filter prunes non-matching files at the LISTING
    val files = graft.sources.Formats.readBinaryFiles(
      spark, binDir.toString, globFilter = Some("*.png"))
    assert(files.count() == 2)
    assert(Seq("path", "length", "content").forall(files.columns.contains))

    // rogue-file guard drops by length without reading content
    val small = graft.sources.Formats.readBinaryFiles(
      spark, binDir.toString, globFilter = Some("*.png"),
      maxBytesPerFile = Some(png(5, 7).length - 1L))
    assert(small.count() == 0)

    // the listed files flow straight into the decode stage
    val media = files.select(
      xxhash64(col("path")).as("media_id"),
      lit("image/png").as("kind"), col("content"))
    val metas = graft.operators.Multimodal.decodeImages(spark, media).collect()
    assert(metas.length == 2 && metas.forall(_.format == "png"))
    assert(metas.map(m => (m.width, m.height)).toSet == Set((5L, 7L), (640L, 480L)))
  }

  test("ORC round-trips the nation table and pushes filters to the scan") {
    val nation = graft.core.Catalog.table(spark, dir, "nation")
    val expected = nation.collect().map(_.toSeq).toSet
    val orcDir = Files.createTempDirectory("graft-orc").toString
    graft.sources.Formats.writeOrc(nation, orcDir)
    val back = graft.sources.Formats.readOrc(spark, orcDir)
    assert(back.collect().map(_.toSeq).toSet == expected)
    // predicate pushdown reaches the ORC reader like parquet
    val scanDesc = back.where(col("n_nationkey") < 5)
      .queryExecution.executedPlan.toString
    assert(scanDesc.contains("PushedFilters") &&
      scanDesc.contains("LessThan(n_nationkey,5)"), scanDesc)
  }

  test("strict CSV/JSON readers fail loudly on malformed records") {
    import org.apache.spark.sql.types.{LongType, StructField, StructType}
    val schema = StructType(Seq(StructField("k", LongType), StructField("v", LongType)))
    // Spark's default PERMISSIVE mode would silently null the malformed
    // row and let the corruption flow downstream; the strict readers'
    // contract is drift-fails-loudly (readCsvTolerant is the designated
    // permissive path)
    val csvDir = Files.createTempDirectory("graft-ffcsv")
    Files.write(csvDir.resolve("bad.csv"), "k,v\n1,10\nx,oops\n".getBytes("UTF-8"))
    val e1 = intercept[Exception] {
      graft.sources.Formats.readCsv(spark, csvDir.toString, schema).collect()
    }
    assert(SharedSpark.messages(e1).exists(m =>
      m.contains("Malformed") || m.contains("FAILFAST")), s"got: $e1")
    val jsonDir = Files.createTempDirectory("graft-ffjson")
    Files.write(jsonDir.resolve("bad.json"),
      "{\"k\": 1, \"v\": 10}\n{\"k\": \"x\"}\n".getBytes("UTF-8"))
    val e2 = intercept[Exception] {
      graft.sources.Formats.readJsonLines(spark, jsonDir.toString, schema).collect()
    }
    assert(SharedSpark.messages(e2).exists(m =>
      m.contains("Malformed") || m.contains("FAILFAST")), s"got: $e2")
  }

  test("Catalog.table(events) restores the nanos conf when the read fails") {
    val key = "spark.sql.legacy.parquet.nanosAsLong"
    spark.conf.unset(key)
    // a failed events read must not leak the legacy conf into the
    // session — leaked, it silently decodes NANOS timestamp columns as
    // long in every later parquet read
    intercept[Exception] {
      graft.core.Catalog.table(spark, "/nonexistent-graft-dir", "events")
    }
    // getOption returns the registered default ("false") when no session
    // override is set — the leak would be an explicit "true"
    assert(!spark.conf.getOption(key).contains("true"),
      "nanosAsLong leaked into the session after a failed events read")
    // and the success path still reads events normally afterwards
    assert(graft.core.Catalog.table(spark, dir, "events").count() > 0)
  }

  test("tolerant CSV: malformed rows quarantine instead of killing the job") {
    import org.apache.spark.sql.types._
    val dir = Files.createTempDirectory("graft-badcsv")
    Files.writeString(dir.resolve("data.csv"),
      "k,v\n1,alpha\nnot_a_number,beta\n3,gamma\n")
    val schema = StructType(Seq(
      StructField("k", LongType), StructField("v", StringType)))
    val df = graft.sources.Formats
      .readCsvTolerant(spark, dir.toString, schema).cache()
    try {
      val good = df.where(col("_corrupt_record").isNull)
      val bad = df.where(col("_corrupt_record").isNotNull)
      assert(good.count() == 2 && bad.count() == 1)
      assert(bad.select("_corrupt_record").head().getString(0)
        .startsWith("not_a_number"))
    } finally df.unpersist()
  }

  test("partitioned parquet write prunes partitions at read") {
    val orders = graft.core.Catalog.table(spark, dir, "orders")
      .withColumn("yr", year(col("o_orderdate")))
    val outDir = Files.createTempDirectory("graft-part").toString
    orders.write.mode("overwrite").partitionBy("yr").parquet(outDir)

    val pruned = spark.read.parquet(outDir).where(col("yr") === 1996)
    val expected = orders.where(col("yr") === 1996).count()
    assert(pruned.count() == expected && expected > 0)
    // partition filter must appear as such, not as a data filter
    val scan = pruned.queryExecution.executedPlan.toString
    assert(scan.contains("PartitionFilters: [isnotnull(yr"), scan)
  }
}
