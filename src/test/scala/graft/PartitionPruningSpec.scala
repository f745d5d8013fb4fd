package graft

import org.apache.spark.sql.execution.FileSourceScanExec
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Physical-design proof for the 100 TB layout argument (SCALE.md):
  * date-partitioned writes let a day-filtered query prune every
  * non-matching partition AT THE SCAN — the file listing shrinks, not
  * just the row stream. Companion to BucketingSpec (zero-exchange
  * co-located joins).
  */
class PartitionPruningSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("day filter reaches PartitionFilters and prunes the file listing") {
    val dir = java.nio.file.Files.createTempDirectory("graft-part").toString
    val events = graft.core.Catalog.table(spark, "/root/testdata/sf0.001", "events")
      .withColumn("day", to_date(col("ts")))
    events.write.partitionBy("day").mode("overwrite").parquet(dir)

    val read = spark.read.parquet(dir)
    val oneDay = read.where(col("day") === lit("2024-01-03").cast("date"))

    val scan = oneDay.queryExecution.executedPlan
      .collect { case s: FileSourceScanExec => s }.head
    assert(scan.metadata("PartitionFilters").contains("day"),
      s"day predicate not in PartitionFilters: ${scan.metadata("PartitionFilters")}")

    // execute through the SAME QueryExecution so the scan's metrics
    // populate, then compare files read against the full layout
    val rows = oneDay.collect().length.toLong
    val filesRead = scan.metrics("numFiles").value
    val totalFiles = {
      def walk(f: java.io.File): Seq[java.io.File] =
        if (f.isDirectory) f.listFiles().toSeq.flatMap(walk) else Seq(f)
      walk(new java.io.File(dir)).count(_.getName.endsWith(".parquet"))
    }
    assert(rows == 35L, s"expected 35 rows for 2024-01-03, got $rows")
    assert(filesRead < totalFiles,
      s"no pruning: read $filesRead of $totalFiles files")

    // correctness: partitioned read equals the unpartitioned filter
    val expected = events.where(col("day") === lit("2024-01-03").cast("date")).count()
    assert(oneDay.count() == expected)
  }
}
