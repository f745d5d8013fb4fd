package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Empirical pin of dropDuplicatesWithinWatermark's cross-trigger
  * eviction boundary (the within-delay-only guarantee its docs state
  * loosely), measured on a deterministic 4-trigger file tape:
  *
  *   1. A duplicate arriving in the SAME batch whose watermark evicts
  *      its key still DEDUPS — state drops at batch END, after the
  *      batch's rows are checked against it.
  *   2. A duplicate arriving one batch AFTER the eviction EMITS AGAIN —
  *      the documented guarantee is within-delay-only, and this is the
  *      precise batch boundary where it ends.
  *   3. A deduped duplicate does NOT extend its key's state lifetime:
  *      expiry stays anchored to the FIRST occurrence's event time (the
  *      13:55 duplicate deduped, yet the 13:56 one re-emitted — had the
  *      dedup re-armed expiry to 13:55 + delay, state would have
  *      survived and deduped it too).
  *
  * An upgrade that shifts any of these boundaries changes user-visible
  * dedup multiplicity — this pin makes that loud.
  */
class DedupEvictionProbeSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("dedup-within-watermark eviction boundary: batch-end drop, no expiry refresh") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val dir = java.nio.file.Files.createTempDirectory("graft-dedup-ev").toString
    val root = java.nio.file.Paths.get(dir)
    def writeFile(rows: Seq[(Long, Timestamp, Long)], ageMs: Long): Unit = {
      import scala.jdk.CollectionConverters._
      def parts(): Set[java.nio.file.Path] =
        scala.util.Using.resource(java.nio.file.Files.list(root)) { st =>
          st.iterator().asScala
            .filter(_.getFileName.toString.endsWith(".parquet")).toSet
        }
      val before = parts()
      rows.toDF("event_id", "ts", "user_id")
        .withColumn("event_type", lit("x")).withColumn("value", lit(0.0))
        .coalesce(1).write.mode("append").parquet(dir)
      (parts() -- before).foreach(p => java.nio.file.Files.setLastModifiedTime(
        p, java.nio.file.attribute.FileTime.fromMillis(
          System.currentTimeMillis() - ageMs)))
    }
    // trigger 0: first occurrences (delay 10 min -> expiries 10:10/10:15)
    writeFile(Seq((1L, ts("2024-01-01 10:00:00"), 1L),
      (2L, ts("2024-01-01 10:05:00"), 9L)), 240000L)
    // trigger 1: carrier at 14:00 -> next batch's eviction wm = 13:50,
    // far past both expiries
    writeFile(Seq((3L, ts("2024-01-01 14:00:00"), 2L)), 120000L)
    // trigger 2: the eviction batch — duplicates arriving WITH it
    writeFile(Seq((4L, ts("2024-01-01 10:00:00"), 1L),
      (5L, ts("2024-01-01 13:55:00"), 9L)), 60000L)
    // trigger 3: one batch after the eviction
    writeFile(Seq((6L, ts("2024-01-01 13:56:00"), 9L)), 0L)

    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val events = graft.streaming.Streams
      .eventsStream(s, dir, maxFilesPerTrigger = 1)
    val dedup = graft.streaming.Streams
      .dedupWithinWatermark(events, Seq("user_id"), lateness = "10 minutes")
    val out = graft.streaming.Streams
      .runToCompletion(s, dedup, s"dedupev_${System.nanoTime()}")
      .select("event_id", "user_id").collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(out === Set((1L, 1L), (2L, 9L), (3L, 2L), (6L, 9L)),
      "dedup eviction boundary moved — re-derive the dedupWithinWatermark " +
        s"contract docs; got ${out.toSeq.sorted}")
  }
}
