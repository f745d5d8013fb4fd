package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Regression pin for the round-12 straggler crash in
  * [[graft.streaming.Streams.sessionize]]: the engine's late filter
  * admits events against the PREVIOUS batch's watermark (SPARK-40925,
  * WmProbeSpec), so after a > gap event-time jump between triggers a
  * legal straggler merges into a session whose ceil-ms timeout sits
  * BELOW the current watermark — and setTimeoutTimestamp then threw
  * "Timeout timestamp cannot be earlier than the current watermark",
  * killing the WHOLE query (measured on this exact tape). sessionize
  * now applies the documented timeout rule at arrival instead: the
  * watermark has already passed lastTs + gap, so the merged session
  * emits immediately and keeps no state.
  */
class SessionStragglerProbeSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("a straggler merging under a > gap watermark jump emits, not crashes") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val dir = java.nio.file.Files.createTempDirectory("graft-straggler").toString
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
    // trigger 0: user 1 session at 10:00..10:05 (max ts 10:05)
    writeFile(Seq((1L, ts("2024-01-01 10:00:00"), 1L),
      (2L, ts("2024-01-01 10:05:00"), 1L)), 240000L)
    // trigger 1: user 2 at 14:00 — a 4 h event-time jump (>> 30 min gap),
    // pushing the NEXT batch's eviction watermark to 13:50 while its
    // LATE watermark stays at this batch's 09:55
    writeFile(Seq((3L, ts("2024-01-01 14:00:00"), 2L)), 120000L)
    // trigger 2: user 1 STRAGGLER at 10:20 — within gap of 10:05, above
    // the late watermark 09:55, far below the current watermark 13:50
    writeFile(Seq((4L, ts("2024-01-01 10:20:00"), 1L),
      (5L, ts("2024-01-01 14:05:00"), 3L)), 0L)

    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val events = graft.streaming.Streams
      .eventsStream(s, dir, maxFilesPerTrigger = 1)
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"),
        col("value"))
      .as[graft.streaming.Streams.Event](
        org.apache.spark.sql.Encoders.product[graft.streaming.Streams.Event])
    val sessions = graft.streaming.Streams.sessionize(s, events,
      gapMs = 30L * 60 * 1000, lateness = "10 minutes").toDF()
    val out = graft.streaming.Streams
      .runToCompletion(s, sessions, s"straggler_${System.nanoTime()}")
      .select("user_id", "start", "end", "n_events")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getLong(3))).toSet
    // the straggler-merged session emits AT ARRIVAL (the watermark had
    // already passed its 10:50 timeout); users 2/3's trailing sessions
    // stay open (their timeouts 14:30/14:35 exceed the final 13:50 wm
    // and no trailing no-data batch runs here)
    assert(out === Set((1L, "2024-01-01 10:00:00.0",
      "2024-01-01 10:20:00.0", 3L)))
  }
}
