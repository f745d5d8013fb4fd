package graft

import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Coherence pin for the NATIVE session_window aggregation under the
  * straggler shapes that crashed the custom sessionize (fixed this
  * round) — predicted safe by the measured watermark rules (WmProbeSpec)
  * and confirmed here:
  *
  *   - a straggler admitted against the PREVIOUS batch's watermark
  *     MERGES into its user's still-held session state (sessions emit
  *     only when end <= eviction wm, so pre-emission state is live even
  *     when the current watermark has jumped > gap ahead) → ONE merged
  *     session, counted once;
  *   - a straggler arriving one batch AFTER the emission is dropped by
  *     the window-end late filter (its provisional [ts, ts+gap) end
  *     sits at/behind the now-advanced watermark) → an emitted session
  *     can never be resurrected or shadowed by an overlapping twin.
  */
class SessionWindowStragglerSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("native session_window: pre-emission stragglers merge, post-emission ones drop") {
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    val dir = java.nio.file.Files.createTempDirectory("graft-swstrag").toString
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
    // trigger 0: user 1 events 10:00, 10:05 -> provisional session
    // [10:00, 10:35) (30 min gap)
    writeFile(Seq((1L, ts("2024-01-01 10:00:00"), 1L),
      (2L, ts("2024-01-01 10:05:00"), 1L)), 240000L)
    // trigger 1: carrier at 14:00 -> next batch's eviction wm = 13:50
    // (10 min lateness), late wm stays 09:55
    writeFile(Seq((3L, ts("2024-01-01 14:00:00"), 2L)), 120000L)
    // trigger 2: PRE-emission straggler at 10:20 (window end 10:50 >
    // late wm 09:55 -> admitted; merges into the held [10:00,10:35)
    // before the SAME batch's eviction emits the union)
    writeFile(Seq((4L, ts("2024-01-01 10:20:00"), 1L)), 60000L)
    // trigger 3: POST-emission straggler at 10:22 (window end 10:52 <=
    // late wm 13:50 -> dropped; must NOT resurrect the emitted session)
    writeFile(Seq((5L, ts("2024-01-01 10:22:00"), 1L)), 0L)

    val s = spark.newSession()
    s.conf.set("spark.sql.shuffle.partitions", "4")
    s.conf.set("spark.sql.streaming.noDataMicroBatches.enabled", "false")
    val events = graft.streaming.Streams
      .eventsStream(s, dir, maxFilesPerTrigger = 1)
    val sessions = graft.streaming.Streams.sessionWindowAgg(events,
      gap = "30 minutes", lateness = "10 minutes")
    val out = graft.streaming.Streams
      .runToCompletion(s, sessions, s"swstrag_${System.nanoTime()}")
      .collect().map(r => (r.getLong(0), r.getTimestamp(1).toString,
        r.getTimestamp(2).toString, r.getLong(3))).toSet
    // exactly ONE user-1 session: the merged [10:00, 10:50) with all 3
    // admitted events; user 2's trailing session (end 14:30 > final wm
    // 13:50) stays open and unemitted with no trailing no-data batch
    assert(out === Set((1L, "2024-01-01 10:00:00.0",
      "2024-01-01 10:50:00.0", 3L)),
      s"session_window straggler coherence changed: $out")
  }
}
