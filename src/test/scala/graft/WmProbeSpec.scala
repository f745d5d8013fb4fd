package graft

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.scalatest.funsuite.AnyFunSuite

import java.sql.Timestamp

/** Empirical pin of Spark's streaming-aggregation watermark boundary
  * rules — the integer arithmetic q237's DuckDB oracle replays. Measured
  * here (Spark 4.1) and relied on by the q237 gate:
  *
  *   1. The LATE-EVENT filter drops an input row iff its WINDOW END is
  *      <= the late watermark (not the row's raw ts: a row whose ts sits
  *      below the watermark but whose window is still open is KEPT and
  *      aggregated — x1 below).
  *   2. The late watermark of batch N is the wm value PREVIOUS to batch
  *      N's update (SPARK-40925), i.e. exactly the EVICTION watermark of
  *      batch N-1 — which is what makes rule 1 safe: a kept row can
  *      never resurrect an already-evicted window.
  *   3. Eviction/emission: a window emits (exactly once, with its state
  *      evicted) iff window end <= the eviction watermark — INCLUSIVE
  *      (p7: end exactly equal to the final wm emits), vs the data
  *      rule's effective strictness.
  *   4. Watermark values are ms-floored max event time minus the delay.
  */
class WmProbeSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("agg late filter is window-end <= previous-batch wm; emission is end <= wm inclusive") {
    import org.apache.spark.sql.functions._
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(Timestamp, String)]
    val counts = src.toDF().toDF("ts", "tag")
      .withWatermark("ts", "10 minutes")
      .groupBy(window(col("ts"), "1 minute"), col("tag"))
      .agg(count(lit(1)).as("n"))
      .select(col("window.start").as("w_start"), col("tag"), col("n"))
    val q = counts.writeStream.format("memory")
      .queryName("wmprobe").outputMode("append").start()
    try {
      // batch 0: on-time bulk
      src.addData(
        (ts("2024-01-01 11:00:00"), "a"),
        (ts("2024-01-01 11:30:00"), "a"),
        (ts("2024-01-01 12:00:30"), "a"))
      q.processAllAvailable()
      // carrier: max 12:30:30 -> after its trailing no-data batch the wm
      // is 12:20:30, MID-window, so the ts-rule and the window-end rule
      // would disagree on x1
      src.addData((ts("2024-01-01 12:30:30"), "m"))
      q.processAllAvailable()
      // probe rows against late wm = 12:20:30
      src.addData(
        (ts("2024-01-01 12:19:50"), "x3"), // window end 12:20 <= wm: DROPPED
        (ts("2024-01-01 12:20:10"), "x1"), // ts < wm but end 12:21 > wm: KEPT
        (ts("2024-01-01 12:20:30"), "x2"), // ts == wm, end > wm: KEPT
        (ts("2024-01-01 12:21:10"), "x4"), // above wm: KEPT
        (ts("2024-01-01 12:49:30"), "p7"), // window end EXACTLY the final wm
        (ts("2024-01-01 13:00:00"), "p6")) // pushes the final wm to 12:50:00
      q.processAllAvailable()
      val out = spark.table("wmprobe")
        .select("tag", "w_start", "n").as[(String, Timestamp, Long)]
        .collect().map { case (t, w, n) => (t, w.toString, n) }.toSet
      assert(out === Set(
        ("a", "2024-01-01 11:00:00.0", 1L),
        ("a", "2024-01-01 11:30:00.0", 1L),
        ("a", "2024-01-01 12:00:00.0", 1L),
        ("m", "2024-01-01 12:30:00.0", 1L),
        ("x1", "2024-01-01 12:20:00.0", 1L), // rule 1: kept despite ts < wm
        ("x2", "2024-01-01 12:20:00.0", 1L),
        ("x4", "2024-01-01 12:21:00.0", 1L),
        ("p7", "2024-01-01 12:49:00.0", 1L)), // rule 3: end == wm emits
        s"watermark boundary rules changed — q237's oracle arithmetic " +
          s"must be re-derived; got $out")
      // x3 dropped (end <= late wm), p6's window (end 13:01 > final wm
      // 12:50) unemitted — both absent from the set above
    } finally q.stop()
  }

  test("flatMapGroupsWithState raw-ts admission boundary (probe; measured)") {
    // The stateful-function admission rule q238's staging deliberately
    // designs AROUND (its replay band sits >= 1 h above the watermark so
    // the gate certifies state semantics, not this edge). Measured here
    // so the margin-based design rests on a pinned rule rather than an
    // assumption: a custom stateful operator's input rows are filtered
    // on RAW event time (no window to compare), and the boundary's
    // inclusivity decides whether a row AT the watermark reaches user
    // state code. EventTimeTimeout + never arming = sessionize's config
    // with the timeout path quiesced.
    import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}
    import spark.implicits._
    def ts(s: String) = Timestamp.valueOf(s)
    implicit val sqlCtx: org.apache.spark.sql.SQLContext = spark.sqlContext
    val src = MemoryStream[(Timestamp, String)]
    val seen = src.toDF().toDF("ts", "tag")
      .withWatermark("ts", "10 minutes")
      .as[(Timestamp, String)]
      .groupByKey(_._2)
      .flatMapGroupsWithState[Int, (String, Timestamp)](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        (tag: String, events: Iterator[(Timestamp, String)],
            state: GroupState[Int]) =>
          // pass-through recorder: every event that REACHES user state
          // code is emitted verbatim; no state kept, no timeout armed
          events.map(e => (tag, e._1))
      }
    val q = seen.writeStream.format("memory")
      .queryName("fmgwsprobe").outputMode("append").start()
    try {
      // batch 0: max ts 12:30:30 -> after the trailing no-data batch the
      // watermark is exactly 12:20:30.000
      src.addData((ts("2024-01-01 11:00:00"), "bulk"),
        (ts("2024-01-01 12:30:30"), "bulk"))
      q.processAllAvailable()
      src.addData(
        (ts("2024-01-01 12:10:00"), "y1"),     // well below wm
        (Timestamp.valueOf("2024-01-01 12:20:29.999"), "y2"), // 1 ms below
        (ts("2024-01-01 12:20:30"), "y3"),     // EXACTLY the watermark
        (Timestamp.valueOf("2024-01-01 12:20:30.001"), "y4"), // 1 ms above
        (ts("2024-01-01 12:25:00"), "y5"))     // above
      q.processAllAvailable()
      val tags = spark.table("fmgwsprobe").as[(String, Timestamp)]
        .collect().map(_._1).toSet
      // MEASURED (Spark 4.1): the admission predicate drops on
      // ts <= wm — a row EXACTLY AT the watermark does NOT reach the
      // state function (y3 dropped); only strictly-newer rows are
      // admitted. The same <=-drops convention as the aggregation
      // side's window-end rule (rule 1 above), just on raw ts. If this
      // set changes on an engine upgrade, q238's >= 1 h staging margin
      // still holds, but the admission note in sessionize's scaladoc
      // and the watermark notes must be re-derived.
      assert(tags === Set("bulk", "y4", "y5"),
        s"flatMapGroupsWithState raw-ts admission boundary changed; got $tags")
    } finally q.stop()
  }
}
