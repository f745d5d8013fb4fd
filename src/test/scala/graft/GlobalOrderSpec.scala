package graft

import graft.operators.GlobalOrder
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Pins the distributed global row numbering against the sequential
  * model: range partition + local rank + prefix-sum offsets must equal
  * sorted-order zipWithIndex for ANY partition count — including
  * partition counts above the row count (empty range buckets get
  * zero-width offsets) — and repeated runs must agree (the eager
  * localCheckpoint pins sampled range boundaries across the counts job
  * and the numbering job).
  */
class GlobalOrderSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private def model(rows: Seq[(Long, Long)]): Map[(Long, Long), Long] =
    rows.sortBy(identity).zipWithIndex
      .map { case (r, i) => r -> (i + 1L) }.toMap

  test("rowNumber == sorted zipWithIndex at several partition counts") {
    val rnd = new scala.util.Random(7)
    // duplicate first keys force the tiebreak column to carry the order
    val rows = (1L to 200L).map(i => (rnd.nextInt(20).toLong, i))
    val df = rows.toDF("v", "id").repartition(13) // scrambled input layout
    val want = model(rows)
    for (p <- Seq(1, 3, 32, 300)) { // 300 > row count: empty buckets
      val got = GlobalOrder
        .rowNumber(df, Seq(col("v"), col("id")), out = "rn", partitions = p)
        .select("v", "id", "rn").as[(Long, Long, Long)].collect()
        .map { case (v, id, rn) => (v, id) -> rn }.toMap
      assert(got == want, s"mismatch at partitions=$p")
    }
  }

  test("numbering is dense, gapless, and stable across repeated runs") {
    val rows = (1L to 57L).map(i => (i % 5, i))
    val df = rows.toDF("v", "id")
    def run() = GlobalOrder
      .rowNumber(df, Seq(col("v"), col("id")), out = "rn", partitions = 8)
      .select("rn").as[Long].collect().sorted.toSeq
    val a = run()
    assert(a == (1L to 57L), "row numbers must be exactly 1..n")
    assert(a == run(), "repeated runs must produce identical numbering")
  }

  test("empty input numbers nothing") {
    val df = Seq.empty[(Long, Long)].toDF("v", "id")
    assert(GlobalOrder
      .rowNumber(df, Seq(col("v"), col("id")), partitions = 4).count() == 0)
  }
}
