package graft

import graft.operators.Skew
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** Salted aggregation/join must give identical answers to their unsalted
  * forms (the salt only changes the shuffle layout).
  */
class SkewSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private lazy val skewed = {
    // one hot key (0) with 10k rows, 100 cold keys with 10 each
    val rows = (1 to 10000).map(i => (0L, i.toLong)) ++
      (1 to 100).flatMap(k => (1 to 10).map(i => (k.toLong, i.toLong)))
    rows.toDF("k", "v")
  }

  test("saltedAggregate equals plain groupBy") {
    val expected = skewed.groupBy("k")
      .agg(count(col("v")).as("n"), sum(col("v")).as("s"),
        min(col("v")).as("mn"), max(col("v")).as("mx"))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    val got = Skew.saltedAggregate(skewed, Seq("k"), col("v"), buckets = 8,
      Seq(("n", "count", col("v")), ("s", "sum", col("v")),
        ("mn", "min", col("v")), ("mx", "max", col("v"))))
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getLong(3), r.getLong(4))).toSet
    assert(got == expected)
  }

  test("saltedJoin equals plain join") {
    val dim = (0L to 100L).map(k => (k, s"name$k")).toDF("dk", "name")
    val expected = skewed.join(dim, skewed("k") === dim("dk"))
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    val got = Skew.saltedJoin(skewed, dim, "k", "dk", col("v"), buckets = 4)
      .select("k", "v", "name").collect().map(_.toSeq).toSet
    assert(got == expected)
    assert(got.size == skewed.count())
  }

  test("degenerate bucket counts fail by name, never silently empty") {
    // buckets = 0 used to die mid-job (ANSI pmod divide-by-zero) in the
    // aggregate and produce a SILENTLY EMPTY saltedJoin (explode of a
    // zero-length salt array drops every right row); negative counts
    // "worked" on the left while replicating nothing on the right
    val dim = (0L to 10L).map(k => (k, s"n$k")).toDF("dk", "name")
    for (b <- Seq(0, -3)) {
      val e1 = intercept[IllegalArgumentException] {
        Skew.saltedJoin(skewed, dim, "k", "dk", col("v"), buckets = b)
      }
      assert(e1.getMessage.contains("buckets"))
      val e2 = intercept[IllegalArgumentException] {
        Skew.saltedAggregate(skewed, Seq("k"), col("v"), buckets = b,
          Seq(("n", "count", col("v"))))
      }
      assert(e2.getMessage.contains("buckets"))
    }
  }
}
