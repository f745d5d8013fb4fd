package graft

import graft.plans.{TopK, TopKPerGroupExec}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

/** The custom TopKPerGroup physical operator must equal the composed
  * window row_number formulation, and its plan must show the two-stage
  * (partial heap -> shuffle -> final heap) shape.
  */
class TopKSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private val dir = "/root/testdata/sf0.001"

  test("TopK.perGroup equals window row_number, plan has partial+final stages") {
    val o = graft.core.Catalog.table(spark, dir, "orders")

    val got = TopK.perGroup(o,
      Seq("o_custkey"),
      Seq("o_totalprice" -> false, "o_orderkey" -> true), k = 3)
      .select("o_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    val w = Window.partitionBy("o_custkey")
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val expected = o.withColumn("rn", row_number().over(w))
      .where(col("rn") <= 3)
      .select("o_custkey", "o_orderkey")
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

    assert(got == expected)

    // AdaptiveSparkPlan hides its inner plan from collect(); assert on
    // the rendered tree: partial stage -> exchange on the key -> final.
    val planStr = TopK.perGroup(o, Seq("o_custkey"),
      Seq("o_totalprice" -> false), k = 3)
      .queryExecution.executedPlan.toString
    assert("TopKPerGroup .*, 3, false".r.findFirstIn(planStr).isDefined, planStr)
    assert("TopKPerGroup .*, 3, true".r.findFirstIn(planStr).isDefined, planStr)
    assert(planStr.contains("Exchange hashpartitioning(o_custkey"), planStr)
  }

  test("TopK groups -0.0 with 0.0 and fails by name on ambiguous columns") {
    import spark.implicits._
    // the custom node bypasses Catalyst's NormalizeFloatingNumbers (it
    // rewrites only Aggregate/Window/Join keys), so without the builder's
    // own normalization the raw key bytes split -0.0 vs 0.0 into two
    // groups where SQL GROUP BY merges them
    val df = Seq((0.0, 1L), (-0.0, 2L), (0.0, 3L), (1.5, 4L)).toDF("g", "id")
    val got = TopK.perGroup(df, Seq("g"), Seq("id" -> true), k = 2)
      .select("id").as[Long].collect().toSet
    // one merged zero group keeps ids 1,2 (top-2 by id asc); 3 is cut
    assert(got == Set(1L, 2L, 4L), s"got $got")
    // ambiguous column names must fail by name, not silently bind the
    // first match: "Id" has no exact match and TWO case-insensitive ones
    val amb = df.select(col("g"), col("id"), col("id").as("ID"))
    val e = intercept[IllegalArgumentException](
      TopK.perGroup(amb, Seq("Id"), Seq("g" -> true), k = 1).collect())
    assert(e.getMessage.contains("ambiguous"))
    // an exact match among case-variants binds unambiguously; the merged
    // zero group + the 1.5 group make two k=1 survivors
    assert(TopK.perGroup(amb, Seq("g"), Seq("id" -> true), k = 1).count() == 2)
  }

  test("TopK handles ties, small groups, and k larger than group") {
    import spark.implicits._
    val df = Seq(
      (1L, 10L, 5.0), (1L, 11L, 5.0), (1L, 12L, 5.0), (1L, 13L, 4.0),
      (2L, 20L, 1.0)).toDF("g", "id", "v")
    val got = TopK.perGroup(df, Seq("g"),
      Seq("v" -> false, "id" -> true), k = 2)
      .select("g", "id").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // group 1: ties on v=5.0 broken by id asc -> (10, 11); group 2: all
    assert(got == Set((1L, 10L), (1L, 11L), (2L, 20L)))
  }
}
