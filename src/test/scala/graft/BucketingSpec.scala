package graft

import graft.core.Bucketing
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.scalatest.funsuite.AnyFunSuite

/** Bucketed writes must produce shuffle-free co-located joins: the
  * physical plan for a join of two same-bucketed tables contains no
  * ShuffleExchange, and results equal the plain join.
  */
class BucketingSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  test("co-located join of bucketed tables plans no shuffle exchange") {
    val dir = "/root/testdata/sf0.001"
    val li = graft.core.Catalog.table(spark, dir, "lineitem")
      .select("l_orderkey", "l_quantity")
    val o = graft.core.Catalog.table(spark, dir, "orders")
      .select("o_orderkey", "o_totalprice")

    Bucketing.writeBucketed(li, "b_lineitem", "l_orderkey", 4)
    Bucketing.writeBucketed(o, "b_orders", "o_orderkey", 4)

    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      // force a non-broadcast plan so the shuffle-elision is observable
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val joined = Bucketing.coLocatedJoin(spark,
        "b_lineitem", "b_orders", "l_orderkey", "o_orderkey")
      val shuffles = joined.queryExecution.executedPlan.collect {
        case s: ShuffleExchangeExec => s
      }
      assert(shuffles.isEmpty,
        s"expected shuffle-free plan:\n${joined.queryExecution.executedPlan}")

      val expected = li.join(o, li("l_orderkey") === o("o_orderkey")).count()
      assert(joined.count() == expected)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql("DROP TABLE IF EXISTS b_lineitem")
      spark.sql("DROP TABLE IF EXISTS b_orders")
    }
  }
}
