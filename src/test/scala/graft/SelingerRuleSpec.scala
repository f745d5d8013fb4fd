package graft

import graft.plans.SelingerJoinReorder
import org.apache.spark.sql.catalyst.plans.logical.{Join, LogicalPlan}
import org.scalatest.funsuite.AnyFunSuite

/** Specs for the Catalyst-integrated Selinger reorder rule: the DP must
  * pull a big fact table out of the outermost-left position of a badly
  * written join chain, leave results semantically identical, and keep
  * non-eligible plans untouched.
  */
class SelingerRuleSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark

  private val dir = "/root/testdata/sf0.001"

  /** Leaf relations in DFS order (= left-deep join order), identified by
    * their first output column ("l_orderkey" -> lineitem etc).
    */
  private def joinChainLeaves(p: LogicalPlan): Seq[String] =
    p.collectLeaves().map(_.output.headOption.map(_.name).getOrElse("?"))

  test("rule reorders a lineitem-first chain and preserves the result") {
    val li = graft.core.Catalog.table(spark, dir, "lineitem")
    val o = graft.core.Catalog.table(spark, dir, "orders")
    val c = graft.core.Catalog.table(spark, dir, "customer")
    val n = graft.core.Catalog.table(spark, dir, "nation")

    // deliberately bad authoring order: big lineitem outermost-left
    val q = li
      .join(o, li("l_orderkey") === o("o_orderkey"))
      .join(c, o("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .select(li("l_orderkey"), n("n_name"))

    val before = q.queryExecution.optimizedPlan
    val after = SelingerJoinReorder(before)

    assert(after ne before, "rule should have rewritten the join tree")
    val beforeLeaves = joinChainLeaves(before)
    val afterLeaves = joinChainLeaves(after)
    assert(beforeLeaves.head.startsWith("l_"))
    assert(!afterLeaves.head.startsWith("l_"),
      s"big table still outermost: $afterLeaves")

    // semantics preserved: execute the rewritten plan and compare
    val expected = q.collect().map(_.toSeq).toSet
    val got = org.apache.spark.sql.GraftSqlBridge
      .datasetOfRows(spark, after).collect().map(_.toSeq).toSet
    assert(got == expected)
  }

  test("rule is idempotent and ignores non-inner / tiny joins") {
    val a = graft.core.Catalog.table(spark, dir, "region")
    val b = graft.core.Catalog.table(spark, dir, "nation")
    val two = a.join(b, a("r_regionkey") === b("n_regionkey"))
      .queryExecution.optimizedPlan
    assert(SelingerJoinReorder(two).canonicalized == two.canonicalized)

    val outer = a.join(b, a("r_regionkey") === b("n_regionkey"), "left")
      .queryExecution.optimizedPlan
    assert(SelingerJoinReorder(outer).canonicalized == outer.canonicalized)
  }

  test("extension registers the native expressions as SQL functions") {
    val s2 = SharedSpark.sparkWithExtensions
    val r = s2.sql(
      """SELECT simhash64(split('the quick brown fox', ' ')) AS sh,
                size(word_shingles('a b c d', 2)) AS n_sh,
                size(minhash_sig(word_shingles('a b c d', 2), 16)) AS n_mh,
                dot_product(array(CAST(1.0 AS DOUBLE), CAST(2.0 AS DOUBLE)),
                            array(CAST(3.0 AS DOUBLE), CAST(4.0 AS DOUBLE))) AS dp
      """).head()
    assert(r.getLong(0) != 0L)
    assert(r.getInt(1) == 3 && r.getInt(2) == 16)
    assert(r.getDouble(3) == 11.0)
  }

  test("mistyped SQL calls to the native functions fail at ANALYSIS, not mid-job") {
    // regression: without checkInputDataTypes these analyzed fine and
    // died in an executor with an unhelpful ClassCastException
    val s2 = SharedSpark.sparkWithExtensions
    for (bad <- Seq(
      "SELECT simhash64(1)",
      "SELECT word_shingles(array(1), 2)",
      "SELECT dot_product(1.0, 2.0)",
      "SELECT rolling_fingerprint(array('x'))")) {
      val e = intercept[org.apache.spark.sql.AnalysisException](s2.sql(bad).head())
      assert(e.getMessage.toLowerCase.contains("requires") ||
        e.getMessage.contains("DATATYPE_MISMATCH"),
        s"$bad: expected a type error at analysis, got: ${e.getMessage.take(120)}")
      // the message must NAME the function — a $$-escaped interpolation
      // once printed the literal text "$prettyName" instead
      assert(!e.getMessage.contains("$prettyName"),
        s"$bad: unresolved prettyName interpolation in: ${e.getMessage.take(120)}")
    }
    // wrong ARITY must fail with the function's name and expected count,
    // not a bare IndexOutOfBoundsException from args(1)
    val ea = intercept[Exception](s2.sql("SELECT word_shingles('a b c')").head())
    assert(ea.getMessage.contains("word_shingles expects 2"),
      s"arity error must name the function: ${ea.getMessage.take(120)}")
    // value (not type) contract: w <= 0 would walk the shingle loop past
    // the token array and AIOOBE per row on executors — refused at
    // construction with a named error instead
    val ew = intercept[Exception](s2.sql("SELECT word_shingles('a b c', 0)").head())
    assert(SharedSpark.messages(ew).exists(_.contains("width must be >= 1")),
      s"expected the named width error, got: $ew")
  }

  test("registered stats: a selective filter changes the chosen order") {
    // Register real TableStats (row counts + histograms) so the rule's
    // estimates are stats-driven, like the reference's order_joins fed by
    // filterSelectivities (optimizer_test.cc:452-462).
    Seq("lineitem", "orders", "customer", "nation")
      .foreach(n => graft.core.Catalog.stats(spark, dir, n))
    val li = graft.core.Catalog.table(spark, dir, "lineitem")
    val o = graft.core.Catalog.table(spark, dir, "orders")
    val c = graft.core.Catalog.table(spark, dir, "customer")
    val n = graft.core.Catalog.table(spark, dir, "nation")
    def chain(of: org.apache.spark.sql.DataFrame) = li
      .join(of, li("l_orderkey") === of("o_orderkey"))
      .join(c, of("o_custkey") === c("c_custkey"))
      .join(n, c("c_nationkey") === n("n_nationkey"))
      .select(li("l_orderkey"), n("n_name"))

    val unfiltered = chain(o)
    val filtered = chain(o.where(o("o_orderkey") < 10))
    val unfLeaves = joinChainLeaves(
      SelingerJoinReorder(unfiltered.queryExecution.optimizedPlan))
    val filPlan = SelingerJoinReorder(filtered.queryExecution.optimizedPlan)
    val filLeaves = joinChainLeaves(filPlan)
    assert(unfLeaves != filLeaves,
      s"selective filter did not change the order: $unfLeaves vs $filLeaves")
    assert(filLeaves.head.startsWith("o_"),
      s"near-empty filtered orders should lead the plan: $filLeaves")

    val expected = filtered.collect().map(_.toSeq).toSet
    val got = org.apache.spark.sql.GraftSqlBridge
      .datasetOfRows(spark, filPlan).collect().map(_.toSeq).toSet
    assert(got == expected)

    // timestamp-literal predicates feed the epoch-micros histograms the
    // same way: a near-empty date window also pulls orders to the front
    import org.apache.spark.sql.functions.{col, lit}
    val dateFiltered = chain(o.where(
      o("o_orderdate") < lit("1995-02-01").cast("timestamp")))
    val dateLeaves = joinChainLeaves(
      SelingerJoinReorder(dateFiltered.queryExecution.optimizedPlan))
    assert(dateLeaves != unfLeaves && dateLeaves.head.startsWith("o_"),
      s"date filter should reorder like the key filter did: $dateLeaves")
  }

  test("theta + duplicate-pair edges reorder and preserve results") {
    // Mirrors the reference's NonequalityOrderJoinsTest
    // (optimizer_test.cc:577-623) through spark.sql: one table pair
    // carries BOTH an equi edge and an inequality edge.
    val s2 = SharedSpark.sparkWithExtensions
    Seq("lineitem", "orders", "customer").foreach { t =>
      graft.core.Catalog.table(s2, dir, t).createOrReplaceTempView(t)
      graft.core.Catalog.table(spark, dir, t).createOrReplaceTempView(t)
    }
    val sql =
      """SELECT count(*) AS cnt
        |FROM lineitem, orders, customer
        |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |  AND o_orderkey > c_custkey""".stripMargin
    val withRule = s2.sql(sql)
    // the rule must have engaged: join leaves no longer in authored order
    val leaves = joinChainLeaves(withRule.queryExecution.optimizedPlan)
    assert(!leaves.head.startsWith("l_"),
      s"big lineitem still outermost with a theta edge present: $leaves")
    assert(withRule.head().getLong(0) == spark.sql(sql).head().getLong(0))
  }

  test("7-table FK chain through spark.sql: reordered, result-identical") {
    val s2 = SharedSpark.sparkWithExtensions
    val tables = Seq("region", "nation", "customer", "orders",
      "lineitem", "part", "supplier")
    tables.foreach { t =>
      graft.core.Catalog.stats(spark, dir, t) // registered, full stats
      graft.core.Catalog.table(s2, dir, t).createOrReplaceTempView(t)
      graft.core.Catalog.table(spark, dir, t).createOrReplaceTempView(t)
    }
    val sql =
      """SELECT count(*) AS cnt
        |FROM lineitem, region, nation, customer, orders, part, supplier
        |WHERE r_regionkey = n_regionkey AND n_nationkey = c_nationkey
        |  AND c_custkey = o_custkey AND o_orderkey = l_orderkey
        |  AND l_partkey = p_partkey AND l_suppkey = s_suppkey
        |  AND o_totalprice > 150000""".stripMargin
    val withRule = s2.sql(sql)
    val leaves = joinChainLeaves(withRule.queryExecution.optimizedPlan)
    assert(leaves.size == 7)
    assert(!leaves.head.startsWith("l_"),
      s"600k-row lineitem authored first should not stay outermost: $leaves")
    assert(withRule.head().getLong(0) == spark.sql(sql).head().getLong(0))
  }

  test("relation with no join edge: rule declines, cross join still runs") {
    // `FROM r, n, c WHERE r_regionkey = n_regionkey` leaves customer
    // edgeless; the fold can never place it, so the rule must decline
    // rather than drop it (the rebuilt tree would reference absent
    // attributes and die at physical planning — advisor round 3).
    val s2 = SharedSpark.sparkWithExtensions
    Seq("region", "nation", "customer").foreach { t =>
      graft.core.Catalog.table(s2, dir, t).createOrReplaceTempView(t)
      graft.core.Catalog.table(spark, dir, t).createOrReplaceTempView(t)
    }
    val sql =
      """SELECT count(*) AS cnt
        |FROM region, nation, customer
        |WHERE r_regionkey = n_regionkey""".stripMargin
    assert(s2.sql(sql).head().getLong(0) == spark.sql(sql).head().getLong(0))
  }

  test("op-ambiguous duplicate edges (join_optimizer.h:26-33 wart): rule declines, result correct") {
    // Reference quirk, cite-and-decide (r7 verdict #5): the reference's
    // LogicalJoinNode set-identity IGNORES the predicate op
    // (join_optimizer.h:26-33) — two edges identical up to op collide in
    // its std::set and PlanCache memo. We keep JoinEdge distinct by op
    // (JoinGraph.scala:14-18) but the memo keys stay reference-faithful
    // op-blind (JoinGraph.scala:53-61), so the RULE must detect the
    // collision and decline (SelingerReorderRule.scala:209-212) rather
    // than let the two predicates alias one memo entry and drop one from
    // the rebuilt tree. Same column pair, two different ops:
    val s2 = SharedSpark.sparkWithExtensions
    Seq("lineitem", "orders", "customer").foreach { t =>
      graft.core.Catalog.table(s2, dir, t).createOrReplaceTempView(t)
      graft.core.Catalog.table(spark, dir, t).createOrReplaceTempView(t)
    }
    val sql =
      """SELECT count(*) AS cnt
        |FROM lineitem, orders, customer
        |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |  AND o_custkey >= c_custkey""".stripMargin
    // decline = authored order survives (lineitem stays outermost)…
    val leaves = joinChainLeaves(s2.sql(sql).queryExecution.optimizedPlan)
    assert(leaves.head.startsWith("l_"),
      s"rule should decline on op-ambiguous duplicate edges: $leaves")
    // …and BOTH predicates still apply (a memo collision would drop one)
    assert(s2.sql(sql).head().getLong(0) == spark.sql(sql).head().getLong(0))
  }

  test("duplicate-name conjuncts into one opaque leaf: rule declines, both predicates hold") {
    // JoinEdge identity is by column NAME. A HINTED join stays an opaque
    // flattened leaf and can expose two attributes named "v"; conjuncts
    // binding big.a to EACH of them collapse to one JoinEdge, and the
    // rebuilt tree would enforce only one predicate — silent extra rows.
    // The rule must decline when one edge key carries two distinct
    // attribute bindings; parity with the plain session is the gate.
    val s2 = SharedSpark.sparkWithExtensions
    def q(s: org.apache.spark.sql.SparkSession): Long = {
      import s.implicits._
      val t1 = Seq((1L, 10L), (2L, 20L), (3L, 30L)).toDF("k", "v")
      val t2 = Seq((1L, 10L), (2L, 25L), (3L, 30L)).toDF("k", "v")
      // hinted -> JoinHint != NONE -> flatten() keeps it one leaf with
      // duplicate output names v#1, v#2
      val leaf = t1.join(t2.hint("broadcast"), t1("k") === t2("k"))
      val big1 = Seq((10L, 1L), (25L, 2L), (30L, 3L)).toDF("a", "x")
      val big2 = Seq((1L, 0L), (2L, 0L), (3L, 0L)).toDF("x", "pad")
      val v1 = t1("v"); val v2 = t2("v")
      // three relations (big1, big2, leaf), spine of unhinted inner
      // joins; the two v-conjuncts must BOTH survive: rows where
      // t1.v != t2.v (k=2) match only one of them
      big1.join(big2, Seq("x"))
        .join(leaf, big1("a") === v1 && big1("a") === v2)
        .count()
    }
    assert(q(s2) == q(spark), "extension session must return the plain result")
    assert(q(spark) == 2L) // k=1 and k=3 rows; k=2 (10 vs 25) matches neither twice
  }

  test("extension-installed session reorders spark.sql multi-joins") {
    val s2 = SharedSpark.sparkWithExtensions
    Seq("lineitem", "orders", "customer", "nation").foreach { t =>
      graft.core.Catalog.table(s2, dir, t).createOrReplaceTempView(t)
    }
    val df = s2.sql(
      """SELECT n_name, count(*) AS cnt
        |FROM lineitem, orders, customer, nation
        |WHERE l_orderkey = o_orderkey AND o_custkey = c_custkey
        |  AND c_nationkey = n_nationkey
        |GROUP BY n_name""".stripMargin)
    val leaves = joinChainLeaves(df.queryExecution.optimizedPlan)
    assert(!leaves.head.startsWith("l_"), s"leaves: $leaves")
    assert(df.count() > 0)
  }
}
