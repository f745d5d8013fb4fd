package graft

import org.scalacheck.{Gen, Prop, Properties}

/** Property test for the injected [[graft.plans.SelingerJoinReorder]]
  * rule: on ANY join query it may rewrite, the extension session must
  * return exactly the plain session's result — a reorder bug in an
  * optimizer rule silently corrupts user queries, so this is the
  * highest-stakes invariant in the repo. Queries draw from the TPC-H-ish
  * FK graph (region–nation–customer–orders, nation–supplier) with
  * random single-table filters, random theta edges, and a lineitem
  * self-join case (duplicate relation instances).
  */
object SelingerRulePropertySpec extends Properties("SelingerRule") {
  private lazy val plain = SharedSpark.spark
  private lazy val ext = SharedSpark.sparkWithExtensions

  private val dir = "/root/testdata/sf0.001"
  private val tables = Seq("region", "nation", "customer", "orders", "supplier")

  private def registerViews(): Unit = tables.foreach { t =>
    graft.core.Catalog.table(plain, dir, t).createOrReplaceTempView(s"p_$t")
    graft.core.Catalog.table(ext, dir, t).createOrReplaceTempView(s"p_$t")
  }
  registerViews()

  // connected relation subsets of the FK graph and the edges that bind them
  private val shapes: Seq[(Seq[String], Seq[String])] = Seq(
    (Seq("region", "nation", "customer"),
      Seq("r_regionkey = n_regionkey", "n_nationkey = c_nationkey")),
    (Seq("nation", "customer", "orders"),
      Seq("n_nationkey = c_nationkey", "c_custkey = o_custkey")),
    (Seq("region", "nation", "supplier"),
      Seq("r_regionkey = n_regionkey", "n_nationkey = s_nationkey")),
    (Seq("region", "nation", "customer", "orders"),
      Seq("r_regionkey = n_regionkey", "n_nationkey = c_nationkey",
        "c_custkey = o_custkey")),
    (Seq("region", "nation", "customer", "orders", "supplier"),
      Seq("r_regionkey = n_regionkey", "n_nationkey = c_nationkey",
        "c_custkey = o_custkey", "n_nationkey = s_nationkey")))

  private val filters = Seq(
    "r_name = 'ASIA'", "n_nationkey < 13", "c_acctbal > 0",
    "o_totalprice > 100000", "s_acctbal < 5000", "c_mktsegment = 'BUILDING'",
    "o_orderpriority <> '5-LOW'")
  private val thetaEdges = Seq(
    "n_nationkey < c_custkey", "r_regionkey <> n_nationkey",
    "c_custkey < o_orderkey")

  /** Conditions whose every column prefix belongs to a present table. */
  private def applicable(conds: Seq[String], rels: Seq[String]): Seq[String] = {
    val prefixes = Map("region" -> "r_", "nation" -> "n_", "customer" -> "c_",
      "orders" -> "o_", "supplier" -> "s_")
    val present = rels.map(prefixes).toSet
    conds.filter { c =>
      val used = "\\b([rncos])_".r.findAllMatchIn(c).map(_.group(1) + "_").toSet
      used.nonEmpty && used.subsetOf(present)
    }
  }

  private val caseGen: Gen[String] = for {
    (rels, edges) <- Gen.oneOf(shapes)
    fs <- Gen.someOf(applicable(filters, rels))
    ts <- Gen.someOf(applicable(thetaEdges, rels))
  } yield {
    val conds = edges ++ fs ++ ts
    s"""SELECT count(*) AS c, coalesce(sum(n_nationkey), 0) AS s
       |FROM ${rels.map("p_" + _).mkString(", ")}
       |WHERE ${conds.mkString(" AND ")}""".stripMargin
  }

  property("extension session result == plain session result") =
    Prop.forAllNoShrink(caseGen) { sql =>
      val a = plain.sql(sql).head()
      val b = ext.sql(sql).head()
      val ok = a.getLong(0) == b.getLong(0) && a.getLong(1) == b.getLong(1)
      if (!ok) println(s"MISMATCH plain=$a ext=$b for:\n$sql")
      ok
    }

  property("self-join (duplicate relation instances) stays correct") = {
    val sql =
      """SELECT count(*) AS c
        |FROM p_orders o1, p_orders o2, p_customer
        |WHERE o1.o_custkey = o2.o_custkey AND o1.o_orderkey < o2.o_orderkey
        |  AND o1.o_custkey = c_custkey AND c_acctbal > 0""".stripMargin
    Prop(plain.sql(sql).head().getLong(0) == ext.sql(sql).head().getLong(0))
  }
}
