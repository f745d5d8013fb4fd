package graft

import graft.operators.Skyline
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Skyline vs a driver-side brute-force dominance check on random
  * point sets, across partitionings (the two-phase sweep must be
  * partition-invariant), plus degenerate shapes.
  */
object SkylineSpec extends Properties("Skyline") {
  private lazy val spark = SharedSpark.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(15)

  /** Non-dominated under (min x, max y): no other point is <= on x,
    * >= on y, and strictly better on one.
    */
  private def ref(pts: Set[(Long, Long)]): Set[(Long, Long)] =
    pts.filter { case (x, y) =>
      !pts.exists { case (qx, qy) =>
        qx <= x && qy >= y && (qx < x || qy > y)
      }
    }

  property("matches brute-force dominance on random point sets") = {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 60)
      parts <- Gen.choose(1, 7)
      pts <- Gen.listOfN(n, for {
        x <- Gen.choose(0L, 30L)
        y <- Gen.choose(0L, 30L)
      } yield (x, y))
    } yield (pts.distinct, parts)
    Prop.forAll(gen) { case (pts, parts) =>
      val df = pts.toDF("x", "y").repartition(parts)
      val got = Skyline.skyline2D(df, "x", "y")
        .as[(Long, Long)].collect().toSet
      val want = ref(pts.toSet)
      Prop(got == want) :| s"got ${got.toSeq.sorted} want ${want.toSeq.sorted}"
    }
  }

  property("null coordinates fail fast with a named error, never a silent wrong frontier") = {
    // nulls sort FIRST in the sweep's sort, so a single null row would
    // silently poison the partition's running max (r7 advice #4) — the
    // operator must fail loudly instead
    import org.apache.spark.sql.functions.{col, lit, when}
    import spark.implicits._
    val df = (0L until 5L).map(i => (i, i)).toDF("x", "y")
      .withColumn("y", when(col("x") === 2L, lit(null)).otherwise(col("y")))
    val e = scala.util.Try(Skyline.skyline2D(df, "x", "y").collect())
    Prop(e.isFailure && {
      def rootMsgs(t: Throwable): Seq[String] =
        Option(t).toSeq.flatMap(x =>
          Option(x.getMessage).toSeq ++ rootMsgs(x.getCause))
      rootMsgs(e.failed.get).exists(_.contains("Skyline.skyline2D: null"))
    }) :| s"expected the named null error, got $e"
  }

  property("chain and anti-chain shapes") = {
    import spark.implicits._
    // strictly improving anti-chain: every point on the frontier
    val anti = (0L until 10L).map(i => (i, i))
    // strictly dominated chain: only the best point survives
    val chain = (0L until 10L).map(i => (i, 10L - i))
    val gotAnti = Skyline.skyline2D(anti.toDF("x", "y"), "x", "y")
      .as[(Long, Long)].collect().toSet
    val gotChain = Skyline.skyline2D(chain.toDF("x", "y"), "x", "y")
      .as[(Long, Long)].collect().toSet
    Prop(gotAnti == anti.toSet) :| s"anti-chain $gotAnti" &&
      Prop(gotChain == Set((0L, 10L))) :| s"chain $gotChain"
  }
}
