package graft

import graft.operators.FuzzyJoin
import org.scalacheck.{Gen, Prop, Properties, Test}

/** PassJoin candidates must be a SUPERSET of the true pair set
  * (pigeonhole soundness) and the verified output exactly the
  * brute-force edit-distance join — fuzzed over random short-string
  * vocabularies where off-by-one segment arithmetic shows up fast.
  */
object FuzzyJoinSpec extends Properties("FuzzyJoin") {
  private lazy val spark = SharedSpark.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(10)

  private def lev(a: String, b: String): Int = {
    val dp = Array.tabulate(a.length + 1, b.length + 1) { (i, j) =>
      if (i == 0) j else if (j == 0) i else 0
    }
    for (i <- 1 to a.length; j <- 1 to b.length)
      dp(i)(j) = math.min(math.min(dp(i - 1)(j) + 1, dp(i)(j - 1) + 1),
        dp(i - 1)(j - 1) + (if (a(i - 1) == b(j - 1)) 0 else 1))
    dp(a.length)(b.length)
  }

  // length 0 included: two empty strings are a legal distance-0 pair the
  // probe-length floor used to drop (regression coverage)
  private val wordGen = for {
    n <- Gen.choose(0, 8)
    cs <- Gen.listOfN(n, Gen.oneOf('a', 'b', 'c'))
  } yield cs.mkString

  property("verified join equals brute force") = {
    val vocabGen = for {
      words <- Gen.listOfN(25, wordGen)
      d <- Gen.choose(1, 2)
    } yield (words.distinct, d)
    Prop.forAllNoShrink(vocabGen) { case (words, d) =>
      import spark.implicits._
      val df = words.map(w => (w, w)).toDF("id", "s")
      val got = FuzzyJoin.editDistanceSelfJoin(df, "id", "s", d)
        .as[(String, String, Long)].collect().toSet
      val want = (for {
        a <- words; b <- words if a < b
        dist = lev(a, b) if dist <= d
      } yield (a, b, dist.toLong)).toSet
      Prop(got == want) :| s"d=$d got=${got.size} want=${want.size} " +
        s"missing=${(want -- got).take(5)} extra=${(got -- want).take(5)}"
    }
  }

  // the word-keyed fuzz can never hold TWO empty strings (ids are the
  // words, deduped) — pin the empty-empty distance-0 pair explicitly
  property("two empty strings pair at distance 0") = {
    import spark.implicits._
    val df = Seq(("e1", ""), ("e2", ""), ("w", "ab")).toDF("id", "s")
    val got = FuzzyJoin.editDistanceSelfJoin(df, "id", "s", maxDist = 2)
      .as[(String, String, Long)].collect().toSet
    Prop(got == Set(("e1", "e2", 0L), ("e1", "w", 2L), ("e2", "w", 2L))) :|
      s"got $got"
  }
}
