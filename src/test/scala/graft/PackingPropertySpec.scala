package graft

import graft.operators.Packing
import org.apache.spark.sql.functions.col
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Property test for the distributed prefix-sum sharding: on ANY token
  * sequence (including zero-token docs, huge single docs, and budgets
  * smaller/larger than every doc) the bucketed-offsets implementation
  * must equal the single-window form at every bucket count.
  */
object PackingPropertySpec extends Properties("Packing") {
  private lazy val spark = SharedSpark.spark

  // Spark jobs per case are the cost driver — fewer, richer cases
  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private val docsGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(0, 60)
    toks <- Gen.listOfN(n, Gen.oneOf(Gen.choose(0L, 5L), Gen.choose(100L, 5000L)))
    // sparse, non-contiguous ids exercise uneven bucket occupancy
    ids <- Gen.listOfN(n, Gen.choose(0L, 100000L)).map(_.distinct)
  } yield ids.zip(toks)

  property("global bucketed form == window form") =
    Prop.forAllNoShrink(docsGen, Gen.oneOf(1, 2, 7, 32),
      Gen.oneOf(1L, 500L, 100000L)) { (docs, buckets, budget) =>
      import spark.implicits._
      val df = docs.toDF("id", "ntok")
      val windowed = Packing
        .shardByTokenBudget(df, col("ntok"), col("id"), budget)
        .select("id", "shard_id").as[(Long, Long)].collect().toMap
      val global = Packing
        .shardByTokenBudgetGlobal(df, "ntok", "id", budget, buckets)
        .select("id", "shard_id").as[(Long, Long)].collect().toMap
      val ok = global == windowed
      if (!ok) println(s"MISMATCH buckets=$buckets budget=$budget docs=$docs")
      ok
    }

  // hash-ordered packing: the order key spans (nearly) the full long
  // range, so hi - lo exceeds Long.MaxValue — long span arithmetic
  // WRAPPED here before the BigInt/decimal range path
  private val fullRangeDocsGen: Gen[List[(Long, Long)]] = for {
    n <- Gen.choose(2, 40)
    toks <- Gen.listOfN(n, Gen.choose(0L, 5000L))
    ids <- Gen.listOfN(n, Gen.oneOf(
      Gen.const(Long.MinValue), Gen.const(Long.MaxValue),
      Gen.choose(Long.MinValue, Long.MaxValue))).map(_.distinct)
  } yield ids.zip(toks)

  property("global form == window form on full-long-range order keys") =
    Prop.forAllNoShrink(fullRangeDocsGen, Gen.oneOf(1, 2, 7, 32),
      Gen.oneOf(1L, 500L, 100000L)) { (docs0, buckets, budget) =>
      import spark.implicits._
      // force the wide range even if the generator drew a narrow one
      val docs = ((Long.MinValue, 3L) :: (Long.MaxValue, 4L) :: docs0).distinct
      val df = docs.toDF("id", "ntok")
      val windowed = Packing
        .shardByTokenBudget(df, col("ntok"), col("id"), budget)
        .select("id", "shard_id").as[(Long, Long)].collect().toMap
      val global = Packing
        .shardByTokenBudgetGlobal(df, "ntok", "id", budget, buckets)
        .select("id", "shard_id").as[(Long, Long)].collect().toMap
      val ok = global == windowed
      if (!ok) println(s"MISMATCH buckets=$buckets budget=$budget docs=$docs")
      ok
    }

  property("both forms fail fast on a negative token count") = {
    import spark.implicits._
    val df = Seq((1L, 5L), (2L, -3L), (3L, 7L)).toDF("id", "ntok")
    def names(run: => Unit): Seq[String] =
      try { run; Nil } catch { case t: Throwable => SharedSpark.messages(t) }
    val w = names(Packing
      .shardByTokenBudget(df, col("ntok"), col("id"), 10L).count())
    val g = names(Packing
      .shardByTokenBudgetGlobal(df, "ntok", "id", 10L, 2).count())
    Prop(w.exists(_.contains("Packing.shardByTokenBudget")) &&
      g.exists(_.contains("Packing.shardByTokenBudgetGlobal"))) :|
      s"window=$w global=$g"
  }
}
