package graft

import graft.stats.SpaceSavingAgg
import org.apache.spark.sql.functions._
import org.scalacheck.{Gen, Prop, Properties, Test}

/** The Space-Saving contracts under arbitrary merge trees: for every
  * reported item est − err ≤ true ≤ est, reported size =
  * min(k, distinct), and (single-buffer classic guarantee) any item
  * with true > N/k is reported. Fuzzed over random skewed streams and
  * random partitionings — the partitioning is exactly what varies on a
  * cluster.
  */
object SpaceSavingSpec extends Properties("SpaceSaving") {
  private lazy val spark = SharedSpark.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  private val streamGen = for {
    k <- Gen.choose(3, 10)
    n <- Gen.choose(20, 400)
    vocab <- Gen.choose(2, 25)
    // zipf-ish skew: item i drawn proportional to 1/(i+1)
    items <- Gen.listOfN(n, Gen.frequency(
      (0 until vocab).map(i => (vocab - i, Gen.const(s"w$i"))): _*))
    parts <- Gen.choose(1, 8)
  } yield (k, items, parts)

  property("contracts hold under any partitioning") =
    Prop.forAllNoShrink(streamGen) { case (k, items, parts) =>
      import spark.implicits._
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val got = items.toDF("w").repartition(parts)
        .agg(SpaceSavingAgg.column(col("w"), k).as("sk"))
        .select(explode(col("sk")).as("it"))
        .select(col("it._1"), col("it._2"), col("it._3"))
        .as[(String, Long, Long)].collect()
      val sizeOk = got.length == math.min(k, truth.size)
      val boundsOk = got.forall { case (w, est, err) =>
        val t = truth.getOrElse(w, 0L)
        t <= est && est - err <= t
      }
      (Prop(sizeOk) :| s"size ${got.length} vs min($k, ${truth.size})") &&
        (Prop(boundsOk) :| s"bounds violated in ${got.toSeq.take(10)}")
    }

  property("single-buffer classic guarantee: f > N/k is always reported") =
    Prop.forAllNoShrink(streamGen) { case (k, items, _) =>
      val agg = new SpaceSavingAgg(k)
      val sketch = items.foldLeft(agg.zero)(agg.reduce)
      val out = agg.finish(sketch).map(_._1).toSet
      val truth = items.groupBy(identity).view.mapValues(_.size.toLong).toMap
      val heavy = truth.filter(_._2 > items.size.toLong / k).keySet
      Prop(heavy.subsetOf(out)) :| s"missing ${(heavy -- out).take(5)}"
    }
}
