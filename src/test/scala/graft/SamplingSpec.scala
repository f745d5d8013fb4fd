package graft

import graft.operators.Sampling
import org.apache.spark.sql.functions._
import org.scalatest.funsuite.AnyFunSuite

class SamplingSpec extends AnyFunSuite {
  private lazy val spark = SharedSpark.spark
  import spark.implicits._

  private lazy val ids = (0L until 20000L).toDF("id")

  test("hashSplit partitions every row exactly once with ~right proportions") {
    val split = Sampling.hashSplit(ids, "id",
      Seq("train" -> 0.8, "val" -> 0.1, "test" -> 0.1))
    val counts = split.groupBy("split").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(counts.values.sum == 20000L)
    assert(math.abs(counts("train") - 16000L) < 500)
    assert(math.abs(counts("val") - 2000L) < 300)
    assert(math.abs(counts("test") - 2000L) < 300)
  }

  test("splits are deterministic and layout-independent") {
    val a = Sampling.hashSplit(ids, "id", Seq("train" -> 0.5, "rest" -> 0.5))
      .where(col("split") === "train").select("id").as[Long].collect().toSet
    val b = Sampling.hashSplit(ids.repartition(13), "id",
      Seq("train" -> 0.5, "rest" -> 0.5))
      .where(col("split") === "train").select("id").as[Long].collect().toSet
    assert(a == b)
  }

  test("deterministicSample is a subset consistent with hashSplit math") {
    val s = Sampling.deterministicSample(ids, "id", 0.25)
    val n = s.count()
    assert(math.abs(n - 5000L) < 400)
    assert(Sampling.deterministicSample(ids, "id", 1.0).count() == 20000L)
    assert(Sampling.deterministicSample(ids, "id", 0.0).count() == 0L)
  }
}
