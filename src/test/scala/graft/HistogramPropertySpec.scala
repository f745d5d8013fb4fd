package graft

import graft.stats.{IntHistogram, PredicateOp}
import org.scalacheck.{Gen, Prop, Properties}

/** ScalaCheck property suite for the selectivity formulas (SURVEY §5.3):
  * invariants that must hold for ANY domain and value distribution, not
  * just the reference's fixtures.
  */
object HistogramPropertySpec extends Properties("IntHistogram") {

  private val histGen: Gen[(IntHistogram, List[Long])] = for {
    lo <- Gen.choose(-1000L, 1000L)
    width <- Gen.choose(1L, 5000L)
    buckets <- Gen.choose(1, 200)
    n <- Gen.choose(1, 500)
    values <- Gen.listOfN(n, Gen.choose(lo, lo + width))
  } yield {
    val h = new IntHistogram(buckets, lo, lo + width)
    values.foreach(h.addValue)
    (h, values)
  }

  private val probeGen: Gen[Long] = Gen.choose(-2500L, 8500L)

  property("selectivities lie in [0, 1]") = Prop.forAll(histGen, probeGen) {
    case ((h, _), v) =>
      PredicateOp.all.forall { op =>
        val s = h.estimateSelectivity(op, v)
        s >= -1e-9 && s <= 1.0 + 1e-9
      }
  }

  property("NE complements EQ") = Prop.forAll(histGen, probeGen) {
    case ((h, _), v) =>
      math.abs(h.estimateSelectivity(PredicateOp.EQ, v) +
        h.estimateSelectivity(PredicateOp.NE, v) - 1.0) < 1e-9
  }

  property("GT + LE = 1 within range") = Prop.forAll(histGen, probeGen) {
    case ((h, _), v) =>
      // boundary guards differ at the extremes by design (reference
      // semantics); the complement law holds strictly inside the domain
      (v <= h.minV || v >= h.maxV) || math.abs(
        h.estimateSelectivity(PredicateOp.GT, v) +
          h.estimateSelectivity(PredicateOp.LE, v) - 1.0) < 1e-9
  }

  property("LE is monotonically nondecreasing in v") = Prop.forAll(histGen) {
    case (h, _) =>
      val probes = (h.minV - 10) to (h.maxV + 10) by
        math.max(1L, (h.maxV - h.minV) / 50)
      probes.map(h.estimateSelectivity(PredicateOp.LE, _))
        .sliding(2).forall { case Seq(a, b) => a <= b + 1e-9; case _ => true }
  }

  // The exact-sum law only holds at span = 1 (buckets >= domain size) —
  // with wider buckets the equi-width EQ formula spreads a bucket's mass
  // uniformly over `span` slots while the true value count per bucket is
  // an integer, so per-value sums drift. That matches the reference: its
  // OrderOfGrowthTest asserts the sum with 10000 buckets over [0, 100].
  property("EQ selectivities sum to ~1 when span = 1") = Prop.forAll(
    Gen.choose(101, 5000).flatMap(b => Gen.choose(1, 300).map(b -> _))) {
    case (buckets, n) =>
      val h = new IntHistogram(buckets, 0, 100)
      val rnd = new scala.util.Random(n)
      (1 to n).foreach(_ => h.addValue(rnd.nextInt(101).toLong))
      val sum = (0L to 100L).map(h.estimateSelectivity(PredicateOp.EQ, _)).sum
      sum > 0.99 && sum < 1.01
  }

  property("GE(v) equals GT(v-1) inside the domain") =
    Prop.forAll(histGen, probeGen) { case ((h, _), v) =>
      (v <= h.minV || v > h.maxV) ||
        math.abs(h.estimateSelectivity(PredicateOp.GE, v) -
          h.estimateSelectivity(PredicateOp.GT, v - 1)) < 1e-9
    }
}
