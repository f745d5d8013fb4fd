package graft

import graft.stats.{IntHistogram, PredicateOp}
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's HistogramTest suite
  * (`/root/reference/test/unit/optimizer/optimizer_test.cc:146-253`) —
  * same constants, same tolerance windows.
  */
class IntHistogramSpec extends AnyFunSuite {

  // optimizer_test.cc:146-160 — 33.5M adds must complete (O(1) add,
  // O(buckets) space) and EQ selectivities over the domain sum to ~1.
  test("OrderOfGrowthTest: constant-space ingest, selectivities sum to 1") {
    val hist = new IntHistogram(10000, 0, 100)
    var c = 0
    while (c < 33554432) { hist.addValue((c * 23) % 101); c += 1 }
    var selectivity = 0.0
    for (v <- 0 to 100)
      selectivity += hist.estimateSelectivity(PredicateOp.EQ, v)
    assert(selectivity > 0.99)
  }

  // optimizer_test.cc:165-180
  test("NegativeRangeTest: all-negative domain") {
    val hist = new IntHistogram(10, -60, -10)
    for (v <- -60 to -10) hist.addValue(v)
    assert(hist.estimateSelectivity(PredicateOp.EQ, -33) < 0.3)
    assert(hist.estimateSelectivity(PredicateOp.EQ, -33) > 0.001)
  }

  // optimizer_test.cc:185-200
  test("EqualsTest: equality binning") {
    val hist = new IntHistogram(10, 1, 10)
    hist.addValue(3); hist.addValue(3); hist.addValue(3)
    assert(hist.estimateSelectivity(PredicateOp.EQ, 3) > 0.9)
    assert(hist.estimateSelectivity(PredicateOp.EQ, 8) < 0.001)
    assert(hist.estimateSelectivity(PredicateOp.NE, 3) < 0.001)
    assert(hist.estimateSelectivity(PredicateOp.NE, 8) > 0.01)
  }

  // optimizer_test.cc:205-230
  test("LtTest: GT/LT binning") {
    val hist = new IntHistogram(10, 1, 10)
    Seq(3L, 3L, 3L, 1L, 10L).foreach(hist.addValue)
    assert(hist.estimateSelectivity(PredicateOp.GT, -1) > 0.999)
    assert(hist.estimateSelectivity(PredicateOp.GT, 2) > 0.6)
    assert(hist.estimateSelectivity(PredicateOp.GT, 4) < 0.4)
    assert(hist.estimateSelectivity(PredicateOp.GT, 12) < 0.001)
    assert(hist.estimateSelectivity(PredicateOp.LT, -1) < 0.001)
    assert(hist.estimateSelectivity(PredicateOp.LT, 2) < 0.4)
    assert(hist.estimateSelectivity(PredicateOp.LT, 4) > 0.6)
    assert(hist.estimateSelectivity(PredicateOp.LT, 12) > 0.999)
  }

  // optimizer_test.cc:235-253
  test("GETest: GE/LE binning") {
    val hist = new IntHistogram(10, 1, 10)
    Seq(3L, 3L, 3L, 1L, 10L).foreach(hist.addValue)
    assert(hist.estimateSelectivity(PredicateOp.GE, -1) > 0.999)
    assert(hist.estimateSelectivity(PredicateOp.GE, 2) > 0.6)
    assert(hist.estimateSelectivity(PredicateOp.GE, 3) > 0.45)
    assert(hist.estimateSelectivity(PredicateOp.GE, 4) < 0.5)
    assert(hist.estimateSelectivity(PredicateOp.GE, 12) < 0.001)
    assert(hist.estimateSelectivity(PredicateOp.LE, -1) < 0.001)
    assert(hist.estimateSelectivity(PredicateOp.LE, 2) < 0.4)
    assert(hist.estimateSelectivity(PredicateOp.LE, 3) > 0.45)
    assert(hist.estimateSelectivity(PredicateOp.LE, 4) > 0.6)
    assert(hist.estimateSelectivity(PredicateOp.LE, 12) > 0.999)
  }

  // Property-style complements (SURVEY §5.3): NE = 1 - EQ and
  // LE/GT partition the domain, on a seeded uniform fill.
  test("complement laws on a seeded uniform histogram") {
    val rnd = new scala.util.Random(42)
    val hist = new IntHistogram(100, 0, 999)
    (1 to 50000).foreach(_ => hist.addValue(rnd.nextInt(1000)))
    for (v <- Seq(1L, 250L, 500L, 777L, 998L)) {
      val eq = hist.estimateSelectivity(PredicateOp.EQ, v)
      val ne = hist.estimateSelectivity(PredicateOp.NE, v)
      assert(math.abs(eq + ne - 1.0) < 1e-9)
      val gt = hist.estimateSelectivity(PredicateOp.GT, v)
      val le = hist.estimateSelectivity(PredicateOp.LE, v)
      assert(math.abs(gt + le - 1.0) < 1e-9)
    }
    // monotonicity of LE in v
    val les = (0L to 999L by 37L).map(hist.estimateSelectivity(PredicateOp.LE, _))
    assert(les.sliding(2).forall { case Seq(a, b) => a <= b + 1e-12 })
  }
}
