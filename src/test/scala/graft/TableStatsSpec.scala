package graft

import graft.stats.{IntHistogram, PredicateOp, TableStats}
import org.scalatest.funsuite.AnyFunSuite

/** Port of the reference's TableStatsTest suite
  * (`/root/reference/test/unit/optimizer/optimizer_test.cc:262-365`), with
  * the distributed build running on a real (local) SparkSession over the
  * reference's fixture shape: 10200 rows x 4 int columns uniform [1, 31]
  * (`optimizer_test.cc:627-631`, `test/utils/utils.cc:51-60`), seeded for
  * determinism (SURVEY §7.4.2).
  */
class TableStatsSpec extends AnyFunSuite {

  private val IoCost = 100.0

  private lazy val t1Stats: TableStats = {
    val spark = SharedSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(1001)
    val rows = Seq.fill(10200)(
      (1 + rnd.nextInt(31), 1 + rnd.nextInt(31), 1 + rnd.nextInt(31), 1 + rnd.nextInt(31)))
    // 4-col int tuples: ~341 per 8196B page in the reference layout
    val pages = math.ceil(10200.0 / 341).toLong
    TableStats.build(rows.toDF("c0", "c1", "c2", "c3"),
      ioCostPerPage = IoCost, numPagesOverride = Some(pages))
  }

  private def diff(xs: Seq[Double]): Seq[Double] =
    xs.sliding(2).map { case Seq(a, b) => b - a }.toSeq
  private def checkConstant(xs: Seq[Double]): Boolean = {
    val av = xs.sum / xs.size
    math.sqrt(xs.map(x => (x - av) * (x - av)).sum / xs.size) < 1.0
  }
  private def checkLinear(xs: Seq[Double]): Boolean = checkConstant(diff(xs))
  private def checkQuadratic(xs: Seq[Double]): Boolean = checkLinear(diff(xs))

  // optimizer_test.cc:262-304 — scan cost growth orders (pure cost-model
  // arithmetic; page counts stand in for the populated tables).
  test("EstimateScanCostTest: linear in pages, io; quadratic in both") {
    def scanCost(io: Double, pages: Long): Double =
      TableStats.fromHistograms(510 * pages, io, pages,
        IndexedSeq("c0" -> new IntHistogram(100, 1, 31))).estimateScanCost()
    val is = 1 to 10
    val costs1 = is.map(i => scanCost(1.0, 3L * i))
    assert(!checkConstant(costs1) && checkLinear(costs1))
    val costs2 = is.map(i => scanCost(8.0 * i, 1L))
    assert(!checkConstant(costs2) && checkLinear(costs2))
    val costs3 = is.map(i => scanCost(3.0 * i, i.toLong))
    assert(!checkConstant(costs3) && !checkLinear(costs3) && checkQuadratic(costs3))
  }

  // optimizer_test.cc:311-319 — exact cardinalities on the 10200-row t1.
  test("EstimateTableCardinalityTest: exact 3060 / 10200 / 0") {
    assert(t1Stats.estimateTableCardinality(0.3) == 3060L)
    assert(t1Stats.estimateTableCardinality(1.0) == 10200L)
    assert(t1Stats.estimateTableCardinality(0.0) == 0L)
  }

  // optimizer_test.cc:322-365 — all six ops on every column against the
  // analytic values for uniform [0, 32), same tolerance windows.
  test("EstimateSelectivityTest: six ops, analytic windows, every column") {
    val maxVal = 32L; val minVal = 0L
    val aboveMax = maxVal + 10; val belowMin = minVal - 10
    val midVal = (minVal + maxVal) / 2
    import PredicateOp._
    for (colIdx <- 0 until 4) {
      def sel(op: PredicateOp, v: Long): Double =
        t1Stats.estimateSelectivity(colIdx, op, v)
      assert(math.abs(sel(EQ, aboveMax) - 0.0) < 0.001)
      assert(math.abs(sel(EQ, midVal) - 1.0 / 32.0) < 0.015)
      assert(math.abs(sel(EQ, belowMin) - 0.0) < 0.001)

      assert(math.abs(sel(NE, aboveMax) - 1.0) < 0.001)
      assert(math.abs(sel(NE, midVal) - 31.0 / 32.0) < 0.015)
      assert(math.abs(sel(NE, belowMin) - 1.0) < 0.015)

      assert(math.abs(sel(GT, aboveMax) - 0.0) < 0.001)
      assert(math.abs(sel(GT, maxVal) - 0.0) < 0.001)
      assert(math.abs(sel(GT, midVal) - 0.5) < 0.1)
      assert(math.abs(sel(GT, minVal) - 31.0 / 32.0) < 0.05)
      assert(math.abs(sel(GT, belowMin) - 1.0) < 0.001)

      assert(math.abs(sel(LT, aboveMax) - 1.0) < 0.001)
      assert(math.abs(sel(LT, maxVal) - 1.0) < 0.015)
      assert(math.abs(sel(LT, midVal) - 0.5) < 0.1)
      assert(math.abs(sel(LT, minVal) - 0.0) < 0.001)
      assert(math.abs(sel(LT, belowMin) - 0.0) < 0.001)

      assert(math.abs(sel(GE, aboveMax) - 0.0) < 0.001)
      assert(math.abs(sel(GE, maxVal) - 0.0) < 0.015)
      assert(math.abs(sel(GE, midVal) - 0.5) < 0.1)
      assert(math.abs(sel(GE, minVal) - 1.0) < 0.015)
      assert(math.abs(sel(GE, belowMin) - 1.0) < 0.001)

      assert(math.abs(sel(LE, aboveMax) - 1.0) < 0.001)
      assert(math.abs(sel(LE, maxVal) - 1.0) < 0.015)
      assert(math.abs(sel(LE, midVal) - 0.5) < 0.1)
      assert(math.abs(sel(LE, minVal) - 0.0) < 0.05)
      assert(math.abs(sel(LE, belowMin) - 0.0) < 0.001)
    }
  }

  // Timestamp columns histogram as epoch MICROS — the unit Catalyst
  // stores timestamp literals in, so date-range predicates estimate
  // straight from data.
  test("timestamp histograms: epoch-micros domain, range selectivity") {
    val spark = SharedSpark.spark
    import spark.implicits._
    val base = java.sql.Timestamp.valueOf("2024-01-01 00:00:00").getTime
    val rows = (0 until 1000).map(i => Tuple1(new java.sql.Timestamp(base + i * 3600000L)))
    val stats = TableStats.build(rows.toDF("ts"),
      ioCostPerPage = IoCost, numPagesOverride = Some(1L))
    assert(stats.hasHistogram("ts"))
    val mid = (base + 500L * 3600000L) * 1000L // micros, like a Catalyst literal
    assert(math.abs(stats.estimateSelectivity("ts", PredicateOp.LT, mid) - 0.5) < 0.05)
    assert(stats.estimateSelectivity("ts", PredicateOp.GT, (base + 1000L * 3600000L) * 1000L) < 0.01)
  }

  // ndv: measured HLL for atomic columns (strings included), domain cap
  // as fallback, always bounded by row count.
  test("estimateNdv: measured for atomic columns, capped by rows") {
    val spark = SharedSpark.spark
    import spark.implicits._
    val rows = (0 until 2000).map(i => (i.toLong, s"name-${i % 50}", i % 7))
    val stats = TableStats.build(rows.toDF("id", "name", "grp"),
      ioCostPerPage = IoCost, numPagesOverride = Some(1L))
    val idNdv = stats.estimateNdv("id").get
    assert(math.abs(idNdv - 2000L) < 200L, s"id ndv $idNdv") // ~5% HLL error
    val nameNdv = stats.estimateNdv("name").get // string column
    assert(math.abs(nameNdv - 50L) < 5L, s"name ndv $nameNdv")
    assert(stats.estimateNdv("grp").get <= 8L)
    assert(stats.estimateNdv("nope").isEmpty)
  }

  // The distributed bucketize pass must agree exactly with a driver-side
  // addValue loop over the same data.
  test("distributed histogram build equals driver-side addValue build") {
    val spark = SharedSpark.spark
    import spark.implicits._
    val rnd = new scala.util.Random(77)
    val values = Seq.fill(5000)(rnd.nextInt(1000) - 500)
    val stats = TableStats.build(values.map(Tuple1(_)).toDF("v"),
      ioCostPerPage = IoCost, numPagesOverride = Some(10L))
    val expected = new IntHistogram(TableStats.NumHistBins,
      values.min.toLong, values.max.toLong)
    values.foreach(v => expected.addValue(v.toLong))
    assert(stats.histogram("v").bucketCounts == expected.bucketCounts)
    assert(stats.numTuples == 5000L)
  }
}
