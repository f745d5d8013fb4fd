package graft.stats

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions.udaf

/** Distributed equi-width histogram build as a typed [[Aggregator]]
  * (the UDAF surface of SURVEY §2 row 14): buffer = one Array[Long] of
  * bucket counts, O(1) reduce per row, O(buckets) merge per partition.
  *
  * Compared to the bucketize + `groupBy(col, bucket).count()` formulation
  * this shuffles only `numPartitions * buckets` partial buffers instead
  * of re-keying every row — at 100 TB the difference between a full
  * shuffle of the table and a few KB per partition.
  *
  * Same formulas as [[IntHistogram]]: span = max(1, (1+max-min)/buckets),
  * bucket = min(floor((v-min)/span), buckets-1), out-of-range ignored.
  */
final class HistogramAgg(minV: Long, maxV: Long, buckets: Int)
    extends Aggregator[java.lang.Long, Array[Long], Seq[Long]] {

  // same construction guard as IntHistogram: buckets = 0 would make
  // span Infinity and idx -1, an executor-side AIOOBE mid-job instead
  // of a named driver-side error
  require(buckets > 0, s"buckets must be positive, got $buckets")

  // shared formulas (IntHistogram companion): a hand-mirrored copy here
  // drifting from the driver-side class would mis-assign every bucket
  // with no error — addBucketCount only range-checks the index
  private val span: Double = IntHistogram.spanOf(minV, maxV, buckets)

  override def zero: Array[Long] = new Array[Long](buckets)

  override def reduce(b: Array[Long], v: java.lang.Long): Array[Long] = {
    if (v != null) {
      val x = v.longValue()
      if (x >= minV && x <= maxV)
        b(IntHistogram.bucketIdx(x, minV, span, buckets)) += 1
    }
    b
  }

  override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < buckets) { a(i) += b(i); i += 1 }
    a
  }

  override def finish(b: Array[Long]): Seq[Long] = b.toIndexedSeq

  override def bufferEncoder: Encoder[Array[Long]] = ExpressionEncoder[Array[Long]]()
  override def outputEncoder: Encoder[Seq[Long]] = ExpressionEncoder[Seq[Long]]()
}

object HistogramAgg {
  /** Column form: `histogram(col)` usable in any `agg(...)`. */
  def column(c: Column, minV: Long, maxV: Long, buckets: Int): Column =
    udaf(new HistogramAgg(minV, maxV, buckets), Encoders.LONG).apply(c)
}
