package graft.operators

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.catalyst.encoders.RowEncoder
import org.apache.spark.sql.functions._

/** Exact 2-D skyline (Pareto frontier): the rows not dominated under
  * (minimize `xCol`, maximize `yCol`) — dominance requires ≤/≥ on both
  * axes and strict on at least one.
  *
  * The skyline is DISTRIBUTIVE: skyline(A ∪ B) = skyline(skyline(A) ∪
  * skyline(B)), so the plan is the classic two-phase shape —
  * a per-partition sweep (Spark's spillable `sortWithinPartitions`,
  * then a single streaming pass holding one running max), followed by
  * the same sweep over the UNION OF LOCAL SKYLINES in one task. Local
  * skylines are frontier-sized (bounded by the distinct x values of
  * the partition's frontier), so the final single-task pass sees
  * #partitions × local-frontier rows — metadata-scale, not data-scale;
  * no global sort of the input ever happens (a window-function
  * formulation would force exactly that single-partition global sort).
  *
  * Input rows must carry NON-NULL LongType `xCol`/`yCol` — dominance
  * is undefined for a null coordinate, and nulls sort FIRST so a single
  * null row would silently poison the running-max sweep; the operator
  * fails fast with a named error instead (callers drop or impute
  * first). Rows with equal (x, y) should be pre-aggregated by the
  * caller (the operator keeps the first it sees per (x, y) within a
  * partition — aggregate multiplicity into a count column if it
  * matters).
  */
object Skyline {
  def skyline2D(df: DataFrame, xCol: String, yCol: String): DataFrame = {
    val schema = df.schema
    val xi = schema.fieldIndex(xCol)
    val yi = schema.fieldIndex(yCol)
    val enc = RowEncoder.encoderFor(schema)

    // One streaming pass over rows sorted (x asc, y desc): a row
    // survives iff its y strictly beats every earlier row's y — earlier
    // rows have x <= this x, so a y tie or worse means dominated
    // (strict on x or identical point).
    def sweep(it: Iterator[Row]): Iterator[Row] = {
      var maxY = Long.MinValue
      it.flatMap { r =>
        if (r.isNullAt(xi) || r.isNullAt(yi))
          throw new IllegalArgumentException(
            s"Skyline.skyline2D: null $xCol/$yCol — dominance is undefined " +
              "for null coordinates; filter or impute before the sweep")
        val y = r.getLong(yi)
        if (y > maxY) { maxY = y; Some(r) } else None
      }
    }

    val local = df
      .sortWithinPartitions(col(xCol).asc, col(yCol).desc)
      .mapPartitions(sweep)(enc)
    local
      .coalesce(1)
      .sortWithinPartitions(col(xCol).asc, col(yCol).desc)
      .mapPartitions(sweep)(enc)
  }
}
