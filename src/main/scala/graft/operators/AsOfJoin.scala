package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/** As-of (point-in-time) join. `direction = "backward"` (default): for
  * each left row, attach the right row with the greatest
  * `rightTs <= leftTs` for the same key; ties on `rightTs` resolve to
  * the greatest `tieBreak`. `direction = "forward"`: the right row with
  * the SMALLEST `rightTs >= leftTs`; ties resolve to the smallest
  * `tieBreak` (the "next scheduled event" lookup — e.g. each user
  * event's next order).
  *
  * Implementation is the union + window trick, NOT a range join: tag both
  * sides, union, and take `last(ignoreNulls)` of the right-side payload
  * struct over (key) ordered by (ts, side, tieBreak) — time-reversed for
  * forward. One shuffle on the key, one sort within partitions — the
  * shape that survives 100 TB, where a `leftTs >= rightTs` theta join
  * would explode to O(|L|·|R|) per key.
  *
  * (Spark has no built-in as-of join; composed from built-ins per the
  * custom-operator preference order.)
  *
  * NULL-KEY CONTRACT (deliberate divergence from SQL join semantics): a
  * left row with a NULL key matches null-keyed RIGHT rows — both land in
  * the window's shared null partition, exactly like `GROUP BY` groups
  * nulls together. SQL's equi-join rule (`null = null` is unknown →
  * no-match, as pandas `merge_asof` also behaves) was considered and
  * DECLINED: in the pipeline shapes this operator serves, a null key is
  * an entity bucket ("unattributed"), and silently emitting no-match for
  * the whole bucket hides it from the join result. Callers needing SQL
  * semantics filter `left.where(col(key).isNotNull)` first — one pushed
  * scan predicate. Pinned by DegenerateInputSpec
  * ("AsOfJoin null-key contract"). Null TIMESTAMPS keep SQL semantics on
  * both sides (a null ts has no position on the time axis — right rows
  * are dropped, left rows emit no-match; see the inline notes).
  */
object AsOfJoin {
  def apply(
      left: DataFrame,
      right: DataFrame,
      leftKey: String,
      leftTs: String,
      rightKey: String,
      rightTs: String,
      tieBreak: String,
      payloadCols: Seq[String],
      direction: String = "backward"): DataFrame = {
    require(direction == "backward" || direction == "forward",
      s"direction must be backward|forward, got '$direction'")

    val payload = (rightTs +: tieBreak +: payloadCols).distinct
    val payloadType = StructType(payload.map(c => right.schema(c)))
    val leftCols = left.columns.toSeq

    // name guards (the Merge.upsert/Packing discipline): the union/window
    // plumbing reserves the __-prefixed names, and the output carries all
    // left columns plus the payload under its RIGHT-side names — a
    // collision in either would surface as AMBIGUOUS_REFERENCE far
    // downstream (or silently misbind), not here where it is caused
    val bookkeeping = Seq("__key", "__ts", "__side", "__tie", "__payload", "__match")
    val reserved = (left.columns ++ right.columns).filter(bookkeeping.contains).distinct
    require(reserved.isEmpty,
      s"AsOfJoin: reserved bookkeeping column name(s) ${reserved.mkString(", ")} " +
        "present in an input - rename them first")
    val dup = payload.filter(leftCols.contains)
    require(dup.isEmpty,
      s"AsOfJoin: payload column(s) ${dup.mkString(", ")} collide with left " +
        "columns - the output would carry duplicate names; alias them on the " +
        "right side first")

    val taggedLeft = left.select(
      Seq(col(leftKey).as("__key"), col(leftTs).as("__ts"),
        lit(1).as("__side"), // left sorts after right at equal ts
        lit(null).cast(right.schema(tieBreak).dataType).as("__tie"),
        lit(null).cast(payloadType).as("__payload")) ++
        leftCols.map(col): _*)

    // A right row with NULL ts has no position on the time axis — under
    // the ascending backward window Spark sorts nulls FIRST, so it would
    // masquerade as the "earliest" right row and match left rows that
    // should have no match. It can never satisfy rightTs <= leftTs (or
    // >=), so drop it before the union.
    val taggedRight = right.where(col(rightTs).isNotNull).select(
      Seq(col(rightKey).as("__key"), col(rightTs).as("__ts"),
        lit(0).as("__side"), col(tieBreak).as("__tie"),
        struct(payload.map(col): _*).as("__payload")) ++
        leftCols.map(c => lit(null).cast(left.schema(c).dataType).as(c)): _*)

    // Backward scans time ascending: the last right payload seen at or
    // before the left row is the greatest rightTs <= leftTs, and among
    // equal rightTs the greatest tie (tie asc => scanned last). Forward
    // scans time DESCENDING: the last right seen is the smallest
    // rightTs >= leftTs, and tie desc makes the smallest tie scan last.
    // Both orders put rights before lefts at equal ts (side asc), so an
    // exactly-equal timestamp matches in either direction.
    val w = (if (direction == "backward")
      Window.partitionBy("__key")
        .orderBy(col("__ts").asc, col("__side").asc, col("__tie").asc_nulls_first)
    else
      Window.partitionBy("__key")
        .orderBy(col("__ts").desc, col("__side").asc, col("__tie").desc_nulls_first))
      .rowsBetween(Window.unboundedPreceding, 0)

    taggedLeft.unionByName(taggedRight)
      .withColumn("__match", last(col("__payload"), ignoreNulls = true).over(w))
      .where(col("__side") === 1)
      // a left row with NULL ts has no as-of position either: whatever
      // the null sort order put in its window, the contract answer is
      // no-match
      .withColumn("__match",
        when(col("__ts").isNull, lit(null).cast(payloadType))
          .otherwise(col("__match")))
      .select(leftCols.map(col) ++ payload.map(c => col(s"__match.$c").as(c)): _*)
  }
}
