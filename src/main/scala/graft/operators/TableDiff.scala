package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Table reconciliation — diff two keyed snapshots (a corpus version
  * against its re-build, a replica against its source) and emit only
  * the delta: which keys exist on one side only, which changed.
  *
  * Scale shape: each side is projected MAP-SIDE to (key, xxhash64 of
  * the non-key columns) before the full-outer join, so the shuffle
  * carries ~16 bytes per row however wide the rows are — diffing two
  * 100 TB tables moves key+hash, never content. Output is delta-sized
  * (identical rows drop out). A hash collision can mask a changed row
  * as unchanged with probability ~2⁻⁶⁴ per pair — the standard
  * reconciliation trade; rows flagged `changed` are certain.
  */
object TableDiff {

  /** Diff `b` against `a` on `keyCols`. Both sides must share the
    * schema; keys are assumed unique per side (snapshot contract).
    * Returns (keyCols..., diff_status) with diff_status ∈
    * {'only_a', 'only_b', 'changed'}; unchanged keys are absent.
    */
  def diff(a: DataFrame, b: DataFrame, keyCols: Seq[String]): DataFrame = {
    require(keyCols.nonEmpty, "diff needs at least one key column")
    require(a.columns.toSeq == b.columns.toSeq,
      s"schemas differ: ${a.columns.toSeq} vs ${b.columns.toSeq}")
    val nonKey = a.columns.filterNot(keyCols.contains).toSeq
    require(nonKey.nonEmpty, "diff needs at least one non-key column")
    // Spark's XxHash64 SKIPS null children (the running hash is passed
    // through unmixed), so hashing the values alone makes null-shifted
    // rows collide systematically: (x, null) and (null, x) both reduce
    // to hash(x). Interleaving an isnull marker per column (booleans are
    // never null, so every marker mixes) restores position sensitivity —
    // the collision class disappears and only the documented ~2⁻⁶⁴
    // random-collision risk remains.
    def hashed(df: DataFrame, hName: String) =
      df.select(keyCols.map(col) :+
        xxhash64(nonKey.flatMap(c => Seq(col(c), isnull(col(c)))): _*).as(hName): _*)
    hashed(a, "__ha").join(hashed(b, "__hb"), keyCols, "full_outer")
      .where(col("__ha").isNull || col("__hb").isNull ||
        col("__ha") =!= col("__hb"))
      .select(keyCols.map(col) :+
        when(col("__hb").isNull, "only_a")
          .when(col("__ha").isNull, "only_b")
          .otherwise("changed").as("diff_status"): _*)
  }
}
