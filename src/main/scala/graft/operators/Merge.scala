package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Batch MERGE / upsert for incremental corpus maintenance: apply a
  * keyed changeset (updates, inserts, deletes) to a snapshot — the
  * operation behind refreshing a 100 TB training corpus from a crawl
  * delta without rewriting the unchanged 99%.
  *
  * Spark-first shape: ONE shuffle. Snapshot and changes are unioned
  * with a priority tag and reduced per key with a window row_number
  * (last-writer-wins, like `MERGE INTO ... WHEN MATCHED UPDATE`);
  * delete markers drop the key entirely. No driver-side state, no
  * full-outer join (which would shuffle both sides AND produce a wide
  * nullable schema to repair).
  *
  * At scale the win is layout: if the snapshot is bucketed by the key
  * ([[graft.core.Bucketing]]), the union's window shuffle degenerates
  * to a co-located sort within buckets.
  *
  * NULL-KEY CONTRACT (same family as [[AsOfJoin]]'s and
  * `Validate.Unique`'s pinned divergences): null keys GROUP TOGETHER in
  * the survivor window — a null-keyed change upserts/deletes THE
  * null-keyed snapshot row, where SQL `MERGE`'s equi-match would
  * no-match and insert a second null-keyed row. Deliberate: an
  * "unattributed" bucket should be maintainable like any other key;
  * callers wanting SQL behavior filter null keys into a separate
  * insert-only path.
  */
object Merge {

  /** Apply `changes` to `snapshot`. Both share the snapshot's schema;
    * `changes` adds `opCol` with 'U' (upsert), 'I' (insert — same
    * behavior as 'U', kept for changelog fidelity), or 'D' (delete).
    * Keys must be unique within each input (snapshot PK + one change
    * per key per batch — standard CDC compaction contract). If a caller
    * violates the contract, ties resolve DETERMINISTICALLY (row-content
    * hash order) rather than by partition-arrival luck, so a bad batch
    * yields the same wrong-but-stable answer every run instead of a
    * nondeterministic one.
    */
  def upsert(snapshot: DataFrame, changes: DataFrame, keyCols: Seq[String],
      opCol: String = "op"): DataFrame = {
    require(keyCols.nonEmpty, "upsert needs at least one key column")
    // fail fast instead of silently clobbering a data column named like
    // the op/bookkeeping columns, or keying on a column that isn't there
    require(!snapshot.columns.contains(opCol),
      s"snapshot already has a '$opCol' column — pass a different opCol")
    Seq("__prio", "__rn", "__tie").foreach { c =>
      require(!snapshot.columns.contains(c),
        s"snapshot column '$c' collides with upsert bookkeeping")
    }
    keyCols.foreach { k =>
      require(snapshot.columns.contains(k) && changes.columns.contains(k),
        s"key column '$k' missing from snapshot or changes")
    }
    require(changes.columns.contains(opCol),
      s"changes must carry the '$opCol' column")
    // the bookkeeping-collision contract must hold on BOTH inputs: a
    // changes data column named __prio would be silently overwritten by
    // the priority tag (unionByName would see matching column sets and
    // never complain) and vanish from the result
    Seq("__prio", "__rn", "__tie").foreach { c =>
      require(!changes.columns.contains(c),
        s"changes column '$c' collides with upsert bookkeeping")
    }
    val snapTagged = snapshot
      .withColumn(opCol, lit(null).cast("string"))
      .withColumn("__prio", lit(0))
    // op domain enforced per row BY NAME: anything outside {I, U, D}
    // (a lowercase 'd', 'DELETE', a typo) used to fall through the
    // `=!= "D"` filter and be treated as an upsert — the malformed
    // delete marker's (typically null) payload then REPLACED the
    // snapshot row instead of deleting the key. Silent corruption in a
    // function that fails fast on every other contract violation.
    val chTagged = changes
      .withColumn(opCol,
        when(col(opCol).isin("I", "U", "D"), col(opCol))
          .otherwise(raise_error(concat(
            lit(s"upsert: '$opCol' must be one of I/U/D, got "),
            coalesce(col(opCol), lit("NULL"))))))
      .withColumn("__prio", lit(1))
    val unioned = snapTagged.unionByName(chTagged)
      // content-hash tie-break: free (one codegen'd hash per row) and
      // only ever consulted when two rows share (key, prio) — i.e. when
      // the one-change-per-key contract is already broken
      .withColumn("__tie", xxhash64(unionCols(snapshot, opCol).map(col): _*))
    val w = Window.partitionBy(keyCols.map(col): _*)
      .orderBy(col("__prio").desc, col("__tie").asc)
    unioned
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1 && (col(opCol).isNull || col(opCol) =!= "D"))
      .drop(opCol, "__prio", "__rn", "__tie")
  }

  private def unionCols(snapshot: DataFrame, opCol: String): Seq[String] =
    snapshot.columns.toSeq :+ opCol

  /** VALUE-ordered upsert: the survivor per key is chosen by
    * `orderCols` (pass already-directed columns, e.g.
    * `Seq(col("ts").desc, col("event_id").desc)`), NOT by which input
    * the row came from. This is the CDC-merge form that stays correct
    * under out-of-order delivery — `upsert`'s change-wins-over-snapshot
    * priority assumes the changeset is strictly newer, which microbatch
    * replays and multi-source feeds don't guarantee; ordering by the
    * event's own timestamp makes the result independent of batch
    * boundaries and arrival order (associative + commutative over
    * batches, the property q148's streaming loop leans on).
    *
    * Same ONE-shuffle shape as `upsert`; `orderCols` must totally order
    * rows within a key (include a unique id as the last column) or ties
    * fall to Spark's sort, not a deterministic rule.
    */
  def upsertLatest(snapshot: DataFrame, changes: DataFrame,
      keyCols: Seq[String],
      orderCols: Seq[org.apache.spark.sql.Column]): DataFrame = {
    require(keyCols.nonEmpty, "upsertLatest needs at least one key column")
    require(orderCols.nonEmpty, "upsertLatest needs at least one order column")
    require(!snapshot.columns.contains("__rn"),
      "snapshot column '__rn' collides with upsertLatest bookkeeping")
    keyCols.foreach { k =>
      require(snapshot.columns.contains(k) && changes.columns.contains(k),
        s"key column '$k' missing from snapshot or changes")
    }
    val w = Window.partitionBy(keyCols.map(col): _*).orderBy(orderCols: _*)
    snapshot.unionByName(changes)
      .withColumn("__rn", row_number().over(w))
      .where(col("__rn") === 1)
      .drop("__rn")
  }
}
