package graft.stats

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.logical.LogicalPlan
import org.apache.spark.sql.execution.datasources.{HadoopFsRelation, LogicalRelation}

/** Process-wide registry of pre-built [[TableStats]], keyed by the file
  * paths behind a scan — the Spark-side analogue of the reference's
  * persisted catalog (`/root/reference/src/optimizer/catalog.txt` loaded
  * at startup): statistics are computed once per table, then every later
  * optimization reads them for free.
  *
  * [[graft.plans.SelingerJoinReorder]] consults this during optimization
  * (never running jobs itself — looking up here is a map read), so a
  * `spark.sql` query over tables whose stats were registered gets
  * histogram-driven filter selectivities and true row counts instead of
  * size-in-bytes guesses.
  *
  * Keys are the sorted root paths of the scan's file index, so the same
  * parquet directory read through different DataFrames (or sessions over
  * one context) resolves to one entry.
  */
object StatsRegistry {
  private val byKey = new java.util.concurrent.ConcurrentHashMap[String, TableStats]()

  /** Stable key for a single-file-relation plan, if it is one. */
  def planKey(plan: LogicalPlan): Option[String] =
    plan.collectLeaves() match {
      case Seq(lr: LogicalRelation) =>
        lr.relation match {
          case hfs: HadoopFsRelation =>
            Some(hfs.location.rootPaths.map(_.toString).sorted.mkString(";"))
          case _ => None
        }
      case _ => None
    }

  /** Register stats for the (single) file relation a DataFrame scans. */
  def register(df: DataFrame, ts: TableStats): Unit =
    planKey(df.queryExecution.analyzed).foreach(k => byKey.put(k, ts))

  def forPlan(plan: LogicalPlan): Option[TableStats] =
    planKey(plan).flatMap(k => Option(byKey.get(k)))

  def clear(): Unit = byKey.clear()
}
