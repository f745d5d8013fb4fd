package graft
import org.apache.spark.sql.{SparkSession, DataFrame}
/** Driver contract — see /root/repo/SURVEY.md §7 + the builder prompt. */
object SparkEntry {
  /** Flagship query on /root/testdata/sf0.001; driver smoke-checks rows>0.
    * Runs the Selinger-optimized 4-table join (SURVEY §7.2 slice).
    */
  def entry(spark: SparkSession): DataFrame =
    Queries.q05_join_opt(spark, "/root/testdata/sf0.001")
  /** One entry per implemented operator from SURVEY.md §2. */
  def queries: Map[String, (SparkSession, String) => DataFrame] = Queries.all
  /** The streaming-tagged subset of [[queries]] — the bench keys its
    * stream-median / no-challenge-rerun policy off this registry, never
    * off a name substring (see [[Queries.streamingQueries]]).
    */
  def streamingQueries: Set[String] = Queries.streamingQueries
  /** For each key in queries, equivalent ANSI SQL runnable by DuckDB on
    * the same parquet tables. Omit for non-SQL-expressible ops. */
  def oracleSql: Map[String, String] = Queries.oracle
}
