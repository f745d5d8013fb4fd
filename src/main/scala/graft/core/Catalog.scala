package graft.core

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Table registry: name → DataFrame over the driver-provided parquet
  * TESTDATA layout (`<dir>/<name>.parquet`). The analogue of the
  * reference's trivial catalog (`/root/reference/src/include/optimizer/
  * catalog.h:13-20` — a map table_id → page count), generalized to real
  * schemas: Spark's file index supplies size/row statistics.
  */
object Catalog {
  val tableNames: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def table(spark: SparkSession, dir: String, name: String): DataFrame = {
    // events.ts is parquet TIMESTAMP(NANOS), which Spark 4 rejects unless
    // read as a raw long; convert nanos -> microsecond TimestampType here
    // so downstream operators see a normal timestamp column.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val df = spark.read.parquet(s"$dir/$name.parquet")
    if (name == "events")
      df.withColumn("ts", org.apache.spark.sql.functions.timestamp_micros(
        org.apache.spark.sql.functions.expr("ts div 1000")))
    else df
  }

  def loadAll(spark: SparkSession, dir: String): Map[String, DataFrame] =
    tableNames.map(n => n -> table(spark, dir, n)).toMap

  /** Standard session factory: 32 shuffle partitions to match local[32]
    * (not the 200 default sized for clusters), AQE on for runtime
    * coalescing and skew-join handling.
    */
  def newSession(master: String = "local[32]"): SparkSession = {
    val spark = SparkSession.builder()
      .master(master)
      .appName("graft")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.sql.adaptive.enabled", "true")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    spark
  }
}
