package graft

import org.apache.spark.sql.SparkSession

/** One shared local SparkSession across all ScalaTest suites (starting a
  * session per suite would dominate test wall-time). Never stopped —
  * torn down with the forked test JVM.
  */
object SharedSpark {
  lazy val spark: SparkSession = {
    val s = SparkSession.builder()
      .master("local[4]")
      .appName("graft-test")
      .config("spark.sql.shuffle.partitions", "4")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    s.sparkContext.setLogLevel("ERROR")
    s
  }
}
