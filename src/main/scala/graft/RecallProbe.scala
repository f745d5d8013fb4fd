package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._
import graft.operators.Similarity

/** Measures per-query recall@k of the approximate IVF path (nprobe <
  * nlist) against the exact brute-force baseline — the evidence behind
  * q122_ann_recall's floor (SCALE.md §ANN recall). Run per sf dir:
  *
  *   sbt -batch "runMain graft.RecallProbe /root/testdata/sf0.01"
  */
object RecallProbe {
  def main(args: Array[String]): Unit = {
    val dir = args.headOption.getOrElse("/root/testdata/sf0.01")
    val spark = SparkSession.builder()
      .master("local[8]")
      .config("spark.sql.shuffle.partitions", "8")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val k = 10
    val e = graft.core.Catalog.table(spark, dir, "embeddings")
    val q = e.where(col("vec_id") < 16)
    val exact = Similarity.bruteForceTopK(q, e, "vec_id", "vec_id", "embedding", k)
    val approx = Similarity.ivfTopK(q, e, "vec_id", "vec_id", "embedding", k,
      nlist = 16, nprobe = 4, trainIters = 2)
    val hits = exact
      .join(approx.select("query_id", "neighbor_id"),
        Seq("query_id", "neighbor_id"), "left_semi")
      .groupBy("query_id").agg(count(lit(1)).as("hits"))
    val recall = exact.groupBy("query_id").agg(count(lit(1)).as("n"))
      .join(hits, Seq("query_id"), "left")
      .select(col("query_id"),
        (coalesce(col("hits"), lit(0L)).cast("double") / col("n")).as("recall"))
      .orderBy("query_id")
    val rows = recall.collect()
    rows.foreach(r => println(f"[recall] $dir q=${r.getLong(0)}%3d recall=${r.getDouble(1)}%.2f"))
    val rs = rows.map(_.getDouble(1))
    println(f"[recall] $dir min=${rs.min}%.2f mean=${rs.sum / rs.length}%.2f n=${rs.length}")
    spark.stop()
  }
}
