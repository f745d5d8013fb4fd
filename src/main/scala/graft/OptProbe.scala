package graft

import org.apache.spark.sql.SparkSession

/** Dev measurement probes for the optimization rounds (r16) — the
  * evidence generators behind OPTIMIZATION_r16.md:
  *  - "read  <sfDir>": times repeated spark.read.parquet DataFrame
  *    construction with and without a supplied schema (the §1 schema
  *    cache's 77-vs-8 ms measurement).
  *  - "joins <sfDir>": counts join-node kinds in every batch query's
  *    pre-AQE physical plan under the engine session (extensions +
  *    full stats) — the SortMergeJoin census.
  *  - "stages <sfDir> <query> [repeats]": per-stage wall/tasks/bytes
  *    breakdown via a SparkListener, construction vs count timed
  *    separately (the §4 single-task-stage evidence).
  *  - "dump <sfDir> <tag> <q1,q2,...>": explain("formatted") per query
  *    to plans/r16/<q>_<tag>.txt, stats-loaded engine session.
  */
object OptProbe {
  def main(args: Array[String]): Unit = {
    val mode = args.headOption.getOrElse("read")
    val sfDir = if (args.length > 1) args(1) else "/root/testdata/sf0.1"
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .withExtensions(new graft.plans.GraftExtensions()(_))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    mode match {
      case "read" =>
        // warm the listing caches once
        val warm = spark.read.parquet(s"$sfDir/lineitem.parquet")
        warm.count()
        val schema = warm.schema
        def timeN(n: Int)(f: => Unit): Double = {
          val t0 = System.nanoTime(); (1 to n).foreach(_ => f)
          (System.nanoTime() - t0) / 1e9 / n
        }
        val tInfer = timeN(50)(spark.read.parquet(s"$sfDir/lineitem.parquet"))
        val tSchema = timeN(50)(
          spark.read.schema(schema).parquet(s"$sfDir/lineitem.parquet"))
        // also time the count() on a pre-built df (execution floor)
        val df = spark.read.schema(schema).parquet(s"$sfDir/lineitem.parquet")
        val tCount = timeN(10)(df.count())
        println(f"PROBE read: infer=${tInfer * 1000}%.1f ms/call  " +
          f"withSchema=${tSchema * 1000}%.1f ms/call  count=${tCount * 1000}%.1f ms")
        // how many reads does a typical pass do? count table() calls
        // indirectly: 237 queries x ~2 tables x 2 passes
      case "joins" =>
        graft.core.Catalog.statsMany(spark, sfDir,
          graft.core.Catalog.tableNames, withHistograms = true)
        Queries.stageStreamSource(spark, sfDir)
        Queries.stageDppLayout(spark, sfDir)
        val streaming = SparkEntry.streamingQueries
        val names = SparkEntry.queries.keys.toSeq.sorted
          .filterNot(streaming)
        names.foreach { n =>
          try {
            val df = SparkEntry.queries(n)(spark, sfDir)
            val plan = df.queryExecution.executedPlan.toString
            def c(s: String) = s.r.findAllIn(plan).length
            val smj = c("SortMergeJoin")
            val shj = c("ShuffledHashJoin")
            val bhj = c("BroadcastHashJoin")
            val bnl = c("BroadcastNestedLoopJoin")
            if (smj + shj > 0)
              println(s"JOINS $n smj=$smj shj=$shj bhj=$bhj bnl=$bnl")
          } catch {
            case e: Throwable => println(s"JOINS $n failed: ${e.getClass.getSimpleName}")
          }
        }
      case "stages" =>
        // stages <sfDir> <queryName> [repeats] — per-stage wall breakdown
        val qn = args(2)
        val repeats = if (args.length > 3) args(3).toInt else 2
        graft.core.Catalog.statsMany(spark, sfDir,
          graft.core.Catalog.tableNames, withHistograms = true)
        spark.sparkContext.addSparkListener(
          new org.apache.spark.scheduler.SparkListener {
            override def onStageCompleted(
                sc: org.apache.spark.scheduler.SparkListenerStageCompleted): Unit = {
              val si = sc.stageInfo
              val dur = si.completionTime.getOrElse(0L) - si.submissionTime.getOrElse(0L)
              val m = si.taskMetrics
              println(f"STAGE ${si.stageId}%4d ${dur}%6d ms tasks=${si.numTasks}%3d " +
                f"in=${m.inputMetrics.bytesRead / 1024 / 1024}%4d MB " +
                f"sr=${m.shuffleReadMetrics.totalBytesRead / 1024 / 1024}%4d MB " +
                f"sw=${m.shuffleWriteMetrics.bytesWritten / 1024 / 1024}%4d MB " +
                s"${si.name.takeWhile(_ != '\n').take(70)}")
            }
          })
        (1 to repeats).foreach { i =>
          println(s"=== RUN $i construction ===")
          val t0 = System.nanoTime()
          val df = SparkEntry.queries(qn)(spark, sfDir)
          val t1 = System.nanoTime()
          println(f"=== RUN $i construction took ${(t1 - t0) / 1e9}%.2f s; count ===")
          df.count()
          println(f"=== RUN $i count took ${(System.nanoTime() - t1) / 1e9}%.2f s ===")
        }
      case "dump" =>
        // dump <sfDir> <tag> <q1,q2,...> → plans/r16/<q>_<tag>.txt
        val tag = args(2)
        val names = args(3).split(",").toSeq
        graft.core.Catalog.statsMany(spark, sfDir,
          graft.core.Catalog.tableNames, withHistograms = true)
        new java.io.File("plans/r16").mkdirs()
        names.foreach { n =>
          try {
            val df = SparkEntry.queries(n)(spark, sfDir)
            val txt = df.queryExecution.explainString(
              org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
            java.nio.file.Files.write(
              java.nio.file.Paths.get(s"plans/r16/${n}_$tag.txt"),
              txt.getBytes("UTF-8"))
            println(s"DUMPED $n")
          } catch {
            case e: Throwable => println(s"DUMP $n failed: $e")
          }
        }
      case other => sys.error(s"unknown mode $other")
    }
    spark.stop()
  }
}
