package graft

/** Local-iteration query filter shared by Bench and Verify:
  * `SPARK_GRAFT_ONLY=q62_stream_join,q64_...` restricts the run to
  * those queries (the round driver never sets it). Unknown names fail
  * fast — a typo would otherwise run an empty set and read as success.
  */
object EnvFilter {
  def only(): Option[Set[String]] = {
    val o = sys.env.get("SPARK_GRAFT_ONLY")
      .map(_.split(",").map(_.trim).filter(_.nonEmpty).toSet)
    o.foreach { names =>
      val unknown = names.diff(SparkEntry.queries.keySet)
      require(unknown.isEmpty,
        s"SPARK_GRAFT_ONLY names not in SparkEntry.queries: ${unknown.toSeq.sorted.mkString(", ")}")
    }
    o
  }
}
