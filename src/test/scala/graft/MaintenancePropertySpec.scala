package graft

import graft.operators.{Merge, TableDiff}
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Table-maintenance operators fuzzed against driver-side models —
  * the CorpusOpsPropertySpec discipline for the CDC/reconciliation
  * family: upsertLatest folded over RANDOM batch splits must reach the
  * same state as a one-shot argmax, and TableDiff must agree with a
  * transparent row-by-row comparison.
  */
object MaintenancePropertySpec extends Properties("Maintenance") {
  private lazy val spark = SharedSpark.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  property("upsertLatest over random batch splits equals the global argmax") = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val gen = for {
      n <- Gen.choose(1, 30)
      rows <- Gen.listOfN(n, for {
        k <- Gen.choose(1L, 6L)
        v <- Gen.choose(0L, 99L)
      } yield (k, v))
      cuts <- Gen.listOfN(3, Gen.choose(0, n))
    } yield (rows.zipWithIndex.map { case ((k, v), i) => (k, i.toLong, v) },
      cuts.sorted.distinct)
    Prop.forAllNoShrink(gen) { case (rows, cuts) =>
      // ord is unique per row -> the survivor per key is the max-ord row
      val want = rows.groupBy(_._1).view
        .mapValues(rs => rs.maxBy(_._2)).values.toSet
      val bounds = (0 +: cuts :+ rows.length).distinct.sorted
      val batches = bounds.zip(bounds.tail).map { case (a, b) =>
        rows.slice(a, b)
      }.filter(_.nonEmpty)
      val empty = Seq.empty[(Long, Long, Long)].toDF("k", "ord", "v")
      val got = batches.foldLeft(empty) { (st, b) =>
        // compact the batch per key first (the q148 contract: one
        // change per key per merge)
        val compacted = b.groupBy(_._1).view
          .mapValues(rs => rs.maxBy(_._2)).values.toSeq
        Merge.upsertLatest(st, compacted.toDF("k", "ord", "v"), Seq("k"),
          Seq(col("ord").desc))
      }.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      Prop(got == want) :| s"cuts=$cuts got $got want $want"
    }
  }

  property("TableDiff matches the row-by-row comparison") = {
    import spark.implicits._
    def table(g: Gen[Int]): Gen[Map[Long, (Long, String)]] = for {
      n <- g
      rows <- Gen.listOfN(n, for {
        k <- Gen.choose(1L, 12L)
        v <- Gen.choose(0L, 3L)
        s <- Gen.oneOf("m", "n", "")
      } yield k -> ((v, s)))
    } yield rows.toMap // last-wins dedup: keys unique per side
    val gen = Gen.zip(table(Gen.choose(0, 15)), table(Gen.choose(0, 15)))
    Prop.forAllNoShrink(gen) { case (ta, tb) =>
      val want = (ta.keySet ++ tb.keySet).flatMap { k =>
        (ta.get(k), tb.get(k)) match {
          case (Some(_), None) => Some(k -> "only_a")
          case (None, Some(_)) => Some(k -> "only_b")
          case (Some(a), Some(b)) if a != b => Some(k -> "changed")
          case _ => None
        }
      }.toMap
      def df(t: Map[Long, (Long, String)]) =
        t.toSeq.map { case (k, (v, s)) => (k, v, s) }.toDF("k", "v", "s")
      val got =
        if (ta.isEmpty && tb.isEmpty) Map.empty[Long, String]
        else TableDiff.diff(df(ta), df(tb), Seq("k"))
          .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
      Prop(got == want) :| s"got $got want $want"
    }
  }

  // recommendedStatePartitions: driver-side arithmetic, so fuzz the
  // whole input space — the result must be the MINIMAL partition count
  // that keeps per-store state at/below the target (the measured clean
  // band), for any keys/bytes/target/stores combination
  property("recommendedStatePartitions is the minimal clean-band provisioning") = {
    import graft.streaming.Streams
    val gen = for {
      keys <- Gen.oneOf(Gen.choose(0L, 1000L), Gen.choose(0L, 4000000000L))
      bytes <- Gen.choose(1L, 4096L)
      // the flush-onset bound is EXCLUSIVE (provisioning onto the
      // measured knee is refused), so the legal target space tops out
      // one below it
      target <- Gen.choose(1, Streams.MeasuredFlushMbPerStore - 1)
      stores <- Gen.oneOf(1, 2, 4, 8)
    } yield (keys, bytes, target, stores)
    Prop.forAllNoShrink(gen) { case (keys, bytes, target, stores) =>
      val n = Streams.recommendedStatePartitions(keys, bytes, target, stores)
      val per = target.toLong * (1L << 20) * stores
      val total = BigInt(keys) * BigInt(bytes)
      val fits = total <= BigInt(n) * per
      val minimal = n == 1 || total > BigInt(n - 1) * per
      Prop(n >= 1 && fits && minimal) :|
        s"keys=$keys bytes=$bytes target=$target stores=$stores -> n=$n"
    }
  }
}
