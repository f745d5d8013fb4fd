package graft

import graft.txn.TxnTable
import org.scalacheck.{Gen, Prop, Properties, Test}

import java.nio.file.Files

/** Randomized-tape fuzz for the transaction layer: on ANY interleaving
  * of begin/insert/commit/abort/checkpoint/crash+recover, the
  * committed-visible read must equal a driver-side model of the same
  * tape, and [[TxnTable.readAsOf]] must reproduce the model's snapshot
  * at every commit point (time travel = tape-prefix fold). Parquet
  * writes make each op expensive, so the suite runs few-but-deep
  * cases rather than ScalaCheck's default 100.
  */
object TxnPropertySpec extends Properties("TxnTape") {
  private lazy val spark = SharedSpark.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(5)

  // An op tape: per active txn decide insert/commit/abort, sprinkled
  // with checkpoints and crash+recover. Encoded as ints for shrinking.
  private sealed trait Op
  private case object Begin extends Op
  private case class Insert(slot: Int) extends Op
  private case class Commit(slot: Int) extends Op
  private case class Abort(slot: Int) extends Op
  private case object Checkpoint extends Op
  private case object CrashRecover extends Op
  // retain = 1 is the maximal compact(); higher retains keep a
  // time-travel window of that many checkpoints (round-11 knob)
  private case class Compact(retain: Int) extends Op

  private val opGen: Gen[Op] = Gen.frequency(
    3 -> Gen.const(Begin),
    4 -> Gen.choose(0, 2).map(Insert(_)),
    3 -> Gen.choose(0, 2).map(Commit(_)),
    2 -> Gen.choose(0, 2).map(Abort(_)),
    1 -> Gen.const(Checkpoint),
    1 -> Gen.const(CrashRecover),
    1 -> Gen.choose(1, 3).map(Compact(_)))

  private val tapeGen: Gen[List[Op]] = Gen.listOfN(14, opGen)

  property("read and readAsOf equal the sequential model on any tape") =
    Prop.forAll(tapeGen) { tape =>
      import spark.implicits._
      val t = new TxnTable(spark, Files.createTempDirectory("graft-txn-fuzz").toString)
      // model state
      var active = Vector.empty[Long]                 // open txns (slot-addressable)
      var pending = Map.empty[Long, Vector[Long]]     // txn -> its uncommitted values
      var committedVals = Vector.empty[Long]          // visible set, in commit order
      var snapshots = Map.empty[Long, Vector[Long]]   // txn -> visible set at its commit
      // one subsumption set per CHECKPOINT record still on the tape,
      // oldest first: compact(retain = N) takes the Nth-from-last as its
      // base — destroying exactly the base's subsumption set — and drops
      // the checkpoints before the base from the tape (so the model's
      // vector trims to the retained suffix)
      var ckptSubsumed = Vector.empty[Set[Long]]
      var compactedAway = Set.empty[Long]             // commits whose snapshot compaction destroyed
      var baseExists = false                          // a checkpoint base has been written
      var nextVal = 0L

      tape.foreach {
        case Begin =>
          val id = t.txns.startTxn()
          active :+= id
          pending += id -> Vector.empty
        case Insert(slot) if active.nonEmpty =>
          val id = active(slot % active.size)
          nextVal += 1
          t.insert(id, Seq(nextVal).toDF("value"))
          pending += id -> (pending(id) :+ nextVal)
        case Commit(slot) if active.nonEmpty =>
          val id = active(slot % active.size)
          t.txns.commitTxn(id)
          active = active.filterNot(_ == id)
          committedVals ++= pending(id)
          snapshots += id -> committedVals
        case Abort(slot) if active.nonEmpty =>
          val id = active(slot % active.size)
          t.txns.abortTxn(id)
          active = active.filterNot(_ == id)
          pending -= id
        case Checkpoint =>
          t.checkpoint()
          // checkpoint() no-ops when nothing is visible (no base yet
          // and no committed batch) — no CHECKPOINT record lands, so
          // the subsumption ledger must not advance either
          if (committedVals.nonEmpty || baseExists) {
            baseExists = true
            ckptSubsumed :+= snapshots.keySet ++ compactedAway
          }
        case CrashRecover =>
          t.crash(); t.recover()
          // open txns die with the crash; their batches stay invisible
          active = Vector.empty
        case Compact(retain) =>
          // visible reads must be unaffected; the documented loss is
          // time travel to txns resolved before the BASE checkpoint (the
          // retain-th from last); fewer checkpoints than retain = no-op
          t.compact(retainCheckpoints = retain)
          if (ckptSubsumed.size >= retain) {
            val destroyed = ckptSubsumed(ckptSubsumed.size - retain)
            compactedAway ++= destroyed
            snapshots --= destroyed
            ckptSubsumed = ckptSubsumed.takeRight(retain)
          }
        case _ => () // Insert/Commit/Abort with no active txn: no-op
      }

      def readVals(): Seq[Long] = {
        val df = t.read()
        if (df.columns.isEmpty) Seq.empty
        else df.collect().map(_.getLong(0)).toSeq.sorted
      }
      val visibleOk = readVals() == committedVals.sorted
      val asOfOk = snapshots.forall { case (txn, snap) =>
        t.readAsOf(txn).collect().map(_.getLong(0)).toSeq.sorted == snap.sorted
      }
      // compaction destroyed exactly these snapshots — by name, not
      // with a wrong answer
      val compactedOk = compactedAway.forall { txn =>
        scala.util.Try(t.readAsOf(txn)).failed.toOption
          .exists(_.getMessage.contains("no COMMIT record"))
      }
      visibleOk && asOfOk && compactedOk
    }
}
