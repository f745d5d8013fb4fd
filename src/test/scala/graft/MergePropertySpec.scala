package graft

import graft.operators.Merge
import org.scalacheck.{Gen, Prop, Properties}

/** Property test for [[Merge.upsert]]: on ANY snapshot and ANY valid
  * changeset (unique keys per input), the distributed one-shuffle merge
  * must equal the obvious driver-side model — apply deletes, overwrite
  * updates, add inserts.
  */
object MergePropertySpec extends Properties("Merge") {
  private lazy val spark = SharedSpark.spark

  private val keyGen = Gen.choose(0L, 30L)
  private val snapshotGen: Gen[Map[Long, String]] =
    Gen.mapOf(Gen.zip(keyGen, Gen.alphaStr.map(_.take(4))))
  private val changesGen: Gen[Map[Long, (String, String)]] =
    Gen.mapOf(Gen.zip(keyGen,
      Gen.zip(Gen.alphaStr.map(_.take(4)), Gen.oneOf("U", "I", "D"))))

  property("upsert equals the driver-side model") =
    Prop.forAll(snapshotGen, changesGen) { (snap, changes) =>
      import spark.implicits._
      val model: Map[Long, String] =
        changes.foldLeft(snap) { case (acc, (k, (v, op))) =>
          if (op == "D") acc - k else acc.updated(k, v)
        }
      val snapDf = snap.toSeq.toDF("k", "v")
      val chDf = changes.toSeq.map { case (k, (v, op)) => (k, v, op) }
        .toDF("k", "v", "op")
      val got = Merge.upsert(snapDf, chDf, Seq("k"))
        .as[(Long, String)].collect().toMap
      got == model
    }

  // Contract violations (several changes for one key) must resolve the
  // same way every run — content-hash tie-break, not partition order.
  private val dupChangesGen: Gen[List[(Long, String, String)]] =
    Gen.listOfN(40, Gen.zip(keyGen, Gen.alphaStr.map(_.take(4)),
      Gen.oneOf("U", "I", "D"))).map { l => l.map { case (k, v, op) => (k, v, op) } }

  property("duplicate-key changesets resolve deterministically") =
    Prop.forAll(snapshotGen, dupChangesGen) { (snap, dupChanges) =>
      import spark.implicits._
      val snapDf = snap.toSeq.toDF("k", "v")
      def run(parts: Int): Map[Long, String] =
        Merge.upsert(snapDf,
          dupChanges.toDF("k", "v", "op").repartition(parts), Seq("k"))
          .as[(Long, String)].collect().toMap
      run(1) == run(7)
    }
}
