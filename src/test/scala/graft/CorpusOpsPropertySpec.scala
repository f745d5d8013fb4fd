package graft

import graft.operators.{Dedup, TextAnalysis}
import org.scalacheck.{Gen, Prop, Properties, Test}

/** Wave-3 corpus operators fuzzed against driver-side references —
  * the same discipline GraphSpec applies to pageRank: the distributed
  * implementation must agree exactly with a transparent sequential
  * replay on randomized inputs (tiny alphabets force window/chunk
  * collisions that handcrafted cases miss).
  */
object CorpusOpsPropertySpec extends Properties("CorpusOps") {
  private lazy val spark = SharedSpark.spark

  override def overrideParameters(p: Test.Parameters): Test.Parameters =
    p.withMinSuccessfulTests(12)

  // ---------------------------------------------- repeatedWindowStats

  /** Sequential replay: stride-aligned width-w windows, distinct per
    * doc; a window is duplicated iff some OTHER doc contains it.
    */
  private def windowRef(docs: Seq[(Long, String)], w: Int, s: Int)
      : Map[Long, (Long, Long)] = {
    val wins: Map[Long, Set[String]] = docs.map { case (id, t) =>
      id -> (if (t.length < w) Set.empty[String]
             else (0 to (t.length - w) / s)
               .map(i => t.substring(s * i, s * i + w)).toSet)
    }.toMap
    docs.map { case (id, _) =>
      val mine = wins(id)
      val dup = mine.count(x =>
        wins.exists { case (o, ws) => o != id && ws.contains(x) })
      id -> (mine.size.toLong, dup.toLong)
    }.toMap
  }

  property("repeatedWindowStats matches brute force (raw and hashed)") = {
    import spark.implicits._
    val docGen = for {
      n <- Gen.choose(1, 8)
      texts <- Gen.listOfN(n, for {
        len <- Gen.choose(0, 30)
        cs <- Gen.listOfN(len, Gen.oneOf('a', 'b'))
      } yield cs.mkString)
    } yield texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
    Prop.forAllNoShrink(docGen) { docs =>
      val df = docs.toDF("id", "t")
      val want = windowRef(docs, 8, 3)
      val got = Dedup.repeatedWindowStats(df, "id", "t", width = 8, stride = 3)
        .as[(Long, Long, Long)].collect()
        .map { case (id, nw, nd) => id -> (nw, nd) }.toMap
      val gotHashed = Dedup.repeatedWindowStats(df, "id", "t", width = 8,
        stride = 3, hashWindows = true)
        .as[(Long, Long, Long)].collect()
        .map { case (id, nw, nd) => id -> (nw, nd) }.toMap
      (Prop(got == want) :| s"raw got $got want $want") &&
        (Prop(gotHashed == want) :| s"hashed got $gotHashed want $want")
    }
  }

  // --------------------------------------------------- chunkTokens

  /** Sequential replay of the chunk-count/start/length arithmetic. */
  private def chunkRef(tokens: Seq[String], size: Int, overlap: Int)
      : Seq[(Long, String, Long)] = {
    val stride = size - overlap
    val n = tokens.length
    val nc = if (n <= size) 1 else 1 + ((n - size) + stride - 1) / stride
    (0 until nc).map { i =>
      val start = stride * i
      val len = math.min(size, n - start)
      (i.toLong, tokens.slice(start, start + len).mkString(" "), len.toLong)
    }
  }

  property("chunkTokens matches the sequential chunk arithmetic") = {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 40)
      toks <- Gen.listOfN(n, Gen.oneOf("x", "yy", "z3"))
      size <- Gen.choose(2, 12)
      overlap <- Gen.choose(0, size - 1)
    } yield (toks, size, overlap)
    Prop.forAllNoShrink(gen) { case (toks, size, overlap) =>
      val df = Seq((1L, toks.mkString(" "))).toDF("id", "t")
      val got = TextAnalysis.chunkTokens(df, "id", "t", size, overlap)
        .orderBy("chunk_id")
        .as[(Long, Long, String, Long)].collect().toSeq
        .map { case (_, c, s, l) => (c, s, l) }
      val want = chunkRef(toks, size, overlap)
      (Prop(got == want) :| s"size=$size overlap=$overlap got $got want $want") &&
        // coverage invariant: concatenating chunks at stride offsets
        // reproduces every token (nothing dropped, nothing reordered)
        Prop(got.flatMap(_._2.split(" ")).toSet == toks.toSet) :| "token coverage"
    }
  }
}
