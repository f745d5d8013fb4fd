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

  // ------------------------------------------- sortedIntersectCount

  property("sortedIntersectCount == size(array_intersect) on sorted arrays") = {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // duplicates INCLUDED (array_intersect counts distinct; the
    // two-pointer walk must dedup), empties included, tiny alphabet for
    // collisions. Longs exercise the bigint kernel; strings the UTF8
    // comparator (and string sort order = binary order, what
    // array_sort/sort_array emit).
    val gen = for {
      na <- Gen.choose(0, 12)
      nb <- Gen.choose(0, 12)
      a <- Gen.listOfN(na, Gen.choose(0L, 6L))
      b <- Gen.listOfN(nb, Gen.choose(0L, 6L))
    } yield (a, b)
    Prop.forAllNoShrink(gen) { case (a, b) =>
      val df = Seq((a, b)).toDF("a", "b")
        .select(sort_array(col("a")).as("sa"), array_sort(col("b")).as("sb"),
          sort_array(concat(col("a").cast("array<string>"), array(lit("zz"))))
            .as("ta"),
          array_sort(concat(col("b").cast("array<string>"), array(lit("zz"))))
            .as("tb"))
      val row = df.select(
        graft.functions.exprs.sortedIntersectCount(col("sa"), col("sb")),
        size(array_intersect(col("sa"), col("sb"))).cast("long"),
        graft.functions.exprs.sortedIntersectCount(col("ta"), col("tb")),
        size(array_intersect(col("ta"), col("tb"))).cast("long")).head()
      row.getLong(0) == row.getLong(1) && row.getLong(2) == row.getLong(3)
    }
  }

  property("sortedIntersectCount handles null elements like array_intersect") = {
    // null placement differs between sort_array (nulls first) and
    // array_sort (nulls last); the kernel is placement-independent
    import org.apache.spark.sql.catalyst.util.GenericArrayData
    val nullsFirst = new GenericArrayData(Array[Any](null, 1L, 3L))
    val nullsLast = new GenericArrayData(Array[Any](2L, 3L, null))
    val noNull = new GenericArrayData(Array[Any](1L, 2L, 3L))
    val empty = new GenericArrayData(Array.empty[Any])
    import graft.functions.HashImpls.sortedIntersectCountLong
    // {null,1,3} ∩ {2,3,null} = {3, null} → 2;
    // {null,1,3} ∩ {1,2,3} = {1,3} → 2 (null only on one side)
    Prop.propBoolean(
      sortedIntersectCountLong(nullsFirst, nullsLast) == 2L &&
        sortedIntersectCountLong(nullsFirst, noNull) == 2L &&
        sortedIntersectCountLong(empty, noNull) == 0L &&
        sortedIntersectCountLong(noNull, noNull) == 3L)
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

  // --------------------------------------------------- spanCorrupt

  /** Sequential replay of the (doc id, span) mix and sentinel
    * assembly.
    */
  private def spanRef(id: Long, toks: Seq[String], w: Int, m: Int)
      : (String, String, Long, Long) = {
    val h = ((id % 1000000000L) * 2654435761L) % 1000000007L
    def masked(i: Int) = ((h + i / w) * 2654435761L) % m == 0
    val in = toks.zipWithIndex.flatMap { case (t, i) =>
      if (!masked(i)) Some(t)
      else if (i % w == 0) Some(s"<extra_${i / w}>")
      else None
    }.mkString(" ")
    val tg = toks.zipWithIndex.flatMap { case (t, i) =>
      if (!masked(i)) None
      else if (i % w == 0) Some(s"<extra_${i / w}> $t")
      else Some(t)
    }.mkString(" ")
    (in, tg, toks.size.toLong, toks.indices.count(masked).toLong)
  }

  property("spanCorrupt matches the sequential replay") = {
    import spark.implicits._
    val gen = for {
      id <- Gen.choose(0L, 3000000000L)
      n <- Gen.choose(1, 40)
      toks <- Gen.listOfN(n, Gen.oneOf("a", "bb", "c1", "dd"))
      w <- Gen.choose(1, 5)
      m <- Gen.choose(2, 6)
    } yield (id, toks, w, m)
    Prop.forAllNoShrink(gen) { case (id, toks, w, m) =>
      val df = Seq((id, toks.mkString(" "))).toDF("id", "t")
      val got = TextAnalysis.spanCorrupt(df, "id", "t", w, m)
        .as[(Long, String, String, Long, Long)].collect().head
      val (in, tg, nt, nm) = spanRef(id, toks, w, m)
      Prop((got._2, got._3, got._4, got._5) == ((in, tg, nt, nm))) :|
        s"id=$id w=$w m=$m got $got want ($in, $tg, $nt, $nm)"
    }
  }

  // -------------------------------------------------- unigramDrift

  property("unigramDrift matches the exact TV formula") = {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 6)
      docs <- Gen.listOfN(n, for {
        g <- Gen.oneOf("g1", "g2", "g3")
        len <- Gen.choose(1, 10)
        ts <- Gen.listOfN(len, Gen.oneOf("a", "b", "c"))
      } yield (g, ts))
    } yield docs
    Prop.forAllNoShrink(gen) { docs =>
      val tf = docs.flatMap { case (g, ts) => ts.map(g -> _) }
        .groupBy(identity).view.mapValues(_.size.toLong).toMap
      val tAll = tf.values.sum
      val glob = tf.groupBy(_._1._2).view.mapValues(_.values.sum).toMap
      val want = docs.map(_._1).distinct.map { g =>
        val mine = tf.collect { case ((gg, t), c) if gg == g => t -> c }
        val tg = mine.values.sum
        val main = mine.map { case (t, c) =>
          math.abs(c * tAll - glob(t) * tg)
        }.sum
        // .toSeq first: mapping glob over the KEY SET would collapse
        // equal global counts before summing
        val present = mine.keys.toSeq.map(glob).sum
        g -> (main + tg * (tAll - present))
      }.toMap
      val got = graft.operators.TextAnalysis.unigramDrift(
        docs.map { case (g, ts) => (g, ts.mkString(" ")) }.toDF("src", "t"),
        "src", "t")
        .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
      Prop(got == want) :| s"got $got want $want"
    }
  }

  // ------------------------------------------------- ppsSystematic

  property("ppsSystematic matches the sequential crossing rule") = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val gen = for {
      n <- Gen.choose(1, 30)
      rows <- Gen.listOfN(n, for {
        s <- Gen.oneOf("x", "y")
        w <- Gen.choose(0L, 20L)   // zero weights AND all-zero strata legal
      } yield (s, w))
      k <- Gen.choose(1L, 8L)
    } yield (rows.zipWithIndex.map { case ((s, w), i) => (i.toLong, s, w) }, k)
    Prop.forAllNoShrink(gen) { case (rows, k) =>
      val want = rows.groupBy(_._2).flatMap { case (_, rs) =>
        val sorted = rs.sortBy(_._1)
        val tot = sorted.map(_._3).sum
        if (tot == 0) Nil
        else {
          var cum = 0L
          sorted.flatMap { case (id, _, w) =>
            val keep = (k * (cum + w)) / tot > (k * cum) / tot
            cum += w
            if (keep) Some(id) else None
          }
        }
      }.toSet
      val got = graft.operators.Sampling.ppsSystematic(
        rows.toDF("id", "s", "w"), col("w"), col("id"), k,
        stratumCols = Seq(col("s")))
        .select("id").as[Long].collect().toSet
      Prop(got == want) :| s"k=$k got $got want $want"
    }
  }

  property("ppsSystematic fails fast on a negative weight") = {
    import spark.implicits._
    import org.apache.spark.sql.functions.col
    val rows = Seq((1L, "x", 5L), (2L, "x", -1L), (3L, "x", 7L))
    val e = try {
      graft.operators.Sampling.ppsSystematic(
        rows.toDF("id", "s", "w"), col("w"), col("id"), 2L,
        stratumCols = Seq(col("s"))).count()
      null
    } catch { case t: Throwable => t }
    Prop(e != null &&
      SharedSpark.messages(e).exists(_.contains("Sampling.ppsSystematic"))) :|
      s"expected the named guard error, got $e"
  }

  // -------------------------------------------------- vocabEncode

  property("vocabEncode matches the sequential rank + encode") = {
    import spark.implicits._
    val gen = for {
      n <- Gen.choose(1, 6)
      docs <- Gen.listOfN(n, for {
        len <- Gen.choose(1, 12)
        ts <- Gen.listOfN(len, Gen.oneOf("p", "q", "r", "s"))
      } yield ts)
    } yield docs.zipWithIndex.map { case (ts, i) => (i.toLong, ts) }
    Prop.forAllNoShrink(gen) { docs =>
      val counts = docs.flatMap(_._2).groupBy(identity)
        .view.mapValues(_.size.toLong).toMap
      val rank = counts.toSeq.sortBy { case (t, c) => (-c, t) }
        .zipWithIndex.map { case ((t, _), i) => t -> i.toLong }.toMap
      val want = docs.map { case (id, ts) =>
        id -> (ts.size.toLong, ts.map(rank).mkString(" "))
      }.toMap
      val got = graft.operators.TextAnalysis.vocabEncode(
        docs.map { case (id, ts) => (id, ts.mkString(" ")) }.toDF("id", "t"),
        "id", "t")
        .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getString(2)))
        .toMap
      Prop(got == want) :| s"got $got want $want"
    }
  }

  // -------------------------------------------------- epochRepeat

  property("epochRepeat emits exactly quota appearances per stratum") = {
    import spark.implicits._
    val gen = for {
      nx <- Gen.choose(1, 40)
      ny <- Gen.choose(1, 40)
      num <- Gen.choose(1L, 4L)
      den <- Gen.choose(1L, 4L)
    } yield (nx, ny, num, den)
    Prop.forAllNoShrink(gen) { case (nx, ny, num, den) =>
      val docs = ((1 to nx).map(i => (i.toLong, "x")) ++
        (101 to 100 + ny).map(i => (i.toLong, "y"))).toDF("id", "s")
      val n = (nx + ny).toLong
      val budget = n * num / den
      val isq = Map("x" -> math.sqrt(nx.toDouble).toLong,
        "y" -> math.sqrt(ny.toDouble).toLong)
      val sumIsq = isq.values.sum
      val quota = isq.view.mapValues(budget * _ / sumIsq).toMap
      val out = graft.operators.Sampling.epochRepeat(docs, "s", "id", num, den)
        .collect().map(r => (r.getLong(0), r.getString(1), r.getLong(2)))
      val byS = out.groupBy(_._2).view.mapValues(_.length.toLong).toMap
      (Prop(Seq("x", "y").forall(s =>
        byS.getOrElse(s, 0L) == quota(s))) :| s"quota $quota got $byS") &&
        // epochs per doc are contiguous 1..e (no gaps, no dupes)
        Prop(out.groupBy(t => (t._1, t._2)).values.forall { rs =>
          rs.map(_._3).sorted.toSeq == (1L to rs.length)
        }) :| "contiguous epochs"
    }
  }
}
