package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Edit-distance similarity self-join, PassJoin-shaped (Li, Deng, Feng:
  * "PASS-JOIN: a partition-based method for similarity joins",
  * VLDB'12): partition every string into maxDist+1 segments — d edits
  * cannot touch all d+1 segments, so for any pair within distance d at
  * least one segment of one string appears VERBATIM in the other,
  * shifted by at most d. Candidates come from an equi-join on
  * (segment-owner length, segment index, substring) keys; exact
  * `levenshtein` verification runs on candidates only.
  *
  * Scale posture: blocking is a constant fan-out per row —
  * (d+1 segments) on the index side and at most
  * (2d+1 lengths)·(d+1 segments)·(2d+1 positions) probe substrings on
  * the probe side (~18× for d=1, ~45× for d=2) — then ONE equi-join
  * shuffle on segment keys; never an all-pairs comparison. The
  * position window here is the loose ±d one (the paper's multi-match
  * tightening would shave constants, not complexity). Strings shorter
  * than d+1 chars produce empty segments whose keys match broadly —
  * correct, but route very short strings through a dedicated
  * length-bucket pass if they dominate a real corpus.
  */
object FuzzyJoin {

  /** All unordered pairs of `df`'s strings within edit distance
    * `maxDist`, as (id_a, id_b, dist) with id_a < id_b. `idCol` must
    * determine `strCol` (one string per id).
    */
  def editDistanceSelfJoin(df: DataFrame, idCol: String, strCol: String,
      maxDist: Int): DataFrame = {
    require(maxDist >= 1, "maxDist must be >= 1")
    val d = maxDist
    val base = df.select(col(idCol).as("__id"), col(strCol).as("__s"),
      length(col(strCol)).as("__len"))

    // Even segment split of a length-L string: segment i of d+1 has
    // len = L/(d+1) (+1 for the first L%(d+1) segments) and start =
    // i*(L/(d+1)) + min(i, L%(d+1)) — all derivable per row.
    def segLen(l: Column, i: Column): Column =
      (l / (d + 1)).cast("int") + when(i < l % (d + 1), 1).otherwise(0)
    def segStart(l: Column, i: Column): Column =
      (i * (l / (d + 1)).cast("int") + least(i, l % (d + 1))).cast("int")

    val segIdx = explode(array((0 to d).map(lit): _*)).as("__i")
    val indexSide = base
      .select(col("__id"), col("__s"), col("__len"), segIdx)
      .select(col("__id").as("id_i"),
        col("__len").as("len_i"), col("__i"),
        col("__s").substr(segStart(col("__len"), col("__i")) + 1,
          segLen(col("__len"), col("__i"))).as("__seg"))

    // Probe side: for every owner length L' within ±d of this string's
    // length, try every segment's substring at every start within ±d
    // of the segment's home position (clamped to the string). The lower
    // bound is 0, not 1: a length-0 owner is legal (two empty strings
    // are at distance 0), and a floor of 1 silently dropped exactly the
    // empty-empty pairs.
    val lenIdx = explode(sequence(greatest(col("__len") - d, lit(0)),
      col("__len") + d)).as("__lp")
    val probes = base
      .select(col("__id"), col("__s"), col("__len"), lenIdx)
      .select(col("__id"), col("__s"), col("__len"), col("__lp"), segIdx)
      .withColumn("__sl", segLen(col("__lp"), col("__i")))
      .withColumn("__home", segStart(col("__lp"), col("__i")))
      .withColumn("__lo", greatest(col("__home") - d, lit(0)))
      .withColumn("__hi", least(col("__home") + d, col("__len") - col("__sl")))
      .where(col("__hi") >= col("__lo"))
      .select(col("__id"), col("__s"), col("__lp"), col("__i"), col("__sl"),
        explode(sequence(col("__lo"), col("__hi"))).as("__p"))
      .select(col("__id").as("id_p"), col("__s").as("s_p"),
        col("__lp").as("len_i"), col("__i"),
        col("s_p").substr(col("__p") + 1, col("__sl")).as("__seg"))

    val strOf = base.select(col("__id"), col("__s"))
    indexSide.join(probes, Seq("len_i", "__i", "__seg"))
      .where(col("id_i") =!= col("id_p"))
      .select(least(col("id_i"), col("id_p")).as("id_a"),
        greatest(col("id_i"), col("id_p")).as("id_b"))
      .distinct()
      .join(strOf.select(col("__id").as("id_a"), col("__s").as("__sa")), "id_a")
      .join(strOf.select(col("__id").as("id_b"), col("__s").as("__sb")), "id_b")
      .withColumn("dist", levenshtein(col("__sa"), col("__sb")).cast("long"))
      .where(col("dist") <= d)
      .select("id_a", "id_b", "dist")
  }
}
