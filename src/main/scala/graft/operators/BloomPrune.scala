package graft.operators

import graft.functions.exprs

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Bloom semi-join reduction: probe the fact table against a Bloom
  * filter of the (filtered) dimension's join keys BEFORE the shuffle
  * join, so non-matching fact rows die at scan speed instead of being
  * shuffled.
  *
  * When it pays at 100 TB: the dim's key set is too big to broadcast as
  * a hash relation (Spark would shuffle both sides), but its Bloom
  * filter — ~7.2 bits/key at 1% fpp, 10-20× smaller than the keys —
  * still fits. A 10⁹-key dim is a ~1 GB filter pruning a multi-TB fact
  * shuffle down to (matching + fpp) rows. Spark's AQE injects this
  * automatically in some shapes (`runtimeFilter.bloomFilter`); this is
  * the explicit form with caller-controlled fpp/size, usable in any
  * plan position and across query boundaries (build once, prune many).
  *
  * False positives survive the prune, so ALWAYS follow with the exact
  * join — [[reducedJoin]] does, making the result provably identical to
  * the plain join (no false negatives: Bloom guarantees).
  */
object BloomPrune {

  /** Serialized Bloom filter of `keyCol` (long) over `dim` — one
    * distributed aggregation; the bytes live on the driver, sized by
    * `expectedItems`/`fpp`, and ship to probe tasks with the expression.
    */
  def buildFilter(dim: DataFrame, keyCol: Column,
      expectedItems: Long, fpp: Double = 0.01): Array[Byte] = {
    requireIntegralKey(dim, keyCol, "buildFilter")
    // Spark's bloomFilter aggregation over ZERO non-null keys returns a
    // filter whose bit buffer was never allocated — serialization NPEs.
    // An empty key set means "matches nothing", which a fresh
    // zero-insertion filter encodes correctly (all bits clear ->
    // mightContain is always false); the detection is a limit-1 scan.
    val bf =
      if (dim.select(keyCol).where(keyCol.isNotNull).isEmpty)
        org.apache.spark.util.sketch.BloomFilter.create(
          math.max(expectedItems, 1L), fpp)
      else dim.stat.bloomFilter(keyCol, expectedItems, fpp)
    val out = new java.io.ByteArrayOutputStream()
    bf.writeTo(out)
    out.toByteArray
  }

  /** `fact` with rows whose key cannot be in the filter removed — a
    * scan-speed codegen'd predicate, zero shuffle.
    */
  def prune(fact: DataFrame, keyCol: Column, filterBytes: Array[Byte]): DataFrame = {
    requireIntegralKey(fact, keyCol, "prune")
    fact.where(exprs.bloomMightContain(keyCol.cast("long"), filterBytes))
  }

  // The build inserts the key in its NATIVE type while the probe hashes
  // LONGS (BloomMightContain only calls mightContainLong): a string key
  // would be inserted as UTF-8 bytes but probed as cast-to-long (null
  // for non-numeric strings), producing SILENT FALSE NEGATIVES — the
  // exact contract violation the "no false negatives" guarantee above
  // forbids. Integral keys are safe (Spark's bloomFilter puts them as
  // longs, matching the widening cast). Fail fast on anything else.
  private def requireIntegralKey(df: DataFrame, keyCol: Column, site: String): Unit = {
    import org.apache.spark.sql.types.{ByteType, IntegerType, LongType, ShortType}
    val dt = df.select(keyCol).schema.head.dataType
    require(Seq(ByteType, ShortType, IntegerType, LongType).contains(dt),
      s"BloomPrune.$site: key must be an integral type — the probe hashes " +
        s"longs, and a ${dt.simpleString} key would silently produce false " +
        "negatives; hash or cast the key to long on BOTH sides first")
  }

  /** Inner equi-join with the fact side Bloom-pruned first; result is
    * identical to `fact.join(dim, keys)` — the final exact join removes
    * the filter's false positives.
    */
  def reducedJoin(fact: DataFrame, dim: DataFrame, factKey: String,
      dimKey: String, expectedItems: Long, fpp: Double = 0.01): DataFrame = {
    val bytes = buildFilter(dim, col(dimKey), expectedItems, fpp)
    val pruned = prune(fact, col(factKey), bytes)
    if (factKey == dimKey)
      // Seq-of-names form coalesces the shared key into ONE column —
      // matching fact.join(dim, Seq(key)) exactly; an expression join
      // here would keep both copies and make any later name-based
      // reference to the key AMBIGUOUS_REFERENCE
      pruned.join(dim, Seq(factKey))
    else
      // dataframe-qualified keys: distinct names can't collide, but
      // unqualified col(...) would still be ambiguous if fact happens
      // to also carry a column named dimKey
      pruned.join(dim, pruned(factKey) === dim(dimKey))
  }
}
