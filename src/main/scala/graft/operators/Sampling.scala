package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Deterministic sampling/splitting for training-data pipelines. Unlike
  * `df.sample` (seeded per-partition RNG — results change under
  * repartitioning), these are pure functions of row CONTENT: the same
  * row lands in the same split on any cluster layout, any run, any
  * engine — the property that makes 100 TB train/val/test splits
  * reproducible and join-stable across pipeline stages.
  */
object Sampling {

  private val Buckets = 10000

  /** Stable bucket in [0, 10000) from the id column. */
  def bucket(idCol: Column): Column = pmod(xxhash64(idCol), lit(Buckets))

  /** The q82 multiplicative id mix — the cross-engine-deterministic
    * pseudo-random order key: (id mod 1e9) * 2654435761 mod `modulus`.
    * ONE definition on purpose: several operators and queries share
    * this contract and external replayers reproduce it literally in
    * SQL, so the two magic constants must stay bit-identical at every
    * site (overflow headroom: (1e9-1) * 2654435761 < 2^62).
    */
  def idMix(id: Column, modulus: Long = 1000000007L): Column =
    pmod((id % lit(1000000000L)) * lit(2654435761L), lit(modulus))

  // The quota maps these samplers collect to the driver are STRING-keyed
  // (r.getString on the stratum value, string literals in the keep
  // predicates): a non-string stratum column would die with a bare
  // ClassCastException on the driver — name the restriction instead.
  private def requireStringStratum(df: DataFrame, stratumCol: String,
      site: String): Unit = {
    val dt = df.schema(stratumCol).dataType
    require(dt == org.apache.spark.sql.types.StringType,
      s"Sampling.$site: stratum column '$stratumCol' must be STRING " +
        s"(driver-side quota maps are string-keyed), got ${dt.simpleString}" +
        " - cast it first")
  }

  /** Add a `split` column ("train" / "val" / ...) with the given
    * fractional weights (must sum to <= 1; remainder goes to the last
    * split).
    */
  def hashSplit(df: DataFrame, idCol: String,
      splits: Seq[(String, Double)]): DataFrame = {
    require(splits.nonEmpty && splits.map(_._2).sum <= 1.0 + 1e-9)
    // a NEGATIVE weight passes the sum check but makes the cumulative
    // bounds non-monotonic: the when-chain then silently assigns that
    // split ZERO rows and hands its range to a neighbor — same guard
    // stratifiedSample applies to its fractions
    require(splits.forall(_._2 >= 0),
      s"hashSplit weights must be >= 0, got ${splits.filter(_._2 < 0)}")
    // output-name collision fails by name (the Packing shard_id /
    // Merge opCol discipline): withColumn would silently OVERWRITE a
    // caller's existing split assignments with the new ones
    require(!df.columns.contains("split"),
      "hashSplit: input already has a 'split' column — rename it first")
    val b = bucket(col(idCol))
    val bounds = splits.scanLeft(0.0)(_ + _._2).tail.map(f => (f * Buckets).toLong)
    val expr = splits.zip(bounds).init.foldRight(lit(splits.last._1): Column) {
      case (((name, _), hi), els) => when(b < hi, lit(name)).otherwise(els)
    }
    df.withColumn("split", expr)
  }

  /** Deterministic fraction-sample: keeps rows whose id-hash bucket
    * falls below `fraction` — stable across runs and layouts.
    */
  def deterministicSample(df: DataFrame, idCol: String, fraction: Double): DataFrame =
    df.where(bucket(col(idCol)) < (fraction * Buckets).toLong)

  /** Per-stratum deterministic sampling (e.g. rebalance a corpus by
    * language): keep rows whose bucket falls below the stratum's
    * fraction; strata without an entry are dropped. Pure row-content
    * predicate — no shuffle, no RNG, scan-speed at any scale.
    *
    * `bucketOf` defaults to the xxhash64 bucket; pass an explicit
    * column (e.g. a multiplicative id mix) when the downstream system
    * must reproduce the assignment in another engine.
    */
  def stratifiedSample(df: DataFrame, stratumCol: String,
      fractions: Map[String, Double],
      bucketOf: Option[Column] = None, idCol: String = "id"): DataFrame = {
    require(fractions.nonEmpty && fractions.values.forall(f => f >= 0 && f <= 1))
    val b = bucketOf.getOrElse(bucket(col(idCol)))
    val threshold = fractions.foldLeft(lit(-1L): Column) {
      case (els, (stratum, f)) =>
        when(col(stratumCol) === stratum, lit((f * Buckets).toLong)).otherwise(els)
    }
    df.where(b < threshold)
  }

  /** Exactly-k-per-stratum deterministic sample (e.g. a balanced eval
    * set: 20 docs per language): rows ranked inside each stratum by
    * (bucket, id) — a pure content order, so the same k rows win on any
    * layout, any run, any engine. Delegates to the TopKPerGroup
    * physical operator: per-partition bounded heaps of size k, merged
    * on the stratum shuffle — never a full per-stratum sort. Fractional
    * sampling can't give exact counts; this is the exact-k complement
    * of [[stratifiedSample]].
    */
  def exactKPerStratum(df: DataFrame, stratumCol: String, idCol: String,
      k: Int, bucketOf: Column): DataFrame = {
    require(!df.columns.contains("__b"), "input already has a __b column")
    graft.plans.TopK.perGroup(df.withColumn("__b", bucketOf),
      Seq(stratumCol), Seq("__b" -> true, idCol -> true), k)
      .drop("__b")
  }

  /** Mixture resampling: downsample over-represented strata so the KEPT
    * corpus's token mass approaches the target integer weights (the
    * "data mixture" step of a pretraining pipeline — e.g. en:de:zh =
    * 6:3:1 regardless of crawl proportions). No stratum is upsampled:
    * the binding stratum s* = argmin(tokens_s / weight_s) is kept
    * whole and every other stratum keeps rate_s = (w_s·T_s*)/(w_s*·T_s)
    * of its tokens. Strata without a weight are dropped.
    *
    * Determinism: the keep predicate is exact integer arithmetic on the
    * caller's bucket column — bucket·w_s*·T_s < M·w_s·T_s* for a bucket
    * uniform on [0, M) (cross-multiplied rationals, no float
    * thresholds), reproducible in any engine. `bucketModulus` MUST be
    * the modulus of `bucketOf` — a mismatched modulus silently skews
    * every rate. Caller must keep M·max(w)·max(T) < 2^63 — at 10^4·10^3
    * that allows ~9·10^11 tokens per stratum; renormalize weights or
    * widen to decimal beyond that.
    *
    * Scale shape: one small agg (rows = #strata) collected to the
    * driver, then a scan-speed literal predicate — the totals are the
    * only coordination, there is no shuffle of the corpus itself.
    */
  def mixtureSample(df: DataFrame, stratumCol: String, tokensCol: Column,
      weights: Seq[(String, Long)], bucketOf: Column,
      bucketModulus: Long = Buckets.toLong): DataFrame = {
    require(weights.nonEmpty && weights.forall(_._2 > 0),
      "weights must be positive")
    requireStringStratum(df, stratumCol, "mixtureSample")
    require(bucketModulus > 0, "bucketModulus must be positive")
    val w = weights.toMap
    val totals = df
      .where(col(stratumCol).isin(weights.map(_._1): _*))
      .groupBy(col(stratumCol).as("__s"))
      // negative token counts corrupt every stratum's rate silently (one
      // -1e12 row can push a stratum's total <= 0 and drop the WHOLE
      // stratum from the mixture); fail per row by name, folded into the
      // summed expression so no rewrite drops it — the ppsSystematic /
      // shardByTokenBudget discipline
      .agg(coalesce(sum(
        when(tokensCol.cast("long") < 0, raise_error(concat(
          lit("mixtureSample: negative token count "),
          tokensCol.cast("string"))))
          .otherwise(tokensCol.cast("long"))), lit(0L)).as("__t"))
      .collect()
      .map(r => r.getString(0) -> r.getLong(1))
      .toMap
      // a stratum with zero/all-null tokens has no defined rate and
      // would otherwise become the binding stratum with T*=0 (keeping
      // nothing anywhere); it contributes no tokens, so drop it
      .filter(_._2 > 0L)
    require(totals.nonEmpty, "no tokens in any weighted stratum")
    // Binding stratum: smallest tokens/weight ratio (IEEE-double compare
    // with name tie-break — mirrors the SQL `ORDER BY t/w, s LIMIT 1`
    // an external replayer would write).
    val (sStar, tStar) = totals.minBy { case (s, t) =>
      (t.toDouble / w(s), s)
    }
    val wStar = w(sStar)
    // Exact integer cross-multiplication in decimal(38,0): the long form
    // bucket*wStar*t overflows INT64 once a stratum holds > ~2^63/(10^4·w)
    // ≈ 1e14 tokens — inside 100 TB corpus range. wStar·t and the whole
    // RHS are driver-side constants, so the per-row cost is ONE decimal
    // multiply + compare at scan speed (values ≤ ~1e24 ≪ 10^38).
    val keep = totals.foldLeft(lit(false): Column) {
      case (els, (s, t)) =>
        val lhsFactor = new java.math.BigDecimal((BigInt(wStar) * BigInt(t)).bigInteger)
        val rhs = new java.math.BigDecimal(
          (BigInt(bucketModulus) * BigInt(w(s)) * BigInt(tStar)).bigInteger)
        when(col(stratumCol) === s,
          bucketOf.cast("decimal(38,0)") * lit(lhsFactor) < lit(rhs))
          .otherwise(els)
    }
    df.where(keep)
  }

  /** Shared √count quota scaffolding for [[temperatureSample]] and
    * [[epochRepeat]]: per-stratum row counts (driver-sized — one entry
    * per stratum, never per row), budget = budgetOf(N), and
    * quota_s = (budget · floor(√c_s)) div Σ floor(√c) — floor of IEEE
    * sqrt is bit-identical in any engine for c < 2^52. Returns
    * (counts, quotas), both keyed by stratum.
    */
  private def sqrtQuotas(df: DataFrame, stratumCol: String, opName: String,
      budgetOf: Long => Long): (Map[String, Long], Map[String, Long]) = {
    requireStringStratum(df, stratumCol, opName)
    // a NULL stratum can never match the string-keyed keep predicates
    // downstream (col === null is never true), so counting its rows here
    // inflated the budget and the Σ√c denominator while its quota share
    // could never be emitted — every REAL stratum's output silently
    // shrank. Exclude null-stratum rows from the quota arithmetic
    // entirely: they participate in nothing, the SQL-null posture every
    // other stratified operator takes.
    val counts = df.where(col(stratumCol).isNotNull)
      .groupBy(col(stratumCol)).agg(count(lit(1)).as("__c"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    require(counts.nonEmpty, "empty input")
    val budget = budgetOf(counts.values.sum)
    val isq = counts.map { case (s, c) => s -> math.sqrt(c.toDouble).toLong }
    val sumIsq = isq.values.sum
    require(sumIsq > 0, "all strata empty")
    (counts, isq.map { case (s, q) => s -> budget * q / sumIsq })
  }

  /** Temperature-rebalanced multilingual sampling (α = 0.5, the
    * XLM-R / UniMax quota shape): stratum quotas proportional to
    * √count instead of count, so low-resource strata keep a larger
    * share of the budget than their raw frequency while high-resource
    * strata are flattened. All-integer quota arithmetic:
    * isq_s = floor(√c_s) (IEEE sqrt is correctly rounded, so floor of
    * it is bit-identical in any engine for c < 2^52), budget = N div
    * budgetDiv, quota_s = (budget · isq_s) div Σ isq.
    *
    * Selection inside each stratum is by the q82 multiplicative id mix
    * (content order — same rows win on any layout, any engine). Scale
    * shape: the stratum counts (rows = #strata) are the only driver
    * coordination, the per-stratum pre-cut runs through the
    * TopKPerGroup physical operator (bounded heaps, never a full
    * stratum sort), and the exact-rank window that applies per-stratum
    * quotas only ever sees ≤ maxQuota rows per stratum — budget-sized
    * data, not corpus-sized.
    *
    * Returns (idCol, stratumCol, samp_rank), samp_rank ≤ quota_s.
    */
  def temperatureSample(df: DataFrame, stratumCol: String, idCol: String,
      budgetDiv: Long = 10L): DataFrame = {
    require(budgetDiv > 0, "budgetDiv must be positive")
    val (_, quotas) =
      sqrtQuotas(df, stratumCol, "temperatureSample", _ / budgetDiv)
    val kMax = quotas.values.max
    require(kMax > 0,
      s"budget (rows div $budgetDiv) too small for any quota: raise it or cut strata")
    // .toInt below would silently WRAP a >2^31 quota into a small heap
    require(kMax <= Int.MaxValue,
      s"per-stratum quota $kMax exceeds the bounded-heap Int range")
    val mix = idMix(col(idCol))
    val preCut = graft.plans.TopK.perGroup(
      df.select(col(idCol), col(stratumCol)).withColumn("__b", mix),
      Seq(stratumCol), Seq("__b" -> true, idCol -> true), kMax.toInt)
    val quotaCol = quotas.foldLeft(lit(0L)) { case (els, (s, q)) =>
      when(col(stratumCol) === s, lit(q)).otherwise(els)
    }
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol)).orderBy(col("__b").asc, col(idCol).asc)
    preCut
      .withColumn("__rk", row_number().over(w))
      .where(col("__rk") <= quotaCol)
      .select(col(idCol), col(stratumCol),
        col("__rk").cast("long").as("samp_rank"))
  }

  /** Epoch repetition (the UniMax upsampling leg, generalizing
    * [[temperatureSample]]): √count quotas over a budget that may
    * EXCEED the corpus, so low-resource strata repeat — every doc of a
    * stratum appears `quota div n` times and the first `quota mod n`
    * docs (by the q82 mix rank) once more, so each stratum emits
    * EXACTLY quota rows. With quota < n this degenerates to
    * temperatureSample's subset at epoch 1; with quota > n a stratum's
    * docs carry epochs 1..r(+1) — the "repeat low-resource data ~r
    * times" curriculum, with the repeat factor derived, not guessed.
    *
    * Budget = N·budgetNum div budgetDen. Scale note: the remainder
    * rank runs in a per-stratum window (the q140 posture — strata
    * bound the partitions); the repetition itself is a map-side
    * sequence explode, no shuffle.
    *
    * Returns (idCol, stratumCol, epoch), epoch ≥ 1.
    */
  def epochRepeat(df: DataFrame, stratumCol: String, idCol: String,
      budgetNum: Long, budgetDen: Long): DataFrame = {
    require(budgetNum > 0 && budgetDen > 0, "budget fraction must be positive")
    val (counts, quotas) =
      sqrtQuotas(df, stratumCol, "epochRepeat", n => n * budgetNum / budgetDen)
    def perStratum(f: String => Long): Column =
      counts.keys.foldLeft(lit(0L)) { (els, s) =>
        when(col(stratumCol) === s, lit(f(s))).otherwise(els)
      }
    val mix = idMix(col(idCol))
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col(stratumCol)).orderBy(mix.asc, col(idCol).asc)
    df.select(col(idCol), col(stratumCol))
      .withColumn("__rk", row_number().over(w))
      .withColumn("__eps",
        perStratum(s => quotas(s) / counts(s)) +
          when(col("__rk") <= perStratum(s => quotas(s) % counts(s)), 1L)
            .otherwise(0L))
      .where(col("__eps") >= 1)
      .select(col(idCol), col(stratumCol),
        explode(expr("sequence(1L, __eps)")).as("epoch"))
  }

  /** Systematic probability-proportional-to-size (PPS) sampling: lay
    * the rows out on a weight line in `orderCol` order (exclusive
    * prefix sums), then keep every row whose weight interval
    * [cum, cum + w) crosses a multiple of total/k — the classic
    * systematic PPS design, made deterministic by replacing the random
    * start with 0 and EXACT by cross-multiplication
    * (floor(k·(cum+w)/total) > floor(k·cum/total), all-nonnegative
    * `div` arithmetic both engines agree on). Telescoping gives exactly
    * k boundary crossings per stratum, so the sample size is ≤ k with
    * equality unless a single row's weight spans multiple boundaries
    * (its selection "probability" saturates — standard PPS behavior);
    * zero-weight rows are never selected. Weights must be NONNEGATIVE —
    * a negative weight walks the prefix-sum line BACKWARD and silently
    * corrupts every later row's interval, so the operator fails fast on
    * one (null weights contribute nothing and are never selected, like
    * zero). Determinism also needs `orderCol` to totally order rows
    * within a stratum (include a unique id) — ties leave the prefix
    * sums to partition-arrival luck.
    *
    * One window shuffle per stratum (the [[graft.operators.Packing]]
    * running-sum shape; strata bound the partitions at scale — for one
    * global sequence use the Packing distributed-prefix-sum form).
    * Overflow envelope: k·total < 2^63 (SCALE.md) — at k 10^3 and
    * 10^13 total tokens that is 10^16 ≪ 9.2·10^18.
    */
  def ppsSystematic(df: DataFrame, weightCol: Column, orderCol: Column,
      k: Long, stratumCols: Seq[Column] = Seq.empty): DataFrame = {
    require(k > 0, "sample size k must be positive")
    // fail fast instead of silently clobbering caller data named like
    // the bookkeeping (the Merge.upsert / Packing.guardBookkeeping
    // discipline): withColumn would replace an existing __cum and the
    // trailing drop would delete the caller's column from the result
    Seq("__w", "__cum", "__tot").foreach { c =>
      require(!df.columns.contains(c),
        s"input column '$c' collides with ppsSystematic bookkeeping")
    }
    val w0 = if (stratumCols.isEmpty)
      org.apache.spark.sql.expressions.Window.partitionBy()
    else org.apache.spark.sql.expressions.Window.partitionBy(stratumCols: _*)
    val cumW = w0.orderBy(orderCol)
      .rowsBetween(org.apache.spark.sql.expressions.Window.unboundedPreceding, -1)
    val totW = w0.rowsBetween(
      org.apache.spark.sql.expressions.Window.unboundedPreceding,
      org.apache.spark.sql.expressions.Window.unboundedFollowing)
    // the guard rides inside __w so no plan rewrite can drop it
    df.withColumn("__w", when(weightCol.cast("long") < 0,
        raise_error(concat(
          lit("Sampling.ppsSystematic: negative weight "),
          weightCol.cast("string"),
          lit(" corrupts the prefix-sum line - filter or clamp first")))
          .cast("long"))
      .otherwise(weightCol.cast("long")))
      .withColumn("__cum", coalesce(sum(col("__w")).over(cumW), lit(0L)))
      .withColumn("__tot", sum(col("__w")).over(totW))
      // nullif: an ALL-zero-weight stratum has __tot = 0, and a raw
      // `div 0` throws under ANSI mode — null makes the keep predicate
      // null, which `where` drops (selecting nothing from a weightless
      // stratum, the right answer)
      .where(expr(s"(${k}L * (__cum + __w)) div nullif(__tot, 0L) > " +
        s"(${k}L * __cum) div nullif(__tot, 0L)"))
      .drop("__w", "__cum", "__tot")
  }
}
