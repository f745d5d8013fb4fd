package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression, XxHash64Function}
import org.apache.spark.sql.catalyst.util.{ArrayData, GenericArrayData}
import org.apache.spark.sql.GraftSqlBridge
import org.apache.spark.sql.types._
import org.apache.spark.unsafe.types.UTF8String

/** Native Catalyst expressions for the hot per-row loops of the dedup /
  * similarity operators. Spark's higher-order functions (`transform` /
  * `aggregate` / `zip_with`) are evaluated interpreted — an expression
  * tree walk per array element — which made the minhash/simhash
  * signatures the bench bottleneck. These expressions run the loop in
  * compiled JVM code and participate in whole-stage codegen via
  * `doGenCode` (one static call per row; parent operators stay fused).
  *
  * Semantics identical to the HOF formulations they replace (same
  * xxhash64 seed 42, same modulus arithmetic), so operator outputs are
  * unchanged.
  */
object HashImpls {
  /** xxhash64(utf8) mod p, non-negative — matches
    * `pmod(xxhash64(s), lit(p))`.
    */
  @inline private def hashMod(s: UTF8String, p: Long): Long = {
    val h = XxHash64Function.hash(s, StringType, 42L) % p
    if (h < 0) h + p else h
  }

  /** One pass over the shingle array; for each permutation i keep
    * min((a_i * h + b_i) mod p). coeffs packs (a_0, b_0, a_1, b_1, ...).
    * A NULL element contributes NOTHING — the HOF form this replaces
    * maps null through `pmod(xxhash64(s), p)` to null and `array_min`
    * ignores nulls; hashing the null slot instead (Spark's hash of a
    * null value is the SEED, 42) would make every null a phantom shared
    * shingle across all documents.
    */
  def minHashSig(shingles: ArrayData, coeffs: Array[Long], p: Long): ArrayData = {
    val k = coeffs.length / 2
    val sig = Array.fill(k)(Long.MaxValue)
    val n = shingles.numElements()
    var i = 0
    while (i < n) {
      if (!shingles.isNullAt(i)) {
        val h = hashMod(shingles.getUTF8String(i), p)
        var j = 0
        while (j < k) {
          val v = (coeffs(2 * j) * h + coeffs(2 * j + 1)) % p
          if (v < sig(j)) sig(j) = v
          j += 1
        }
      }
      i += 1
    }
    new GenericArrayData(sig)
  }

  /** LSH band keys from a minhash signature: one 64-bit mixed key per
    * band of `len/bands` consecutive signature values. Replaces the
    * `xxhash64(concat_ws(",", slice(sig, ...)))` formulation, which
    * rendered every signature long to a STRING per band before hashing
    * — this mixes the raw longs (xor-multiply-shift avalanche, band
    * index as the seed). Any deterministic key preserves LSH semantics:
    * equal bands always collide; unequal bands colliding merely adds a
    * candidate pair the verification stage re-checks.
    */
  def minHashBandKeys(sig: ArrayData, bands: Int): ArrayData = {
    val k = sig.numElements()
    // Dedup's operator path guards numHashes % bands == 0, but the
    // expression is public API (exprs.minhashBandKeys) reachable with
    // arbitrary arrays: bands > k would make rows = 0 so EVERY document
    // emits the same constant band keys — bandedCandidates then
    // degenerates to an O(n²) single-bucket self-join. The signature-
    // length half is data-dependent and so must stay per-row; bands > 0
    // is constructor-knowable and checked there.
    require(k >= bands && k % bands == 0,
      s"bands ($bands) must be a positive divisor of the signature length ($k)")
    val rows = k / bands
    val out = new Array[Long](bands)
    var b = 0
    while (b < bands) {
      var acc = 0x9E3779B97F4A7C15L * (b + 1)
      var j = b * rows
      val end = j + rows
      while (j < end) {
        // a NULL signature slot is a contract violation (signatures are
        // machine-produced, containsNull = false) — getLong on a null
        // slot would silently read 0 into the band key
        require(!sig.isNullAt(j), s"minhash signature contains NULL at $j")
        acc = (acc ^ sig.getLong(j)) * 0xC2B2AE3D27D4EB4FL
        acc ^= (acc >>> 29)
        j += 1
      }
      out(b) = acc
      b += 1
    }
    new GenericArrayData(out)
  }

  /** 64-bit SimHash over the token array: bit j of the result is set iff
    * the count of tokens whose xxhash64 has bit j set exceeds half.
    * A NULL token casts no votes (same skip rationale as [[minHashSig]]
    * — hashing it would vote the constant seed's bit pattern).
    */
  def simHash64(tokens: ArrayData): Long = {
    val counters = new Array[Int](64)
    val n = tokens.numElements()
    var i = 0
    while (i < n) {
      if (!tokens.isNullAt(i)) {
        val h = XxHash64Function.hash(tokens.getUTF8String(i), StringType, 42L)
        var j = 0
        while (j < 64) {
          if (((h >>> j) & 1L) == 1L) counters(j) += 1 else counters(j) -= 1
          j += 1
        }
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 64) { if (counters(j) > 0) sig |= (1L << j); j += 1 }
    sig
  }

  /** Distinct word w-shingles, first-occurrence order (array_distinct
    * semantics). Space split matches `split(text, " ")` (regex, limit -1).
    */
  def wordShingles(text: UTF8String, w: Int): ArrayData = {
    val toks = text.toString.split(" ", -1)
    if (toks.length < w) {
      new GenericArrayData(Array[Any](text.copy()))
    } else {
      val seen = new java.util.LinkedHashSet[String]()
      var i = 0
      while (i <= toks.length - w) {
        val sb = new java.lang.StringBuilder(toks(i))
        var j = 1
        while (j < w) { sb.append(' ').append(toks(i + j)); j += 1 }
        seen.add(sb.toString)
        i += 1
      }
      val out = new Array[Any](seen.size)
      val it = seen.iterator()
      var k = 0
      while (it.hasNext) { out(k) = UTF8String.fromString(it.next()); k += 1 }
      new GenericArrayData(out)
    }
  }

  /** Rolling polynomial hash over the code points of a string:
    * acc = (acc*31 + cp) mod m, left to right. Identical semantics to
    * the HOF formulation `aggregate(filter(split(text, "")), ...)` with
    * per-step pmod — FOR WELL-FORMED UTF-8: Java's empty-regex split
    * yields one string per code point (never splitting surrogate pairs)
    * and Spark's `ascii` returns the code point, so iterating
    * codePointAt matches exactly; acc stays in [0, m) and
    * acc*31 + cp < 2^63, so plain % suffices. On INVALID UTF-8 (a
    * malformed lead/continuation sequence — parquet-sourced UTF8Strings
    * should never contain one) this loop hashes the raw lead byte and
    * advances 1, where the String-decoding HOF form would hash U+FFFD
    * replacement characters — a deliberate divergence on inputs outside
    * the format's contract, pinned by the parity test on well-formed
    * ASCII/CJK/astral/empty inputs.
    */
  /** Decode the code point starting at byte `i` of `text` (`n` =
    * numBytes), with the malformed-byte fallback both fingerprint loops
    * share: a malformed lead/truncated tail hashes the raw lead byte
    * and advances 1. Returns (codePoint << 32) | nextIndex packed in one
    * long — zero allocation, one static call, so the hot codegen'd
    * loops keep their profile. ONE copy of the trickiest logic in this
    * file: the two fingerprint expressions used to carry verbatim
    * duplicates of this loop body (the round-8 verdict's accepted
    * duplication, folded now that both call sites are being touched).
    */
  @inline private def nextCp(text: UTF8String, i: Int, n: Int): Long = {
    val b0 = text.getByte(i) & 0xFF
    val len = UTF8String.numBytesForFirstByte(text.getByte(i))
    if (len == 1 || i + len > n) (b0.toLong << 32) | (i + 1)
    else {
      val cp =
        if (len == 2)
          ((b0 & 0x1F) << 6) | (text.getByte(i + 1) & 0x3F)
        else if (len == 3)
          ((b0 & 0x0F) << 12) | ((text.getByte(i + 1) & 0x3F) << 6) |
            (text.getByte(i + 2) & 0x3F)
        else
          ((b0 & 0x07) << 18) | ((text.getByte(i + 1) & 0x3F) << 12) |
            ((text.getByte(i + 2) & 0x3F) << 6) | (text.getByte(i + 3) & 0x3F)
      (cp.toLong << 32) | (i + len)
    }
  }

  def rollingFingerprint(text: UTF8String, mod: Long): Long = {
    // decode code points straight off the UTF-8 bytes — text.toString
    // would copy the whole document to UTF-16 per row, the exact
    // per-row allocation this expression exists to avoid
    val n = text.numBytes
    var acc = 0L
    var i = 0
    while (i < n) {
      val packed = nextCp(text, i, n)
      acc = (acc * 31L + (packed >>> 32)) % mod
      i = packed.toInt
    }
    acc
  }

  /** Winnowing window minima (SIGMOD'03) in ONE pass over the text:
    * k-gram rolling hashes (identical arithmetic to
    * [[rollingFingerprint]] applied to each char-based k-substring —
    * pinned by the parity spec) and a monotonic deque for the sliding
    * window minimum, O(n) total vs the O(n·k) transform+substr
    * formulation it replaces. Texts shorter than k chars yield one
    * whole-text gram; output length = max(#grams − w + 1, 1), minima
    * may repeat (callers distinct as needed).
    */
  def winnowingMinima(text: UTF8String, k: Int, w: Int, mod: Long): ArrayData = {
    // decode code points once ([[nextCp]] — the same decode + malformed-
    // byte fallback rollingFingerprint walks, so the pinned gram-hash
    // parity is structural, not mirrored by hand)
    val nb = text.numBytes
    var cps = new Array[Int](math.max(nb, 1))
    var n = 0
    var i = 0
    while (i < nb) {
      val packed = nextCp(text, i, nb)
      cps(n) = (packed >>> 32).toInt; n += 1
      i = packed.toInt
    }
    // gram hashes
    val ng = math.max(n - k + 1, 1)
    val gh = new Array[Long](ng)
    if (n < k) { // one whole-text gram (empty text hashes to 0)
      var acc = 0L
      var j = 0
      while (j < n) { acc = (acc * 31L + cps(j)) % mod; j += 1 }
      gh(0) = acc
    } else {
      var acc = 0L
      var j = 0
      while (j < k) { acc = (acc * 31L + cps(j)) % mod; j += 1 }
      gh(0) = acc
      // pow = 31^(k-1) mod m, to roll the leading code point off
      var pow = 1L
      var e = 0
      while (e < k - 1) { pow = (pow * 31L) % mod; e += 1 }
      var g = 1
      while (g < ng) {
        val dropped = (cps(g - 1) * pow) % mod
        acc = (((acc - dropped) % mod + mod) * 31L + cps(g + k - 1)) % mod
        gh(g) = acc
        g += 1
      }
    }
    // sliding-window minima via monotonic (increasing) index deque
    val nw = math.max(ng - w + 1, 1)
    val out = new Array[Long](nw)
    val dq = new Array[Int](ng)
    var head = 0
    var tail = 0 // [head, tail) holds candidate indices, values increasing
    var x = 0
    while (x < ng) {
      while (tail > head && gh(dq(tail - 1)) >= gh(x)) tail -= 1
      dq(tail) = x; tail += 1
      if (x >= w && dq(head) <= x - w) head += 1
      if (x >= w - 1 || x == ng - 1) {
        val o = if (x < w - 1) 0 else x - w + 1
        if (o < nw) out(o) = gh(dq(head))
      }
      x += 1
    }
    new GenericArrayData(out)
  }

  /** Sequential-fold dot product over float/double arrays (sides may
    * differ) — same accumulation order as the `aggregate(zip_with(...))`
    * formulation and the DuckDB oracle's list_reduce. A NULL ELEMENT on
    * either side yields NaN: the HOF form produced null there, which the
    * similarity operators' null/NaN guards (added for zero-norm/NaN
    * embeddings) drop — reading the null slot as 0.0 instead would
    * silently compute a wrong cosine and could emit false near-dup
    * pairs. NaN routes the row into those same guards with a primitive
    * return type codegen can keep unboxed.
    */
  def dot(a: ArrayData, aFloat: Boolean, b: ArrayData, bFloat: Boolean): Double = {
    val n = math.min(a.numElements(), b.numElements())
    // null scan FIRST, as its own loop: 2 bitmap tests per element, no
    // FP work, never-taken branch. Interleaving the check into the FP
    // loop instead lengthened its dependency chain on every element of
    // every (non-null) vector — measured ~1.7x on the brute-force pair
    // queries, whose per-pair work is exactly this loop.
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return Double.NaN
      i += 1
    }
    var acc = 0.0
    i = 0
    while (i < n) {
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    acc
  }

  /** |a ∩ b| (distinct) of two SORTED-ascending long arrays — the
    * allocation-free form of `size(array_intersect(a, b))`, which
    * builds an OpenHashSet AND an output array PER PAIR on the
    * containment/similarity verify paths (every candidate pair pays
    * it; r17: the measured GC-pressure owner of the q232 slow mode).
    * Two-pointer merge walk: zero allocation, duplicates counted once
    * (array_intersect semantics). Null elements are skipped in the
    * walk and counted once iff BOTH sides contain one (array_intersect
    * treats null as a value) — placement-independent, so both
    * sort_array (nulls first) and array_sort (nulls last) inputs work.
    * PRECONDITION: both arrays sorted ascending; unsorted inputs give
    * undercounts, which is why the expression name says sorted.
    */
  def sortedIntersectCountLong(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var hasNullA = false; var i = 0
    while (i < na && !hasNullA) { hasNullA = a.isNullAt(i); i += 1 }
    var hasNullB = false; var j = 0
    while (j < nb && !hasNullB) { hasNullB = b.isNullAt(j); j += 1 }
    var cnt = if (hasNullA && hasNullB) 1L else 0L
    i = 0; j = 0
    var seen = false; var last = 0L
    while (i < na && j < nb) {
      if (a.isNullAt(i)) i += 1
      else if (b.isNullAt(j)) j += 1
      else {
        val x = a.getLong(i); val y = b.getLong(j)
        if (x < y) i += 1
        else if (x > y) j += 1
        else {
          if (!seen || x != last) { cnt += 1; seen = true; last = x }
          i += 1; j += 1
        }
      }
    }
    cnt
  }

  /** String-array variant of [[sortedIntersectCountLong]] (same
    * contract; arrays sorted by UTF8String binary order, which is what
    * array_sort/sort_array produce for strings).
    */
  def sortedIntersectCountString(a: ArrayData, b: ArrayData): Long = {
    val na = a.numElements(); val nb = b.numElements()
    var hasNullA = false; var i = 0
    while (i < na && !hasNullA) { hasNullA = a.isNullAt(i); i += 1 }
    var hasNullB = false; var j = 0
    while (j < nb && !hasNullB) { hasNullB = b.isNullAt(j); j += 1 }
    var cnt = if (hasNullA && hasNullB) 1L else 0L
    i = 0; j = 0
    var last: UTF8String = null
    while (i < na && j < nb) {
      if (a.isNullAt(i)) i += 1
      else if (b.isNullAt(j)) j += 1
      else {
        val x = a.getUTF8String(i); val y = b.getUTF8String(j)
        val c = x.compareTo(y)
        if (c < 0) i += 1
        else if (c > 0) j += 1
        else {
          if (last == null || x.compareTo(last) != 0) { cnt += 1; last = x }
          i += 1; j += 1
        }
      }
    }
    cnt
  }
}

/** Distinct word w-shingles (array<string>) of a space-separated text
  * column: the native equivalent of
  * `array_distinct(transform(sequence(...), i => concat_ws(" ",
  * slice(split(text, " "), i, w))))` with the same fallback (texts with
  * fewer than w tokens yield the whole text as one shingle).
  */
case class WordShingles(child: Expression, width: Int)
    extends UnaryExpression {
  // driver-side fail-fast: w <= 0 would walk wordShingles' loop past the
  // token array and AIOOBE per row on executors mid-job
  require(width >= 1, s"word_shingles width must be >= 1, got $width")
  // analysis-time type check: without it, a mistyped SQL call (these are
  // registered session functions) dies mid-job with an executor
  // ClassCastException instead of a readable AnalysisException
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(StringType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "word_shingles"

  override protected def nullSafeEval(input: Any): Any =
    HashImpls.wordShingles(input.asInstanceOf[UTF8String], width)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashImpls.wordShingles($c, $width);")
  override protected def withNewChildInternal(newChild: Expression): WordShingles =
    copy(child = newChild)
}

/** sig = minhash signature (array<bigint>, length numHashes) of an
  * array<string> of shingles.
  */
case class MinHashSignature(child: Expression, coeffs: IndexedSeq[Long], prime: Long)
    extends UnaryExpression {
  // coeffs is an IndexedSeq, not Array: case-class equality on an Array
  // param is REFERENCE equality, so two identical minhash_sig calls in
  // one query would never be semanticEquals and Catalyst CSE could not
  // deduplicate them (minHashCoeffArray allocates per call). The hot
  // loop still sees a primitive long[].
  @transient private lazy val coeffArr: Array[Long] = coeffs.toArray
  // analysis-time type check: without it, a mistyped SQL call (these are
  // registered session functions) dies mid-job with an executor
  // ClassCastException instead of a readable AnalysisException
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(input: Any): Any =
    HashImpls.minHashSig(input.asInstanceOf[ArrayData], coeffArr, prime)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val coeffsRef = ctx.addReferenceObj("coeffs", coeffArr, "long[]")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashImpls.minHashSig($c, $coeffsRef, ${prime}L);")
  }
  override protected def withNewChildInternal(newChild: Expression): MinHashSignature =
    copy(child = newChild)
}

/** Per-band LSH bucket keys (array<bigint>) from a minhash signature
  * array — the fused banding stage (no per-band string rendering).
  */
case class MinHashBandKeys(child: Expression, bands: Int)
    extends UnaryExpression {
  // driver-side fail-fast for the constructor-knowable half (bands must
  // divide the DATA-dependent signature length, checked per row): bands
  // <= 0 would divide by zero on executors mid-job
  require(bands >= 1, s"minhash_band_keys bands must be >= 1, got $bands")
  // analysis-time type check: without it, a mistyped SQL call (these are
  // registered session functions) dies mid-job with an executor
  // ClassCastException instead of a readable AnalysisException
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<BIGINT>, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "minhash_band_keys"

  override protected def nullSafeEval(input: Any): Any =
    HashImpls.minHashBandKeys(input.asInstanceOf[ArrayData], bands)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashImpls.minHashBandKeys($c, $bands);")
  override protected def withNewChildInternal(newChild: Expression): MinHashBandKeys =
    copy(child = newChild)
}

/** 64-bit simhash (bigint) of an array<string> of tokens. */
case class SimHash64(child: Expression)
    extends UnaryExpression {
  // analysis-time type check: without it, a mistyped SQL call (these are
  // registered session functions) dies mid-job with an executor
  // ClassCastException instead of a readable AnalysisException
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires ARRAY<STRING>, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(input: Any): Any =
    HashImpls.simHash64(input.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashImpls.simHash64($c);")
  override protected def withNewChildInternal(newChild: Expression): SimHash64 =
    copy(child = newChild)
}

/** Dot product (double) of two array<float> / array<double> columns. */
case class DotProduct(left: Expression, right: Expression)
    extends BinaryExpression {
  // analysis-time type check: without it, a mistyped SQL call (these are
  // registered session functions) dies mid-job with an executor
  // ClassCastException instead of a readable AnalysisException
  override def checkInputDataTypes(): TypeCheckResult =
    Seq(left, right).map(_.dataType).find {
      case ArrayType(FloatType, _) | ArrayType(DoubleType, _) => false
      case _ => true
    } match {
      case None => TypeCheckResult.TypeCheckSuccess
      case Some(bad) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<FLOAT> or ARRAY<DOUBLE> on both sides, got ${bad.sql}")
    }
  private def isFloat(e: Expression): Boolean =
    e.dataType.asInstanceOf[ArrayType].elementType == FloatType
  override def dataType: DataType = DoubleType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "dot_product"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    HashImpls.dot(a.asInstanceOf[ArrayData], isFloat(left),
      b.asInstanceOf[ArrayData], isFloat(right))

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HashImpls.dot($a, ${isFloat(left)}, $b, ${isFloat(right)});")
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): DotProduct =
    copy(left = newLeft, right = newRight)
}

/** |a ∩ b| (bigint, distinct count) of two SORTED arrays — the
  * allocation-free verify kernel of the containment / set-similarity
  * joins. `size(array_intersect(sa, sb))` allocates an OpenHashSet plus
  * the materialized intersection array for EVERY candidate pair; on the
  * array-heavy verify stages that is the dominant allocation of the
  * whole bench (r17: the measured GC-pressure owner of q232's slow mode
  * under low heap headroom). This runs the two-pointer merge count in
  * compiled code with zero allocation. PRECONDITION: both inputs sorted
  * ascending (sort_array / array_sort upstream) — duplicates and null
  * elements follow array_intersect semantics (counted once; null counts
  * iff present on both sides).
  */
case class SortedIntersectCount(left: Expression, right: Expression)
    extends BinaryExpression {
  // analysis-time type check: without it, a mistyped SQL call (these are
  // registered session functions) dies mid-job with an executor
  // ClassCastException instead of a readable AnalysisException
  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (ArrayType(StringType, _), ArrayType(StringType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"$prettyName requires ARRAY<BIGINT> or ARRAY<STRING> on both " +
          s"sides, got ${l.sql} and ${r.sql}")
    }
  private def isString: Boolean =
    left.dataType.asInstanceOf[ArrayType].elementType == StringType
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "sorted_intersect_count"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    if (isString)
      HashImpls.sortedIntersectCountString(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])
    else
      HashImpls.sortedIntersectCountLong(
        a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val fn = if (isString) "sortedIntersectCountString" else "sortedIntersectCountLong"
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.HashImpls.$fn($a, $b);")
  }
  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): SortedIntersectCount =
    copy(left = newLeft, right = newRight)
}

/** Rolling polynomial hash fingerprint (bigint) of a string column —
  * the native form of q25's document fingerprint. The HOF formulation
  * (`aggregate` over `split(text, "")`) evaluates an interpreted
  * expression tree per CHARACTER; this runs the loop compiled, one
  * static call per row inside whole-stage codegen.
  */
case class RollingFingerprint(child: Expression, mod: Long)
    extends UnaryExpression {
  // driver-side fail-fast: mod <= 1 degenerates every fingerprint to 0
  // (or ArithmeticExceptions per row at 0), and the rolling update
  // acc*31 + cp needs (mod-1)*31 + maxCp < 2^63 to stay overflow-free —
  // maxCp is 0x1FFFFF (a malformed 4-byte lead decodes up to 21 bits)
  require(mod >= 2 && mod <= (Long.MaxValue - 0x1FFFFFL) / 31L,
    s"rolling_fingerprint mod must be in [2, 2^63/31), got $mod")
  // analysis-time type check: without it, a mistyped SQL call (these are
  // registered session functions) dies mid-job with an executor
  // ClassCastException instead of a readable AnalysisException
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${other.sql}")
  }
  override def dataType: DataType = LongType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "rolling_fingerprint"

  override protected def nullSafeEval(input: Any): Any =
    HashImpls.rollingFingerprint(input.asInstanceOf[UTF8String], mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashImpls.rollingFingerprint($c, ${mod}L);")
  override protected def withNewChildInternal(newChild: Expression): RollingFingerprint =
    copy(child = newChild)
}

/** Winnowing fingerprint window minima (array<bigint>) of a string
  * column — the native single-pass form of the k-gram-hash +
  * sliding-window-minimum selection (one static call per row inside
  * whole-stage codegen; the transform+substr formulation it replaces
  * re-extracted and re-hashed every k-char slice, O(n·k) with an
  * interpreted lambda per gram).
  */
case class WinnowingMinima(child: Expression, k: Int, w: Int, mod: Long)
    extends UnaryExpression {
  // driver-side fail-fast (the WordShingles convention): k <= 0 indexes
  // cps(g + k - 1) below the window start and AIOOBEs per row on
  // executors; w <= 0 empties the deque silently and returns garbage
  // minima with no error; and the ROLL-OFF product cps(g-1) * 31^(k-1)
  // bounds mod at 2^42 — tighter than rolling_fingerprint's 2^63/31,
  // because the rolling window multiplies a full 21-bit code point by a
  // power that approaches mod (the cumulative form never does). Above
  // it the subtraction wraps and every gram hash silently diverges from
  // rollingFingerprint of the same substring.
  require(k >= 1, s"winnowing_minima k must be >= 1, got $k")
  require(w >= 1, s"winnowing_minima w must be >= 1, got $w")
  require(mod >= 2 && mod <= (1L << 42),
    s"winnowing_minima mod must be in [2, 2^42], got $mod")
  // analysis-time type check: without it, a mistyped SQL call (these are
  // registered session functions) dies mid-job with an executor
  // ClassCastException instead of a readable AnalysisException
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires STRING, got ${other.sql}")
  }
  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "winnowing_minima"

  override protected def nullSafeEval(input: Any): Any =
    HashImpls.winnowingMinima(input.asInstanceOf[UTF8String], k, w, mod)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = graft.functions.HashImpls.winnowingMinima($c, $k, $w, ${mod}L);")
  override protected def withNewChildInternal(newChild: Expression): WinnowingMinima =
    copy(child = newChild)
}

/** Membership probe (boolean) of a long key against a serialized
  * [[org.apache.spark.util.sketch.BloomFilter]] — the fact-side probe of
  * a bloom semi-join reduction. The filter ships as BYTES with the
  * expression (one copy per task-set broadcast, not per row) and is
  * deserialized once per executor via the transient lazy val; codegen
  * references the expression instance, so the probe is one virtual call
  * per row inside whole-stage codegen.
  */
case class BloomMightContain(child: Expression, filterBytes: IndexedSeq[Byte])
    extends UnaryExpression {
  // IndexedSeq, not Array, for the same value-equality/CSE reason as
  // MinHashSignature.coeffs (case-class equality on Array is by ref).
  // hashCode is CACHED: the case-class default walks every filter byte
  // (potentially megabytes) on each call, and Catalyst calls hashCode
  // repeatedly during planning (ExpressionSet membership,
  // canonicalization, rule transforms) — equals stays structural, so
  // the full-array compare runs only on a genuine hash collision.
  override lazy val hashCode: Int =
    scala.util.hashing.MurmurHash3.orderedHash(Seq(child, filterBytes))
  // analysis-time type check: without it, a mistyped SQL call (these are
  // registered session functions) dies mid-job with an executor
  // ClassCastException instead of a readable AnalysisException
  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case LongType => TypeCheckResult.TypeCheckSuccess
    case other => TypeCheckResult.TypeCheckFailure(
      s"$prettyName requires BIGINT, got ${other.sql}")
  }
  override def dataType: DataType = BooleanType
  override def nullIntolerant: Boolean = true
  override def prettyName: String = "bloom_might_contain"

  @transient lazy val filter: org.apache.spark.util.sketch.BloomFilter =
    org.apache.spark.util.sketch.BloomFilter.readFrom(
      new java.io.ByteArrayInputStream(filterBytes.toArray))

  override protected def nullSafeEval(input: Any): Any =
    filter.mightContainLong(input.asInstanceOf[Long])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val ref = ctx.addReferenceObj("bloomExpr", this,
      "graft.functions.BloomMightContain")
    nullSafeCodeGen(ctx, ev, c =>
      s"${ev.value} = $ref.filter().mightContainLong($c);")
  }
  override protected def withNewChildInternal(newChild: Expression): BloomMightContain =
    copy(child = newChild)
}

/** Column-API entry points for the native expressions. */
object exprs {
  def wordShingles(text: Column, width: Int): Column =
    GraftSqlBridge.column(WordShingles(GraftSqlBridge.expression(text), width))

  def minhashSig(shingles: Column, coeffs: Seq[(Long, Long)], prime: Long): Column =
    GraftSqlBridge.column(MinHashSignature(
      GraftSqlBridge.expression(shingles),
      coeffs.flatMap { case (a, b) => Seq(a, b) }.toIndexedSeq, prime))

  def minhashBandKeys(sig: Column, bands: Int): Column =
    GraftSqlBridge.column(MinHashBandKeys(
      GraftSqlBridge.expression(sig), bands))

  def simhash64(tokens: Column): Column =
    GraftSqlBridge.column(SimHash64(GraftSqlBridge.expression(tokens)))

  def dotProduct(a: Column, b: Column): Column =
    GraftSqlBridge.column(DotProduct(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def sortedIntersectCount(a: Column, b: Column): Column =
    GraftSqlBridge.column(SortedIntersectCount(
      GraftSqlBridge.expression(a), GraftSqlBridge.expression(b)))

  def bloomMightContain(key: Column, filterBytes: Array[Byte]): Column =
    GraftSqlBridge.column(BloomMightContain(
      GraftSqlBridge.expression(key), filterBytes.toIndexedSeq))

  def rollingFingerprint(text: Column, mod: Long): Column =
    GraftSqlBridge.column(RollingFingerprint(
      GraftSqlBridge.expression(text), mod))

  def winnowingMinima(text: Column, k: Int, w: Int, mod: Long): Column =
    GraftSqlBridge.column(WinnowingMinima(
      GraftSqlBridge.expression(text), k, w, mod))
}
