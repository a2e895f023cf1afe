package graft.functions

import org.apache.spark.sql.catalyst.analysis.TypeCheckResult
import org.apache.spark.sql.catalyst.expressions.{BinaryExpression, Expression, UnaryExpression}
import org.apache.spark.sql.catalyst.expressions.codegen.{CodegenContext, ExprCode}
import org.apache.spark.sql.catalyst.util.ArrayData
import org.apache.spark.sql.types.{ArrayType, DataType, DoubleType, FloatType}

/** Vector kernels as native Catalyst expressions.
  *
  * [[graft.operators.Similarity]]'s dot product was composed from
  * `aggregate(zip_with(a, b, x·y), 0.0, +)` — semantically right, but
  * Spark's higher-order functions are CodegenFallback: every row pays
  * interpreted lambda dispatch and an allocated intermediate array,
  * and the expression breaks the WholeStageCodegen span. [[VecDot]]
  * is the custom-Expression upgrade (the same ladder rung as
  * [[Uint256Exact]]): one static-call `doGenCode` into a tight
  * primitive loop, bit-identical arithmetic (left-to-right double
  * accumulation over exactly-widened elements), identical null
  * semantics (length mismatch or a null element → null — what
  * zip_with's null padding and `acc + null` produce), so every
  * DuckDB oracle twin stays hash-equal while the hot loop drops the
  * interpreter.
  */
object VecRuntime {
  import org.apache.spark.sql.catalyst.expressions.XXH64
  import org.apache.spark.sql.catalyst.util.GenericArrayData

  /** MinHash signature in one pass — bit-identical to the composed
    * `array((0 until H).map(i => array_min(transform(arr, e =>
    * xxhash64(e, lit(i))))))`: Spark's xxhash64 folds its arguments
    * (seed 42 → hash(e) → hashInt(i, ·)), so the element's base hash
    * is computable ONCE and the i-loop is one `hashInt` per slot —
    * H× less hashing than the composed form on top of dropping the
    * per-element interpreted dispatch. Empty input → all-null slots
    * (what array_min of an empty array yields); a null element
    * contributes seed 42 as its base (xxhash64 skips null args). */
  def minhashSig(arr: ArrayData, isString: Boolean, numHashes: Int): ArrayData = {
    val n = arr.numElements()
    if (n == 0)
      return new GenericArrayData(Array.fill[Any](numHashes)(null))
    val mins = Array.fill(numHashes)(Long.MaxValue)
    var i = 0
    while (i < n) {
      val base =
        if (arr.isNullAt(i)) 42L
        else if (isString) XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
        else XXH64.hashLong(arr.getLong(i), 42L)
      var j = 0
      while (j < numHashes) {
        val h = XXH64.hashInt(j, base)
        if (h < mins(j)) mins(j) = h
        j += 1
      }
      i += 1
    }
    new GenericArrayData(mins)
  }

  private val md5Local = new ThreadLocal[java.security.MessageDigest] {
    override def initialValue(): java.security.MessageDigest =
      java.security.MessageDigest.getInstance("MD5")
  }

  /** First `nibbles` md5 hex chars of a byte slice as a Long —
    * bit-identical to `conv(substring(md5(c), 1, nibbles), 16, 10)
    * .cast(LongType)` without the hex render → substring → string
    * conv → decimal reparse round trip that chain pays per value
    * (md5 emits a 32-char hex UTF8String, conv RENDERS the decimal
    * as another string, cast parses it back). Full bytes first, then
    * the odd trailing nibble is the byte's HIGH half (hex renders
    * MSB-first). */
  def md5PrefixBytes(bytes: Array[Byte], off: Int, len: Int, nibbles: Int): Long = {
    val md = md5Local.get()
    md.reset()
    md.update(bytes, off, len)
    val d = md.digest()
    val full = nibbles / 2
    var x = 0L
    var j = 0
    while (j < full) { x = (x << 8) | (d(j) & 0xffL); j += 1 }
    if ((nibbles & 1) == 1) x = (x << 4) | ((d(full) & 0xffL) >> 4)
    x
  }

  /** [[md5PrefixBytes]] over a whole UTF8String (the
    * [[graft.functions.Md5PrefixLong]] expression's runtime). */
  def md5Prefix(s: org.apache.spark.unsafe.types.UTF8String, nibbles: Int): Long = {
    val b = s.getBytes
    md5PrefixBytes(b, 0, b.length, nibbles)
  }

  /** Full 16-byte md5 digest of a UTF8String (the
    * [[graft.functions.Md5Bin]] expression's runtime): bit-identical
    * information to `md5(c)` / `unhex(md5(c))` — the digest IS the
    * hex string's preimage, byte-for-byte — without rendering 32 hex
    * chars per value. Used where the digest is an INTERNAL
    * group/join key that never reaches results (the
    * [[graft.operators.Dedup.duplicatedSpans]] gram census), so the
    * hex form's only effect was 2.5× wider shuffle keys. */
  def md5Bin(s: org.apache.spark.unsafe.types.UTF8String): Array[Byte] = {
    val md = md5Local.get()
    md.reset()
    md.update(s.getBytes)
    md.digest()
  }

  /** Char-n-gram hash buckets of a (pre-normalized) string in ONE
    * pass — bit-identical to the composed
    * `explode(flatten(array(ns.map(k => charNgramsFromNormalized(n, k)))))`
    * → `bucketOf(gram, dim, family)` pipeline of
    * [[graft.operators.LangId.features]], minus three per-gram costs
    * that pipeline pays: (a) the `transform(sequence(…), i =>
    * n.substr(i, k))` HOF is CodegenFallback — interpreted lambda
    * dispatch per position — and each `substr(i, k)` re-scans the
    * UTF-8 bytes from the string's head to find char i, O(len²) per
    * document per order; (b) each gram materializes as its own
    * UTF8String; (c) the md5 family's bucket then pays the
    * hex/substring/conv/cast string round trip ([[md5PrefixBytes]]).
    * Here the code-point start offsets are computed once (one linear
    * walk — grams are CHAR n-grams, so multibyte scripts slice on
    * char boundaries exactly like `substr`), and each gram hashes
    * straight off the shared byte array.
    *
    * Bucket values per family (the [[graft.operators.LangId.bucketOf]]
    * contract, asserted gram-for-gram by LangIdSpec's parity test):
    *   md5   → `conv(substring(md5(g),1,8),16,10)::long % dim`
    *           (first 4 digest bytes as an unsigned 32-bit int —
    *           non-negative, so `%` and `pmod` agree)
    *   xxh64 → `pmod(xxhash64(g), dim)` (seed 42 over the gram's
    *           UTF-8 bytes; hash may be negative, so pmod wraps)
    * Gram order is the flatten order (all order-ns(0) grams by
    * position, then ns(1), …) — downstream is a count aggregation,
    * but keeping the order makes the parity spec exact. Empty input
    * (or every order longer than the text) → empty array, matching
    * the composed form's empty flatten. */
  def gramBuckets(s: org.apache.spark.unsafe.types.UTF8String, ns: Array[Int],
      dim: Long, isMd5: Boolean): ArrayData = {
    val bytes = s.getBytes
    val nb = bytes.length
    val nChars = s.numChars()
    // Char start offsets via the SAME stepping numChars()/substr use
    // (numBytesForFirstByte per lead byte) — a continuation-bit scan
    // can disagree with it on MALFORMED UTF-8 (e.g. a 2-byte lead
    // followed by ASCII) and overflow the array; this loop yields
    // exactly nChars starts by construction, and gram byte-slices
    // match substr's on any input, well-formed or not.
    val starts = new Array[Int](nChars + 1)
    var c = 0
    var i = 0
    while (i < nb && c < nChars) {
      starts(c) = i
      c += 1
      i += org.apache.spark.unsafe.types.UTF8String.numBytesForFirstByte(bytes(i))
    }
    starts(nChars) = nb
    // Loud bound (r19, the r18 advisor): totals accumulate in Int, so
    // a pathological multi-GB single document (orders × nChars past
    // 2^31) would otherwise surface as NegativeArraySizeException —
    // the composed form it replaced also failed at that scale (a 6e9
    // element flatten), this just names the cause. Math.addExact
    // throws ArithmeticException("integer overflow"), wrapped with
    // the per-document bound so the failing row's shape is in the
    // message.
    var total = 0
    var t = 0
    while (t < ns.length) {
      val g = nChars - ns(t) + 1
      if (g > 0) {
        try total = Math.addExact(total, g)
        catch { case _: ArithmeticException =>
          throw new IllegalArgumentException(
            s"gram_buckets: document too large ($nChars chars across " +
              s"${ns.length} n-gram orders exceeds 2^31 grams)")
        }
      }
      t += 1
    }
    val out = new Array[Long](total)
    var w = 0
    t = 0
    while (t < ns.length) {
      val k = ns(t)
      val last = nChars - k
      var p = 0
      while (p <= last) {
        val off = starts(p)
        val len = starts(p + k) - off
        out(w) =
          if (isMd5) md5PrefixBytes(bytes, off, len, 8) % dim
          else {
            val h = XXH64.hashUTF8String(
              org.apache.spark.unsafe.types.UTF8String.fromBytes(bytes, off, len), 42L)
            val r = h % dim
            if (r < 0) r + dim else r
          }
        w += 1
        p += 1
      }
      t += 1
    }
    new GenericArrayData(out)
  }

  /** Distinct md5-60 shingle-hash set in one pass — bit-identical to
    * the composed `array_distinct(transform(sh, md5Hash60))` it
    * replaces in [[graft.operators.Dedup.containmentPairs]]'s md5
    * family, minus the per-element hex-string round trip
    * (`conv(substring(md5(s),1,15),16,10)` allocates hex + substring
    * + conv strings per shingle, interpreted inside the HOF lambda —
    * q132 measured the composed form at ~4 s per plan-branch
    * evaluation over 5000 docs where this kernel is one digest per
    * element). First-occurrence order, matching array_distinct (no
    * consumer is order-sensitive, but determinism keeps plans
    * comparable). Null elements are skipped. */
  def md5Set60(arr: ArrayData): ArrayData = {
    val n = arr.numElements()
    val md = md5Local.get()
    val set = new java.util.LinkedHashSet[java.lang.Long]()
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        var x = 0L
        var j = 0
        while (j < 7) { x = (x << 8) | (d(j) & 0xffL); j += 1 }
        x = (x << 4) | ((d(7) & 0xffL) >> 4)
        set.add(x)
      }
      i += 1
    }
    val out = new Array[Long](set.size)
    var k = 0
    val it = set.iterator()
    while (it.hasNext) { out(k) = it.next(); k += 1 }
    new GenericArrayData(out)
  }

  /** md5-family MinHash signature in one pass — bit-identical to the
    * composed `transform(sh, md5HashP) → array(array_min(transform(
    * xs, x => (a_i·x + b_i) % P)))` pipeline (the oracle-portable
    * family of [[graft.functions.Md5Family]]): the first 15 md5 hex
    * chars are bytes 0–6 plus byte 7's high nibble, assembled here
    * without the hex-string round trip `conv(substring(md5(s),1,15),
    * 16,10)` pays, then reduced mod P and run through all k affine
    * permutations while the digest is hot. The composed form was 32
    * interpreted array traversals per row (q23 measured 30× slower
    * than the xxh64 kernel at sf0.1); this is one traversal. Null
    * elements are skipped (array_min ignores null entries); empty or
    * all-null input → all-null slots, matching array_min of an
    * empty/all-null array. */
  def minhashMd5Sig(arr: ArrayData, a: Array[Long], b: Array[Long]): ArrayData = {
    val p = Md5Family.P
    val n = arr.numElements()
    val k = a.length
    if (n == 0) return new GenericArrayData(Array.fill[Any](k)(null))
    val md = md5Local.get()
    val mins = Array.fill(k)(Long.MaxValue)
    var any = false
    var i = 0
    while (i < n) {
      if (!arr.isNullAt(i)) {
        any = true
        md.reset()
        val d = md.digest(arr.getUTF8String(i).getBytes)
        var x = 0L
        var j = 0
        while (j < 7) { x = (x << 8) | (d(j) & 0xffL); j += 1 }
        x = ((x << 4) | ((d(7) & 0xffL) >> 4)) % p
        j = 0
        while (j < k) {
          val v = (a(j) * x + b(j)) % p
          if (v < mins(j)) mins(j) = v
          j += 1
        }
      }
      i += 1
    }
    if (!any) return new GenericArrayData(Array.fill[Any](k)(null))
    new GenericArrayData(mins)
  }

  /** 60-bit md5-family SimHash of a token array in one pass —
    * bit-identical to the relational form it replaces in
    * [[graft.operators.Dedup.simhashDfMd5]] (explode tokens →
    * md5Hash60 per token → 60 per-bit ±1 vote sums → sign-pack):
    * votes are order-independent integer adds, so accumulating them
    * in a local array per row IS the 60-column HashAggregate, minus
    * the |tokens|× row explosion and the per-doc groupBy exchange.
    * Per token h = md5-prefix-60; bit j votes +1 iff (h >> j) & 1
    * (h is 60-bit non-negative, so arithmetic and logical shifts
    * agree); sign-pack sig |= 1<<j when the vote sum is positive —
    * exactly `when(sum > 0, 1<<j).otherwise(0)` OR-reduced. A null
    * token element votes −1 on every bit (the relational form's
    * `when(null === 1).otherwise(-1)` arm), which h = 0 reproduces.
    * The DuckDB twin stays the relational spelling — values equal. */
  def simhashMd560(arr: ArrayData): Long = {
    val votes = new Array[Int](60)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h =
        if (arr.isNullAt(i)) 0L
        else {
          val b = arr.getUTF8String(i).getBytes
          md5PrefixBytes(b, 0, b.length, 15)
        }
      var j = 0
      while (j < 60) {
        if (((h >>> j) & 1L) == 1L) votes(j) += 1 else votes(j) -= 1
        j += 1
      }
      i += 1
    }
    var sig = 0L
    var j = 0
    while (j < 60) {
      if (votes(j) > 0) sig |= 1L << j
      j += 1
    }
    sig
  }

  /** `size(array_intersect(a, b))` for long arrays without
    * materializing the intersection array: distinct-common count,
    * with array_intersect's exact semantics (result is distinct;
    * null is a value that can match null). */
  def setOverlap(a: ArrayData, b: ArrayData): Int = {
    val seen = new java.util.HashSet[java.lang.Long]()
    var aNull = false
    var i = 0
    val na = a.numElements()
    while (i < na) {
      if (a.isNullAt(i)) aNull = true else seen.add(a.getLong(i))
      i += 1
    }
    val seenB = new java.util.HashSet[java.lang.Long]()
    var bNull = false
    var inter = 0
    var j = 0
    val nb = b.numElements()
    while (j < nb) {
      if (b.isNullAt(j)) {
        if (!bNull) { bNull = true; if (aNull) inter += 1 }
      } else {
        val e = b.getLong(j)
        if (seenB.add(e) && seen.contains(e)) inter += 1
      }
      j += 1
    }
    inter
  }

  /** Count of slots where both signatures are non-null and equal —
    * what `aggregate(zip_with(a, b, (x,y) => when(x===y,1).otherwise(0)),
    * 0, +)` computes (null-padded and null-slot comparisons fall to
    * the otherwise-0 branch). */
  def sigAgree(a: ArrayData, b: ArrayData): Int = {
    val n = math.min(a.numElements(), b.numElements())
    var c = 0
    var i = 0
    while (i < n) {
      if (!a.isNullAt(i) && !b.isNullAt(i) && a.getLong(i) == b.getLong(i)) c += 1
      i += 1
    }
    c
  }

  /** 64-bit SimHash of a token array in one pass: each token hashes
    * once (`xxhash64` semantics: hashUTF8String with seed 42; null
    * tokens contribute the bare seed), votes ±1 on every bit, sign
    * packs. Bit-identical to the explode → 64-sum HashAggregate →
    * pack pipeline it replaces — minus the explode row blow-up and
    * the groupBy shuffle (the signature becomes purely map-side). */
  def simhash64(arr: ArrayData): Long = {
    val votes = new Array[Int](64)
    val n = arr.numElements()
    var i = 0
    while (i < n) {
      val h =
        if (arr.isNullAt(i)) 42L
        else XXH64.hashUTF8String(arr.getUTF8String(i), 42L)
      var b = 0
      while (b < 64) {
        if (((h >>> b) & 1L) == 1L) votes(b) += 1 else votes(b) -= 1
        b += 1
      }
      i += 1
    }
    var sig = 0L
    var b = 0
    while (b < 64) {
      if (votes(b) > 0) sig |= 1L << b
      b += 1
    }
    sig
  }

  /** Left-to-right double-accumulated dot product; null boxes the
    * zip_with/aggregate null semantics. */
  def dot(a: ArrayData, b: ArrayData, aFloat: Boolean, bFloat: Boolean): java.lang.Double = {
    val n = a.numElements()
    if (n != b.numElements()) return null // zip_with pads with null → null sum
    var acc = 0.0
    var i = 0
    while (i < n) {
      if (a.isNullAt(i) || b.isNullAt(i)) return null
      val x = if (aFloat) a.getFloat(i).toDouble else a.getDouble(i)
      val y = if (bFloat) b.getFloat(i).toDouble else b.getDouble(i)
      acc += x * y
      i += 1
    }
    java.lang.Double.valueOf(acc)
  }

  /** Fused multi-probe LSH candidate test (r9): every table's
    * signature of `vec` against a flat row-major (tables·bits × dim)
    * hyperplane matrix, early-exiting on the first table within
    * `radius` bits of its query signature. Bit-identical to the
    * composed `(bit_count(signature(vec) ^ qSig) <= radius) || …`
    * predicate: each bit is `dot > 0` with the same left-to-right
    * double accumulation over exactly-widened elements, and an
    * invalid row (dim mismatch, null element, null vec) yields
    * all-clear signatures in the composed form — `zeroSigHit`
    * carries that constant. The vector loads into a primitive array
    * ONCE per row instead of tables·bits ArrayData traversals, and
    * the whole test is one generated call instead of a
    * tables·bits-node expression tree — at 24 tables × 11 bits the
    * composed tree's janino compile alone dominated small-SF runs. */
  def lshProbe(vec: ArrayData, planes: Array[Float], dim: Int, bits: Int,
      qSigs: Array[Long], radius: Int, isFloat: Boolean,
      zeroSigHit: Boolean): Boolean = {
    if (vec.numElements() != dim) return zeroSigHit
    val v = new Array[Double](dim)
    var i = 0
    while (i < dim) {
      if (vec.isNullAt(i)) return zeroSigHit
      v(i) = if (isFloat) vec.getFloat(i).toDouble else vec.getDouble(i)
      i += 1
    }
    var t = 0
    var off = 0
    while (t < qSigs.length) {
      var sig = 0L
      var b = 0
      while (b < bits) {
        var acc = 0.0
        var j = 0
        while (j < dim) { acc += v(j) * planes(off + j); j += 1 }
        if (acc > 0) sig |= 1L << b
        b += 1
        off += dim
      }
      if (java.lang.Long.bitCount(sig ^ qSigs(t)) <= radius) return true
      t += 1
    }
    false
  }
}

case class MinHashSig(child: Expression, numHashes: Int) extends UnaryExpression {
  import org.apache.spark.sql.types.{IntegerType, LongType, StringType}

  private def isString = child.dataType match {
    case ArrayType(StringType, _) => true
    case _ => false
  }

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(LongType, _) | ArrayType(StringType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash_sig expects array<long|string>, got $dt")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_sig"

  override protected def nullSafeEval(v: Any): Any =
    VecRuntime.minhashSig(v.asInstanceOf[ArrayData], isString, numHashes)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VecRuntime.minhashSig($a, $isString, $numHashes);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The [[VecRuntime.md5Set60]] kernel as an expression — the
  * oracle-portable distinct shingle-hash set
  * ([[graft.operators.Dedup.containmentPairs]]'s md5 family). */
case class Md5ShingleSet(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{LongType, StringType}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"md5_shingle_set expects array<string>, got $dt")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "md5_shingle_set"

  override protected def nullSafeEval(v: Any): Any =
    VecRuntime.md5Set60(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VecRuntime.md5Set60($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The [[VecRuntime.md5Bin]] kernel as an expression: the full
  * 16-byte md5 DIGEST of a string — a bijection of `md5(c)` (the hex
  * string renders exactly these bytes), so grouping or joining on it
  * partitions rows identically to grouping on the hex form while
  * shuffling 16 payload bytes per key instead of 32 hex chars, with
  * no hex render per value. For INTERNAL keys only (never
  * output-visible, never persisted): an oracle twin keyed on
  * `md5(g)` groups identically by bijectivity, so twins are
  * untouched. Null in → null out. */
case class Md5Bin(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{BinaryType, StringType}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"md5_bin expects string, got $dt")
  }

  override def dataType: DataType = BinaryType
  override def prettyName: String = "md5_bin"

  override protected def nullSafeEval(v: Any): Any =
    VecRuntime.md5Bin(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VecRuntime.md5Bin($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The [[VecRuntime.md5Prefix]] kernel as an expression: first
  * `nibbles` md5 hex chars of a string as a Long — the native form of
  * `conv(substring(md5(c), 1, nibbles), 16, 10).cast(LongType)`
  * ([[Md5Family.md5Hash60]] / [[Md5Family.md5Hash32]] route here).
  * Value-identical (the DedupSimilaritySpec parity test pins it), so
  * every DuckDB oracle twin keeps re-deriving the same number; null
  * in → null out (md5(NULL) is NULL through the composed chain). */
case class Md5PrefixLong(child: Expression, nibbles: Int) extends UnaryExpression {
  import org.apache.spark.sql.types.{LongType, StringType}

  require(nibbles >= 1 && nibbles <= 15, s"nibbles must be 1..15, got $nibbles")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"md5_prefix_long expects string, got $dt")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "md5_prefix_long"

  override protected def nullSafeEval(v: Any): Any =
    VecRuntime.md5Prefix(v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], nibbles)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VecRuntime.md5Prefix($a, $nibbles);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The [[VecRuntime.gramBuckets]] kernel as an expression — the
  * one-pass char-n-gram → hash-bucket pipeline of
  * [[graft.operators.LangId.features]] (semantics contract on the
  * runtime method). `ns` rides as a reference object. */
case class GramBuckets(child: Expression, ns: Seq[Int], dim: Long, family: String)
    extends UnaryExpression {
  import org.apache.spark.sql.types.{LongType, StringType}

  require(ns.nonEmpty && ns.forall(_ >= 1), s"bad n-gram orders $ns")
  require(dim > 0, s"dim must be positive, got $dim")
  require(family == "md5" || family == "xxh64",
    s"gram_buckets hash family '$family' (md5|xxh64)")

  private def isMd5 = family == "md5"
  private lazy val nsArr: Array[Int] = ns.toArray

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case StringType => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"gram_buckets expects string, got $dt")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = false)
  override def prettyName: String = "gram_buckets"

  override protected def nullSafeEval(v: Any): Any =
    VecRuntime.gramBuckets(
      v.asInstanceOf[org.apache.spark.unsafe.types.UTF8String], nsArr, dim, isMd5)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val nsRef = ctx.addReferenceObj("gramBucketNs", nsArr, "int[]")
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VecRuntime.gramBuckets($a, $nsRef, ${dim}L, $isMd5);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The [[VecRuntime.minhashMd5Sig]] kernel as an expression — the
  * oracle-portable MinHash family's one-pass form. Coefficient
  * arrays ride along as reference objects (not literals: 2×32 longs
  * inline would bloat generated code for nothing). */
case class MinHashMd5Sig(child: Expression, a: Array[Long], b: Array[Long])
    extends UnaryExpression {
  import org.apache.spark.sql.types.{LongType, StringType}

  require(a.length == b.length, "coefficient arrays must align")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"minhash_md5_sig expects array<string>, got $dt")
  }

  override def dataType: DataType = ArrayType(LongType, containsNull = true)
  override def prettyName: String = "minhash_md5_sig"

  override protected def nullSafeEval(v: Any): Any =
    VecRuntime.minhashMd5Sig(v.asInstanceOf[ArrayData], a, b)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val aRef = ctx.addReferenceObj("minhashMd5A", a, "long[]")
    val bRef = ctx.addReferenceObj("minhashMd5B", b, "long[]")
    nullSafeCodeGen(ctx, ev, x =>
      s"${ev.value} = graft.functions.VecRuntime.minhashMd5Sig($x, $aRef, $bRef);")
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SimHash64(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{LongType, StringType}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(s"simhash64 expects array<string>, got $dt")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash64"

  override protected def nullSafeEval(v: Any): Any =
    VecRuntime.simhash64(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VecRuntime.simhash64($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

/** The [[VecRuntime.simhashMd560]] kernel as an expression — the
  * md5 (oracle-portable) SimHash family's one-pass form. */
case class SimHashMd560(child: Expression) extends UnaryExpression {
  import org.apache.spark.sql.types.{LongType, StringType}

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(StringType, _) => TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"simhash_md5_60 expects array<string>, got $dt")
  }

  override def dataType: DataType = LongType
  override def prettyName: String = "simhash_md5_60"

  override protected def nullSafeEval(v: Any): Any =
    VecRuntime.simhashMd560(v.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, a =>
      s"${ev.value} = graft.functions.VecRuntime.simhashMd560($a);")

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}

case class SigAgree(left: Expression, right: Expression) extends BinaryExpression {
  import org.apache.spark.sql.types.{IntegerType, LongType}

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"sig_agree expects (array<long>, array<long>), got ($l, $r)")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "sig_agree"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecRuntime.sigAgree(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecRuntime.sigAgree($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class SetOverlap(left: Expression, right: Expression) extends BinaryExpression {
  import org.apache.spark.sql.types.{IntegerType, LongType}

  override def checkInputDataTypes(): TypeCheckResult =
    (left.dataType, right.dataType) match {
      case (ArrayType(LongType, _), ArrayType(LongType, _)) =>
        TypeCheckResult.TypeCheckSuccess
      case (l, r) => TypeCheckResult.TypeCheckFailure(
        s"set_overlap expects (array<long>, array<long>), got ($l, $r)")
    }

  override def dataType: DataType = IntegerType
  override def prettyName: String = "set_overlap"

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecRuntime.setOverlap(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData])

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"${ev.value} = graft.functions.VecRuntime.setOverlap($a, $b);")

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

case class VecDot(left: Expression, right: Expression) extends BinaryExpression {

  private def elemType(dt: DataType): Option[DataType] = dt match {
    case ArrayType(FloatType, _) => Some(FloatType)
    case ArrayType(DoubleType, _) => Some(DoubleType)
    case _ => None
  }

  override def checkInputDataTypes(): TypeCheckResult =
    (elemType(left.dataType), elemType(right.dataType)) match {
      case (Some(_), Some(_)) => TypeCheckResult.TypeCheckSuccess
      case _ => TypeCheckResult.TypeCheckFailure(
        s"vec_dot expects (array<float|double>, array<float|double>), " +
          s"got (${left.dataType}, ${right.dataType})")
    }

  override def dataType: DataType = DoubleType
  override def nullable: Boolean = true
  override def prettyName: String = "vec_dot"

  private def leftIsFloat = left.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private def rightIsFloat = right.dataType.asInstanceOf[ArrayType].elementType == FloatType

  override protected def nullSafeEval(a: Any, b: Any): Any =
    VecRuntime.dot(a.asInstanceOf[ArrayData], b.asInstanceOf[ArrayData],
      leftIsFloat, rightIsFloat)

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode =
    nullSafeCodeGen(ctx, ev, (a, b) =>
      s"""
         |java.lang.Double ${ev.value}_r = graft.functions.VecRuntime.dot(
         |  $a, $b, $leftIsFloat, $rightIsFloat);
         |if (${ev.value}_r == null) { ${ev.isNull} = true; }
         |else { ${ev.value} = ${ev.value}_r.doubleValue(); }
       """.stripMargin)

  override protected def withNewChildrenInternal(
      newLeft: Expression, newRight: Expression): Expression =
    copy(left = newLeft, right = newRight)
}

/** Multi-probe LSH candidate predicate as ONE native expression
  * ([[VecRuntime.lshProbe]] has the semantics contract). The composed
  * form — `numTables` signatures OR'd, each `bits` `when(vec_dot > 0)`
  * branches over its own literal plane — is a tables·bits-node tree
  * (264 nodes at the q25 knobs) whose whole-stage-codegen compile cost
  * alone dominates small scans; this collapses it to one generated
  * call over a flat plane matrix with per-table early exit. Never
  * null: an invalid/null row takes the composed form's all-clear-
  * signature constant (`zeroSigHit`), keeping the candidate set
  * bit-identical. */
case class LshProbe(child: Expression, planes: Array[Float], dim: Int,
    bits: Int, qSigs: Array[Long], radius: Int) extends UnaryExpression {
  import org.apache.spark.sql.catalyst.InternalRow
  import org.apache.spark.sql.catalyst.expressions.codegen.Block._
  import org.apache.spark.sql.catalyst.expressions.codegen.FalseLiteral
  import org.apache.spark.sql.types.BooleanType

  require(bits >= 1 && bits <= 64, "bits must be 1..64")
  require(planes.length == qSigs.length * bits * dim,
    "planes must be a flat (tables*bits x dim) row-major matrix")

  override def checkInputDataTypes(): TypeCheckResult = child.dataType match {
    case ArrayType(FloatType, _) | ArrayType(DoubleType, _) =>
      TypeCheckResult.TypeCheckSuccess
    case dt => TypeCheckResult.TypeCheckFailure(
      s"lsh_probe expects array<float|double>, got $dt")
  }

  override def dataType: DataType = BooleanType
  override def nullable: Boolean = false
  override def prettyName: String = "lsh_probe"

  private def isFloat = child.dataType.asInstanceOf[ArrayType].elementType == FloatType
  private lazy val zeroSigHit =
    qSigs.exists(q => java.lang.Long.bitCount(q) <= radius)

  override def eval(input: InternalRow): Any = {
    val v = child.eval(input)
    if (v == null) zeroSigHit
    else VecRuntime.lshProbe(v.asInstanceOf[ArrayData], planes, dim, bits,
      qSigs, radius, isFloat, zeroSigHit)
  }

  override protected def doGenCode(ctx: CodegenContext, ev: ExprCode): ExprCode = {
    val c = child.genCode(ctx)
    val planesRef = ctx.addReferenceObj("lshPlanes", planes, "float[]")
    val sigsRef = ctx.addReferenceObj("lshQSigs", qSigs, "long[]")
    ev.copy(code = code"""
      ${c.code}
      boolean ${ev.value} = ${c.isNull} ? $zeroSigHit :
        graft.functions.VecRuntime.lshProbe(${c.value}, $planesRef, $dim,
          $bits, $sigsRef, $radius, $isFloat, $zeroSigHit);
      """, isNull = FalseLiteral)
  }

  override protected def withNewChildInternal(newChild: Expression): Expression =
    copy(child = newChild)
}
