package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.LongType

/** Oracle-portable hash families, all derived from md5 — the one
  * hash BOTH engines compute identically (`md5()` in Spark and
  * DuckDB; xxhash64 is Spark-private, which is exactly why the
  * q23/q24/q25 gates spent nine rounds as rows-only). Every family
  * here follows one rule: a value is the first 15 hex chars of an
  * md5 (60 bits — 16 chars could exceed signed-64 range on the
  * DuckDB `('0x'||…)::bigint` path), optionally reduced mod a
  * Mersenne prime, with PARAMETERS (permutation coefficients,
  * hyperplane components) derived from md5 of a versioned seed
  * string — so a DuckDB twin re-derives the entire candidate set
  * from scratch with `('0x' || substr(md5(s), 1, 15))::bigint`, no
  * engine-private state anywhere.
  *
  * Family versioning (the persisted-index compat contract,
  * [[graft.operators.Dedup.minhashWriteIndex]]): the seed strings
  * embed `v1`; a future change mints `v2` seeds instead of mutating
  * these, so signatures from different builds never silently mix.
  */
object Md5Family {

  /** 2^31 − 1: the affine-permutation modulus. Products stay under
    * 2^62, so `a*x + b` never overflows signed 64-bit in either
    * engine. */
  val P: Long = 2147483647L

  /** Driver-side md5 prefix: first 15 hex chars as a Long (60 bits,
    * always non-negative) — assembled from digest bytes 0–6 plus
    * byte 7's high nibble, no hex-string round trip (hyperplane
    * derivation calls this ~17k times per q25 plan). The Scala twin
    * of [[md5Hash60]] — the parity spec asserts they agree
    * string-for-string. */
  def md5Prefix60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    var x = 0L
    var j = 0
    while (j < 7) { x = (x << 8) | (d(j) & 0xffL); j += 1 }
    (x << 4) | ((d(7) & 0xffL) >> 4)
  }

  /** Row-level md5 prefix of a string column (the DuckDB twin is
    * `('0x' || substr(md5(c), 1, 15))::bigint`). Native expression
    * (r18): value-identical to the composed
    * `conv(substring(md5(c), 1, 15), 16, 10).cast(LongType)` it
    * replaces — that chain rendered 32 hex chars, substring'd them,
    * had `conv` RENDER the decimal as another string and `cast`
    * reparse it, per value; [[Md5PrefixLong]] assembles the digest
    * bytes directly. The md5Prefix60-parity test pins equality. */
  def md5Hash60(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(Md5PrefixLong(ColumnBridge.expression(c), 15))
  }

  /** First 8 md5 hex chars as a Long — the `bucket` derivation of
    * [[graft.operators.QualityClassifier]] / [[graft.operators.LangId]]
    * (DuckDB twin `('0x' || substr(md5(c), 1, 8))::bigint`), native
    * for the same reason as [[md5Hash60]]. Always non-negative
    * (32 bits), so `%` and `pmod` agree downstream. */
  def md5Hash32(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(Md5PrefixLong(ColumnBridge.expression(c), 8))
  }

  /** Full 16-byte md5 digest of a string column ([[Md5Bin]]) — the
    * binary bijection of `md5(c)` for INTERNAL group/join keys (r19):
    * identical partitioning/grouping to the hex form at half the key
    * bytes and no hex render per value. Never use where the value
    * reaches results or a persisted artifact — those contracts are
    * phrased on the hex rendering. */
  def md5BinKey(c: Column): Column = {
    import org.apache.spark.sql.graftbridge.ColumnBridge
    ColumnBridge.column(Md5Bin(ColumnBridge.expression(c)))
  }

  /** [[md5Hash60]] reduced into the affine family's domain [0, P). */
  def md5HashP(c: Column): Column = md5Hash60(c) % P

  /** MinHash permutation coefficients: slot i applies
    * `x -> (a(i)*x + b(i)) mod P` with a ∈ [1, P−1], b ∈ [0, P−1]
    * re-derivable by the oracle as
    * `('0x'||substr(md5('graft:minhash:v1:a:'||i),1,15))::bigint % (P-1) + 1`. */
  def minhashCoeffs(numHashes: Int): (Array[Long], Array[Long]) = {
    val a = Array.tabulate(numHashes)(i =>
      md5Prefix60(s"graft:minhash:v1:a:$i") % (P - 1) + 1)
    val b = Array.tabulate(numHashes)(i =>
      md5Prefix60(s"graft:minhash:v1:b:$i") % P)
    (a, b)
  }

  /** md5-derived hyperplanes for the portable LSH family: component
    * (table, bit, dim) = `(md5_60("graft:lsh:v1:t:i:d") mod 2001 − 1000) / 1024`.
    * The numerator is an integer in [−1000, 1000] and the divisor a
    * power of two, so the value is EXACT in both float32 and float64
    * — Spark's float-plane kernel and DuckDB's double math see the
    * same number, hence the same dot-product signs. */
  private val planeCache =
    new java.util.concurrent.ConcurrentHashMap[(Int, Int, Int), Array[Array[Float]]]()

  def hyperplanes(dim: Int, bits: Int, table: Int): Array[Array[Float]] =
    // memoized: a q25-shaped plan derives 24×11×64 components, and the
    // plan is rebuilt per run — deterministic values, so cache by key
    planeCache.computeIfAbsent((dim, bits, table), { key: (Int, Int, Int) =>
      val (dm, bt, tb) = key
      Array.tabulate(bt)(i => Array.tabulate(dm)(d =>
        ((md5Prefix60(s"graft:lsh:v1:$tb:$i:$d") % 2001 - 1000) / 1024.0).toFloat))
    })
}
