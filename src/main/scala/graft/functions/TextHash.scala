package graft.functions

import scala.util.hashing.MurmurHash3

/** Deterministic hashing primitives for the dedup suite (MinHash, SimHash,
  * shingling). Pure Scala, fixed seeds — results are reproducible across
  * JVMs and cluster sizes, which the hash-compare correctness gate and any
  * incremental 100 TB dedup run both require.
  */
object TextHash extends Serializable {

  /** Mersenne prime 2^61 − 1: cheap modular universal hashing domain. */
  val P: Long = (1L << 61) - 1

  val NumHashes = 128
  val NumBands = 32 // × 4 rows per band → LSH threshold ≈ (1/32)^(1/4) ≈ 0.42

  /** Fixed hash-family coefficients (a, b), seeded — identical everywhere. */
  val coeffs: Array[(Long, Long)] = {
    val rnd = new scala.util.Random(42)
    Array.fill(NumHashes)((rnd.nextLong().abs % (P - 1)) + 1, rnd.nextLong().abs % P)
  }

  /** Word k-shingles of a token sequence (distinct, order-free). Documents
    * shorter than k tokens yield NO shingles — matching the oracle's
    * generate_series construction, which is empty for len < k. */
  def shingles(tokens: Seq[String], k: Int): Set[String] =
    if (tokens.length < k) Set.empty
    else tokens.sliding(k).map(_.mkString(" ")).toSet

  private def baseHash(s: String): Long =
    (MurmurHash3.stringHash(s, 0xdeadbeef).toLong & 0xffffffffL) |
      ((MurmurHash3.stringHash(s, 0x5eed5eed).toLong & 0xffffffffL) << 32)

  /** MinHash signature: for each hash function, the min over the set of
    * ((a·h + b) mod P). */
  def minhash(set: Iterable[String]): Array[Long] = {
    val sig = Array.fill(NumHashes)(Long.MaxValue)
    val it = set.iterator
    while (it.hasNext) {
      val h = baseHash(it.next()) & Long.MaxValue
      var i = 0
      while (i < NumHashes) {
        val (a, b) = coeffs(i)
        // (a*h + b) mod P without overflow: use Math.multiplyHigh-free
        // route via BigInt-free mulmod (61-bit modulus fits a 125-bit
        // product split).
        val v = mulmod(a, h % P) + b
        val m = if (v >= P) v - P else v
        if (m < sig(i)) sig(i) = m
        i += 1
      }
    }
    sig
  }

  /** (a·b) mod P for P = 2^61−1 using 128-bit intermediate via
    * Math.multiplyHigh (JDK 9+). */
  def mulmod(a: Long, b: Long): Long = {
    val hi = Math.multiplyHigh(a, b)
    val lo = a * b
    // split the 128-bit product into 61-bit limbs: x = hi·2^64 + lo
    // 2^64 ≡ 8 (mod 2^61−1) since 2^61 ≡ 1.
    val loMod = (lo & P) + (((lo >>> 61) & 0x7L))
    val hiMod = mulmodSmall(hi % P, 8L)
    var r = (loMod + hiMod) % P
    if (r < 0) r += P
    r
  }

  private def mulmodSmall(a: Long, b: Long): Long = {
    // b ≤ 8 so a*b fits in 64+3 bits; reduce once.
    val x = a * b
    ((x & P) + (x >>> 61)) % P
  }

  /** LSH band keys: hash of each contiguous signature slice. */
  def bands(sig: Array[Long]): Array[Long] = {
    val rows = NumHashes / NumBands
    Array.tabulate(NumBands) { b =>
      var h = 1125899906842597L
      var i = b * rows
      while (i < (b + 1) * rows) { h = h * 31 + sig(i); i += 1 }
      h
    }
  }

  /** 64-bit SimHash over a token multiset. */
  def simhash(tokens: Seq[String]): Long = {
    val acc = new Array[Int](64)
    tokens.foreach { t =>
      val h = baseHash(t)
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) acc(j) += 1 else acc(j) -= 1
        j += 1
      }
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (acc(j) >= 0) out |= (1L << j); j += 1 }
    out
  }

  def hamming(a: Long, b: Long): Int = java.lang.Long.bitCount(a ^ b)

  /** 64-bit SimHash whose per-token hash is the top 64 bits of SHA-256
    * (big-endian, = the first 16 hex chars of the digest). Unlike
    * [[simhash]]'s murmur-based family, sha256 is a cross-engine
    * primitive, so a SQL oracle can recompute this fingerprint exactly
    * (DuckDB: ('0x' || substr(sha256(t),1,16))::UBIGINT) — which is what
    * makes the tight-radius dedup variant (q96) fully hash-gateable.
    * Ties (bit balance 0) round UP, matching the oracle's sum >= 0. */
  def simhashSha(tokens: Iterable[String]): Long = {
    val md = java.security.MessageDigest.getInstance("SHA-256")
    val acc = new Array[Int](64)
    tokens.foreach { t =>
      val d = md.digest(t.getBytes("UTF-8"))
      var h = 0L
      var i = 0
      while (i < 8) { h = (h << 8) | (d(i) & 0xffL); i += 1 }
      var j = 0
      while (j < 64) {
        if (((h >>> j) & 1L) == 1L) acc(j) += 1 else acc(j) -= 1
        j += 1
      }
    }
    var out = 0L
    var j = 0
    while (j < 64) { if (acc(j) >= 0) out |= (1L << j); j += 1 }
    out
  }
}
