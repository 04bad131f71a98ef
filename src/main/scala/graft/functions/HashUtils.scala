package graft.functions

import java.security.MessageDigest

import org.apache.spark.unsafe.types.UTF8String

/** MD5-prefix hashing shared by the signature expressions.
  *
  * Why MD5 and not xxhash64: the signature pipelines (MinHash, SimHash,
  * hyperplane LSH, IVF sampling) must be *cross-engine deterministic* so the
  * DuckDB differential oracle can replay them bit-for-bit. Both engines ship
  * the same `md5()`; DuckDB has no xxhash64. The 32/64-bit prefixes below
  * equal DuckDB's `('0x' || substr(md5(s), 1, 8|16))::BIGINT|UBIGINT` —
  * big-endian prefix of the hex digest. MD5 costs ~2× xxhash64 per token,
  * paid once per corpus pass at signature build time; verifiability across
  * engines is worth it (and at 100 TB the cost center is the candidate
  * join's shuffle, not the per-row hash).
  */
object HashUtils {

  private val md = ThreadLocal.withInitial[MessageDigest](() => MessageDigest.getInstance("MD5"))

  /** First 4 digest bytes as an unsigned value in [0, 2^32). */
  def md5Prefix32(s: UTF8String): Long = {
    val d = md.get(); d.reset()
    val b = d.digest(s.getBytes)
    ((b(0) & 0xFFL) << 24) | ((b(1) & 0xFFL) << 16) | ((b(2) & 0xFFL) << 8) | (b(3) & 0xFFL)
  }

  /** First 8 digest bytes as a signed long (the 64-bit pattern). */
  def md5Prefix64(s: UTF8String): Long = {
    val d = md.get(); d.reset()
    val b = d.digest(s.getBytes)
    var h = 0L
    var i = 0
    while (i < 8) { h = (h << 8) | (b(i) & 0xFFL); i += 1 }
    h
  }

  /** Mersenne prime 2^31 - 1: the LCG modulus for MinHash permutations.
    * (base % P) * a + b stays under 2^62 — no overflow in BIGINT on either
    * engine (Spark ANSI mode would throw on long overflow). */
  val P: Long = 2147483647L

  def minhashA(i: Int): Long = (2654435761L * (i + 1)) % P
  def minhashB(i: Int): Long = (40503L * (i + 1) + 1) % P
}
