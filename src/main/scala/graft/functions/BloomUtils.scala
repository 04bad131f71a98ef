package graft.functions

import org.apache.spark.unsafe.types.UTF8String

/** Deterministic md5-family Bloom filter over strings — the broadcastable
  * bitmap that prunes a 100 TB probe side before a shuffle join when the
  * build side's keys fit as BITS (~10× smaller than a broadcast hash
  * relation) but not as a hash table. Spark's own `DataFrameStatFunctions
  * .bloomFilter` uses engine-private hashing; this one hashes with the
  * md5-prefix family ([[HashUtils.md5Prefix32]]) so filter contents are
  * reproducible across runs, partitionings, and engines.
  *
  * False positives are expected (rate ≈ (1 - e^(-kn/m))^k); false
  * negatives never happen. Downstream exact joins remove the FPs, so a
  * bloom PREFILTER stage never changes query results — only the bytes
  * that reach the shuffle.
  */
object BloomUtils {

  /** Bit position of hash `i` for `key` — static so codegen can call it. */
  def position(key: UTF8String, i: Int, mBits: Int): Int =
    (HashUtils.md5Prefix32(
      UTF8String.fromString("bf" + i + ":" + key.toString)) % mBits).toInt

  /** Set all `numHashes` bits for `key` in `bits` (mutating seqOp). */
  def add(bits: Array[Long], key: UTF8String, numHashes: Int, mBits: Int): Unit = {
    var i = 0
    while (i < numHashes) {
      val p = position(key, i, mBits)
      bits(p >>> 6) |= (1L << (p & 63))
      i += 1
    }
  }

  /** Membership probe — static forwarder target for codegen. */
  def mightContain(bits: Array[Long], key: UTF8String, numHashes: Int, mBits: Int): Boolean = {
    var i = 0
    while (i < numHashes) {
      val p = position(key, i, mBits)
      if ((bits(p >>> 6) & (1L << (p & 63))) == 0L) return false
      i += 1
    }
    true
  }

  /** OR-merge for tree aggregation (mutates and returns `a`). */
  def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
    var i = 0
    while (i < a.length) { a(i) |= b(i); i += 1 }
    a
  }
}
