package graft.operators

import org.apache.spark.unsafe.types.UTF8String

import graft.SparkSpec
import graft.functions.BloomUtils

class BloomSpec extends SparkSpec {

  import spark.implicits._

  test("no false negatives, sane false-positive rate") {
    val mBits = 1 << 16
    val keys = (1 to 2000).map(i => s"key$i")
    val bits = TextAnalysis.buildBloom(keys.toDF("k"), "k", mBits, numHashes = 3)
    val fn = keys.count(k =>
      !BloomUtils.mightContain(bits, UTF8String.fromString(k), 3, mBits))
    assert(fn === 0, "bloom filters must never have false negatives")
    val probes = (1 to 10000).map(i => s"absent$i")
    val fp = probes.count(k =>
      BloomUtils.mightContain(bits, UTF8String.fromString(k), 3, mBits))
    // k=3, n=2000, m=65536 -> theoretical fp ~ 0.06%; allow plenty of slack
    assert(fp < 200, s"false-positive rate implausibly high: $fp / 10000")
  }

  test("distributed build equals a single-threaded build") {
    val mBits = 1 << 12
    val keys = (1 to 500).map(i => s"k$i")
    val distributed = TextAnalysis.buildBloom(
      keys.toDF("k").repartition(8), "k", mBits, numHashes = 3)
    val local = new Array[Long](mBits / 64)
    keys.foreach(k => BloomUtils.add(local, UTF8String.fromString(k), 3, mBits))
    assert(distributed.toSeq === local.toSeq)
  }

  test("auto-sizing tracks eval cardinality: floor, linear middle, cap") {
    // floor: tiny eval sets still get the 2^20 minimum
    assert(TextAnalysis.bloomBitsFor(0) === (1 << 20))
    assert(TextAnalysis.bloomBitsFor(1000) === (1 << 20))
    // middle: next pow2 >= 12 bits/key — a 10x eval growth grows the
    // filter, which is exactly what the fixed 2^20 default failed to do
    // (round-6 scale curve: saturated bloom -> prune pass-through -> the
    // x10->x100 exponent read 1.09 instead of ~1 with a 99% prune)
    assert(TextAnalysis.bloomBitsFor(1000000) === (1 << 24))
    assert(TextAnalysis.bloomBitsFor(10000000) === (1 << 27))
    // exact power boundary: 12*n already a pow2 stays put
    assert(TextAnalysis.bloomBitsFor((1L << 21) / 12 + 1) === (1 << 22))
    // cap: never broadcast more than 32 MB of bits
    assert(TextAnalysis.bloomBitsFor(1L << 40) === (1 << 28))
  }

  test("bloom-pruned overlap equals the exact broadcast overlap") {
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val train = docs.filter($"doc_id" % 40 =!= 0)
    val eval = docs.filter($"doc_id" % 40 === 0)
    val exact = TextAnalysis.ngramOverlap(train, eval, "doc_id", "text", k = 4)
    val bloomed = TextAnalysis.bloomNgramOverlap(train, eval, "doc_id", "text", k = 4)
    assert(bloomed.except(exact).isEmpty && exact.except(bloomed).isEmpty)
  }
}
