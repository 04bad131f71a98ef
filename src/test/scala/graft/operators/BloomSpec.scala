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

  test("bloom-pruned overlap equals the exact broadcast overlap") {
    val docs = graft.sources.Tables.load(spark, sfDir, "documents")
    val train = docs.filter($"doc_id" % 40 =!= 0)
    val eval = docs.filter($"doc_id" % 40 === 0)
    val exact = TextAnalysis.ngramOverlap(train, eval, "doc_id", "text", k = 4)
    val bloomed = TextAnalysis.bloomNgramOverlap(train, eval, "doc_id", "text", k = 4)
    assert(bloomed.except(exact).isEmpty && exact.except(bloomed).isEmpty)
  }
}
