package graft.operators

import graft.SparkSpec

/** int8 quantization edges (bulk behavior is oracle-checked by q72):
  * formula values, clamping, zero-vector guard, integer-dot exactness. */
class Int8QuantizeSpec extends SparkSpec {

  import spark.implicits._

  private def quantize(v: Seq[Float]): (Double, Seq[Int]) = {
    val row = Similarity.int8Quantize(Seq(Tuple1(v)).toDF("embedding"), "embedding")
      .select("qscale", "qvec").head()
    (row.getDouble(0), row.getSeq[Int](1))
  }

  test("floor(x/scale + 0.5) with max|x|/127 scaling") {
    val (scale, q) = quantize(Seq(1.0f, -0.5f, 0.0f))
    assert(math.abs(scale - 1.0 / 127) < 1e-12)
    assert(q === Seq(127, -63, 0)) // -63.5 + 0.5 = -63 exactly
  }

  test("all-zero vectors quantize to zeros via the epsilon guard") {
    val (scale, q) = quantize(Seq(0.0f, 0.0f))
    assert(scale > 0 && q === Seq(0, 0))
  }

  test("values clamp to ±127") {
    val (_, q) = quantize(Seq(5.0f, -5.0f, 5.0f))
    assert(q.forall(x => x >= -127 && x <= 127))
    assert(q === Seq(127, -127, 127))
  }

  test("integer dot matches a hand computation") {
    val df = Seq((Seq(1.0f, 2.0f, -1.0f), Seq(0.5f, 1.0f, 2.0f))).toDF("a", "b")
    val qa = Similarity.int8Quantize(df, "a")
      .withColumnRenamed("qvec", "a_q").withColumnRenamed("qscale", "a_s")
    val both = Similarity.int8Quantize(qa, "b")
    val row = both.select(Similarity.int8Dot("a_q", "qvec")).head()
    // a: scale 2/127, q = [64, 127, -63 (floor(-63.5+0.5) = -63)]
    // b: scale 2/127, q = [32, 64, 127]
    assert(row.getLong(0) === (64L * 32 + 127L * 64 - 63L * 127))
  }
}
