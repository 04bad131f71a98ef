package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** The REAL codec path: PPM encode/decode round-trip, luminance, and
  * nearest-neighbor downscale — through the same mapPartitions stages the
  * stubbed non-image payloads use. */
class PpmCodecSpec extends SparkSpec {

  import PpmCodec._

  /** Deterministic w×h gradient: r = x, g = y, b = (x+y) mod 256. */
  private def gradient(w: Int, h: Int): Image = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      rgb(i) = x.toByte; rgb(i + 1) = y.toByte; rgb(i + 2) = ((x + y) % 256).toByte
    }
    Image(w, h, rgb)
  }

  test("encode → decode round-trips pixels exactly; comments are skipped") {
    val img = gradient(16, 12)
    val decoded = decode(encode(img)).get
    assert(decoded.width == 16 && decoded.height == 12)
    assert(decoded.rgb.toSeq == img.rgb.toSeq)
    val withComment = "P6\n# a comment\n2 1\n255\n".getBytes("US-ASCII") ++
      Array[Byte](1, 2, 3, 4, 5, 6)
    val d2 = decode(withComment).get
    assert(d2.width == 2 && d2.height == 1 && d2.rgb.toSeq == Seq[Byte](1, 2, 3, 4, 5, 6))
  }

  test("malformed and non-image payloads decode to None") {
    assert(decode("not an image at all".getBytes).isEmpty)
    assert(decode("P6\n4 4\n255\n".getBytes).isEmpty) // truncated pixel data
    assert(decode("P6\n0 4\n255\n".getBytes).isEmpty) // zero dimension
    // hostile header whose w*h*3 overflows Int must return None, not index
    // past the (much smaller) buffer
    assert(decode(("P6\n38000 38000\n255\n" + "x" * 100).getBytes).isEmpty)
    // but a legitimately large wide image decodes fine (no arbitrary cap)
    val wide = Image(20000, 2, Array.fill(20000 * 2 * 3)(7.toByte))
    assert(decode(encode(wide)).exists(d => d.width == 20000 && d.height == 2))
  }

  test("luminance of uniform images is exact") {
    val white = Image(4, 4, Array.fill(48)(255.toByte))
    assert(math.abs(meanLuminance(white) - 1.0) < 1e-12)
    val black = Image(4, 4, Array.fill(48)(0.toByte))
    assert(meanLuminance(black) == 0.0)
  }

  test("downscale takes every factor-th pixel (nearest neighbor)") {
    val img = gradient(8, 8)
    val half = downscale(img, 2)
    assert(half.width == 4 && half.height == 4)
    for (y <- 0 until 4; x <- 0 until 4) {
      val src = ((y * 2) * 8 + (x * 2)) * 3
      val dst = (y * 4 + x) * 3
      assert(half.rgb(dst) == img.rgb(src))
      assert(half.rgb(dst + 1) == img.rgb(src + 1))
      assert(half.rgb(dst + 2) == img.rgb(src + 2))
    }
  }

  test("decodeFeatures and resize take the REAL path for PPM assets") {
    import spark.implicits._
    // two real images + one text payload (stub fallback) in one corpus
    val rows = Seq(
      (1L, new String(encode(gradient(16, 12)), "ISO-8859-1"), "image"),
      (2L, new String(encode(Image(4, 4, Array.fill(48)(255.toByte))), "ISO-8859-1"), "image"),
      (3L, "plain text payload", "text"))
    // route payloads through binary exactly like Multimodal.assets, but
    // latin-1 encode so arbitrary bytes survive the string column
    val df = rows.toDF("id", "payload_str", "tag")
      .select(col("id").cast("long").as("asset_id"),
        concat(lit("media/"), col("tag")).as("media_type"),
        expr("encode(payload_str, 'ISO-8859-1')").as("payload"))

    val feats = Multimodal.decodeFeatures(df).collect().map(f => f.asset_id -> f).toMap
    assert(math.abs(feats(2L).brightness - 1.0) < 1e-12) // white image: REAL luminance
    val expected1 = meanLuminance(gradient(16, 12))
    assert(math.abs(feats(1L).brightness - expected1) < 1e-12)

    val resized = Multimodal.resize(df, 2).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](2)).toMap
    val half = decode(resized(1L)).get // REAL path re-encodes a valid PPM
    assert(half.width == 8 && half.height == 6)
    assert(half.rgb.toSeq == downscale(gradient(16, 12), 2).rgb.toSeq)
    // the text payload used the byte-thinning fallback
    assert(resized(3L).length == ("plain text payload".length + 1) / 2)
  }
}
