package graft.operators

import org.apache.spark.sql.functions._

import graft.SparkSpec

/** Real JPEG/PNG codec path (round-10 directive): the JDK's built-in
  * `javax.imageio` readers drive decode → luminance/resize → re-encode
  * through the same Multimodal stages PpmCodecSpec pins for PPM — with
  * MANUFACTURED real JPEG/PNG fixtures, not byte stubs. */
class ImageIoCodecSpec extends SparkSpec {

  import ImageIoCodec._
  import PpmCodec.{Image, decode => ppmDecode, downscale, meanLuminance}

  /** Deterministic w×h gradient: r = x, g = y, b = (x+y) mod 256. */
  private def gradient(w: Int, h: Int): Image = {
    val rgb = new Array[Byte](w * h * 3)
    for (y <- 0 until h; x <- 0 until w) {
      val i = (y * w + x) * 3
      rgb(i) = x.toByte; rgb(i + 1) = y.toByte; rgb(i + 2) = ((x + y) % 256).toByte
    }
    Image(w, h, rgb)
  }

  test("PNG encode → decode round-trips pixels exactly (lossless)") {
    val img = gradient(16, 12)
    val png = encodePng(img)
    assert(isPng(png) && !isJpeg(png))
    val decoded = decode(png).get
    assert(decoded.width == 16 && decoded.height == 12)
    assert(decoded.rgb.toSeq == img.rgb.toSeq)
  }

  test("JPEG decode is a REAL decode: dimensions exact, luminance within lossy tolerance") {
    val img = gradient(32, 24)
    val jpg = encodeJpeg(img)
    assert(isJpeg(jpg) && !isPng(jpg))
    val decoded = decode(jpg).get
    assert(decoded.width == 32 && decoded.height == 24)
    // baseline JPEG at default quality shifts individual samples but the
    // mean luminance of a smooth gradient survives within ~1%
    assert(math.abs(meanLuminance(decoded) - meanLuminance(img)) < 0.01)
    // and a uniform white JPEG decodes to (near-)white everywhere
    val white = decode(encodeJpeg(Image(8, 8, Array.fill(192)(255.toByte)))).get
    assert(meanLuminance(white) > 0.99)
  }

  test("decode → encodePng → decode is byte-stable (the pipeline's re-encode contract)") {
    val once = decode(encodeJpeg(gradient(16, 16))).get
    val again = decode(encodePng(once)).get
    assert(again.rgb.toSeq == once.rgb.toSeq)
  }

  test("malformed and non-image payloads decode to None, never throw") {
    assert(decode("not an image".getBytes).isEmpty) // magic gate
    assert(decode(Array[Byte](0xFF.toByte, 0xD8.toByte, 0xFF.toByte)).isEmpty) // JPEG SOI only
    val truncated = encodeJpeg(gradient(32, 32)).take(40) // header, no scan
    assert(decode(truncated).isEmpty)
    val pngCut = encodePng(gradient(16, 16)).take(20) // PNG sig + partial IHDR
    assert(decode(pngCut).isEmpty)
    // PPM magic is NOT ImageIO's business — stays on the PpmCodec path
    assert(decode(PpmCodec.encode(gradient(4, 4))).isEmpty)
  }

  test("decodeFeatures and resize take the REAL path for JPEG/PNG assets in a mixed corpus") {
    import spark.implicits._
    val jpgImg = gradient(32, 24)
    val pngImg = gradient(16, 12)
    val rows = Seq(
      (1L, new String(encodeJpeg(jpgImg), "ISO-8859-1"), "jpeg"),
      (2L, new String(encodePng(pngImg), "ISO-8859-1"), "png"),
      (3L, new String(PpmCodec.encode(gradient(8, 8)), "ISO-8859-1"), "ppm"),
      (4L, "plain text payload", "text"))
    val df = rows.toDF("id", "payload_str", "tag")
      .select(col("id").cast("long").as("asset_id"),
        concat(lit("media/"), col("tag")).as("media_type"),
        expr("encode(payload_str, 'ISO-8859-1')").as("payload"))

    val feats = Multimodal.decodeFeatures(df).collect().map(f => f.asset_id -> f).toMap
    // REAL luminance for all three image formats (JPEG within lossy tolerance)
    assert(math.abs(feats(1L).brightness -
      meanLuminance(decode(encodeJpeg(jpgImg)).get)) < 1e-12)
    assert(math.abs(feats(2L).brightness - meanLuminance(pngImg)) < 1e-12)
    assert(math.abs(feats(3L).brightness - meanLuminance(gradient(8, 8))) < 1e-12)

    val resized = Multimodal.resize(df, 2).collect()
      .map(r => r.getLong(0) -> r.getAs[Array[Byte]](2)).toMap
    // PNG in → PNG out, pixels exactly the nearest-neighbor downscale
    assert(isPng(resized(2L)))
    val halfPng = decode(resized(2L)).get
    assert(halfPng.width == 8 && halfPng.height == 6)
    assert(halfPng.rgb.toSeq == downscale(pngImg, 2).rgb.toSeq)
    // JPEG in → lossless PNG out of the DECODED-then-downscaled pixels
    assert(isPng(resized(1L)))
    val halfJpg = decode(resized(1L)).get
    assert(halfJpg.width == 16 && halfJpg.height == 12)
    assert(halfJpg.rgb.toSeq ==
      downscale(decode(encodeJpeg(jpgImg)).get, 2).rgb.toSeq)
    // PPM stays on the PpmCodec path (PPM out), text stays on the stub
    assert(ppmDecode(resized(3L)).exists(_.width == 4))
    assert(resized(4L).length == ("plain text payload".length + 1) / 2)
  }
}
