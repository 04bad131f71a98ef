package graft.operators

import java.io.{ByteArrayInputStream, ByteArrayOutputStream}
import java.awt.image.BufferedImage
import javax.imageio.ImageIO

/** Real JPEG/PNG codec over the JDK's BUILT-IN `javax.imageio` readers —
  * no external libraries (the "no image libs in this container" premise
  * held only for exotic formats: ImageIO's JPEG/PNG/GIF/BMP plugins ship
  * with every JDK and are headless-safe). Decodes to the same
  * (width, height, packed RGB bytes) representation as [[PpmCodec]], so
  * the multimodal feature/resize stages run one pixel pipeline whatever
  * the container format (reference scope note: the reference tool moves
  * tabular data only — this is extension surface for training-data
  * pipelines, cited against SURVEY §2's multimodal row).
  *
  * Determinism: decoding is deterministic per JDK for a given payload
  * (JPEG inverse-DCT rounding is implementation-fixed), and the PNG
  * encoder is lossless — so decode→encodePng→decode is byte-stable, the
  * property the specs pin. Cross-JDK-vendor JPEG rounding may differ by
  * ±1/255 per sample, which is why the image queries' DuckDB oracles stay
  * on the byte-census/PPM paths and the JPEG path is spec-verified.
  */
object ImageIoCodec {

  // one-time: never spill decode scratch to disk-backed cache files on
  // executors (ImageIO defaults to a temp-file cache)
  ImageIO.setUseCache(false)

  def isJpeg(b: Array[Byte]): Boolean =
    b.length > 3 && (b(0) & 0xFF) == 0xFF && (b(1) & 0xFF) == 0xD8 &&
      (b(2) & 0xFF) == 0xFF

  def isPng(b: Array[Byte]): Boolean =
    b.length > 8 && (b(0) & 0xFF) == 0x89 && b(1) == 'P' && b(2) == 'N' &&
      b(3) == 'G'

  /** Cheap magic-byte gate so non-image payloads never pay an ImageIO
    * reader probe. */
  def looksDecodable(b: Array[Byte]): Boolean = isJpeg(b) || isPng(b)

  /** Decode JPEG/PNG bytes to packed 8-bit RGB; None on anything
    * malformed (truncated scan, bad header) rather than throwing —
    * callers fall back to their non-image path, same contract as
    * [[PpmCodec.decode]]. */
  def decode(bytes: Array[Byte]): Option[PpmCodec.Image] = {
    if (!looksDecodable(bytes)) return None
    try {
      val buf = ImageIO.read(new ByteArrayInputStream(bytes))
      if (buf == null) None
      else {
        val w = buf.getWidth
        val h = buf.getHeight
        if (w <= 0 || h <= 0 || w.toLong * h * 3 > Int.MaxValue) None
        else {
          // one bulk getRGB: ImageIO converts any source color model
          // (grayscale PNG, CMYK-less baseline JPEG, palette) to sRGB ints
          val px = buf.getRGB(0, 0, w, h, null, 0, w)
          val rgb = new Array[Byte](w * h * 3)
          var i = 0
          var j = 0
          while (i < px.length) {
            val p = px(i)
            rgb(j) = ((p >> 16) & 0xFF).toByte
            rgb(j + 1) = ((p >> 8) & 0xFF).toByte
            rgb(j + 2) = (p & 0xFF).toByte
            i += 1
            j += 3
          }
          Some(PpmCodec.Image(w, h, rgb))
        }
      }
    } catch { case scala.util.control.NonFatal(_) => None }
  }

  private def toBufferedImage(img: PpmCodec.Image): BufferedImage = {
    require(img.rgb.length == img.width * img.height * 3, "rgb length != w*h*3")
    val buf = new BufferedImage(img.width, img.height, BufferedImage.TYPE_INT_RGB)
    val px = new Array[Int](img.width * img.height)
    var i = 0
    var j = 0
    while (i < px.length) {
      px(i) = ((img.rgb(j) & 0xFF) << 16) | ((img.rgb(j + 1) & 0xFF) << 8) |
        (img.rgb(j + 2) & 0xFF)
      i += 1
      j += 3
    }
    buf.setRGB(0, 0, img.width, img.height, px, 0, img.width)
    buf
  }

  private def encodeAs(img: PpmCodec.Image, fmt: String): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    ImageIO.write(toBufferedImage(img), fmt, bos)
    bos.toByteArray
  }

  /** Encode packed RGB as PNG — lossless, so resized JPEG/PNG assets
    * round-trip byte-stably through decode. */
  def encodePng(img: PpmCodec.Image): Array[Byte] = encodeAs(img, "png")

  /** Encode packed RGB as baseline JPEG (default quality) — used by specs
    * to MANUFACTURE real JPEG fixtures; the pipeline's re-encode side
    * stays PNG because JPEG is lossy. */
  def encodeJpeg(img: PpmCodec.Image): Array[Byte] = encodeAs(img, "jpg")
}
