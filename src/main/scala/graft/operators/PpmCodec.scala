package graft.operators

/** Minimal real image codec — binary PPM (P6), implementable in pure JVM
  * with no external libraries, so the multimodal decode/resize stages can
  * run a REAL decode path in this container. P6 is raw 8-bit RGB behind a
  * text header; production pipelines swap in JPEG/PNG codecs behind the
  * same (bytes → pixels → bytes) signatures. */
object PpmCodec {

  final case class Image(width: Int, height: Int, rgb: Array[Byte])

  def isPpm(bytes: Array[Byte]): Boolean =
    bytes.length > 2 && bytes(0) == 'P' && bytes(1) == '6' &&
      (bytes(2) == '\n' || bytes(2) == ' ' || bytes(2) == '\t' || bytes(2) == '\r')

  /** Encode 8-bit RGB as P6 (maxval 255). */
  def encode(img: Image): Array[Byte] = {
    require(img.rgb.length == img.width * img.height * 3, "rgb length != w*h*3")
    val header = s"P6\n${img.width} ${img.height}\n255\n".getBytes("US-ASCII")
    val out = new Array[Byte](header.length + img.rgb.length)
    System.arraycopy(header, 0, out, 0, header.length)
    System.arraycopy(img.rgb, 0, out, header.length, img.rgb.length)
    out
  }

  /** Decode P6 (handles whitespace and `#` comments in the header);
    * returns None on anything malformed rather than throwing — callers
    * fall back to their non-image path. */
  def decode(bytes: Array[Byte]): Option[Image] = {
    if (!isPpm(bytes)) return None
    var i = 2
    def skipWs(): Unit = {
      var more = true
      while (more && i < bytes.length) {
        val b = bytes(i)
        if (b == '#') { while (i < bytes.length && bytes(i) != '\n') i += 1 }
        else if (b == ' ' || b == '\n' || b == '\t' || b == '\r') i += 1
        else more = false
      }
    }
    def readInt(): Option[Int] = {
      skipWs()
      var v = 0
      var any = false
      while (i < bytes.length && bytes(i) >= '0' && bytes(i) <= '9') {
        v = v * 10 + (bytes(i) - '0'); i += 1; any = true
      }
      if (any) Some(v) else None
    }
    for {
      w <- readInt()
      h <- readInt()
      maxVal <- readInt()
      if maxVal == 255 && w > 0 && h > 0
      // exactly one whitespace byte separates the header from pixel data.
      // The length comparison runs in Long: a hostile "P6 38000 38000"
      // header would wrap w*h*3 in Int and index past the buffer. Passing
      // it also proves w*h*3 fits an Int (it is ≤ bytes.length).
      if i < bytes.length && { i += 1; bytes.length.toLong - i >= w.toLong * h * 3 }
    } yield Image(w, h, java.util.Arrays.copyOfRange(bytes, i, i + w * h * 3))
  }

  /** Rec.601 mean luminance in [0,1]. */
  def meanLuminance(img: Image): Double = {
    if (img.rgb.isEmpty) return 0.0
    var acc = 0.0
    var i = 0
    while (i < img.rgb.length) {
      val r = img.rgb(i) & 0xFF
      val g = img.rgb(i + 1) & 0xFF
      val b = img.rgb(i + 2) & 0xFF
      acc += 0.299 * r + 0.587 * g + 0.114 * b
      i += 3
    }
    acc / (img.rgb.length / 3) / 255.0
  }

  /** Nearest-neighbor downscale by an integer factor. */
  def downscale(img: Image, factor: Int): Image = {
    require(factor >= 1)
    val w = math.max(1, img.width / factor)
    val h = math.max(1, img.height / factor)
    val out = new Array[Byte](w * h * 3)
    var y = 0
    while (y < h) {
      var x = 0
      while (x < w) {
        val src = ((y * factor) * img.width + (x * factor)) * 3
        val dst = (y * w + x) * 3
        out(dst) = img.rgb(src)
        out(dst + 1) = img.rgb(src + 1)
        out(dst + 2) = img.rgb(src + 2)
        x += 1
      }
      y += 1
    }
    Image(w, h, out)
  }
}
