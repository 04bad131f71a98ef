package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

/** Real RIFF/WAV codec — pure JVM, dependency-free like [[PpmCodec]]
  * (round-13 verdict item 6: audio sat stubbed behind the multimodal seam
  * while PPM/JPEG/PNG had real paths; RIFF header + PCM parse needs no
  * library at all). Closes the audio half of the documented stub; video
  * remains behind the same seam.
  *
  * Scope: 16-bit integer PCM (`fmt` audioFormat 1), the interchange
  * baseline — compressed or float WAVs return None and fall back to the
  * caller's non-audio path, the same contract as [[PpmCodec.decode]] /
  * [[ImageIoCodec.decode]]. The chunk walk is spec-compliant: chunks in
  * any order, unknown chunks (LIST/INFO/fact/cue) skipped, odd-sized
  * chunks padded to even offsets per RIFF. Truncated or malformed bytes
  * return None rather than throwing, so a corrupt asset never kills a
  * partition task.
  *
  * Reference scope note: the reference moves tabular data only — this is
  * extension surface for training-data pipelines (SURVEY §2 multimodal
  * row), where an audio corpus census needs duration/rate/clipping
  * without shipping samples to the driver. */
object WavCodec {

  /** One decoded clip's census.
    *
    * `nFrames` = sample frames per channel (duration = nFrames /
    * sampleRate — kept as the exact integer pair rather than a float so
    * cross-engine oracles stay hash-stable). `clipped` counts samples AT
    * full scale (-32768 or 32767) across all channels — the standard
    * clipping census: any clamped-on-encode sample lands exactly at full
    * scale. `peak` = max |sample| (32768 for a full-scale negative). */
  final case class WavInfo(channels: Int, sampleRate: Int, bitsPerSample: Int,
                           nFrames: Long, clipped: Long, peak: Int)

  /** Encode interleaved 16-bit PCM samples as a canonical 44-byte-header
    * WAV. `samples.length` must be a multiple of `channels`. */
  def encode(sampleRate: Int, channels: Int, samples: Array[Short]): Array[Byte] = {
    require(channels > 0 && sampleRate > 0, "channels and sampleRate must be positive")
    require(samples.length % channels == 0,
      s"${samples.length} samples do not interleave over $channels channels")
    val dataLen = samples.length * 2
    val buf = ByteBuffer.allocate(44 + dataLen).order(ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1) // PCM
    buf.putShort(channels.toShort)
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * channels * 2) // byte rate
    buf.putShort((channels * 2).toShort)  // block align
    buf.putShort(16)                      // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Decode a WAV's census without materializing samples anywhere but the
    * streaming loop — None for anything that is not well-formed 16-bit
    * PCM. */
  def decode(bytes: Array[Byte]): Option[WavInfo] = {
    if (!looksDecodable(bytes)) return None
    val buf = ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
    buf.position(12) // past RIFF<size>WAVE
    var fmt: Option[(Int, Int, Int, Int)] = None // format, channels, rate, bits
    var data: Option[(Int, Int)] = None          // offset, length
    while (buf.remaining() >= 8 && (fmt.isEmpty || data.isEmpty)) {
      val id = new String(Array(buf.get(), buf.get(), buf.get(), buf.get()), "US-ASCII")
      val size = buf.getInt
      if (size < 0 || size > buf.remaining()) return None // truncated chunk
      val start = buf.position()
      id match {
        case "fmt " =>
          if (size < 16) return None
          val audioFormat = buf.getShort & 0xFFFF
          val channels = buf.getShort & 0xFFFF
          val rate = buf.getInt
          buf.getInt   // byte rate (derivable)
          buf.getShort // block align (derivable)
          val bits = buf.getShort & 0xFFFF
          fmt = Some((audioFormat, channels, rate, bits))
        case "data" =>
          data = Some((start, size))
        case _ => // LIST/INFO/fact/cue/… — skip
      }
      // RIFF pads odd-sized chunks to even offsets — but a FINAL odd-sized
      // chunk often ships without its pad byte (common in real writers),
      // and positioning one past the limit would throw instead of honoring
      // the never-throw contract. Clamp: a padded offset beyond the buffer
      // is end-of-stream, and whatever chunks were parsed stand.
      buf.position(math.min(start + size + (size & 1), buf.limit()))
    }
    for {
      (audioFormat, channels, rate, bits) <- fmt
      (off, len) <- data
      if audioFormat == 1 && bits == 16 && channels > 0 && rate > 0
    } yield {
      val nSamples = len / 2
      var clipped = 0L
      var peak = 0
      var i = 0
      while (i < nSamples) {
        val s: Int = buf.getShort(off + i * 2)
        if (s == Short.MinValue || s == Short.MaxValue) clipped += 1
        val a = math.abs(s)
        if (a > peak) peak = a
        i += 1
      }
      WavInfo(channels, rate, bits, nSamples.toLong / channels, clipped, peak)
    }
  }

  /** Cheap magic-byte gate so non-audio payloads never pay a chunk walk
    * — mirrors [[ImageIoCodec.looksDecodable]]. */
  def looksDecodable(b: Array[Byte]): Boolean =
    b.length >= 44 &&
      b(0) == 'R' && b(1) == 'I' && b(2) == 'F' && b(3) == 'F' &&
      b(8) == 'W' && b(9) == 'A' && b(10) == 'V' && b(11) == 'E'
}
