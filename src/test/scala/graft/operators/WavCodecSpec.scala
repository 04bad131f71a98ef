package graft.operators

import java.nio.{ByteBuffer, ByteOrder}

import org.scalatest.funsuite.AnyFunSuite

/** RIFF/WAV codec (round-13 verdict item 6: the audio stub closes with a
  * real dependency-free parse, mirroring PpmCodec's seam). */
class WavCodecSpec extends AnyFunSuite {

  private def clip(raw: Long): Short =
    math.max(-32768L, math.min(32767L, raw)).toShort

  test("encode→decode round-trips rate/channels/frames and censuses clip/peak") {
    val samples = Array[Short](0, 100, -200, 32767, -32768, 31000, -31000, 5)
    val wav = WavCodec.encode(16000, 2, samples)
    assert(wav.length === 44 + samples.length * 2)
    val info = WavCodec.decode(wav).get
    assert(info.sampleRate === 16000)
    assert(info.channels === 2)
    assert(info.bitsPerSample === 16)
    assert(info.nFrames === 4L) // 8 samples interleaved over 2 channels
    assert(info.clipped === 2L) // exactly the two full-scale samples
    assert(info.peak === 32768) // |−32768| in int space
  }

  test("chunk walk skips unknown chunks and handles odd-size padding") {
    val samples = Array[Short](1, 2, 3)
    val plain = WavCodec.encode(8000, 1, samples)
    // splice a 3-byte (odd) LIST chunk between "fmt " and "data": RIFF
    // pads odd chunks to even offsets, and a reader that forgets the pad
    // byte misparses every following chunk id
    val fmtEnd = 12 + 8 + 16
    val spliced = ByteBuffer.allocate(plain.length + 8 + 4)
      .order(ByteOrder.LITTLE_ENDIAN)
    spliced.put(plain, 0, fmtEnd)
    spliced.put("LIST".getBytes("US-ASCII")).putInt(3)
    spliced.put(Array[Byte](7, 8, 9, 0)) // 3 payload bytes + 1 pad
    spliced.put(plain, fmtEnd, plain.length - fmtEnd)
    val bytes = spliced.array()
    // fix the RIFF size field for the inserted 12 bytes
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(4, bytes.length - 8)
    val info = WavCodec.decode(bytes).get
    assert(info.nFrames === 3L && info.sampleRate === 8000 && info.peak === 3)
  }

  test("data chunk before fmt still decodes (RIFF allows any chunk order)") {
    val samples = Array[Short](40, -40)
    val plain = WavCodec.encode(12000, 1, samples)
    val out = ByteBuffer.allocate(plain.length).order(ByteOrder.LITTLE_ENDIAN)
    out.put(plain, 0, 12)                       // RIFF header
    out.put(plain, 36, plain.length - 36)       // data chunk first
    out.put(plain, 12, 24)                      // then fmt
    val info = WavCodec.decode(out.array()).get
    assert(info.nFrames === 2L && info.sampleRate === 12000 && info.peak === 40)
  }

  test("malformed payloads return None, never throw") {
    assert(WavCodec.decode(Array.emptyByteArray).isEmpty)
    assert(WavCodec.decode("not audio at all, just text padding out to length"
      .getBytes("US-ASCII")).isEmpty)
    val good = WavCodec.encode(8000, 1, Array[Short](1, 2, 3, 4))
    assert(WavCodec.decode(good.take(30)).isEmpty, "truncated header")
    // data size field larger than the remaining bytes = truncated chunk
    val lying = good.clone()
    ByteBuffer.wrap(lying).order(ByteOrder.LITTLE_ENDIAN).putInt(40, 9999)
    assert(WavCodec.decode(lying).isEmpty)
    // float PCM (format 3) is out of scope — decline, don't misparse
    val float32 = good.clone()
    ByteBuffer.wrap(float32).order(ByteOrder.LITTLE_ENDIAN).putShort(20, 3)
    assert(WavCodec.decode(float32).isEmpty)
    // 8-bit likewise
    val eightBit = good.clone()
    ByteBuffer.wrap(eightBit).order(ByteOrder.LITTLE_ENDIAN).putShort(34, 8)
    assert(WavCodec.decode(eightBit).isEmpty)
  }

  test("a final odd-sized chunk with no trailing pad byte decodes, never throws") {
    // real WAV writers routinely omit the RIFF pad byte on a final odd
    // chunk; the padded-offset walk must clamp to the buffer end instead
    // of throwing IllegalArgumentException (round-14 advice)
    val plain = WavCodec.encode(8000, 1, Array[Short](5, -6, 7))
    // append a 3-byte LIST chunk with NO pad byte as the last chunk
    val out = ByteBuffer.allocate(plain.length + 8 + 3).order(ByteOrder.LITTLE_ENDIAN)
    out.put(plain)
    out.put("LIST".getBytes("US-ASCII")).putInt(3)
    out.put(Array[Byte](1, 2, 3))
    val bytes = out.array()
    ByteBuffer.wrap(bytes).order(ByteOrder.LITTLE_ENDIAN).putInt(4, bytes.length - 8)
    val info = WavCodec.decode(bytes).get
    assert(info.nFrames === 3L && info.peak === 7)
    // and when the unpadded odd tail is an UNKNOWN chunk before fmt/data
    // are both found, the walk still terminates cleanly: fmt-only + odd
    // unpadded LIST tail → no data chunk → None, not a throw
    val headerOnly = plain.take(12 + 8 + 16) // RIFF + fmt
    val tail = ByteBuffer.allocate(headerOnly.length + 8 + 3)
      .order(ByteOrder.LITTLE_ENDIAN)
    tail.put(headerOnly)
    tail.put("LIST".getBytes("US-ASCII")).putInt(3)
    tail.put(Array[Byte](9, 9, 9))
    val tailBytes = tail.array()
    ByteBuffer.wrap(tailBytes).order(ByteOrder.LITTLE_ENDIAN)
      .putInt(4, tailBytes.length - 8)
    assert(WavCodec.decode(tailBytes).isEmpty)
  }

  test("the q196 synthesis contract: clamped encode matches the raw-domain census") {
    // decoder clipped (samples at full scale) ⇔ oracle clipped (raw at or
    // beyond full scale) — the equivalence q196's DuckDB twin relies on
    val id = 17L
    val raws = (0 until 128).map(i => (id * 7 + i * 13) % 70000L - 35000L)
    val info = WavCodec.decode(
      WavCodec.encode(8000, 1, raws.map(clip).toArray)).get
    assert(info.clipped === raws.count(r => r >= 32767L || r <= -32768L).toLong)
    assert(info.peak === raws.map(r => math.abs(clip(r).toInt)).max)
  }

  test("decodeFeatures routes WAV payloads through the real audio path") {
    val spark = graft.SparkSpec.session
    import spark.implicits._
    val wav = WavCodec.encode(8000, 1, Array[Short](0, 16384, -32768))
    val assets = Seq((1L, "media/audio", wav)).toDF("asset_id", "media_type", "payload")
    val feats = graft.operators.Multimodal.decodeFeatures(assets).collect()
    assert(feats.length === 1)
    assert(feats.head.brightness === 1.0, "peak/32768 for a full-scale clip")
  }
}
