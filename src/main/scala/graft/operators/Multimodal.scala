package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus batch-shaped decode /
  * feature-extract / frame-sample stages (extension surface for
  * training-data pipelines).
  *
  * The Spark-side plumbing — schema, partition-parallel batch processing,
  * frame explosion — is real and tested. The codec step runs a REAL
  * decode for PPM (P6) payloads via [[PpmCodec]] (pure JVM), for
  * JPEG/PNG payloads via [[ImageIoCodec]] (the JDK's built-in
  * `javax.imageio` readers — round 10 established the "no image libs in
  * this container" premise was wrong for these formats), and for RIFF/WAV
  * audio via [[WavCodec]] (round 14 — header+PCM parse is
  * dependency-free); payloads that are none of the four fall back to a
  * clearly-marked deterministic byte-derived STUB so mixed corpora stay
  * testable end-to-end. Video remains the one stubbed modality behind
  * this seam (no dependency-free container parser exists for it).
  */
object Multimodal {

  /** One decoded asset's features. `media_type` rides alongside so
    * downstream grouping never re-joins the catalog. */
  final case class AssetFeatures(
      asset_id: Long,
      media_type: String,
      n_bytes: Long,
      brightness: Double, // STUB value — see decodeFeatures
      n_frames: Long)

  /** Frame size used by the fake frame segmentation (bytes per "frame"). */
  val FrameBytes = 256

  /** Build an asset table from any (id, string-payload, tag) source: the
    * payload becomes an opaque binary column — exactly how real media bytes
    * would arrive from object storage — with typed metadata alongside. */
  def assets(df: DataFrame, idCol: String, payloadCol: String, tagCol: String): DataFrame =
    df.select(
      col(idCol).cast("long").as("asset_id"),
      concat(lit("media/"), col(tagCol)).as("media_type"),
      col(payloadCol).cast("binary").as("payload"))
      .withColumn("meta", struct(
        length(col("payload")).cast("long").as("n_bytes"),
        substring(md5(col("payload")), 1, 16).as("fingerprint")))

  /** Batch-shaped decode + feature extraction via `mapPartitions` — the
    * Scala analogue of a Pandas-UDF `mapInPandas` stage: one JVM-side batch
    * iterator per partition, no per-row UDF dispatch, executor-local.
    *
    * PPM and JPEG/PNG payloads take the REAL path: decode → Rec.601 mean
    * luminance. WAV payloads take the REAL audio path: decode → peak
    * amplitude normalized to [0,1] — the scalar an audio-quality funnel
    * gates on, playing the role luminance plays for images. Other
    * payloads fall back to the STUB (mean of the first 64 bytes
    * normalized to [0,1)) — deterministic, so mixed corpora stay
    * testable. */
  def decodeFeatures(assetsDf: DataFrame): Dataset[AssetFeatures] = {
    import assetsDf.sparkSession.implicits._
    assetsDf.select(col("asset_id"), col("media_type"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val mt = r.getString(1)
          val payload = r.getAs[Array[Byte]](2)
          val brightness =
            PpmCodec.decode(payload).orElse(ImageIoCodec.decode(payload)) match {
              case Some(img) => PpmCodec.meanLuminance(img) // REAL decode
              case None => WavCodec.decode(payload) match {
                case Some(wav) => wav.peak / 32768.0 // REAL audio decode
                case None =>
                  // ---- STUB fallback (non-media payloads, no codec) ----
                  val head = payload.take(64)
                  if (head.isEmpty) 0.0
                  else head.map(b => (b & 0xFF).toDouble).sum / (head.length * 256.0)
                // ---- STUB fallback ends ----
              }
            }
          val frames = (payload.length + FrameBytes - 1) / FrameBytes
          AssetFeatures(id, mt, payload.length.toLong, brightness, frames.toLong)
        }
      }
  }

  /** Batch-shaped resize via `mapPartitions` — the downscale stage of an
    * image/video pipeline, executor-local over binary payloads.
    *
    * PPM payloads take the REAL path: decode → nearest-neighbor downscale
    * by `factor` → re-encode as PPM. JPEG/PNG payloads decode through
    * [[ImageIoCodec]], downscale the same way, and re-encode as PNG
    * (lossless, so the resized asset decodes back byte-stably; JPEG
    * re-encode would stack generation loss). Other payloads fall back to
    * the STUB (keep every `factor`-th byte — deterministic, length
    * ceil(L/factor)), which is what the byte-census oracle queries
    * exercise. */
  def resize(assetsDf: DataFrame, factor: Int = 2): DataFrame = {
    val spark = assetsDf.sparkSession
    val schema = org.apache.spark.sql.types.StructType(Seq(
      org.apache.spark.sql.types.StructField("asset_id", org.apache.spark.sql.types.LongType),
      org.apache.spark.sql.types.StructField("media_type", org.apache.spark.sql.types.StringType),
      org.apache.spark.sql.types.StructField("resized", org.apache.spark.sql.types.BinaryType)))
    val enc = org.apache.spark.sql.Encoders.row(schema)
    assetsDf.select(col("asset_id"), col("media_type"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val payload = r.getAs[Array[Byte]](2)
          val out = PpmCodec.decode(payload) match {
            case Some(img) => // REAL decode → scale → re-encode (PPM in, PPM out)
              PpmCodec.encode(PpmCodec.downscale(img, factor))
            case None => ImageIoCodec.decode(payload) match {
              case Some(img) => // REAL decode → scale → PNG out (lossless)
                ImageIoCodec.encodePng(PpmCodec.downscale(img, factor))
              case None =>
                // ---- STUB fallback (non-image payloads, no codec) ----
                val thin = new Array[Byte]((payload.length + factor - 1) / factor)
                var i = 0
                while (i < thin.length) { thin(i) = payload(i * factor); i += 1 }
                thin
              // ---- STUB fallback ends ----
            }
          }
          org.apache.spark.sql.Row(r.getLong(0), r.getString(1), out)
        }
      }(enc)
  }

  /** Frame sampling: segment the payload into [[FrameBytes]] "frames" and
    * keep every `everyN`-th — the explode-style fanout a video pipeline
    * needs, with the frame payload as a binary slice. */
  def sampleFrames(assetsDf: DataFrame, everyN: Int = 4): DataFrame = {
    val nFrames = ceil(length(col("payload")).cast("double") / FrameBytes).cast("int")
    assetsDf
      .withColumn("frame_idx",
        explode(sequence(lit(0), greatest(nFrames - 1, lit(0)))))
      .filter(col("frame_idx") % everyN === 0)
      .select(
        col("asset_id"), col("media_type"), col("frame_idx"),
        expr(s"substring(payload, frame_idx * $FrameBytes + 1, $FrameBytes)")
          .as("frame_payload"))
  }
}
