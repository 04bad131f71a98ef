package graft.operators

import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal-column plumbing: image/audio/video payloads as opaque
  * `binary` columns with typed metadata, plus batch-shaped decode /
  * feature-extract / frame-sample stages (extension surface for
  * training-data pipelines).
  *
  * The Spark-side plumbing — schema, partition-parallel batch processing,
  * frame explosion — is real and tested. The codec step itself is STUBBED:
  * this container has no image/audio libraries, so `decodeFeatures` derives
  * deterministic fake features from the raw bytes where a real pipeline
  * would call a decoder. The stub is confined to the two clearly-marked
  * functions below; everything around them (column types, `mapPartitions`
  * batching, explode fanout) is production-shaped.
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
    * STUB: a real implementation would decode `payload` with a codec and
    * emit e.g. mean luminance; absent codecs, "brightness" is the mean of
    * the first 64 payload bytes normalized to [0,1) — deterministic, so the
    * pipeline stays testable end-to-end. */
  def decodeFeatures(assetsDf: DataFrame): Dataset[AssetFeatures] = {
    import assetsDf.sparkSession.implicits._
    assetsDf.select(col("asset_id"), col("media_type"), col("payload"))
      .mapPartitions { rows =>
        rows.map { r =>
          val id = r.getLong(0)
          val mt = r.getString(1)
          val payload = r.getAs[Array[Byte]](2)
          // ---- STUB decode begins (would be: codec.decode(payload)) ----
          val head = payload.take(64)
          val brightness =
            if (head.isEmpty) 0.0
            else head.map(b => (b & 0xFF).toDouble).sum / (head.length * 256.0)
          // ---- STUB decode ends ----
          val frames = (payload.length + FrameBytes - 1) / FrameBytes
          AssetFeatures(id, mt, payload.length.toLong, brightness, frames.toLong)
        }
      }
  }

  /** Batch-shaped "resize" via `mapPartitions` — the downscale stage of an
    * image/video pipeline, executor-local over binary payloads.
    *
    * STUB: a real implementation would decode, scale (e.g. bilinear to
    * target dims), and re-encode; absent codecs, the "resized" payload
    * keeps every `factor`-th byte — deterministic, length ceil(L/factor),
    * so the plumbing (binary in/out schema, batching, census arithmetic)
    * is oracle-checkable end-to-end. */
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
          // ---- STUB resize begins (would be: codec.rescale(payload)) ----
          val out = new Array[Byte]((payload.length + factor - 1) / factor)
          var i = 0
          while (i < out.length) { out(i) = payload(i * factor); i += 1 }
          // ---- STUB resize ends ----
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
