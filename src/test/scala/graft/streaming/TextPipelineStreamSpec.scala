package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.operators.{Sampling, TextAnalysis}
import graft.sources.Tables

/** The training-data scrub pipeline as a stream: because every text
  * operator (PII redaction, repetition scoring, quality-weighted
  * sampling) is a deterministic Column expression — no windows, no
  * state — the SAME code runs over readStream unchanged, and a streaming
  * pass over the corpus must produce byte-identical results to the batch
  * pass. That is the scale story for continuous ingestion: one pipeline
  * definition, batch backfill + streaming tail. */
class TextPipelineStreamSpec extends SparkSpec {

  test("streamed scrub+filter+sample pipeline equals the batch pass exactly") {
    val srcDir = Files.createTempDirectory("txt_stream_src").toString
    val docs = Tables.load(spark, sfDir, "documents").cache()
    docs.write.parquet(s"$srcDir/files")

    def pipeline(df: org.apache.spark.sql.DataFrame) = {
      val scored = df
        .withColumn("redacted", TextAnalysis.redactPii(col("text")))
        .withColumn("dup_frac", TextAnalysis.dupTrigramFraction("text"))
        .filter(col("dup_frac") < 0.5)
      Sampling.qualityWeighted(scored, "text",
        least(lit(1.0), TextAnalysis.tokenCount(col("text")).cast("double") / 150.0))
        .select(col("doc_id"), col("redacted"), col("dup_frac"))
    }

    val ckpt = Files.createTempDirectory("txt_stream_ckpt").toString
    val q = pipeline(
      spark.readStream.schema(docs.schema).parquet(s"$srcDir/files"))
      .writeStream.format("memory").queryName("txt_pipe")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.table("txt_pipe").collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    val batch = pipeline(docs).collect()
      .map(r => (r.getLong(0), r.getString(1), r.getDouble(2))).toSet
    assert(streamed === batch)
    assert(batch.nonEmpty && batch.size < docs.count())
  }

  test("streamed logistic quality classifier equals the batch scores exactly") {
    // q121's model-based gate is also a pure Column expression — the same
    // fixed-weight sigmoid runs over readStream unchanged, so continuous
    // ingestion scores documents identically to the batch backfill
    val srcDir = Files.createTempDirectory("clf_stream_src").toString
    val docs = Tables.load(spark, sfDir, "documents").cache()
    docs.write.parquet(s"$srcDir/files")

    def classify(df: org.apache.spark.sql.DataFrame) = {
      val p = concat(lit(" "), col("text"), lit(" "))
      df.withColumn("n_tokens", TextAnalysis.tokenCount(col("text")))
        .withColumn("z",
          lit(10.0) * ((TextAnalysis.occurrences(p, " the ") +
              TextAnalysis.occurrences(p, " a ")).cast("double") / col("n_tokens")) -
            lit(1.0) +
            lit(2.0) * (length(col("text")).cast("double") / col("n_tokens") - lit(5.0)) -
            lit(5.0) * TextAnalysis.dupTrigramFraction("text"))
        .select(col("doc_id"), col("z"), (col("z") >= 0.0).as("accepted"))
    }

    val ckpt = Files.createTempDirectory("clf_stream_ckpt").toString
    val q = classify(
      spark.readStream.schema(docs.schema).parquet(s"$srcDir/files"))
      .writeStream.format("memory").queryName("clf_pipe")
      .option("checkpointLocation", ckpt)
      .trigger(Trigger.AvailableNow())
      .start()
    q.awaitTermination()

    val streamed = spark.table("clf_pipe").collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
    val batch = classify(docs).collect()
      .map(r => (r.getLong(0), r.getDouble(1), r.getBoolean(2))).toSet
    assert(streamed === batch)
    // both classes occur on the fixture — the gate is not degenerate
    assert(batch.exists(_._3) && batch.exists(!_._3))
  }
}
