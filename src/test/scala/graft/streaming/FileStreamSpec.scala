package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.Trigger

import graft.SparkSpec
import graft.sources.Tables

/** Incremental-batch parity (SURVEY §2.10): the reference's
  * checkpoint+OFFSET resume collapses into Structured Streaming's
  * `checkpointLocation` + `Trigger.AvailableNow` — files that arrive
  * between runs are processed exactly once, verified by restarting the
  * query after dropping new files in. */
class FileStreamSpec extends SparkSpec {

  test("AvailableNow file stream processes arrivals exactly once across restarts") {
    val srcDir = Files.createTempDirectory("stream_src").toString
    val ckpt = Files.createTempDirectory("stream_ckpt").toString
    val events = Tables.load(spark, sfDir, "events").cache()
    val schema = events.schema

    def runOnce(): Long = {
      val stream = spark.readStream.schema(schema)
        .option("recursiveFileLookup", "true").parquet(srcDir)
        .groupBy(col("event_type")).agg(count(lit(1)).as("cnt"))
      val q = stream.writeStream
        .format("memory").queryName("fs_counts")
        .outputMode("complete")
        .option("checkpointLocation", ckpt)
        .trigger(Trigger.AvailableNow())
        .start()
      q.awaitTermination()
      spark.table("fs_counts").agg(sum("cnt")).collect()(0).getLong(0)
    }

    // first batch of files
    events.filter(col("event_id") % 2 === 0).write.parquet(s"$srcDir/part1")
    spark.read.parquet(s"$srcDir/part1") // materialize check
    val firstTotal = runOnce()
    assert(firstTotal === events.filter(col("event_id") % 2 === 0).count())

    // new files arrive; restart from checkpoint → only the delta is added
    events.filter(col("event_id") % 2 === 1).write.parquet(s"$srcDir/part2")
    val secondTotal = runOnce()
    assert(secondTotal === events.count(), "restart lost or double-counted rows")
  }
}
