package graft.streaming

import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.streaming.OutputMode

import graft.SparkSpec
import graft.queries.EventQueries

class EventStreamsSpec extends SparkSpec {

  test("streaming hourly counts match the batch query on the same fixture") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batch = EventQueries.defs("q20_events_hourly")(spark, sfDir)
      .select("h", "event_type", "cnt")
      .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet

    val events = EventStreams.eventsDataset(spark, sfDir).collect().toSeq
    val stream = MemoryStream[EventStreams.Event]
    // feed in two chunks to exercise incremental state
    val (a, b) = events.splitAt(events.length / 2)
    stream.addData(a)
    val q = EventStreams.hourlyCounts(stream.toDF().drop("event_id"), watermark = "365 days")
      .writeStream.format("memory").queryName("hourly_test")
      .outputMode(OutputMode.Complete()).start()
    try {
      q.processAllAvailable()
      stream.addData(b)
      q.processAllAvailable()
      val streamed = spark.table("hourly_test")
        .select("h", "event_type", "cnt")
        .collect().map(r => (r.getTimestamp(0), r.getString(1), r.getLong(2))).toSet
      assert(streamed === batch)
    } finally q.stop()
  }

  test("streaming dedup drops re-delivered event_ids within the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val events = EventStreams.eventsDataset(spark, sfDir).collect().toSeq.take(200)
    val stream = MemoryStream[EventStreams.Event]
    stream.addData(events)
    stream.addData(events.take(50)) // re-delivery of the first 50
    val q = EventStreams.dedupStream(stream.toDF(), watermark = "365 days")
      .writeStream.format("memory").queryName("dedup_test")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val got = spark.table("dedup_test").select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got === events.map(_.event_id).sorted.toSeq) // exactly once each
    } finally q.stop()
  }

  test("stateful sessionization matches the batch sessionize query") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val batch = EventQueries.defs("q19_sessionize")(spark, sfDir)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

    val events = EventStreams.eventsDataset(spark, sfDir).collect().toSeq
    val stream = MemoryStream[EventStreams.Event]
    stream.addData(events) // single ordered batch per user
    val q = EventStreams.sessionize(stream.toDS())
      .writeStream.format("memory").queryName("sessions_test")
      .outputMode(OutputMode.Update()).start()
    try {
      q.processAllAvailable()
      val streamed = spark.table("sessions_test")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet
      assert(streamed === batch)
    } finally q.stop()
  }
}
