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

  test("stream-static enrichment equals the batch join and stays stateless") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val events = EventStreams.eventsDataset(spark, sfDir).collect().toSeq.take(300)
    // static dimension: deterministic tier per user
    val dim = events.map(_.user_id).distinct.map(u => (u, s"tier${u % 3}"))
      .toDF("user_id", "tier")
    val batch = events.toDF().join(dim, Seq("user_id"), "left_outer")
      .select("event_id", "tier")
      .collect().map(r => (r.getLong(0), r.getString(1))).toSet

    val stream = MemoryStream[EventStreams.Event]
    val (a, b) = events.splitAt(events.length / 2)
    stream.addData(a)
    val q = EventStreams.enrich(stream.toDF(), dim, "user_id")
      .writeStream.format("memory").queryName("enrich_test")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      stream.addData(b)
      q.processAllAvailable()
      val streamed = spark.table("enrich_test").select("event_id", "tier")
        .collect().map(r => (r.getLong(0), r.getString(1))).toSet
      assert(streamed === batch)
      // stateless contract: no state store operator in the progress metrics
      assert(q.lastProgress.stateOperators.isEmpty,
        s"stream-static join must not build state: ${q.lastProgress.stateOperators}")
    } finally q.stop()
  }

  test("flatMapGroupsWithState emits per-session records consistent with batch counts") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    // batch q19: (user_id, n_sessions, n_events)
    val batch = EventQueries.defs("q19_sessionize")(spark, sfDir)
      .collect().map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    val events = EventStreams.eventsDataset(spark, sfDir).collect().toSeq
    val stream = MemoryStream[EventStreams.Event]
    stream.addData(events)
    val q = EventStreams.sessionRecords(stream.toDS())
      .writeStream.format("memory").queryName("session_records_test")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val rows = spark.table("session_records_test")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      // closed sessions only — the last (open) session per user is withheld,
      // so per user: closed = n_sessions - 1; closed events = n_events - open.n_events.
      val byUser = rows.groupBy(_._1)
      byUser.foreach { case (uid, recs) =>
        val (nSessions, _) = batch(uid)
        assert(recs.length == nSessions - 1,
          s"user $uid: ${recs.length} closed vs ${nSessions - 1} expected")
        // session indices are 1..n-1 with start <= end
        assert(recs.map(_._2).sorted.toSeq == (1L until nSessions).toSeq)
        recs.foreach(r => assert(r._3 <= r._4))
      }
      // users with a single session emit nothing — they must still be in batch
      assert(byUser.keySet.subsetOf(batch.keySet))
    } finally q.stop()
  }

  test("event-time timeout closes and emits an idle session via the watermark") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    def ev(id: Long, uid: Long, ms: Long) = EventStreams.Event(
      id, new java.sql.Timestamp(ms), uid, "click", 1.0)

    val h = 3600L * 1000
    val stream = MemoryStream[EventStreams.Event]
    // user 1: two events 5 min apart at hour 1 — one open session (ts=0
    // would be dropped: the initial watermark is 0 and late filtering is
    // ts <= watermark)
    stream.addData(Seq(ev(1, 1, h), ev(2, 1, h + 5 * 60 * 1000)))
    val q = EventStreams.sessionizeWithTimeout(stream.toDS())
      .writeStream.format("memory").queryName("timeout_sessions_test")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      assert(spark.table("timeout_sessions_test").count() == 0) // still open
      // user 2 at hour 5 pushes the watermark past user 1's expiry
      stream.addData(Seq(ev(3, 2, 5 * h)))
      q.processAllAvailable()
      // one more batch so the timeout (evaluated against the advanced
      // watermark) fires
      stream.addData(Seq(ev(4, 2, 5 * h + 1000)))
      q.processAllAvailable()
      val rows = spark.table("timeout_sessions_test")
        .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2), r.getLong(3), r.getLong(4)))
      assert(rows.exists(r => r._1 == 1 && r._3 == h && r._4 == h + 5 * 60 * 1000 && r._5 == 2),
        s"user 1's idle session was not emitted: ${rows.mkString(", ")}")
    } finally q.stop()
  }

  test("quota sampler admits at most N per user-hour across batches, expires state") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val h = 3600L * 1000
    def ev(id: Long, user: Long, ms: Long) =
      EventStreams.Event(id, new java.sql.Timestamp(ms), user, "click", 1.0)

    val stream = MemoryStream[EventStreams.Event]
    // batch 1: user 1 sends 5 events in hour 2 (quota 3), user 2 sends 2
    stream.addData((1L to 5L).map(i => ev(i, 1, 2 * h + i * 1000)) ++
      Seq(ev(10, 2, 2 * h), ev(11, 2, 2 * h + 1)))
    val q = EventStreams.quotaSample(stream.toDS(), quota = 3)
      .writeStream.format("memory").queryName("quota_test")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      // batch 2: user 1 sends 2 more in the same hour -> both rejected
      stream.addData(Seq(ev(6, 1, 2 * h + 10000), ev(7, 1, 2 * h + 11000)))
      q.processAllAvailable()
      // batch 3: next hour -> fresh quota
      stream.addData(Seq(ev(8, 1, 3 * h + 1000)))
      q.processAllAvailable()
      val got = spark.table("quota_test").select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      assert(got === Seq(1L, 2L, 3L, 8L, 10L, 11L),
        s"expected first-3 of user 1 hour 2, user 2's pair, and the fresh-hour event; got $got")
    } finally q.stop()
  }

  test("quota sampler: a hot key flooding one trigger admits the earliest `quota` deterministically") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val h = 3600L * 1000
    def ev(id: Long, user: Long, ms: Long) =
      EventStreams.Event(id, new java.sql.Timestamp(ms), user, "click", 1.0)

    val stream = MemoryStream[EventStreams.Event]
    // one hot producer delivers 5,000 events for ONE (user, hour) key in a
    // single trigger — the exact case the bounded O(quota) insertion
    // exists for — arriving in REVERSE time order so positional prefixes
    // can't accidentally pass
    stream.addData((5000L to 1L by -1).map(i => ev(i, 7, 2 * h + i * 10)))
    val q = EventStreams.quotaSample(stream.toDS(), quota = 4)
      .writeStream.format("memory").queryName("quota_hot")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val got = spark.table("quota_hot").select("event_id")
        .collect().map(_.getLong(0)).sorted.toSeq
      // earliest 4 by (ts, event_id), regardless of arrival order
      assert(got === Seq(1L, 2L, 3L, 4L), s"got $got")
    } finally q.stop()
  }

  test("stream-stream interval join matches within the window, drops outside it") {
    import spark.implicits._
    implicit val sqlCtx = spark.sqlContext

    val h = 3600L * 1000
    def ev(id: Long, user: Long, ms: Long, typ: String = "click") =
      EventStreams.Event(id, new java.sql.Timestamp(ms), user, typ, id.toDouble)

    val clicks = MemoryStream[EventStreams.Event]
    val purchases = MemoryStream[EventStreams.Event]
    val t0 = 2 * h // away from the zero watermark
    clicks.addData(Seq(ev(1, 1, t0), ev(2, 2, t0 + 60000)))
    purchases.addData(Seq(
      ev(101, 1, t0 + 10 * 60000, "purchase"),  // within 30 min of click 1
      ev(102, 1, t0 + 45 * 60000, "purchase"),  // outside the window
      ev(103, 2, t0 + 5 * 60000, "purchase")))  // matches click 2
    val q = EventStreams.intervalJoin(clicks.toDF(), purchases.toDF(),
        "user_id", windowMs = 30 * 60000)
      .writeStream.format("memory").queryName("interval_join_test")
      .outputMode(OutputMode.Append()).start()
    try {
      q.processAllAvailable()
      val got = spark.table("interval_join_test")
        .collect().map(r => (r.getLong(1), r.getLong(3))).toSet // (l_id, r_id)
      assert(got === Set((1L, 101L), (2L, 103L)))
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
