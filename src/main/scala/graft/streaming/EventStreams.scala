package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Structured Streaming surface over the `events` shape (extension — the
  * reference has no streaming, SURVEY §2.10; its incremental
  * checkpoint+resume collapses into Spark's checkpointLocation +
  * Trigger.AvailableNow).
  *
  * Both operators mirror their batch counterparts in
  * [[graft.queries.EventQueries]] (q19/q20) so batch and streaming answers
  * can be cross-checked on the same fixture.
  */
object EventStreams {

  final case class Event(event_id: Long, ts: Timestamp, user_id: Long,
                         event_type: String, value: Double)
  final case class SessionState(sessionCount: Long, lastMs: Long, eventCount: Long)
  final case class UserSessions(user_id: Long, n_sessions: Long, n_events: Long)

  /** Tumbling-window counts with watermarking — late data beyond the
    * watermark is dropped, windows finalize incrementally. */
  def hourlyCounts(events: DataFrame, watermark: String = "2 hours"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .groupBy(window(col("ts"), "1 hour").as("w"), col("event_type"))
      .agg(count(lit(1)).as("cnt"), sum(col("value")).as("sum_value"))
      .select(col("w.start").as("h"), col("event_type"), col("cnt"), col("sum_value"))

  /** Stateful sessionization via mapGroupsWithState: counts gap>30min
    * sessions per user. State is one (count, lastTs) pair per user —
    * constant-size, watermark-evictable. */
  def sessionize(events: Dataset[Event], gapMs: Long = 1800000L): Dataset[UserSessions] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .mapGroupsWithState[SessionState, UserSessions](GroupStateTimeout.NoTimeout) {
        case (userId, batch, state: GroupState[SessionState]) =>
          val prior = state.getOption.getOrElse(SessionState(0L, Long.MinValue, 0L))
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val next = sorted.foldLeft(prior) { (st, e) =>
            val ms = e.ts.getTime
            val isNew = st.lastMs == Long.MinValue || ms - st.lastMs > gapMs
            SessionState(st.sessionCount + (if (isNew) 1 else 0), ms, st.eventCount + 1)
          }
          state.update(next)
          UserSessions(userId, next.sessionCount, next.eventCount)
      }
  }

  final case class SessionRecord(user_id: Long, session_idx: Long,
                                 start_ms: Long, end_ms: Long, n_events: Long)
  final case class OpenSessions(emitted: Long, open: Option[SessionRecord])

  /** Per-session records via flatMapGroupsWithState: unlike [[sessionize]]
    * (one rolling aggregate row per user), this EMITS each closed session
    * as its own record — zero or many outputs per group invocation, the
    * shape mapGroupsWithState can't express. State is the single open
    * session per user; closed sessions leave state immediately. */
  def sessionRecords(events: Dataset[Event], gapMs: Long = 1800000L): Dataset[SessionRecord] = {
    import events.sparkSession.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSessions, SessionRecord](
        OutputMode.Append, GroupStateTimeout.NoTimeout) {
        case (userId, batch, state: GroupState[OpenSessions]) =>
          val prior = state.getOption.getOrElse(OpenSessions(0L, None))
          val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
          val closed = Seq.newBuilder[SessionRecord]
          var emitted = prior.emitted
          var open = prior.open
          sorted.foreach { e =>
            val ms = e.ts.getTime
            open match {
              case Some(s) if ms - s.end_ms <= gapMs =>
                open = Some(s.copy(end_ms = ms, n_events = s.n_events + 1))
              case cur =>
                cur.foreach { s => closed += s; emitted += 1 }
                open = Some(SessionRecord(userId, emitted + 1, ms, ms, 1L))
            }
          }
          state.update(OpenSessions(emitted, open))
          closed.result().iterator
      }
  }

  /** Watermark-driven sessionization: like [[sessionRecords]], but the open
    * session CLOSES when event time passes `lastEvent + gap` — an
    * EventTimeTimeout fires once the watermark crosses the session's
    * expiry, emitting the final session without waiting for the user's
    * next event (the production shape: bounded state, late-data-aware). */
  def sessionizeWithTimeout(events: Dataset[Event], gapMs: Long = 1800000L,
                            watermark: String = "10 minutes"): Dataset[SessionRecord] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[OpenSessions, SessionRecord](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        case (userId, batch, state: GroupState[OpenSessions]) =>
          val prior = state.getOption.getOrElse(OpenSessions(0L, None))
          if (state.hasTimedOut) {
            // watermark passed the open session's expiry: emit and clear
            val out = prior.open.toSeq
            state.update(OpenSessions(prior.emitted + out.length, None))
            out.iterator
          } else {
            val sorted = batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id))
            val closed = Seq.newBuilder[SessionRecord]
            var emitted = prior.emitted
            var open = prior.open
            sorted.foreach { e =>
              val ms = e.ts.getTime
              open match {
                case Some(s) if ms - s.end_ms <= gapMs =>
                  open = Some(s.copy(end_ms = ms, n_events = s.n_events + 1))
                case cur =>
                  cur.foreach { s => closed += s; emitted += 1 }
                  open = Some(SessionRecord(userId, emitted + 1, ms, ms, 1L))
              }
            }
            state.update(OpenSessions(emitted, open))
            open.foreach(s => state.setTimeoutTimestamp(s.end_ms + gapMs))
            closed.result().iterator
          }
      }
  }

  /** Ingest-time exact dedup: drops re-deliveries of the same `event_id`
    * arriving within the watermark window — bounded state (one key per id
    * inside the watermark), the streaming face of exact dedup. */
  def dedupStream(events: DataFrame, watermark: String = "1 hour"): DataFrame =
    events
      .withWatermark("ts", watermark)
      .dropDuplicatesWithinWatermark("event_id")

  /** Stream-static enrichment: join a streaming fact against a broadcast
    * dimension — stateless (no watermark, no state store; each micro-batch
    * is a map-side hash join against the re-resolved static side, which is
    * also how dimension updates become visible between batches). The
    * standard shape for attaching user/account/catalog attributes to an
    * event stream; at 100 TB the dim side must stay broadcast-sized or be
    * pre-bucketed to a co-partitioned join. */
  def enrich(events: DataFrame, dim: DataFrame, key: String): DataFrame =
    events.join(org.apache.spark.sql.functions.broadcast(dim), Seq(key), "left_outer")

  /** Per-key ingest quota: pass at most `quota` events per user per
    * event-time hour, dropping the overflow — the rate limiter that keeps
    * one hot producer from flooding a training-ingest stream. State per
    * (user, hour) is ONE counter; hours older than the watermark expire
    * via the event-time timeout, so state is bounded by (active keys ×
    * watermark hours) regardless of stream length. Deterministic within a
    * batch: events are admitted in (ts, event_id) order, so replays admit
    * the same prefix. */
  def quotaSample(events: Dataset[Event], quota: Int,
                  watermark: String = "2 hours"): Dataset[Event] = {
    import events.sparkSession.implicits._
    events
      .withWatermark("ts", watermark)
      .groupByKey(e => (e.user_id, e.ts.getTime / 3600000L))
      .flatMapGroupsWithState[Long, Event](
        OutputMode.Append(), GroupStateTimeout.EventTimeTimeout()) {
        case ((_, hour), es, state: GroupState[Long]) =>
          if (state.hasTimedOut) { state.remove(); Iterator.empty }
          else {
            val used = state.getOption.getOrElse(0L)
            val room = math.max(0, quota - used.toInt)
            // bounded selection of the `room` earliest events: a hot key can
            // deliver an arbitrarily large batch in one trigger (exactly the
            // case a quota sampler exists for), so materializing + sorting
            // the whole group (`toSeq.sortBy`) is the wrong memory shape —
            // a max-heap of at most `room` candidates admits the same
            // deterministic (ts, event_id) prefix in O(batch · log quota)
            // time and O(quota) space
            val ord: Ordering[(Long, Long)] = Ordering.Tuple2(Ordering.Long, Ordering.Long)
            val heap = new scala.collection.mutable.PriorityQueue[Event]()(
              Ordering.by((e: Event) => (e.ts.getTime, e.event_id))(ord))
            if (room > 0) es.foreach { e =>
              if (heap.size < room) heap.enqueue(e)
              else if (ord.lt((e.ts.getTime, e.event_id),
                (heap.head.ts.getTime, heap.head.event_id))) {
                heap.dequeue(); heap.enqueue(e)
              }
            }
            val admitted = heap.dequeueAll.reverse // heap pops latest-first
            state.update(used + admitted.length)
            // expire the counter once the watermark passes the hour's end —
            // keyed off the GROUP's hour, not the admitted events, so a
            // zero-admission group (quota exhausted or 0) still expires;
            // clamp above the current watermark (a timeout in the past
            // is rejected by the state store)
            state.setTimeoutTimestamp(
              math.max((hour + 1) * 3600000L, state.getCurrentWatermarkMs + 1))
            admitted.iterator
          }
      }
  }

  /** Stream-stream interval join (click→purchase attribution): each left
    * event matches right events of the same `key` whose event time falls in
    * [left.ts, left.ts + `windowMs`]. Watermarks on BOTH sides plus the
    * time-range join condition let Spark expire join state — without the
    * range bound the state store grows forever; with it, state is bounded
    * by (watermark + window) per key. The output column set keeps both
    * event ids and the right-side value, the attribution record shape. */
  def intervalJoin(left: DataFrame, right: DataFrame, key: String,
                   windowMs: Long, watermark: String = "1 hour"): DataFrame = {
    val l = left.select(col(key), col("event_id").as("l_id"), col("ts").as("l_ts"))
      .withWatermark("l_ts", watermark)
    val r = right.select(col(key).as("r_key"), col("event_id").as("r_id"),
        col("ts").as("r_ts"), col("value").as("r_value"))
      .withWatermark("r_ts", watermark)
    l.join(r,
      col(key) === col("r_key") &&
        col("r_ts") >= col("l_ts") &&
        // make_dt_interval takes fractional seconds — a sub-second windowMs
        // must not truncate to zero through integer division
        col("r_ts") <= col("l_ts") + expr(s"make_dt_interval(0, 0, 0, ${windowMs.toDouble / 1000})"))
      .select(col(key), col("l_id"), col("l_ts"), col("r_id"), col("r_ts"), col("r_value"))
  }

  /** Batch-read the events fixture as a typed Dataset for sessionize. */
  def eventsDataset(spark: SparkSession, dir: String): Dataset[Event] = {
    import spark.implicits._
    graft.sources.Tables.load(spark, dir, "events")
      .select(col("event_id"), col("ts"), col("user_id"), col("event_type"), col("value"))
      .as[Event]
  }
}
