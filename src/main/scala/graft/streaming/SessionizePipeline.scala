package graft.streaming

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode, StreamingQuery, Trigger}
import org.apache.spark.sql.types.StructType

import graft.sink.UpsertSink

/** Streaming gap-based sessionization — the incremental form of the
  * batch q37 operator, built on `flatMapGroupsWithState` (the
  * KeyValueGroupedDataset custom-state path for semantics the built-in
  * windowed aggregations can't express: a session has no fixed window,
  * it ends `gap` after the LAST event).
  *
  * State per user is O(1) — the open session's id, bounds, and count —
  * and keyed state partitions by user across executors, so the operator
  * scales with the user population, not the event volume. Event-time
  * watermarking bounds state: a `GroupStateTimeout.EventTimeTimeout`
  * fires once the watermark passes the open session's gap, which both
  * emits the final session row and frees the state — without it, every
  * user ever seen would hold state forever at 100 TB.
  *
  * Output is append-only finalized sessions, merged idempotently by
  * (user_id, session_start) so checkpoint-replayed batches land on the
  * same rows (T8).
  */
object SessionizePipeline {

  /** One user event. `tsMicros` (epoch micros) drives the session
    * arithmetic; the raw `ts` column rides along because the watermark is
    * attached to it — projecting it away through a typed map would strip
    * the watermark and EventTimeTimeout refuses to run without one.
    */
  final case class Event(user_id: Long, event_id: Long, tsMicros: Long,
                         ts: java.sql.Timestamp = null)

  /** Open-session state carried between micro-batches. */
  final case class SessionState(start: Long, lastTs: Long, nEvents: Long)

  /** A finalized session. */
  final case class Session(user_id: Long, session_start: Long,
                           session_end: Long, n_events: Long)

  /** Pure session-step logic, shared by the streaming operator and its
    * unit tests: merge the batch's events and the carried-over open
    * session into gap-separated spans.
    *
    * Implemented as an interval merge over ALL spans (each event is a
    * 1-event span; the open state is a span too), sorted by start: two
    * spans chain when the later one starts within `gap` of the earlier
    * one's end. This handles the out-of-order cross-batch case the
    * naive left fold got wrong — an event arriving BEFORE the open
    * session's start (possible when the user ran ahead of the
    * watermark) either chains into it by regressing `start`, or forms
    * its own earlier session, instead of being silently absorbed into
    * a session that started after it.
    */
  def foldEvents(events: Seq[Event], open: Option[SessionState],
                 gapMicros: Long): (Seq[SessionState], Option[SessionState]) = {
    val spans = (events.map(e => SessionState(e.tsMicros, e.tsMicros, 1))
      ++ open.toSeq).sortBy(s => (s.start, s.lastTs))
    if (spans.isEmpty) return (Nil, open)
    val closed = Vector.newBuilder[SessionState]
    var cur = spans.head
    spans.tail.foreach { s =>
      if (s.start - cur.lastTs <= gapMicros)
        cur = SessionState(cur.start, math.max(cur.lastTs, s.lastTs),
          cur.nEvents + s.nEvents)
      else { closed += cur; cur = s }
    }
    (closed.result(), Some(cur))
  }

  /** The per-group state transition: new events extend or close the open
    * session; an event-time timeout finalizes it once the watermark has
    * passed `lastTs + gap`.
    */
  def stateFn(gapMicros: Long)(userId: Long, events: Iterator[Event],
                               state: GroupState[SessionState]): Iterator[Session] = {
    def emit(s: SessionState): Session =
      Session(userId, s.start, s.lastTs, s.nEvents)
    if (state.hasTimedOut) {
      val out = state.getOption.map(emit).toSeq
      state.remove()
      out.iterator
    } else {
      val (closed, open) = foldEvents(events.toSeq, state.getOption, gapMicros)
      open match {
        case Some(s) =>
          state.update(s)
          // finalize when the event-time watermark passes the gap —
          // clamped above the current watermark: a near-late event can
          // leave lastTs + gap at or below a watermark other users'
          // far-ahead events just advanced, and an unclamped timestamp
          // makes Spark throw, crash-looping the query on replay
          state.setTimeoutTimestamp(math.max(
            s.lastTs / 1000L + gapMicros / 1000L,
            state.getCurrentWatermarkMs() + 1L))
        case None => state.remove()
      }
      closed.map(emit).iterator
    }
  }

  /** Start the streaming sessionizer over a file-backed event stream;
    * finalized sessions merge into `table` keyed by (user_id,
    * session_start).
    */
  def start(spark: SparkSession, sourceDir: String, schema: StructType,
            sink: UpsertSink, table: String, checkpoint: String,
            gapMinutes: Int = 30,
            trigger: Trigger = Trigger.AvailableNow()): StreamingQuery = {
    import spark.implicits._
    val gapMicros = gapMinutes * 60L * 1000000L
    val events: Dataset[Event] = graft.ops.RelOps.toEventTime(
        spark.readStream.schema(schema).parquet(sourceDir), "ts")
      .withWatermark("ts", s"$gapMinutes minutes")
      .select(col("user_id"), col("event_id"),
        graft.ops.RelOps.epochUs(col("ts")).as("tsMicros"), col("ts"))
      .as[Event]
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append(),
        GroupStateTimeout.EventTimeTimeout())(stateFn(gapMicros))
      .writeStream
      .option("checkpointLocation", checkpoint)
      .outputMode("append")
      .trigger(trigger)
      .foreachBatch { (batch: Dataset[Session], _: Long) =>
        if (!batch.isEmpty)
          sink.merge(table, batch.toDF(), Seq("user_id", "session_start"))
      }
      .start()
  }
}
