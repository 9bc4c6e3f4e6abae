package graft.streaming

import java.nio.file.Files

import org.apache.spark.sql.types._

import graft.SparkSpec
import graft.sink.UpsertSink
import graft.streaming.SessionizePipeline._

/** Streaming gap sessionization on flatMapGroupsWithState: pure fold
  * logic, then the full incremental pipeline across two runs on one
  * checkpoint (open sessions survive in state; watermark timeouts
  * finalize them).
  */
class SessionizePipelineSpec extends SparkSpec {

  import spark.implicits._

  private val MIN = 60L * 1000000L // one minute in micros

  test("foldEvents: gap closes sessions, continuation extends them") {
    val (closed, open) = foldEvents(
      Seq(Event(1, 1, 0), Event(1, 2, 10 * MIN), Event(1, 3, 60 * MIN)),
      None, gapMicros = 30 * MIN)
    assert(closed == Seq(SessionState(0, 10 * MIN, 2)))
    assert(open.contains(SessionState(60 * MIN, 60 * MIN, 1)))
    // continuation of carried-over state
    val (closed2, open2) = foldEvents(Seq(Event(1, 4, 70 * MIN)), open, 30 * MIN)
    assert(closed2.isEmpty)
    assert(open2.contains(SessionState(60 * MIN, 70 * MIN, 2)))
    // out-of-order arrivals within a batch sort by (ts, event_id)
    val (c3, o3) = foldEvents(Seq(Event(1, 6, 5 * MIN), Event(1, 5, MIN)), None, 30 * MIN)
    assert(c3.isEmpty && o3.contains(SessionState(MIN, 5 * MIN, 2)))
    // a LATE event joining carried-over state must not regress lastTs:
    // state ends at 10min, late event at 5min arrives, then 39min —
    // 39-10 <= 30 so the session EXTENDS (it would wrongly close if the
    // late event had dragged lastTs back to 5min)
    val st = Some(SessionState(0, 10 * MIN, 2))
    val (c4, o4) = foldEvents(Seq(Event(1, 9, 5 * MIN)), st, 30 * MIN)
    assert(c4.isEmpty && o4.contains(SessionState(0, 10 * MIN, 3)))
    val (c5, o5) = foldEvents(Seq(Event(1, 10, 39 * MIN)), o4, 30 * MIN)
    assert(c5.isEmpty && o5.contains(SessionState(0, 39 * MIN, 4)))
  }

  test("foldEvents: events before the open session chain or split correctly") {
    // open session spans [100, 110]min; an event at 80min is within the
    // 30min gap of its START -> chains in, regressing session_start
    val st = Some(SessionState(100 * MIN, 110 * MIN, 3))
    val (c1, o1) = foldEvents(Seq(Event(1, 1, 80 * MIN)), st, 30 * MIN)
    assert(c1.isEmpty && o1.contains(SessionState(80 * MIN, 110 * MIN, 4)))
    // an event at 10min is NOT within gap of anything -> its own EARLIER
    // session, closed immediately (the old fold silently absorbed it
    // into the later session because delta vs lastTs was negative)
    val (c2, o2) = foldEvents(Seq(Event(1, 2, 10 * MIN)), st, 30 * MIN)
    assert(c2 == Seq(SessionState(10 * MIN, 10 * MIN, 1)))
    assert(o2.contains(SessionState(100 * MIN, 110 * MIN, 3)))
    // a bridge event can merge an early event INTO the open session
    val (c3, o3) = foldEvents(
      Seq(Event(1, 3, 50 * MIN), Event(1, 4, 75 * MIN)), st, 30 * MIN)
    assert(c3.isEmpty && o3.contains(SessionState(50 * MIN, 110 * MIN, 5)))
  }

  test("streaming sessions finalize via watermark and survive a restart") {
    val root = Files.createTempDirectory("graft_sess")
    val src = root.resolve("events"); Files.createDirectories(src)
    val sink = new UpsertSink(spark, root.resolve("sink").toString)
    val checkpoint = root.resolve("chk").toString
    val schema = StructType(Seq(
      StructField("user_id", LongType), StructField("event_id", LongType),
      StructField("ts", TimestampType)))

    def writeEvents(name: String, rows: Seq[(Long, Long, Long)]): Unit =
      rows.map { case (u, e, m) => (u, e, new java.sql.Timestamp(m / 1000)) }
        .toDF("user_id", "event_id", "ts")
        .coalesce(1).write.mode("append").parquet(src.toString)

    val t0 = 1700000000L * 1000000L // stable epoch base, micros
    // u1: 3 events in 10 min, then a lone event 2h later (2nd session);
    // u2: 2 events at t0
    writeEvents("a", Seq(
      (1L, 1L, t0), (1L, 2L, t0 + 5 * MIN), (1L, 3L, t0 + 10 * MIN),
      (1L, 4L, t0 + 120 * MIN),
      (2L, 1L, t0), (2L, 2L, t0 + 2 * MIN)))

    val q1 = start(spark, src.toString, schema, sink, "Sessions", checkpoint)
    q1.awaitTermination(120000)

    def sessions(): Set[(Long, Long, Long, Long)] =
      sink.read("Sessions").as[(Long, Long, Long, Long)].collect().toSet
    // u1's first session closed by the in-batch gap; u2's session closed
    // by the event-time timeout (watermark = t0+2h - 30min); u1's second
    // session still open in state
    assert(sessions() == Set(
      (1L, t0, t0 + 10 * MIN, 3L),
      (2L, t0, t0 + 2 * MIN, 2L)))

    // later events arrive; the query restarts on the same checkpoint
    writeEvents("b", Seq((1L, 5L, t0 + 300 * MIN)))
    val q2 = start(spark, src.toString, schema, sink, "Sessions", checkpoint)
    q2.awaitTermination(120000)

    // the restart recovered u1's open session from state and closed it
    // on the 3h gap; the t0+300min session remains open
    assert(sessions() == Set(
      (1L, t0, t0 + 10 * MIN, 3L),
      (2L, t0, t0 + 2 * MIN, 2L),
      (1L, t0 + 120 * MIN, t0 + 120 * MIN, 1L)))
  }
}
