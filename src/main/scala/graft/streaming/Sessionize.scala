package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event on the wire — the minimal projection sessionization needs. */
case class SessionEvent(session_id: Long, ts: Timestamp, event_name: String)

/** A closed session: gap-bounded run of events for one session id. */
case class SessionSummary(session_id: Long, n_events: Long,
                          start_ts: Timestamp, end_ts: Timestamp)

private case class OpenSession(n: Long, startUs: Long, endUs: Long)

/**
 * Custom stateful streaming operator (SURVEY.md §2.9 extension):
 * gap-based sessionization with `flatMapGroupsWithState` — the
 * KeyValueGroupedDataset custom-state path the built-in windowed
 * aggregates can't express (a session ends `gap` after its LAST event,
 * not on a fixed grid).
 *
 * State per session id is O(1) (count + two timestamps); the event-time
 * timeout closes idle sessions once the watermark passes, so state size
 * is bounded by the number of concurrently-open sessions regardless of
 * stream volume.
 */
object Sessionize extends Serializable {

  def sessionize(events: Dataset[SessionEvent], gapMs: Long,
                 watermarkDelay: String = "10 minutes"): Dataset[SessionSummary] = {
    val spark: SparkSession = events.sparkSession
    import spark.implicits._
    val gapUs = gapMs * 1000L

    // Exact epoch-micros of a Timestamp — `getTime` alone is MILLIS and
    // silently truncates the sub-ms micros parquet event times carry,
    // which would desync gap comparisons (an 8h+0.5ms gap must split)
    // and the emitted session bounds vs any µs-exact batch twin.
    // TimeUs is the ONE shared conversion (a serializable object, safe
    // in task closures — Funnel and this operator previously carried
    // drifting hand-rolled copies).
    def micros(ts: Timestamp): Long = TimeUs.micros(ts)
    def fromMicros(us: Long): Timestamp = TimeUs.fromMicros(us)

    def update(sessionId: Long, batch: Iterator[SessionEvent],
               state: GroupState[OpenSession]): Iterator[SessionSummary] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator(SessionSummary(sessionId, s.n, fromMicros(s.startUs), fromMicros(s.endUs)))
      }
      val sorted = batch.toSeq.sortBy(e => micros(e.ts))
      var closed = List.empty[SessionSummary]
      var open = state.getOption
      sorted.foreach { e =>
        val t = micros(e.ts)
        open match {
          case Some(s) if t < s.startUs - gapUs =>
            // within-watermark straggler predating the open session by more
            // than the gap: it can never merge with it — close it as its own
            // session. (Stragglers within gap of EACH OTHER also close
            // individually: re-segmenting the past would need the full event
            // history, not this operator's O(1) state.)
            closed ::= SessionSummary(sessionId, 1L, fromMicros(t), fromMicros(t))
          case Some(s) if t - s.endUs > gapUs =>
            closed ::= SessionSummary(sessionId, s.n, fromMicros(s.startUs), fromMicros(s.endUs))
            open = Some(OpenSession(1L, t, t))
          case Some(s) =>
            // min() on the start: a late event may fall between the open
            // session's start and end, or within gap BEFORE its start
            open = Some(OpenSession(s.n + 1, math.min(s.startUs, t), math.max(s.endUs, t)))
          case None =>
            open = Some(OpenSession(1L, t, t))
        }
      }
      open.foreach { s =>
        state.update(s)
        // close once the watermark is `gap` past the session's last
        // event — the ONE shared ceil-ms definition (TimeUs.timeoutMs),
        // not an inline copy that could drift from Funnel's
        state.setTimeoutTimestamp(TimeUs.timeoutMs(s.endUs, gapMs))
      }
      closed.reverseIterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.session_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
