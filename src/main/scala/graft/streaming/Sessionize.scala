package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event on the wire — the minimal projection sessionization needs. */
case class SessionEvent(session_id: Long, ts: Timestamp, event_name: String)

/** A closed session: gap-bounded run of events for one session id. */
case class SessionSummary(session_id: Long, n_events: Long,
                          start_ts: Timestamp, end_ts: Timestamp)

private case class OpenSession(n: Long, startMs: Long, endMs: Long)

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
object Sessionize {

  def sessionize(events: Dataset[SessionEvent], gapMs: Long,
                 watermarkDelay: String = "10 minutes"): Dataset[SessionSummary] = {
    val spark: SparkSession = events.sparkSession
    import spark.implicits._

    def update(sessionId: Long, batch: Iterator[SessionEvent],
               state: GroupState[OpenSession]): Iterator[SessionSummary] = {
      if (state.hasTimedOut) {
        val s = state.get
        state.remove()
        return Iterator(SessionSummary(sessionId, s.n, new Timestamp(s.startMs), new Timestamp(s.endMs)))
      }
      val sorted = batch.toSeq.sortBy(_.ts.getTime)
      var closed = List.empty[SessionSummary]
      var open = state.getOption
      sorted.foreach { e =>
        val t = e.ts.getTime
        open match {
          case Some(s) if t < s.startMs - gapMs =>
            // within-watermark straggler predating the open session by more
            // than the gap: it can never merge with it — close it as its own
            // session. (Stragglers within gap of EACH OTHER also close
            // individually: re-segmenting the past would need the full event
            // history, not this operator's O(1) state.)
            closed ::= SessionSummary(sessionId, 1L, new Timestamp(t), new Timestamp(t))
          case Some(s) if t - s.endMs > gapMs =>
            closed ::= SessionSummary(sessionId, s.n, new Timestamp(s.startMs), new Timestamp(s.endMs))
            open = Some(OpenSession(1L, t, t))
          case Some(s) =>
            // min() on the start: a late event may fall between the open
            // session's start and end, or within gap BEFORE its start
            open = Some(OpenSession(s.n + 1, math.min(s.startMs, t), math.max(s.endMs, t)))
          case None =>
            open = Some(OpenSession(1L, t, t))
        }
      }
      open.foreach { s =>
        state.update(s)
        // close once the watermark is `gap` past the session's last event
        state.setTimeoutTimestamp(s.endMs + gapMs)
      }
      closed.reverseIterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.session_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
