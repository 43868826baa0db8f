package graft.streaming

import java.sql.Timestamp
import org.apache.spark.sql.{Dataset, SparkSession}
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** One event on the wire for funnel tracking. */
case class FunnelEvent(user_id: Long, ts: Timestamp, event_type: String)

/** A completed funnel: the user reached the last stage, with the stage
  * times that witnessed it. */
case class FunnelCompletion(user_id: Long, t_view: Timestamp,
                            t_click: Timestamp, t_purchase: Timestamp)

private case class FunnelState(tView: Long, tClick: Long, done: Boolean,
                               lastUs: Long)

/**
 * Streaming ordered-milestone funnel (view → click → purchase) — the
 * stream twin of the batch `events_funnel` query, as a
 * `flatMapGroupsWithState` state machine: per user, keep the earliest
 * view time and the earliest click at-or-after it (two longs — O(1)
 * state), emit a completion row the moment a purchase lands at-or-after
 * the click, exactly once per user.
 *
 * Within a trigger the group's events are sorted by event time, so
 * intra-batch disorder is free. CROSS-trigger disorder is the honest
 * caveat of any O(1)-state funnel: an earlier view arriving in a later
 * trigger cannot rewrite an already-advanced stage (that would need the
 * full per-user history). The watermark bounds how late that can happen;
 * the event-time timeout clears state for users who go quiet, so state
 * is O(active users), not O(all users ever).
 */
object Funnel {

  def funnel(events: Dataset[FunnelEvent],
             idleTimeoutMs: Long = 30L * 60 * 1000,
             watermarkDelay: String = "10 minutes"): Dataset[FunnelCompletion] = {
    val spark: SparkSession = events.sparkSession
    import spark.implicits._

    // All state and comparisons run in exact epoch-micros (TimeUs — the
    // one shared Timestamp conversion; `getTime` alone truncates µs).
    def update(userId: Long, batch: Iterator[FunnelEvent],
               state: GroupState[FunnelState]): Iterator[FunnelCompletion] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      var s = state.getOption.getOrElse(
        FunnelState(Long.MinValue, Long.MinValue, done = false,
          lastUs = Long.MinValue))
      var out = List.empty[FunnelCompletion]
      // tie-break equal timestamps by stage order so a same-instant
      // view→click→purchase chain completes, matching the batch form's
      // at-or-after (>=) semantics
      val stageRank = Map("view" -> 0, "click" -> 1, "purchase" -> 2)
      batch.toSeq.sortBy(e => (TimeUs.micros(e.ts), stageRank.getOrElse(e.event_type, 3)))
        .foreach { e =>
        val t = TimeUs.micros(e.ts)
        // max'd against the PERSISTED last activity: a straggler batch
        // whose events all precede it must never pull the timeout
        // earlier (that expired state under still-active funnels and
        // silently lost completions)
        s = s.copy(lastUs = math.max(s.lastUs, t))
        if (!s.done) e.event_type match {
          case "view" if s.tView == Long.MinValue =>
            s = s.copy(tView = t)
          case "click" if s.tView != Long.MinValue && s.tClick == Long.MinValue
              && t >= s.tView =>
            s = s.copy(tClick = t)
          case "purchase" if s.tClick != Long.MinValue && t >= s.tClick =>
            out ::= FunnelCompletion(userId, TimeUs.fromMicros(s.tView),
              TimeUs.fromMicros(s.tClick), TimeUs.fromMicros(t))
            s = s.copy(done = true)
          case _ => ()
        }
      }
      state.update(s)
      if (s.lastUs != Long.MinValue) {
        // ceil-ms (TimeUs.timeoutMs): a floor could expire state up to
        // 999 µs early. Done users keep a 10×-idle TOMBSTONE so the
        // exactly-once contract survives ordinary quiet periods; a user
        // returning after even that horizon can re-emit — the explicit
        // price of O(active-users) state (remembering every completer
        // forever would grow state without bound).
        val horizon = if (s.done) idleTimeoutMs * 10 else idleTimeoutMs
        state.setTimeoutTimestamp(TimeUs.timeoutMs(s.lastUs, horizon))
      }
      out.reverseIterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
