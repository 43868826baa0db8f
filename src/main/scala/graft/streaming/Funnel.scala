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

private case class FunnelState(tView: Long, tClick: Long, done: Boolean)

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

    // java.sql.Timestamp.getTime is MILLIS — comparing or re-emitting
    // through it silently truncates the events' microsecond component.
    // All state and comparisons run in exact epoch-micros.
    def toMicros(t: Timestamp): Long = {
      val secondsMs = t.getTime - t.getNanos / 1000000
      secondsMs * 1000L + t.getNanos / 1000
    }
    def fromMicros(us: Long): Timestamp = {
      val t = new Timestamp(Math.floorDiv(us, 1000000L) * 1000L)
      t.setNanos((Math.floorMod(us, 1000000L) * 1000L).toInt)
      t
    }

    def update(userId: Long, batch: Iterator[FunnelEvent],
               state: GroupState[FunnelState]): Iterator[FunnelCompletion] = {
      if (state.hasTimedOut) { state.remove(); return Iterator.empty }
      var s = state.getOption.getOrElse(FunnelState(Long.MinValue, Long.MinValue, done = false))
      var out = List.empty[FunnelCompletion]
      var lastUs = Long.MinValue
      // tie-break equal timestamps by stage order so a same-instant
      // view→click→purchase chain completes, matching the batch form's
      // at-or-after (>=) semantics
      val stageRank = Map("view" -> 0, "click" -> 1, "purchase" -> 2)
      batch.toSeq.sortBy(e => (toMicros(e.ts), stageRank.getOrElse(e.event_type, 3)))
        .foreach { e =>
        val t = toMicros(e.ts)
        lastUs = math.max(lastUs, t)
        if (!s.done) e.event_type match {
          case "view" if s.tView == Long.MinValue =>
            s = s.copy(tView = t)
          case "click" if s.tView != Long.MinValue && s.tClick == Long.MinValue
              && t >= s.tView =>
            s = s.copy(tClick = t)
          case "purchase" if s.tClick != Long.MinValue && t >= s.tClick =>
            out ::= FunnelCompletion(userId, fromMicros(s.tView),
              fromMicros(s.tClick), fromMicros(t))
            s = s.copy(done = true)
          case _ => ()
        }
      }
      state.update(s)
      if (lastUs != Long.MinValue)
        state.setTimeoutTimestamp(lastUs / 1000L + idleTimeoutMs)
      out.reverseIterator
    }

    events
      .withWatermark("ts", watermarkDelay)
      .groupByKey(_.user_id)
      .flatMapGroupsWithState(OutputMode.Append, GroupStateTimeout.EventTimeTimeout)(update)
  }
}
