package graft.streaming

import java.sql.Timestamp

/** One Timestamp ⇄ epoch-micros conversion for every stateful operator
  * (`getTime` alone is MILLIS and silently truncates the sub-ms micros
  * parquet event times carry). Funnel and Sessionize previously carried
  * two hand-rolled copies that had already drifted on boundary handling
  * — one definition, serializable, safe to reference from task
  * closures. */
object TimeUs extends Serializable {
  def micros(ts: Timestamp): Long =
    math.floorDiv(ts.getTime, 1000L) * 1000000L + ts.getNanos / 1000L

  def fromMicros(us: Long): Timestamp = {
    val t = new Timestamp(math.floorDiv(us, 1000000L) * 1000L)
    t.setNanos((math.floorMod(us, 1000000L) * 1000L).toInt)
    t
  }

  /** Event-time timeout instant in MILLIS for a last-activity in micros:
    * ceil-ms so state can never expire even a microsecond before
    * lastUs + the idle window (a floor would cut up to 999 µs early —
    * the boundary Sessionize's +999 guard exists for). */
  def timeoutMs(lastUs: Long, idleMs: Long): Long =
    math.floorDiv(lastUs + 999L, 1000L) + idleMs
}
