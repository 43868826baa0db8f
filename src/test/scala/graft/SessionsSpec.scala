package graft

import graft.operators.Sessions
import graft.streaming.{SessionEvent, Sessionize}
import java.sql.Timestamp
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Batch gap-based sessionization (graft.operators.Sessions) — assignment
  * semantics, agreement with the streaming Sessionize twin, and the
  * one-exchange plan shape that makes it a single-shuffle operator. */
class SessionsSpec extends SparkTestBase {
  import spark.implicits._

  private def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)

  test("assign splits on gap, numbers sessions 1-based per key") {
    val df = Seq(
      (1L, ts(0), 10L), (1L, ts(5), 11L), (1L, ts(100), 12L),
      (1L, ts(101), 13L),
      (2L, ts(0), 20L)
    ).toDF("user_id", "t", "event_id")
    val got = Sessions.assign(df, "user_id", "t", "event_id", gapUs = 30L * 60 * 1000000)
      .select("user_id", "event_id", "session_seq")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == Set((1L, 10L, 1L), (1L, 11L, 1L), (1L, 12L, 2L),
      (1L, 13L, 2L), (2L, 20L, 1L)))
  }

  test("NULL timestamps form ONE session; the first real row starts fresh") {
    // lag(ts).isNull-based first-row detection would open a session per
    // consecutive NULL-ts row AND silently pull the first real row into
    // the NULL block through a NULL gap comparison
    val df = Seq(
      (1L, None, 10L), (1L, None, 11L), (1L, None, 12L),
      (1L, Some(ts(0)), 13L), (1L, Some(ts(5)), 14L),
      (1L, Some(ts(100)), 15L)
    ).toDF("user_id", "t", "event_id")
    val got = Sessions.assign(df, "user_id", "t", "event_id",
        gapUs = 30L * 60 * 1000000)
      .select("event_id", "session_seq")
      .as[(Long, Long)].collect().toMap
    assert(got(10L) == 1L && got(11L) == 1L && got(12L) == 1L,
      "all NULL-ts rows share one session")
    assert(got(13L) == 2L && got(14L) == 2L,
      "first real-ts row opens a fresh session")
    assert(got(15L) == 3L, "gap splitting unaffected")
  }

  test("equal timestamps stay in one session and break ties on the tie column") {
    val df = Seq((1L, ts(0), 2L), (1L, ts(0), 1L), (1L, ts(0), 3L))
      .toDF("user_id", "t", "event_id")
    val got = Sessions.stats(df, "user_id", "t", "event_id", gapUs = 1L)
      .as[(Long, Long, Long, Long, Long, Long)].collect()
    assert(got.toSeq == Seq((1L, 1L, 3L, ts(0).getTime * 1000,
      ts(0).getTime * 1000, 0L)))
  }

  test("batch stats matches the streaming Sessionize twin on closed sessions") {
    implicit val sqlCtx = spark.sqlContext
    val events = Seq(
      SessionEvent(1L, ts(0), "a"), SessionEvent(1L, ts(10), "b"),
      SessionEvent(1L, ts(120), "c"),
      SessionEvent(2L, ts(3), "d"), SessionEvent(2L, ts(200), "e"),
      SessionEvent(3L, ts(7), "f"))
    val gapMs = 30L * 60 * 1000

    val input = MemoryStream[SessionEvent]
    val q = Sessionize.sessionize(input.toDS(), gapMs)
      .writeStream.format("memory").queryName("sessions_batch_twin")
      .outputMode("append").start()
    input.addData(events: _*)
    q.processAllAvailable()
    // sentinel far in the future: watermark passes every real session's
    // end + gap, so the event-time timeout closes them all
    input.addData(SessionEvent(99L, ts(100000), "zz"))
    q.processAllAvailable()
    q.stop()
    val streamed = spark.table("sessions_batch_twin")
      .filter($"session_id" =!= 99L)
      .select($"session_id", $"n_events",
        unix_micros($"start_ts").as("start_us"), unix_micros($"end_ts").as("end_us"))
      .as[(Long, Long, Long, Long)].collect().toSet

    val batch = Sessions.stats(events.toDF(), "session_id", "ts", "event_name",
        gapUs = gapMs * 1000)
      .select($"session_id", $"n_events", $"start_us", $"end_us")
      .as[(Long, Long, Long, Long)].collect().toSet
    assert(streamed == batch && batch.size == 5)
  }

  test("property: assign matches a reference fold over 300 random event sets") {
    // seeded random (key, ts) events; reference = per-key sort + linear
    // gap fold in plain Scala
    val rnd = new scala.util.Random(42)
    val events = Seq.fill(300)(
      (rnd.nextInt(12).toLong, ts(rnd.nextInt(500).toLong), rnd.nextLong() & 0xffffL))
      .distinct // unique (key, ts, id) triples keep the tie-break total
    val gapUs = 45L * 60 * 1000000
    val expected = events.groupBy(_._1).flatMap { case (k, evs) =>
      val sorted = evs.sortBy(e => (e._2.getTime, e._3))
      var seq = 0L
      var prev = Long.MinValue
      sorted.map { e =>
        val t = e._2.getTime * 1000
        if (prev == Long.MinValue || t - prev > gapUs) seq += 1
        prev = t
        (k, e._3, seq)
      }
    }.toSet
    val got = Sessions.assign(events.toDF("user_id", "t", "event_id"),
        "user_id", "t", "event_id", gapUs)
      .select("user_id", "event_id", "session_seq")
      .as[(Long, Long, Long)].collect().toSet
    assert(got == expected)
  }

  test("assign + stats run in ONE exchange (windows and groupBy share the key)") {
    val df = Seq((1L, ts(0), 1L), (1L, ts(5), 2L), (2L, ts(0), 3L))
      .toDF("user_id", "t", "event_id")
    val out = Sessions.stats(df, "user_id", "t", "event_id", gapUs = 1000000L)
    out.collect()
    val shuffles = flattenPlan(out.queryExecution.executedPlan)
      .collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.size == 1,
      s"expected a single user-keyed exchange, got ${shuffles.size}")
  }
}
