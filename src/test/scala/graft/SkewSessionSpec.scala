package graft

import graft.corpus.Skew
import graft.streaming.{SessionEvent, Sessionize}
import java.sql.Timestamp
import org.apache.spark.sql.execution.streaming.runtime.MemoryStream
import org.apache.spark.sql.functions._

/** Skew salting exactness + stateful sessionization semantics. */
class SkewSessionSpec extends SparkTestBase {
  import spark.implicits._

  test("saltedJoin returns exactly the rows of the plain join under heavy skew") {
    // hot key: 9000 of 10000 rows share key 1
    val big = spark.range(10000)
      .select(when($"id" < 9000, 1L).otherwise($"id").as("k"), $"id".as("payload"))
    val small = Seq((1L, "hot"), (42L, "cold"), (9999L, "tail")).toDF("k", "name")
    val plain = big.join(small, "k").agg(count(lit(1)), sum($"payload")).head()
    val salted = Skew.saltedJoin(big, small, "k", 8)
      .agg(count(lit(1)), sum($"payload")).head()
    assert(salted == plain)
  }

  test("saltedSumCount equals the direct aggregate") {
    val df = spark.range(20000)
      .select(when($"id" % 100 =!= 0, 7L).otherwise($"id" % 5).as("k"), $"id".as("v"))
    val direct = df.groupBy($"k").agg(sum($"v").as("total"), count(lit(1)).as("n"))
      .orderBy("k").collect().toSeq
    val salted = Skew.saltedSumCount(df, $"k", $"v", 16)
      .orderBy("k").collect().toSeq
    assert(salted == direct)
  }

  test("sessionize: gap splits sessions, arrivals across batches accumulate") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    val sessions = Sessionize.sessionize(input.toDS(), gapMs = 30 * 60 * 1000L)
    val q = sessions.writeStream.format("memory").queryName("sessions_out")
      .outputMode("append").start()
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)

    // batch 1: session 5 = three events within the gap; session 9 = one event
    input.addData(
      SessionEvent(5L, ts(0), "a"), SessionEvent(5L, ts(5), "b"),
      SessionEvent(5L, ts(10), "c"), SessionEvent(9L, ts(0), "x"))
    q.processAllAvailable()
    assert(spark.table("sessions_out").count() == 0) // nothing closed yet

    // batch 2: session 5 events far past the gap → its first run closes on
    // data arrival; the watermark jump also fires session 9's event-time
    // timeout (processAllAvailable runs the trailing no-data batch)
    input.addData(SessionEvent(5L, ts(120), "d"), SessionEvent(5L, ts(121), "e"))
    q.processAllAvailable()
    val closed = spark.table("sessions_out").as[graft.streaming.SessionSummary]
      .collect().sortBy(_.session_id)
    assert(closed.length == 2)
    assert(closed(0).session_id == 5L && closed(0).n_events == 3L)
    assert(closed(0).start_ts == ts(0) && closed(0).end_ts == ts(10))
    assert(closed(1).session_id == 9L && closed(1).n_events == 1L)

    // batch 3: advance the watermark far ahead → session 5's second run
    // (2 events at ts 120/121) times out too
    input.addData(SessionEvent(7L, ts(600), "w"))
    q.processAllAvailable()
    val all = spark.table("sessions_out").as[graft.streaming.SessionSummary].collect()
    assert(all.exists(s => s.session_id == 5L && s.n_events == 2L),
      s"session 5's second run should close by timeout, got ${all.mkString(", ")}")
    q.stop()
  }
}
