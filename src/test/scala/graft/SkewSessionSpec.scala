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

  test("AQE splits a skewed sort-merge join partition at runtime") {
    // 90% of rows on one key + thresholds lowered to test scale: AQE's
    // OptimizeSkewedJoin should split the hot partition. This is the
    // runtime complement to Skew.saltedJoin (which pins the plan shape
    // ahead of time).
    val prev = Map(
      "spark.sql.autoBroadcastJoinThreshold" -> spark.conf.get("spark.sql.autoBroadcastJoinThreshold"),
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" ->
        spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes"),
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" ->
        spark.conf.get("spark.sql.adaptive.advisoryPartitionSizeInBytes"),
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" ->
        spark.conf.get("spark.sql.adaptive.skewJoin.skewedPartitionFactor"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "32KB")
    spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16KB")
    spark.conf.set("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    try {
      val big = spark.range(200000)
        .select(when($"id" % 10 =!= 0, 7L).otherwise($"id").as("k"),
          concat(lit("payload_"), $"id").as("p"))
      val small = spark.range(50000).select($"id".as("k"), ($"id" * 2).as("v"))
      val joined = big.join(small, "k").agg(count(lit(1))).head().getLong(0)
      val expected = big.filter($"k" === 7L).count() * 1L + // key 7 matches once
        big.filter($"k" =!= 7L && $"k" < 50000).count()
      assert(joined == expected)
      // the skew handling itself is observable in the final adaptive plan
      import org.apache.spark.sql.execution.SparkPlan
      import org.apache.spark.sql.execution.adaptive.{AQEShuffleReadExec, AdaptiveSparkPlanExec, QueryStageExec}
      def flatten(p: SparkPlan): Seq[SparkPlan] = {
        val kids = p match {
          case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
          case s: QueryStageExec => Seq(s.plan)
          case other => other.children
        }
        p +: kids.flatMap(flatten)
      }
      // NOTE: a groupBy on the join key downstream would veto the skew
      // split (it needs the join's hash partitioning); a global aggregate
      // imposes no distribution, so the split is free to happen.
      val df2 = big.join(small, "k").agg(sum(length($"p")))
      df2.collect()
      val skewReads = flatten(df2.queryExecution.executedPlan)
        .collect { case a: AQEShuffleReadExec if a.hasSkewedPartition => a }
      assert(skewReads.nonEmpty, "expected AQEShuffleRead with skewed partitions")
    } finally prev.foreach { case (k, v) => spark.conf.set(k, v) }
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

  test("sessionize: within-watermark stragglers extend the start or close alone") {
    implicit val sqlCtx = spark.sqlContext
    val input = MemoryStream[SessionEvent]
    // long watermark delay so late events stay admissible across batches
    val sessions = Sessionize.sessionize(input.toDS(), gapMs = 30 * 60 * 1000L,
      watermarkDelay = "10 hours")
    val q = sessions.writeStream.format("memory").queryName("straggler_out")
      .outputMode("append").start()
    def ts(min: Long) = new Timestamp(1700000000000L + min * 60000L)

    // batch 1 opens session 1 at [60, 70]
    input.addData(SessionEvent(1L, ts(60), "a"), SessionEvent(1L, ts(70), "b"))
    q.processAllAvailable()

    // batch 2: one straggler within the gap BEFORE the start (merges,
    // pulling start back) and one more than a gap earlier (closes alone)
    input.addData(SessionEvent(1L, ts(45), "late_merge"),
      SessionEvent(1L, ts(1), "late_alone"))
    q.processAllAvailable()

    // batch 3: far-future event times the open session out
    input.addData(SessionEvent(2L, ts(5000), "w"))
    q.processAllAvailable()
    val closed = spark.table("straggler_out").as[graft.streaming.SessionSummary]
      .collect().filter(_.session_id == 1L).sortBy(_.start_ts.getTime)
    assert(closed.exists(s => s.n_events == 1L && s.start_ts == ts(1)),
      s"pre-gap straggler should close as its own session, got ${closed.mkString(", ")}")
    assert(closed.exists(s => s.n_events == 3L && s.start_ts == ts(45) && s.end_ts == ts(70)),
      s"within-gap straggler should min-extend the session start, got ${closed.mkString(", ")}")
    q.stop()
  }
}
