package graft

import graft.operators.AsofJoin
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._

class AsofJoinSpec extends SparkTestBase {
  import spark.implicits._

  private val clicks = Seq(
    (1L, 10L, 100L), (2L, 10L, 200L), (3L, 10L, 300L),
    (4L, 20L, 150L), // user with no purchase at all
    (5L, 30L, 100L)  // purchase exists but only later
  ).toDF("event_id", "user_id", "t")

  private val purchases = Seq(
    (10L, 100L, 1.5), (10L, 250L, 2.5),
    (30L, 500L, 9.9)
  ).toDF("user_id", "t", "value")

  test("backward as-of: latest right at-or-before each left row, else null") {
    val got = AsofJoin.backward(clicks, purchases, "user_id", "t", "t",
        Seq("t", "value"))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3)),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    assert(got.toSeq == Seq(
      (1L, Some(100L), Some(1.5)), // tie: purchase AT t=100 matches (<=)
      (2L, Some(100L), Some(1.5)),
      (3L, Some(250L), Some(2.5)),
      (4L, None, None),            // no purchases for user 20
      (5L, None, None)))           // purchase exists only after t=100
  }

  test("matches a brute-force theta-join + row_number reference") {
    val rnd = new scala.util.Random(7)
    val l = (1L to 300L).map(i => (i, rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
      .toDF("event_id", "user_id", "t")
    val r = (1L to 120L).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toDouble))
      .toDF("user_id", "t", "value")
      // operator tie contract: unique (key, time) on the right
      .groupBy("user_id", "t").agg(max("value").as("value"))
    val fast = AsofJoin.backward(l, r, "user_id", "t", "t", Seq("t", "value"))
      .withColumnRenamed("t", "lt")
    val brute = l.as("l").join(r.as("r"),
        col("l.user_id") === col("r.user_id") && col("l.t") >= col("r.t"), "left")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("l.event_id"))
          .orderBy(col("r.t").desc_nulls_last)))
      .filter(col("rk") === 1)
      .select(col("l.event_id"), col("l.user_id"), col("l.t").as("lt"),
        col("r.t").as("t"), col("r.value").as("value"))
    assert(fast.exceptAll(brute).count() == 0 && brute.exceptAll(fast).count() == 0)
  }

  test("plan: one shuffle keyed by the join key, no cartesian/range join") {
    def flatten(p: SparkPlan): Seq[SparkPlan] = flattenPlan(p)
    val df = AsofJoin.backward(clicks, purchases, "user_id", "t", "t",
      Seq("t", "value"))
    df.collect()
    val nodes = flatten(df.queryExecution.executedPlan)
    assert(!nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
      "as-of must not fall back to a nested-loop join")
    assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
      "as-of must not build a cross product")
    // union + window: exactly one exchange hashes on the key (plus any
    // AQE reused stages); more would mean the window re-partitioned
    val shuffles = nodes.collect { case s: ShuffleExchangeLike => s }
    assert(shuffles.nonEmpty && shuffles.size <= 2,
      s"expected the single key shuffle, saw ${shuffles.size}")
  }

  test("forward as-of: earliest right at-or-after each left row, else null") {
    val got = AsofJoin.forward(clicks, purchases, "user_id", "t", "t",
        Seq("t", "value"))
      .orderBy("event_id")
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(3)) None else Some(r.getLong(3))))
    assert(got.toSeq == Seq(
      (1L, Some(100L)),  // tie: purchase AT t=100 matches (>=)
      (2L, Some(250L)),
      (3L, None),        // no purchase at/after t=300 for user 10
      (4L, None),
      (5L, Some(500L)))) // the later purchase is ahead of t=100
  }

  test("forward matches a brute-force theta-join reference") {
    val rnd = new scala.util.Random(11)
    val l = (1L to 300L).map(i => (i, rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong))
      .toDF("event_id", "user_id", "t")
    val r = (1L to 120L).map(i => (rnd.nextInt(5).toLong, rnd.nextInt(1000).toLong, i.toDouble))
      .toDF("user_id", "t", "value")
      .groupBy("user_id", "t").agg(max("value").as("value"))
    val fast = AsofJoin.forward(l, r, "user_id", "t", "t", Seq("t", "value"))
      .withColumnRenamed("t", "lt")
    val brute = l.as("l").join(r.as("r"),
        col("l.user_id") === col("r.user_id") && col("l.t") <= col("r.t"), "left")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("l.event_id"))
          .orderBy(col("r.t").asc_nulls_last)))
      .filter(col("rk") === 1)
      .select(col("l.event_id"), col("l.user_id"), col("l.t").as("lt"),
        col("r.t").as("t"), col("r.value").as("value"))
    assert(fast.exceptAll(brute).count() == 0 && brute.exceptAll(fast).count() == 0)
  }

  test("tolerance bounds the look-back/look-ahead (merge_asof semantics)") {
    // backward, tol=75: event 1 gap 0 (match), 2 gap 100 (dropped),
    // 3 gap 50 (match), 4/5 unmatched as ever
    val gotB = AsofJoin.backward(clicks, purchases, "user_id", "t", "t",
        Seq("value"), tolerance = Some(75L))
      .orderBy("event_id")
      .collect().map(r => if (r.isNullAt(3)) None else Some(r.getDouble(3)))
    assert(gotB.toSeq == Seq(Some(1.5), None, Some(2.5), None, None))
    // brute-force cross-check on random data, both directions
    val rnd = new scala.util.Random(21)
    val l = (1L to 200L).map(i => (i, rnd.nextInt(4).toLong, rnd.nextInt(500).toLong))
      .toDF("event_id", "user_id", "t")
    val r = (1L to 80L).map(i => (rnd.nextInt(4).toLong, rnd.nextInt(500).toLong, i.toDouble))
      .toDF("user_id", "t", "value")
      .groupBy("user_id", "t").agg(max("value").as("value"))
    val tol = 40L
    val fast = AsofJoin.backward(l, r, "user_id", "t", "t", Seq("t", "value"),
        Some(tol)).withColumnRenamed("t", "lt")
    val brute = l.as("l").join(r.as("r"),
        col("l.user_id") === col("r.user_id") && col("l.t") >= col("r.t") &&
          col("l.t") - col("r.t") <= tol, "left")
      .withColumn("rk", row_number().over(
        org.apache.spark.sql.expressions.Window
          .partitionBy(col("l.event_id"))
          .orderBy(col("r.t").desc_nulls_last)))
      .filter(col("rk") === 1)
      .select(col("l.event_id"), col("l.user_id"), col("l.t").as("lt"),
        col("r.t").as("t"), col("r.value").as("value"))
    assert(fast.exceptAll(brute).count() == 0 && brute.exceptAll(fast).count() == 0)
  }

  test("column names with dots/spaces survive the struct round-trip") {
    val l = clicks.withColumnRenamed("t", "event.time")
      .withColumnRenamed("event_id", "event id")
    val r = purchases.withColumnRenamed("value", "purchase.value")
    val got = AsofJoin.backward(l, r, "user_id", "event.time", "t",
        Seq("t", "purchase.value"))
      .orderBy(col("`event id`"))
      .collect()
      .map(r => (r.getLong(0),
        if (r.isNullAt(4)) None else Some(r.getDouble(4))))
    assert(got.toSeq == Seq(
      (1L, Some(1.5)), (2L, Some(1.5)), (3L, Some(2.5)), (4L, None), (5L, None)))
  }
}
