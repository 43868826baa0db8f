package graft

import graft.operators.RangeJoin
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.{BroadcastNestedLoopJoinExec, CartesianProductExec}
import org.apache.spark.sql.functions._

class RangeJoinSpec extends SparkTestBase {
  import spark.implicits._

  private def flatten(p: SparkPlan): Seq[SparkPlan] = flattenPlan(p)

  // random points and intervals over a shared domain; interval length is
  // a mix of shorter- and longer-than-bucket so both explode shapes run
  private val rnd = new scala.util.Random(7)
  private val points = (1L to 400L).map(i => (i, rnd.nextInt(10000).toLong))
    .toDF("p_id", "p")
  private val intervals = (1L to 150L).map { i =>
    val lo = rnd.nextInt(10000).toLong
    (i, lo, lo + rnd.nextInt(400).toLong)
  }.toDF("iv_id", "lo", "hi")

  test("pointInInterval matches the brute-force non-equi join") {
    val fast = RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi",
        bucketWidth = 128)
      .select("p_id", "iv_id")
    val brute = points.join(intervals,
        col("p") >= col("lo") && col("p") <= col("hi"))
      .select("p_id", "iv_id")
    assert(fast.count() > 0, "fixture should produce matches")
    assert(fast.exceptAll(brute).count() == 0 && brute.exceptAll(fast).count() == 0)
  }

  test("pointInInterval: NULLs and inverted intervals never match") {
    val p = Seq((1L, Some(50L)), (2L, None)).toDF("p_id", "p")
    val iv = Seq((1L, Some(0L), Some(100L)), // valid: catches p=50
                 (2L, Some(100L), Some(0L)), // inverted: dropped
                 (3L, None, Some(100L)),     // NULL lo: dropped
                 (4L, Some(0L), None))       // NULL hi: dropped
      .toDF("iv_id", "lo", "hi")
    val got = RangeJoin.pointInInterval(p, iv, "p", "lo", "hi", 64)
      .select("p_id", "iv_id").as[(Long, Long)].collect().toSet
    assert(got == Set((1L, 1L)))
  }

  test("intervalOverlap matches brute force, one row per overlapping pair") {
    val a = intervals.toDF("a_id", "a_lo", "a_hi")
    val b = (1L to 120L).map { i =>
      val lo = rnd.nextInt(10000).toLong
      (i, lo, lo + rnd.nextInt(600).toLong)
    }.toDF("b_id", "b_lo", "b_hi")
    val fast = RangeJoin.intervalOverlap(a, b, "a_lo", "a_hi", "b_lo", "b_hi",
        bucketWidth = 128)
      .select("a_id", "b_id")
    val brute = a.join(b, col("a_lo") <= col("b_hi") && col("b_lo") <= col("a_hi"))
      .select("a_id", "b_id")
    assert(fast.count() > 0)
    // exceptAll is multiset difference: also proves no pair is emitted twice
    assert(fast.exceptAll(brute).count() == 0 && brute.exceptAll(fast).count() == 0)
  }

  test("plan: bucketized joins are equi-joins, no cartesian/nested-loop") {
    val overlap = RangeJoin.intervalOverlap(
      intervals.toDF("a_id", "a_lo", "a_hi"),
      intervals.toDF("b_id", "b_lo", "b_hi"),
      "a_lo", "a_hi", "b_lo", "b_hi", 128)
    for (df <- Seq(
        RangeJoin.pointInInterval(points, intervals, "p", "lo", "hi", 128),
        overlap)) {
      df.collect()
      val nodes = flatten(df.queryExecution.executedPlan)
      assert(!nodes.exists(_.isInstanceOf[BroadcastNestedLoopJoinExec]),
        "range join must not fall back to a nested-loop join")
      assert(!nodes.exists(_.isInstanceOf[CartesianProductExec]),
        "range join must not build a cross product")
    }
  }

  test("bucket ids are floor-aligned for negative values") {
    val p = Seq((1L, -5L), (2L, -128L), (3L, 0L)).toDF("p_id", "p")
    val iv = Seq((10L, -130L, -1L)).toDF("iv_id", "lo", "hi")
    val got = RangeJoin.pointInInterval(p, iv, "p", "lo", "hi", 64)
      .select("p_id").as[Long].collect().toSet
    assert(got == Set(1L, 2L)) // -5 and -128 fall inside [-130, -1]; 0 does not
  }
}
