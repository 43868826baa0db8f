package graft

import graft.operators.PageRank
import org.apache.spark.sql.functions._

/** Operator-contract tests for the fixed-point PageRank (the oracle row
  * proves cross-engine parity on the fixture graph; these pin ranking
  * behavior on known topologies). */
class PageRankSpec extends SparkTestBase {
  import spark.implicits._

  private val SCALE = 1000000000L

  private def pr(edges: Seq[(String, String, Long)], iters: Int = 10) =
    PageRank.ranks(edges.toDF("src", "dst", "w"), iters)
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap

  test("star graph: the hub absorbs the spokes' rank") {
    val r = pr(Seq(("a", "hub", 1L), ("b", "hub", 1L), ("c", "hub", 1L),
      ("hub", "a", 1L)))
    // hub collects three spokes; a receives the hub's entire outflow
    // (and so can exceed the hub itself); b and c get only the base
    assert(r("hub") > r("b") && r("hub") > r("c"), s"hub must outrank pure spokes: $r")
    assert(r("a") > r("b") && r("b") === r("c"))
  }

  test("symmetric cycle: all ranks equal") {
    val r = pr(Seq(("a", "b", 1L), ("b", "c", 1L), ("c", "a", 1L)))
    assert(r.values.toSet.size === 1, s"cycle ranks must be uniform: $r")
  }

  test("edge weights steer the split") {
    // u splits rank 3:1 between x and y
    val r = pr(Seq(("u", "x", 3L), ("u", "y", 1L), ("x", "u", 1L), ("y", "u", 1L)))
    assert(r("x") > r("y"))
  }

  test("rank mass never exceeds scale; dangling mass drains, not crashes") {
    // d is dangling (no out-edges): its inflow leaves the system
    val r = pr(Seq(("a", "b", 1L), ("b", "d", 1L)))
    assert(r.values.sum <= SCALE)
    assert(r.keySet === Set("a", "b", "d"))
    assert(r.values.forall(_ >= 0L))
  }

  test("zero iterations returns the uniform start vector") {
    val r = pr(Seq(("a", "b", 1L), ("b", "a", 1L)), iters = 0)
    assert(r === Map("a" -> SCALE / 2, "b" -> SCALE / 2))
  }

  test("driver short-circuit and distributed loop produce identical ranks") {
    // deterministic pseudo-random graph, long-keyed this time
    val edges = (0 until 400).map { i =>
      val s = (i * 7919L) % 37
      val d = (i * 104729L + 13) % 37
      (s, if (d == s) (d + 1) % 37 else d, (i % 5) + 1L)
    }.distinct
    val df = edges.toDF("src", "dst", "w")
    val viaDriver = PageRank.ranks(df, 10)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaCluster = PageRank.ranks(df, 10, driverGateEdges = 0L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaDriver === viaCluster)
  }
}
