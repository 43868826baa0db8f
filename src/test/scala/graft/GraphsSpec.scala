package graft

import graft.corpus.Graphs
import org.apache.spark.sql.DataFrame

/** Planted-topology properties for the graph-statistics module: the
  * census numbers are hand-countable on small graphs, so these pin the
  * arithmetic (orientation builds each triangle once, wedge formula,
  * ppm division) rather than echoing the implementation. */
class GraphsSpec extends SparkTestBase {
  import spark.implicits._

  /** undirected edge list → the directed-both-ways contract frame */
  private def mutual(edges: (Long, Long)*): DataFrame =
    (edges ++ edges.map { case (a, b) => (b, a) }).toDF("a", "b")

  private def nodes(ids: Long*): DataFrame = ids.toDF("id")

  test("two disjoint triangles: 2 triangles, 6 wedges, cc = 1.0") {
    val m = mutual((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
    val r = Graphs.triangleCensus(m).collect().head
    assert(r.getAs[Long]("n_nodes") == 6 && r.getAs[Long]("n_edges") == 6)
    assert(r.getAs[Long]("n_wedges") == 6 && r.getAs[Long]("n_triangles") == 2)
    assert(r.getAs[Long]("cc_ppm") == 1000000L)
  }

  test("two 4-cliques + a bridge: 8 triangles, 30 wedges, cc = 0.8") {
    def clique(ids: Seq[Long]) =
      for (i <- ids.indices; j <- i + 1 until ids.size) yield (ids(i), ids(j))
    val m = mutual(clique(Seq(1L, 2L, 3L, 4L)) ++ clique(Seq(5L, 6L, 7L, 8L)) ++
      Seq((4L, 5L)): _*)
    val r = Graphs.triangleCensus(m).collect().head
    assert(r.getAs[Long]("n_edges") == 13 && r.getAs[Long]("n_triangles") == 8)
    assert(r.getAs[Long]("n_wedges") == 30 && r.getAs[Long]("cc_ppm") == 800000L)
  }

  test("a path has wedges but zero triangles and cc 0") {
    val r = Graphs.triangleCensus(mutual((1L, 2L), (2L, 3L), (3L, 4L)))
      .collect().head
    assert(r.getAs[Long]("n_triangles") == 0 && r.getAs[Long]("n_wedges") == 2)
    assert(r.getAs[Long]("cc_ppm") == 0L)
  }

  test("empty edge frame: all-zero census row, no divide-by-zero") {
    val r = Graphs.triangleCensus(Seq.empty[(Long, Long)].toDF("a", "b"))
      .collect().head
    for (c <- Seq("n_nodes", "n_edges", "n_wedges", "n_triangles", "cc_ppm"))
      assert(r.getAs[Long](c) == 0L, s"$c must be 0 on an empty graph")
  }

  test("LPA collapses each disjoint triangle into one community") {
    val m = mutual((1L, 2L), (2L, 3L), (1L, 3L), (4L, 5L), (5L, 6L), (4L, 6L))
    val hist = Graphs.lpaCommunitySizes(nodes(1L, 2L, 3L, 4L, 5L, 6L), m, 3)
      .collect()
    assert(hist.length == 1)
    assert(hist.head.getAs[Long]("community_size") == 3 &&
      hist.head.getAs[Long]("n_communities") == 2 &&
      hist.head.getAs[Long]("n_members") == 6)
  }

  test("LPA keeps isolated nodes as singletons") {
    val m = mutual((1L, 2L), (2L, 3L), (1L, 3L))
    val hist = Graphs.lpaCommunitySizes(nodes(1L, 2L, 3L, 7L, 8L), m, 3)
      .collect().map(r => (r.getAs[Long]("community_size"),
        r.getAs[Long]("n_communities"))).toMap
    assert(hist == Map(3L -> 1L, 1L -> 2L))
  }

  test("k-core peel: a path has an empty 2-core; a triangle with a tail keeps the triangle") {
    val path = mutual((1L, 2L), (2L, 3L), (3L, 4L))
    val r1 = Graphs.kCoreCensus(path, Seq(2), 6).collect().head
    assert(r1.getAs[Long]("n_core_nodes") == 0 && r1.getAs[Long]("n_core_edges") == 0)
    assert(r1.getAs[Long]("n_underfilled") == 0, "4-node path converges in 6 rounds")
    // triangle {1,2,3} + tail 3-4: the tail peels, the triangle survives
    val tri = mutual((1L, 2L), (2L, 3L), (1L, 3L), (3L, 4L))
    val r2 = Graphs.kCoreCensus(tri, Seq(2), 6).collect().head
    assert(r2.getAs[Long]("n_core_nodes") == 3 && r2.getAs[Long]("n_core_edges") == 3)
    assert(r2.getAs[Long]("n_underfilled") == 0)
  }

  test("k-core peel reports non-convergence instead of passing a bound off as exact") {
    // a 12-node path needs ~5 synchronous rounds to empty its 2-core;
    // with rounds=1 the interior survives and n_underfilled must say so
    val long = mutual((1L to 11L).map(i => (i, i + 1)): _*)
    val r = Graphs.kCoreCensus(long, Seq(2), 1).collect().head
    assert(r.getAs[Long]("n_core_edges") > 0, "one round cannot finish the peel")
    assert(r.getAs[Long]("n_underfilled") > 0,
      "the unconverged bound must be flagged")
    // and with enough rounds the same graph converges to the empty core
    val done = Graphs.kCoreCensus(long, Seq(2), 8).collect().head
    assert(done.getAs[Long]("n_core_edges") == 0 &&
      done.getAs[Long]("n_underfilled") == 0)
  }

  test("k-core peel: K4 is its own 3-core; nothing is a 4-core") {
    def clique(ids: Seq[Long]) =
      for (i <- ids.indices; j <- i + 1 until ids.size) yield (ids(i), ids(j))
    val k4 = mutual(clique(Seq(1L, 2L, 3L, 4L)): _*)
    val rows = Graphs.kCoreCensus(k4, Seq(3, 4), 6).collect()
      .map(r => r.getAs[Long]("k") ->
        (r.getAs[Long]("n_core_nodes"), r.getAs[Long]("n_core_edges"))).toMap
    assert(rows(3L) == ((4L, 6L)) && rows(4L) == ((0L, 0L)))
  }

  test("assortativity: a star is perfectly disassortative, a regular graph guards to 0") {
    val star = mutual((0L, 1L), (0L, 2L), (0L, 3L))
    val starDf = Graphs.assortativity(star)
    // output-edge contract: sxy leaves as STRING (a top-level DECIMAL
    // output was r14's only driver-hash red row); the exact integer
    // renders as plain digits on both engines
    assert(starDf.schema("sxy").dataType ==
      org.apache.spark.sql.types.StringType)
    val r1 = starDf.collect().head
    // star 0-{1,2,3} both-ways: Σdx·dy = 6·(3·1) = 18
    assert(r1.getAs[String]("sxy") == "18")
    assert(r1.getAs[Double]("assortativity") == -1.0)
    // triangle: every degree equal -> zero variance -> guarded 0.0
    val tri = mutual((1L, 2L), (2L, 3L), (1L, 3L))
    val r2 = Graphs.assortativity(tri).collect().head
    assert(r2.getAs[Double]("assortativity") == 0.0)
    // empty graph: n_ends = 0, no divide
    val r3 = Graphs.assortativity(Seq.empty[(Long, Long)].toDF("a", "b"))
      .collect().head
    assert(r3.getAs[Long]("n_ends") == 0L && r3.getAs[Double]("assortativity") == 0.0)
  }

  test("LPA on an edgeless graph is all singletons") {
    val hist = Graphs.lpaCommunitySizes(nodes(1L, 2L, 3L),
      Seq.empty[(Long, Long)].toDF("a", "b"), 3).collect()
    assert(hist.length == 1 &&
      hist.head.getAs[Long]("community_size") == 1 &&
      hist.head.getAs[Long]("n_communities") == 3)
  }
}
