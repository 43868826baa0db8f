package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Weighted PageRank in exact fixed-point arithmetic (Page et al. 1999,
  * "The PageRank Citation Ranking") — graph centrality over an edge
  * list, the analytics layer a curation pipeline uses to weight domains
  * or event types by structural importance.
  *
  * Everything is integer: ranks live in `scale` fixed-point units, the
  * damping factor is the rational dampNum/dampDen, and every step is
  * multiply-then-floor-divide — so a DuckDB oracle replays the full
  * iteration bit-for-bit (float PageRank can never hash-gate: the
  * contribution sum order differs between engines). The spec:
  *
  *   r₀(v)    = scale div n
  *   rₖ₊₁(v) = ((dampDen−dampNum)·scale) div (dampDen·n)
  *             + (dampNum · Σ_{u→v} (rₖ(u)·w(u,v)) div wout(u)) div dampDen
  *
  * Dangling mass is dropped, not redistributed (ranks then sum to
  * slightly under `scale` — a spec choice both engines implement
  * identically; redistribution would add a per-iteration global
  * aggregate for no ranking benefit).
  *
  * Scale: per iteration, one src-keyed broadcast-or-shuffle join of the
  * edge list against the node-cardinality rank table + one dst-keyed
  * partial-aggregated rollup — the textbook distributed PageRank step.
  * Rank/node frames are node-cardinality; lineage is cut per round
  * (localCheckpoint — the dupClusters discipline; reliable checkpoints
  * at petabyte scale). Overflow envelope: rₖ ≤ ~scale, so rₖ·w needs
  * scale·max(w) < 2⁶³ — at the default scale 10⁹ that allows ~9·10⁹
  * transits on a single edge; pre-bucket heavier edges or lower scale.
  */
object PageRank {

  /** @param edges (src, dst, w: long) weighted edge list, w > 0
    * @param driverGateEdges edge count at or under which the iteration
    *        runs driver-side (the [[graft.corpus.Dedup.dupClusters]]
    *        gate discipline): a vocabulary- or domain-sized graph pays
    *        10 × several Spark jobs of pure fixed overhead in the
    *        distributed loop, where a driver array loop is micro-
    *        seconds — SAME integer arithmetic, bit-identical ranks
    *        (spec-pinned both paths equal). The distributed loop is the
    *        web-scale path.
    * @return (node, rank_fp) — fixed-point ranks after `iterations` */
  def ranks(edges: DataFrame, iterations: Int, scale: Long = 1000000000L,
            dampNum: Long = 85L, dampDen: Long = 100L,
            driverGateEdges: Long = 1L << 20): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("w"))
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().localCheckpoint(false)
    val n = nodes.count() // scalar only — no rows collected
    require(n > 0, "PageRank over an empty edge list")
    // w ≤ 0 would make the two paths diverge (the driver loop throws on
    // a zero wout, the SQL `div` returns NULL and silently skips the
    // edge) — and so would NULLs: a NULL w slips past a bare `w <= 0`
    // filter (NULL predicate drops the row from the PROBE, not the
    // graph), then NPEs in the driver loop while the SQL path silently
    // drops the edge; a NULL src/dst is a real node to the driver's
    // index map but invisible to the distributed equi-joins. Refuse all
    // of them loudly; the edge frame is checkpointed so this probe is
    // one cheap job
    require(e.filter(col("w").isNull || col("w") <= 0 ||
        col("src").isNull || col("dst").isNull).isEmpty,
      "PageRank edges must have non-null src/dst and positive weights")
    // the counts above double as the edge materialization either path needs
    if (e.count() <= driverGateEdges) {
      val spark = edges.sparkSession
      val rows = e.collect()
      val idx = scala.collection.mutable.LinkedHashMap[Any, Int]()
      def id(v: Any): Int = idx.getOrElseUpdate(v, idx.size)
      val es = rows.map(r => (id(r.get(0)), id(r.get(1)), r.getLong(2)))
      val nn = idx.size
      val wout = new Array[Long](nn)
      es.foreach { case (s, _, w) => wout(s) += w }
      val base = ((dampDen - dampNum) * scale) / (dampDen * nn)
      var r = Array.fill(nn)(scale / nn)
      var it = 0
      while (it < iterations) {
        val contrib = new Array[Long](nn)
        es.foreach { case (s, d, w) => contrib(d) += (r(s) * w) / wout(s) }
        r = Array.tabulate(nn)(v => base + dampNum * contrib(v) / dampDen)
        it += 1
      }
      val nodeType = edges.schema("src").dataType
      val schema = org.apache.spark.sql.types.StructType(Seq(
        org.apache.spark.sql.types.StructField("node", nodeType),
        org.apache.spark.sql.types.StructField("rank_fp",
          org.apache.spark.sql.types.LongType, nullable = false)))
      val out = idx.toSeq.map { case (v, i) =>
        org.apache.spark.sql.Row(v, r(i)) }
      return spark.createDataFrame(
        new java.util.ArrayList(scala.jdk.CollectionConverters
          .SeqHasAsJava(out).asJava), schema)
    }
    val wout = e.groupBy(col("src")).agg(sum(col("w")).as("wout"))
      .localCheckpoint(false)
    val base = ((dampDen - dampNum) * scale) / (dampDen * n)
    var pr = nodes.withColumn("r", lit(scale / n))
    var i = 0
    while (i < iterations) {
      val contrib = e
        .join(wout, Seq("src"))
        .join(pr.withColumnRenamed("node", "src"), Seq("src"))
        .select(col("dst").as("node"), expr("(r * w) div wout").as("c"))
        .groupBy(col("node")).agg(sum(col("c")).as("contrib"))
      pr = nodes.join(contrib, Seq("node"), "left")
        .select(col("node"),
          (lit(base) +
            expr(s"($dampNum * coalesce(contrib, 0L)) div $dampDen")).as("r"))
        .localCheckpoint(false)
      i += 1
    }
    pr.withColumnRenamed("r", "rank_fp")
  }
}
