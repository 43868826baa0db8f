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
    * @return (node, rank_fp) — fixed-point ranks after `iterations` */
  def ranks(edges: DataFrame, iterations: Int, scale: Long = 1000000000L,
            dampNum: Long = 85L, dampDen: Long = 100L): DataFrame = {
    val e = edges.select(col("src"), col("dst"), col("w"))
      .localCheckpoint(false)
    val nodes = e.select(col("src").as("node"))
      .union(e.select(col("dst").as("node")))
      .distinct().localCheckpoint(false)
    val n = nodes.count() // scalar only — no rows collected
    require(n > 0, "PageRank over an empty edge list")
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
