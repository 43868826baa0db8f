package graft.corpus

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed graph statistics over bounded-degree edge frames — the
  * library half of `emb_triangles` / `emb_communities` (the queries wire
  * these to the mutual-kNN graph; any other edge source with the same
  * shape works).
  *
  * Edge-frame contract: `mutual` holds DIRECTED rows (a, b) with BOTH
  * orientations present for every undirected edge and no self-loops —
  * exactly what `knn ∩ reverse(knn)` produces. Keeping the contract at
  * the edge layer means every downstream join is an id equi-join and
  * per-node work is bounded by the (already-capped) degree.
  */
object Graphs {

  /** Triangle / wedge / clustering-coefficient census, one output row.
    *
    * Triangles ride the id-ordered orientation (Suri & Vassilvitskii
    * 2011's degree-ordering simplification): undirected edges a<b, the
    * two-hop join builds each candidate a<b<c once, the closure join
    * checks (a, c). Work is O(Σ d²) — with degree capped (k for a
    * mutual-kNN graph) that is O(n·k²), never an all-pairs scan.
    * Wedges = Σ d(d−1)/2 in BIGINT; cc_ppm = 3·10⁶·tri div wedges stays
    * integer-exact (0 when the graph has no wedges).
    */
  def triangleCensus(mutual: DataFrame): DataFrame = {
    val und = mutual.filter(col("a") < col("b"))
    val deg = mutual.groupBy(col("a")).agg(count(lit(1)).as("d"))
    val wedgeStats = deg.agg(count(lit(1)).as("n_nodes"),
      coalesce(sum(expr("d * (d - 1L) div 2")), lit(0L)).as("n_wedges"))
    val edgeCount = und.agg(count(lit(1)).as("n_edges"))
    val closed = und.join(
        und.select(col("a").as("b"), col("b").as("c")), "b")
      .join(und.select(col("a"), col("b").as("c")), Seq("a", "c"))
    val triCount = closed.agg(count(lit(1)).as("n_triangles"))
    wedgeStats.crossJoin(broadcast(edgeCount))
      .crossJoin(broadcast(triCount))
      .select(col("n_nodes"), col("n_edges"), col("n_wedges"),
        col("n_triangles"),
        when(col("n_wedges") > 0,
          expr("3L * n_triangles * 1000000L div n_wedges"))
          .otherwise(0L).as("cc_ppm"))
  }

  /** Synchronous label propagation (Raghavan et al. 2007), fixed round
    * count, returning the final (id, label) assignment.
    *
    * Each round: new label = the most-frequent neighbor label, ties to
    * the smallest — computed as a max-count agg followed by a min-label
    * agg over the achievers (two bounded aggs instead of a struct
    * ordering, so an oracle engine reproduces it verbatim). Nodes with
    * no neighbors keep their own id. Fixed `iters` keeps the result
    * deterministic (asynchronous/converged LPA is order-dependent);
    * per-round cost is one O(edges) equi-join + aggregate-grain work.
    * `localCheckpoint` per round caps the lineage the same way
    * dupClusters' loop does. */
  def lpaLabels(nodes: DataFrame, mutual: DataFrame, iters: Int): DataFrame = {
    var labels = nodes.select(col("id"), col("id").as("label"))
    for (_ <- 1 to iters) {
      val nb = mutual.join(labels, col("b") === col("id"))
        .select(col("a"), col("label"))
      val cnt = nb.groupBy(col("a"), col("label")).agg(count(lit(1)).as("c"))
      val mx = cnt.groupBy(col("a")).agg(max(col("c")).as("mc"))
      val best = cnt.join(mx, Seq("a")).filter(col("c") === col("mc"))
        .groupBy(col("a")).agg(min(col("label")).as("new_label"))
      labels = nodes.join(best, col("id") === col("a"), "left")
        .select(col("id"), coalesce(col("new_label"), col("id")).as("label"))
        .localCheckpoint(false)
    }
    labels
  }

  /** Community-size histogram over an LPA assignment: (community_size,
    * n_communities, n_members) — stable under any label renaming, which
    * is what makes it oracle-comparable. */
  def lpaCommunitySizes(nodes: DataFrame, mutual: DataFrame,
                        iters: Int): DataFrame = {
    val sizes = lpaLabels(nodes, mutual, iters).groupBy(col("label"))
      .agg(count(lit(1)).as("community_size"))
    sizes.groupBy(col("community_size"))
      .agg(count(lit(1)).as("n_communities"))
      .withColumn("n_members", col("community_size") * col("n_communities"))
  }

  /** Artifact-backed mutual-kNN edge frame — the compute-once graph the
    * triangle/LPA/modularity/k-core consumers share (the
    * [[Dedup.clustersTable]] discipline: at corpus scale the kNN graph
    * is built once per corpus version and read by many queries, never
    * recomputed per consumer). Returns the directed-both-ways mutual
    * edge set; `emb` is by-name so the source is only scanned when the
    * artifact is absent. Publish semantics (and their one honest race
    * caveat) live in [[ArtifactPublish.ensure]] — one copy for every
    * artifact. */
  def mutualKnnTable(emb: => DataFrame, idCol: String, vecCol: String,
      planes: Array[Array[Double]], planesPerTable: Int, k: Int,
      dir: String): DataFrame = {
    ArtifactPublish.ensure(dir, Seq("mutual")) { tmp =>
      // checkpoint: intersect consumes the expensive knn plan TWICE
      // (forward + reversed); without the cut both children re-run the
      // candidate join + scoring + heaps whenever AQE breaks exchange
      // reuse
      val g = Similarity.knnGraph(emb, idCol, vecCol, planes,
          planesPerTable, k)
        .select(col("vec_id").as("a"), col("neighbor_id").as("b"))
        .localCheckpoint(false)
      g.intersect(g.select(col("b").as("a"), col("a").as("b")))
        .write.mode("overwrite")
        .parquet(new org.apache.hadoop.fs.Path(tmp, "mutual").toString)
    }
    org.apache.spark.sql.SparkSession.active.read.parquet(s"$dir/mutual")
  }

  /** Synchronous k-core peel (Seidman 1983): each round drops EVERY
    * node whose current degree is below k, then the edges touching
    * them — the order-independent formulation, so a fixed round count
    * is deterministic and an oracle can replay it verbatim (unlike
    * sequential peeling, whose result depends on removal order mid-
    * round). `rounds` bounds the iteration the way lpaLabels' iters
    * does: both engines run exactly `rounds` steps, so parity holds
    * even before the fixpoint. A degree cap does NOT bound the round
    * count — a 2-core peel of an L-node path needs ~L/2 synchronous
    * rounds — so the result is an UPPER BOUND on the k-core until the
    * peel converges; [[kCoreCensus]] reports `n_underfilled` (nodes
    * still below k in the final edge set — 0 iff the fixpoint was
    * reached) so a non-converged bound can never read as exact.
    * Per-round cost is one degree rollup + two id equi-joins —
    * O(edges). */
  def kCoreEdges(mutual: DataFrame, k: Int, rounds: Int): DataFrame = {
    var e = mutual.select(col("a"), col("b"))
    for (_ <- 1 to rounds) {
      val keep = e.groupBy(col("a")).agg(count(lit(1)).as("d"))
        .filter(col("d") >= k).select(col("a").as("node"))
      e = e.join(keep.select(col("node").as("a")), "a")
        .join(keep.select(col("node").as("b")), "b")
        .select(col("a"), col("b")).localCheckpoint(false)
    }
    e
  }

  /** One census row per k: nodes and undirected edges surviving the
    * k-core peel — the "how much of the graph is densely supported"
    * ladder (a kNN graph whose 2-core is tiny is mostly hairs).
    * `n_underfilled` counts nodes still under k in the final edge set:
    * 0 means the peel CONVERGED and the row is the exact k-core;
    * anything else means `rounds` expired first and the row is only an
    * upper bound. */
  def kCoreCensus(mutual: DataFrame, ks: Seq[Int], rounds: Int): DataFrame = {
    require(ks.nonEmpty, "kCoreCensus needs at least one core order k")
    ks.map { k =>
      val e = kCoreEdges(mutual, k, rounds)
      val under = e.groupBy(col("a")).agg(count(lit(1)).as("d"))
        .filter(col("d") < k)
        .agg(count(lit(1)).as("n_underfilled"))
      e.agg(
          coalesce(countDistinct(col("a")), lit(0L)).as("n_core_nodes"),
          (count(lit(1)) / 2).cast("long").as("n_core_edges"))
        .crossJoin(broadcast(under))
        .select(lit(k.toLong).as("k"), col("n_core_nodes"),
          col("n_core_edges"), col("n_underfilled"))
    }.reduce(_ unionByName _)
  }

  /** Degree assortativity (Newman 2002): Pearson correlation of
    * endpoint degrees over the directed-both-ways edge list (which IS
    * the undirected edge-end enumeration the definition wants). The
    * sums and every cross product ride DECIMAL(38,0) (oracle: HUGEINT)
    * — in BIGINT, n·Σd² wraps silently around 3·10⁸ edges even at the
    * kNN degree cap, and a single 3·10⁶-degree hub overflows Σd² on
    * its own. r itself is computed from those exact integers in
    * doubles with two sqrts — IEEE requires sqrt correctly rounded, so
    * both engines produce the identical double from the identical
    * integers. r > 0 = hubs link hubs (a kNN graph on clustered
    * embeddings); r < 0 = hub-and-spoke. One degree rollup + one edge
    * join; aggregate grain after. */
  def assortativity(mutual: DataFrame): DataFrame = {
    val deg = mutual.groupBy(col("a")).agg(count(lit(1)).as("d"))
    val xy = mutual
      .join(deg.select(col("a"), col("d").as("dx")), "a")
      .join(deg.select(col("a").as("b"), col("d").as("dy")), "b")
    val zero = lit(0).cast("decimal(38,0)")
    xy.agg(count(lit(1)).as("n_ends"),
        coalesce(sum(expr("CAST(dx AS DECIMAL(38,0))")), zero).as("sx"),
        coalesce(sum(expr("CAST(dy AS DECIMAL(38,0))")), zero).as("sy"),
        coalesce(sum(expr("CAST(dx AS DECIMAL(38,0)) * dx")), zero).as("sxx"),
        coalesce(sum(expr("CAST(dy AS DECIMAL(38,0)) * dy")), zero).as("syy"),
        coalesce(sum(expr("CAST(dx AS DECIMAL(38,0)) * dy")), zero).as("sxy"))
      .withColumn("varx", expr(
        "CAST(n_ends AS DECIMAL(38,0)) * sxx - sx * sx"))
      .withColumn("vary", expr(
        "CAST(n_ends AS DECIMAL(38,0)) * syy - sy * sy"))
      .select(col("n_ends"),
        // sxy crosses the output edge as STRING: the DECIMAL(38,0)
        // arithmetic stays internal (a BIGINT re-cast would reintroduce
        // the exact overflow the decimal sums were adopted against — a
        // 3e6-degree hub's Σdx·dy ≈ 2.7e19 > 2^63: Spark nulls it,
        // DuckDB throws, silently diverging the engines), but a
        // top-level DECIMAL output has no driver-green hash precedent
        // (r14's only red row): Spark's parquet fixed-len-byte-array
        // decimal and DuckDB's int128 HUGEINT hash differently even
        // when bit-identical in value. Both engines render an exact
        // scale-0 integer as the same plain digit string.
        expr("CAST(CAST(sxy AS DECIMAL(38,0)) AS STRING)").as("sxy"),
        when(col("n_ends") === 0 || col("varx") === 0 || col("vary") === 0, 0.0)
          .otherwise(expr(
            """round(CAST(CAST(n_ends AS DECIMAL(38,0)) * sxy - sx * sy AS DOUBLE)
              |      / (sqrt(CAST(varx AS DOUBLE))
              |         * sqrt(CAST(vary AS DOUBLE))), 6)"""
              .stripMargin)).as("assortativity"))
  }

  /** Newman modularity of a partition (Newman & Girvan 2004),
    * Q = Σ_c [e_c/m − (d_c/2m)²], one output row. The numerator
    * 4m·Σe_c − Σd_c² stays EXACT in BIGINT (envelope: 4m·e ≤ 4m² < 2⁶³
    * → m < 1.5·10⁹ edges); Q itself is ONE division of two exact
    * integers-as-doubles, so both engines round the identical quotient.
    * (A truncating integral ppm would also match — Spark `div` and
    * DuckDB `//` both truncate toward zero, measured — but truncation
    * toward zero is sign-asymmetric around Q=0, exactly where this
    * diagnostic is read; the double keeps the near-zero resolution.)
    * CONTRACT: `labels` must cover every endpoint of `mutual` — an
    * unlabeled endpoint drops its edges from m/e_in while d_c still
    * counts the full degree, biasing Q out of [-1/2, 1] with no error.
    * Labels join the edge
    * and degree frames on node ids; everything after is
    * community-grain. Communities of isolated nodes have d_c = e_c = 0
    * and drop out of both sums; `n_linked_comms` counts only
    * communities touching an edge. */
  def modularity(mutual: DataFrame, labels: DataFrame): DataFrame = {
    val und = mutual.filter(col("a") < col("b"))
    val lab = labels.select(col("id"), col("label"))
    val e = und
      .join(lab.select(col("id").as("a"), col("label").as("la")), "a")
      .join(lab.select(col("id").as("b"), col("label").as("lb")), "b")
    val mm = e.agg(count(lit(1)).as("m"),
      coalesce(sum(when(col("la") === col("lb"), 1L).otherwise(0L)), lit(0L))
        .as("e_in"))
    val dc = mutual.groupBy(col("a")).agg(count(lit(1)).as("d"))
      .join(lab.select(col("id").as("a"), col("label")), "a")
      .groupBy(col("label")).agg(sum(col("d")).as("d_c"))
    val d2 = dc.agg(coalesce(sum(col("d_c") * col("d_c")), lit(0L)).as("sum_d2"),
      count(lit(1)).as("n_linked_comms"))
    mm.crossJoin(broadcast(d2))
      .select(col("m"), col("e_in"), col("n_linked_comms"),
        when(col("m") === 0, 0.0).otherwise(expr(
          """round(CAST(4 * m * e_in - sum_d2 AS DOUBLE)
            |      / (4.0 * CAST(m AS DOUBLE) * CAST(m AS DOUBLE)), 6)"""
            .stripMargin)).as("modularity"))
  }
}
