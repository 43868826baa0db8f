package graft

import graft.corpus.{Similarity, VectorExpr}
import org.apache.spark.sql.functions._

/** Similarity-search coverage; the load-bearing test is the bit-identical
  * cross-check between the native codegen expressions and the HOF folds
  * (the HOF fold is the form the DuckDB oracle mirrors). */
class SimilaritySpec extends SparkTestBase {
  import spark.implicits._

  private val vecs = Seq(
    (0L, Array(1.0f, 2.0f, 3.0f), 0),
    (1L, Array(1.0f, 2.0f, 3.1f), 0),
    (2L, Array(-1.0f, 0.5f, 0.25f), 1),
    (3L, Array(0.1f, -0.2f, 0.9f), 1),
    (4L, Array(3.0f, -2.0f, 1.0f), 0)
  ).toDF("vec_id", "embedding", "label")

  test("native dot/norm expressions are bit-identical to the HOF folds") {
    val pairs = vecs.select($"vec_id".as("v1"), $"embedding".as("e1"))
      .crossJoin(vecs.select($"vec_id".as("v2"), $"embedding".as("e2")))
    val diff = pairs.select(
      VectorExpr.dotF($"e1", $"e2").as("fast"),
      Similarity.dot($"e1", $"e2").as("hof"),
      VectorExpr.normF($"e1").as("fastn"),
      Similarity.norm($"e1").as("hofn"))
      .filter($"fast" =!= $"hof" || $"fastn" =!= $"hofn")
    assert(diff.count() == 0)
  }

  test("dotL and adcScore kernels are value-identical to their HOF folds") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(11)
    val codes = (0L until 40L).map(i =>
      (i, Array.fill(16)(rnd.nextInt(255).toLong - 127),
        Array.fill(16)(rnd.nextInt(8))))
      .toDF("id", "lcodes", "icodes")
    // integer dot: native kernel vs aggregate/zip_with fold
    val pairs = codes.select($"id".as("i1"), $"lcodes".as("a"))
      .crossJoin(codes.select($"id".as("i2"), $"lcodes".as("b")))
    val dotDiff = pairs.select(
      VectorExpr.dotL($"a", $"b").as("fast"),
      Similarity.dotQHof($"a", $"b").as("hof"))
      .filter($"fast" =!= $"hof")
    assert(dotDiff.count() == 0)
    // ADC: native kernel vs the element_at fold it replaced (same
    // index-order double sum — must be bit-identical, not just close)
    val lut = typedLit(Seq.tabulate(16, 8)((j, c) => (j * 31 + c * 7).toDouble))
    val adcDiff = codes.select(
      VectorExpr.adcScoreF(lut, $"icodes").as("fast"),
      aggregate(zip_with(lut, $"icodes", (jarr, c) => element_at(jarr, c + 1)),
        lit(0.0), (acc, x) => acc + x).as("hof"))
      .filter($"fast" =!= $"hof")
    assert(adcDiff.count() == 0)
  }

  test("nearestCentroidL ≡ brute-force integer argmin incl. tie and second-best semantics") {
    import org.apache.spark.sql.functions._
    val rnd = new scala.util.Random(7)
    val dim = 5
    val cents: Array[Array[Long]] =
      Array.fill(4)(Array.fill(dim)(rnd.nextInt(2001) - 1000L))
    // include a vector EQUAL to a centroid (dist 0) and two duplicate
    // centroids' midpoint (forced tie → lower cid must win)
    val rows = (Seq.fill(40)(Array.fill(dim)(rnd.nextInt(2001) - 1000L)) :+
      cents(2).clone()).zipWithIndex.map { case (v, i) => (i.toLong, v) }
    val df = rows.toDF("id", "xf")
    val nc = VectorExpr.nearestCentroidL(col("xf"), cents)
    val got = df.select($"id", element_at(nc, 1).as("cid"),
        element_at(nc, 2).as("d1"), element_at(nc, 3).as("d2"))
      .collect().map(r => (r.getLong(0), (r.getLong(1), r.getLong(2), r.getLong(3)))).toMap
    rows.foreach { case (id, v) =>
      val ds = cents.map(c => c.zip(v).map { case (a, b) =>
        val t = a - b; t * t }.sum)
      val bestCid = ds.zipWithIndex.minBy { case (d, i) => (d, i) }._2
      val sortedD = ds.sorted
      assert(got(id) == ((bestCid.toLong, sortedD(0), sortedD(1))),
        s"vector $id: got ${got(id)}, want (${bestCid}, ${sortedD(0)}, ${sortedD(1)})")
    }
  }

  test("cosine of a vector with itself is 1") {
    val got = vecs.select(Similarity.cosine($"embedding", $"embedding")).collect()
    assert(got.forall(_.getDouble(0) == 1.0))
  }

  test("bruteForceTopK: k neighbors per query, self excluded, rank ordered") {
    val got = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
      col("vec_id") === 0, 3).collect()
    assert(got.length == 3)
    assert(got.forall(_.getLong(0) == 0L))
    assert(got.forall(_.getLong(2) != 0L))                 // no self-match
    val sims = got.sortBy(_.getInt(1)).map(_.getDouble(3))
    assert(sims.sameElements(sims.sorted.reverse))         // rank follows cos
    assert(got.sortBy(_.getInt(1)).head.getLong(2) == 1L)  // nearest is the near-dup
  }

  test("filteredTopK: predicate pre-filters, differs from post-filtering") {
    // corpus restricted to label==0 (ids 0,1,4); query 0 → neighbors 1,4
    val got = Similarity.filteredTopK(vecs, "vec_id", "embedding",
        col("vec_id") === 0, col("label") === 0, 3)
      .orderBy("rank").collect()
    assert(got.map(_.getLong(2)).toSeq == Seq(1L, 4L),
      "every neighbor must satisfy the corpus predicate; k under-fills honestly")
    // post-filtering the UNfiltered top-2 instead would keep only vec 1:
    // vec 3 (label 1) outranks vec 4, then dies to the filter — the
    // under-filled, recall-shifted list pre-filtering exists to avoid
    val post = Similarity.bruteForceTopK(vecs, "vec_id", "embedding",
        col("vec_id") === 0, 2).join(vecs.filter(col("label") === 0)
        .select(col("vec_id").as("neighbor_id")), Seq("neighbor_id"))
    assert(post.count() == 1)
  }

  test("a zero-norm vector never matches, never ranks, never drops a survivor") {
    // 0/0 cosine is NaN, and Spark sorts NaN ABOVE every real number —
    // unguarded, a failed-embed all-zero vector passes >= threshold
    // filters and steals rank 1 of every top-k
    val withZero = vecs.union(Seq((9L, Array(0.0f, 0.0f, 0.0f), 0))
      .toDF("vec_id", "embedding", "label"))
    val pairs = Similarity.nearDupPairs(withZero, "vec_id", "embedding", 0.5)
      .collect()
    assert(!pairs.exists(r => r.getLong(0) == 9L || r.getLong(1) == 9L),
      "zero vector must emit no near-dup pair")
    val topk = Similarity.bruteForceTopK(withZero, "vec_id", "embedding",
      col("vec_id") === 0, 5).orderBy("rank").collect()
    assert(topk.head.getLong(2) == 1L, "rank 1 must stay the true near-dup")
    assert(!topk.take(4).exists(_.getLong(2) == 9L),
      "zero vector must not outrank any real neighbor")
    val surv = Similarity.semDedupSurvivors(withZero, "vec_id", "embedding",
      "label", 0.5).select("vec_id").as[Long].collect().toSet
    assert(surv.contains(9L) && !surv.contains(1L),
      "zero vector drops nobody; the real near-dup still dedups")
  }

  test("pqTopKReranked accepts a metadata-column query predicate") {
    val got = Similarity.pqTopKReranked(vecs, "vec_id", "embedding",
      col("label") === 1 && col("vec_id") === 2, m = 3, kSub = 2,
      iters = 2, topK = 2, shortlist = 4).collect()
    assert(got.nonEmpty && got.forall(_.getLong(0) == 2L))
  }

  test("SRP plane sizing that would yield zero tables fails loudly") {
    val planes = Similarity.srpPlanes(8, 3)
    intercept[IllegalArgumentException] {
      Similarity.srpNearDupPairs(vecs, "vec_id", "embedding", planes,
        planesPerTable = 16, threshold = 0.8)
    }
    intercept[IllegalArgumentException] {
      Similarity.knnGraph(vecs, "vec_id", "embedding", planes,
        planesPerTable = 3, k = 2) // 8 % 3 != 0: trailing planes dropped
    }
  }

  test("ivfTopK only probes the query's bucket") {
    val got = Similarity.ivfTopK(vecs, "vec_id", "embedding", "label",
      col("vec_id") === 0, 3).collect()
    // bucket 0 = {0,1,4}: only 1 and 4 can be neighbors
    assert(got.map(_.getLong(2)).toSet == Set(1L, 4L))
  }

  test("multi-probe IVF: recall grows with nprobe; full probe = brute force") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    // any fixed centroid table works for the recall contract; use the
    // k-means seed rows (deterministic, spread by construction)
    val centroids = emb.orderBy($"vec_id").limit(8).select($"embedding")
      .collect().map(_.getSeq[Float](0).map(_.toDouble).toArray)
    val pred = col("vec_id") % 40 === 0
    def hits(df: org.apache.spark.sql.DataFrame) =
      df.select($"query_id", $"neighbor_id").as[(Long, Long)].collect().toSet
    val exact = hits(Similarity.bruteForceTopK(emb, "vec_id", "embedding", pred, 10))
    def recall(nprobe: Int): Double = {
      val got = hits(Similarity.ivfTopKProbes(emb, "vec_id", "embedding",
        centroids, nprobe, pred, 10))
      got.intersect(exact).size.toDouble / exact.size
    }
    val r1 = recall(1)
    val r4 = recall(4)
    val rAll = recall(8)
    assert(r1 <= r4 + 1e-9 && r4 <= rAll + 1e-9,
      s"recall must not decrease with nprobe: $r1, $r4, $rAll")
    assert(rAll == 1.0, s"full probe must equal brute force, recall $rAll")
    assert(r4 > 0.3, s"nprobe=4 of 8 cells should recover real recall, got $r4")
  }

  test("nearestCentroidsF returns distance-ordered cells; head = nearestCentroidF") {
    val cents = Array(Array(1.0, 2.0, 3.0), Array(0.0, 0.0, 0.0),
      Array(-1.0, 0.5, 0.25), Array(3.0, -2.0, 1.0))
    val rows = vecs.select($"vec_id",
      VectorExpr.nearestCentroidF($"embedding", cents).as("one"),
      VectorExpr.nearestCentroidsF($"embedding", cents, 3).as("many")).collect()
    rows.foreach { r =>
      val many = r.getSeq[Int](2)
      assert(many.length == 3 && many.head == r.getInt(1))
      assert(many.distinct.length == many.length)
    }
    // full-width probe enumerates every cell exactly once
    val full = vecs.select(
      VectorExpr.nearestCentroidsF($"embedding", cents, 4).as("all")).collect()
    full.foreach(r => assert(r.getSeq[Int](0).sorted == Seq(0, 1, 2, 3)))
  }

  test("SRP-LSH pairs are a subset of brute-force pairs with usable recall") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val planes = graft.queries.CorpusQueries.srpPlanesConst
    val lsh = Similarity.srpNearDupPairs(emb, "vec_id", "embedding", planes, 4, 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val brute = Similarity.nearDupPairs(emb, "vec_id", "embedding", 0.4)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(lsh.subsetOf(brute), "LSH must never invent pairs (exact verify step)")
    assert(lsh.size.toDouble / brute.size > 0.3,
      s"recall too low: ${lsh.size}/${brute.size}")
  }

  test("knnGraph ≡ the window-rank form over the same SRP candidates") {
    import org.apache.spark.sql.expressions.Window
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val planes = graft.queries.CorpusQueries.srpPlanesConst
    val k = 3
    val got = Similarity.knnGraph(emb, "vec_id", "embedding", planes, 4, k)
      .collect().map(r => (r.getLong(0), r.getInt(1), r.getLong(2), r.getDouble(3)))
      .toSet
    // independent reference: same buckets, but ranked through the plain
    // row_number window the native TopKPerKey operator replaces
    val withB = (0 until planes.length / 4).map { t =>
      emb.select($"vec_id", lit(t).as("t"),
        Similarity.srpBucket($"embedding", planes.slice(t * 4, (t + 1) * 4))
          .as("bucket"))
    }.reduce(_ unionAll _)
    val cand = withB.as("a")
      .join(withB.withColumnRenamed("vec_id", "v2").as("b"), Seq("t", "bucket"))
      .filter($"vec_id" < $"v2").select($"vec_id".as("v1"), $"v2").distinct()
    val e = emb.select($"vec_id", $"embedding")
    val scored = cand
      .join(e.select($"vec_id".as("v1"), $"embedding".as("e1")), "v1")
      .join(e.select($"vec_id".as("v2"), $"embedding".as("e2")), "v2")
      .select($"v1", $"v2", Similarity.cosine($"e1", $"e2").as("cos_sim"))
    val directed = scored.select($"v1".as("vec_id"), $"v2".as("neighbor_id"), $"cos_sim")
      .unionAll(scored.select($"v2", $"v1", $"cos_sim"))
    val w = Window.partitionBy($"vec_id").orderBy($"cos_sim".desc, $"neighbor_id")
    val ref = directed.withColumn("rank", row_number().over(w))
      .filter($"rank" <= k)
      .collect().map(r => (r.getLong(0), r.getInt(3), r.getLong(1), r.getDouble(2)))
      .toSet
    assert(got == ref)
    // ranks contiguous from 1 per node
    got.groupBy(_._1).foreach { case (_, rows) =>
      assert(rows.map(_._2).toSeq.sorted == (1 to rows.size).toSeq)
    }
  }

  test("native srpBucket kernel ≡ the interpreted HOF fold on every fixture vector") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val planes = graft.queries.CorpusQueries.srpPlanesConst
    for (t <- 0 until planes.length / 4) {
      val sub = planes.slice(t * 4, (t + 1) * 4)
      val diff = emb.select(
        Similarity.srpBucket($"embedding", sub).as("native"),
        Similarity.srpBucketHof($"embedding", sub).as("hof"))
        .filter($"native" =!= $"hof").count()
      assert(diff == 0, s"table $t: native and HOF buckets diverged on $diff vectors")
    }
  }

  test("srpPlanes are deterministic and bounded") {
    val a = Similarity.srpPlanes(16, 64)
    val b = Similarity.srpPlanes(16, 64)
    assert(a.flatten.toSeq == b.flatten.toSeq)
    assert(a.flatten.forall(v => v >= -1.0 && v < 1.0))
  }

  test("nearDupPairs finds the planted near-identical pair") {
    val got = Similarity.nearDupPairs(vecs, "vec_id", "embedding", 0.99).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((0L, 1L)))
  }

  test("sq8 codes bounded to [-127,127]; quantized top-k tracks exact top-k") {
    val emb = spark.read.parquet(sf("sf0.01") + "/embeddings.parquet")
    val codes = Similarity.sq8Codes(emb, "vec_id", "embedding")
      .select(org.apache.spark.sql.functions.explode(
        org.apache.spark.sql.functions.col("codes")).as("c"))
      .agg(org.apache.spark.sql.functions.min("c"),
        org.apache.spark.sql.functions.max("c")).head()
    assert(codes.getLong(0) >= -127 && codes.getLong(1) <= 127)
    val pred = org.apache.spark.sql.functions.col("vec_id") % 200 === 0
    val exact = Similarity.bruteForceTopK(emb, "vec_id", "embedding", pred, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val quant = Similarity.sq8TopK(emb, "vec_id", "embedding", pred, 10)
      .collect().map(r => (r.getLong(0), r.getLong(2))).toSet
    val overlap = (exact intersect quant).size.toDouble / exact.size
    assert(overlap > 0.7, s"sq8 recall@10 too low: $overlap")
  }

  test("semDedupSurvivors: min-id survivor per within-cluster near-dup group") {
    // vecs 0 and 1 share label 0 at cos > 0.99 -> 1 is dropped (lower id
    // survives); everything else is below any reasonable threshold
    val kept = Similarity.semDedupSurvivors(vecs, "vec_id", "embedding",
        "label", threshold = 0.95)
      .select($"vec_id").as[Long].collect().toSet
    assert(kept == Set(0L, 2L, 3L, 4L))
    // the survivor rule matches the brute-force definition: drop x iff
    // some lower-id same-label y has cos(x, y) >= t
    val all = vecs.as[(Long, Array[Float], Int)].collect()
    def cos(a: Array[Float], b: Array[Float]): Double = {
      val dot = a.zip(b).map { case (x, y) => x.toDouble * y.toDouble }.sum
      dot / (math.sqrt(a.map(x => x.toDouble * x).sum) *
        math.sqrt(b.map(x => x.toDouble * x).sum))
    }
    for (t <- Seq(0.5, 0.95, 0.999)) {
      val expect = all.filter { case (id, v, l) =>
        !all.exists { case (id2, v2, l2) =>
          l2 == l && id2 < id && math.round(cos(v2, v) * 1e6) / 1e6 >= t }
      }.map(_._1).toSet
      val got = Similarity.semDedupSurvivors(vecs, "vec_id", "embedding",
          "label", t)
        .select($"vec_id").as[Long].collect().toSet
      assert(got == expect, s"t=$t")
    }
  }

  test("PQ: codes compress to m in-range ids; ADC recall floors; re-rank recovers") {
    val real = spark.read.parquet(sf("sf0.01") + "/embeddings.parquet")
    val (m, kSub, iters) = (32, 16, 3)
    val cb = Similarity.pqCodebooks(real, "vec_id", "embedding", m, kSub, iters)
    assert(cb.length == m && cb.forall(_.length == kSub))
    val codes = Similarity.pqCodes(real, "vec_id", "embedding", cb).collect()
    assert(codes.forall(_.getSeq[Int](1).size == m))
    assert(codes.forall(_.getSeq[Int](1).forall(c => c >= 0 && c < kSub)))

    val qPred = col("vec_id") % 10 === 0
    def topSet(df: org.apache.spark.sql.DataFrame): Map[Long, Set[Long]] =
      df.select("query_id", "neighbor_id").collect()
        .groupBy(_.getLong(0)).view.mapValues(_.map(_.getLong(1)).toSet).toMap
    val exact = topSet(Similarity.bruteForceTopK(real, "vec_id", "embedding", qPred, 5))
    def recall(got: Map[Long, Set[Long]]): Double =
      exact.keys.toSeq.map(q => (got.getOrElse(q, Set.empty) & exact(q)).size.toDouble / 5)
        .sum / exact.size

    // plain ADC over 32-byte codes (8x compression of the 64-dim floats):
    // the fixture's near-random embeddings are PQ's worst case — measured
    // 0.62, floor with margin
    val adc = topSet(Similarity.pqTopK(real, "vec_id", "embedding", qPred,
      m, kSub, iters, 5))
    assert(recall(adc) >= 0.45, s"ADC recall@5 ${recall(adc)}")

    // exact re-rank over a 25-candidate shortlist: measured 0.97
    val rr = topSet(Similarity.pqTopKReranked(real, "vec_id", "embedding", qPred,
      m, kSub, iters, 5, 25))
    assert(recall(rr) >= 0.85, s"re-ranked recall@5 ${recall(rr)}")
    assert(recall(rr) >= recall(adc), "re-ranking must never lose recall")

    // deterministic end to end (seeded init, fixed iteration count)
    val again = topSet(Similarity.pqTopK(real, "vec_id", "embedding", qPred,
      m, kSub, iters, 5))
    assert(again == adc)
  }

  test("pqCodebooks: source scanned once total; Lloyd rounds read the cache; trainPred bounds training") {
    val real = spark.read.parquet(sf("sf0.01") + "/embeddings.parquet")
    val captured =
      scala.collection.mutable.ArrayBuffer.empty[Seq[String]]
    val listener = new org.apache.spark.sql.util.QueryExecutionListener {
      override def onSuccess(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          durationNs: Long): Unit =
        captured.synchronized {
          captured += flattenPlan(qe.executedPlan)
            .map(_.getClass.getSimpleName); ()
        }
      override def onFailure(funcName: String,
          qe: org.apache.spark.sql.execution.QueryExecution,
          exception: Exception): Unit = ()
    }
    spark.listenerManager.register(listener)
    val (m, kSub, iters) = (16, 8, 3)
    val books =
      try {
        val b = Similarity.pqCodebooks(real, "vec_id", "embedding", m, kSub, iters)
        org.apache.spark.sql.graft.bridge.drainListenerBus(spark)
        b
      } finally spark.listenerManager.unregister(listener)
    assert(books.length == m)
    // iters+1 actions run (seeds/persist materialization + iters round
    // aggregates — the r16 trainer derives dim from the seed rows, so
    // the old separate dim probe is gone). The parquet source may
    // appear in the materialization ONLY — a file scan inside a Lloyd
    // round is the r14 ann_topk_pq regression (iters × full re-read to
    // train a few-KB model). Cached rounds read InMemoryTableScan.
    val plans = captured.synchronized(captured.toSeq)
    val withFileScan = plans.filter(_.exists(_.contains("FileSourceScan")))
    assert(withFileScan.size <= 1,
      s"Lloyd loop re-scanned the source: ${withFileScan.size} of " +
        s"${plans.size} actions hit a file scan")
    assert(plans.exists(_.exists(_.contains("InMemoryTableScan"))),
      "training rounds should read the persisted training frame")

    // trainPred trains on exactly the sampled slice: identical books to
    // pre-filtering the input frame
    val pred = pmod(col("vec_id"), lit(3)) === 0
    val viaPred = Similarity.pqCodebooks(real, "vec_id", "embedding",
      m, kSub, iters, trainPred = pred)
    val viaFilter = Similarity.pqCodebooks(real.filter(pred), "vec_id",
      "embedding", m, kSub, iters)
    assert(viaPred.map(_.map(_.toSeq).toSeq).toSeq ==
      viaFilter.map(_.map(_.toSeq).toSeq).toSeq)
  }

  test("queryRows pre-materialization is row-identical to the predicate path on every leg") {
    // the r22 shared-query-pin contract: passing emb.filter(pred) rows
    // (here via an eager localCheckpoint, as ann_recall_report would)
    // must change NOTHING about any leg's output
    val rnd = new scala.util.Random(13)
    val real = (0L until 60L).map(i =>
      (i, Array.fill(8)(rnd.nextFloat() * 2f - 1f), (i % 3).toInt))
      .toDF("vec_id", "embedding", "label")
    val pred = pmod(col("vec_id"), lit(5)) === 0
    val qrows = Some(real.filter(pred).localCheckpoint(true))
    def rows(df: org.apache.spark.sql.DataFrame): Seq[String] =
      df.collect().map(_.toString).sorted.toSeq
    val k = 3
    assert(rows(Similarity.bruteForceTopK(real, "vec_id", "embedding", pred, k)) ==
      rows(Similarity.bruteForceTopK(real, "vec_id", "embedding", pred, k, qrows)))
    assert(rows(Similarity.ivfTopK(real, "vec_id", "embedding", "label", pred, k)) ==
      rows(Similarity.ivfTopK(real, "vec_id", "embedding", "label", pred, k, qrows)))
    val cents = Array(Array.fill(8)(0.5), Array.fill(8)(-0.5))
    assert(rows(Similarity.ivfTopKProbes(real, "vec_id", "embedding", cents, 2, pred, k)) ==
      rows(Similarity.ivfTopKProbes(real, "vec_id", "embedding", cents, 2, pred, k, qrows)))
    assert(rows(Similarity.sq8TopK(real, "vec_id", "embedding", pred, k)) ==
      rows(Similarity.sq8TopK(real, "vec_id", "embedding", pred, k, qrows)))
    assert(rows(Similarity.pqTopKReranked(real, "vec_id", "embedding", pred,
        m = 4, kSub = 4, iters = 1, topK = k, shortlist = 6)) ==
      rows(Similarity.pqTopKReranked(real, "vec_id", "embedding", pred,
        m = 4, kSub = 4, iters = 1, topK = k, shortlist = 6, queryRows = qrows)))
  }
}
