package graft

import graft.corpus.{Dedup, Similarity, TextAnalysis => T}
import org.apache.spark.sql.functions._
import scala.util.Random

/** Property-style coverage (SURVEY.md §5.2) for the corpus operators over
  * seeded random corpora — driven through real DataFrame evaluation.
  * (The scalatest↔scalacheck bridge isn't in the offline dependency
  * cache, so generation is a seeded Random instead of Gen.) */
class CorpusPropertySpec extends SparkTestBase {
  import spark.implicits._

  private val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta")
  private def randomTexts(seed: Int, n: Int): Seq[String] = {
    val rnd = new Random(seed)
    Seq.fill(n)(Seq.fill(rnd.nextInt(13))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
  }

  test("hash60 is always within [0, 2^60) (property over 200 random texts)") {
    val vals = randomTexts(1, 200).toDF("t")
      .select(T.hash60(col("t"))).collect().map(_.getLong(0))
    assert(vals.forall(v => v >= 0L && v < (1L << 60)))
  }

  test("shingle count is max(0, windows), never above n-k+1 (property)") {
    val rows = randomTexts(2, 200).toDF("t")
      .select(size(T.tokens(col("t"))).as("n"), size(T.shingles(col("t"), 3)).as("s"))
      .collect()
    rows.foreach { r =>
      val (n, s) = (r.getInt(0), r.getInt(1))
      if (n < 3) assert(s == 0) else assert(s >= 1 && s <= n - 2)
    }
  }

  test("rolling fingerprint stays within the modulus (property)") {
    val vals = randomTexts(3, 200).toDF("t")
      .select(T.rollingFingerprint(col("t"))).collect().map(_.getLong(0))
    assert(vals.forall(v => v >= 0L && v < 1000000007L))
  }

  test("jaccard pairs are canonical (d1<d2) with scores in (0,1] (property)") {
    val df = randomTexts(4, 30).zipWithIndex
      .map { case (t, i) => (i.toLong, t) }.toDF("doc_id", "text")
    val rows = Dedup.jaccardPairs(df, "doc_id", "text", 2, 0.1).collect()
    assert(rows.nonEmpty)
    rows.foreach { r =>
      assert(r.getLong(0) < r.getLong(1))
      assert(r.getDouble(3) > 0.0 && r.getDouble(3) <= 1.0)
    }
  }

  test("native kgrams kernel ≡ builtin-HOF twin (property + adversarial)") {
    // random corpus plus the whitespace edge cases Java split makes
    // interesting: leading tab (empty first token), trailing tab (empty
    // last token), all-blank, single token, exact-k tokens
    val adversarial = Seq("", "   ", "\ta b c", "a b c\t", "a  b\n c",
      "one", "a b", "x y z")
    val texts = randomTexts(11, 150) ++ adversarial
    for (k <- Seq(1, 2, 3)) {
      val df = texts.toDF("t").select(
        T.kgrams(col("t"), k).as("native"),
        T.kgramsHof(col("t"), k).as("hof"),
        T.shingles(col("t"), k).as("nativeDistinct"),
        array_distinct(T.kgramsHof(col("t"), k)).as("hofDistinct"))
      df.collect().foreach { r =>
        assert(r.getSeq[String](0) == r.getSeq[String](1), s"k=$k non-distinct")
        assert(r.getSeq[String](2) == r.getSeq[String](3), s"k=$k distinct")
      }
    }
  }

  test("repeated-span stats match a brute-force recount (property)") {
    // random small-vocab corpus → dense span collisions; recompute
    // n_windows/n_repeated per doc with plain Scala and compare
    val texts = randomTexts(7, 40)
    val df = texts.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("doc_id", "text")
    val w = 2
    def windows(t: String): Seq[String] = {
      val ws = t.trim.split("\\s+").filter(_.nonEmpty)
      if (t.trim.isEmpty || ws.length < w) Seq.empty
      else ws.sliding(w).map(_.mkString(" ")).toSeq
    }
    val all = texts.zipWithIndex.flatMap { case (t, i) =>
      windows(t).map(s => (i.toLong, s))
    }
    val occ = all.groupBy(_._2).map { case (s, xs) => s -> xs.size }
    val expect = all.groupBy(_._1).map { case (id, xs) =>
      id -> (xs.size.toLong, xs.count(x => occ(x._2) >= 2).toLong)
    }
    val got = Dedup.repeatedSpanStats(df, "doc_id", "text", w).collect()
      .map(r => r.getLong(0) -> (r.getLong(1), r.getLong(2))).toMap
    assert(got == expect)
  }

  test("snapshotDiff: all four statuses, keys never lost") {
    val prev = Seq((1L, "a"), (2L, "b"), (3L, "c")).toDF("doc_id", "text")
    val curr = Seq((2L, "b"), (3L, "c2"), (4L, "d")).toDF("doc_id", "text")
    val got = Dedup.snapshotDiff(prev, curr, "doc_id", "text")
      .collect().map(r => r.getLong(0) -> r.getString(1)).toMap
    assert(got == Map(1L -> "removed", 2L -> "unchanged",
      3L -> "changed", 4L -> "added"))
  }

  test("df cap: a planted ubiquitous shingle stops inflating candidates (property)") {
    // 60 docs, each with a UNIQUE 3-token body plus one shared boilerplate
    // trigram planted in all of them. Uncapped, the boilerplate shingle's
    // posting list self-joins into 60*59/2 = 1770 candidate pairs; with
    // maxDf below 60 those postings drop and no pair shares a shingle.
    val docs = (0 until 60).map { i =>
      (i.toLong, s"uniq${i}a uniq${i}b uniq${i}c BOILER PLATE TEXT")
    }.toDF("doc_id", "text")
    val uncapped = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.0,
      maxDf = Int.MaxValue).count()
    assert(uncapped == 60L * 59 / 2) // quadratic: every pair is a candidate
    val capped = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.0, maxDf = 50)
    assert(capped.count() == 0L)
    // and the cap leaves sub-threshold-df shingles untouched: genuine dups
    // (identical text) still pair up at full jaccard
    val withDup = docs.union(Seq((100L, "uniq0a uniq0b uniq0c BOILER PLATE TEXT"))
      .toDF("doc_id", "text"))
    val pairs = Dedup.jaccardPairs(withDup, "doc_id", "text", 3, 0.5, maxDf = 50)
      .collect()
    assert(pairs.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((0L, 100L)))
  }

  test("prefix-filtered and plain pair plans agree exactly (property)") {
    // random corpus with planted near-dups: doc i and doc i+100 share a
    // long common run for i < 15, so real pairs exist at the threshold
    val rnd = new Random(11)
    val texts = (0 until 100).map { i =>
      Seq.fill(12 + rnd.nextInt(8))(vocab(rnd.nextInt(vocab.size))).mkString(" ")
    }
    val docs = (texts.zipWithIndex.map { case (t, i) => (i.toLong, t) } ++
      texts.take(15).zipWithIndex.map { case (t, i) =>
        ((i + 100).toLong, t + " " + vocab(i % vocab.size))
      }).toDF("doc_id", "text")
    def canon(df: org.apache.spark.sql.DataFrame) =
      df.collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2),
        r.getDouble(3))).sortBy(x => (x._1, x._2)).toSeq
    // gate=0 forces the prefix path; default takes the plain join here
    val jPlain = canon(Dedup.jaccardPairs(docs, "doc_id", "text", 2, 0.5))
    val jPrefix = canon(Dedup.jaccardPairs(docs, "doc_id", "text", 2, 0.5,
      prefixGate = 0))
    assert(jPlain.nonEmpty, "planted near-dups must produce pairs")
    assert(jPlain == jPrefix)
    val cPlain = canon(Dedup.containmentPairs(docs, "doc_id", "text", 2, 0.8))
    val cPrefix = canon(Dedup.containmentPairs(docs, "doc_id", "text", 2, 0.8,
      prefixGate = 0))
    assert(cPlain.nonEmpty)
    assert(cPlain == cPrefix)
  }

  test("dupClusters: canonical id is the component minimum, chains included") {
    val pairs = Seq((1L, 2L), (2L, 3L), (10L, 11L), (20L, 21L), (21L, 22L), (22L, 23L))
      .toDF("d1", "d2")
    val expected = Map(1L -> 1L, 2L -> 1L, 3L -> 1L, 10L -> 10L, 11L -> 10L,
      20L -> 20L, 21L -> 20L, 22L -> 20L, 23L -> 20L)
    // both execution paths must agree: driver-side union-find (default
    // gate) and the distributed pointer-doubling loop (gate forced shut)
    val viaUnionFind = Dedup.dupClusters(pairs, iterations = 8).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val viaLoop = Dedup.dupClusters(pairs, iterations = 8, driverGateEdges = -1)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(viaUnionFind == expected)
    assert(viaLoop == expected)
  }

  test("transitivity census matches brute-force enumeration (property)") {
    val rnd = new Random(13)
    for (trial <- 1 to 3) {
      val edges = Seq.fill(60 + trial * 40)(
          (rnd.nextInt(30).toLong, rnd.nextInt(30).toLong))
        .filter { case (a, b) => a != b }
        .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
        .distinct
      val row = Dedup.transitivityCensus(edges.toDF("d1", "d2")).head()
      val es = edges.toSet
      def connected(a: Long, b: Long) =
        es((math.min(a, b), math.max(a, b)))
      val nodes = edges.flatMap(e => Seq(e._1, e._2)).distinct.sorted
      val wedges = nodes.map { v =>
        val d = edges.count(e => e._1 == v || e._2 == v).toLong
        d * (d - 1) / 2
      }.sum
      val triangles = (for {
        i <- nodes.indices; j <- (i + 1) until nodes.size
        k <- (j + 1) until nodes.size
        if connected(nodes(i), nodes(j)) && connected(nodes(j), nodes(k)) &&
          connected(nodes(i), nodes(k))
      } yield 1).size.toLong
      assert(row.getLong(0) === edges.size.toLong)
      assert(row.getLong(1) === wedges, s"wedges trial $trial")
      assert(row.getLong(2) === triangles, s"triangles trial $trial")
    }
  }

  test("dupClusters paths agree on a random pair graph (property)") {
    val rnd = new Random(7)
    // 300 random edges over 120 nodes: many multi-edge components,
    // chains, and isolated pairs
    val pairs = Seq.fill(300)((rnd.nextInt(120).toLong, rnd.nextInt(120).toLong))
      .filter { case (a, b) => a != b }
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toDF("d1", "d2")
    val uf = Dedup.dupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val loop = Dedup.dupClusters(pairs, driverGateEdges = -1).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(uf == loop)
    // canonical is a member of its own cluster and minimal within it
    uf.groupBy(_._2).foreach { case (canon, members) =>
      assert(members.keySet.min == canon)
    }
  }

  test("dupClusters distributed regime: planted long chain collapses in ~log(diameter) rounds") {
    // a path graph 1-2-...-256 (diameter 255), gate forced shut so the
    // DISTRIBUTED large-star/small-star path runs: plain min-propagation
    // needs ~diameter (255) full-edge rounds; star alternation contracts
    // the chain toward a star in O(log diameter). The round budget here
    // (12 ≈ 1.5·log2(255)) is the asymptotic claim — a linear-round
    // implementation cannot pass it.
    val n = 256L
    val pairs = (1L until n).map(i => (i, i + 1)).toDF("d1", "d2")
    val (labels, rounds) =
      Dedup.dupClustersWithRounds(pairs, iterations = 50, driverGateEdges = -1)
    val got = labels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(got.size == n && got.values.forall(_ == 1L),
      s"chain did not collapse to its minimum: ${got.filter(_._2 != 1L).take(5)}")
    assert(rounds > 0 && rounds <= 12,
      s"expected ~log2(diameter) star rounds for a 255-diameter chain, got $rounds")
  }

  test("dupClusters distributed regime: adversarial topologies match union-find") {
    // shapes that historically break star/contraction implementations:
    // two dense cliques bridged by a long chain (contraction must cross
    // the bridge), a star whose hub is the LARGEST id (hooking must
    // still find the component min), and a bigger random graph
    val clique1 = for (a <- 1L to 12L; b <- (a + 1) to 12L) yield (a, b)
    val clique2 = for (a <- 500L to 512L; b <- (a + 1) to 512L) yield (a, b)
    val bridge = (12L until 80L).map(i => (i, i + 1)) :+ (80L, 500L)
    val bigHub = (600L until 640L).map(i => (i, 999L))
    val rnd = new Random(21)
    val random = Seq.fill(2000)((rnd.nextInt(800).toLong + 2000L,
      rnd.nextInt(800).toLong + 2000L)).filter { case (a, b) => a != b }
    val pairs = (clique1 ++ clique2 ++ bridge ++ bigHub ++ random)
      .map { case (a, b) => (math.min(a, b), math.max(a, b)) }
      .toDF("d1", "d2")
    val uf = Dedup.dupClusters(pairs).collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val (starLabels, rounds) =
      Dedup.dupClustersWithRounds(pairs, iterations = 50, driverGateEdges = -1)
    val star = starLabels.collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(star == uf)
    // bridged cliques collapse to ONE component rooted at the global min
    assert(star(512L) == 1L && star(80L) == 1L)
    assert(star(999L) == 600L, "hub-as-max star must root at the min leaf")
    assert(rounds <= 15, s"star alternation took $rounds rounds")
  }

  test("dupClusters on an empty pair set returns empty (clean corpus)") {
    val pairs = Seq.empty[(Long, Long)].toDF("d1", "d2")
    assert(Dedup.dupClusters(pairs).count() == 0)
  }

  test("lshBands rejects non-divisible band configuration") {
    val sig = Seq((1L, 1L)).toDF("doc_id", "mh0")
    intercept[IllegalArgumentException](Dedup.lshBands(sig, 13, 3))
  }

  test("KMV Aggregator (UDAF) equals the windowed-SQL sketch form") {
    import graft.corpus.Sketches
    val ev = graft.xel.XeFixture.events(spark, sf("sf0.001"))
      .select($"event_type", T.hash60($"user_id".cast("string")).as("h"))
      .distinct()
    val viaAgg = ev.groupBy($"event_type")
      .agg(Sketches.kmvDistinct(64, $"h").as("est"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    val viaWindow = SparkEntry.queries("sketch_kmv_distinct")(spark, sf("sf0.001"))
      .collect().map(r => r.getString(0) -> r.getAs[Double]("kmv_estimate")).toMap
    assert(viaAgg == viaWindow, s"$viaAgg vs $viaWindow")
    // estimates land within 30% of exact on this cardinality range
    val exact = ev.groupBy($"event_type").count()
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    viaAgg.foreach { case (t, est) =>
      assert(math.abs(est - exact(t)) / exact(t).toDouble < 0.3,
        s"$t: est $est vs exact ${exact(t)}")
    }
  }

  test("kmeansAssign feeds ivfTopK: valid clusters, ANN contract holds") {
    val emb = spark.read.parquet(sf("sf0.001") + "/embeddings.parquet")
    val assigned = Similarity.kmeansAssign(emb, "vec_id", "embedding", k = 8, iters = 3)
    assert(assigned.count() == emb.count())
    val clusters = assigned.select("cluster").distinct().collect().map(_.getInt(0))
    assert(clusters.length > 1 && clusters.forall(c => c >= 0 && c < 8))
    val withBuckets = emb.join(assigned, "vec_id")
    val topk = Similarity.ivfTopK(withBuckets, "vec_id", "embedding", "cluster",
      col("vec_id") % 200 === 0, 5)
    assert(topk.groupBy("query_id").count().collect().forall(_.getLong(1) <= 5))
  }
}
