package graft

import graft.corpus.{Dedup, Search, TextAnalysis => T}
import graft.operators.Sessions
import org.apache.spark.sql.functions._

/** Zero-row inputs through the operator surface: a 100 TB pipeline always
  * has some empty partition/source/day — operators must return empty
  * frames, not NPE on a missing head() or divide into NaN rows. */
class EmptyInputSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val noDocs =
    Seq.empty[(Long, String, String)].toDF("doc_id", "text", "source")
  private lazy val noEvents =
    Seq.empty[(Long, java.sql.Timestamp, Long)].toDF("user_id", "t", "event_id")

  test("dedup family returns empty on an empty corpus") {
    assert(Dedup.jaccardPairs(noDocs, "doc_id", "text", 3, 0.8).count() == 0)
    assert(Dedup.simhashPairs(noDocs, "doc_id", "text", 1).count() == 0)
    assert(Dedup.minhashLshPairs(noDocs, "doc_id", "text", 3, 12, 3, 0.8).count() == 0)
    assert(Dedup.dupClusters(
      Seq.empty[(Long, Long)].toDF("d1", "d2")).count() == 0)
    assert(Dedup.ppsSample(noDocs, "doc_id", "source", lit(1L), 5, "s").count() == 0)
  }

  test("search operators are empty-safe") {
    assert(Search.bm25TopK(noDocs, "doc_id", "text", Seq("x"), 5).count() == 0)
    assert(Search.postingsSummary(noDocs, "doc_id", "text", 1L).count() == 0)
  }

  test("lshSweep on an empty corpus yields one all-zero row per config") {
    val rows = Dedup.lshSweep(noDocs, "doc_id", "text", 3, 12, Seq(3, 4), 0.8)
      .collect()
    assert(rows.length == 2)
    rows.foreach { r =>
      assert(r.getAs[Long]("n_exact") == 0L &&
        r.getAs[Long]("n_candidates") == 0L &&
        r.getAs[Long]("n_true_pos") == 0L)
    }
  }

  test("sessionization of an empty stream is an empty frame") {
    assert(Sessions.stats(noEvents, "user_id", "t", "event_id", 1000L).count() == 0)
  }

  test("text analysis columns evaluate on empty input without an action error") {
    val out = noDocs.select(T.stripHtml(col("text")), T.markupRatio(col("text")),
      T.tokenSegments(col("text"), 4), T.hash60(col("text")))
    assert(out.count() == 0)
  }

  test("multimodal near-dup pipeline is empty-safe end to end") {
    import graft.corpus.Multimodal
    val noMedia = Seq.empty[(Long, String, Long)].toDF("doc_id", "text", "n_chars")
    val hist = Multimodal.gramHistogram(Multimodal.withPayload(noMedia), 64, 3)
    assert(hist.count() == 0)
    val sig = Multimodal.nearDupSignatures(hist, 0.995)
    assert(sig.count() == 0)
    assert(Multimodal.nearDupCandidates(sig).count() == 0)
    // 1-2 byte bodies (shorter than a trigram) drop out, not crash
    val tiny = Seq((1L, "ab", 2L), (2L, "", 0L)).toDF("doc_id", "text", "n_chars")
    assert(Multimodal.gramHistogram(Multimodal.withPayload(tiny), 64, 3).count() == 0)
  }

  test("aHash near-dup and k-NN graph are empty-safe") {
    import graft.corpus.{Multimodal, Similarity}
    val noMedia = Seq.empty[(Long, String, Long)].toDF("doc_id", "text", "n_chars")
    assert(Multimodal.ahashNearDup(Multimodal.withPayload(noMedia), 2, 60)
      .count() == 0)
    val noVecs = Seq.empty[(Long, Array[Float])].toDF("vec_id", "embedding")
    assert(Similarity.knnGraph(noVecs, "vec_id", "embedding",
      graft.queries.CorpusQueries.srpPlanesConst, 4, 3).count() == 0)
  }

  test("semantic dedup survives an empty embedding set") {
    import graft.corpus.Similarity
    val noVecs = Seq.empty[(Long, Array[Float], Int)].toDF("vec_id", "embedding", "label")
    assert(Similarity.semDedupSurvivors(noVecs, "vec_id", "embedding",
      "label", 0.9).count() == 0)
  }

  test("incremental dedup with an empty store admits everything") {
    val batch = Seq((1L, "a b c d", "s")).toDF("doc_id", "text", "source")
    assert(Dedup.incrementalPairs(noDocs, batch, "doc_id", "text", 3, 0.8)
      .count() == 0)
  }

  test("filtered ANN with a nothing-matching predicate returns empty") {
    import graft.corpus.Similarity
    val vecs = Seq((0L, Array(1.0f, 0.0f), 0), (1L, Array(0.0f, 1.0f), 1))
      .toDF("vec_id", "embedding", "label")
    assert(Similarity.filteredTopK(vecs, "vec_id", "embedding",
      col("vec_id") === 0, col("label") === 99, 5).count() == 0)
  }

  test("PQ ANN on an empty embedding set returns empty, not NoSuchElement") {
    import graft.corpus.Similarity
    val noVecs = Seq.empty[(Long, Array[Float], Int)].toDF("vec_id", "embedding", "label")
    val adc = Similarity.pqTopK(noVecs, "vec_id", "embedding",
      col("vec_id") % 2 === 0, m = 2, kSub = 4, iters = 1, topK = 3)
    assert(adc.count() == 0)
    assert(Similarity.pqTopKReranked(noVecs, "vec_id", "embedding",
      col("vec_id") % 2 === 0, m = 2, kSub = 4, iters = 1, topK = 3,
      shortlist = 5).count() == 0)
  }

  test("streaming ingest admission against an empty store admits the batch") {
    import graft.streaming.IngestDedup
    val batch = Seq((1L, "a b", "s")).toDF("doc_id", "text", "source")
    assert(IngestDedup.admit(batch,
      IngestDedup.storeDigests(noDocs, "text"), "text").count() == 1)
  }

  test("round-13 operators are empty-safe") {
    // split over an empty corpus / with an empty cluster artifact
    val noClusters = Seq.empty[(Long, Long)].toDF("doc_id", "canonical_id")
    assert(Dedup.leakageFreeSplit(noDocs, "doc_id", noClusters, 80, 10, "s").count() == 0)
    val someDocs = Seq((1L, "a", "s"), (2L, "b", "s")).toDF("doc_id", "text", "source")
    val split = Dedup.leakageFreeSplit(someDocs, "doc_id", noClusters, 80, 10, "s")
    assert(split.count() == 2 && split.filter(col("canon") =!= col("doc_id")).count() == 0)
    // quantile sketch: empty input and all-nonpositive input both yield
    // zero rows (no covering bucket), never a divide or a missing head
    val noVals = Seq.empty[(String, Long)].toDF("k", "v")
    assert(graft.corpus.Sketches.logHistQuantiles(noVals, "k", "v",
      Seq(("p50", 1, 2))).count() == 0)
    val nonPos = Seq(("k", 0L), ("k", -5L)).toDF("k", "v")
    assert(graft.corpus.Sketches.logHistQuantiles(nonPos, "k", "v",
      Seq(("p50", 1, 2))).count() == 0)
    // sampled lshEval on an empty corpus: one all-zero diagnostic row
    val r = Dedup.lshEval(noDocs, "doc_id", "text", 3, 12, 3, 0.8, 2L).head()
    assert(r.getLong(0) == 0 && r.getLong(1) == 0 && r.getLong(2) == 0)
    // winnowing over an empty corpus / a corpus of sub-k docs
    assert(Dedup.winnowFingerprints(noDocs, "doc_id", "text", 3, 4).count() == 0)
    val short = Seq((1L, "a b", "s")).toDF("doc_id", "text", "source")
    assert(Dedup.winnowFingerprints(short, "doc_id", "text", 3, 4).count() == 0)
    // fuzzy match with an empty dictionary or empty dirty side
    val noNames = Seq.empty[String].toDF("name")
    val oneName = Seq("abc").toDF("name")
    assert(graft.operators.FuzzyMatch.bestMatch(oneName, noNames,
      "name", "name", 2, 2).count() == 0)
    assert(graft.operators.FuzzyMatch.bestMatch(noNames, oneName,
      "name", "name", 2, 2).count() == 0)
  }

  test("stretch-3 operators are empty-safe") {
    // SCD2 over an empty version stream
    val noVers = Seq.empty[(Long, String, java.sql.Date)]
      .toDF("k", "a", "effective_from")
    assert(graft.operators.Scd2.history(noVers, Seq("k"), Seq("a")).count() == 0)
    // incremental agg: empty partials merge to empty; merge of one empty
    // + one real state is the identity (also pinned in Scd2Spec)
    val noKv = Seq.empty[(String, Long)].toDF("k", "v")
    val emptyState = graft.operators.IncrementalAgg.partials(noKv, Seq("k"), col("v"))
    assert(graft.operators.IncrementalAgg.merge(
      Seq(emptyState, emptyState), Seq("k")).count() == 0)
    // PageRank on an empty edge list is a loud error by contract (no
    // graph → no rank vector), never a hang or a divide-by-zero
    val noEdges = Seq.empty[(String, String, Long)].toDF("src", "dst", "w")
    intercept[IllegalArgumentException] {
      graft.operators.PageRank.ranks(noEdges, 1)
    }
    // semantic contamination with an EMPTY eval set: nothing can hit
    val emb = Seq((1L, Array(1.0f, 0.0f)), (2L, Array(0.0f, 1.0f)))
      .toDF("vec_id", "embedding")
    val noEmb = emb.filter(col("vec_id") < 0)
    assert(graft.corpus.Similarity.semanticContamination(
      emb, noEmb, "vec_id", "embedding", 0.4).count() == 0)
    // ... and with an empty corpus side
    assert(graft.corpus.Similarity.semanticContamination(
      noEmb, emb, "vec_id", "embedding", 0.4).count() == 0)
    // MV refresh read on a never-written state dir
    assert(graft.streaming.MvRefresh.read(spark,
      java.nio.file.Files.createTempDirectory("graft-mv-none").toString).isEmpty)
  }
}
