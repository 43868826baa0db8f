package graft

import graft.corpus.Search
import org.apache.spark.sql.functions._

/** BM25 retrieval (graft.corpus.Search): ranking sanity + the
  * broadcast-only join shape. */
class SearchSpec extends SparkTestBase {
  import spark.implicits._

  test("bm25: term-dense docs outrank sparse ones; non-matching docs absent") {
    val docs = Seq(
      (1L, "spark spark spark join"),         // dense in query terms
      (2L, "spark table row"),                // one term
      (3L, "alpha beta gamma"),               // no terms → absent
      (4L, "join window spark filler filler filler filler filler")
    ).toDF("doc_id", "text")
    val got = Search.bm25TopK(docs, "doc_id", "text",
      Seq("spark", "join", "window"), 10)
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getDouble(2)))
    assert(!got.exists(_._1 == 3L))
    assert(got.map(_._1).length == 3)
    // doc 4 matches all three terms — most matched terms
    assert(got.find(_._1 == 4L).get._2 == 3L)
    // every score positive, sorted descending
    assert(got.forall(_._3 > 0.0))
    assert(got.map(_._3).sameElements(got.map(_._3).sortBy(-(_: Double))))
  }

  test("bm25: rarer term contributes more than a common one at equal tf") {
    // 'rare' appears in 1 of 10 docs, 'common' in all 10; the doc holding
    // both must score higher on the rare-term query than the common-term
    // query does for the same doc
    val docs = (1L to 9L).map(i => (i, "common filler")) :+ (10L, "common rare")
    val df = docs.toDF("doc_id", "text")
    val rareScore = Search.bm25TopK(df, "doc_id", "text", Seq("rare"), 1)
      .head().getDouble(2)
    val commonScore = Search.bm25TopK(df, "doc_id", "text", Seq("common"), 10)
      .filter(col("doc_id") === 10L).head().getDouble(2)
    assert(rareScore > commonScore)
  }

  test("bm25 plan: only broadcast joins (stats rows), no shuffle join") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val out = Search.bm25TopK(docs, "doc_id", "text", Seq("spark", "join"), 5)
    out.collect()
    val plans = flattenPlan(out.queryExecution.executedPlan)
    val smj = plans.filter(_.getClass.getSimpleName.contains("SortMergeJoin"))
    val shj = plans.filter(_.getClass.getSimpleName.contains("ShuffledHashJoin"))
    assert(smj.isEmpty && shj.isEmpty,
      s"expected broadcast-only joins, got ${smj ++ shj}")
  }

  test("phraseSearch matches a brute-force sliding-window reference") {
    import spark.implicits._
    val rnd = new scala.util.Random(31)
    val vocab = Vector("a", "b", "c", "d")
    val docsSeq = (0 until 50).map { i =>
      (i.toLong, Seq.fill(rnd.nextInt(25))(vocab(rnd.nextInt(4))).mkString(" "))
    }
    val df = docsSeq.toDF("doc_id", "text")
    for (phrase <- Seq(Seq("a"), Seq("a", "b"), Seq("a", "b", "a"), Seq("c", "c"))) {
      val got = Search.phraseSearch(df, "doc_id", "text", phrase)
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      val want = docsSeq.map { case (id, text) =>
        val ts = text.split("\\s+").filter(_.nonEmpty).toSeq
        id -> ts.sliding(phrase.size).count(_ == phrase)
      }.filter(_._2 > 0).toMap
      assert(got == want.map { case (k, v) => k -> v.toLong },
        s"phrase ${phrase.mkString(" ")}")
    }
  }

  test("phraseSearch: overlapping occurrences each count ('a a a' in 'a a a a')") {
    import spark.implicits._
    val df = Seq((1L, "a a a a")).toDF("doc_id", "text")
    val r = Search.phraseSearch(df, "doc_id", "text", Seq("a", "a", "a")).head()
    assert(r.getLong(1) == 2L)
  }
}
