package graft

import graft.corpus.{Dedup, TextAnalysis => T}
import graft.operators.FuzzyMatch
import org.apache.spark.sql.functions._

/** Blocked fuzzy best-match + winnowing fingerprints + encoding-anomaly
  * counters (round-13 surface). */
class FuzzyWinnowSpec extends SparkTestBase {
  import spark.implicits._

  // ---- FuzzyMatch ----------------------------------------------------

  private val dict = Seq("small ring", "small bolt", "red widget",
    "red wagon", "hot gear", "blue bolt").toDF("name")

  test("bestMatch resolves a single-char typo to its source name") {
    val dirty = Seq("smal ring", "red widgt", "hot gearr").toDF("d")
    val got = FuzzyMatch.bestMatch(dirty, dict, "d", "name",
      maxDist = 2, lenBand = 2).orderBy("dirty").collect()
      .map(r => (r.getString(0), r.getString(1), r.getLong(2))).toSeq
    assert(got == Seq(("hot gearr", "hot gear", 1L),
      ("red widgt", "red widget", 1L), ("smal ring", "small ring", 1L)))
  }

  test("bestMatch tie-break: equal distance resolves lexicographically") {
    // "red waget" is distance 2 from both "red wagon" and "red widget"
    val d = Seq("red waget").toDF("d")
    val r = FuzzyMatch.bestMatch(d, dict, "d", "name", 3, 3).head()
    assert(r.getString(1) == "red wagon" && r.getLong(3) == 2L)
  }

  test("bestMatch drops dirty values beyond maxDist and honors the block") {
    // "purple hat" has no same-prefix candidate within distance 2;
    // "xed widget" breaks the first-char block by contract
    val d = Seq("purple hat", "xed widget").toDF("d")
    assert(FuzzyMatch.bestMatch(d, dict, "d", "name", 2, 2).count() == 0)
  }

  test("bestMatch n_candidates counts every in-budget same-block candidate") {
    val d = Seq("small bolt").toDF("d")
    val r = FuzzyMatch.bestMatch(d, dict, "d", "name", 4, 4).head()
    // small bolt (0), small ring (4) qualify; blue bolt is blocked ('b')
    assert(r.getString(1) == "small bolt" && r.getLong(2) == 0L &&
      r.getLong(3) == 2L)
  }

  // ---- winnowing -----------------------------------------------------

  /** Reference winnow: brute-force window scan over gram hashes. */
  private def refWinnow(tokens: Seq[String], k: Int, w: Int): Set[Long] = {
    val grams = tokens.sliding(k).filter(_.size == k).map(_.mkString(" ")).toSeq
    val hs = grams.map(refHash60)
    if (hs.isEmpty) Set.empty
    else if (hs.size < w) Set(hs.min)
    else hs.sliding(w).map(_.min).toSet
  }

  private def refHash60(s: String): Long = {
    val d = java.security.MessageDigest.getInstance("MD5")
      .digest(s.getBytes("UTF-8"))
    java.lang.Long.parseLong(d.map("%02x".format(_)).mkString.take(15), 16)
  }

  test("winnowFingerprints matches the brute-force reference on random docs") {
    val rnd = new scala.util.Random(7)
    val vocab = Vector("a", "b", "c", "d", "e", "f", "g")
    val docsSeq = (0 until 40).map { i =>
      val n = rnd.nextInt(12) // 0..11 tokens: covers n<k, k<=n<k+w-1, long
      (i.toLong, Seq.fill(n)(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    }
    val got = Dedup.winnowFingerprints(
        docsSeq.toDF("doc_id", "text"), "doc_id", "text", 3, 4)
      .collect().map(r => (r.getLong(0), r.getLong(1)))
      .groupBy(_._1).view.mapValues(_.map(_._2).toSet).toMap
    docsSeq.foreach { case (id, text) =>
      val want = refWinnow(text.split("\\s+").filter(_.nonEmpty).toSeq, 3, 4)
      assert(got.getOrElse(id, Set.empty[Long]) == want, s"doc $id '$text'")
    }
  }

  test("winnowing guarantee: a shared run of >= w+k-1 tokens shares a fingerprint") {
    val rnd = new scala.util.Random(13)
    val vocab = Vector("p", "q", "r", "s", "t", "u", "v", "w")
    def randToks(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
    (0 until 20).foreach { _ =>
      val shared = randToks(6) // w + k - 1 = 6 for k=3, w=4
      val a = (randToks(5) ++ shared ++ randToks(5)).mkString(" ")
      val b = (randToks(7) ++ shared ++ randToks(3)).mkString(" ")
      val fps = Dedup.winnowFingerprints(
          Seq((1L, a), (2L, b)).toDF("doc_id", "text"), "doc_id", "text", 3, 4)
        .collect().map(r => (r.getLong(0), r.getLong(1)))
      val f1 = fps.filter(_._1 == 1L).map(_._2).toSet
      val f2 = fps.filter(_._1 == 2L).map(_._2).toSet
      assert((f1 & f2).nonEmpty, s"no shared fp for '$a' / '$b'")
    }
  }

  test("winnow overlap surfaces a planted long shared run as a doc pair") {
    val rnd = new scala.util.Random(23)
    val vocab = Vector("m", "n", "o", "p", "q", "r")
    def randToks(n: Int) = Seq.fill(n)(vocab(rnd.nextInt(vocab.size)))
    val shared = randToks(20)
    val a = (randToks(8) ++ shared ++ randToks(8)).mkString(" ")
    val b = (randToks(4) ++ shared ++ randToks(12)).mkString(" ")
    val noise = (0 until 6).map(i => (10L + i, randToks(18).mkString(" ")))
    val corpus = (Seq((1L, a), (2L, b)) ++ noise).toDF("doc_id", "text")
    val fps = Dedup.winnowFingerprints(corpus, "doc_id", "text", 3, 4)
    val f1 = fps.filter($"doc_id" === 1L).select("fp").as[Long].collect().toSet
    val f2 = fps.filter($"doc_id" === 2L).select("fp").as[Long].collect().toSet
    // a 20-token run contains 18 grams = 15 complete windows; winnowing
    // keeps ~2/(w+1) of them — comfortably >= 2 shared fingerprints
    assert((f1 & f2).size >= 2, s"shared=${(f1 & f2).size}")
  }

  test("winnowing selects far fewer fingerprints than grams on long docs") {
    val text = (0 until 400).map(i => s"tok${i % 97}").mkString(" ")
    val n = Dedup.winnowFingerprints(
      Seq((1L, text)).toDF("doc_id", "text"), "doc_id", "text", 3, 4).count()
    val grams = 400 - 2
    assert(n < grams / 2, s"$n fingerprints from $grams grams")
  }

  // ---- encoding anomalies --------------------------------------------

  test("mojibake counters: planted anomalies counted, clean ASCII is zero") {
    val rows = Seq(
      "plain ascii text",
      "cafÃ© latte",                     // one Ã© pair
      "bad �� bytes",                    // two replacement chars
      "mixed Ã©Ã¼ and �", // two pairs + one repl
      "genuine café"                          // real é: non-ascii, no pair
    ).zipWithIndex.map { case (t, i) => (i.toLong, t) }.toDF("id", "text")
    val got = rows.select($"id",
        T.replacementCharCount($"text"), T.mojibakePairCount($"text"),
        T.nonAsciiCount($"text"))
      .orderBy("id").collect()
      .map(r => (r.getLong(1), r.getLong(2), r.getLong(3))).toSeq
    assert(got == Seq((0L, 0L, 0L), (0L, 1L, 2L), (2L, 0L, 2L),
      (1L, 2L, 5L), (0L, 0L, 1L)))
  }
}
