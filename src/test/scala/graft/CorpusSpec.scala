package graft

import graft.corpus.{Dedup, TextAnalysis => T}
import org.apache.spark.sql.functions._

/** Unit coverage for the corpus text/dedup operators (SURVEY.md §7 F). */
class CorpusSpec extends SparkTestBase {
  import spark.implicits._

  private def one(c: org.apache.spark.sql.Column): org.apache.spark.sql.Row =
    Seq("x").toDF("dummy").select(c).head()

  test("tokens: empty, blank and multi-space input") {
    val df = Seq("", "   ", "a b", " a  b\tc ").toDF("t")
      .select(size(T.tokens(col("t"))).as("n"))
    assert(df.collect().map(_.getInt(0)).toSeq == Seq(0, 0, 2, 3))
  }

  test("hash60 matches the DuckDB-portable definition") {
    // md5('hello') = 5d41402abc4b2a76... → first 15 hex = 0x5d41402abc4b2a7
    val r = one(T.hash60(lit("hello")))
    assert(r.getLong(0) == 419982666956583591L)
  }

  test("shingles: k boundary and distinctness") {
    val df = Seq("a b", "a b c", "a b c d", "a b a b a b").toDF("t")
      .select(T.shingles(col("t"), 3).as("s"))
    val got = df.collect().map(_.getSeq[String](0).toSeq).toSeq
    assert(got(0) == Seq())                          // n < k
    assert(got(1) == Seq("a b c"))                   // n == k
    assert(got(2) == Seq("a b c", "b c d"))          // sliding
    assert(got(3) == Seq("a b a", "b a b"))          // distinct
  }

  test("rolling fingerprint: hand-computed polynomial") {
    // "ab": h = (0*131+97) % p = 97; (97*131+98) % p = 12805
    assert(one(T.rollingFingerprint(lit("ab"))).getLong(0) == 12805L)
    // case-insensitive: trims + lowercases first
    assert(one(T.rollingFingerprint(lit("  AB "))).getLong(0) == 12805L)
  }

  test("langId: stopword profiles, CJK short-circuit, und fallback") {
    val df = Seq(
      "the cat sat on the mat and slept",
      "der hund und die katze ist da",
      "le chat et les oiseaux dans une maison",
      "el perro y los gatos es una casa",
      "你好世界",
      "zzz qqq www").toDF("t").select(T.langId(col("t")).as("l"))
    assert(df.collect().map(_.getString(0)).toSeq ==
      Seq("en", "de", "fr", "es", "zh", "und"))
  }

  test("qualityScore stays within [0,1]") {
    val scores = Seq(
      "the quick brown fox jumps over the lazy dog and runs away today",
      "x",
      "!!! ??? ### $$$ %%% ^^^ &&& *** ((( ))) @@@ !!!"
    ).toDF("t").select(T.qualityScore(col("t"))).collect().map(_.getDouble(0))
    assert(scores.forall(s => s >= 0.0 && s <= 1.0))
    assert(scores(0) > scores(2)) // clean english beats symbol soup
  }

  test("exact dedup summary counts duplicate texts") {
    val df = Seq((1L, "aaa", "s1"), (2L, "aaa", "s1"), (3L, "bbb", "s1"),
      (4L, "ccc", "s2")).toDF("doc_id", "text", "source")
    val got = Dedup.exactDupSummary(df, "text", "source")
      .orderBy("source").collect()
    assert(got.map(r => (r.getString(0), r.getLong(1), r.getLong(2), r.getLong(3))).toSeq ==
      Seq(("s1", 3L, 2L, 1L), ("s2", 1L, 1L, 0L)))
  }

  test("repeated spans: cross-doc and within-doc occurrences both count") {
    // w=3 windows. doc1/doc2 share the span "a b c"; doc3 repeats
    // "r r r" internally (tokens r r r r → windows "r r r" ×2);
    // doc4 is all-unique; doc5 is too short to window.
    val df = Seq(
      (1L, "a b c x y"),   // windows: "a b c" "b c x" "c x y"
      (2L, "q a b c"),     // windows: "q a b" "a b c"
      (3L, "r r r r"),     // windows: "r r r" "r r r"
      (4L, "u v w"),       // windows: "u v w"
      (5L, "t1 t2")        // no window
    ).toDF("doc_id", "text")
    val got = Dedup.repeatedSpanStats(df, "doc_id", "text", 3)
      .orderBy("doc_id")
      .collect().map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSeq
    assert(got == Seq((1L, 3L, 1L), (2L, 2L, 1L), (3L, 2L, 2L), (4L, 1L, 0L)))
    val top = Dedup.boilerplateSpans(df, "doc_id", "text", 3, 10)
      .collect().map(r => (r.getString(0), r.getLong(1), r.getLong(2))).toSeq
    // occ=2 for both; tie breaks on span text ascending
    assert(top == Seq(("a b c", 2L, 2L), ("r r r", 2L, 1L)))
  }

  test("jaccard pairs: identical docs score 1.0, disjoint docs drop out") {
    val df = Seq(
      (1L, "w1 w2 w3 w4 w5"),
      (2L, "w1 w2 w3 w4 w5"),           // dup of 1
      (3L, "z1 z2 z3 z4 z5")            // unrelated
    ).toDF("doc_id", "text")
    val got = Dedup.jaccardPairs(df, "doc_id", "text", 3, 0.5).collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == 1L && got(0).getLong(1) == 2L)
    assert(got(0).getDouble(3) == 1.0)
  }

  test("clustersTable: one build per artifact dir, readers reuse it") {
    val dir = java.nio.file.Files.createTempDirectory("graft-clusters")
      .toString + "/art"
    val corpus = Seq(
      (1L, "w1 w2 w3 w4 w5"),
      (2L, "w1 w2 w3 w4 w5"),
      (3L, "z1 z2 z3 z4 z5")
    ).toDF("doc_id", "text")
    val first = Dedup.clustersTable(corpus, "doc_id", "text", 3, 0.5, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    // artifact ≡ the direct chain it materializes
    val direct = Dedup.dupClusters(
        Dedup.jaccardPairs(corpus, "doc_id", "text", 3, 0.5))
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(first == direct && first.nonEmpty)
    // a second consumer passing a DIFFERENT corpus still gets the stored
    // artifact — proof the postings→pairs→clusters chain ran ONCE (the
    // by-name docs argument is never even evaluated on the read path)
    val other = Seq((9L, "q1 q2 q3 q4 q5")).toDF("doc_id", "text")
    val second = Dedup.clustersTable(other, "doc_id", "text", 3, 0.5, dir)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(second == first)
    // the pair table is the SAME artifact (by-name docs never evaluated
    // on the read path here either) and matches the direct pairs chain
    val pairs = Dedup.pairsTable(other, "doc_id", "text", 3, 0.5, dir)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    val directPairs = Dedup.jaccardPairs(corpus, "doc_id", "text", 3, 0.5)
      .select("d1", "d2").collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(pairs == directPairs && pairs.nonEmpty)
  }

  test("minhash LSH finds the planted near-dup and skips unrelated docs") {
    val base = "t1 t2 t3 t4 t5 t6 t7 t8 t9 t10 t11 t12"
    val df = Seq(
      (1L, base),
      (2L, base + " t13"),              // near-dup of 1
      (3L, "u1 u2 u3 u4 u5 u6 u7 u8 u9 u10 u11 u12")
    ).toDF("doc_id", "text")
    val got = Dedup.minhashLshPairs(df, "doc_id", "text", 3, 12, 3, 0.5).collect()
    assert(got.length == 1)
    assert(got(0).getLong(0) == 1L && got(0).getLong(1) == 2L)
    assert(got(0).getDouble(3) > 0.8)
  }

  test("MinHashSig kernel matches the SQL salted-md5 min form bit-for-bit") {
    val docs = Seq((1L, "a b c d e f"), (2L, "x y z w v u t s")).toDF("doc_id", "text")
    val fast = graft.corpus.Dedup.minhashSignatures(docs, "doc_id", "text", 3, 12)
    val slow = docs.select(col("doc_id"),
        explode(T.shingles(col("text"), 3)).as("shingle"))
      .groupBy(col("doc_id"))
      .agg(min(T.hash60Salted(0, col("shingle"))).as("mh0"),
        (1 until 12).map(i => min(T.hash60Salted(i, col("shingle"))).as(s"mh$i")): _*)
    assert(fast.exceptAll(slow).count() == 0 && slow.exceptAll(fast).count() == 0)
  }

  test("stratified sample: deterministic, respects per-stratum rate direction") {
    val df = (1L to 2000L).map(i => (i, s"src${i % 2}")).toDF("doc_id", "source")
    val rates = Map("src0" -> 80, "src1" -> 10)
    val s1 = Dedup.stratifiedSample(df, "doc_id", "source", rates, 50, "salt")
    val s2 = Dedup.stratifiedSample(df, "doc_id", "source", rates, 50, "salt")
    // same rows every run — reproducible corpus builds
    assert(s1.exceptAll(s2).count() == 0 && s2.exceptAll(s1).count() == 0)
    val bySrc = s1.groupBy("source").count().collect()
      .map(r => r.getString(0) -> r.getLong(1)).toMap
    assert(bySrc("src0") > 3 * bySrc("src1"),
      s"80% stratum should dominate 10% stratum, got $bySrc")
    // a different salt draws a different sample
    val s3 = Dedup.stratifiedSample(df, "doc_id", "source", rates, 50, "other")
    assert(s1.exceptAll(s3).count() > 0)
  }

  test("survivors: drops exactly the non-canonical cluster members") {
    val docs = Seq((1L, "x"), (2L, "x"), (3L, "x"), (9L, "y")).toDF("doc_id", "src")
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L)).toDF("doc_id", "canonical_id")
    val kept = Dedup.survivors(docs, "doc_id", clusters)
      .select("doc_id").collect().map(_.getLong(0)).sorted
    assert(kept.toSeq == Seq(1L, 9L))
  }

  test("bpe-ish token count: contractions, punctuation runs, digit splits") {
    // exact counts pinned against manual application of the pattern:
    //  "don't stop" -> ["don", "'t", " stop"]  = 3
    //  "a  b"       -> ["a", "  ", "b"]        = 3  (letter alt takes at
    //                  most ONE leading space; the run falls to \s+)
    //  "x9y"        -> ["x", "9", "y"]         = 3
    //  "hi!!"       -> ["hi", "!!"]            = 2
    //  ""           -> []                      = 0
    val rows = Seq("don't stop", "a  b", "x9y", "hi!!", "").toDF("text")
    val got = rows.select(T.bpeTokenCount(col("text")).as("n")).collect().map(_.getInt(0))
    assert(got.toSeq == Seq(3, 3, 3, 2, 0))
  }

  test("SimHashSig kernel matches the exploded per-occurrence vote form bit-for-bit") {
    // duplicate tokens on purpose: the TF weight (per-OCCURRENCE votes)
    // is part of the contract
    val docs = Seq((1L, "a b c d e f a a b"), (2L, "x y z w v u t s x"),
      (3L, "lone"), (4L, " ")).toDF("doc_id", "text")
    val nb = Dedup.simhashDefaultBits
    val fast = Dedup.simhashSig(docs, "doc_id", "text")
    val slow = docs.select(col("doc_id"), explode(T.tokens(col("text"))).as("tok"))
      .withColumn("h", T.hash60(col("tok")))
      .groupBy(col("doc_id"))
      .agg((0 until nb).map(b =>
          sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1L)
            .otherwise(-1L)).as(s"v$b")).head,
        (1 until nb).map(b =>
          sum(when(shiftright(col("h"), b).bitwiseAND(lit(1L)) === 1L, 1L)
            .otherwise(-1L)).as(s"v$b")): _*)
      .select(col("doc_id"),
        (0 until nb).map(b => when(col(s"v$b") > 0, lit(1L << b)).otherwise(lit(0L)))
          .reduce(_ + _).as("simhash"))
    assert(fast.exceptAll(slow).count() == 0 && slow.exceptAll(fast).count() == 0)
    // doc 4 has no tokens: absent from both forms
    assert(fast.filter(col("doc_id") === 4).count() == 0)
  }

  test("simhash: identical texts collide at hamming 0") {
    val df = Seq((1L, "a b c d e f g h"), (2L, "a b c d e f g h"),
      (3L, "q r s t u v w x y z aa bb cc dd")).toDF("doc_id", "text")
    val got = Dedup.simhashPairs(df, "doc_id", "text", 0).collect()
    assert(got.map(r => (r.getLong(0), r.getLong(1))).toSeq == Seq((1L, 2L)))
    assert(got(0).getInt(4) == 0)
  }

  test("simhash pigeonhole equi-join = brute-force all-pairs, several maxHamming") {
    // a corpus with planted near-dups AND unrelated docs so buckets both
    // collide and separate; brute force is the ground truth
    val df = (1L to 24L).map { i =>
      val fam = i % 4
      (i, s"w$fam x$fam y$fam z$fam " + (if (i % 2 == 0) "extra tail tok" else "other end"))
    }.toDF("doc_id", "text")
    val sig = Dedup.simhashSig(df, "doc_id", "text").localCheckpoint(false)
    for (mh <- Seq(0, 1, 2, 3)) {
      val brute = sig.as("a").join(sig.as("b"), col("a.doc_id") < col("b.doc_id"))
        .select(col("a.doc_id").as("d1"), col("b.doc_id").as("d2"),
          bit_count(col("a.simhash").bitwiseXOR(col("b.simhash"))).as("hamming"))
        .filter(col("hamming") <= mh)
        .select("d1", "d2", "hamming")
      val fast = Dedup.simhashPairs(df, "doc_id", "text", mh)
        .select("d1", "d2", "hamming")
      assert(fast.exceptAll(brute).count() == 0 && brute.exceptAll(fast).count() == 0,
        s"pigeonhole candidate set incomplete or inflated at maxHamming=$mh")
    }
  }

  test("PII scrub: known vectors redact and count correctly") {
    val df = Seq(
      (1L, "mail bob.smith+x@corp.example.org now"),
      (2L, "server 192.168.0.1 and 10.0.0.255 up"),
      (3L, "call +4915123456789 today"),
      (4L, "none here, just words"),
      (5L, "a@b.co 1.2.3.4 +1234567 all three"),
      // 17 digits: a {7,15}-capped pattern would redact only the first
      // 15 and LEAK the tail as "<PHONE>67"
      (6L, "long +12345678901234567 run")
    ).toDF("doc_id", "text")
    val (ne, ni, np) = T.piiCounts(col("text"))
    val got = df.select(col("doc_id"), ne.as("e"), ni.as("i"), np.as("p"),
        T.scrubPii(col("text")).as("s"))
      .orderBy("doc_id")
      .as[(Long, Long, Long, Long, String)].collect().toSeq
    assert(got == Seq(
      (1L, 1L, 0L, 0L, "mail <EMAIL> now"),
      (2L, 0L, 2L, 0L, "server <IP> and <IP> up"),
      (3L, 0L, 0L, 1L, "call <PHONE> today"),
      (4L, 0L, 0L, 0L, "none here, just words"),
      (5L, 1L, 1L, 1L, "<EMAIL> <IP> <PHONE> all three"),
      (6L, 0L, 0L, 1L, "long <PHONE> run")))
  }

  test("incrementalPairs ≡ full self-join pairs restricted to store×batch") {
    val docs = Seq(
      (1L, "a b c d e f g"),   // store
      (2L, "a b c d e f g"),   // store dup of 1 — within-store pair must NOT appear
      (3L, "m n o p q r s"),   // store, unique
      (4L, "a b c d e f g"),   // batch (4 % 5 == 4), dup of 1 and 2
      (9L, "p q r s t u v")    // batch, unique
    ).toDF("doc_id", "text")
    val isBatch = col("doc_id") % 5 === 4
    val inc = Dedup.incrementalPairs(docs.filter(!isBatch), docs.filter(isBatch),
        "doc_id", "text", 3, 0.8)
      .select("store_id", "batch_id").as[(Long, Long)].collect().toSet
    // ground truth: the full self-join's pairs, reoriented to (store, batch)
    val storeIds = Set(1L, 2L, 3L); val batchIds = Set(4L, 9L)
    val fullPairs: Set[(Long, Long)] = Dedup.jaccardPairs(docs, "doc_id", "text", 3, 0.8)
      .select("d1", "d2").as[(Long, Long)].collect().toSet
    val expected = fullPairs.flatMap { case (a, b) =>
      if (storeIds(a) && batchIds(b)) Some((a, b))
      else if (batchIds(a) && storeIds(b)) Some((b, a))
      else None
    }
    assert(inc == expected && inc == Set((1L, 4L), (2L, 4L)))
    // empty batch → empty result, no failure
    assert(Dedup.incrementalPairs(docs, docs.filter(lit(false)),
      "doc_id", "text", 3, 0.8).isEmpty)
  }

  test("leakageFreeSplit: clusters never straddle splits; split is canonical-keyed") {
    import spark.implicits._
    val docs = (1L to 500L).map(i => (i, s"src${i % 3}")).toDF("doc_id", "source")
    // three clusters, including one whose members' OWN ids would hash to
    // different splits — the leakage the canonical keying prevents
    val clusters = Seq((1L, 1L), (2L, 1L), (3L, 1L), (10L, 10L), (11L, 10L),
      (200L, 200L), (201L, 200L), (499L, 200L)).toDF("doc_id", "canonical_id")
    val s = Dedup.leakageFreeSplit(docs, "doc_id", clusters, 80, 10, "t")
    // every cluster sits in exactly one split
    val leaky = s.groupBy("canon")
      .agg(countDistinct(col("split")).as("ns")).filter(col("ns") > 1)
    assert(leaky.count() == 0)
    // cluster members inherit the canonical, unclustered docs use their own id
    val m = s.select("doc_id", "canon").as[(Long, Long)].collect().toMap
    assert(m(2L) == 1L && m(499L) == 200L && m(42L) == 42L)
    // with 500 docs at 80/10/10 all three splits materialize, and the
    // train fraction is in a sane band (hash-deterministic, not exact)
    val bySplit = s.groupBy("split").count().as[(String, Long)].collect().toMap
    assert(bySplit.keySet == Set("train", "val", "test"))
    assert(bySplit("train") > 350 && bySplit("train") < 450)
    // deterministic: same inputs, same assignment
    val again = Dedup.leakageFreeSplit(docs, "doc_id", clusters, 80, 10, "t")
    assert(s.select("doc_id", "split").exceptAll(again.select("doc_id", "split")).isEmpty)
    // invalid percent ranges fail loudly
    intercept[IllegalArgumentException](
      Dedup.leakageFreeSplit(docs, "doc_id", clusters, 95, 5, "t"))
  }
}
