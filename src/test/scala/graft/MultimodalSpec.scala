package graft

import graft.corpus.{DecodedMedia, MediaRecord, Multimodal}
import org.apache.spark.sql.functions._

/** Multimodal binary-column plumbing: schema, header round-trip, batched
  * decode path. The decode itself is a documented deterministic stub (no
  * codecs in this container); what these tests pin down is the plumbing
  * that a real codec would drop into. */
class MultimodalSpec extends SparkTestBase {
  import spark.implicits._

  private val docs = Seq(
    (0L, "hello world", 11L),
    (1L, "x", 1L),
    (2L, "a" * 200, 200L)
  ).toDF("doc_id", "text", "n_chars")

  test("payload header round-trips through the SQL decode stub") {
    val got = Multimodal.withPayload(docs)
      .select(Seq(col("doc_id"), col("width"), col("height")) ++
        Multimodal.decodeStatsSql(col("payload")): _*)
      .orderBy("doc_id").collect()
    got.foreach { r =>
      assert(r.getAs[Int]("dec_width") == r.getAs[Int]("width"))
      assert(r.getAs[Int]("dec_height") == r.getAs[Int]("height"))
    }
    // byte_len = 4-byte header + utf8 body
    assert(got.map(_.getAs[Int]("byte_len")).toSeq == Seq(15, 5, 204))
  }

  test("payload column is real BinaryType with the documented layout") {
    val row = Multimodal.withPayload(docs).filter($"doc_id" === 0)
      .select($"payload", $"width", $"height").head()
    val bytes = row.getAs[Array[Byte]](0)
    val width = row.getInt(1)
    val height = row.getInt(2)
    assert(((bytes(0) & 0xff) << 8 | (bytes(1) & 0xff)) == width)
    assert(((bytes(2) & 0xff) << 8 | (bytes(3) & 0xff)) == height)
    assert(new String(bytes.drop(4), "UTF-8") == "hello world")
  }

  test("batched decode preserves every record and parses dims") {
    implicit val s = spark
    val media = Multimodal.withPayload(docs)
      .select($"doc_id", $"format", $"payload").as[MediaRecord]
    val decoded: Seq[DecodedMedia] =
      Multimodal.decodeBatched(media, batchSize = 2).collect().toSeq.sortBy(_.doc_id)
    assert(decoded.size == 3)
    assert(decoded.map(_.width) == Seq(11 % 64 + 16, 1 % 64 + 16, 200 % 64 + 16))
    assert(decoded(0).mean_byte > 0.0)
    // n_frames: (byte_len - 4) / 64 capped at 8
    assert(decoded.map(_.n_frames) == Seq(0, 0, 3))
  }

  test("framePositions strides past the header and caps at maxFrames") {
    val df = docs.select(
      Multimodal.framePositions(
        Multimodal.synthPayload(col("text"), lit(20), lit(20)), 64, 8).as("p"))
      .orderBy(size(col("p")))
    val got = df.collect().map(_.getSeq[Int](0).toSeq).toSeq
    assert(got(0) == Seq() && got(1) == Seq())    // bodies < 64 bytes
    assert(got(2) == Seq(4, 68, 132))             // 200-char body → 3 frames
  }

  test("native pHash kernel is bit-identical to the relational DCT pipeline") {
    // the one-pass row kernel vs the (doc, u, v)-grain matrix-multiply
    // form the oracle replays — every fixture doc must hash identically
    val media = Multimodal.withPayload(
      spark.read.parquet(sf("sf0.001") + "/documents.parquet"))
    val rel = Multimodal.phashSigRelational(media)
      .withColumnRenamed("simhash", "rel_hash")
    val nat = media.select($"doc_id",
      org.apache.spark.sql.functions.udf((b: Array[Byte]) =>
        Option(Multimodal.phashKernel(b)).map(x => x: Long)).apply($"payload")
        .as("nat_hash"))
      .filter($"nat_hash".isNotNull)
    val joined = rel.join(nat, "doc_id")
    assert(joined.count() == rel.count() && joined.count() == nat.count(),
      "both forms must hash exactly the same doc set")
    assert(joined.filter($"rel_hash" =!= $"nat_hash").count() == 0,
      "kernel and relational hashes diverged")
  }

  test("mm_near_dup prefix-filter candidates lose no pair vs all-pairs at the threshold") {
    // sparse byte-trigram-histogram signatures for the sf0.01 corpus;
    // all-pairs cosine is the ground truth the df-ordered one-sided
    // suffix-norm prefix filter must match. The generator is PROVABLY
    // complete at the threshold (proof at Multimodal.nearDupSignatures:
    // a disjoint-prefix pair has cos < t), and the DuckDB oracle is the
    // unpruned all-pairs scan — this spec and the oracle both test
    // completeness on data.
    val real = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
    val sigs = Multimodal.gramHistogram(Multimodal.withPayload(real), 64, 3)
      .as[(Long, String, Long, Long)].collect()
      .groupBy(r => (r._1, r._2))
      .map { case ((id, f), rows) =>
        (id, f, rows.map(r => r._3 -> r._4).toMap)
      }.toSeq
    val thr = graft.queries.CorpusQueries.mmNearDupThreshold
    def cos(a: Map[Long, Long], b: Map[Long, Long]): Double = {
      val dot = a.iterator.map { case (d, x) => x * b.getOrElse(d, 0L) }.sum.toDouble
      val r = dot / (math.sqrt(a.valuesIterator.map(x => x * x).sum.toDouble) *
        math.sqrt(b.valuesIterator.map(x => x * x).sum.toDouble))
      math.round(r * 1e6) / 1e6
    }
    val exact = (for {
      (d1, f1, s1) <- sigs; (d2, f2, s2) <- sigs
      if f1 == f2 && d1 < d2 && cos(s1, s2) >= thr
    } yield (f1, d1, d2)).toSet
    val bucketed = graft.SparkEntry.queries("mm_near_dup")(spark, sf("sf0.01"))
      .select($"format", $"d1", $"d2").as[(String, Long, Long)].collect().toSet
    assert(bucketed == exact,
      s"prefix filter dropped pairs: missing ${exact -- bucketed}, extra ${bucketed -- exact}")
    assert(exact.nonEmpty, "threshold should catch at least one planted-similar pair")
  }

  test("near-dup prefix filter loses no pair at ANY threshold (property, random corpora)") {
    // the completeness proof (Multimodal.nearDupSignatures) is threshold-
    // generic; this drives it on seeded random corpora with planted
    // one-character mutations, at thresholds from near-exact (prefix =
    // 1-3 rarest dims) down to 0.5 (prefix mass > 75% — the posting-heavy
    // regime). Candidates must be a superset of the UNROUNDED all-pairs
    // matches in every case.
    val rnd = new scala.util.Random(7)
    val vocab = Vector("alpha", "beta", "gamma", "delta", "eps", "zeta", "qx")
    val base = Seq.fill(60)(
      Seq.fill(8 + rnd.nextInt(30))(vocab(rnd.nextInt(vocab.size))).mkString(" "))
    val mutated = base.take(30).map { t =>
      val i = rnd.nextInt(t.length)
      t.updated(i, if (t(i) == 'a') 'o' else 'a')
    }
    val corpus = (base ++ mutated).zipWithIndex.map { case (t, i) =>
      (i.toLong, t, t.length.toLong) }.toDF("doc_id", "text", "n_chars")
    val hist = Multimodal.gramHistogram(Multimodal.withPayload(corpus), 64, 3)
    val sigs = hist.as[(Long, String, Long, Long)].collect()
      .groupBy(r => (r._1, r._2))
      .map { case ((id, f), rows) => (id, f, rows.map(r => r._3 -> r._4).toMap) }.toSeq
    def cosRaw(a: Map[Long, Long], b: Map[Long, Long]): Double = {
      val dot = a.iterator.map { case (d, x) => x * b.getOrElse(d, 0L) }.sum.toDouble
      dot / (math.sqrt(a.valuesIterator.map(x => x * x).sum.toDouble) *
        math.sqrt(b.valuesIterator.map(x => x * x).sum.toDouble))
    }
    for (t <- Seq(0.995, 0.9, 0.8, 0.5)) {
      val exact = (for {
        (d1, f1, s1) <- sigs; (d2, f2, s2) <- sigs
        if f1 == f2 && d1 < d2 && cosRaw(s1, s2) >= t
      } yield (f1, d1, d2)).toSet
      val cands = Multimodal.nearDupCandidates(Multimodal.nearDupSignatures(hist, t))
        .select($"format", $"d1", $"d2").as[(String, Long, Long)].collect().toSet
      assert(exact.subsetOf(cands),
        s"threshold $t: prefix filter dropped ${exact -- cands}")
      assert(exact.nonEmpty, s"threshold $t should catch planted mutations")
    }
  }

  test("mm_near_dup candidate volume is output-bound, not quadratic") {
    // round 6 shipped a join-TYPE gate ("never a cartesian") that passed
    // while the plan was effectively cartesian: ~plen·n²/2 candidates
    // through a 48-value join key. This is the join-SELECTIVITY gate: the
    // prefix postings must generate candidates linear in n (each doc
    // posts only its few rarest dims), never a quadratic blowup. At
    // sf0.01 n=500 docs → the old plan generated >300k candidates; the
    // df-ordered one-sided filter must stay under 4·n.
    val real = spark.read.parquet(sf("sf0.01") + "/documents.parquet")
    val hist = Multimodal.gramHistogram(Multimodal.withPayload(real), 64, 3)
    val sig = Multimodal.nearDupSignatures(
      hist, graft.queries.CorpusQueries.mmNearDupThreshold)
    val n = sig.count()
    val cands = Multimodal.nearDupCandidates(sig).count()
    assert(cands <= 4 * n,
      s"candidate generation is quadratic again: $cands candidates for $n docs")
  }

  test("ahash: truncated-mean bit rule on a known byte pattern") {
    // body "aaabaaab" = 97,97,97,98,97,97,97,98: sum 778, n 8, mean 97;
    // bits set exactly where byte > 97 → positions 3 and 7 → 0x88
    val df = Seq((0L, "aaabaaab", 8L)).toDF("doc_id", "text", "n_chars")
    val got = Multimodal.withPayload(df)
      .select(Multimodal.ahash(col("payload"), 60)).head().getLong(0)
    assert(got == ((1L << 3) | (1L << 7)))
  }

  test("ahash: bodies under 8 bytes yield null, not a degenerate signature") {
    val df = Seq((0L, "abc", 3L), (1L, "abcdefgh", 8L))
      .toDF("doc_id", "text", "n_chars")
    val got = Multimodal.withPayload(df)
      .select(col("doc_id"), Multimodal.ahash(col("payload"), 60).as("h"))
      .orderBy("doc_id").collect()
    assert(got(0).isNullAt(1))
    assert(!got(1).isNullAt(1))
  }

  test("ahashNearDup: exact dup at hamming 0, mean-neutral byte swap at 2") {
    // "aaaabbba" and "aaaabbab" have identical byte sums (same mean 97),
    // differ only in which of positions {6, 7} carries the 'b' → their
    // aHashes differ in exactly bits 6 and 7 (hamming 2); two copies of
    // the first text pair at hamming 0. "zzzzzzzz" is all-equal bytes
    // (ahash 0, hamming 3 from the others) and must NOT pair at radius 2.
    val df = Seq(
      (0L, "aaaabbba", 8L), (1L, "aaaabbba", 8L),
      (2L, "aaaabbab", 8L), (3L, "zzzzzzzz", 8L)
    ).toDF("doc_id", "text", "n_chars")
    val got = Multimodal.ahashNearDup(Multimodal.withPayload(df), 2, 60)
      .select("d1", "d2", "hamming").orderBy("d1", "d2").collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getInt(2))).toSeq
    assert(got == Seq((0L, 1L, 0), (0L, 2L, 2), (1L, 2L, 2)))
  }
}
