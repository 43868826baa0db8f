package graft.corpus

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** A media payload row: opaque bytes + typed metadata. The 100 TB design
  * keeps media as `BinaryType` columns co-located with their metadata so
  * scans prune on metadata (format, dims) without touching bytes. */
case class MediaRecord(doc_id: Long, format: String, payload: Array[Byte])

/** Stub "decoded" result — what a real image decode would produce. */
case class DecodedMedia(doc_id: Long, format: String, width: Int, height: Int,
                        byte_len: Long, mean_byte: Double, n_frames: Int)

/**
 * Multimodal-column plumbing (SURVEY.md §7 phase F): images/audio/video as
 * opaque binary columns with typed metadata. This container has no image
 * or audio codecs, so the DECODE STEP IS A DETERMINISTIC STUB — it parses
 * the payload's synthetic 4-byte header and averages the first bytes. The
 * Spark-side plumbing is real: binary schema, batched iterator decode
 * (the Scala analogue of `mapInPandas` — process partitions in fixed-size
 * batches so a vectorized decoder amortizes per-batch setup), and
 * frame-sampling positions for video-like payloads.
 */
object Multimodal {

  val headerLen = 4 // 2 bytes width, 2 bytes height, big-endian

  /** Synthesize a payload column: 4-byte dims header + the UTF-8 text bytes
    * standing in for compressed media. Pure built-ins, so the same bytes
    * are constructible in the DuckDB oracle (from_hex || encode).
    * CONTRACT: width/height must be in [0, 65535] — lpad TRUNCATES a
    * longer hex string, silently corrupting the header (the jdbc-sink
    * "caller owns validity" discipline; withPayload's derivations stay
    * in range by construction). */
  def synthPayload(text: Column, width: Column, height: Column): Column =
    concat(
      unhex(concat(lpad(hex(width), 4, "0"), lpad(hex(height), 4, "0"))),
      encode(text, "UTF-8"))

  /** Deterministic fake dims/format derived from stable doc attrs. */
  def withPayload(docs: DataFrame): DataFrame =
    docs
      .withColumn("width", (col("n_chars") % 64 + 16).cast("int"))
      .withColumn("height", (col("doc_id") % 48 + 16).cast("int"))
      .withColumn("format",
        when(col("doc_id") % 3 === 0, "png")
          .when(col("doc_id") % 3 === 1, "jpg")
          .otherwise("webp"))
      .withColumn("payload", synthPayload(col("text"), col("width"), col("height")))

  /** Overlapping byte `gram`-grams (big-endian packed into a long, e.g.
    * g=3 → b₁·65536+b₂·256+b₃) over the first `maxBytes` body bytes —
    * each gram read as 2·g hex chars at once. Grams, not single bytes,
    * because the near-dup signature must have RARE features for the
    * prefix filter to post: on this corpus even a doc's rarest single
    * byte appears in ~40% of same-format docs (posting buckets of 40-80
    * at n=167/format) and its rarest bigram in ~25% — its rarest TRIGRAM
    * appears in ≤ 4 (measured candidates: 24k bytes / 7.5k bigrams / 247
    * trigrams at sf0.01). Native codegen expression over the raw bytes
    * ([[SparseSigExpr.bodyGramsL]]) — the earlier hex-string HOF form was
    * value-identical but allocated a string per gram and carried a
    * nested-lambda tree through every Catalyst pass. */
  def bodyGrams(payload: Column, maxBytes: Int, gram: Int): Column =
    SparseSigExpr.bodyGramsL(payload, maxBytes, gram)

  /** Sparse byte-gram histogram of the first `maxBytes` body bytes: one
    * row per (doc_id, format, dim, cnt). Built as explode + groupBy — a
    * map-side-combined aggregation, the shape that scales (never a
    * per-row dense projection). Bodies shorter than `gram` bytes produce
    * no rows, matching the oracle's `WHERE i < least(...)` generator. */
  def gramHistogram(media: DataFrame, maxBytes: Int = 64, gram: Int = 3): DataFrame =
    media.select(col("doc_id"), col("format"),
        explode(bodyGrams(col("payload"), maxBytes, gram)).as("dim"))
      .groupBy("doc_id", "format", "dim").agg(count(lit(1)).as("cnt"))

  /** Near-dup signature frame: per doc, the sparse histogram entries
    * sorted by the GLOBAL dim order (document-frequency asc, dim asc) +
    * squared norm `nsq` + prefix length `plen`.
    *
    * Completeness bound (one-sided suffix-norm prefix filter): fix any
    * total order on dims shared by all docs of a format, and give each
    * doc the shortest prefix of its (order-sorted) nonzero dims whose
    * remaining suffix satisfies ‖x_S‖ < t·‖x‖. If two docs share NO
    * prefix dim, let x be the one whose prefix ends earlier in the global
    * order. At every position ≤ end(P(x)): x nonzero ⇒ dim ∈ P(x), and
    * y nonzero ⇒ dim ∈ P(y) (y's prefix is contiguous in the same order
    * and extends at least as far) — disjointness zeroes every product.
    * Past end(P(x)), Cauchy-Schwarz gives Σ x_d·y_d ≤ ‖x_S‖·‖y‖ <
    * t·‖x‖·‖y‖. So cos(x,y) < t: any pair at ≥ t shares a prefix dim.
    * Unlike the symmetric t/2 bound (prefix mass > (1−t²/4)·nsq ≈ 75%),
    * this needs prefix mass > (1−t²)·nsq ≈ 1% at t=0.995 — 1-3 dims.
    * Ordering by df asc makes those the doc's RAREST dims, so posting
    * buckets are small by construction (AllPairs' frequency heuristic,
    * Bayardo et al., WWW'07).
    *
    * The suffix cut compares in exact integer arithmetic
    * (suffixSq·10¹² ≥ round(t²·10¹²)·nsq — both ≤ 4·10¹⁵ for 64-byte
    * histograms, nsq ≤ 62²), so no float rounding can shave the prefix
    * short. */
  def nearDupSignatures(hist: DataFrame, threshold: Double): DataFrame = {
    val dfreq = hist.groupBy("format", "dim").agg(count(lit(1)).as("df"))
    // ≤ formats · distinct-grams-in-corpus rows — vocabulary-bounded
    // (tens of thousands here, ≤ the 2²⁴ dim space at any corpus size).
    // No broadcast hint: AQE picks broadcast while it fits and falls back
    // to a shuffle join on the same (format, dim) key when it doesn't —
    // the algorithm is unchanged either way.
    val keyed = hist.join(dfreq, Seq("format", "dim"))
      .groupBy("doc_id", "format")
      .agg(
        sort_array(collect_list(struct(col("df"), col("dim"), col("cnt")))).as("e"),
        sum(col("cnt") * col("cnt")).as("nsq"))
    // floor, not round: the strict suffix cut needs t2num ≤ t²·10¹² for
    // the completeness proof to hold at ANY nsq — round could land one
    // integer unit ABOVE the true t² and silently miss boundary-exact
    // pairs for callers with larger maxBytes than the 64-byte default
    val t2num = math.floor(threshold * threshold * 1e12).toLong
    // plen = 1 + #{k ∈ 1..p−1 : suffixSq(k) ≥ cut}, suffixSq(k) =
    // nsq − prefixSq(k): one O(p) running-prefix pass inside a native
    // codegen expression. The interpreted-HOF form (slice + aggregate
    // per k) was O(p²) per doc AND planner-hostile — its inlined lambda
    // tree cost more in Catalyst passes than the query's execution.
    keyed.withColumn("plen",
      SparseSigExpr.prefixLenL(col("e"), col("nsq"), t2num))
  }

  /** Candidate pairs from the prefix postings — id-only rows (16 bytes)
    * through the join and the pair-dedup shuffle; signatures re-attach
    * AFTER dedup. Complete for cos ≥ threshold by the bound above. */
  def nearDupCandidates(sig: DataFrame): DataFrame = {
    val posted = sig.select(col("format"), col("doc_id"),
      explode(transform(slice(col("e"), lit(1), col("plen")),
        s => s.getField("dim"))).as("dim"))
    val a = posted.select(col("format"), col("dim"), col("doc_id").as("d1"))
    val b = posted.select(col("format"), col("dim"), col("doc_id").as("d2"))
    a.join(b, Seq("format", "dim")).filter(col("d1") < col("d2"))
      .select("format", "d1", "d2")
      .dropDuplicates("format", "d1", "d2")
  }

  /** SQL-expressible decode stub: header fields + payload stats via hex
    * arithmetic (keeps binary at the edges as hex — SURVEY.md §7.4). */
  def decodeStatsSql(payload: Column): Seq[Column] = {
    val h = hex(payload)
    Seq(
      conv(substring(h, 1, 4), 16, 10).cast("int").as("dec_width"),
      conv(substring(h, 5, 4), 16, 10).cast("int").as("dec_height"),
      octet_length(payload).as("byte_len"),
      conv(substring(h, 9, 2), 16, 10).cast("long").as("first_body_byte"))
  }

  /** Resize STUB — the metadata/byte plumbing of an image resize without
    * a codec: halve the header dims and keep a proportional prefix of the
    * body (quarter of the "pixels" for a 2x downscale). A real codec
    * drops into the body transform; header math and byte accounting are
    * the real, tested part. */
  def resizeStub(payload: Column, factor: Int): Column = {
    val w = conv(substring(hex(payload), 1, 4), 16, 10).cast("int")
    val h = conv(substring(hex(payload), 5, 4), 16, 10).cast("int")
    val newW = greatest(w / factor, lit(1)).cast("int")
    val newH = greatest(h / factor, lit(1)).cast("int")
    val bodyLen = octet_length(payload) - headerLen
    // clamp to the actual body: substring cannot fabricate the guaranteed
    // byte on an empty body (keeps the DuckDB oracle arithmetic aligned)
    val keep = least(greatest(bodyLen / (factor * factor), lit(1)), bodyLen).cast("int")
    concat(
      unhex(concat(lpad(hex(newW), 4, "0"), lpad(hex(newH), 4, "0"))),
      substring(payload, lit(headerLen + 1), keep))
  }

  /** Frame-sample positions for a video-like payload: every `stride` bytes
    * after the header, up to `maxFrames`. */
  def framePositions(payload: Column, stride: Int, maxFrames: Int): Column = {
    val n = least(((octet_length(payload) - headerLen) / stride).cast("int"),
      lit(maxFrames))
    when(n <= 0, array().cast("array<int>"))
      .otherwise(transform(sequence(lit(0), n - 1), i => lit(headerLen) + i * stride))
  }

  /** Average-hash (aHash) of the first `nBits` body bytes: bit i is set
    * iff body byte i exceeds the truncated-mean body byte — the standard
    * integer perceptual-hash family (aHash/dHash), computed on the stub
    * "decoded pixels" (payload body bytes) since no codec ships in this
    * container. Pure integer arithmetic end to end (sum, floor-div mean,
    * compare), so both engines agree bit-for-bit; 60 bits keeps the
    * signature inside the repo's portable 60-bit hash width. NULL (and
    * later dropped) for bodies under 8 bytes — too short to carry a
    * stable signature. One pure projection per row: the whole signature
    * build pipelines inside the scan at any scale. */
  def ahash(payload: Column, nBits: Int): Column = {
    // lower bound 8, not 1: bodyGrams caps at nBits bytes and the n < 8
    // short-body rule below would then null EVERY signature — a silent
    // "no near-dups anywhere" instead of an error
    require(nBits >= 8 && nBits <= 60, s"nBits must be in [8, 60], got $nBits")
    val bytes = bodyGrams(payload, nBits, 1)
    element_at(transform(array(struct(bytes.as("bs"))), s => {
      val bs = s.getField("bs")
      val n = size(bs)
      val sm = aggregate(bs, lit(0L), _ + _)
      // truncated mean: floor division is exact — sm ≤ 60·255 and n ≤ 60,
      // so the double quotient can never round across an integer
      val mean = floor(sm / n).cast("long")
      when(n < 8, lit(null).cast("long")).otherwise(
        aggregate(
          zip_with(bs, sequence(lit(0), n - 1),
            // 2^i exact in double for i ≤ 59 (a power of two), so the
            // cast back to long is lossless (shiftleft takes only a
            // literal Int shift, not a per-element column)
            (b, i) => when(b > mean, pow(lit(2.0), i).cast("long"))
              .otherwise(lit(0L))),
          lit(0L), _ + _))
    }), 1)
  }

  /** 8×8 DCT-II basis in 2¹⁴ fixed point: T(u)(x) = round(2¹⁴ · c(u) ·
    * cos((2x+1)uπ/16)). Generated ONCE here and interpolated as integer
    * literals into the DuckDB oracle, so the irrational cosines are
    * never recomputed anywhere — the same published-table discipline as
    * the Benford ladder. */
  val dctTableFp: Array[Array[Long]] = Array.tabulate(8, 8) { (u, x) =>
    val c = if (u == 0) math.sqrt(1.0 / 8) else math.sqrt(2.0 / 8)
    math.round(16384.0 * c * math.cos((2 * x + 1) * u * math.Pi / 16))
  }

  /** Row-level pHash kernel: the whole 8×8 DCT + median + bit pack in
    * one pass over the payload bytes — the relational formulation
    * ([[phashSigRelational]]) pushes ~1k intermediate rows per doc through two
    * groupBys; this is a projection. Arithmetic is IDENTICAL (same
    * fixed-point table, same lower-median ordering by (coefficient,
    * index), same strict > compare), spec-cross-checked per doc and
    * still hash-gated by the relational DuckDB oracle. */
  private[graft] def phashKernel(payload: Array[Byte]): java.lang.Long = {
    if (payload == null || payload.length - 4 < 64) return null
    val t = dctTableFp
    val p = Array.ofDim[Long](8, 8)
    var x = 0
    while (x < 8) {
      var y = 0
      while (y < 8) { p(x)(y) = (payload(4 + 8 * x + y) & 0xff).toLong; y += 1 }
      x += 1
    }
    val m = Array.ofDim[Long](8, 8) // m(u)(y) = Σ_x t(u)(x)·p(x)(y)
    var u = 0
    while (u < 8) {
      var y = 0
      while (y < 8) {
        var acc = 0L; var i = 0
        while (i < 8) { acc += t(u)(i) * p(i)(y); i += 1 }
        m(u)(y) = acc; y += 1
      }
      u += 1
    }
    // c(u)(v) = Σ_y m(u)(y)·t(v)(y); collect the 63 ACs as (cv, idx)
    val ac = new Array[(Long, Int)](63)
    var k = 0
    u = 0
    while (u < 8) {
      var v = 0
      while (v < 8) {
        if (u != 0 || v != 0) {
          var acc = 0L; var i = 0
          while (i < 8) { acc += m(u)(i) * t(v)(i); i += 1 }
          ac(k) = (acc, u * 8 + v - 1); k += 1
        }
        v += 1
      }
      u += 1
    }
    val med = ac.sortBy(identity)(Ordering.Tuple2(Ordering.Long, Ordering.Int))
      .apply(31)._1 // lower median of 63 = rank 32
    var hash = 0L
    ac.foreach { case (cv, idx) => if (cv > med) hash |= (1L << idx) }
    hash
  }

  private val phashUdf =
    org.apache.spark.sql.functions.udf(
      (b: Array[Byte]) => Option(phashKernel(b)).map(Long2long))

  /** pHash near-dup: the DCT perceptual hash (the robust sibling of
    * [[ahashNearDup]] — aHash flips bits under any brightness shift,
    * pHash compares DCT coefficients against their own median, so it is
    * invariant to monotone intensity changes and keys on STRUCTURE).
    * The first 64 body bytes form the 8×8 "pixel" block (decode is the
    * documented stub everywhere in this module); the signature comes
    * from the one-pass [[phashKernel]] (integer DCT in 2¹⁴ fixed point,
    * coefficient magnitudes ≤ 255·64·2²⁸ ≈ 4.4e12 — inside BIGINT; bit
    * i = [AC coefficient i > the lower median of all 63 ACs], DC
    * excluded since it is the block mean aHash already keys on); the
    * relational (doc, u, v)-grain twin the oracle replays lives in
    * [[phashSigRelational]]. Candidate pairs ride the same Hamming
    * pigeonhole segments as SimHash/aHash. The length pre-filter below
    * is the kernel's exact null condition — filtering on the UDF output
    * instead would let predicate pushdown re-evaluate the whole DCT per
    * row (Project + Filter both running the kernel). */
  def phashNearDup(media: DataFrame, maxHamming: Int): DataFrame = {
    val sig = media
      .filter(col("payload").isNotNull &&
        org.apache.spark.sql.functions.octet_length(col("payload")) >= 68)
      .select(col("doc_id"), phashUdf(col("payload")).as("simhash"))
      .repartition(col("doc_id"))
    Dedup.hammingPairs(sig, maxHamming, 63)
      .select(col("d1"), col("d2"), col("hamming"))
  }

  /** The relational (doc, u, v)-grain signature pipeline — the form the
    * DuckDB oracle replays CTE-for-CTE; kept as the reference
    * implementation [[phashKernel]] is spec-checked against. */
  private[graft] def phashSigRelational(media: DataFrame): DataFrame = {
    val spark = media.sparkSession
    val tRows = for { u <- 0 until 8; x <- 0 until 8 }
      yield (u, x, dctTableFp(u)(x))
    import spark.implicits._
    val tdf = tRows.toDF("u", "x", "t")
    val px = media
      .select(col("doc_id"), bodyGrams(col("payload"), 64, 1).as("bs"))
      .filter(size(col("bs")) === 64)
      .select(col("doc_id"), posexplode(col("bs")))
      .select(col("doc_id"), expr("CAST(pos div 8 AS INT)").as("x"),
        expr("CAST(pos % 8 AS INT)").as("y"), col("col").as("p"))
    val m = px.join(broadcast(tdf), "x")
      .groupBy(col("doc_id"), col("u"), col("y"))
      .agg(sum(col("t") * col("p")).as("mv"))
    val c = m.join(broadcast(tdf.toDF("v", "y", "t2")), "y")
      .groupBy(col("doc_id"), col("u"), col("v"))
      .agg(sum(col("mv") * col("t2")).as("cv"))
    val ac = c.filter(!(col("u") === 0 && col("v") === 0))
      .withColumn("idx", (col("u") * 8 + col("v") - 1).cast("int"))
    // lower median of the 63 ACs: rank within the per-doc 63-row group
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("doc_id")).orderBy(col("cv"), col("idx"))
    val med = ac.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 32)
      .select(col("doc_id"), col("cv").as("med"))
    ac.join(med, "doc_id")
      .groupBy(col("doc_id"))
      .agg(sum(when(col("cv") > col("med"),
        // 2^idx exact in double for idx ≤ 62 (powers of two), lossless cast
        expr("CAST(pow(2.0, idx) AS BIGINT)")).otherwise(0L)).as("simhash"))
  }

  /** Multimodal near-dup via aHash + Hamming pigeonhole: signature is
    * [[ahash]] per payload, candidate pairs come from
    * [[Dedup.hammingPairs]]' segment equi-join (complete by the
    * pigeonhole argument, never an all-pairs scan), verified with the
    * exact Hamming distance. The byte-level twin of the trigram-prefix
    * [[nearDupSignatures]] path: aHash degrades gracefully under small
    * local edits (one changed byte flips at most one bit plus the mean),
    * where the set-based trigram signature is blind to byte ORDER. */
  def ahashNearDup(media: DataFrame, maxHamming: Int, nBits: Int): DataFrame = {
    val sig = media
      .select(col("doc_id"), ahash(col("payload"), nBits).as("simhash"))
      .filter(col("simhash").isNotNull)
      .repartition(col("doc_id"))
    Dedup.hammingPairs(sig, maxHamming, nBits)
      .select(col("d1"), col("d2"), col("hamming"))
  }

  /** Batched decode over partitions — the `mapInPandas` analogue. Batches
    * of `batchSize` records are handed to `decodeBatch`, which a real
    * implementation would replace with a vectorized codec call (its
    * per-batch cost is what the batching amortizes). Runs fully
    * distributed; no driver collection. */
  def decodeBatched(media: Dataset[MediaRecord], batchSize: Int = 64)
                   (implicit spark: SparkSession): Dataset[DecodedMedia] = {
    import spark.implicits._
    media.mapPartitions { it =>
      it.grouped(batchSize).flatMap(decodeBatch)
    }
  }

  /** STUB decoder — a real system would call an image/audio codec here.
    * Parses the synthetic big-endian dims header and computes a stand-in
    * "pixel statistic" from the first 16 body bytes. Deterministic. */
  private[corpus] def decodeBatch(batch: Seq[MediaRecord]): Seq[DecodedMedia] =
    batch.map { m =>
      val b = m.payload
      // a truncated payload yields a zero-dims stub row, not an
      // ArrayIndexOutOfBounds that kills the whole partition after
      // retries — one bad ingest row must not poison the batch
      if (b == null || b.length < headerLen)
        DecodedMedia(m.doc_id, m.format, 0, 0,
          if (b == null) 0L else b.length.toLong, 0.0, 0)
      else {
      val width = ((b(0) & 0xff) << 8) | (b(1) & 0xff)
      val height = ((b(2) & 0xff) << 8) | (b(3) & 0xff)
      // index into the payload directly — drop()/take() would copy the
      // whole (potentially large) media body per record just to average
      // at most 16 bytes, doubling allocation in the batched hot loop
      val n = math.min(16, b.length - headerLen)
      var sum = 0L
      var i = 0
      while (i < n) { sum += (b(headerLen + i) & 0xff); i += 1 }
      val mean = if (n == 0) 0.0 else sum.toDouble / n
      DecodedMedia(m.doc_id, m.format, width, height, b.length.toLong, mean,
        n_frames = math.min((b.length - headerLen) / 64, 8))
      }
    }
}
