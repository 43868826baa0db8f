package graft.corpus

import org.apache.spark.sql.{Column, Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/**
 * KMV (k-minimum-values) distinct-count sketch — the sketch family that
 * stays DETERMINISTIC across engines: the synopsis is the k smallest
 * portable hashes ([[TextAnalysis.hash60]]), so Spark and a DuckDB oracle
 * compute bit-identical estimates (unlike HLL, whose register layouts are
 * implementation-defined). Estimate: (k-1) / normalized kth-minimum;
 * groups with fewer than k distinct values report the exact count.
 *
 * Two forms:
 *  - a windowed SQL form in CorpusQueries (`sketch_kmv_distinct`) the
 *    oracle replays verbatim;
 *  - [[KmvAggregator]], a typed `Aggregator` (the UDAF surface,
 *    SURVEY.md §2.10) with an O(k) mergeable buffer — the shape that
 *    scales: partial sketches merge associatively, so a 100 TB
 *    distinct-count is one map-side-combined aggregation.
 */
object Sketches {

  val TwoPow60: Double = 1152921504606846976.0 // 2^60 as exact double

  def kmvEstimate(k: Int, kthMin: Long): Double =
    (k - 1).toDouble * TwoPow60 / kthMin.toDouble

  /** Typed KMV aggregator over pre-hashed values (longs in [0, 2^60)).
    * Buffer = sorted array of ≤ k distinct smallest hashes. */
  class KmvAggregator(k: Int) extends Aggregator[Long, Seq[Long], Double] {
    // k = 1 is degenerate: kmvEstimate(1, h) is (k-1)·2^60/h = 0 for any
    // h, and NaN (then a NumberFormatException in BigDecimal) when the
    // one retained hash is 0 — refuse at construction, not mid-job
    require(k >= 2, s"KMV needs k >= 2, got $k")
    override def zero: Seq[Long] = Seq.empty

    private def insert(buf: Seq[Long], h: Long): Seq[Long] =
      // fast path first: a full buffer rejects anything >= its max
      // without the O(k) distinctness scan — the overwhelmingly common
      // case once the sketch has converged
      if (buf.size >= k && h >= buf.last) buf
      else if (buf.contains(h)) buf
      else if (buf.size < k) (buf :+ h).sorted
      else (buf.init :+ h).sorted

    override def reduce(buf: Seq[Long], h: Long): Seq[Long] = insert(buf, h)

    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] =
      b.foldLeft(a)(insert)

    override def finish(buf: Seq[Long]): Double =
      if (buf.size < k) buf.size.toDouble
      else BigDecimal(kmvEstimate(k, buf.last))
        .setScale(6, BigDecimal.RoundingMode.HALF_UP).toDouble

    override def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
  }

  /** Column form: `kmvDistinct(64, hash60(col))` in a groupBy().agg(). */
  def kmvDistinct(k: Int, hash: Column): Column =
    org.apache.spark.sql.functions.udaf(new KmvAggregator(k)).apply(hash)

  /** Sketch-returning variant of [[KmvAggregator]]: same mergeable
    * buffer, but `finish` hands back the synopsis itself so set
    * operations can compose sketches AFTER aggregation. */
  class KmvSketchAggregator(k: Int) extends Aggregator[Long, Seq[Long], Seq[Long]] {
    private val inner = new KmvAggregator(k)
    override def zero: Seq[Long] = inner.zero
    override def reduce(buf: Seq[Long], h: Long): Seq[Long] = inner.reduce(buf, h)
    override def merge(a: Seq[Long], b: Seq[Long]): Seq[Long] = inner.merge(a, b)
    override def finish(buf: Seq[Long]): Seq[Long] = buf
    override def bufferEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  def kmvSketch(k: Int, hash: Column): Column =
    org.apache.spark.sql.functions.udaf(new KmvSketchAggregator(k)).apply(hash)

  // ---- set operations over sketch columns --------------------------
  // KMV's composability is the reason to pick it over HLL here: the k
  // smallest hashes of A ∪ B are computable from the two synopses alone,
  // and every step below is deterministic column algebra — Spark and the
  // DuckDB oracle agree bit-for-bit. (Standard KMV theory: Beyer et al.,
  // "On Synopses for Distinct-Value Estimation Under Multiset
  // Operations", SIGMOD 2007.)
  import org.apache.spark.sql.functions._

  /** k-min synopsis of the UNION of two sketches. */
  def kmvMerge(a: Column, b: Column, k: Int): Column =
    slice(array_sort(array_distinct(concat(a, b))), 1, k)

  /** Distinct-count estimate from a sketch array — exact below k. */
  def kmvEstimateCol(sk: Column, k: Int): Column =
    when(size(sk) < k, size(sk).cast("double"))
      .otherwise(round(lit((k - 1).toDouble * TwoPow60) /
        element_at(sk, lit(k)).cast("double"), 6))

  /** Intersection estimate: Jaccard fraction of the merged synopsis
    * present in BOTH input sketches, scaled by the union estimate. */
  def kmvIntersectEstimate(a: Column, b: Column, k: Int): Column = {
    val m = kmvMerge(a, b, k)
    val both = size(filter(m, h => array_contains(a, h) && array_contains(b, h)))
    when(size(m) === 0, 0.0).otherwise(
      round(both.cast("double") / size(m).cast("double") *
        kmvEstimateCol(m, k), 6))
  }

  // ---- Bloom filter / Count-Min sketch ------------------------------
  // Same determinism stance as KMV: the hash family is d salted portable
  // hashes ([[TextAnalysis.hash60Salted]]), so the sketch CONTENT — not
  // just its estimates — is bit-identical between Spark and a DuckDB
  // oracle. Each sketch has two forms kept value-equal by SketchesSpec:
  //  - an explode/groupBy SQL form the oracle replays (used by the
  //    oracle-gated queries);
  //  - a typed Aggregator with an O(sketch) mergeable buffer — the shape
  //    that scales: partial sketches OR/add-merge associatively, so a
  //    100 TB build is ONE map-side-combined aggregation pass.

  /** The d salted hash positions of a value in a width-m table —
    * the shared hash family of the Bloom and CMS sketches. A pure
    * codegen'd projection. */
  def saltedPositions(value: Column, d: Int, m: Int): Column =
    array((0 until d).map(i =>
      pmod(TextAnalysis.hash60Salted(i, value), lit(m.toLong)).cast("int")): _*)

  /** Bloom bitset over position arrays: buffer = m-bit set as m/64 words,
    * merge = bitwise OR. Input rows are [[saltedPositions]] arrays, so
    * the hashing stays in codegen and the aggregator is pure bit algebra. */
  class BloomAggregator(m: Int) extends Aggregator[Seq[Int], Array[Long], Seq[Long]] {
    private val words = (m + 63) / 64
    override def zero: Array[Long] = new Array[Long](words)
    override def reduce(buf: Array[Long], pos: Seq[Int]): Array[Long] = {
      pos.foreach(p => buf(p >>> 6) |= 1L << (p & 63))
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < words) { a(i) |= b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  def bloomAgg(m: Int, positions: Column): Column =
    org.apache.spark.sql.functions.udaf(new BloomAggregator(m)).apply(positions)

  /** Bits set in a bloom bitset column (array of 64-bit words). */
  def bloomBitsSet(bitset: Column): Column =
    aggregate(bitset, org.apache.spark.sql.functions.lit(0L),
      (acc, w) => acc + bit_count(w))

  /** Membership probe: ALL d positions set ⇒ "maybe present" (one-sided
    * error — never a false negative). Word/bit indices via bit algebra
    * (`/` on Spark columns is DOUBLE division); the variable-distance
    * shift goes through call_function — the SQL shiftleft accepts an
    * expression count, the Scala wrapper only a literal. */
  def bloomMightContain(bitset: Column, positions: Column): Column =
    forall(positions, p =>
      (element_at(bitset, (shiftright(p, 6) + 1).cast("int"))
        .bitwiseAND(call_function("shiftleft", lit(1L), p.bitwiseAND(lit(63))))) =!= 0L)

  /** Count-Min sketch over position arrays: buffer = d×w counter matrix
    * (row-major), merge = elementwise add. Point estimate = min over the
    * d rows at the value's positions — always an OVERestimate. */
  class CmsAggregator(d: Int, w: Int) extends Aggregator[Seq[Int], Array[Long], Seq[Long]] {
    override def zero: Array[Long] = new Array[Long](d * w)
    override def reduce(buf: Array[Long], pos: Seq[Int]): Array[Long] = {
      var i = 0
      while (i < d) { buf(i * w + pos(i)) += 1L; i += 1 }
      buf
    }
    override def merge(a: Array[Long], b: Array[Long]): Array[Long] = {
      var i = 0
      while (i < a.length) { a(i) += b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Long]): Seq[Long] = buf.toSeq
    override def bufferEncoder: Encoder[Array[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
    override def outputEncoder: Encoder[Seq[Long]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  def cmsAgg(d: Int, w: Int, positions: Column): Column =
    org.apache.spark.sql.functions.udaf(new CmsAggregator(d, w)).apply(positions)

  /** CMS point estimate for a value's [[saltedPositions]] array against a
    * row-major d×w sketch column. */
  def cmsEstimate(sketch: Column, positions: Column, d: Int, w: Int): Column =
    (0 until d).map(i =>
        element_at(sketch, lit(i * w) + element_at(positions, i + 1) + 1))
      .reduce(least(_, _))

  // ---- HyperLogLog ---------------------------------------------------
  // The "implementation-defined register layout" objection above applies
  // to LIBRARY HLLs (Spark's approx_count_distinct, DuckDB's approx sketch
  // — different hash families, incomparable synopses). A from-scratch HLL
  // over the shared portable hash IS cross-engine deterministic, because
  // every step is integer algebra both engines express identically:
  //  - register index = top p bits of the 60-bit hash;
  //  - rho = leading-zero rank of the remaining 60-p bits
  //    (SQL twin: `length(bin(w))` = floor(log2 w)+1 — both engines'
  //    `bin()` prints without leading zeros);
  //  - the harmonic denominator Σ 2^-M_j is summed as INTEGERS:
  //    Σ 2^(rhoMax-M_j) ≤ m·2^rhoMax fits a long at p=6 (64·2^55 < 2^62),
  //    so there is no float pow()/ulp hazard anywhere — one double
  //    division at the very end, of a Scala-printed literal numerator by
  //    an exact integer (Flajolet et al., AofA 2007, "HyperLogLog: the
  //    analysis of a near-optimal cardinality estimation algorithm").
  //  - the small-range (linear-counting) branch needs ln, whose last ulp
  //    can differ between the JVM intrinsic and libm — so the correction
  //    values m·ln(m/V), V∈[1,m], are baked as a 6-decimal LITERAL table
  //    generated once in Scala and inlined into both engines' queries.
  // Scale shape: the classic one. Registers = m bytes, merge = elementwise
  // max (associative, commutative, idempotent) → a 100 TB distinct-count
  // is one map-side-combined pass over 64-byte buffers, and per-partition
  // sketches union for free ([[hllMerge]]), same algebra as KMV.

  /** Register-index bits. m = 2^p = 64 registers → σ ≈ 1.04/√64 = 13%. */
  val HllP: Int = 6
  val HllM: Int = 1 << HllP
  private val hllSuffixBits = 60 - HllP // rho ∈ [1, suffixBits+1]
  private val hllSuffixMask = (1L << hllSuffixBits) - 1
  /** α_64 · m² · 2^(suffixBits+1): the whole estimate numerator as ONE
    * Scala-computed double literal, so neither engine multiplies floats. */
  private val hllAlpha = 0.709 // α_m for m = 64 (Flajolet et al., Fig. 3)
  val HllNumerator: Double =
    hllAlpha * HllM * HllM * (1L << (hllSuffixBits + 1)).toDouble
  /** Linear-counting table: m·ln(m/V) for V = 1..m zero registers, fixed
    * to 6 decimals so the literal IS the result on both engines. */
  val HllLinearCounting: IndexedSeq[BigDecimal] =
    (1 to HllM).map(v => BigDecimal(HllM * math.log(HllM.toDouble / v))
      .setScale(6, BigDecimal.RoundingMode.HALF_UP))

  /** (register, rho) of a 60-bit portable hash — pure codegen projection.
    * SQL twin emitted by [[hllRegRhoSql]]. */
  def hllRegister(hash: Column): Column = shiftright(hash, hllSuffixBits)
  def hllRho(hash: Column): Column = {
    val w = hash.bitwiseAND(lit(hllSuffixMask))
    when(w === 0L, lit(hllSuffixBits + 1))
      .otherwise(lit(hllSuffixBits + 1) - length(bin(w)))
  }

  /** The same (register, rho) pair in the Java∩DuckDB SQL subset. */
  def hllRegRhoSql(hashExpr: String): (String, String) = (
    s"($hashExpr >> $hllSuffixBits)",
    s"(CASE WHEN ($hashExpr & $hllSuffixMask) = 0 THEN ${hllSuffixBits + 1} " +
      s"ELSE ${hllSuffixBits + 1} - length(bin($hashExpr & $hllSuffixMask)) END)")

  /** Estimate from (zero-register count V, integer denominator Σ 2^(rhoMax-M)):
    * linear counting below the 2.5m small-range threshold, raw HLL above.
    * `denomInt` already includes V·2^rhoMax for the empty registers. */
  def hllEstimateCol(zeroRegs: Column, denomInt: Column): Column = {
    val raw = round(lit(HllNumerator) / denomInt.cast("double"), 6)
    val lc = HllLinearCounting.zipWithIndex.foldLeft(lit(0.0)) {
      case (acc, (c, i)) => when(zeroRegs === (i + 1), lit(c.toDouble)).otherwise(acc)
    }
    when(zeroRegs > 0 && raw <= lit(2.5 * HllM), lc).otherwise(raw)
  }

  /** Per-register denominator term 2^(rhoMax - maxRho) as an exact long
    * (empty registers contribute [[HllEmptyTerm]] = 2^rhoMax each). */
  def hllDenomTerm(maxRho: Column): Column =
    call_function("shiftleft", lit(1L), lit(hllSuffixBits + 1) - maxRho)
  val HllEmptyTerm: Long = 1L << (hllSuffixBits + 1)

  /** SQL twin of [[hllDenomTerm]]. */
  def hllDenomTermSql(maxRhoExpr: String): String =
    s"(CAST(1 AS BIGINT) << (${hllSuffixBits + 1} - $maxRhoExpr))"

  /** The full estimate in the shared Java∩DuckDB SQL subset — same
    * branches and the same Scala-printed literals as [[hllEstimateCol]]:
    * one source of truth across engines. String-cast literals keep DuckDB
    * from routing anything through DECIMAL intermediates (rule 3 in
    * SURVEY §8.3). */
  def hllEstimateSql(zeroExpr: String, denomExpr: String): String = {
    val num = s"CAST('${BigDecimal(HllNumerator).underlying.toPlainString}' AS DOUBLE)"
    val raw = s"round($num / CAST($denomExpr AS DOUBLE), 6)"
    val lc = HllLinearCounting.zipWithIndex
      .map { case (c, i) => s"WHEN ${i + 1} THEN CAST('${c.toString}' AS DOUBLE)" }
      .mkString(s"CASE $zeroExpr ", " ", " ELSE CAST(0 AS DOUBLE) END")
    s"CASE WHEN $zeroExpr > 0 AND $raw <= CAST('160' AS DOUBLE) THEN $lc ELSE $raw END"
  }

  /** Sketch-returning HLL aggregator over pre-hashed longs: buffer = m
    * max-merged rho bytes. The UDAF surface; value-equal to the SQL
    * register form (SketchesSpec). */
  class HllSketchAggregator extends Aggregator[Long, Array[Byte], Seq[Int]] {
    override def zero: Array[Byte] = new Array[Byte](HllM)
    override def reduce(buf: Array[Byte], h: Long): Array[Byte] = {
      val reg = (h >>> hllSuffixBits).toInt
      val w = h & hllSuffixMask
      val rho =
        if (w == 0L) hllSuffixBits + 1
        else java.lang.Long.numberOfLeadingZeros(w) - (64 - hllSuffixBits) + 1
      if (rho > buf(reg)) buf(reg) = rho.toByte
      buf
    }
    override def merge(a: Array[Byte], b: Array[Byte]): Array[Byte] = {
      var i = 0
      while (i < HllM) { if (b(i) > a(i)) a(i) = b(i); i += 1 }
      a
    }
    override def finish(buf: Array[Byte]): Seq[Int] = buf.map(_.toInt).toSeq
    override def bufferEncoder: Encoder[Array[Byte]] = Encoders.BINARY
    override def outputEncoder: Encoder[Seq[Int]] =
      org.apache.spark.sql.catalyst.encoders.ExpressionEncoder()
  }

  def hllSketch(hash: Column): Column =
    org.apache.spark.sql.functions.udaf(new HllSketchAggregator).apply(hash)

  /** Union of two register arrays — elementwise max, the HLL set algebra. */
  def hllMerge(a: Column, b: Column): Column = zip_with(a, b, (x, y) => greatest(x, y))

  /** Estimate from a register-array column: integer denominator
    * Σ 2^(rhoMax-M) (exact long fold), then [[hllEstimateCol]]. */
  def hllSketchEstimate(regs: Column): Column = {
    val zeros = size(filter(regs, _ === 0))
    val denom = aggregate(regs, lit(0L), (acc, m) => acc + hllDenomTerm(m))
    hllEstimateCol(zeros, denom)
  }

  /** Log₂-bucket histogram quantile sketch — the QUANTILE member of the
    * deterministic sketch family (Bloom/CMS/KMV/HLL above): per key,
    * bucket positive values by floor(log₂ v) = length(bin(v)) − 1
    * (integer-exact on both engines), keep counts, and estimate the
    * q-quantile by linear interpolation inside the covering bucket —
    * est = 2^b + ((rank_in_bucket · 2^b) div n_b), all integer algebra,
    * so a DuckDB oracle replays it bit-for-bit. Relative error is
    * bounded by the bucket ratio (≤2×, typically far less), the classic
    * log-histogram trade (HdrHistogram-style, at power-of-two
    * resolution).
    *
    * Why this beats exact quantiles at 100 TB: `percentile`/sort-based
    * quantiles shuffle every VALUE; this sketch's state is ≤64 counters
    * per key, built by one map-side-combined aggregation, and partial
    * histograms merge by ADDITION — the same mergeable-synopsis shape
    * as the other sketches (and what a streaming twin would carry as
    * state). The quantile extraction afterwards runs on the tiny
    * histogram, not the data.
    *
    * `quantiles`: (label, numerator, denominator) — rank = ⌈N·num/den⌉.
    * Returns (key, q, n_total, est). */
  def logHistQuantiles(df: org.apache.spark.sql.DataFrame, keyCol: String,
                       valCol: String,
                       quantiles: Seq[(String, Int, Int)])
      : org.apache.spark.sql.DataFrame = {
    val spark = df.sparkSession
    import org.apache.spark.sql.expressions.Window
    import spark.implicits._
    // every working column is underscore-prefixed (the file-wide _v/_est
    // convention): a bare `b`/`n`/`cum`/`total`/`need`/`lo` would
    // collide with a user keyCol of the same name and resolve
    // ambiguously. The OUTPUT names (q, n_total, est) are reserved —
    // and so is the whole underscore prefix: a keyCol named _v, _b,
    // _cum (…) would collide with the working columns exactly the same
    // way, so reject any leading-underscore key rather than enumerate.
    require(!Set("q", "n_total", "est").contains(keyCol),
      s"logHistQuantiles: keyCol '$keyCol' collides with an output column")
    require(!keyCol.startsWith("_"),
      s"logHistQuantiles: keyCol '$keyCol' collides with the reserved " +
        "underscore-prefixed working columns — rename the key")
    val pos = df.filter(col(valCol) > 0)
      .select(col(keyCol), col(valCol).cast("long").as("_v"))
    val hist = pos
      .groupBy(col(keyCol), (length(bin(col("_v"))) - 1).as("_b"))
      .agg(count(lit(1)).as("_n"))
    val byKey = Window.partitionBy(col(keyCol))
    val cum = hist
      .withColumn("_cum", sum(col("_n")).over(byKey.orderBy(col("_b"))))
      .withColumn("_total", sum(col("_n")).over(byKey))
    val qdf = quantiles.toDF("q", "_qnum", "_qden")
    cum.crossJoin(broadcast(qdf))
      .withColumn("_need", expr("(_total * _qnum + _qden - 1) div _qden"))
      .filter(col("_cum") >= col("_need"))
      .withColumn("_lo", expr("shiftleft(cast(1 as bigint), cast(_b as int))"))
      .withColumn("_est",
        col("_lo") + expr("((_need - (_cum - _n)) * _lo) div _n"))
      .groupBy(col(keyCol), col("q"))
      .agg(min(col("_total")).as("n_total"),
        min_by(col("_est"), col("_b")).as("est"))
  }
}
