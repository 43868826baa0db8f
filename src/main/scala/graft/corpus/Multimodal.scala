package graft.corpus

import org.apache.spark.sql.{Column, DataFrame, Dataset, SparkSession}
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
    * are constructible in the DuckDB oracle (from_hex || encode). */
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

  /** Body-byte nibbles of the first `maxBytes` payload bytes as one-char
    * hex strings — `low=false` gives the high nibble (coarse byte class),
    * `low=true` the low nibble (fine content signature). The hex string
    * binds ONCE as a lambda variable (interpreted HOFs do no CSE —
    * inlined, the hex would re-run per nibble). */
  def bodyNibbles(payload: Column, maxBytes: Int, low: Boolean): Column = {
    val h = substring(hex(payload), 9, maxBytes * 2) // body starts after 4-byte header
    val nFull = least((octet_length(payload) - 4).cast("int"), lit(maxBytes))
    val off = if (low) 2 else 1
    element_at(transform(array(struct(h.as("h"), nFull.as("n"))), s => {
      val hh = s.getField("h")
      val n = s.getField("n")
      when(n <= 0, array().cast("array<string>"))
        .otherwise(transform(sequence(lit(0), n - 1), i =>
          substring(hh, i * lit(2) + off, lit(1))))
    }), 1)
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
      val width = ((b(0) & 0xff) << 8) | (b(1) & 0xff)
      val height = ((b(2) & 0xff) << 8) | (b(3) & 0xff)
      val body = b.drop(headerLen)
      val n = math.min(16, body.length)
      val mean = if (n == 0) 0.0
        else body.take(n).map(_ & 0xff).sum.toDouble / n
      DecodedMedia(m.doc_id, m.format, width, height, b.length.toLong, mean,
        n_frames = math.min((b.length - headerLen) / 64, 8))
    }
}
