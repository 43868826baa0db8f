package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming ingest deduplication (SURVEY.md §2.9 / phase F): the
 * streaming twin of the batch `Dedup.incrementalPairs` admission step.
 * New documents arrive as a stream; the existing corpus is a STATIC
 * digest table. A stream-static LEFT ANTI join admits only texts the
 * store has never seen — the one streaming join flavor the surface was
 * missing (attribution is stream-stream, rollups are windowed aggs,
 * sessionize/funnel are stateful maps).
 *
 * Why this shape survives 100 TB of store: the static side is a
 * digest-only projection (16 bytes/doc), re-read per micro-batch but
 * prunable and broadcast-able when the store's digest table is small;
 * at billions of docs the same join degrades gracefully to a
 * shuffled-hash anti-join keyed by digest. No streaming state is kept at
 * all — admission is stateless given the store snapshot, unlike
 * `dropDuplicatesWithinWatermark`, which guards WITHIN-stream replays.
 * Compose both: watermark-dedup the stream, anti-join the store.
 */
object IngestDedup {

  /** Digest-only projection of an existing corpus — what the static side
    * of the admission join actually reads (never the full text). */
  def storeDigests(store: DataFrame, textCol: String): DataFrame =
    store.select(md5(col(textCol)).as("digest")).distinct()

  /** Admit only stream rows whose exact text is absent from the store.
    * `digests` must be [[storeDigests]]-shaped (a `digest` column).
    * Append-mode safe: no aggregation, no watermark requirement. */
  def admit(stream: DataFrame, digests: DataFrame, textCol: String): DataFrame =
    stream.withColumn("digest", md5(col(textCol)))
      .join(digests, Seq("digest"), "left_anti")
      .drop("digest")
}
