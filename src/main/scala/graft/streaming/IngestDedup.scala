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
    * Append-mode safe: no aggregation, no watermark requirement. The
    * join key rides an underscore-prefixed internal column so a
    * caller's own `digest` column (a natural name on crawl pipelines)
    * passes through untouched instead of being clobbered and dropped —
    * and the internal name itself is suffixed until absent from the
    * caller's columns, so even a frame that already carries
    * `_graft_digest` (this same collision class, one name over) cannot
    * be clobbered. */
  def admit(stream: DataFrame, digests: DataFrame, textCol: String): DataFrame = {
    val tmp = Iterator.from(0)
      .map(i => if (i == 0) "_graft_digest" else s"_graft_digest_$i")
      .find(n => !stream.columns.contains(n)).get
    stream.withColumn(tmp, md5(col(textCol)))
      .join(digests.withColumnRenamed("digest", tmp), Seq(tmp), "left_anti")
      .drop(tmp)
  }

  /** The digest store as a growing parquet directory of per-batch
    * partitions (`batch=<id>/`) — the read side of [[admitLoop]]'s
    * append. Absent/empty store → an empty digest frame (first ingest
    * admits everything). `excludeBatch` drops ONE batch partition from
    * the view: [[admitLoop]] passes its own batch id so a REPLAYED batch
    * never sees the digests its previous (possibly partial) attempt
    * recorded — without the exclusion, replay would self-refuse every
    * row and overwrite its corpus partition with nothing (data loss
    * exactly when the engine is trying to recover it). */
  private val digestSchema = org.apache.spark.sql.types.StructType(Seq(
    org.apache.spark.sql.types.StructField("digest",
      org.apache.spark.sql.types.StringType)))

  def storeDirDigests(spark: org.apache.spark.sql.SparkSession,
                      digestDir: String,
                      excludeBatch: Option[Long] = None): DataFrame =
    BatchStore.read(spark, digestDir, digestSchema, excludeBatch)

  /** The CLOSED ingest loop as a foreachBatch sink: each micro-batch is
    * admitted against the digest store AS OF batch start, the admitted
    * docs land in the corpus, and their digests append to the store —
    * so the NEXT batch refuses anything this batch admitted. Both writes
    * go to per-batch directories (`batch=<id>/`) with overwrite: a
    * replayed batch overwrites itself instead of duplicating — the
    * filesystem-native form of [[EventStream.jdbcIdempotentAppend]]'s
    * delete-by-batch-id discipline (exactly-once at the sink under the
    * engine's at-least-once replay). Digests are re-projected from the
    * just-committed corpus partition, not the in-flight frame, so the
    * store can never record a digest whose doc failed to land.
    *
    * Returns ONE closure per call — the loop instance. The DIGEST
    * sidecar (not the user-facing corpus) is compacted in batch count
    * (see [[BatchStore]]'s run layout: without it every admission
    * re-discovers one batch=<id> dir per historical micro-batch,
    * O(store-age) listing round-trips forever), and the closure carries
    * a [[BatchStore.Maintainer]] census across batches: under the
    * single-writer contract a batch that cannot trigger compaction pays
    * ZERO store-discovery filesystem calls — the census, the ahead
    * guards and the digest read's source set are all carried, and the
    * chain self-breaks (full census) on any replay, restart, failed
    * batch or id jump. The flip side: a VIOLATED contract (a second
    * writer, an external job mutating the store mid-stream) goes
    * undetected for up to `compactEvery` batches — until the next
    * trigger census or restart — where pre-warm-chain code failed on
    * the next batch; lower `compactEvery` for a tighter
    * violation-detection window. */
  def admitLoop(textCol: String, digestDir: String, corpusDir: String,
                compactEvery: Int = BatchStore.defaultCompactEvery)
      : (DataFrame, Long) => Unit = {
    var m: BatchStore.Maintainer = null
    var g: CorpusManifest.Guard = null
    (batch: DataFrame, batchId: Long) => {
      val spark = batch.sparkSession
      if (m == null) {
        m = new BatchStore.Maintainer(
          BatchStore.dirOps(spark, digestDir, digestSchema, "ingest digest"),
          compactEvery)
        g = new CorpusManifest.Guard(spark, corpusDir, "ingest", compactEvery)
      }
      val warm = m.wouldSkip(batchId)
      // a restarted checkpoint over an existing store would re-number
      // batches from 0 and overwrite old partitions one by one — refused
      // by the manifest's ahead fence (and the digest store's twin fence
      // inside maintainStore). Cold path work only: in-process the loop
      // is the only writer and ids are monotonic, so the signatures can
      // only appear across a restart, which arrives cold.
      val corpusRanges = g.maintain(batchId)
      val sources = m.maintain(batchId)
      if (!warm) {
        // a digest store that silently lags the corpus (deleted or
        // truncated sidecar) would re-admit every exact duplicate — a
        // degrading dedup invariant must be an error, not a quiet
        // corpus of copies. Pure driver interval math vs the manifest.
        val missing = BatchStore.uncoveredIds(corpusRanges, sources, batchId)
        require(missing.isEmpty,
          s"ingest corpus at $corpusDir has admitted batches with no " +
            s"digest sidecar (${missing.render}" +
            "); admitting against an incomplete digest store would " +
            "silently re-admit exact duplicates — rebuild the digest " +
            "store (md5 over each corpus batch) or start a fresh store")
      }
      val admitted = admit(batch,
        BatchStore.readFrom(spark, digestDir, digestSchema, sources), textCol)
      admitted.write.mode("overwrite").parquet(s"$corpusDir/batch=$batchId")
      g.append(batchId)
      // explicit schema: an all-refused batch leaves a partless directory,
      // which schema inference would reject but a schema'd read treats as
      // the empty frame it is
      spark.read.schema(admitted.schema).parquet(s"$corpusDir/batch=$batchId")
        .select(md5(col(textCol)).as("digest")).distinct()
        .write.mode("overwrite").parquet(s"$digestDir/batch=$batchId")
      m.completed(batchId)
      g.completed(batchId)
    }
  }
}
