package graft.streaming

import graft.corpus.VectorExpr
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming SEMANTIC-duplicate admission — the embedding-cosine member
 * of the ingest-dedup matrix ([[IngestDedup]] refuses byte-exact texts,
 * [[NearDupIngest]] shingle-Jaccard near-duplicates; this refuses
 * vectors whose cosine to ANY admitted vector reaches the threshold —
 * a paraphrase shares no shingles but lands next to its source in
 * embedding space).
 *
 * THE STORE STREAMS ONCE PER BATCH AND THE BATCH RIDES ALONG AS A
 * CODEGEN REFERENCE OBJECT: admission scans the admitted-vector store
 * with the arriving batch as the kernel's eval matrix
 * ([[VectorExpr.semHitIdsF]] — the [[graft.corpus.Similarity
 * .semanticContamination]] shape), emitting the indices of batch
 * vectors that hit. No join rows materialize (the broadcast
 * nested-loop form measured ~50× slower at the 500k probe for the
 * contamination twin), no shuffle — one fused projection over the
 * store, then a driver-side index union (bounded by the BATCH size).
 * Per-batch cost is O(store·batchDim) compute on a single pass; at
 * 100 TB the production refinement is an IVF/SQ8-pruned candidate scan
 * re-verified with exact cosine — the admission CONTRACT (exact
 * rounded-cosine threshold vs the store as of batch start) stays the
 * one thing the oracle replays.
 *
 * Replay discipline mirrors [[IngestDedup.admitLoop]]: admission is
 * judged against the store AS OF batch start (within-batch semantic
 * dups all admit), per-batch directories overwrite on replay, a
 * replayed batch excludes its own previous partition, and a restarted
 * checkpoint re-numbering batches from 0 is refused.
 */
object SemDedupIngest {

  /** Admitted-vector store (BatchStore `batch=<id>/` layout). */
  def storeVectors(spark: org.apache.spark.sql.SparkSession, corpusDir: String,
                   schema: org.apache.spark.sql.types.StructType,
                   excludeBatch: Option[Long] = None): DataFrame =
    BatchStore.read(spark, corpusDir, schema, excludeBatch)

  /** Batch rows with NO stored vector at rounded cosine ≥ `threshold`.
    * The batch is collected (hard-capped — micro-batches are bounded by
    * construction; the cap is the loud fence against a misconfigured
    * trigger) and scanned against the store as the kernel's eval
    * matrix. Zero-norm batch vectors admit (cosine undefined ⇒ no hit —
    * the shared NaN⇒no-hit contract); zero-norm STORE vectors refuse
    * nothing for the same reason. */
  def admitAgainstStore(store: DataFrame, batch: DataFrame, idCol: String,
                        vecCol: String, threshold: Double,
                        maxBatch: Int = 1 << 20): DataFrame = {
    val rows = batch.select(col(idCol).cast("long"), col(vecCol))
      .filter(col(vecCol).isNotNull).collect()
    require(rows.length <= maxBatch,
      s"micro-batch has ${rows.length} vectors — beyond the $maxBatch " +
        "driver-resident cap; shrink the trigger or raise the cap")
    if (rows.isEmpty) return batch
    val ids: Array[Long] = rows.map(_.getLong(0))
    val evs: Array[Array[Float]] = rows.map(_.getSeq[Float](1).toArray)
    // one fused pass over the store: per store row, the indices of batch
    // vectors at ≥ threshold (usually empty) — exploded and distinct'd,
    // the result is bounded by the batch size
    val hitIdx = store
      .select(explode(VectorExpr.semHitIdsF(col(vecCol), evs, threshold))
        .as("_idx"))
      .distinct().collect().map(_.getInt(0))
    val refused = hitIdx.map(ids(_)).toSet
    if (refused.isEmpty) batch
    else {
      val refusedDf = batch.sparkSession
        .createDataFrame(
          batch.sparkSession.sparkContext
            .parallelize(refused.toSeq.map(org.apache.spark.sql.Row(_)), 1),
          org.apache.spark.sql.types.StructType(Seq(
            org.apache.spark.sql.types.StructField(idCol,
              org.apache.spark.sql.types.LongType))))
      batch.join(broadcast(refusedDf), Seq(idCol), "left_anti")
    }
  }

  /** The closed loop as a foreachBatch sink — same exactly-once-at-the-
    * sink discipline as the exact and near-dup loops. */
  def admitLoop(idCol: String, vecCol: String, threshold: Double,
                corpusDir: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    BatchStore.requireNotAhead(spark, corpusDir, batchId, "semantic corpus")
    val store = storeVectors(spark, corpusDir, batch.schema,
      excludeBatch = Some(batchId))
    admitAgainstStore(store, batch, idCol, vecCol, threshold)
      .write.mode("overwrite").parquet(s"$corpusDir/batch=$batchId")
  }
}
