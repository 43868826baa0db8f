package graft.streaming

import graft.corpus.Dedup
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Streaming NEAR-duplicate admission — the fuzzy twin of [[IngestDedup]]
 * (which refuses only byte-exact texts): each arriving micro-batch is
 * checked against the admitted corpus with `Dedup.incrementalPairs`
 * (shingle-Jaccard ≥ t), and only docs with NO near-duplicate already
 * in the store land. This is the production shape of continuous corpus
 * building: re-pairing the whole corpus per ingest is O(corpus) work
 * for O(batch) new data, so admission joins the batch against the
 * persisted store instead — and a trivially-reworded copy of an
 * admitted doc is refused, which exact-digest admission cannot do.
 *
 * Semantics mirror [[IngestDedup.admitLoop]]: admission is judged
 * against the store AS OF batch start (within-batch near-dups all
 * admit), per-batch directories overwrite on replay (exactly-once at
 * the sink under at-least-once replay), and a replayed batch excludes
 * its own previous partition from the store view so it can never
 * self-refuse.
 *
 * Scale: the per-batch cost is `incrementalPairs`' asymmetric join —
 * only the (small) batch side shuffles fully; at 100 TB the store
 * postings are a persisted table bucketed by shingle (the
 * incrementalPairs contract), or the admission check swaps to
 * LSH-bucket probing with the same store-vs-batch shape. Here the
 * store is re-tokenized per batch, which is the right trade at
 * fixture scale and explicitly NOT the at-scale layout.
 */
object NearDupIngest {

  /** The admitted corpus as a growing `batch=<id>/` parquet directory;
    * absent/empty → an empty frame of `schema` (first batch admits
    * everything). `excludeBatch` hides one batch partition — the
    * caller's own id on replay. */
  def storeCorpus(spark: org.apache.spark.sql.SparkSession, corpusDir: String,
                  schema: org.apache.spark.sql.types.StructType,
                  excludeBatch: Option[Long] = None): DataFrame =
    BatchStore.read(spark, corpusDir, schema, excludeBatch)

  /** Admit the batch rows with no Jaccard-≥-threshold near-duplicate in
    * `store`; UNCAPPED similarity (maxDf = ∞) so the pair relation is a
    * doc-pair property independent of store composition — what lets an
    * external oracle replay sequential admission from one global pair
    * set. */
  def admit(store: DataFrame, batch: DataFrame, idCol: String,
            textCol: String, k: Int, threshold: Double): DataFrame = {
    val rejected = Dedup.incrementalPairs(store, batch, idCol, textCol,
        k, threshold, maxDf = Int.MaxValue)
      .select(col("batch_id").as(idCol)).distinct()
    batch.join(rejected, Seq(idCol), "left_anti")
  }

  /** The closed loop as a foreachBatch sink (see [[IngestDedup.admitLoop]]
    * for the replay discipline it copies). */
  def admitLoop(idCol: String, textCol: String, k: Int, threshold: Double,
                corpusDir: String)(batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    val store = storeCorpus(spark, corpusDir, batch.schema,
      excludeBatch = Some(batchId))
    admit(store, batch, idCol, textCol, k, threshold)
      .write.mode("overwrite").parquet(s"$corpusDir/batch=$batchId")
  }
}
