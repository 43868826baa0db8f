package graft.corpus

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * Vocabulary-coverage scoring (SURVEY.md §7 phase F) — the deterministic
 * sibling of the perplexity quality filter: docs whose tokens fall
 * outside the corpus' high-frequency vocabulary are boilerplate, noise
 * or the wrong language. A true LM-perplexity filter needs a trained
 * model AND transcendental math (ln differs in the last ulp across
 * libms, which would break the cross-engine hash gate); OOV rate keeps
 * the signal while staying in exact integer counts + one division.
 *
 * Scale shape: the frequency aggregation is one linear shuffle keyed by
 * token with map-side partial counts; top-K is a TakeOrdered (per-
 * partition heap, no global sort); the resulting vocabulary is ≤ K rows
 * BY CONSTRUCTION, so the coverage join broadcasts at any corpus size.
 */
object Vocab {

  /** Top-K corpus vocabulary by occurrence count, ties broken by token
    * string — deterministic across engines. Returns (token, n_occurrences). */
  def topK(docs: DataFrame, textCol: String, k: Int): DataFrame =
    Dedup.fanout(docs.select(col(textCol)))
      .select(explode(TextAnalysis.tokens(col(textCol))).as("token"))
      .groupBy(col("token"))
      .agg(count(lit(1)).as("n_occurrences"))
      .orderBy(col("n_occurrences").desc, col("token").asc)
      .limit(k)

  /** Per-doc vocabulary coverage against a (small, broadcastable) vocab
    * frame with a `token` column: token occurrences, occurrences outside
    * the vocab, and their ratio. Token-less docs survive with rate 0. */
  def oovStats(docs: DataFrame, idCol: String, textCol: String,
               vocab: DataFrame): DataFrame =
    // fanout: the token explode is scan-stage compute — serialized on a
    // few-file corpus without the re-spread (no-op at real file counts)
    Dedup.fanout(docs.select(col(idCol), col(textCol)))
      .select(col(idCol).as("doc_id"),
        explode_outer(TextAnalysis.tokens(col(textCol))).as("tok"))
      .join(broadcast(vocab.select(col("token").as("tok"))
        .withColumn("_in_vocab", lit(1))), Seq("tok"), "left")
      .groupBy(col("doc_id"))
      .agg(count(col("tok")).as("n_tokens"),
        coalesce(sum(when(col("tok").isNotNull && col("_in_vocab").isNull, 1L)
          .otherwise(0L)), lit(0L)).as("n_oov"))
      .withColumn("oov_rate",
        when(col("n_tokens") === 0, 0.0).otherwise(
          round(col("n_oov").cast("double") / col("n_tokens").cast("double"), 6)))
}
