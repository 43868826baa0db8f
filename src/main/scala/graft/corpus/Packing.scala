package graft.corpus

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Training-data preparation tail (after dedup/quality/mixing): which docs
 * make the cut, and how they become fixed-length training sequences.
 * Everything is window/HOF-composed — no driver loops, no RNG; at scale
 * each operator partitions by the stratum column so the windows
 * parallelize per shard.
 */
object Packing {

  /** Budgeted selection: per stratum, admit docs best-first (scoreCol
    * desc, idCol as the deterministic tie-break) until the stratum's
    * cumulative `costCol` exceeds `budget`. The admission test uses the
    * INCLUSIVE running sum, so the doc that crosses the budget line is
    * rejected and later (worse) docs cannot sneak in under it — a
    * monotone cut, same semantics as a sequential greedy fill. */
  def selectWithinBudget(docs: DataFrame, stratumCol: String, idCol: String,
                         scoreCol: Column, costCol: Column,
                         budget: Long): DataFrame = {
    val w = Window.partitionBy(col(stratumCol))
      .orderBy(scoreCol.desc, col(idCol))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    docs.withColumn("_cum_cost", sum(costCol).over(w))
      .filter(col("_cum_cost") <= budget)
      .drop("_cum_cost")
  }

  /** Overlapping fixed-length token chunks (stride < size ⇒ overlap):
    * the doc→training-example split. Output one row per chunk with a
    * portable hash of the chunk text (chunks are consumed downstream by
    * id, not re-materialized). Pure projection + generator — pipelines
    * inside the scan at any scale. */
  def chunk(docs: DataFrame, idCol: String, textCol: String,
            chunkSize: Int, stride: Int): DataFrame = {
    require(stride >= 1 && chunkSize >= stride,
      s"need 1 <= stride <= chunkSize, got chunkSize=$chunkSize stride=$stride")
    docs
      .select(col(idCol), TextAnalysis.tokens(col(textCol)).as("ws"))
      .select(col(idCol), col("ws"),
        // chunk start positions: 1, 1+stride, ... while start <= n
        // (empty docs yield no chunks, like explode of an empty array)
        when(size(col("ws")) === 0, array().cast("array<int>"))
          .otherwise(sequence(lit(1), size(col("ws")), lit(stride))).as("starts"))
      .select(col(idCol), col("ws"), posexplode(col("starts")))
      .select(col(idCol), col("pos").cast("int").as("chunk_idx"),
        slice(col("ws"), col("col"), lit(chunkSize)).as("chunk"))
      .select(col(idCol), col("chunk_idx"),
        size(col("chunk")).as("chunk_len"),
        TextAnalysis.hash60(concat_ws(" ", col("chunk"))).as("chunk_hash"))
  }

  /** Concat-then-chunk sequence packing — the standard LLM batching: the
    * stratum's docs are conceptually concatenated in id order and cut
    * into fixed `binSize`-token windows. Per doc: its token offset in
    * the stream, the first bin it lands in, and how many bins it spans.
    * The running sum parallelizes per stratum (partitioned window). */
  def packOffsets(docs: DataFrame, stratumCol: String, idCol: String,
                  nTokensCol: Column, binSize: Int): DataFrame = {
    // binSize 0 would make every `div` below a silent NULL (non-ANSI
    // integer division by zero), not an error — refuse like chunk() does
    require(binSize >= 1, s"binSize must be >= 1, got $binSize")
    val w = Window.partitionBy(col(stratumCol)).orderBy(col(idCol))
      .rowsBetween(Window.unboundedPreceding, -1)
    docs
      .withColumn("_n", nTokensCol.cast("long"))
      .withColumn("start_off", coalesce(sum(col("_n")).over(w), lit(0L)))
      // `div` is true integer division on longs — exact at any offset,
      // matching the oracle's `//`; `/` would round-trip through an IEEE
      // double (exact only below 2^53)
      .withColumn("start_bin", expr(s"start_off div $binSize"))
      .withColumn("bins_spanned",
        when(col("_n") === 0, lit(0L)).otherwise(
          expr(s"(start_off + _n - 1) div $binSize")
            - col("start_bin") + 1))
      .drop("_n")
  }
}
