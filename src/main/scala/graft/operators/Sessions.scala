package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/**
 * Batch gap-based sessionization — the closed-data twin of
 * [[graft.streaming.Sessionize]] (which handles the open-stream case with
 * O(1) state per session). Reference scope: XELoader consumes *closed*
 * rollover files (`/root/reference/XELoader/FileProcessor.cs:224-227`), so
 * the batch form is the parity operator; the streaming form is the §2.9
 * extension.
 *
 * Classic two-window formulation, both windows over the SAME
 * (key, order) spec so Catalyst runs them in ONE shuffle + one sort:
 *
 *   is_new  = gap to previous event > gapUs (first event of a key = new)
 *   session = running sum of is_new  (1-based ordinal per key)
 *
 * At 100 TB this is one exchange keyed by the session key and a per-key
 * sort — the same cost as any per-key window; no self-join, no iterative
 * pass. Gap arithmetic is exact integer microseconds (double seconds would
 * be partition-order-dependent and never hash-match a second engine).
 */
object Sessions {

  /** Adds `session_seq` (1-based per-key session ordinal) and `ts_us`.
    * `tieCol` breaks equal-timestamp order deterministically. */
  def assign(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
             gapUs: Long): DataFrame = {
    val w = Window.partitionBy(col(keyCol)).orderBy(col(tsCol), col(tieCol))
    val run = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    // First-row detection is row_number, NOT lag(ts_us).isNull: the lag
    // of a PREVIOUS ROW'S NULL timestamp is also null, which would open
    // a fresh session on every consecutive NULL-ts event. NULL-ts rows
    // (sorted first) form one session of their own; the first real-ts
    // row after them starts fresh (second branch) instead of silently
    // joining the NULL block through a NULL gap comparison.
    df.withColumn("ts_us", unix_micros(col(tsCol)))
      .withColumn("_new",
        when(row_number().over(w) === 1, 1L)
          .when(lag(col("ts_us"), 1).over(w).isNull && col("ts_us").isNotNull, 1L)
          .when(col("ts_us") - lag(col("ts_us"), 1).over(w) > gapUs, 1L)
          .otherwise(0L))
      .withColumn("session_seq", sum(col("_new")).over(run))
      .drop("_new")
  }

  /** Per-session summary: bounds, duration, event count, plus caller
    * aggregates (exact-typed by the caller — money through decimal). */
  def stats(df: DataFrame, keyCol: String, tsCol: String, tieCol: String,
            gapUs: Long, extra: Seq[Column] = Nil): DataFrame = {
    val aggs = Seq(
      count(lit(1)).as("n_events"),
      min(col("ts_us")).as("start_us"),
      max(col("ts_us")).as("end_us"),
      (max(col("ts_us")) - min(col("ts_us"))).as("duration_us")) ++ extra
    assign(df, keyCol, tsCol, tieCol, gapUs)
      .groupBy(col(keyCol), col("session_seq"))
      .agg(aggs.head, aggs.tail: _*)
  }
}
