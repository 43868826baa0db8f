package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.StructType

/**
 * Structured Streaming ingest (SURVEY.md §2.9, phase F): XE sessions are
 * streams — the reference only ever consumes rolled-over files
 * (`XELoader/FileProcessor.cs:224-227`), so its natural streaming twin is
 * the file source: new event files dropped into a directory are picked up
 * per micro-batch, flow through the SAME transforms as the batch path,
 * and land in windowed rollups guarded by a watermark.
 *
 * The transform functions here are source-agnostic `DataFrame =>
 * DataFrame` — the batch query `xe_rate_minute` and the streaming rollup
 * share one definition, which is the property that matters at scale: one
 * tested semantics, two execution modes.
 */
object EventStream {

  /** File-source stream over a directory of event-table parquet drops.
    * `maxFilesPerTrigger=1` mirrors the reference's file-at-a-time loop. */
  def readEventDir(spark: SparkSession, dir: String, schema: StructType,
                   maxFilesPerTrigger: Int = 1): DataFrame =
    spark.readStream
      .schema(schema)
      .option("maxFilesPerTrigger", maxFilesPerTrigger)
      .parquet(dir)

  /** Per-minute event-rate rollup — the streaming twin of the batch
    * `xe_rate_minute` query. Works on batch frames too (tumbling window ==
    * date_trunc minute). On a stream, pair with [[withLateDataGuard]]. */
  def rateByMinute(events: DataFrame): DataFrame =
    events
      .groupBy(window(col("e_time_of_event_utc"), "1 minute"), col("event_name"))
      .agg(count(lit(1)).as("n"),
        sum(col("c_duration_us")).as("total_duration_us"))
      .select(col("window.start").as("minute"), col("event_name"),
        col("n"), col("total_duration_us"))

  /** Watermark for out-of-order events: state for a minute window is kept
    * `delay` past the max observed event time, then finalized — bounded
    * state at 100 TB/day stream rates. */
  def withLateDataGuard(events: DataFrame, delay: String = "10 minutes"): DataFrame =
    events.withWatermark("e_time_of_event_utc", delay)
}
