package graft.xel

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/**
 * S5 — the bulk-append JDBC sink (`XELoader/EventHolder.cs:360-433`),
 * re-homed onto Spark's JDBC writer. The reference's `SqlBulkCopy`
 * performance model maps knob-for-knob:
 *
 *  - batch size 1,048,576 (columnstore-rowgroup-aligned,
 *    `InputParameters.cs:35`)      → `batchsize` writer option
 *  - `BulkCopyTimeout = 0`         → `queryTimeout` 0
 *  - minimally-logged bulk load
 *    (BULK_LOGGED + NUL backup,
 *    `InputParameters.cs:449-458`) → `isolationLevel=NONE` (no
 *    per-batch transaction overhead; idempotency comes from append-only
 *    tables + the lineage table, not rollback)
 *  - column-mapped-by-name append  → Spark maps DataFrame columns to
 *    table columns by name on append
 *
 * Executors write their partitions concurrently — the reference's
 * file-level thread fan-out (X1) becomes partition-level write
 * parallelism with zero custom code.
 */
object JdbcSink {

  def bulkAppend(df: DataFrame, url: String, table: String,
                 cfg: XelConfig = XelConfig.default): Unit =
    df.write
      .mode("append")
      .format("jdbc")
      .option("url", url)
      .option("dbtable", table)
      .option("batchsize", cfg.batchSize)
      .option("isolationLevel", "NONE")
      .option("queryTimeout", 0)
      .save()

  /** P1 at the sink: one table per event type, `<schema>.<event_name>`
    * (`EventMetadata.cs:81-128` — the reference's central demux). Event
    * types are few by construction (they are XE event NAMES), so the
    * driver-side distinct is a handful of rows; each per-type write is a
    * pushed-down filter over the shared frame. Returns the table names. */
  def demuxAppend(df: DataFrame, url: String,
                  cfg: XelConfig = XelConfig.default): Seq[String] = {
    val types = df.select(col("event_name")).distinct()
      .collect().map(_.getString(0)).sorted
    types.map { t =>
      val table = s"${cfg.schemaName}_$t" // Derby/portable: schema folded into name
      bulkAppend(df.filter(col("event_name") === t).drop("event_name"), url, table, cfg)
      table
    }.toSeq
  }
}
