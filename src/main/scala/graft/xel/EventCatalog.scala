package graft.xel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * The "query half" made explicit (SURVEY.md §2.4): the reference loads
 * per-event-type tables into SQL Server *so users can run SQL on them*;
 * here the demuxed parquet layout surfaces as one Spark SQL view per
 * event type, plus a union view over all types. Partition pruning on
 * `event_name` means each per-type view scans only its own directory.
 */
object EventCatalog {

  /** Register `<prefix><event_name>` temp views over a demuxed directory
    * (written by [[Pipeline.writeDemuxed]]). Returns the view names.
    *
    * The views SNAPSHOT the file listing at registration: a later `-a`
    * load into the same directory is invisible through them (and a
    * compaction that removes listed files breaks them). After changing
    * the store, call [[refreshViews]] — or re-register — before
    * querying; both are cheap (a listing, no data read). */
  def registerEventViews(spark: SparkSession, demuxDir: String,
                         prefix: String = "xel_"): Seq[String] = {
    val all = spark.read.parquet(demuxDir)
    all.createOrReplaceTempView(s"${prefix}all_events")
    val types = all.select(col("event_name")).distinct()
      .collect().map(r => Option(r.getString(0)))
    // a null partition value would register a view literally named
    // "<prefix>null" over the __HIVE_DEFAULT_PARTITION__ dir — refuse
    // loudly like the write side does
    require(!types.contains(None),
      s"$demuxDir contains a NULL event_name partition — the demux key " +
        "must be non-null")
    types.flatten.sorted.map { t =>
      val view = prefix + t
      // filter on the partition column → partition-pruned scan per view
      all.filter(col("event_name") === t).drop("event_name")
        .createOrReplaceTempView(view)
      view
    }.toSeq
  }

  /** Re-resolve the views' file listing after the store changed (an
    * `-a` append, a compaction): invalidates every cached listing under
    * `demuxDir` and re-registers, so the views serve the CURRENT store
    * instead of the registration-time snapshot. */
  def refreshViews(spark: SparkSession, demuxDir: String,
                   prefix: String = "xel_"): Seq[String] = {
    spark.catalog.refreshByPath(demuxDir)
    registerEventViews(spark, demuxDir, prefix)
  }
}
