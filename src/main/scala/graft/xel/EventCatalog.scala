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
    * (written by [[Pipeline.writeDemuxed]]). Returns the view names. */
  def registerEventViews(spark: SparkSession, demuxDir: String,
                         prefix: String = "xel_"): Seq[String] = {
    val all = spark.read.parquet(demuxDir)
    all.createOrReplaceTempView(s"${prefix}all_events")
    val types = all.select(col("event_name")).distinct()
      .collect().map(_.getString(0)).sorted
    types.map { t =>
      val view = prefix + t
      // filter on the partition column → partition-pruned scan per view
      all.filter(col("event_name") === t).drop("event_name")
        .createOrReplaceTempView(view)
      view
    }.toSeq
  }
}
