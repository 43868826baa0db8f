package graft.xel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.util.LongAccumulator

/**
 * The load pipeline — the reference's per-file driver loop
 * (`XELoader/FileProcessor.cs:81-278`, SURVEY.md §3.2) re-homed onto
 * Spark's execution model:
 *
 *  - file discovery + wildcard filter  → `pathGlobFilter` / regex on
 *    `input_file_name()` (P2)
 *  - session-pattern filter            → leading-pattern derivation + filter (P3)
 *  - per-event-type demux              → ONE distributed write with
 *    `partitionBy(event_name)` instead of N buffered tables (P1)
 *  - rowstore "clustered index on c_event_sequence" → `sortWithinPartitions`
 *    before write, giving parquet row-group min/max pruning on time/seq
 *    predicates (`EventMetadata.cs:205-228` analogue)
 *  - truncation/error counters         → `LongAccumulator`s merged at the
 *    driver (replaces `error_truncation_Lock`, `FileProcessor.cs:242-252`)
 *  - lineage                           → per-file aggregate written next to
 *    the data (replaces `dbo.tbl_ImportedXEventFiles`)
 *
 * Scale notes (100 TB): the plan is shuffle-free — each input split flows
 * scan → project → write. `partitionBy` does not shuffle; tasks write one
 * file per event type they see. With few event types and many input files
 * that yields (files × types) outputs; `maxRecordsPerFile` bounds file count
 * explosion, and AQE rebalance can be layered on if the type distribution
 * is extremely skewed.
 */
object Pipeline {

  /** P2 — `*`/`?` wildcard → anchored case-insensitive regex
    * (`FileProcessor.cs:148-166`). */
  def wildcardToRegex(pattern: String): String =
    "(?i)^" + pattern.flatMap {
      case '*' => ".*"
      case '?' => "."
      case c if "\\.[]{}()+-^$|".contains(c) => "\\" + c
      case c => c.toString
    } + "$"

  /** P3 — derive the session's leading file pattern by stripping the last
    * two `_`-separated segments: `Session_Name_0_130.xel` → `Session_Name`
    * (`FileProcessor.cs:336-378`). Malformed names (fewer than two
    * underscores) are an error, as in the reference. */
  def leadingFilePattern(fileName: String): Either[String, String] = {
    val base = fileName.stripSuffix(".xel")
    val lastUs = base.lastIndexOf('_')
    if (lastUs <= 0) Left(s"malformed XEL file name (needs SessionName_Partition_Timestamp): $fileName")
    else {
      val secondUs = base.lastIndexOf('_', lastUs - 1)
      if (secondUs <= 0) Left(s"malformed XEL file name (needs SessionName_Partition_Timestamp): $fileName")
      else Right(base.substring(0, secondUs))
    }
  }

  /** Run-level counters (SURVEY.md §2.4 A1–A4) — accumulators so executors
    * update them lock-free and Spark merges at the driver. */
  final class LoadCounters(spark: SparkSession) {
    val stringTruncations: LongAccumulator = spark.sparkContext.longAccumulator("string_truncations")
    val xmlTruncations: LongAccumulator = spark.sparkContext.longAccumulator("xml_truncations")
    val binaryTruncations: LongAccumulator = spark.sparkContext.longAccumulator("binary_truncations")
    val errors: LongAccumulator = spark.sparkContext.longAccumulator("errors")
  }

  final case class LoadStats(
      eventsLoaded: Long, filesProcessed: Long, eventTypes: Long,
      stringTruncations: Long, errors: Long)

  /**
   * Width-limit a frame per config (F2–F4) the way the reference's
   * ColumnStore-without-LOB path does (`EventHolder.cs:273-339`), driving
   * the truncation counters. Column classes come from [[EventSchema]]:
   * XML-typed strings use the XML limit, known-large strings are exempt
   * only when `limitWidths` is off (the reference truncates them too when
   * widths are limited), binary uses the binary limit — the reference's
   * copy-length bug (`EventHolder.cs:327`) is deliberately not reproduced.
   */
  def applyWidthLimits(df: DataFrame, cfg: XelConfig): DataFrame = {
    if (!cfg.limitWidths) return df
    import org.apache.spark.sql.types.{BinaryType, StringType}
    val cols = df.schema.fields.map { f =>
      val c = col(f.name)
      val limited = f.dataType match {
        case StringType if EventSchema.xmlColumns.contains(f.name) =>
          // -x: XML rehomed to an unbounded string type — exempt from the
          // width policy even when limits are on (EventMetadata.cs:372-375)
          if (cfg.xmlUnbounded) c else XelFunctions.truncate(c, cfg.xmlLimit)
        case StringType if f.name.startsWith("c_") || f.name.startsWith("a_") =>
          XelFunctions.truncate(c, cfg.stringLimit)
        case BinaryType => XelFunctions.truncate(c, cfg.binaryLimit)
        case _ => c
      }
      limited.as(f.name)
    }
    df.select(cols.toIndexedSeq: _*)
  }

  /**
   * F5/F6 companion columns, materialized at LOAD time the way the
   * reference stores them in every event table (`EventHolder.cs:216-232`;
   * schema side `EventMetadata.cs:56-68`): the 8-byte big-endian binary of
   * each hash action and the debugger command of the callstack action. A
   * reader of the demuxed store gets them as stored columns — no
   * re-derivation. Applied AFTER width limits so the stored command
   * derives from the stored (possibly truncated) callstack — exactly what
   * the store's own bytes support. Idempotent: companions already present
   * (an `-a` append over previously-loaded data) are left untouched.
   * Pure projection — no shuffle, stays inside whole-stage codegen.
   */
  def addCompanionColumns(df: DataFrame, cfg: XelConfig): DataFrame = {
    import org.apache.spark.sql.types.BinaryType
    val have = df.columns.toSet
    var out = df
    Seq("a_query_hash", "a_query_plan_hash").foreach { h =>
      if (have.contains(h) && !have.contains(h + "_bin"))
        out = out.withColumn(h + "_bin", XelFunctions.hashToBin(col(h)))
    }
    if (have.contains("a_callstack") && !have.contains("a_callstack_debugcmd")
        && df.schema("a_callstack").dataType == BinaryType)
      out = out.withColumn("a_callstack_debugcmd",
        XelFunctions.callstackDebugCmd(col("a_callstack"),
          cfg.frameLength, cfg.frameCommand))
    out
  }

  /**
   * A4 truncation counters as ONE declarative pass over the frame —
   * deliberately not accumulators: accumulator updates from re-executed
   * tasks double-count (a flaw the reference's lock-guarded ints share
   * across its retry-less threads); an aggregate is exactly-once by
   * construction. Returns one row: (n_string_trunc, n_xml_trunc,
   * n_binary_trunc) for the width limits in `cfg`.
   */
  def truncationStats(df: DataFrame, cfg: XelConfig): DataFrame = {
    import org.apache.spark.sql.types.{BinaryType, StringType}
    val flags = df.schema.fields.collect {
      case f if f.dataType == StringType && EventSchema.xmlColumns.contains(f.name)
          && !cfg.xmlUnbounded =>
        ("xml", XelFunctions.truncatedFlag(col(f.name), cfg.xmlLimit))
      // xml columns under -x are EXEMPT in applyWidthLimits — they must
      // not fall through to the string counter here, or the report would
      // count truncations that never happened
      case f if f.dataType == StringType && !EventSchema.xmlColumns.contains(f.name)
          && (f.name.startsWith("c_") || f.name.startsWith("a_")) =>
        ("string", XelFunctions.truncatedFlag(col(f.name), cfg.stringLimit))
      case f if f.dataType == BinaryType =>
        ("binary", XelFunctions.truncatedFlag(col(f.name), cfg.binaryLimit))
    }
    def total(kind: String) = flags.filter(_._1 == kind).map(_._2)
      .reduceOption(_ + _).getOrElse(lit(0L))
    df.agg(
      sum(total("string")).as("n_string_trunc"),
      sum(total("xml")).as("n_xml_trunc"),
      sum(total("binary")).as("n_binary_trunc"))
  }

  /**
   * Demux write (P1 + D5): one distributed append of the whole stream,
   * partitioned at rest by event type, rows clustered by event sequence
   * within each file. Returns per-type row counts (A3's content).
   */
  def writeDemuxed(df: DataFrame, targetDir: String, cfg: XelConfig,
      mode: String = "append"): DataFrame = {
    // the sequence cluster key is optional (XELB schemas are arbitrary;
    // run() only requires event_name) — the guarded sibling
    // CatalogDdl.writeDemuxedTables set this precedent
    val sortCols = Seq("event_name", "c_event_sequence")
      .filter(df.columns.contains)
    df.sortWithinPartitions(sortCols.map(col): _*)
      .write
      .mode(mode)
      .option("maxRecordsPerFile", cfg.batchSize)
      .partitionBy("event_name")
      .parquet(targetDir)
    // counts from the INPUT frame, not a target read-back: an append
    // into a populated store would otherwise report pre-existing rows
    // and event types from earlier runs as loaded by THIS one — and the
    // read-back is a full extra scan of the (growing) store per load
    df.groupBy("event_name").agg(count(lit(1)).as("n_rows"))
  }

  /**
   * Lineage (S7): per-source-file load summary, the tracking-table analogue.
   * `file_id` is a deterministic 60-bit hash of the (unique) file name —
   * NOT a `row_number` over a global window, which would force every
   * per-file summary row through one task (a single-partition sort at
   * millions of rollover files). The reference's IDENTITY column promises
   * uniqueness, not density; any stable unique id joins event rows back to
   * their file, and a hash of the name computes where the row already is.
   */
  def lineage(df: DataFrame, fileCol: String = "source_file"): DataFrame = {
    // the time columns are optional (run() requires only event_name):
    // a schema without them gets NULL bounds, not a post-write crash
    // that strands a half-finished load behind errorifexists
    val evTime =
      if (df.columns.contains("e_time_of_event_utc")) col("e_time_of_event_utc")
      else lit(null).cast("timestamp")
    df.groupBy(col(fileCol))
      .agg(count(lit(1)).as("n_events"),
        min(evTime).as("first_event"),
        max(evTime).as("last_event"))
      .withColumn("file_id",
        conv(substring(md5(col(fileCol)), 1, 15), 16, 10).cast("long"))
      .select(col("file_id"), col(fileCol).as("file_name"),
        col("n_events"), col("first_event"), col("last_event"))
  }

  /** E1 — error budget: fail the load when bad rows exceed the per-file
    * budget, else return the good rows. "Bad" is a caller-supplied predicate
    * (the parquet fixture path has no parse errors; a real XEL reader marks
    * undecodable rows). */
  def enforceErrorBudget(df: DataFrame, isBad: org.apache.spark.sql.Column,
      cfg: XelConfig): DataFrame = {
    val byFile = df.groupBy(col("e_imported_file_id"))
      .agg(sum(when(isBad, 1L).otherwise(0L)).as("n_bad"))
      .filter(col("n_bad") > cfg.errorBudget)
    val offenders = byFile.limit(1).collect()
    if (offenders.nonEmpty) {
      val r = offenders(0)
      throw new IllegalStateException(
        s"error budget exceeded: file ${r.get(0)} has ${r.get(1)} bad events (budget ${cfg.errorBudget})")
    }
    df.filter(!isBad)
  }
}
