package graft.xel

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/**
 * Canonical XEL-shaped fixture (FIXTURES.md §2): reshapes the driver's
 * `events` table into the wide per-event table the reference synthesizes —
 * 4 mandatory `e_*` columns + `c_*` field columns + `a_*` action columns +
 * the demux key `event_name` (`XELoader/EventMetadata.cs:81-128`).
 *
 * Every derivation here is deliberately expressible in ANSI SQL so the
 * DuckDB oracle can reproduce it bit-for-bit; [[XeFixture.sqlCte]] holds the
 * mirrored SQL and MUST be kept in lockstep with [[XeFixture.frame]].
 *
 * Determinism notes (SURVEY.md §7.4):
 *  - `round(value*1000)` not `cast` — Spark casts double→long by truncation,
 *    DuckDB by rounding; explicit round() agrees in both.
 *  - hash companions surface as hex STRINGS at query edges (blob hashing
 *    differs between engines).
 *  - session timezone is UTC in both engines, so the `_local` column is the
 *    UTC instant itself under the default config.
 */
object XeFixture {

  /** event_type → XE-ish event name. `signup`/`error` play the two
    * module events so the F8 workaround path is exercised on shared data. */
  val eventNameMap: Seq[(String, String)] = Seq(
    "click" -> "sql_batch_completed",
    "view" -> "rpc_completed",
    "purchase" -> "wait_info",
    "signup" -> "module_start",
    "error" -> "module_end"
  )

  /** Deterministic stand-in for the XE query_hash action: plain 64-bit-safe
    * integer arithmetic both engines evaluate exactly. */
  val hashA = 2654435761L // Knuth multiplicative constant
  val hashB = 97L

  /** The driver has shipped `events.parquet` with two vintages of `ts`:
    * TIMESTAMP(NANOS) — which Spark 4 rejects ([PARQUET_TYPE_ILLEGAL]) unless
    * read as a raw long via `legacy.parquet.nanosAsLong` — and, since the
    * round-9 regeneration, plain TIMESTAMP_MICROS (surfacing as
    * TIMESTAMP_NTZ). Dispatch on the actual read type so both load:
    * nanos-as-long gets the exact int64 `div 1000` (a double division would
    * lose precision past 2^53); timestamp-typed columns are cast to the
    * session-local TimestampType, value-preserving because every entry point
    * pins `spark.sql.session.timeZone=UTC`. */
  def events(spark: SparkSession, sfDir: String): DataFrame = {
    // DELIBERATE session-wide side effect (and a necessary one): the
    // nanos flag is a SQLConf consulted when the scan EXECUTES, so a
    // set-and-restore scope would break the lazy frame this returns.
    // Consequence for cohabiting code: TIMESTAMP(NANOS) parquet columns
    // read anywhere later in this session arrive as raw int64 nanos
    // instead of erroring — any such reader must convert explicitly,
    // exactly as done below.
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    val raw = spark.read.parquet(s"$sfDir/events.parquet")
    raw.schema("ts").dataType match {
      case org.apache.spark.sql.types.LongType =>
        raw.withColumn("ts", timestamp_micros(expr("ts div 1000")))
      case org.apache.spark.sql.types.TimestampType => raw
      case _ => raw.withColumn("ts", col("ts").cast("timestamp"))
    }
  }

  def frame(spark: SparkSession, sfDir: String, cfg: XelConfig = XelConfig.default): DataFrame = {
    val ev = events(spark, sfDir)
    val name = eventNameMap.foldRight(lit("unknown_event")) { case ((k, v), acc) =>
      when(col("event_type") === k, lit(v)).otherwise(acc)
    }
    ev.select(
      (col("event_id") % 4 + 1).as("e_imported_file_id"),
      XelFunctions.timeOfEvent(col("ts")).as("e_time_of_event"),
      XelFunctions.timeOfEventUtc(col("ts")).as("e_time_of_event_utc"),
      XelFunctions.timeOfEventLocal(col("ts"), cfg.timezone).as("e_time_of_event_local"),
      col("event_id").as("c_event_sequence"),
      col("user_id").as("c_session_id"),
      round(col("value") * 1000).cast("long").as("c_duration_us"),
      col("props").as("c_statement"),
      (col("event_id") * hashA + col("user_id") * hashB).as("a_query_hash"),
      name.as("event_name")
    )
  }

  /** DuckDB CTE mirroring [[frame]] — prepend to every oracle query that
    * reads the XE shape. Table name exposed: `xe`. */
  def sqlCte: String =
    s"""WITH xe AS (
       |  SELECT
       |    event_id % 4 + 1                          AS e_imported_file_id,
       |    date_trunc('minute', ts)                  AS e_time_of_event,
       |    ts                                        AS e_time_of_event_utc,
       |    ts                                        AS e_time_of_event_local,
       |    event_id                                  AS c_event_sequence,
       |    user_id                                   AS c_session_id,
       |    CAST(round(value * 1000) AS BIGINT)       AS c_duration_us,
       |    props                                     AS c_statement,
       |    event_id * $hashA + user_id * $hashB      AS a_query_hash,
       |    CASE event_type
       |      WHEN 'click' THEN 'sql_batch_completed'
       |      WHEN 'view' THEN 'rpc_completed'
       |      WHEN 'purchase' THEN 'wait_info'
       |      WHEN 'signup' THEN 'module_start'
       |      WHEN 'error' THEN 'module_end'
       |      ELSE 'unknown_event'
       |    END                                       AS event_name
       |  FROM events
       |)""".stripMargin
}
