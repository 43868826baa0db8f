package graft.corpus

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/**
 * Raw-corpus ingest: JSONL (and CSV) → the `documents` shape. Web-scale
 * corpora ship as line-delimited JSON (one doc per line), which is the
 * scale-correct text format: files split at newlines, so a 100 GB .jsonl
 * fans out across executors with no coordination. Multi-line formats
 * (pretty JSON arrays, CSV with embedded newlines read via multiLine)
 * force one-file-one-task and are deliberately NOT supported here.
 *
 * Rules this module enforces:
 *  - EXPLICIT schema always. Schema inference reads the entire input
 *    once before the real job — a full extra pass at 100 TB — and can
 *    silently widen types between corpus versions. Callers pass the
 *    contract; drift fails loudly instead of inferring around it.
 *  - PERMISSIVE parse + corrupt-record budget (the E1 error-fence
 *    analogue of the XELB reader's `errorBudget`): malformed lines land
 *    in a corrupt-record column, and [[enforceCorruptBudget]] fails the
 *    job when their count exceeds the budget — tolerant of stray bad
 *    lines, loud on systematic corruption.
 *
 * Implementation stance: `text` source + `from_json`/`from_csv`, NOT
 * `spark.read.json/csv` with a corrupt column. The DataSource corrupt
 * column poisons every downstream count: a `filter(corrupt).count()`
 * prunes the scan to the corrupt column alone, which Spark forbids
 * (UNSUPPORTED_FEATURE.QUERY_ONLY_CORRUPT_RECORD_COLUMN) and whose
 * documented workaround is `.cache()` — wrong at corpus scale. Parsing
 * the line column keeps identical splittability, one pass, and a
 * corrupt column that behaves like any other column.
 */
object Ingest {

  val CorruptCol = "_corrupt_record"

  private def withCorrupt(schema: StructType): StructType = {
    require(!schema.fieldNames.contains(CorruptCol),
      s"schema must not already contain $CorruptCol")
    StructType(schema.fields :+
      StructField(CorruptCol, StringType, nullable = true))
  }

  private val parseOpts =
    Map("mode" -> "PERMISSIVE", "columnNameOfCorruptRecord" -> CorruptCol)

  /** Blank-line predicate: keep lines carrying any NON-WHITESPACE
    * character. `trim` alone strips only 0x20, so a tab-only line or a
    * stray CR (routine with CRLF inputs) would survive it, fail the
    * parse, and be charged to the corrupt budget — contradicting the
    * "trailing newlines are not corruption" stance. */
  private val nonBlank = col("value").rlike("\\S")

  /** Read line-delimited JSON with a caller-supplied contract schema.
    * The returned frame carries [[CorruptCol]] (NULL for good rows) so
    * the budget check composes with any downstream plan. Whitespace-only
    * lines are skipped (trailing newlines are not corruption). */
  def readJsonl(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val parsed = withCorrupt(schema) // contract check before any IO
    spark.read.text(path)
      .filter(nonBlank)
      .select(from_json(col("value"), parsed, parseOpts).as("r"))
      .select(col("r.*"))
  }

  /** EAGER budget fence: fail loudly NOW when more than `budget` rows
    * are corrupt; otherwise return the clean rows (corrupt column
    * dropped). Honest cost: the check is its own aggregation pass, and
    * the returned frame re-parses the input on every downstream action
    * — two scans minimum, and the two can observe different file states
    * if the input mutates between them. That is the right trade only
    * when the budget must gate BEFORE any expensive downstream work
    * (e.g. refusing to start a multi-hour pipeline on a rotten drop).
    * For the common ingest shape — parse → transform → write, one
    * action — [[corruptBudgetGate]] folds the fence into that single
    * pass. */
  def enforceCorruptBudget(df: DataFrame, budget: Long): DataFrame = {
    val bad = df.agg(
      coalesce(sum(when(col(CorruptCol).isNotNull, 1L).otherwise(0L)), lit(0L)))
      .head().getLong(0)
    if (bad > budget)
      throw new IllegalStateException(
        s"corrupt-record budget exceeded: $bad malformed lines > budget $budget")
    df.filter(col(CorruptCol).isNull).drop(CorruptCol)
  }

  /** SINGLE-PASS budget fence — the 100 TB shape: attach an
    * `observe()` metric counting corrupt rows to the SAME scan that
    * serves the returned clean rows, so the fence costs zero extra
    * passes and the count describes exactly the rows the action
    * consumed. Returns (clean frame, check thunk); run ONE action on
    * the frame (typically the ingest write), then call the thunk — it
    * throws on budget violation and returns the corrupt count
    * otherwise. The violation surfaces AFTER the action (the written
    * output must then be discarded); callers needing a pre-action gate
    * pay [[enforceCorruptBudget]]'s extra pass instead. */
  def corruptBudgetGate(df: DataFrame, budget: Long): (DataFrame, () => Long) = {
    val obs = org.apache.spark.sql.Observation()
    val observed = df.observe(obs,
      coalesce(sum(when(col(CorruptCol).isNotNull, 1L).otherwise(0L)), lit(0L))
        .as("n_corrupt"))
    val clean = observed.filter(col(CorruptCol).isNull).drop(CorruptCol)
    val check = () => {
      val bad = obs.get("n_corrupt").asInstanceOf[Long]
      if (bad > budget)
        throw new IllegalStateException(
          s"corrupt-record budget exceeded: $bad malformed lines > budget $budget")
      bad
    }
    (clean, check)
  }

  /** Write a frame as JSONL — the round-trip-exact text container
    * (JSON string escaping preserves every byte, unlike CSV quoting
    * edge cases across writers). */
  def writeJsonl(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").json(path)

  /** Header-less CSV with the same contract stance (a header row is
    * per-file state a line-splittable reader can't see; the schema IS
    * the header). Callers with newline-bearing text belong on JSONL.
    *
    * CONTRACT: whitespace-only lines are non-records here too — skipped
    * like blank JSONL lines, not parsed and not charged to the corrupt
    * budget. A record whose FIRST field is legitimately whitespace-only
    * is indistinguishable from editor noise on a headerless line format;
    * data with such fields belongs on JSONL, where the framing is
    * explicit (the oracle twin pins this skip-don't-charge behavior). */
  def readCsv(spark: SparkSession, path: String, schema: StructType): DataFrame = {
    val parsed = withCorrupt(schema)
    spark.read.text(path)
      .filter(nonBlank)
      .select(from_csv(col("value"), parsed, parseOpts).as("r"))
      .select(col("r.*"))
  }

  def writeCsv(df: DataFrame, path: String): Unit =
    df.write.mode("overwrite").option("header", "false").csv(path)
}
