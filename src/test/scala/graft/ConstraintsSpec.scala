package graft

import graft.operators.Constraints
import graft.operators.Constraints.{RowCheck, UniqueCheck}
import org.apache.spark.sql.functions._

/** Planted-violation coverage for the declarative data-quality
  * operator: every check kind must count its violations exactly, and
  * the whole battery must evaluate in ONE aggregate (no per-check
  * scans). */
class ConstraintsSpec extends SparkTestBase {
  import spark.implicits._

  private lazy val dirty = Seq(
    (Some(1L), Some("en"), 10L, "hello"),
    (Some(2L), Some("xx"), 10L, "world"),   // lang violation
    (Some(2L), Some("en"), -5L, "   "),     // dup id + range + empty text
    (None, None, 10L, "ok")                 // null id + null lang
  ).toDF("doc_id", "lang", "n_chars", "text")

  test("each check kind counts planted violations exactly") {
    val out = Constraints.audit(dirty, Seq(
      Constraints.notNull("id_not_null", col("doc_id")),
      UniqueCheck("id_unique", "doc_id"),
      Constraints.acceptedValues("lang_ok", col("lang"), Seq("en", "de")),
      Constraints.inRange("chars_ok", col("n_chars"), 0L, 100L),
      RowCheck("text_nonempty", length(trim(col("text"))) === 0)))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out("id_not_null") == ((4L, 1L, false)))
    assert(out("id_unique") == ((4L, 1L, false)))     // one surplus "2"
    assert(out("lang_ok") == ((4L, 2L, false)))        // xx + null
    assert(out("chars_ok") == ((4L, 1L, false)))       // -5
    assert(out("text_nonempty") == ((4L, 1L, false)))  // whitespace row
  }

  test("a clean frame passes every check") {
    val clean = Seq((1L, "en", 5L, "x"), (2L, "de", 7L, "y"))
      .toDF("doc_id", "lang", "n_chars", "text")
    val out = Constraints.audit(clean, Seq(
      Constraints.notNull("id_not_null", col("doc_id")),
      UniqueCheck("id_unique", "doc_id")))
    assert(out.filter(!col("passed")).count() == 0)
  }

  test("the battery is one aggregation pass — a single scan in the plan") {
    val df = Constraints.audit(dirty, Seq(
      Constraints.notNull("a", col("doc_id")),
      UniqueCheck("b", "doc_id"),
      RowCheck("c", col("n_chars") < 0)))
    df.collect()
    val scans = flattenPlan(df.queryExecution.executedPlan)
      .count(_.getClass.getSimpleName.contains("LocalTableScan"))
    assert(scans == 1, s"expected one source scan for the whole battery, got $scans")
  }

  test("an EMPTY frame reports 0 violations / passed, never NULL") {
    // sum over zero rows is NULL without the coalesce — an
    // empty-partition audit must report a definite pass, not a
    // neither-pass-nor-fail NULL that filters silently
    val out = Constraints.audit(dirty.filter(lit(false)), Seq(
      Constraints.notNull("id_not_null", col("doc_id")),
      UniqueCheck("id_unique", "doc_id")))
      .collect().map(r => r.getString(0) ->
        (r.getLong(1), r.getLong(2), r.getBoolean(3))).toMap
    assert(out("id_not_null") == ((0L, 0L, true)))
    assert(out("id_unique") == ((0L, 0L, true)))
  }

  test("a quote in a check name is data, not SQL") {
    val out = Constraints.audit(dirty, Seq(
      Constraints.notNull("id isn't null, 'quoted'", col("doc_id"))))
      .collect()
    assert(out.length == 1 && out.head.getString(0) == "id isn't null, 'quoted'")
  }

  test("empty check list fails loudly") {
    intercept[IllegalArgumentException] {
      Constraints.audit(dirty, Seq.empty)
    }
  }
}
