package graft

import graft.corpus.Ingest
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** JSONL/CSV raw-corpus ingest: round-trip exactness, explicit-schema
  * contract, and the corrupt-record budget fence. */
class IngestSpec extends SparkTestBase {
  import spark.implicits._

  private val docSchema = StructType(Seq(
    StructField("doc_id", LongType),
    StructField("text", StringType),
    StructField("lang", StringType),
    StructField("source", StringType),
    StructField("n_chars", LongType)))

  private def scratch(tag: String): String = {
    val d = java.nio.file.Files.createTempDirectory(s"graft_ingest_$tag")
    d.toFile.deleteOnExit()
    d.toString + "/data"
  }

  test("JSONL round-trip preserves every document byte-exactly") {
    val docs = spark.read.parquet(sf("sf0.001") + "/documents.parquet")
    val path = scratch("jsonl")
    Ingest.writeJsonl(docs, path)
    val back = Ingest.enforceCorruptBudget(
      Ingest.readJsonl(spark, path, docSchema), budget = 0)
    assert(back.schema.fieldNames.sorted.toSeq == docs.schema.fieldNames.sorted.toSeq)
    assert(back.count() == docs.count())
    // exact content equality both directions (null-safe on every column)
    val cols = docs.columns.toSeq
    val joined = docs.join(back,
      cols.map(c => docs(c) <=> back(c)).reduce(_ && _), "full_outer")
    assert(joined.filter(docs("doc_id").isNull || back("doc_id").isNull).count() == 0)
  }

  test("corrupt lines are tolerated within budget and fail loudly beyond it") {
    val path = scratch("bad")
    val good = Seq(
      """{"doc_id":1,"text":"alpha","lang":"en","source":"s0","n_chars":5}""",
      """{"doc_id":2,"text":"beta","lang":"en","source":"s0","n_chars":4}""")
    val bad = Seq("""{"doc_id":3,"text":"unterminated""", "not json at all")
    spark.sparkContext.parallelize(good ++ bad, 1).saveAsTextFile(path)
    val parsed = Ingest.readJsonl(spark, path, docSchema)
    // within budget: corrupt rows dropped, good rows intact
    val clean = Ingest.enforceCorruptBudget(parsed, budget = 2)
    assert(clean.count() == 2)
    assert(clean.agg(sum(col("n_chars"))).head().getLong(0) == 9L)
    // beyond budget: loud failure naming the counts
    val e = intercept[IllegalStateException] {
      Ingest.enforceCorruptBudget(parsed, budget = 1)
    }
    assert(e.getMessage.contains("budget"))
  }

  test("headerless CSV round-trips newline-free rows with the same budget fence") {
    val ev = graft.xel.XeFixture.events(spark, sf("sf0.001"))
      .select(col("event_id"), col("user_id"), col("event_type"))
    val path = scratch("csv")
    Ingest.writeCsv(ev, path)
    val schema = StructType(Seq(
      StructField("event_id", LongType),
      StructField("user_id", LongType),
      StructField("event_type", StringType)))
    val back = Ingest.enforceCorruptBudget(
      Ingest.readCsv(spark, path, schema), budget = 0)
    assert(back.count() == ev.count())
    assert(back.agg(sum(col("user_id"))).head().getLong(0) ==
      ev.agg(sum(col("user_id"))).head().getLong(0))
  }

  test("whitespace-only lines (tabs, CR) are skipped, not charged to the budget") {
    val path = scratch("ws")
    val lines = Seq(
      """{"doc_id":1,"text":"a","lang":"en","source":"s0","n_chars":1}""",
      "\t", "   ", "\r", "\t \t",
      """{"doc_id":2,"text":"b","lang":"en","source":"s0","n_chars":1}""")
    spark.sparkContext.parallelize(lines, 1).saveAsTextFile(path)
    // budget 0: any line charged as corrupt would throw — the four
    // whitespace-only lines must be skipped as blank instead
    val clean = Ingest.enforceCorruptBudget(
      Ingest.readJsonl(spark, path, docSchema), budget = 0)
    assert(clean.count() == 2)
  }

  test("corruptBudgetGate: single-pass fence counts corrupt rows and throws past budget") {
    val path = scratch("gate")
    val good = Seq(
      """{"doc_id":1,"text":"alpha","lang":"en","source":"s0","n_chars":5}""",
      """{"doc_id":2,"text":"beta","lang":"en","source":"s0","n_chars":4}""")
    val bad = Seq("""{"doc_id":3,"text":"unterminated""", "not json at all")
    spark.sparkContext.parallelize(good ++ bad, 1).saveAsTextFile(path)
    // within budget: the clean count is served and the thunk reports 2
    val (clean, check) = Ingest.corruptBudgetGate(
      Ingest.readJsonl(spark, path, docSchema), budget = 2)
    assert(clean.count() == 2) // the ONE action — also fires the observe metric
    assert(check() == 2L)
    // past budget: same single action, thunk throws afterwards
    val (clean2, check2) = Ingest.corruptBudgetGate(
      Ingest.readJsonl(spark, path, docSchema), budget = 1)
    assert(clean2.count() == 2)
    val e = intercept[IllegalStateException](check2())
    assert(e.getMessage.contains("budget"))
  }

  test("explicit schema contract: the corrupt column cannot collide") {
    val e = intercept[IllegalArgumentException] {
      Ingest.readJsonl(spark, "/nonexistent", StructType(Seq(
        StructField(Ingest.CorruptCol, StringType))))
    }
    assert(e.getMessage.contains(Ingest.CorruptCol))
  }
}
