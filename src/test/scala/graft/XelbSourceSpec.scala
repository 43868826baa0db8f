package graft

import graft.sources.XelbFixtures
import graft.xel.XeFixture
import java.nio.file.Files
import org.apache.spark.sql.functions._

/** DataSource V2 round-trip and pruning behavior for the XELB source. */
class XelbSourceSpec extends SparkTestBase {

  private lazy val dir: String = {
    val d = Files.createTempDirectory("graft-xelb").toString
    val xe = XeFixture.frame(spark, sf("sf0.001")).select(
      col("e_imported_file_id"), col("c_event_sequence"), col("c_session_id"),
      col("c_duration_us"), col("e_time_of_event_utc"), col("c_statement"),
      col("event_name"))
    XelbFixtures.writeByKey(xe, "e_imported_file_id", d)
    d
  }

  test("round-trip: xelb read equals the source frame, one partition per file") {
    val back = spark.read.format("xelb").load(dir)
    val orig = XeFixture.frame(spark, sf("sf0.001")).select(
      "c_event_sequence", "c_session_id", "c_duration_us",
      "e_time_of_event_utc", "c_statement", "event_name")
    assert(back.count() == orig.count())
    assert(back.exceptAll(orig).count() == 0)
    assert(orig.exceptAll(back).count() == 0)
    // file-level fan-out (reference X1): 4 rollover files → 4 partitions
    assert(back.rdd.getNumPartitions == 4)
  }

  test("schema inferred from the first file's embedded metadata") {
    val back = spark.read.format("xelb").load(dir)
    assert(back.schema.fieldNames.toSeq == Seq(
      "c_event_sequence", "c_session_id", "c_duration_us",
      "e_time_of_event_utc", "c_statement", "event_name"))
  }

  test("column pruning reaches the scan (readSchema shrinks)") {
    val pruned = spark.read.format("xelb").load(dir)
      .select("c_event_sequence", "event_name")
    val scans = pruned.queryExecution.executedPlan.collect {
      case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
    }
    assert(scans.nonEmpty)
    assert(scans.head.scan.readSchema().fieldNames.toSeq ==
      Seq("c_event_sequence", "event_name"))
    // and values survive the pruned decode path
    val n = pruned.filter(col("event_name") === "wait_info").count()
    assert(n > 0)
  }

  test("nulls round-trip") {
    import spark.implicits._
    val d = Files.createTempDirectory("graft-xelb-null").toString
    val df = Seq((1L, Some("a"), 1L), (1L, None, 2L), (2L, Some("c"), 3L))
      .toDF("k", "s", "v")
    XelbFixtures.writeByKey(df, "k", d)
    val back = spark.read.format("xelb").load(d).orderBy("v")
    assert(back.collect().map(r => Option(r.getString(0))).toSeq ==
      Seq(Some("a"), None, Some("c")))
  }
}
