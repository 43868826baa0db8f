package graft

import graft.xel.{CatalogDdl, XeFixture, XelConfig}
import org.apache.spark.sql.functions._

/** D2/D3/D5 catalog DDL semantics: namespace + per-type tables created,
  * append mode (-a) skips DDL, -c drops tables first, -w wipes. */
class CatalogDdlSpec extends SparkTestBase with org.scalatest.BeforeAndAfterAll {

  private val cfg = XelConfig.default.copy(schemaName = "xel_cat_test")

  private def xe = XeFixture.frame(spark, sf("sf0.001")).select(
    col("c_event_sequence"), col("c_session_id"), col("c_duration_us"),
    col("event_name"))

  override def afterAll(): Unit = {
    spark.sql(s"DROP NAMESPACE IF EXISTS `${cfg.schemaName}` CASCADE")
    super.afterAll()
  }

  test("namespace + one managed table per event type; contents match the demux") {
    val tables = CatalogDdl.writeDemuxedTables(xe, cfg.copy(wipeDatabase = true))
    assert(spark.catalog.databaseExists(cfg.schemaName))
    assert(tables.size == 5)
    val perType = xe.groupBy(col("event_name")).agg(count(lit(1)).as("n"))
      .collect().map(r => (r.getString(0), r.getLong(1))).toMap
    tables.foreach { t =>
      val eventName = t.split('.').last.stripPrefix("`").stripSuffix("`")
      assert(spark.table(t).count() == perType(eventName), s"$t row count")
      assert(!spark.table(t).columns.contains("event_name"))
    }
  }

  test("append mode appends without DDL; missing table fails loudly") {
    val before = spark.table(s"`${cfg.schemaName}`.`wait_info`").count()
    CatalogDdl.writeDemuxedTables(
      xe.filter(col("event_name") === "wait_info"), cfg.copy(appendMode = true))
    assert(spark.table(s"`${cfg.schemaName}`.`wait_info`").count() == 2 * before)

    // an event type with no table yet must fail in append mode, not CREATE
    val novel = xe.limit(5).withColumn("event_name", lit("never_seen_type"))
    val err = intercept[IllegalArgumentException](
      CatalogDdl.writeDemuxedTables(novel, cfg.copy(appendMode = true)))
    assert(err.getMessage.contains("must already exist"))
  }

  test("clearTables (-c) drops and reloads instead of accumulating") {
    val slice = xe.filter(col("event_name") === "wait_info")
    val n = slice.count()
    CatalogDdl.writeDemuxedTables(slice, cfg.copy(clearTables = true))
    assert(spark.table(s"`${cfg.schemaName}`.`wait_info`").count() == n)
  }

  test("wipeDatabase (-w) drops the whole namespace first") {
    CatalogDdl.writeDemuxedTables(
      xe.filter(col("event_name") === "wait_info"), cfg.copy(wipeDatabase = true))
    // only the one table survives the wipe (listTables also reports other
    // suites' temp views against every database — exclude them)
    assert(spark.catalog.listTables(cfg.schemaName)
      .filter(!_.isTemporary).count() == 1)
  }
}
