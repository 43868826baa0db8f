package graft

import graft.xel.{JdbcSink, XeFixture, XelConfig}
import org.apache.spark.sql.functions._

/** Integration test of the S5 JDBC sink against embedded Derby (in-memory,
  * ships with Spark) — a real database round-trip: demux-append one table
  * per event type, read back over JDBC, compare with the source frame. */
class JdbcSinkSpec extends SparkTestBase {

  private val url = "jdbc:derby:memory:graftdb;create=true"

  test("demux bulk-append round-trips per-event-type tables through Derby") {
    val xe = XeFixture.frame(spark, sf("sf0.001")).select(
      col("c_event_sequence"), col("c_session_id"), col("c_duration_us"),
      col("e_time_of_event_utc"), col("event_name"))

    val tables = JdbcSink.demuxAppend(xe, url, XelConfig.default)
    assert(tables.size == 5) // one per event type (A3 counter)

    val perType = xe.groupBy(col("event_name")).agg(
      count(lit(1)).as("n"), sum(col("c_duration_us")).as("d")).collect()
      .map(r => (r.getString(0), (r.getLong(1), r.getLong(2)))).toMap

    tables.foreach { t =>
      val eventName = t.stripPrefix("xel_")
      val back = spark.read.format("jdbc")
        .option("url", url).option("dbtable", t).load()
      val (n, d) = perType(eventName)
      val got = back.agg(count(lit(1)), sum(col("c_duration_us"))).head()
      assert(got.getLong(0) == n, s"$t row count")
      assert(got.getLong(1) == d, s"$t duration sum")
      // no event_name column at rest — the table name IS the demux key
      assert(!back.columns.contains("event_name"))
    }
  }

  test("append mode accumulates (reference -a semantics)") {
    val df = XeFixture.frame(spark, sf("sf0.001"))
      .filter(col("event_name") === "wait_info")
      .select(col("c_event_sequence"), col("c_duration_us"))
    val n = df.count()
    JdbcSink.bulkAppend(df, url, "xel_append_t")
    JdbcSink.bulkAppend(df, url, "xel_append_t")
    val back = spark.read.format("jdbc")
      .option("url", url).option("dbtable", "xel_append_t").load()
    assert(back.count() == 2 * n)
  }
}
