package graft

import java.nio.file.Files
import org.apache.spark.sql.execution.exchange.ShuffleExchangeLike
import org.apache.spark.sql.execution.adaptive.{AdaptiveSparkPlanExec, QueryStageExec}
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.functions._

/** Bucketing = the pre-shuffle you pay once at load time so every later
  * fact⋈fact join is co-located (SURVEY.md "repartition/bucketing for
  * co-located joins"). At 100 TB the lineitem⋈orders shuffle is the
  * single largest data movement in q3/q5-shaped queries; bucketed tables
  * remove it entirely. */
class BucketingSpec extends SparkTestBase {

  private def flatten(p: SparkPlan): Seq[SparkPlan] = {
    val kids = p match {
      case a: AdaptiveSparkPlanExec => Seq(a.executedPlan)
      case s: QueryStageExec => Seq(s.plan)
      case other => other.children
    }
    p +: kids.flatMap(flatten)
  }

  test("bucketed lineitem ⋈ orders joins with zero shuffle exchanges") {
    val wh = Files.createTempDirectory("graft-bucket").toString
    val li = spark.read.parquet(sf("sf0.001") + "/lineitem.parquet")
    val ord = spark.read.parquet(sf("sf0.001") + "/orders.parquet")
    spark.sql("DROP TABLE IF EXISTS li_b")
    spark.sql("DROP TABLE IF EXISTS ord_b")
    li.write.bucketBy(8, "l_orderkey").sortBy("l_orderkey")
      .option("path", s"$wh/li_b").saveAsTable("li_b")
    ord.write.bucketBy(8, "o_orderkey").sortBy("o_orderkey")
      .option("path", s"$wh/ord_b").saveAsTable("ord_b")

    val prevThreshold = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1") // force non-broadcast
    try {
      val joined = spark.table("li_b")
        .join(spark.table("ord_b"), col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority"))
        .agg(count(lit(1)).as("n"))
      val expected = li.join(ord, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderpriority")).agg(count(lit(1)).as("n"))
      assert(joined.exceptAll(expected).count() == 0)

      joined.collect()
      val shuffles = flatten(joined.queryExecution.executedPlan)
        .collect { case s: ShuffleExchangeLike => s }
      // join itself must be co-located: the only permissible shuffle is
      // the tiny post-join groupBy on o_orderpriority
      assert(shuffles.size <= 1,
        s"bucketed join should not shuffle its inputs, got ${shuffles.size} exchanges")
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prevThreshold)
      spark.sql("DROP TABLE IF EXISTS li_b")
      spark.sql("DROP TABLE IF EXISTS ord_b")
    }
  }
}
