package graft

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

/** NOT A TEST — a measurement main (`sbt "Test/runMain graft.ProbeAnnLegs"`).
  *
  * Per-leg timing decomposition of `ann_recall_report` (r17 verdict
  * item 3): each of the five independent pipelines (brute truth + four
  * index legs, each with its own train-once model) timed ALONE
  * (min-of-2, Bench-style cleanup), then the assembled report. If the
  * sum of the slowest legs ≈ the report total, the report is at its
  * structural floor (concurrent legs already overlap scheduling) and
  * the ≤2.5 s target should be re-baselined rather than chased.
  */
object ProbeAnnLegs {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder()
      .master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")}]")
      .config("spark.sql.shuffle.partitions",
        sys.env.getOrElse("SPARK_GRAFT_CPUS", "32"))
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.ui.enabled", "false")
      .config("spark.local.dir",
        if (new java.io.File("/dev/shm").isDirectory) "/dev/shm/spark-local"
        else System.getProperty("java.io.tmpdir"))
      .getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    val sfDir = sys.env.getOrElse("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def cleanup(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    def minOf2(f: => Long): Double = {
      def once(): Double = {
        cleanup()
        val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
      }
      math.min(once(), once())
    }
    // warm the JVM with the report itself (C2 parity with Bench)
    SparkEntry.queries("ann_recall_report")(spark, sfDir).count()

    val legs: Seq[(String, () => Long)] = Seq(
      "brute_truth" -> (() =>
        SparkEntry.queries("ann_topk_brute")(spark, sfDir).count()),
      "ivf" -> (() =>
        SparkEntry.queries("ann_topk_ivf")(spark, sfDir).count()),
      "ivf_multiprobe" -> (() =>
        SparkEntry.queries("ann_topk_ivf_probes")(spark, sfDir).count()),
      "pq_rerank" -> (() =>
        SparkEntry.queries("ann_topk_pq")(spark, sfDir).count()),
      "sq8" -> (() =>
        SparkEntry.queries("ann_topk_sq8")(spark, sfDir).count()),
      "full_report" -> (() =>
        SparkEntry.queries("ann_recall_report")(spark, sfDir).count()))
    println("leg              min_of_2_s")
    legs.foreach { case (name, f) =>
      println(f"$name%-16s ${minOf2(f())}%9.3f")
    }
    spark.stop()
  }
}
