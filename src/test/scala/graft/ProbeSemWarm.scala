package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** NOT A TEST — a measurement main
  * (`sbt "Test/runMain graft.ProbeSemWarm"`).
  *
  * Semantic-ingest twin of [[ProbeStoreAge]]'s warm/cold table: grow
  * the cell-bucketed semantic store through many micro-batches with a
  * SHARED admitLoop closure (the production shape — the Maintainer +
  * stats/centroid caches carry across batches) vs a FRESH closure per
  * batch (the r17 shape, and the post-restart behavior), both through
  * the counting filesystem, and report per-batch wall, total fs ops,
  * and SUMMARY-FILE OPENS — the r17 store-age probe measured 33–36
  * summary reads per admission flat in age; the warm chain's claim is
  * ZERO between compaction triggers, served from the in-memory stats
  * cache the loop maintains as it writes. */
object ProbeSemWarm {
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
    spark.sparkContext.hadoopConfiguration
      .set("fs.cfs.impl", classOf[CountingLocalFs].getName)
    import graft.streaming.SemDedupIngest

    val nBatches = 128
    val rowsPer = 500
    val dims = 64
    val clusters = 64
    val compactEvery = 32
    val threshold = 0.92
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType)),
      StructField("source", StringType)))
    // deterministic cluster-structured vectors (golden-ratio mixed ids
    // — periodic-id aliasing was a measured probe pitfall)
    val dirs = Array.tabulate(clusters, dims) { (c, d) =>
      val x = (c * 1103515245L + d * 12345L) % 1000L
      (x / 500.0 - 1.0).toFloat
    }
    def mkVec(id: Long): Array[Float] = {
      val c = ((id * 0x9E3779B97F4A7C15L >>> 33) % clusters).toInt
      val noise = (id * 2654435761L % 100L) / 2000.0f
      dirs(c).map(x => x + noise)
    }
    def frame(b: Long): org.apache.spark.sql.DataFrame =
      spark.createDataFrame(
        spark.sparkContext.parallelize((0 until rowsPer).map { j =>
          val id = b * 10000L + j
          Row(id, mkVec(id).toSeq, "s")
        }, 1), schema)

    val root = "/dev/shm/graft_probe_sem_warm"
    val fsP = new org.apache.hadoop.fs.Path(root)
    val fs = fsP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(fsP, true)
    def time[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // (wall, totalOps, summaryOpens) per batch
    def build(tag: String, shared: Boolean): Seq[(Double, Long, Long)] = {
      val dir = s"cfs:$root/$tag/c"
      val sharedLoop = SemDedupIngest.admitLoop("vec_id", "embedding",
        threshold, dir, cells = clusters, compactEvery = compactEvery)
      (0 until nBatches).map { b =>
        val loop = if (shared) sharedLoop
          else SemDedupIngest.admitLoop("vec_id", "embedding", threshold,
            dir, cells = clusters, compactEvery = compactEvery)
        CountingLocalFs.drain()
        val o0 = CountingLocalFs.ops.get()
        val t = time { loop(frame(b.toLong), b.toLong) }
        val tr = CountingLocalFs.drain()
        (t, CountingLocalFs.ops.get() - o0,
          tr.count { case (op, p) =>
            op == "open" && p.contains("/_summary/") }.toLong)
      }
    }
    // cold first / warm second by default; flip with the env knob (the
    // ProbeStoreAge finding: the later phase always runs slower on
    // this box, so wall is advisory — the op columns are deterministic)
    val flip = sys.env.get("SPARK_GRAFT_PROBE_FLIP").contains("1")
    val (warm, cold) = if (flip) {
      val w = build("warm", shared = true)
      val c = build("cold", shared = false)
      (w, c)
    } else {
      val c = build("cold", shared = false)
      val w = build("warm", shared = true)
      (w, c)
    }
    def p50(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    println("window        warm_p50_s warm_ops_p50 warm_sumrd_p50 warm_sumrd_max  " +
      "cold_p50_s cold_ops_p50 cold_sumrd_p50")
    for ((lo, hi) <- Seq((0, 32), (32, 64), (64, 128))) {
      val w = warm.slice(lo, hi); val c = cold.slice(lo, hi)
      println(f"[${lo}%3d,${hi}%3d)   ${p50(w.map(_._1))}%10.3f " +
        f"${p50(w.map(_._2.toDouble))}%12.0f ${p50(w.map(_._3.toDouble))}%14.0f " +
        f"${w.map(_._3).max}%14d  ${p50(c.map(_._1))}%10.3f " +
        f"${p50(c.map(_._2.toDouble))}%12.0f ${p50(c.map(_._3.toDouble))}%14.0f")
    }
    fs.delete(fsP, true)
    spark.stop()
  }
}
