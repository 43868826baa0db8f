package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** NOT A TEST — a measurement main (`sbt "Test/runMain graft.ProbeStoreAge"`).
  *
  * Store-age axis for the ROW-UNION sidecar stores ([[ProbeSemAge]]
  * covers the semantic cell index): grow the exact-digest ingest
  * loop's digest store through many small micro-batches, compacted
  * (compactEvery=32) vs uncompacted control, and measure per-admission
  * wall time plus the store's DISCOVERY-UNIT count (directories the
  * reader must list to locate files — each a round-trip on an object
  * store; the old root-discovery read listed every batch=<id> dir per
  * admission, the compacted read lists O(log N runs + tail)). The
  * digest admission itself is a cheap md5 anti-join, so the metadata
  * path dominates and the contrast is visible even locally.
  */
object ProbeStoreAge {
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
    import graft.streaming.IngestDedup

    val nBatches = 256
    val rowsPer = 200
    val snapshots = Seq(64, 256)
    val compactEvery = 32
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("source", StringType)))
    def frame(b: Long, tag: String) = spark.createDataFrame(
      spark.sparkContext.parallelize((0 until rowsPer).map(j =>
        Row(b * 1000 + j, s"document $tag $b $j with its own words", "s")), 1),
      schema)

    val root = "/dev/shm/graft_probe_store_age"
    val fsP = new org.apache.hadoop.fs.Path(root)
    val fs = fsP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(fsP, true)
    def time[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    def build(tag: String, ce: Int): Unit = {
      for (b <- 0 until nBatches) {
        IngestDedup.admitLoop("text", s"$root/$tag/dig", s"$root/$tag/corp",
          compactEvery = ce)(frame(b.toLong, "grow"), b.toLong)
        if (snapshots.contains(b + 1)) {
          org.apache.hadoop.fs.FileUtil.copy(
            fs, new org.apache.hadoop.fs.Path(s"$root/$tag"),
            fs, new org.apache.hadoop.fs.Path(s"$root/${tag}_snap${b + 1}"),
            false, spark.sparkContext.hadoopConfiguration)
        }
      }
    }
    build("cmp", compactEvery)
    build("unc", Int.MaxValue)

    def cleanup(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    def units(dig: String): Int = {
      val p = new org.apache.hadoop.fs.Path(dig)
      fs.listStatus(p).count(s => s.isDirectory &&
        (s.getPath.getName.startsWith("batch=") ||
          s.getPath.getName.startsWith("run=")))
    }
    println("batches  cmp_admit_s cmp_units  unc_admit_s unc_units")
    var probeId = 1000000L
    for (snap <- snapshots.reverse) {
      def measure(tag: String): (Double, Int) = {
        val base = s"$root/${tag}_snap$snap"
        require(fs.exists(new org.apache.hadoop.fs.Path(s"$base/corp/batch=0")),
          s"snapshot $base is empty — wrong nesting level")
        def once(): Double = {
          cleanup()
          val b = frame(probeId, "probe")
          val t = time { IngestDedup.admitLoop("text", s"$base/dig",
            s"$base/corp", compactEvery = Int.MaxValue)(b, probeId) }
          // the manifest unit too: leaving it would forge the exact
          // "corpus id with no digest sidecar" signature the coverage
          // guard refuses on the next measurement
          for (d <- Seq(s"$base/corp/batch=$probeId", s"$base/dig/batch=$probeId",
              s"$base/corp/_manifest/batch=$probeId"))
            fs.delete(new org.apache.hadoop.fs.Path(d), true)
          probeId += 1
          t
        }
        (math.min(once(), once()), units(s"$base/dig"))
      }
      val (ct, cu) = measure("cmp")
      val (ut, uu) = measure("unc")
      println(f"$snap%7d  $ct%11.3f $cu%9d  $ut%11.3f $uu%9d")
    }

    // ---- r18: warm (shared-closure) vs cold (fresh-closure) loops ----
    // The Maintainer carries the store census across batches under the
    // single-writer contract; a fresh closure per batch (the r17 shape,
    // and the post-restart behavior) re-censuses every time. Both runs
    // go through a counting filesystem so the table shows per-admission
    // FILESYSTEM METADATA+DATA OPS, not just wall clock — each op is a
    // round-trip on an object store.
    spark.sparkContext.hadoopConfiguration
      .set("fs.cfs.impl", classOf[CountingLocalFs].getName)
    def buildCounted(tag: String, shared: Boolean): Seq[(Double, Long)] = {
      val base = s"cfs:$root/$tag"
      val sharedLoop = IngestDedup.admitLoop("text", s"$base/dig",
        s"$base/corp", compactEvery = compactEvery)
      (0 until nBatches).map { b =>
        val loop = if (shared) sharedLoop
          else IngestDedup.admitLoop("text", s"$base/dig", s"$base/corp",
            compactEvery = compactEvery)
        val o0 = CountingLocalFs.ops.get()
        val t = time { loop(frame(b.toLong, tag), b.toLong) }
        (t, CountingLocalFs.ops.get() - o0)
      }
    }
    // cold first, warm second (set SPARK_GRAFT_PROBE_FLIP=1 to reverse):
    // the two phases cannot interleave (each owns a store), so running
    // the probe once per order separates real effects from host drift —
    // the OPS columns are deterministic either way, wall is advisory
    val flip = sys.env.get("SPARK_GRAFT_PROBE_FLIP").contains("1")
    val (warm, cold) = if (flip) {
      val w = buildCounted("warm", shared = true)
      val c = buildCounted("cold", shared = false)
      (w, c)
    } else {
      val c = buildCounted("cold", shared = false)
      val w = buildCounted("warm", shared = true)
      (w, c)
    }
    def p50(xs: Seq[Double]): Double = xs.sorted.apply(xs.size / 2)
    println("window           warm_p50_s warm_ops_p50 warm_ops_max  " +
      "cold_p50_s cold_ops_p50 cold_ops_max")
    for ((lo, hi) <- Seq((0, 64), (64, 128), (128, 256))) {
      val w = warm.slice(lo, hi); val c = cold.slice(lo, hi)
      println(f"[$lo%3d,$hi%3d)      ${p50(w.map(_._1))}%10.3f " +
        f"${p50(w.map(_._2.toDouble))}%12.0f ${w.map(_._2).max}%12d  " +
        f"${p50(c.map(_._1))}%10.3f ${p50(c.map(_._2.toDouble))}%12.0f " +
        f"${c.map(_._2).max}%12d")
    }
    fs.delete(fsP, true)
    spark.stop()
  }
}
