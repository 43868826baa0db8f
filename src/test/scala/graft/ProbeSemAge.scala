package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** NOT A TEST — a measurement main (`sbt "Test/runMain graft.ProbeSemAge"`).
  *
  * The STORE-AGE axis of the semantic-ingest evidence ([[ProbeSemScale]]
  * covers store SIZE): grow a store through MANY SMALL micro-batches and
  * show that with index compaction the per-batch cost — wall time AND
  * metadata-operation counts (summary files read, probe paths
  * constructed) — is bounded in BATCH COUNT, while the uncompacted
  * control grows linearly. The r16 layout was flat in store size but
  * opened one summary file per historical batch per micro-batch —
  * O(store-age) filesystem round-trips forever, which on an object
  * store is 10⁴–10⁶ GETs per admission by 10⁴–10⁶ batches. Wall times
  * here are local-fs (round-trips are ~0.1 ms, not the ~10–100 ms of an
  * object store), so the OP COUNTS are the at-scale story and the wall
  * clock is the local corroboration.
  *
  * Data: 256 tight clusters in 64 dims (the ProbeSemScale regime).
  * Batch 0 spans all clusters (trains the quantizer); every later batch
  * draws from one of 16 cluster groups so growth admission stays
  * cell-pruned. Two identical stores are built — compactEvery=32 vs
  * uncompacted (MaxValue) — snapshotting at 64/128/256/512 batches;
  * measurement runs AFTER both builds, in DESCENDING batch count
  * (session-age bias then inflates the SMALL stores — conservative),
  * with min-of-2 probe batches at t=0.9 rolled back after timing.
  * Measured probe calls pass compactEvery=MaxValue for BOTH stores so
  * the timing is pure admission (compaction is an amortized build cost,
  * reported via the per-window build p50/max — the max column is where
  * compaction spikes land).
  */
object ProbeSemAge {
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
    import graft.streaming.SemDedupIngest

    val dim = 64
    val nClusters = 256
    val sigma = 0.06f
    val nBatches = 512
    val batchRows = 1000
    val groups = 16 // 16 clusters per growth batch
    val snapshots = Seq(64, 128, 256, 512)
    val compactEvery = 32
    val tGrow = 0.9999
    val tProbe = 0.9

    val rnd = new scala.util.Random(7)
    val dirs = Array.fill(nClusters) {
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    def mkVec(id: Long, r: scala.util.Random): Array[Float] = {
      val d = dirs((id % nClusters).toInt)
      d.map(x => x + r.nextGaussian().toFloat * sigma)
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    def frame(ids: Seq[Long], seed: Int, parts: Int) = {
      val r = new scala.util.Random(seed)
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          ids.map(i => Row(i, mkVec(i, r).toSeq)), parts),
        schema)
    }
    // ids congruent to the wanted cluster mod 256: batch b owns the
    // id block (b << 20); batch 0 covers every residue (trains all 256
    // directions), batch b>0 covers group (b-1) % 16's 16 clusters
    def batchIds(b: Int): Seq[Long] =
      if (b == 0) (0L until 2048L)
      else {
        val g = (b - 1) % groups
        (0 until batchRows).map { j =>
          (b.toLong << 20) + (j / 16).toLong * 256 + (g * 16 + j % 16)
        }
      }

    val root = "/dev/shm/graft_probe_age"
    val fsP = new org.apache.hadoop.fs.Path(root)
    val fs = fsP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(fsP, true)

    def time[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    // ---- build both stores, timing every growth batch ----
    def build(tag: String, ce: Int): Map[Int, Seq[Double]] = {
      val corpusDir = s"$root/$tag/c"
      val times = scala.collection.mutable.Map[Int, Seq[Double]]()
      val buf = scala.collection.mutable.ArrayBuffer[Double]()
      for (b <- 0 until nBatches) {
        val t = time {
          SemDedupIngest.admitLoop("vec_id", "embedding", tGrow, corpusDir,
            cells = nClusters, maxBatch = 1 << 21, compactEvery = ce)(
            frame(batchIds(b), 100 + b, 2), b.toLong)
        }
        buf += t
        if (snapshots.contains(b + 1)) {
          times(b + 1) = buf.toSeq; buf.clear()
          org.apache.hadoop.fs.FileUtil.copy(
            fs, new org.apache.hadoop.fs.Path(corpusDir),
            fs, new org.apache.hadoop.fs.Path(s"$root/$tag/snap${b + 1}"),
            false, spark.sparkContext.hadoopConfiguration)
        }
      }
      times.toMap
    }
    val tC = build("compacted", compactEvery)
    val tU = build("uncompacted", Int.MaxValue)
    def p50(xs: Seq[Double]) = xs.sorted.apply(xs.size / 2)
    println(s"build windows (per-batch admit+write seconds; compaction " +
      s"spikes land in the max column; compactEvery=$compactEvery)")
    println("window           cmp_p50 cmp_max  unc_p50 unc_max")
    snapshots.zip(0 +: snapshots.init).foreach { case (hi, lo) =>
      println(f"[$lo%3d,$hi%3d)       ${p50(tC(hi))}%7.3f ${tC(hi).max}%7.3f" +
        f"  ${p50(tU(hi))}%7.3f ${tU(hi).max}%7.3f")
    }

    // ---- measure phase: descending batch count, min-of-2, rollback ----
    def cleanup(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    // metadata-op counts, computed the way admission computes them
    def opCounts(dir: String, units: Array[Array[Double]]): (Int, Int) = {
      val (eff, _) = graft.streaming.BatchStore.effectiveSources(
        SemDedupIngest.listSources(spark, dir))
      val stats = SemDedupIngest.cellStats(spark, dir, eff)
      val cents = SemDedupIngest.parseCentroids(
        graft.streaming.BatchStore.takeOnceStamp(spark,
          new org.apache.hadoop.fs.Path(
            SemDedupIngest.cellsDir(dir), "_centroids"), ""))
      val probe = SemDedupIngest.probeCells(cents, stats.radius, units, tProbe)
      (eff.size, stats.population.count(pc => probe(pc._2)))
    }
    println("\nprobe batch (1k rows from one 16-cluster group, t=0.9, " +
      "min-of-2; sum_files = summary files read per admission, " +
      "paths = probed leaf dirs opened)")
    println("batches  cmp_admit_s cmp_files cmp_paths  unc_admit_s unc_files unc_paths")
    var probeId = 1000000L
    for (snap <- snapshots.reverse) {
      def measure(tag: String): (Double, Int, Int) = {
        val dir = s"$root/$tag/snap$snap" // FileUtil.copy: fresh dst IS the copy
        require(fs.exists(new org.apache.hadoop.fs.Path(s"$dir/batch=0")),
          s"snapshot store $dir is empty — measuring nothing (the r17 " +
            "first-cut measured exactly this: a wrong nesting level)")
        val ids = (0 until batchRows).map(j =>
          (900L << 40) + (j / 16).toLong * 256 + (j % 16))
        def once(): Double = {
          val b = frame(ids, 999, 1)
          cleanup()
          val t = time {
            SemDedupIngest.admitLoop("vec_id", "embedding", tProbe, dir,
              cells = nClusters, maxBatch = 1 << 21,
              compactEvery = Int.MaxValue)(b, probeId)
          }
          for (d <- Seq(s"$dir/batch=$probeId",
              s"$dir/_manifest/batch=$probeId",
              s"${SemDedupIngest.cellsDir(dir)}/batch=$probeId",
              s"${SemDedupIngest.summaryDir(dir)}/batch=$probeId.json"))
            fs.delete(new org.apache.hadoop.fs.Path(d), true)
          probeId += 1
          t
        }
        val t = math.min(once(), once())
        val r = new scala.util.Random(999)
        val units = ids.map(i => mkVec(i, r).map(_.toDouble)).toArray
        // normalize (mkVec outputs are near-unit; exactness irrelevant
        // for a count probe, but keep the geometry honest)
        val uns = units.map { u =>
          val n = math.sqrt(u.map(x => x * x).sum); u.map(_ / n)
        }
        val (nf, np) = opCounts(dir, uns)
        (t, nf, np)
      }
      val (ct, cf, cp) = measure("compacted")
      val (ut, uf, up) = measure("uncompacted")
      println(f"$snap%7d  $ct%11.3f $cf%9d $cp%9d  $ut%11.3f $uf%9d $up%9d")
    }
    fs.delete(fsP, true)
    spark.stop()
  }
}
