package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** NOT A TEST — a measurement main (`sbt "Test/runMain graft.ProbeSemScale"`).
  *
  * Evidence probe for the r16 cell-bucketed semantic admission
  * ([[graft.streaming.SemDedupIngest]]): grows the admitted store in
  * waves and, at each size, times (a) a 1k-vector micro-batch through
  * the cell-PRUNED `admitLoop` and (b) the same batch through the
  * full-scan `admitAgainstStore` reference. The claim under test: the
  * pruned path's per-batch cost stays ~flat as the store grows 4×,
  * while the full scan pays the whole store each batch.
  *
  * Data: 256 tight clusters (unit directions + σ=0.06 gaussian noise)
  * in 64 dims — the SemDeDup-typical clustered regime where a tight
  * threshold prunes almost every cell. Growth waves run at t=0.9999
  * (kernel exact as ever, nothing is a dup at that bar, so the store
  * actually grows and the growth batches themselves stay cell-pruned);
  * the TIMED probe batches run at the SemDeDup-typical t=0.9 from a
  * single cluster, so they probe ~1 of 256 cells. Probe batches are
  * rolled back after timing so each wave's store size is exactly the
  * ingested waves.
  */
object ProbeSemScale {
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
    val waveSize = 250000
    val waves = 4
    val groups = 8 // growth sub-batches per wave, 32 clusters each
    val batchN = 1000
    val tProbe = 0.9
    val tGrow = 0.9999

    val rnd = new scala.util.Random(7)
    val dirs = Array.fill(nClusters) {
      val v = Array.fill(dim)(rnd.nextGaussian().toFloat)
      val n = math.sqrt(v.map(x => x.toDouble * x).sum).toFloat
      v.map(_ / n)
    }
    // cluster = id % 256: deliberately periodic ids — the shape that
    // exposed the old fixed-stride training sample (stride 16 aliased
    // with the 256-cluster cycle and left 240 clusters unsampled). The
    // loop now thins by golden-ratio hash order and seeds by
    // farthest-point traversal, so every cluster is modeled regardless
    // of id structure; the periodic ids stay as the regression canary
    def mkVec(id: Long, r: scala.util.Random): Array[Float] = {
      val d = dirs((id % nClusters).toInt)
      d.map(x => x + r.nextGaussian().toFloat * sigma)
    }
    val schema = StructType(Seq(
      StructField("vec_id", LongType),
      StructField("embedding", ArrayType(FloatType))))
    // partition counts are chosen to keep the STORE's file count
    // production-like (a real micro-batch writes a handful of corpus
    // files, not 32 files of 500 rows each — file-count pollution of
    // the store is a harness artifact, not a store property)
    def frame(ids: Seq[Long], seed: Int, parts: Int) = {
      val r = new scala.util.Random(seed)
      spark.createDataFrame(
        spark.sparkContext.parallelize(
          ids.map(i => Row(i, mkVec(i, r).toSeq)), parts),
        schema)
    }

    val corpusDir = "/dev/shm/graft_probe_sem/c"
    val fsP = new org.apache.hadoop.fs.Path("/dev/shm/graft_probe_sem")
    val fs = fsP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(fsP, true)

    def admit(t: Double)(df: org.apache.spark.sql.DataFrame, b: Long): Unit =
      SemDedupIngest.admitLoop("vec_id", "embedding", t, corpusDir,
        cells = nClusters, maxBatch = 1 << 21)(df, b)
    var nextBatch = 0L
    def time[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }
    def rollback(b: Long): Unit =
      for (d <- Seq(s"$corpusDir/batch=$b",
          s"$corpusDir/_manifest/batch=$b",
          s"${SemDedupIngest.cellsDir(corpusDir)}/batch=$b",
          s"${SemDedupIngest.summaryDir(corpusDir)}/batch=$b.json"))
        fs.delete(new org.apache.hadoop.fs.Path(d), true)

    // ---- build phase: grow the store, snapshotting after each wave ----
    // measurement runs AFTER the whole build, over the snapshots in
    // DESCENDING size order: a session-age effect (accumulated driver
    // state inflating later measurements) would bias the SMALL stores
    // up, so a flat-or-descending pruned column is conservative
    // evidence that per-batch cost does not follow store size.
    def snapDir(w: Int) = s"/dev/shm/graft_probe_sem/snap$w"
    for (w <- 0 until waves) {
      val base = w.toLong * waveSize
      if (w == 0) {
        // first wave spans every cluster in ONE batch: the store is
        // empty (no kernel), and training sees all 256 directions
        admit(tGrow)(frame(base until base + waveSize, 100, 32), nextBatch)
        nextBatch += 1
      } else {
        // growth sub-batches: 32 clusters each, so probeCells keeps
        // ~32/256 cells and the growth kernel stays bounded
        val perGroup = nClusters / groups
        for (g <- 0 until groups) {
          val ids = (base until base + waveSize)
            .filter(i => ((i % nClusters) / perGroup).toInt == g)
          admit(tGrow)(frame(ids, 100 + w * groups + g, 4), nextBatch)
          nextBatch += 1
        }
      }
      org.apache.hadoop.fs.FileUtil.copy(
        fs, new org.apache.hadoop.fs.Path(corpusDir),
        fs, new org.apache.hadoop.fs.Path(snapDir(w)),
        false, spark.sparkContext.hadoopConfiguration)
    }

    // ---- measure phase: 1k-vector probe batch from ONE cluster at the
    // SemDeDup-typical t=0.9, min-of-2 warm, Bench-style cleanup
    // between passes, probe batches rolled back after timing ----
    def cleanup(): Unit = {
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      System.gc()
    }
    println("store_size  pruned_admit_s  fullscan_admit_s")
    var probeId = nextBatch + 1000
    for (w <- (waves - 1) to 0 by -1) {
      // FileUtil.copy with a fresh dst makes the dst ITSELF the copy
      val dir = snapDir(w)
      val storeSize = SemDedupIngest.storeVectors(spark, dir, schema).count()
      def admitSnap(df: org.apache.spark.sql.DataFrame, b: Long): Unit =
        SemDedupIngest.admitLoop("vec_id", "embedding", tProbe, dir,
          cells = nClusters, maxBatch = 1 << 21)(df, b)
      def rollbackSnap(b: Long): Unit =
        for (d <- Seq(s"$dir/batch=$b",
            s"$dir/_manifest/batch=$b",
            s"${SemDedupIngest.cellsDir(dir)}/batch=$b",
            s"${SemDedupIngest.summaryDir(dir)}/batch=$b.json"))
          fs.delete(new org.apache.hadoop.fs.Path(d), true)
      def prunedOnce(): Double = {
        val ids = (0 until batchN).map(j => 10000000L + j * nClusters + 3)
        val b = frame(ids, 999 + w, 1)
        cleanup()
        val t = time { admitSnap(b, probeId) }
        rollbackSnap(probeId); probeId += 1
        t
      }
      def fullOnce(): Double = {
        val ids = (0 until batchN).map(j => 20000000L + j * nClusters + 3)
        val b = frame(ids, 555 + w, 1)
        val store = SemDedupIngest.storeVectors(spark, dir, schema)
        cleanup()
        time { SemDedupIngest.admitAgainstStore(
          store, b, "vec_id", "embedding", tProbe).count() }
      }
      val pruned = math.min(prunedOnce(), prunedOnce())
      val full = math.min(fullOnce(), fullOnce())
      println(f"$storeSize%10d $pruned%15.3f $full%17.3f")
    }
    fs.delete(fsP, true)
    spark.stop()
  }
}
