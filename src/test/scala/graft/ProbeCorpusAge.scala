package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.types._

/** NOT A TEST — a measurement main
  * (`sbt "Test/runMain graft.ProbeCorpusAge"`).
  *
  * The r18 verdict's open question: the one remaining O(store-age)
  * metadata cost is the COLD-path listing of the user-facing corpus dir
  * (`batch=<id>` per micro-batch forever, never compacted) by the
  * restart/coverage guards — paid at every restart and every
  * compactEvery-th batch. This probe quantifies that cost at REAL store
  * ages (256 → 16384 batches; a year of 1-minute triggers is ~525k) by
  * SYNTHESIZING the aged layout — replaying [[graft.streaming.BatchStore
  * .planCompaction]] driver-side to get the exact compacted sidecar
  * layout age N would have, copying a one-file parquet template into
  * each unit, and mkdir-ing the N corpus batch dirs — then running ONE
  * cold admission (fresh [[graft.streaming.IngestDedup.admitLoop]]
  * closure, the post-restart shape) at batchId=N through the counting
  * filesystem. Each counted op is a round-trip on an object store; a
  * local `listStatus` of an N-entry dir counts ~N ops, which is honest
  * (object-store list pagination is O(N)).
  *
  * Two cold admissions are measured per age: the FIRST fresh closure
  * (on a store with no `_manifest`: pre-manifest cost, and post-manifest
  * the one-time bootstrap that rebuilds the manifest from the raw
  * listing) and a SECOND fresh closure (pre-manifest: an A/A control;
  * post-manifest: the steady-state cold cost through the manifest).
  * Ops are bucketed by path: corpus-root discovery (the O(age) part)
  * vs the `_manifest` store vs the digest sidecar vs the admission's
  * own batch writes. */
object ProbeCorpusAge {
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
    import graft.streaming.{BatchStore, IngestDedup}
    import BatchStore.IndexSource

    val ages = args.headOption.map(_.split(",").map(_.toInt).toSeq)
      .getOrElse(Seq(256, 1024, 4096, 8192, 16384))
    val compactEvery = 32
    val schema = StructType(Seq(
      StructField("doc_id", LongType), StructField("text", StringType),
      StructField("source", StringType)))

    val localRoot = "/dev/shm/graft_probe_corpus_age"
    val root = s"cfs:$localRoot"
    spark.sparkContext.hadoopConfiguration
      .set("fs.cfs.impl", classOf[CountingLocalFs].getName)
    val fsP = new org.apache.hadoop.fs.Path(root)
    val fs = fsP.getFileSystem(spark.sparkContext.hadoopConfiguration)
    fs.delete(fsP, true)

    // one-file parquet template (with _SUCCESS) copied into every unit —
    // the probe measures METADATA discovery, not data-read volume
    def frame(b: Long) = spark.createDataFrame(
      spark.sparkContext.parallelize((0 until 50).map(j =>
        Row(b * 1000 + j, s"probe document $b $j with its own words", "s")), 1),
      schema)
    val tmplDir = new org.apache.hadoop.fs.Path(s"$root/_tmpl")
    frame(0L).coalesce(1).write.parquet(tmplDir.toString)

    // replay planCompaction to the exact layout age N reaches with the
    // real maintenance (binary-counter runs + a bounded tail)
    def layoutAt(n: Int): Seq[IndexSource] = {
      var tail = Vector.empty[IndexSource]
      var runs = Vector.empty[IndexSource]
      for (b <- 0 until n) {
        tail :+= IndexSource(s"batch=$b", b.toLong, b.toLong)
        BatchStore.planCompaction(tail, runs, compactEvery).foreach { ms =>
          val m = IndexSource(s"run=${ms.head.lo}-${ms.last.hi}",
            ms.head.lo, ms.last.hi)
          val dead = ms.toSet
          runs = runs.filterNot(dead) :+ m
          tail = tail.filterNot(dead)
        }
      }
      (runs ++ tail).sortBy(_.lo)
    }

    def copyUnit(dst: org.apache.hadoop.fs.Path): Unit = {
      org.apache.hadoop.fs.FileUtil.copy(fs, tmplDir, fs, dst, false,
        spark.sparkContext.hadoopConfiguration)
      ()
    }
    def time[T](f: => T): Double = {
      val t0 = System.nanoTime(); f; (System.nanoTime() - t0) / 1e9
    }

    println("age      pass  wall_s   ops_total  corpus_list  manifest  " +
      "digest  own_writes  other")
    for (n <- ages) {
      val base = s"$root/age$n"
      val corp = s"$base/corp"; val dig = s"$base/dig"
      val units = layoutAt(n)
      for (u <- units) copyUnit(new org.apache.hadoop.fs.Path(s"$dig/${u.name}"))
      for (b <- 0 until n)
        fs.mkdirs(new org.apache.hadoop.fs.Path(s"$corp/batch=$b"))
      spark.sharedState.cacheManager.clearCache()
      System.gc()

      // pass 1: fresh closure, no _manifest (pre-manifest cost / the
      // one-time bootstrap); pass 2: fresh closure again (A/A control /
      // steady-state cold-through-manifest — note the bootstrapped
      // manifest is ONE run, the best case); pass 3: the manifest
      // replaced by the layout a LOOP-GROWN store of age N carries
      // (O(log N) runs + tail, from the same planCompaction replay) —
      // the honest steady-state cold cost
      def plantGrownManifest(): Unit = {
        val mRoot = new org.apache.hadoop.fs.Path(s"$corp/_manifest")
        fs.delete(mRoot, true)
        for (u <- units) {
          val d = new org.apache.hadoop.fs.Path(mRoot, u.name)
          fs.mkdirs(d)
          if (u.isRun) {
            val out = fs.create(
              new org.apache.hadoop.fs.Path(d, "_SUCCESS"), true)
            out.close()
          }
        }
      }
      for (pass <- 1 to 3) {
        if (pass == 3) plantGrownManifest()
        val m0 = CountingLocalFs.mark()
        val w = time {
          IngestDedup.admitLoop("text", dig, corp,
            compactEvery = compactEvery)(frame(900000L + n), n.toLong)
        }
        val tr = CountingLocalFs.since(m0, s"$localRoot/age$n")
        def bucket(p: (String, String)): String = {
          val path = p._2
          if (path.contains(s"/batch=$n")) "own"
          else if (path.contains("/_manifest")) "manifest"
          else if (path.contains("/dig")) "digest"
          else if (path.contains("/corp")) "corpus"
          else "other"
        }
        val byB = tr.groupBy(bucket).map { case (k, v) => (k, v.size) }
          .withDefaultValue(0)
        println(f"$n%6d   $pass%4d  $w%6.2f  ${tr.size}%10d  " +
          f"${byB("corpus")}%11d  ${byB("manifest")}%8d  ${byB("digest")}%6d  " +
          f"${byB("own")}%10d  ${byB("other")}%5d")
        // remove the probe batch so the next pass is cold at the same id
        for (d <- Seq(s"$corp/batch=$n", s"$dig/batch=$n",
            s"$corp/_manifest/batch=$n"))
          fs.delete(new org.apache.hadoop.fs.Path(d), true)
      }
      fs.delete(new org.apache.hadoop.fs.Path(base), true)
    }
    fs.delete(fsP, true)
    spark.stop()
  }
}
