package graft

import org.apache.spark.scheduler._
import org.apache.spark.sql.SparkSession

/** NOT A TEST — a measurement main (`sbt "Test/runMain graft.ProbeNearDup"`).
  *
  * Per-job decomposition of the `stream_neardup_ingest` oracle query
  * (the costliest driver bench row, r16: 7.80 s): a SparkListener
  * records every job's wall time, stage count, task count and shuffle
  * volumes while the query runs end-to-end, so the fixed-cost pass
  * (r17 verdict item 2) cuts what is actually expensive instead of
  * guessing. Run twice in-session; read the SECOND block (warm JVM —
  * the same discipline as Bench's min-of-2).
  */
object ProbeNearDup {
  final case class JobRow(id: Int, ms: Long, stages: Int, tasks: Int,
                          shufWriteMB: Double, desc: String)

  def main(args: Array[String]): Unit = {
    val which = args.headOption.getOrElse("stream_neardup_ingest")
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

    val jobs = new java.util.concurrent.ConcurrentHashMap[Int, (Long, String)]()
    val stagesOf = new java.util.concurrent.ConcurrentHashMap[Int, Seq[Int]]()
    val stageTasks = new java.util.concurrent.ConcurrentHashMap[Int, (Int, Double)]()
    val done = new java.util.concurrent.ConcurrentLinkedQueue[JobRow]()
    spark.sparkContext.addSparkListener(new SparkListener {
      override def onJobStart(e: SparkListenerJobStart): Unit = {
        val props = Option(e.properties)
        val desc = props.map(_.getProperty("callSite.short")).flatMap(Option(_))
          .orElse(props.map(_.getProperty("spark.job.description"))
            .flatMap(Option(_)))
          .getOrElse("?").replace('\n', ' ').take(90)
        jobs.put(e.jobId, (e.time, desc))
        stagesOf.put(e.jobId, e.stageIds)
        ()
      }
      override def onStageCompleted(e: SparkListenerStageCompleted): Unit = {
        stageTasks.put(e.stageInfo.stageId, (e.stageInfo.numTasks,
          e.stageInfo.taskMetrics.shuffleWriteMetrics.bytesWritten / 1e6))
        ()
      }
      override def onJobEnd(e: SparkListenerJobEnd): Unit = {
        Option(jobs.get(e.jobId)).foreach { case (t0, desc) =>
          val sids = Option(stagesOf.get(e.jobId)).getOrElse(Seq.empty)
          val st = sids.flatMap(s => Option(stageTasks.get(s)))
          done.add(JobRow(e.jobId, e.time - t0, st.size,
            st.map(_._1).sum, st.map(_._2).sum, desc))
        }
        ()
      }
    })

    for (pass <- 1 to 2) {
      done.clear()
      val t0 = System.nanoTime()
      val n = SparkEntry.queries(which)(spark, sfDir).count()
      val total = (System.nanoTime() - t0) / 1e9
      spark.sharedState.cacheManager.clearCache()
      spark.sparkContext.getPersistentRDDs.values
        .foreach(_.unpersist(blocking = false))
      Thread.sleep(500) // let listener events drain
      import scala.jdk.CollectionConverters._
      val rows = done.asScala.toSeq.sortBy(_.id)
      println(f"\n== pass $pass: $which rows=$n total=$total%.2f s, " +
        f"${rows.size} jobs, job-time sum=${rows.map(_.ms).sum / 1e3}%.2f s ==")
      rows.foreach { r =>
        println(f"job ${r.id}%3d ${r.ms}%6d ms  stages=${r.stages}%2d " +
          f"tasks=${r.tasks}%4d shufW=${r.shufWriteMB}%8.2f MB  ${r.desc}")
      }
      println("-- top 12 by time --")
      rows.sortBy(-_.ms).take(12).foreach { r =>
        println(f"job ${r.id}%3d ${r.ms}%6d ms  tasks=${r.tasks}%4d  ${r.desc}")
      }
    }
    spark.stop()
  }
}
