package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{LongType, StructType}

/** Reader for the growing `batch=<id>/` parquet stores the closed
  * ingest loops append to — ONE definition (IngestDedup and
  * NearDupIngest previously carried near-identical copies, and both had
  * the same wedge: an UNschema'd `spark.read.parquet` dies on schema
  * inference when every batch partition is fileless, which is exactly
  * what an all-empty first micro-batch produces — Spark writes no part
  * files for empty tasks — and then every restart replays into the same
  * crash).
  *
  * The read always passes the caller's schema (+ the `batch` partition
  * column) explicitly, so a store of empty partitions is just an empty
  * frame. `excludeBatch` hides one partition — the caller's own batch
  * id on replay, so a replayed batch never sees its previous partial
  * attempt's output and self-refuses (see admitLoop). */
object BatchStore {

  /** Refuse a store whose partitions are AHEAD of the current batch id —
    * the signature of a RESTARTED CHECKPOINT over an existing store
    * (batch ids reset to 0): proceeding would overwrite the old
    * partitions one by one, silent progressive data loss. Under the
    * engine's sequential offsets + replay, a `batch=<id>` dir with
    * id > batchId cannot legitimately exist (a replay sees at most its
    * own id). */
  def requireNotAhead(spark: SparkSession, dir: String, batchId: Long,
                      what: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return
    val ahead = fs.listStatus(p).toSeq.map(_.getPath.getName)
      .filter(_.startsWith("batch="))
      .flatMap(_.stripPrefix("batch=").toLongOption)
      .filter(_ > batchId)
    require(ahead.isEmpty,
      s"$what store at $dir holds batches ${ahead.sorted.mkString(",")} " +
        s"beyond batch $batchId — a restarted checkpoint must use a fresh " +
        "store directory (or resume the old checkpoint); continuing would " +
        "overwrite previously ingested partitions one by one")
  }

  /** Take-once stamp: atomically claim `file` with `content` and return
    * whatever the file holds AFTER the claim — `content` if this caller
    * won, the earlier writer's text otherwise. The content is written to
    * a hidden temp sibling first and the CLAIM is
    * `rename(temp, file)` — atomic and non-overwriting on HDFS-like
    * filesystems — so the stamp is only ever observable COMPLETE. (The
    * r15 form claimed with `create(overwrite = false)`: the claim was
    * atomic but the content write+close was not, so a racer that lost
    * and read back immediately could see an empty/partial stamp and fail
    * its `require` with a misleading value — fail-safe, but masking the
    * real conflict.) Callers `require` the returned text matches what
    * they expect. */
  def takeOnceStamp(spark: SparkSession, file: org.apache.hadoop.fs.Path,
                    content: String): String = {
    val fs = file.getFileSystem(spark.sparkContext.hadoopConfiguration)
    def readBack(): String = {
      val in = fs.open(file)
      try scala.io.Source.fromInputStream(in, "UTF-8").mkString
      finally in.close()
    }
    if (fs.exists(file)) readBack()
    else {
      fs.mkdirs(file.getParent)
      val tmp = new org.apache.hadoop.fs.Path(file.getParent,
        s"._tmp_${file.getName}_${java.util.UUID.randomUUID}")
      try {
        val out = fs.create(tmp, false)
        try out.write(content.getBytes("UTF-8")) finally out.close()
        // On HDFS the old-API rename refuses an existing destination
        // (returns false) — an atomic claim. RawLocalFileSystem maps to
        // POSIX rename, which OVERWRITES — so the local-FS uniqueness
        // window is the same TOCTOU the create form had; but rename is
        // atomic even when overwriting, so a reader NEVER observes
        // partial content on either filesystem (the property this form
        // buys). The exists() here narrows the local window.
        if (fs.exists(file)) readBack()
        else if (fs.rename(tmp, file)) content
        else readBack()
      } catch {
        // the file appeared between exists and rename on a filesystem
        // that errors instead of returning false
        case _: java.io.IOException => readBack()
      } finally {
        if (fs.exists(tmp)) fs.delete(tmp, false)
        ()
      }
    }
  }

  def read(spark: SparkSession, dir: String, schema: StructType,
           excludeBatch: Option[Long] = None): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val hasBatches = fs.exists(p) && fs.listStatus(p)
      .exists(s => s.isDirectory && s.getPath.getName.startsWith("batch="))
    if (!hasBatches)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else {
      val all = spark.read.schema(schema.add("batch", LongType))
        .parquet(dir)
      excludeBatch.fold(all)(b => all.filter(col("batch") =!= b))
        .select(schema.fieldNames.toSeq.map(col): _*)
    }
  }
}
