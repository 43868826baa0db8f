package graft.streaming

import graft.operators.IncrementalAgg
import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{Column, DataFrame, SparkSession}

/** Streaming materialized-view maintenance — the streaming face of
  * [[IncrementalAgg]]: a `foreachBatch` sink that keeps a group-grain
  * partial-aggregate state table under `stateDir`, merging each
  * micro-batch's partials with the previous state. Refresh cost per
  * batch is O(batch + |groups|) no matter how much history the metric
  * covers — the same algebra `events_incr_refresh` hash-gates against
  * a full recompute, now applied across micro-batch boundaries.
  *
  * Exactly-once without a transactional store: state versions are keyed
  * by the streaming batch id (`v<batchId>`, `_SUCCESS`-gated). A batch
  * merges the newest version with id < its OWN id, and a replayed batch
  * overwrites only its own version — at-least-once delivery converges
  * to the same bytes (the jdbcIdempotentAppend discipline, applied to a
  * parquet state table). Superseded versions beyond a two-deep undo
  * window are pruned so storage stays bounded. */
object MvRefresh {

  /** The foreachBatch hook: `stream.writeStream.foreachBatch(
    * MvRefresh.refresh(dir, Seq("k"), col("v")) _)`.
    *
    * `streamId` (optional): any string stable for the LIFE OF THE
    * CHECKPOINT (its path is the natural choice). When set, the state
    * dir is stamped on first use and any later stream with a DIFFERENT
    * id is refused — this closes the one restart hole the version guard
    * below cannot see: an old stateDir holding exactly `v0` is
    * indistinguishable from this stream's own batch-0 replay by
    * versions alone. */
  def refresh(stateDir: String, keyCols: Seq[String], valueFp: Column,
              streamId: Option[String] = None)(
      batch: DataFrame, batchId: Long): Unit = {
    val spark = batch.sparkSession
    requireSameStream(spark, stateDir, streamId)
    // one listing per batch — versionBefore and prune reuse it (a
    // listing plus per-version _SUCCESS probes is driver-side RPC cost
    // an object store charges for three times over otherwise)
    val versions = publishedVersions(spark, stateDir)
    // A fresh checkpoint over an existing stateDir restarts batch ids
    // at 0: versionBefore(0) would silently drop all accumulated state
    // while read() keeps serving the stale old max version forever —
    // writers and readers diverging with no error. Refuse loudly;
    // v == batchId is the legitimate replay-overwrite case.
    val stale = versions.filter(_ > batchId)
    require(stale.isEmpty,
      s"stateDir $stateDir holds versions ${stale.sorted.mkString(",")} " +
        s"beyond batch $batchId — a restarted checkpoint must use a fresh " +
        "stateDir (or resume the old checkpoint)")
    val delta = IncrementalAgg.partials(batch, keyCols, valueFp)
    val merged = versionBefore(spark, stateDir, versions, batchId) match {
      case Some(st) => IncrementalAgg.merge(Seq(st, delta), keyCols)
      case None => delta
    }
    // reads touch only versions < batchId, so overwriting v<batchId>
    // (the replay case) never destroys this computation's own input
    merged.write.mode("overwrite").parquet(s"$stateDir/v$batchId")
    prune(spark, stateDir, versions :+ batchId, batchId)
  }

  /** Latest published state, if any. LAZY over the current max version:
    * the returned frame is valid for the retention window (two further
    * batches — see prune) and must be acted on or pinned
    * (localCheckpoint) within it; a consumer that holds it across many
    * batches will find the version's files pruned under it. */
  def read(spark: SparkSession, stateDir: String): Option[DataFrame] = {
    val versions = publishedVersions(spark, stateDir)
    versionBefore(spark, stateDir, versions, Long.MaxValue)
  }

  /** First-use stamp + same-stream check (see [[refresh]]'s streamId).
    * Take-once ([[BatchStore.takeOnceStamp]]): two different streams
    * racing on an empty stateDir cannot both pass — exactly one owns the
    * stamp and the other fails this require. */
  private def requireSameStream(spark: SparkSession, stateDir: String,
                                streamId: Option[String]): Unit =
    streamId.foreach { id =>
      val prev = BatchStore.takeOnceStamp(spark,
        new Path(stateDir, "_stream_id"), id)
      require(prev == id,
        s"stateDir $stateDir belongs to stream '$prev', not '$id' — a " +
          "restarted checkpoint must use a fresh stateDir")
    }

  private def versionBefore(spark: SparkSession, stateDir: String,
                            versions: Seq[Long], id: Long): Option[DataFrame] = {
    versions.filter(_ < id) match {
      case Seq() => None
      case vs => Some(spark.read.parquet(s"$stateDir/v${vs.max}"))
    }
  }

  private def publishedVersions(spark: SparkSession, stateDir: String): Seq[Long] = {
    val path = new Path(stateDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(path)) Seq.empty
    else fs.listStatus(path).toSeq.map(_.getPath)
      .flatMap(p =>
        // toLongOption, not isDigit: a stray dir named exactly "v" (or a
        // beyond-Long digit string) must be ignored, not crash every
        // later refresh
        if (p.getName.startsWith("v") && fs.exists(new Path(p, "_SUCCESS")))
          p.getName.drop(1).toLongOption
        else None)
  }

  /** Keep the newest two versions ≤ `upTo` (current + one undo step for
    * an in-flight replay of the previous batch); delete the rest.
    * `versions` is the caller's pre-write listing plus its own new
    * version — no second listing. */
  private def prune(spark: SparkSession, stateDir: String,
                    versions: Seq[Long], upTo: Long): Unit = {
    val path = new Path(stateDir)
    val fs = path.getFileSystem(spark.sparkContext.hadoopConfiguration)
    versions.distinct.filter(_ <= upTo)
      .sorted.dropRight(2)
      .foreach(v => fs.delete(new Path(path, s"v$v"), true))
  }
}
