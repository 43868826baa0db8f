package graft.corpus

import org.apache.hadoop.fs.{FileSystem, Path}

/** Compute-if-absent artifact publish, shared by the near-dup cluster
  * and mutual-kNN graph artifacts (one copy of the concurrency logic,
  * so a fix here serves every artifact).
  *
  * Protocol: presence = every sub-table's `_SUCCESS` marker (they land
  * together via one rename, so a killed run's half-written artifact is
  * recomputed, never trusted). The build writes into a private temp
  * dir; two concurrent builders each write their own temp, exactly one
  * rename lands, the loser deletes its temp and reads the winner's
  * artifact. Never overwrite-in-place: a reader mid-scan of a published
  * artifact must not see files deleted under it.
  *
  * The delete+rename landing step is guarded by an exclusive lock file
  * (`create(..., overwrite=false)` — atomic on HDFS and object stores
  * with conditional-put semantics; best-effort on the local FS): only
  * the lock holder may delete a stale target and rename over it, so a
  * concurrent builder can no longer have its freshly-landed artifact
  * deleted in the TOCTOU window between the post-build `published`
  * re-check and the delete. A builder that loses the lock discards its
  * temp — the holder's artifact is the one readers will see. A lock
  * older than [[LockStaleMs]] is presumed leaked by a crashed publisher
  * and broken.
  *
  * The filesystem comes from the ACTIVE session's hadoopConfiguration —
  * a bare `new Configuration()` would drop every `spark.hadoop.*`
  * setting (s3a credentials, fs impl overrides) and probe the wrong
  * filesystem off-box. A failed build deletes its temp before
  * rethrowing. */
private[corpus] object ArtifactPublish {

  /** Age after which a publish lock is presumed leaked by a crashed
    * publisher and broken. Far above any delete+rename latency (the
    * guarded section is two metadata ops, not the build). */
  private val LockStaleMs = 15L * 60 * 1000

  /** Run `body` under an exclusive lock file next to `path`. Returns
    * false (without running `body`) if another publisher holds the
    * lock. */
  private def withPublishLock(fs: FileSystem, path: Path)
                             (body: => Unit): Boolean = {
    val lock = new Path(path.getParent, path.getName + "._publish_lock")
    try {
      val st = fs.getFileStatus(lock)
      if (System.currentTimeMillis() - st.getModificationTime > LockStaleMs)
        fs.delete(lock, false)
    } catch { case _: java.io.FileNotFoundException => () }
    val acquired =
      try { fs.create(lock, false).close(); true }
      catch { case _: java.io.IOException => false }
    if (acquired) try body finally fs.delete(lock, false)
    acquired
  }

  def ensure(dir: String, subdirs: Seq[String])(build: Path => Unit): Unit = {
    val path = new Path(dir)
    val conf = org.apache.spark.sql.SparkSession.active
      .sparkContext.hadoopConfiguration
    val fs = path.getFileSystem(conf)
    def published =
      subdirs.forall(s => fs.exists(new Path(path, s"$s/_SUCCESS")))
    if (published) return
    val tmp = new Path(path.getParent,
      path.getName + "._tmp_" + java.util.UUID.randomUUID().toString.take(8))
    try {
      build(tmp)
      val landed = withPublishLock(fs, path) {
        if (!published) {
          // a half-written artifact from a killed run (dir, no _SUCCESS)
          // blocks the rename target — clear it, it was never publishable
          if (fs.exists(path)) fs.delete(path, true)
          if (!fs.rename(tmp, path)) fs.delete(tmp, true)
        } else fs.delete(tmp, true)
      }
      // lock lost: a concurrent publisher is landing its copy — ours is
      // redundant; never touch the target without the lock
      if (!landed) fs.delete(tmp, true)
    } catch {
      case e: Throwable => fs.delete(tmp, true); throw e
    }
  }
}
