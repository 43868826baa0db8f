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
  * The delete+rename landing step runs under an exclusive lock file
  * (`create(..., overwrite=false)` — atomic on HDFS and object stores
  * with conditional-put semantics; best-effort on the local FS): only
  * the lock holder may delete a stale target and rename over it, so a
  * concurrent builder can never have its freshly-landed artifact
  * deleted in the TOCTOU window between a `published` re-check and the
  * delete. Two invariants the retry loop preserves:
  *
  *  - `ensure` returns ONLY once the artifact is published — a builder
  *    that loses the lock waits for the holder to land (or for the
  *    holder's leaked lock to go stale) instead of returning its caller
  *    into a not-yet-existing read path;
  *  - a lock older than [[LockStaleMs]] is presumed leaked by a crashed
  *    publisher and broken ATOMICALLY: the breaker renames the stale
  *    lock to a private tombstone first, so exactly one contender wins
  *    the break and a second contender can never delete the winner's
  *    fresh lock (the delete-after-reobserve race).
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

  /** Upper bound on how long a losing builder waits for SOMEONE to
    * land the artifact before giving up loudly: one full staleness
    * horizon (a leaked lock is breakable by then) plus slack. */
  private val MaxWaitMs = LockStaleMs + 5L * 60 * 1000

  private def lockPath(path: Path) =
    new Path(path.getParent, path.getName + "._publish_lock")

  /** Try to take the lock once. Any create failure reads as "not
    * acquired" — safe because the caller retries in a loop, so a
    * transient FS error degrades to a wait, never to a silent skip. A
    * stale lock is broken by renaming it to a private tombstone first:
    * rename is atomic, so of N contenders that all observed staleness,
    * exactly one wins the rename and the rest fail and re-poll —
    * nobody can delete a FRESH lock created after their observation. */
  private def tryAcquire(fs: FileSystem, lock: Path): Boolean = {
    try { fs.create(lock, false).close(); return true }
    catch { case _: java.io.IOException => () }
    val stale =
      try (System.currentTimeMillis() -
        fs.getFileStatus(lock).getModificationTime) > LockStaleMs
      catch { case _: java.io.IOException => false }
    if (stale) {
      val tomb = new Path(lock.getParent,
        lock.getName + ".stale_" + java.util.UUID.randomUUID().toString.take(8))
      if (fs.rename(lock, tomb)) fs.delete(tomb, false)
    }
    false
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
      val lock = lockPath(path)
      val deadline = System.currentTimeMillis() + MaxWaitMs
      while (true) {
        if (published) { fs.delete(tmp, true); return }
        if (tryAcquire(fs, lock)) {
          try {
            if (!published) {
              // a half-written artifact from a killed run (dir, no
              // _SUCCESS) blocks the rename target — clear it, it was
              // never publishable
              if (fs.exists(path)) fs.delete(path, true)
              if (!fs.rename(tmp, path)) fs.delete(tmp, true)
            } else fs.delete(tmp, true)
          } finally fs.delete(lock, false)
          return
        }
        // lock held: a concurrent publisher is landing — wait for its
        // artifact rather than returning the caller into a missing path
        if (System.currentTimeMillis() > deadline)
          throw new IllegalStateException(
            s"artifact publish wedged: $lock held past the staleness " +
              s"horizon and $dir never published")
        Thread.sleep(200)
      }
    } catch {
      case e: Throwable => fs.delete(tmp, true); throw e
    }
  }
}
