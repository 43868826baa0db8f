package graft.corpus

import org.apache.hadoop.fs.Path

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
  * HONESTY NOTE on the race: `published` is re-evaluated after the
  * build, so a concurrent builder that landed meanwhile makes this
  * branch discard its temp instead of deleting a live artifact — but a
  * sub-ms TOCTOU window between that re-check and the delete remains
  * (closing it needs an FS with atomic rename-over or an external
  * lock). Single-writer-per-corpus-version deployments (the intended
  * shape) never hit it.
  *
  * The filesystem comes from the ACTIVE session's hadoopConfiguration —
  * a bare `new Configuration()` would drop every `spark.hadoop.*`
  * setting (s3a credentials, fs impl overrides) and probe the wrong
  * filesystem off-box. A failed build deletes its temp before
  * rethrowing. */
private[corpus] object ArtifactPublish {
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
      if (!published) {
        // a half-written artifact from a killed run (dir, no _SUCCESS)
        // blocks the rename target — clear it, it was never publishable
        if (fs.exists(path)) fs.delete(path, true)
        if (!fs.rename(tmp, path)) fs.delete(tmp, true)
      } else fs.delete(tmp, true)
    } catch {
      case e: Throwable => fs.delete(tmp, true); throw e
    }
  }
}
