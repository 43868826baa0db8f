package graft.queries

import org.apache.spark.sql.SparkSession

/** Scratch-directory discipline shared by every fixture-building query:
  * tmpfs when available (the bench box's virtio disk serializes file
  * IO), name keyed by the sf dir so concurrent scales never collide,
  * and ALWAYS delete-before-use — a stale half-written fixture from a
  * killed run must never be read. One definition so the sanitize/delete
  * semantics cannot drift between the dozen call sites. */
private[queries] object Scratch {
  def dir(spark: SparkSession, prefix: String, sfDir: String): String = {
    val base =
      if (new java.io.File("/dev/shm").isDirectory) "/dev/shm" else "/tmp"
    val p = s"$base/${prefix}_${sfDir.replaceAll("[^a-zA-Z0-9]", "_")}"
    val hp = new org.apache.hadoop.fs.Path(p)
    hp.getFileSystem(spark.sparkContext.hadoopConfiguration).delete(hp, true)
    p
  }
}
