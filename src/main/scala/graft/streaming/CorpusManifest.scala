package graft.streaming

import org.apache.spark.sql.SparkSession

/** Manifest over a user-facing corpus directory — the structure that
  * removes the ingest loops' LAST O(store-age) metadata cost.
  *
  * The corpus itself (`batch=<id>/` per micro-batch) is user data and
  * is never compacted, so any guard that LISTS it — the restart fence,
  * the sidecar-coverage checks — pays one round-trip per historical
  * batch (object-store list pagination is O(N); a local `listStatus`
  * calls `getFileStatus` per child, same shape). r18 made that listing
  * cold-only (restarts + one batch per compactEvery), amortized
  * O(age/compactEvery) per batch; at 10⁶ micro-batches a cold census
  * still re-discovers 10⁶ dirs. The manifest (`<corpus>/_manifest/` —
  * underscore-prefixed, so Spark's own readers ignore it inside the
  * corpus) records which batch ids exist as a [[BatchStore]] of VOID
  * units ([[BatchStore.voidOps]]): the unit NAMES carry the id ranges,
  * a warm append is ONE `mkdirs`, compaction folds the names into
  * O(log N) runs with pure-metadata merges, and a cold census costs
  * O(log N + tail) — never O(age).
  *
  * Refusal matrix (what each failure is caught by):
  *   - restarted checkpoint, stores intact → the manifest's own ahead
  *     fence inside [[BatchStore.maintainStore]] (manifest units
  *     at/beyond the in-flight id), AND the sidecar store's twin fence;
  *   - sidecar deleted + restarted → the manifest fence (this is the
  *     one case r18's raw corpus listing was load-bearing for — the
  *     manifest, living UNDER the corpus dir, survives sidecar loss);
  *   - sidecar deleted, no restart → the coverage check (manifest
  *     ranges not covered by sidecar sources);
  *   - manifest deleted + restarted → the bootstrap fallback re-lists
  *     the corpus RAW (one O(age) pass) and refuses ahead ids;
  *   - manifest deleted, no restart (or a pre-manifest corpus adopted
  *     by this code) → the same fallback rebuilds the manifest as one
  *     stamped run and proceeds — deleting `_manifest` is therefore
  *     the supported escape hatch after any manual corpus surgery.
  *
  * NOT caught (single-writer contract violations, documented): corpus
  * data restored/added WITHOUT its `_manifest` twin while the manifest
  * survives — the manifest is authoritative, so foreign `batch=<id>`
  * dirs it never recorded are invisible to the guards (r18's raw
  * listing saw them on cold batches; the warm chain already skipped
  * every guard for up to compactEvery batches under the same
  * contract). After manual surgery, delete `_manifest` to force the
  * raw-listing rebuild. */
object CorpusManifest {
  import BatchStore.IndexSource

  private[graft] def manifestDir(corpusDir: String): String =
    s"$corpusDir/_manifest"

  /** One Guard per loop closure (single-writer, like the sidecar
    * [[BatchStore.Maintainer]] it wraps). Per batch: [[maintain]]
    * BEFORE any store read (fences restarts, returns the corpus id
    * ranges the coverage checks compare against), [[append]] right
    * after the corpus `batch=<id>` write (so the manifest never claims
    * an id the corpus doesn't hold, except the in-flight one a replay
    * overwrites), [[completed]] at the end of a fully-successful batch
    * body. Warm batches cost ONE `mkdirs` and zero discovery. */
  final class Guard(spark: SparkSession, corpusDir: String, what: String,
                    compactEvery: Int) {
    private val mp = new org.apache.hadoop.fs.Path(manifestDir(corpusDir))
    private val fs = mp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    private val mm = new BatchStore.Maintainer(
      BatchStore.voidOps(spark, manifestDir(corpusDir),
        s"$what corpus manifest"), compactEvery)

    /** The effective corpus id ranges for this batch (all < `batchId`;
      * the in-flight id's replayed manifest unit is excluded by the
      * store discipline). Cold batches census the manifest —
      * O(log N + tail) — and fall back to ONE raw corpus listing only
      * when the manifest holds no units AT ALL (fresh store: no-op;
      * pre-manifest corpus or deleted manifest: refuse-or-rebuild).
      * The censused ranges exclude the in-flight id's own unit, so
      * "no units at all" needs one more cold-path probe: a manifest
      * whose sole record is `batch=<batchId>` (the previous attempt of
      * a replayed first-ever batch already [[append]]ed) is alive and
      * authoritative — without the probe every such replay would
      * re-list the corpus raw. */
    def maintain(batchId: Long): Seq[IndexSource] = {
      val warm = mm.wouldSkip(batchId)
      val ranges = mm.maintain(batchId)
      if (warm || ranges.nonEmpty) ranges
      else if (unitDirExists(new org.apache.hadoop.fs.Path(mp, s"batch=$batchId")))
        ranges // manifest alive; its only record is the in-flight replay
      else if (bootstrap(batchId)) mm.maintain(batchId) // pick up the run
      else ranges
    }

    /** Directory-shaped existence probe — the same `isDirectory`
      * discipline as [[bootstrap]]'s filter and `listStore`'s census: a
      * stray regular FILE named `batch=<n>` (tooling residue) is
      * invisible to the census, so it must not satisfy this probe either
      * — a unit-less manifest "kept alive" by such a file would suppress
      * the bootstrap rebuild/refusal for the life of the store. */
    private def unitDirExists(p: org.apache.hadoop.fs.Path): Boolean =
      try fs.getFileStatus(p).isDirectory
      catch { case _: java.io.FileNotFoundException => false }

    /** Record the just-written corpus `batch=<id>` — one `mkdirs` (the
      * unit is an EMPTY dir; its name is the record). Idempotent, so a
      * replay overwriting its corpus partition re-records harmlessly. */
    def append(batchId: Long): Unit = {
      fs.mkdirs(new org.apache.hadoop.fs.Path(mp, s"batch=$batchId"))
      ()
    }

    /** End-of-batch mark — a batch that threw never extends the warm
      * chain, so the next call re-censuses (see
      * [[BatchStore.Maintainer.completed]]). */
    def completed(batchId: Long): Unit = mm.completed(batchId)

    /** The raw-listing fallback, reached only when the manifest has no
      * units but the corpus may: ONE O(age) listing that refuses ahead
      * ids (a restarted checkpoint over a manifest-less corpus) or
      * rebuilds the manifest as one stamped run covering the listed
      * ids (a pre-manifest corpus adopted by this code, or a manifest
      * deleted as the post-surgery escape hatch). Returns true iff a
      * run was written. Gaps from external deletions are tolerated:
      * the run claims [min, max], and claiming a deleted id only makes
      * the coverage check stricter, never looser. */
    private def bootstrap(batchId: Long): Boolean = {
      val cp = new org.apache.hadoop.fs.Path(corpusDir)
      if (!fs.exists(cp)) return false
      // isDirectory matches BatchStore.listStore: a stray regular FILE
      // named batch=<n> (tooling residue) must not be recorded into the
      // rebuilt manifest — the coverage guards would demand its sidecar
      // twin forever
      val ids = fs.listStatus(cp).toSeq.filter(_.isDirectory)
        .map(_.getPath.getName)
        .filter(_.startsWith("batch="))
        .flatMap(_.stripPrefix("batch=").toLongOption)
      val ahead = ids.filter(_ > batchId)
      require(ahead.isEmpty,
        s"$what corpus at $corpusDir holds " +
          ahead.sorted.map("batch=" + _).mkString(",") +
          s" beyond batch $batchId with no manifest — a restarted " +
          "checkpoint must use a fresh store directory (or resume the " +
          "old checkpoint); continuing would overwrite previously " +
          "ingested partitions one by one")
      // the in-flight id itself may never enter a RUN: maintainStore's
      // ahead fence refuses any run whose range reaches the current
      // batch id (a run covering the in-flight id is otherwise the
      // restarted-checkpoint signature), so a corpus holding ONLY the
      // in-flight replay writes nothing — append() records it after
      // the batch body, and maintain()'s alive-manifest probe keeps
      // later replays off this raw listing
      val past = ids.filter(_ != batchId)
      if (past.isEmpty) false
      else {
        val run = new org.apache.hadoop.fs.Path(mp,
          s"run=${past.min}-${past.max}")
        fs.mkdirs(run)
        val out = fs.create(
          new org.apache.hadoop.fs.Path(run, "_SUCCESS"), true)
        out.close()
        true
      }
    }
  }
}
