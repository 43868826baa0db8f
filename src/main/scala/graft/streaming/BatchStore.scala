package graft.streaming

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.StructType

/** Reader + maintenance for the growing `batch=<id>/` parquet stores
  * the closed ingest loops append to — ONE definition (IngestDedup and
  * NearDupIngest previously carried near-identical copies, and both had
  * the same wedge: an UNschema'd `spark.read.parquet` dies on schema
  * inference when every batch partition is fileless, which is exactly
  * what an all-empty first micro-batch produces — Spark writes no part
  * files for empty tasks — and then every restart replays into the same
  * crash).
  *
  * THE STORE IS COMPACTED IN BATCH COUNT. A per-batch directory layout
  * alone is linear in store AGE: after 10⁶ micro-batches every
  * admission re-discovers 10⁶ `batch=<id>` dirs (a scheduled parallel-
  * listing job past 32 paths — i.e. always), each a round-trip on an
  * object store. [[maintain]] folds batches into RUNS
  * (`run=<lo>-<hi>/`, complete iff `_SUCCESS` exists — Spark's
  * committer writes it last, so the marker IS the stamp), merged
  * size-tiered by [[planCompaction]] (binary-counter rule: a run
  * absorbs its older adjacent neighbor while the neighbor's span is no
  * larger), so a store of N batches is O(log N) runs + a bounded tail.
  * A run is a pure row-union of its sources — no aggregation — so
  * reads through a compacted store return exactly the rows of the
  * uncompacted one.
  *
  * Crash discipline: the run is written first (`_SUCCESS` last), then
  * the source dirs are deleted. Between the two, run AND sources are
  * both visible — [[read]] resolves that deterministically by reading
  * only EFFECTIVE sources (a source strictly contained in a larger
  * one's id range is skipped), so no row is ever served twice — this
  * matters because postings/digest consumers COUNT rows (a
  * double-served postings batch would double common-shingle counts and
  * flip Jaccard admissions). The next [[maintain]] deletes the
  * superseded leftovers and any `_SUCCESS`-less run dir (an
  * unreadable crashed attempt).
  *
  * Replay fence: [[maintain]] only ever compacts batch ids < the
  * in-flight id, so `excludeBatch` (a replayed batch hiding its own
  * partial previous attempt) can always be honored by path exclusion;
  * [[read]] refuses loudly if the excluded id sits inside a run, since
  * that can only mean a restarted checkpoint or foreign compactor. */
object BatchStore {

  /** How many uncompacted `batch=<id>` units may accumulate before a
    * maintain pass folds them into a run. */
  private[graft] val defaultCompactEvery = 64

  /** One unit of a batch store (or of [[SemDedupIngest]]'s summary
    * index, which shares the naming): an uncompacted batch
    * (`batch=<id>`, lo == hi) or a compacted run (`run=<lo>-<hi>`,
    * covering that inclusive batch-id range). `name` IS the directory
    * (or summary file base) name. */
  private[graft] final case class IndexSource(name: String, lo: Long, hi: Long) {
    def span: Long = hi - lo + 1
    def isRun: Boolean = name.startsWith("run=")
  }

  private[graft] def parseSourceName(base: String): Option[IndexSource] =
    if (base.startsWith("batch="))
      base.stripPrefix("batch=").toLongOption.map(b => IndexSource(base, b, b))
    else if (base.startsWith("run=")) base.stripPrefix("run=").split("-", 2) match {
      case Array(lo, hi) =>
        for (l <- lo.toLongOption; h <- hi.toLongOption; if l <= h)
          yield IndexSource(base, l, h)
      case _ => None
    }
    else None

  /** Split sources into (effective, superseded): a source strictly
    * contained in a larger source's id range is a compaction leftover —
    * the run was stamped but the crash hit before the source deletes.
    * Readers use only the effective set (exactly-once rows);
    * maintenance deletes the superseded. */
  private[graft] def effectiveSources(
      all: Seq[IndexSource]): (Seq[IndexSource], Seq[IndexSource]) = {
    val (sup, eff) = all.partition(s => all.exists(o =>
      o.span > s.span && o.lo <= s.lo && s.hi <= o.hi))
    (eff, sup)
  }

  /** Pure compaction planning (extracted so the tiering invariants are
    * property-testable without a filesystem): given the effective
    * uncompacted batch sources and runs, return the sorted contiguous
    * source set to fold into one run, or None when the tail hasn't
    * reached `compactEvery`. The merge absorbs older ADJACENT runs
    * while their span is ≤ the accumulated span — the binary-counter
    * rule that keeps run spans strictly decreasing oldest→newest and
    * the run count O(log N). */
  private[graft] def planCompaction(
      tailIn: Seq[IndexSource], runsIn: Seq[IndexSource],
      compactEvery: Int): Option[Seq[IndexSource]] = {
    val tail = tailIn.sortBy(_.lo)
    if (tail.size < compactEvery) None
    else {
      require(tail.last.hi - tail.head.lo + 1 == tail.size,
        s"batch sources have id gaps (${tail.head.lo}.." +
          s"${tail.last.hi} spans ${tail.size} units) — the engine " +
          "numbers batches contiguously, so a gap means a lost unit; " +
          "rebuild the store or start fresh")
      var mergeSet = tail
      var keep = runsIn.sortBy(_.lo)
      while (keep.nonEmpty && keep.last.hi + 1 == mergeSet.head.lo &&
             keep.last.span <= mergeSet.last.hi - mergeSet.head.lo + 1) {
        mergeSet = keep.last +: mergeSet
        keep = keep.init
      }
      Some(mergeSet)
    }
  }

  /** One listing of a store: (batch sources, COMPLETE runs, crashed
    * run-dir names). A run dir without `_SUCCESS` is a crashed write —
    * never readable. The `_SUCCESS` probes cost O(runs) = O(log N)
    * round-trips, not O(batches). */
  private def listStore(fs: org.apache.hadoop.fs.FileSystem,
                        p: org.apache.hadoop.fs.Path)
      : (Seq[IndexSource], Seq[IndexSource], Seq[String]) = {
    if (!fs.exists(p)) (Nil, Nil, Nil)
    else {
      val names = fs.listStatus(p).toSeq.filter(_.isDirectory)
        .map(_.getPath.getName)
      val batches = names.filter(_.startsWith("batch=")).flatMap(parseSourceName)
      val runsAll = names.filter(_.startsWith("run=")).flatMap(parseSourceName)
      val (valid, crashed) = runsAll.partition(r => fs.exists(
        new org.apache.hadoop.fs.Path(new org.apache.hadoop.fs.Path(p, r.name),
          "_SUCCESS")))
      (batches, valid, crashed.map(_.name))
    }
  }

  /** Refuse a store whose units are AHEAD of the current batch id —
    * the signature of a RESTARTED CHECKPOINT over an existing store
    * (batch ids reset to 0): proceeding would overwrite the old
    * partitions one by one, silent progressive data loss. Under the
    * engine's sequential offsets + replay, a unit covering id > batchId
    * cannot legitimately exist (a replay sees at most its own id). */
  def requireNotAhead(spark: SparkSession, dir: String, batchId: Long,
                      what: String): Unit = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(p)) return
    val ahead = fs.listStatus(p).toSeq.map(_.getPath.getName)
      .flatMap(parseSourceName).filter(_.hi > batchId).map(_.name)
    require(ahead.isEmpty,
      s"$what store at $dir holds ${ahead.sorted.mkString(",")} " +
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

  /** The store's rows, read through the EFFECTIVE sources only (see
    * class doc — exactly-once under crash leftovers), with the caller's
    * schema passed explicitly so a store of empty units is just an
    * empty frame. `excludeBatch` hides one batch unit — the caller's
    * own batch id on replay, so a replayed batch never sees its
    * previous partial attempt's output and self-refuses. The exclusion
    * is by PATH (never a filter), which is why maintain must never
    * compact the in-flight id — and an excluded id found inside a run
    * is refused loudly. */
  def read(spark: SparkSession, dir: String, schema: StructType,
           excludeBatch: Option[Long] = None): DataFrame = {
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (batches, runs, _) = listStore(fs, p)
    val (eff, _) = effectiveSources(batches ++ runs)
    excludeBatch.foreach { b =>
      require(!eff.exists(s => s.isRun && s.lo <= b && b <= s.hi),
        s"batch $b must be excluded on replay but sits inside a compacted " +
          s"run at $dir — compaction never covers the in-flight batch, so " +
          "this store was compacted under a restarted checkpoint or by a " +
          "foreign loop; use a fresh store or resume the original checkpoint")
    }
    val paths = eff
      .filterNot(s => !s.isRun && excludeBatch.contains(s.lo))
      .map(s => s"$dir/${s.name}")
    if (paths.isEmpty)
      spark.createDataFrame(
        spark.sparkContext.emptyRDD[org.apache.spark.sql.Row], schema)
    else
      spark.read.schema(schema).parquet(paths: _*)
        .select(schema.fieldNames.toSeq.map(col): _*)
  }

  /** Repair + compact a batch store: delete crashed run writes and
    * superseded leftovers, then fold the uncompacted tail (ids <
    * `batchId` ONLY — the replay fence) into a run per
    * [[planCompaction]]. One Spark job per triggered merge (a pure
    * row-union read→write, coalesced to the session's shuffle width —
    * micro-batch stores are small per unit; a 10⁶-batch store pays
    * O(log N) rewrites per row over its life). No-op until the tail
    * reaches `compactEvery`, so fixture-scale stores never change
    * layout. */
  private[graft] def maintain(spark: SparkSession, dir: String,
                              batchId: Long, schema: StructType,
                              compactEvery: Int): Unit = {
    require(compactEvery > 0, s"compactEvery must be positive: $compactEvery")
    val p = new org.apache.hadoop.fs.Path(dir)
    val fs = p.getFileSystem(spark.sparkContext.hadoopConfiguration)
    val (batches, runs, crashed) = listStore(fs, p)
    crashed.foreach(n =>
      fs.delete(new org.apache.hadoop.fs.Path(p, n), true))
    val (eff0, superseded) = effectiveSources(batches ++ runs)
    superseded.foreach(s =>
      fs.delete(new org.apache.hadoop.fs.Path(p, s.name), true))
    val eff = eff0.filterNot(s => !s.isRun && s.lo == batchId)
    planCompaction(eff.filter(!_.isRun), eff.filter(_.isRun),
        compactEvery).foreach { ms =>
      val name = s"run=${ms.head.lo}-${ms.last.hi}"
      // mode=overwrite clears a crashed same-name attempt; _SUCCESS
      // (written last by the committer) is the completion stamp
      val src = spark.read.schema(schema)
        .parquet(ms.map(s => s"$dir/${s.name}"): _*)
      // Output width: shrink the file count ~4× per merge without
      // strangling a BIG merge — coalescing a thousand-split scan down
      // to the 8-partition streaming shuffle width would serialize the
      // whole rewrite onto 8 tasks (coalesce caps the SCAN stage too).
      // Floor at the shuffle width so tiny stores converge to a few
      // files; cap at the natural split count so coalesce stays a
      // no-shuffle narrowing. Repeated merges re-pack rows toward
      // maxPartitionBytes-sized files, so the natural count stops
      // shrinking once files are full — the steady state is full files
      // at scan parallelism, not ever-fewer giant ones.
      val natural = src.rdd.getNumPartitions
      val width = math.min(math.max(1, natural), math.max(natural / 4,
        spark.sessionState.conf.numShufflePartitions))
      src.coalesce(width)
        .write.mode("overwrite").parquet(s"$dir/$name")
      ms.foreach(s =>
        fs.delete(new org.apache.hadoop.fs.Path(p, s.name), true))
    }
  }
}
