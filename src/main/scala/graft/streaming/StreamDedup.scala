package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.storage.StorageLevel

import graft.operators.{Dedup, IndexMaintenance}
import graft.sources.StageSink

/** Streaming incremental near-dedup: each micro-batch dedups against
  * the corpus accumulated by every batch before it, via the on-disk
  * [[Dedup.MinhashIndex]] — the streaming face of the same
  * index-probe machinery batch ingest uses.
  *
  * `dropDuplicatesWithinWatermark` (StreamSessionize.streamingDedup)
  * covers EXACT dedup with bounded state; near-dedup state (shingle
  * sets + band keys for every retained doc) cannot live in a streaming
  * state store at corpus scale, so it lives where the batch path keeps
  * it: parquet. foreachBatch gives each micro-batch full batch-engine
  * semantics for the probe joins.
  *
  * Index layout: `<indexDir>/delta_b<batchId>/entries` — one delta
  * folder per micro-batch, each read as its own shard-partitioned
  * parquet root and unioned for the next batch's probe (the shard
  * filter pushes into every scan). A pre-seeded corpus index can be
  * placed at `<indexDir>/seed/entries` ([[Dedup.MinhashIndex.save]]
  * into `<indexDir>/seed`).
  *
  * Replay discipline (foreachBatch is at-least-once): both outputs are
  * keyed on the batch id and overwritten on retry — survivors via
  * [[StageSink.saveBatch]], the index delta via its deterministic
  * folder — and a retry EXCLUDES its own delta folder from the index
  * it probes, so a batch never dedups against its own partial state.
  * Long-running streams should [[compact]] periodically to bound root
  * counts — the scan stays correct either way.
  */
object StreamDedup {

  /** Index roots under `indexDir` (any folder holding an `entries`
    * table), minus `exclude`. Underscore-prefixed folders are skipped —
    * that namespace is reserved for in-flight [[compact]] temp dirs, so
    * a crashed compaction never gets probed as a (partial) root. */
  private[graft] def indexRoots(
      indexDir: String, exclude: String = ""): Seq[java.io.File] =
    Option(new java.io.File(indexDir).listFiles())
      .getOrElse(Array.empty).toIndexedSeq
      .filter(d => d.isDirectory && d.getName != exclude &&
        !d.getName.startsWith("_") &&
        new java.io.File(d, "entries").exists())
      .sortBy(_.getName)

  /** Mark ids as deleted across the WHOLE multi-root index: appended
    * to `<indexDir>/_tombstones` (the underscore namespace
    * [[indexRoots]] already skips), anti-joined by every probe union
    * from the next micro-batch on, and rewritten away by the next
    * [[compact]]. The per-root `<root>/tombstones` convention does
    * not fit here — a deleted id may live in any root, and probes
    * union the roots anyway, so one shared table filters them all. */
  def addTombstones(ids: DataFrame, indexDir: String): Unit =
    IndexMaintenance.addTombstonesAt(ids, s"$indexDir/_tombstones")

  /** The union's tombstone filter ([[addTombstones]]'s reader). */
  private[graft] def dropTombstoned(
      entries: DataFrame, spark: org.apache.spark.sql.SparkSession,
      indexDir: String): DataFrame =
    IndexMaintenance.dropTombstonedAt(entries, spark,
      s"$indexDir/_tombstones")

  /** Fold every accumulated root (seed + deltas) into one fresh
    * `seed_b<lastBatch>` root and delete the originals — the
    * periodic maintenance the scaladoc prescribes: N roots means N
    * parquet scans per probe, so long streams compact to keep N small.
    *
    * Run while the stream is STOPPED (between restarts): the swap is
    * not atomic against a concurrent batch. Crash discipline: the
    * compacted root is written and renamed into place BEFORE the
    * originals are deleted, so a crash can leave duplicate index
    * entries (both the compacted root and undeleted originals) but
    * never lose any — duplicates cost probe work, not correctness,
    * and the next compact folds them away (the union dedups on id).
    * Returns the new root's name, or None when there was nothing to
    * fold. */
  def compact(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String): Option[String] =
    compactRoots(spark, indexDir,
      (union, path) => Dedup.MinhashIndex(union).save(path, mode = "overwrite"))

  /** [[compact]] only when due — the hands-off cadence policy: more
    * than `maxRoots` roots (every probe pays one parquet scan per
    * root) or pending tombstones past `maxTombstoneBytes` (every
    * probe pays their anti-join). The tombstone trigger arms only
    * when a root exists to fold — with ZERO roots there is nothing a
    * compact could reclaim (pre-seeded tombstones stay live by the
    * never-surface-again contract), so firing would loop futilely.
    * Call between restarts like [[compact]] itself; returns the
    * folded root's name when it fired. */
  def compactIfDue(spark: org.apache.spark.sql.SparkSession,
      indexDir: String, maxRoots: Int = 8,
      maxTombstoneBytes: Long = IndexMaintenance.DefaultMaxTombstoneBytes)
      : Option[String] =
    compactRootsIfDue(spark, indexDir, maxRoots, maxTombstoneBytes,
      (union, path) => Dedup.MinhashIndex(union).save(path, mode = "overwrite"))

  /** The saver-agnostic due-check + fold behind [[compactIfDue]] and
    * the media/embed twins — the policy depends on nothing
    * saver-specific, so all three layouts share it. */
  private[streaming] def compactRootsIfDue(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String, maxRoots: Int, maxTombstoneBytes: Long,
      save: (org.apache.spark.sql.DataFrame, String) => Unit): Option[String] = {
    val roots = indexRoots(indexDir)
    if (roots.size > maxRoots ||
        (roots.nonEmpty && IndexMaintenance.tableBytes(
          spark, s"$indexDir/_tombstones") > maxTombstoneBytes))
      compactRoots(spark, indexDir, save)
    else None
  }

  /** The shared compact core ([[compact]]'s scaladoc): fold every
    * root's entries (deduped on id — a crashed earlier compact leaves
    * the same entries in two roots, and folding them through would
    * bake the duplicates into every future seed) into one fresh
    * `seed_<epoch>` root via `save`, write + rename BEFORE deleting
    * the originals, and pick a NEW epoch name each time (the old seed
    * is among the roots being folded). Used by this object and
    * [[StreamMediaDedup]], which differ only in the index saver. */
  private[streaming] def compactRoots(
      spark: org.apache.spark.sql.SparkSession,
      indexDir: String,
      save: (org.apache.spark.sql.DataFrame, String) => Unit): Option[String] = {
    val roots = indexRoots(indexDir)
    // a single root still compacts when tombstones are pending —
    // that rewrite is what reclaims their entries' bytes
    val tombstonesPending = IndexMaintenance
      .readTombstonesAt(spark, s"$indexDir/_tombstones").isDefined
    if (roots.isEmpty || (roots.length == 1 && !tombstonesPending))
      return None
    val seedEpochs = roots.map(_.getName)
      .filter(_.startsWith("seed_"))
      .flatMap(n => n.stripPrefix("seed_").toLongOption)
    val target = s"seed_${seedEpochs.maxOption.getOrElse(-1L) + 1L}"
    // snapshot the tombstone FILES before the fold reads them: a
    // takedown appended while the fold runs lands as a new file the
    // cleanup below must keep (it was never anti-joined)
    val folded = IndexMaintenance.tombstoneFilesAt(
      spark, s"$indexDir/_tombstones")
    val union = dropTombstoned(
      roots
        .map(d => spark.read.parquet(s"${d.getPath}/entries"))
        .reduce(_ unionByName _)
        .dropDuplicates("id"),
      spark, indexDir)
    val tmp = new java.io.File(indexDir, s"_compact_$target")
    save(union, tmp.getPath)
    val dest = new java.io.File(indexDir, target)
    require(tmp.renameTo(dest),
      s"compact: rename ${tmp.getPath} -> ${dest.getPath} failed")
    roots.filter(_.getName != target)
      .foreach(d => deleteRecursively(d))
    // only the tombstone files the fold actually applied rewrite away
    // (same ordering as the roots: after the new root is in place);
    // files appended since the snapshot stay live
    IndexMaintenance.reclaimTombstoneFiles(
      spark, s"$indexDir/_tombstones", folded)
    Some(target)
  }

  private[streaming] def deleteRecursively(f: java.io.File): Unit = {
    Option(f.listFiles()).getOrElse(Array.empty)
      .foreach(deleteRecursively)
    f.delete()
  }

  /** foreachBatch writer: near-dedup each micro-batch against the
    * accumulated index, export survivors as a batch-keyed snapshot
    * under `<baseDir>/<stage>/<name>_b<batchId>`, append the
    * survivors' delta to the index. Callers pick the trigger and
    * start. */
  def incrementalWriter(
      stream: DataFrame, idCol: String, textCol: String,
      baseDir: String, stage: String, name: String, indexDir: String,
      shingleN: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.5): DataStreamWriter[Row] = {
    val exportBatch: (DataFrame, Long) => Unit = { (batch, batchId) =>
      if (batch.take(1).nonEmpty) {
        val spark = batch.sparkSession
        val own = f"delta_b$batchId%010d"
        val priorEntries = indexRoots(indexDir, exclude = own)
          .map(d => s"${d.getPath}/entries")
        // the batch feeds the probe AND the within-batch dedup AND the
        // delta build — pin it once (DISK_ONLY: correctness cache, a
        // batch can be arbitrarily large)
        val pinned = batch.persist(StorageLevel.DISK_ONLY)
        try {
          val fresh =
            if (priorEntries.isEmpty) pinned
            else {
              // one read per delta root: the entries are PARTITIONED by
              // shard, and partition discovery rejects multiple
              // partitioned roots in a single read; the probe's shard
              // filter pushes down into every scan of the union
              val index = Dedup.MinhashIndex(dropTombstoned(
                priorEntries.toIndexedSeq.map(spark.read.parquet(_))
                  .reduce(_ unionByName _), spark, indexDir))
              val hits = Dedup.incrementalNearDup(pinned, index, idCol,
                textCol, shingleN, numHashes, bands, threshold)
                .select(org.apache.spark.sql.functions.col("b_id").as(idCol))
              pinned.join(hits, Seq(idCol), "left_anti")
            }
          val survivors = Dedup.dropNearDuplicates(fresh, idCol, textCol,
            shingleN, numHashes, bands, threshold)
            .persist(StorageLevel.DISK_ONLY)
          try {
            StageSink.saveBatch(survivors, baseDir, stage, name, batchId)
            Dedup.buildMinhashIndex(survivors, idCol, textCol,
              shingleN, numHashes, bands)
              .save(s"$indexDir/$own", mode = "overwrite")
          } finally survivors.unpersist()
        } finally pinned.unpersist()
      }
    }
    stream.writeStream
      .outputMode("append")
      .foreachBatch(exportBatch)
  }
}
