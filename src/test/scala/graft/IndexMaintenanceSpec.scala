package graft

import org.apache.spark.sql.functions._

import graft.operators.{Dedup, IndexMaintenance, SetSimilarity}
import graft.sources.Multimodal
import graft.streaming.StreamDedup

/** Index lifecycle: tombstone deletion visible at the next probe
  * without any rewrite, compaction rewriting the tombstones away,
  * and the crash-recovery discipline of the in-place swap. */
class IndexMaintenanceSpec extends SparkSpec {
  import spark.implicits._

  private def tmp(prefix: String): String =
    java.nio.file.Files.createTempDirectory(prefix).toString

  private val corpus = Seq(
    (0L, "the quick brown fox jumps over the lazy dog"),
    (1L, "completely different words entirely here now"),
    (2L, "grand unified theories of modern physics explained simply"))
    .toDF("doc_id", "text")
  private val batch = Seq(
    (10L, "the quick brown fox jumps over the lazy dog"), // dup of 0
    (11L, "completely different words entirely here also")) // near 1
    .toDF("doc_id", "text")

  private def probePairs(dir: String): Set[(Long, Long)] =
    Dedup.incrementalNearDup(batch,
      Dedup.MinhashIndex.load(spark, dir), "doc_id", "text",
      shingleN = 2, numHashes = 48, bands = 16, threshold = 0.5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet

  test("minhash tombstone hides the id from probes; compact folds it away") {
    val dir = tmp("graft_tomb_mh")
    Dedup.buildMinhashIndex(corpus, "doc_id", "text",
      shingleN = 2, numHashes = 48, bands = 16).save(dir)
    val before = probePairs(dir)
    assert(before.contains((0L, 10L)) && before.exists(_._1 == 1L))

    IndexMaintenance.addTombstones(Seq(0L).toDF("doc_id"), dir)
    val after = probePairs(dir)
    assert(!after.exists(_._1 == 0L), "tombstoned id must stop matching")
    assert(after.exists(_._1 == 1L), "other ids unaffected")
    // the anti-join must not knock the index off the shard-pruned path
    assert(Dedup.isFileBacked(Dedup.MinhashIndex.load(spark, dir).entries))

    IndexMaintenance.compactMinhashIndex(spark, dir)
    assert(!new java.io.File(dir, "tombstones").exists,
      "compact reclaims the tombstone table")
    assert(!new java.io.File(dir, "_compact").exists)
    assert(probePairs(dir) === after, "compacted probe ≡ tombstoned probe")
    val ids = Dedup.MinhashIndex.load(spark, dir)
      .entries.select("id").as[Long].collect().toSet
    assert(ids === Set(1L, 2L), "compaction physically removed the entry")
  }

  test("embedding index tombstone + compact") {
    val vecs = Seq(
      (0L, Array(1.0f, 0.0f, 0.0f, 0.0f)),
      (1L, Array(0.0f, 1.0f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    val dir = tmp("graft_tomb_emb")
    Dedup.buildEmbeddingIndex(vecs, "vec_id", "embedding",
      dim = 4, numPlanes = 6).save(dir)
    val probe = Seq((10L, Array(0.99f, 0.01f, 0.0f, 0.0f)))
      .toDF("vec_id", "embedding")
    def hits(): Set[Long] =
      Dedup.incrementalEmbeddingNearDup(probe,
        Dedup.EmbeddingIndex.load(spark, dir), "vec_id", "embedding",
        dim = 4, numPlanes = 6, threshold = 0.9)
        .select("a_id").as[Long].collect().toSet
    assert(hits() === Set(0L))
    IndexMaintenance.addTombstones(Seq(0L).toDF("vec_id"), dir)
    assert(hits() === Set.empty[Long])
    IndexMaintenance.compactEmbeddingIndex(spark, dir)
    assert(!new java.io.File(dir, "tombstones").exists)
    assert(hits() === Set.empty[Long])
    assert(Dedup.EmbeddingIndex.load(spark, dir)
      .entries.select("id").as[Long].collect().toSeq === Seq(1L))
  }

  test("setsim tombstone + compact rewrites postings, keeps the frozen dfreq") {
    val corp = Seq(
      (0L, Seq("alpha", "beta", "gamma", "delta")),
      (1L, Seq("epsilon", "zeta", "eta", "theta")),
      (2L, Seq("alpha", "beta", "gamma", "kappa")))
      .toDF("id", "toks")
    val dir = tmp("graft_tomb_ss")
    SetSimilarity.buildIndex(corp, "id", col("toks")).save(dir)
    val probe = Seq((10L, Seq("alpha", "beta", "gamma", "delta")))
      .toDF("id", "toks")
    def hitIds(): Set[Long] =
      SetSimilarity.probeIndex(SetSimilarity.SetSimIndex.load(spark, dir),
        probe, "id", col("toks"), 1, 2)
        .select("a_id").as[Long].collect().toSet
    assert(hitIds() === Set(0L, 2L))
    IndexMaintenance.addTombstones(Seq(0L).toDF("id"), dir)
    assert(hitIds() === Set(2L),
      "stale postings must not resurrect a tombstoned id")
    val dfreqBefore = SetSimilarity.SetSimIndex.load(spark, dir)
      .dfreq.orderBy("t").collect().toSeq
    IndexMaintenance.compactSetSimIndex(spark, dir)
    assert(!new java.io.File(dir, "tombstones").exists)
    assert(hitIds() === Set(2L))
    val after = SetSimilarity.SetSimIndex.load(spark, dir)
    assert(after.dfreq.orderBy("t").collect().toSeq === dfreqBefore,
      "dfreq (the frozen token order) must survive compaction unchanged")
    assert(after.postings.get.select("a_id").as[Long].collect().toSet
      === Set(1L, 2L), "postings rewritten without the tombstoned id")
  }

  test("media hash index tombstone + compact") {
    val dir = tmp("graft_tomb_med")
    Multimodal.MediaHashIndex(
      Seq((0L, "image", 0x1234L), (1L, "image", 0x9999L))
        .toDF("id", "kind", "dhash")).save(dir)
    IndexMaintenance.addTombstones(Seq(0L).toDF("id"), dir)
    assert(Multimodal.MediaHashIndex.load(spark, dir)
      .entries.select("id").as[Long].collect().toSeq === Seq(1L))
    IndexMaintenance.compactMediaHashIndex(spark, dir)
    assert(!new java.io.File(dir, "tombstones").exists)
    assert(Multimodal.MediaHashIndex.load(spark, dir)
      .entries.select("id").as[Long].collect().toSeq === Seq(1L))
  }

  test("pq index tombstone + compact leave models frozen, drop the entry") {
    import graft.operators.Ann
    val vecs = (0 until 32).map(i =>
      (i.toLong, Array.tabulate(4)(j => math.sin(i * 4 + j).toFloat)))
      .toDF("vec_id", "embedding")
    val cents = Ann.trainCentroids(vecs, "vec_id", "embedding",
      k = 4, iters = 2).withColumnRenamed("centroid_id", "vec_id")
    val books = Ann.trainPq(vecs, "vec_id", "embedding", m = 2,
      ksub = 4, iters = 2, maxTrain = 32)
    val index = Ann.buildPqIndex(vecs, cents, books, "vec_id", "embedding")
    val dir = tmp("graft_tomb_pq") + "/idx"
    Ann.saveOpqIndex(dir, index, cents, books, "vec_id", "embedding")
    val queries = vecs.filter(col("vec_id") < 2)
    def results(): Set[(Long, Long, Int)] =
      Ann.searchOpqIndex(Ann.loadOpqIndex(spark, dir), vecs, queries,
        k = 3, nprobe = 4, refine = 2)
        .select("query_id", "neighbor_id", "rank")
        .as[(Long, Long, Int)].collect().toSet
    val before = results()
    val victim = before.head._2
    IndexMaintenance.addTombstones(Seq(victim).toDF("vec_id"), dir)
    val after = results()
    assert(!after.exists(_._2 == victim),
      "tombstoned vector must stop surfacing as a neighbour")
    assert(after !== before)
    IndexMaintenance.compactPqIndex(spark, dir)
    assert(!new java.io.File(dir, "tombstones").exists)
    assert(results() === after, "compacted search ≡ tombstoned search")
    assert(spark.read.parquet(s"$dir/index")
      .filter(col("vec_id") === victim).isEmpty,
      "compaction physically removed the encoded row")
    // the model artifacts are untouched by deletion
    assert(Ann.loadOpqIndex(spark, dir).codebooks === books)
  }

  test("compact recovers a swap interrupted after the rewrite completed") {
    val dir = tmp("graft_tomb_rec")
    Dedup.buildMinhashIndex(corpus, "doc_id", "text",
      shingleN = 2, numHashes = 48, bands = 16).save(dir)
    IndexMaintenance.addTombstones(Seq(0L).toDF("doc_id"), dir)
    // simulate: rewrite written in full, crash mid-swap (live entries
    // already renamed away, _compact not yet moved in)
    Dedup.MinhashIndex.load(spark, dir).save(s"$dir/_compact",
      mode = "overwrite")
    assert(new java.io.File(s"$dir/_compact/entries/_SUCCESS").exists)
    val live = new java.io.File(dir, "entries")
    assert(live.renameTo(new java.io.File(dir, "_trash_entries")))
    // a fresh compact must finish the old swap, then run its own
    IndexMaintenance.compactMinhashIndex(spark, dir)
    assert(new java.io.File(dir, "entries").exists)
    assert(!new java.io.File(dir, "_trash_entries").exists)
    assert(!new java.io.File(dir, "_compact").exists)
    assert(!new java.io.File(dir, "tombstones").exists)
    assert(Dedup.MinhashIndex.load(spark, dir)
      .entries.select("id").as[Long].collect().toSet === Set(1L, 2L))
  }

  test("compact discards an incomplete rewrite and restores a trashed table") {
    val dir = tmp("graft_tomb_dis")
    Dedup.buildMinhashIndex(corpus, "doc_id", "text",
      shingleN = 2, numHashes = 48, bands = 16).save(dir)
    // simulate: crash DURING the rewrite (no _SUCCESS) after the live
    // table was (wrongly, but recoverably) moved aside
    val partial = new java.io.File(s"$dir/_compact/entries")
    assert(partial.mkdirs())
    val live = new java.io.File(dir, "entries")
    assert(live.renameTo(new java.io.File(dir, "_trash_entries")))
    IndexMaintenance.compactMinhashIndex(spark, dir)
    assert(new java.io.File(dir, "entries").exists)
    assert(!new java.io.File(dir, "_compact").exists)
    assert(Dedup.MinhashIndex.load(spark, dir)
      .entries.select("id").as[Long].collect().toSet === Set(0L, 1L, 2L))
  }

  test("tombstones appended after the rewrite snapshot survive the reclaim") {
    // the primitive behind both compact paths: only the snapshotted
    // files delete, so a takedown racing a compaction stays live
    val dir = tmp("graft_tomb_race")
    IndexMaintenance.addTombstones(Seq(1L).toDF("id"), dir)
    val snapshot = IndexMaintenance.tombstoneFiles(spark, dir)
    IndexMaintenance.addTombstones(Seq(2L).toDF("id"), dir)
    IndexMaintenance.reclaimTombstoneFiles(
      spark, s"$dir/tombstones", snapshot)
    val left = IndexMaintenance.readTombstones(spark, dir)
      .get.as[Long].collect().toSet
    assert(left === Set(2L),
      "the unapplied tombstone must survive; the folded one must not")
    // reclaiming the remainder empties and removes the table
    IndexMaintenance.reclaimTombstoneFiles(spark, s"$dir/tombstones",
      IndexMaintenance.tombstoneFiles(spark, dir))
    assert(IndexMaintenance.readTombstones(spark, dir).isEmpty)
  }

  test("a load heals an index left unreadable by a mid-swap crash") {
    val dir = tmp("graft_tomb_heal")
    Dedup.buildMinhashIndex(corpus, "doc_id", "text",
      shingleN = 2, numHashes = 48, bands = 16).save(dir)
    // crash window: live renamed away, replacement not yet in place
    assert(new java.io.File(dir, "entries")
      .renameTo(new java.io.File(dir, "_trash_entries")))
    val loaded = Dedup.MinhashIndex.load(spark, dir) // must not throw
    assert(loaded.entries.select("id").as[Long].collect().toSet ===
      Set(0L, 1L, 2L))
    assert(!new java.io.File(dir, "_trash_entries").exists)
  }

  test("appendOpqIndex heals a stale completed rewrite before appending") {
    import graft.operators.Ann
    val vecs = (0 until 32).map(i =>
      (i.toLong, Array.tabulate(4)(j => math.cos(i * 4 + j).toFloat)))
      .toDF("vec_id", "embedding")
    val cents = Ann.trainCentroids(vecs, "vec_id", "embedding",
      k = 4, iters = 2).withColumnRenamed("centroid_id", "vec_id")
    val books = Ann.trainPq(vecs, "vec_id", "embedding", m = 2,
      ksub = 4, iters = 2, maxTrain = 32)
    val dir = tmp("graft_tomb_stale") + "/idx"
    Ann.saveOpqIndex(dir,
      Ann.buildPqIndex(vecs, cents, books, "vec_id", "embedding"),
      cents, books, "vec_id", "embedding")
    // crash leftover: a COMPLETE rewrite that was never swapped in
    spark.read.parquet(s"$dir/index").write.parquet(s"$dir/_compact/index")
    assert(new java.io.File(s"$dir/_compact/index/_SUCCESS").exists)
    // append after the crash: without healing first, the next compact
    // would swap the stale rewrite in and silently drop this batch
    val batch = Seq((100L, Array(0.5f, 0.5f, 0.5f, 0.5f)))
      .toDF("vec_id", "embedding")
    Ann.appendOpqIndex(spark, dir, batch)
    IndexMaintenance.compactPqIndex(spark, dir)
    assert(spark.read.parquet(s"$dir/index")
      .filter(col("vec_id") === 100L).count() === 1L,
      "the appended row must survive the recovered compaction")
    assert(!new java.io.File(s"$dir/_compact").exists)
  }

  test("compaction triggers fire on tombstone bytes and root/delta counts") {
    val dir = tmp("graft_tomb_due")
    Dedup.buildMinhashIndex(corpus, "doc_id", "text",
      shingleN = 2, numHashes = 48, bands = 16).save(dir)
    assert(!IndexMaintenance.compactDue(spark, dir),
      "no tombstones: nothing due")
    IndexMaintenance.addTombstones(Seq(0L).toDF("doc_id"), dir)
    assert(IndexMaintenance.compactDue(spark, dir, maxTombstoneBytes = 0L))
    assert(!IndexMaintenance.compactDue(spark, dir,
      maxTombstoneBytes = 1L << 30))
    // streaming: root count trigger
    val sdir = tmp("graft_tomb_due_s")
    for (b <- 0 to 2)
      Dedup.buildMinhashIndex(corpus.limit(1), "doc_id", "text",
        shingleN = 2, numHashes = 48, bands = 16)
        .save(f"$sdir/delta_b$b%010d", mode = "overwrite")
    assert(StreamDedup.compactIfDue(spark, sdir, maxRoots = 8).isEmpty)
    val folded = StreamDedup.compactIfDue(spark, sdir, maxRoots = 2)
    assert(folded.nonEmpty &&
      StreamDedup.indexRoots(sdir).map(_.getName) === Seq(folded.get))
    // zero roots: pre-seeded tombstones must NOT arm the trigger
    // (nothing to fold — firing would loop futilely forever)
    val edir = tmp("graft_tomb_due_e")
    StreamDedup.addTombstones(Seq(9L).toDF("doc_id"), edir)
    assert(StreamDedup.compactIfDue(spark, edir, maxRoots = 0,
      maxTombstoneBytes = 0L).isEmpty)
    // PQ: delta-root count trigger
    import graft.operators.Ann
    val vecs = (0 until 16).map(i =>
      (i.toLong, Array.tabulate(4)(j => math.sin(i * 3 + j).toFloat)))
      .toDF("vec_id", "embedding")
    val cents = Ann.trainCentroids(vecs, "vec_id", "embedding",
      k = 2, iters = 1).withColumnRenamed("centroid_id", "vec_id")
    val books = Ann.trainPq(vecs, "vec_id", "embedding", m = 2,
      ksub = 4, iters = 1, maxTrain = 16)
    val pdir = tmp("graft_tomb_due_pq") + "/idx"
    Ann.saveOpqIndex(pdir,
      Ann.buildPqIndex(vecs, cents, books, "vec_id", "embedding"),
      cents, books, "vec_id", "embedding")
    val idx = Ann.loadOpqIndex(spark, pdir)
    for (b <- 0 to 2)
      Ann.encodeForIndex(idx, vecs.limit(2))
        .write.mode("overwrite").parquet(f"$pdir/index_delta/b$b%010d")
    assert(IndexMaintenance.pqCompactDue(spark, pdir, maxDeltas = 2))
    assert(!IndexMaintenance.pqCompactDue(spark, pdir, maxDeltas = 8))
  }

  test("streaming multi-root tombstones filter the union and compact away") {
    val indexDir = tmp("graft_tomb_roots")
    Dedup.buildMinhashIndex(corpus.filter($"doc_id" < 2), "doc_id", "text",
      shingleN = 2, numHashes = 48, bands = 16)
      .save(s"$indexDir/delta_b0000000000", mode = "overwrite")
    Dedup.buildMinhashIndex(corpus.filter($"doc_id" === 2), "doc_id", "text",
      shingleN = 2, numHashes = 48, bands = 16)
      .save(s"$indexDir/delta_b0000000001", mode = "overwrite")
    StreamDedup.addTombstones(Seq(0L).toDF("doc_id"), indexDir)
    // the probe union (what incrementalWriter assembles) excludes it
    val union = StreamDedup.dropTombstoned(
      Seq(s"$indexDir/delta_b0000000000", s"$indexDir/delta_b0000000001")
        .map(d => spark.read.parquet(s"$d/entries"))
        .reduce(_ unionByName _), spark, indexDir)
    assert(union.select("id").as[Long].collect().toSet === Set(1L, 2L))
    // compaction folds the roots minus the tombstones, then drops them
    val folded = StreamDedup.compact(spark, indexDir)
    assert(folded.nonEmpty)
    assert(!new java.io.File(indexDir, "_tombstones").exists)
    assert(StreamDedup.indexRoots(indexDir).map(_.getName) === Seq(folded.get))
    assert(spark.read.parquet(s"$indexDir/${folded.get}/entries")
      .select("id").as[Long].collect().toSet === Set(1L, 2L))
  }

  test("single-root streaming compact still folds pending tombstones") {
    val indexDir = tmp("graft_tomb_one")
    Dedup.buildMinhashIndex(corpus, "doc_id", "text",
      shingleN = 2, numHashes = 48, bands = 16)
      .save(s"$indexDir/seed", mode = "overwrite")
    assert(StreamDedup.compact(spark, indexDir).isEmpty,
      "nothing pending: single root is a no-op")
    StreamDedup.addTombstones(Seq(2L).toDF("doc_id"), indexDir)
    val folded = StreamDedup.compact(spark, indexDir)
    assert(folded.nonEmpty)
    assert(spark.read.parquet(s"$indexDir/${folded.get}/entries")
      .select("id").as[Long].collect().toSet === Set(0L, 1L))
  }
}
