package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Deduplication family for large text corpora.
  *
  * - `exact`: content-hash groupBy — one shuffle on the hash, map-side
  *   partial agg; the canonical 100 TB exact-dedup plan.
  * - `minhash`: MinHash + LSH banding — shingle → minhash signature →
  *   band buckets → self-join per bucket. Candidate pairs stay ~linear in
  *   corpus size because the join key is (band, bucket-hash), never a
  *   cross join.
  * - `simhash`: 64-bit SimHash + disjoint bit-band blocking for
  *   hamming-near candidates; band count derives from the hamming
  *   radius so candidate recall is 100% by pigeonhole.
  * - `ngramJaccardPairs`: exact word n-gram Jaccard verification on
  *   candidate pairs (the verify pass after any LSH candidate
  *   generation).
  * - `semanticDedup`: embedding-space dedup with k-means blocking
  *   (SemDeDup) — keep each duplicate group's farthest-from-centroid
  *   member.
  * - incremental family: `exactIncremental` / `incrementalDedup` /
  *   `incrementalSimhashDedup` / `incrementalEmbeddingDedup` probe
  *   persisted, shard-partitioned corpus indexes so continuous ingest
  *   pays O(batch + candidates), never O(corpus).
  *
  * Signature math has two interchangeable forms with identical hash
  * values: pure `functions._` array expressions (portable, no session
  * requirements) and native Catalyst kernels (minhash_signature /
  * word_shingles / simhash64 / jaccard_shingles, picked automatically
  * when GraftExtensions is installed — the higher-order-function forms
  * evaluate interpreted, the kernels run inside codegen). No UDFs, no
  * driver-side loops; hash values are reduced below 2^32 before
  * multiply-add so the arithmetic can never overflow a long even under
  * ANSI mode.
  */
object Dedup {

  private val log = org.slf4j.LoggerFactory.getLogger(getClass)

  /** Canonical text form for NEAR-EXACT dedup (the Dolma/CCNet
    * "fuzzy exact" recipe): lowercase, every run of non-alphanumeric
    * characters (Unicode-aware — `\p{L}\p{N}`, so non-Latin scripts
    * survive) collapsed to one space, ends trimmed. Two documents
    * differing only in case, punctuation, or whitespace layout
    * normalize identically; [[exact]] over this column removes the
    * re-crawled/re-formatted copies a byte-hash dedup misses, at zero
    * additional shuffle cost (the normalization is a pure codegen'd
    * projection feeding the same md5 group-by). */
  def normalizeForDedup(text: Column): Column =
    trim(regexp_replace(lower(text), "[^\\p{L}\\p{N}]+", " "))

  /** Exact dedup via md5 content hash. Returns one row per distinct
    * content with the kept (minimum) id and the duplicate count.
    */
  def exact(df: DataFrame, idCol: String, contentCol: String): DataFrame =
    df.groupBy(md5(col(contentCol)).as("content_hash"))
      .agg(
        min(col(idCol)).as("keep_id"),
        count(lit(1)).as("n_copies")
      )

  /** Word n-gram (shingle) set as a deterministic array column.
    * Tokenises on single spaces (matches the DuckDB oracle's
    * string_split). */
  def shingles(text: Column, n: Int): Column = {
    val words = split(text, " ")
    array_distinct(
      filter(
        transform(
          sequence(lit(0), greatest(size(words) - n, lit(0))),
          i => when(i + n <= size(words),
            concat_ws(" ", slice(words, i + 1, lit(n))))
        ),
        x => x.isNotNull
      )
    )
  }

  /** Exact Jaccard similarity between two precomputed shingle arrays. */
  def jaccard(a: Column, b: Column): Column = {
    val inter = size(array_intersect(a, b))
    val union = size(array_union(a, b))
    when(union === 0, lit(0.0))
      .otherwise(inter.cast("double") / union.cast("double"))
  }

  /** n-gram Jaccard over same-block candidate pairs. At scale the pairs
    * MUST come from an LSH bucket join, never a cross join; here the
    * caller supplies the blocking key that bounds the pair space.
    */
  def ngramJaccardPairs(
      docs: DataFrame, idCol: String, textCol: String,
      blockCol: String, n: Int, threshold: Double): DataFrame = {
    // shingles travel to the pair join as raw 64-bit hashes (8 bytes
    // each, primitive sort-merge Jaccard) — see minhashNearDup for the
    // collision bound
    val withSh = Parallelism.ensure(
      docs.select(col(idCol), col(blockCol), col(textCol)))
      .select(col(idCol), col(blockCol),
        transform(shinglesCol(docs, col(textCol), n), xxhash64(_)).as("__sh"))
    val a = withSh.select(col(idCol).as("a_id"), col(blockCol).as("__blk"),
      col("__sh").as("__sha"))
    val b = withSh.select(col(idCol).as("b_id"), col(blockCol).as("__blk2"),
      col("__sh").as("__shb"))
    a.join(b, col("__blk") === col("__blk2") && col("a_id") < col("b_id"))
      .withColumn("jaccard", round(jaccardLongsCol(docs, col("__sha"), col("__shb")), 4))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  // ------------------------------------------------------------------
  // MinHash + LSH
  // ------------------------------------------------------------------

  private val P32 = 4294967291L // largest 32-bit prime

  /** Shingle set hashed once into [0, P32) longs — the expensive string
    * hashing happens a single time per row; every permutation then works
    * on integer arithmetic only. */
  def shingleHashes(shingleArr: Column): Column =
    transform(shingleArr, x => pmod(xxhash64(x), lit(P32)))

  /** MinHash signature from pre-hashed shingles: for permutation i,
    * h_i(x) = ((2i+1) * x + 7919(i+1)) mod P32; the signature element is
    * the min over the set. x < 2^32 and 2i+1 < 2^7, so the multiply
    * never overflows a long.
    *
    * A single aggregate with an array accumulator (not numHashes
    * separate aggregates): the generated code is one tight loop, small
    * enough for the JIT — the N-aggregate form compiled to a method too
    * large to stay hot. */
  def minhashSignatureFromHashes(hashArr: Column, numHashes: Int): Column =
    aggregate(
      hashArr,
      array_repeat(lit(Long.MaxValue), numHashes),
      (acc, x) => zip_with(acc, sequence(lit(0), lit(numHashes - 1)),
        (v, i) => least(v, pmod(x * (i.cast("long") * 2L + 1L)
          + lit(7919L) * (i.cast("long") + 1L), lit(P32)))))

  /** MinHash signature of a shingle array. */
  def minhashSignature(shingleArr: Column, numHashes: Int): Column =
    minhashSignatureFromHashes(shingleHashes(shingleArr), numHashes)

  /** Prefer the native MinHashSignature expression (codegen'd tight
    * loop, ~20x) when GraftExtensions is installed; identical hash
    * values either way, so bucket assignments don't depend on the
    * path. */
  private def signatureCol(
      docs: DataFrame, shingleArr: Column, numHashes: Int): Column =
    if (docs.sparkSession.catalog.functionExists("minhash_signature"))
      call_function("minhash_signature", shingleArr, lit(numHashes))
    else
      minhashSignature(shingleArr, numHashes)

  /** Same adaptive choice for shingle construction (identical output
    * sets either way): the native codegen kernel when GraftExtensions
    * is installed, the composed-builtin fallback otherwise. Public —
    * q124's set-similarity join shingles through the same kernel. */
  def shinglesCol(docs: DataFrame, text: Column, n: Int): Column =
    if (docs.sparkSession.catalog.functionExists("word_shingles"))
      call_function("word_shingles", text, lit(n))
    else
      shingles(text, n)

  /** Adaptive set-Jaccard: native single-pass expression when
    * registered, array_intersect/array_union otherwise. */
  private def jaccardCol(docs: DataFrame, a: Column, b: Column): Column =
    if (docs.sparkSession.catalog.functionExists("jaccard_shingles"))
      call_function("jaccard_shingles", a, b)
    else
      jaccard(a, b)

  /** Analytic LSH banding plan: the (bands, rowsPerBand) split of
    * `numHashes` whose S-curve threshold (1/b)^(1/r) — the Jaccard
    * similarity at which a pair's candidate probability crosses 50%
    * (Leskovec/Rajaraman/Ullman, Mining of Massive Datasets §3.4) —
    * sits closest to the requested `threshold`. Returns the chosen
    * split, its actual crossing point, and P(candidate | s) =
    * 1 − (1 − s^r)^b at the threshold and at ±0.1 around it, so a
    * caller can read the false-negative/false-positive trade before
    * committing a corpus pass. Driver-side arithmetic only — the
    * planner exists because every minhash parameter choice in a
    * pipeline is otherwise folklore; DedupSpec pins hand-computed
    * curves, and that q31's default 16×3 split is the planner's pick
    * for a recall-leaning 0.4 target (its crossing point is 0.397 —
    * deliberately BELOW the 0.5 verify threshold, so near-threshold
    * pairs still surface as candidates for the exact verify). */
  final case class LshPlan(
      bands: Int, rowsPerBand: Int, threshold50: Double,
      pAtThreshold: Double, pBelow: Double, pAbove: Double)

  def lshPlan(threshold: Double, numHashes: Int): LshPlan = {
    require(threshold > 0 && threshold < 1,
      "lshPlan: threshold in (0,1)")
    require(numHashes >= 2, "lshPlan: numHashes >= 2")
    def pCand(s: Double, b: Int, r: Int): Double =
      1.0 - math.pow(1.0 - math.pow(s, r), b)
    val splits = (1 to numHashes)
      .filter(b => numHashes % b == 0 && numHashes / b >= 1)
      .map(b => (b, numHashes / b))
      .filter(_._2 >= 1)
    val (b, r) = splits.minBy { case (b, r) =>
      val t50 = math.pow(1.0 / b, 1.0 / r)
      (math.abs(t50 - threshold), b) // ties: fewer bands = fewer keys
    }
    val t50 = math.pow(1.0 / b, 1.0 / r)
    LshPlan(b, r, t50,
      pCand(threshold, b, r),
      pCand(math.max(threshold - 0.1, 0.0), b, r),
      pCand(math.min(threshold + 0.1, 1.0), b, r))
  }

  /** (band, bucket) structs for a signature array — the ONE banding
    * hash, shared by the self-join path and the incremental index so
    * bucket keys computed in different runs (or persisted to parquet)
    * stay join-compatible. */
  private def bandBucketStructs(
      sig: Column, bands: Int, rowsPerBand: Int): Column =
    transform(sequence(lit(0), lit(bands - 1)), b =>
      struct(
        b.as("band"),
        xxhash64(concat_ws(",",
          transform(slice(sig, b * lit(rowsPerBand) + 1, lit(rowsPerBand)),
            v => v.cast("string")))).as("bucket")))

  /** LSH banding: split the signature into `bands` bands and emit
    * (band_id, band_hash) bucket keys. Docs sharing any bucket become
    * candidate pairs via an equi-join on the bucket key — a plain shuffle
    * hash join on a well-distributed key, never a cross join.
    */
  def minhashCandidates(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, numHashes: Int, bands: Int): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    val rowsPerBand = numHashes / bands
    // repartition the raw text BEFORE the expensive stages so signature
    // work spreads across all cores even from a one-split scan
    val spread = Parallelism.ensure(
      docs.select(col(idCol).as("__id"), col(textCol).as("__t")))
    val sig = spread
      .select(col("__id"), shinglesCol(docs, col("__t"), shingleN).as("__sh"))
      .select(col("__id"),
        signatureCol(docs, col("__sh"), numHashes).as("__sig"))
    val buckets = sig.select(
      col("__id"),
      explode(bandBucketStructs(col("__sig"), bands, rowsPerBand)).as("__bk"))
      .select(col("__id"), col("__bk.band"), col("__bk.bucket"))
    // repartition on the join key BEFORE the self-join: both sides then
    // share one identical exchange subtree, so ReuseExchange computes
    // the signatures once and the join is co-partitioned (no further
    // shuffle)
    val keyed = buckets.repartition(col("band"), col("bucket"))
    val l = keyed.select(col("__id").as("a_id"), col("band"), col("bucket"))
    val r = keyed.select(col("__id").as("b_id"), col("band").as("band2"),
      col("bucket").as("bucket2"))
    l.join(r, col("band") === col("band2") && col("bucket") === col("bucket2") &&
        col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
  }

  /** Full MinHash near-dup: LSH candidates verified by exact n-gram
    * Jaccard ≥ threshold. */
  def minhashNearDup(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.5): DataFrame = {
    // The candidate-pair set is consumed twice below (candidate ids +
    // the verify join). Without a materialization barrier each consumer
    // re-runs the ENTIRE shingle→signature→band-join pipeline (plan
    // audit showed 3 evaluations, zero exchange reuse across them) —
    // so checkpoint the pairs once: they are tiny relative to the
    // corpus (~candidates/doc rows of two ids), and every consumer then
    // reads the materialized pairs instead of recomputing signatures.
    val cands = minhashCandidates(docs, idCol, textCol, shingleN, numHashes, bands)
      .localCheckpoint(false)
    // verify-stage shingles only for docs that appear in a candidate
    // pair (semi-join first): at corpus scale the candidate set is a
    // tiny fraction, so this avoids re-shingling the whole corpus.
    // Single explode pass, not a two-branch union (a union would
    // evaluate `cands` once per branch).
    val candIds = cands
      .select(explode(array(col("a_id"), col("b_id"))).as("__id"))
      .distinct()
    // Shingles travel to the pair join as RAW 64-bit hashes, not
    // strings: set Jaccard is preserved exactly unless two distinct
    // shingles in one pair's union collide in 64-bit space (~1e-16 per
    // pair — negligible and deterministic), while the shuffle payload
    // shrinks to 8 bytes per shingle and the per-pair kernel becomes a
    // primitive sort-merge instead of string hash sets.
    val sh = Parallelism.ensure(
      docs.select(col(idCol).as("__id"), col(textCol).as("__t"))
        .join(candIds, Seq("__id"), "left_semi"))
      .select(col("__id"),
        transform(shinglesCol(docs, col("__t"), shingleN), xxhash64(_)).as("__sh"))
    cands
      .join(sh.select(col("__id").as("a_id"), col("__sh").as("__sha")), "a_id")
      .join(sh.select(col("__id").as("b_id"), col("__sh").as("__shb")), "b_id")
      .withColumn("jaccard", round(jaccardLongsCol(docs, col("__sha"), col("__shb")), 4))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** Adaptive long-array Jaccard: native sort-merge kernel when
    * registered, array_intersect/array_union otherwise. */
  private def jaccardLongsCol(docs: DataFrame, a: Column, b: Column): Column =
    if (docs.sparkSession.catalog.functionExists("jaccard_longs"))
      call_function("jaccard_longs", a, b)
    else
      jaccard(a, b)

  // ------------------------------------------------------------------
  // Incremental dedup: a new batch against a persisted corpus index
  // ------------------------------------------------------------------

  /** Persisted MinHash state of an already-deduped corpus: ONE table
    * of (id, shard, shingles array<long>,
    * bands array<struct<band,bucket>>) — the band keys for candidate
    * generation and the hashed shingles for exact-Jaccard verify.
    *
    * This is THE 100 TB shape for a training pipeline that ingests
    * continuously: the corpus is shingled and signed ONCE when it
    * enters, and every later batch dedups against the stored index —
    * never re-reading, re-shingling, or re-signing the corpus. Daily
    * cost is O(batch) + a band equi-join against the index, not
    * O(corpus).
    *
    * `shard` = xxhash64(id) mod [[Dedup.IndexShards]]. [[save]]
    * PARTITIONS the parquet by it, and the probe's verify fetch
    * filters to the candidate ids' shards first — so a small batch
    * reads only the candidate-bearing fraction of the (corpus-text-
    * sized) shingles column instead of scanning it whole. The shard
    * count is a fixed constant on purpose: it is baked into every
    * saved index, and a configurable value that disagreed between
    * build and probe would silently drop true candidates.
    *
    * One combined table deliberately: [[save]] is a single corpus pass
    * (two tables from one lineage would each recompute the features),
    * and a loaded index serves the probe's two consumers as two
    * column-pruned scans of the same parquet. A freshly BUILT index
    * probed without saving would still evaluate its lineage per
    * consumer — call [[materialize]] first (or save + load, which at
    * scale is the point of an index).
    */
  final case class MinhashIndex(entries: DataFrame) {
    /** (id, band, bucket) view for candidate generation. */
    def bands: DataFrame =
      entries.select(col("id"), explode(col("bands")).as("__bk"))
        .select(col("id"), col("__bk.band"), col("__bk.bucket"))

    /** (id, shard, shingles) view for exact-Jaccard verify. */
    def shingles: DataFrame = entries.select("id", "shard", "shingles")

    /** Persist to `<dir>/entries` parquet, partitioned by `shard` so
      * probes prune the verify fetch — one corpus pass.
      * `mode = "overwrite"` is for deterministic replays (streaming
      * delta folders keyed on batch id); the default refuses to clobber
      * an existing index.
      *
      * An EMPTY index (a streaming delta whose batch had no survivors)
      * writes unpartitioned: partitionBy on empty input emits no files
      * at all, leaving a folder whose schema cannot be inferred back.
      * The empty parquet file keeps `shard` as a data column, which
      * unions cleanly with shard-partitioned reads. */
    def save(dir: String, mode: String = "error"): Unit = {
      val w = entries.write.mode(mode)
      if (entries.isEmpty) w.parquet(s"$dir/entries")
      else w.partitionBy("shard").parquet(s"$dir/entries")
    }

    /** Pin the entries so repeated probes don't recompute the feature
      * lineage (for in-memory use; persisted indexes don't need it). */
    def materialize(): MinhashIndex =
      MinhashIndex(entries.localCheckpoint(false))

    /** Index for the grown corpus: existing entries plus a delta
      * (typically [[Dedup.incrementalDedup]]'s survivor index). */
    def union(delta: MinhashIndex): MinhashIndex =
      MinhashIndex(entries.unionByName(delta.entries))
  }

  object MinhashIndex {
    /** Indexes saved before the shard column existed load with the
      * shard backfilled from the id — same values [[save]] would have
      * written, so probes work unchanged (without partition pruning,
      * which those files never had). */
    def load(spark: org.apache.spark.sql.SparkSession, dir: String): MinhashIndex = {
      IndexMaintenance.healUnreadable(spark, dir, Seq("entries"))
      val e = spark.read.parquet(s"$dir/entries")
      MinhashIndex(IndexMaintenance.dropTombstoned(
        if (e.columns.contains("shard")) e
        else e.withColumn("shard", shardOf(col("id"))),
        spark, dir))
    }
  }

  /** Batch feature frame shared by index build and probe:
    * (id, shingles array<long>, __sig). One pass computes both the
    * verify-shingles (raw xxhash64 longs — see minhashNearDup for the
    * collision bound) and the MinHash signature. */
  private def minhashFeatures(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int, numHashes: Int): DataFrame =
    Parallelism.ensure(
      docs.select(col(idCol).as("id"), col(textCol).as("__t")))
      .select(col("id"), shinglesCol(docs, col("__t"), shingleN).as("__shstr"))
      .select(col("id"),
        transform(col("__shstr"), xxhash64(_)).as("shingles"),
        signatureCol(docs, col("__shstr"), numHashes).as("__sig"))

  /** Verify-fetch pruning granularity baked into every MinhashIndex —
    * fixed, never a parameter (a build/probe mismatch would silently
    * drop candidates). 64 shards bound the per-batch verify read at
    * ~1/64 of the corpus per candidate shard touched. */
  val IndexShards: Int = 64

  private[operators] def shardOf(id: Column): Column =
    pmod(xxhash64(id), lit(IndexShards.toLong)).cast("int")

  /** Whether an index's entries ARE a file scan (a save()d index, or
    * a union of saved roots, modulo projections/filters) — only then
    * does a shard filter prune I/O via partition pruning. A freshly
    * BUILT index has aggregates/generators in its lineage even when
    * the underlying corpus is parquet, and an in-memory
    * (materialize()d) one is a LogicalRDD; in both the filter would
    * buy nothing and its driver-collected shard list would cost an
    * extra synchronous job per probe. */
  private[graft] def isFileBacked(entries: DataFrame): Boolean = {
    import org.apache.spark.sql.catalyst.plans.logical._
    def scanOnly(p: LogicalPlan): Boolean = p match {
      case _: org.apache.spark.sql.execution.datasources.LogicalRelation => true
      case u: Union => u.children.forall(scanOnly)
      case pj: Project => scanOnly(pj.child)
      case f: Filter => scanOnly(f.child)
      // a tombstone anti-join (IndexMaintenance.dropTombstoned): the
      // probe's shard filter pushes through the join's LEFT side to
      // the scan, so the pruning fast path still applies
      case j: Join
          if j.joinType == org.apache.spark.sql.catalyst.plans.LeftAnti =>
        scanOnly(j.left)
      case _ => false
    }
    scanOnly(entries.queryExecution.optimizedPlan)
  }

  /** Build the MinHash index for a (deduped) corpus. The same
    * (shingleN, numHashes, bands) MUST be used for every later probe —
    * bucket hashes from different parameters never match. */
  def buildMinhashIndex(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 32, bands: Int = 8): MinhashIndex = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    MinhashIndex(
      minhashFeatures(docs, idCol, textCol, shingleN, numHashes)
        .select(col("id"), shardOf(col("id")).as("shard"), col("shingles"),
          bandBucketStructs(col("__sig"), bands, numHashes / bands)
            .as("bands")))
  }

  /** Near-dup pairs between a new batch and the indexed corpus:
    * (corpus_id, batch_id, jaccard) with jaccard ≥ threshold.
    *
    * Plan shape: the batch (the small side by construction — a daily
    * delta vs the whole corpus) is shingled/signed once and
    * localCheckpointed, then BROADCAST against the index's band table —
    * the corpus never shuffles. Verify fetches corpus shingles for
    * candidate ids only (semi-join), so the per-batch cost is
    * O(batch + candidates), independent of corpus size. Set
    * `broadcastBatch = false` for a batch too big to broadcast — the
    * joins fall back to shuffles on (band, bucket) and id. */
  def incrementalNearDup(
      batch: DataFrame, index: MinhashIndex, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.5, broadcastBatch: Boolean = true): DataFrame = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    // tiny relative to the corpus; consumed by the band join AND the
    // verify join — materialise once
    val feat = minhashFeatures(batch, idCol, textCol, shingleN, numHashes)
      .localCheckpoint(false)
    incrementalNearDupFeat(feat, index, numHashes, bands, threshold,
      broadcastBatch)
  }

  /** [[incrementalNearDup]] over an already-materialized batch feature
    * frame (id, shingles, __sig) — split out so [[incrementalDedup]]
    * featurizes the batch ONCE for the corpus probe, the within-batch
    * dedup and the delta index instead of three times. */
  private def incrementalNearDupFeat(
      feat: DataFrame, index: MinhashIndex,
      numHashes: Int, bands: Int,
      threshold: Double, broadcastBatch: Boolean): DataFrame = {
    def maybeB(df: DataFrame) = if (broadcastBatch) broadcast(df) else df
    val batchBands = feat.select(col("id").as("b_id"),
      explode(bandBucketStructs(col("__sig"), bands, numHashes / bands))
        .as("__bk"))
      .select(col("b_id"), col("__bk.band").as("band"),
        col("__bk.bucket").as("bucket"))
    val cands = index.bands
      .join(maybeB(batchBands), Seq("band", "bucket"))
      .select(col("id").as("a_id"), col("b_id"))
      .distinct()
      .localCheckpoint(false)
    // corpus shingles for candidate corpus docs ONLY. On a SAVED index
    // a shard filter comes first: the candidate ids' shards are a tiny
    // driver-collected set (≤ IndexShards ints — cands is already
    // materialised), and `shard` is the parquet partition column, so a
    // small batch READS only the candidate-bearing fraction of the
    // corpus-text-sized shingles column instead of scanning it whole
    // (1-doc probe floor 3.7 → 1.4 s vs a 150k-doc index); the
    // semi-join then picks exact rows within those shards. An
    // in-memory index skips the filter — nothing to prune, and the
    // shard collect would cost an extra synchronous job.
    val pruned =
      if (!isFileBacked(index.entries)) index.shingles
      else {
        val candShards = cands
          .select(shardOf(col("a_id")).as("s")).distinct()
          .collect().map(_.getInt(0)).toSeq
        index.shingles.filter(col("shard").isin(candShards: _*))
      }
    val corpusSh = pruned
      .join(cands.select(col("a_id").as("id")).distinct(), Seq("id"), "left_semi")
      .select(col("id").as("a_id"), col("shingles").as("__sha"))
    cands
      .join(corpusSh, "a_id")
      .join(maybeB(feat.select(col("id").as("b_id"),
        col("shingles").as("__shb"))), "b_id")
      .withColumn("jaccard",
        round(jaccardLongsCol(feat, col("__sha"), col("__shb")), 4))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
  }

  /** Incremental near-dedup of a batch against an indexed corpus.
    * Returns (survivors, delta-index):
    * - a batch doc near-duplicating ANY corpus doc is dropped (the
    *   corpus copy is already in the training set);
    * - among the rest, within-batch near-dup clusters keep their
    *   minimum id (same policy as [[dropNearDuplicates]]);
    * - the delta is the survivors' index, ready to
    *   [[MinhashIndex.union]] into the corpus index for the next batch.
    *
    * Near-duplication is not transitive, so a batch doc whose only link
    * to the corpus runs THROUGH a dropped batch sibling survives — by
    * design: it cleared the similarity bar against everything retained.
    */
  def incrementalDedup(
      batch: DataFrame, index: MinhashIndex, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.5, broadcastBatch: Boolean = true): (DataFrame, MinhashIndex) = {
    require(numHashes % bands == 0, "numHashes must divide into bands")
    // The batch is shingled + signed ONCE; the corpus probe, the
    // within-batch dedup and the returned delta index all read this
    // materialized frame. (It used to be featurized three times: by
    // incrementalNearDup, by dropNearDuplicates' fresh
    // minhashNearDup, and by the delta buildMinhashIndex — same
    // deterministic hashes each time, guide §1.2 step 1.)
    val feat = minhashFeatures(batch, idCol, textCol, shingleN, numHashes)
      .localCheckpoint(false)
    val vsCorpus = incrementalNearDupFeat(feat, index, numHashes, bands,
      threshold, broadcastBatch)
      .select(col("b_id").as(idCol))
    val inBatch = batch.join(vsCorpus, Seq(idCol), "left_anti")
    // within-batch near-dup over the surviving rows' SAME features —
    // identical band keys / shingles as a fresh minhashNearDup of
    // inBatch (the featurization is a pure deterministic projection)
    val bfeat = feat.join(vsCorpus.select(col(idCol).as("id")),
      Seq("id"), "left_anti")
    val rowsPerBand = numHashes / bands
    val buckets = bfeat.select(col("id").as("__id"),
      explode(bandBucketStructs(col("__sig"), bands, rowsPerBand)).as("__bk"))
      .select(col("__id"), col("__bk.band"), col("__bk.bucket"))
    val keyed = buckets.repartition(col("band"), col("bucket"))
    val l = keyed.select(col("__id").as("a_id"), col("band"), col("bucket"))
    val r = keyed.select(col("__id").as("b_id"), col("band").as("band2"),
      col("bucket").as("bucket2"))
    val pairs = l.join(r,
        col("band") === col("band2") && col("bucket") === col("bucket2") &&
          col("a_id") < col("b_id"))
      .select("a_id", "b_id").distinct()
      .join(bfeat.select(col("id").as("a_id"), col("shingles").as("__sha")),
        "a_id")
      .join(bfeat.select(col("id").as("b_id"), col("shingles").as("__shb")),
        "b_id")
      .withColumn("jaccard",
        round(jaccardLongsCol(feat, col("__sha"), col("__shb")), 4))
      .filter(col("jaccard") >= threshold)
      .select("a_id", "b_id", "jaccard")
    val cc = connectedComponents(pairs, "a_id", "b_id")
    val losers = cc.filter(col("component") =!= col("id"))
      .select(col("id").as(idCol))
    val survivors = inBatch.join(losers, Seq(idCol), "left_anti")
    val sfeat = bfeat.join(losers.select(col(idCol).as("id")),
      Seq("id"), "left_anti")
    (survivors,
      MinhashIndex(sfeat.select(col("id"), shardOf(col("id")).as("shard"),
        col("shingles"),
        bandBucketStructs(col("__sig"), bands, rowsPerBand).as("bands"))))
  }

  /** Exact incremental dedup: drop batch rows whose content already
    * appears in the corpus (hash anti-join), then keep the minimum id
    * per remaining distinct content. The corpus side reduces to its
    * distinct content hashes — at scale, persist those once and
    * anti-join each batch against the (small) hash set, not the corpus.
    */
  def exactIncremental(
      batch: DataFrame, corpusHashes: DataFrame,
      idCol: String, contentCol: String): DataFrame = {
    val fresh = batch
      .withColumn("__h", md5(col(contentCol)))
      .join(corpusHashes.select(col("content_hash").as("__h")),
        Seq("__h"), "left_anti")
    fresh
      .groupBy(col("__h").as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
  }

  /** Line-level boilerplate removal (the CCNet/RefinedWeb recipe):
    * drop every line that appears in at least `minDocs` DISTINCT
    * documents — navigation chrome, cookie banners, license headers —
    * and reassemble each document from its surviving lines in order.
    * This is the practical form of cross-document substring dedup used
    * by web-scale corpus pipelines.
    *
    * Scale shape: lines explode once; the repeat count groups on the
    * line's xxhash64 (8-byte shuffle payload, map-side combined — the
    * same raw-64-bit-hash trade as minhashNearDup's shingle verify: a
    * colliding innocent line is dropped with probability ~lines²/2⁶⁴,
    * negligible below ~10⁹ distinct lines and bounded-loss above);
    * the boilerplate hash set anti-joins the exploded lines; the
    * reassembly groups by doc id. Documents whose every line is
    * boilerplate come back with empty text (gate downstream).
    */
  def dropRepeatedLines(
      docs: DataFrame, idCol: String, textCol: String,
      sep: String = "\n", minDocs: Int = 3): DataFrame = {
    require(minDocs >= 2, "dropRepeatedLines: minDocs >= 2")
    val others = docs.columns.filterNot(c => c == idCol || c == textCol)
    val lines = Parallelism.ensure(
      docs.select(col(idCol).as("__id"), col(textCol).as("__t")))
      .select(col("__id"),
        posexplode(split(col("__t"), java.util.regex.Pattern.quote(sep)))
          .as(Seq("__pos", "__line")))
      .withColumn("__h", xxhash64(col("__line")))
    val boilerplate = lines
      .groupBy(col("__h"))
      .agg(countDistinct(col("__id")).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("__h"))
    val cleaned = lines
      .join(boilerplate, Seq("__h"), "left_anti")
      .groupBy(col("__id"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("__pos"), col("__line")))),
          e => e.getField("__line")),
        sep).as("__clean"))
    docs.select(col(idCol).as("__id") +: others.map(col): _*)
      .join(cleaned, Seq("__id"), "left")
      .select(col("__id").as(idCol) +:
        coalesce(col("__clean"), lit("")).as(textCol) +:
        others.map(col): _*)
  }

  /** Chunk-level boilerplate removal — [[dropRepeatedLines]] for
    * CONTINUOUS text: lines presuppose newlines, but navigation
    * chrome/templated passages recur inside flowing prose too. Chunk
    * boundaries come from the content itself (Corpus.cdcChunks'
    * rolling hash via the native `cdc_cuts` kernel), so the same
    * boilerplate passage chunks identically in every document
    * regardless of what surrounds it — the property that makes
    * cross-document matching work without any separator convention.
    * Every chunk appearing in ≥ `minDocs` distinct docs is dropped
    * and documents reassemble from their surviving chunks in order.
    *
    * Scale shape mirrors [[dropRepeatedLines]]: the repeat count
    * groups on the chunk's xxhash64 (8-byte payload, map-side
    * combined; column pruning keeps chunk text out of this
    * exchange), the boilerplate set anti-joins the chunk stream, and
    * reassembly groups by doc id — text crosses the wire twice,
    * once chunked and once reassembled. All-boilerplate documents
    * come back with empty text (gate downstream). */
  def dropBoilerplateChunks(
      docs: DataFrame, idCol: String, textCol: String,
      minDocs: Int = 3, window: Int = 4, modulus: Int = 64): DataFrame = {
    require(minDocs >= 2, "dropBoilerplateChunks: minDocs >= 2")
    val others = docs.columns.filterNot(c => c == idCol || c == textCol)
    val cuts = call_function("cdc_cuts", col("__t"),
      lit(window), lit(modulus))
    val chunks = Parallelism.ensure(
      docs.select(col(idCol).as("__id"), col(textCol).as("__t")))
      .filter(length(col("__t")) > 0)
      .select(col("__id"), col("__t"), cuts.as("__cuts"))
      .select(col("__id"), col("__t"), col("__cuts"),
        posexplode(slice(col("__cuts"), lit(1), size(col("__cuts")) - 1))
          .as(Seq("__pos", "__s0")))
      .select(col("__id"), col("__pos"),
        col("__t").substr(col("__s0") + 1,
          element_at(col("__cuts"), col("__pos") + 2) - col("__s0"))
          .as("__piece"))
      .withColumn("__h", xxhash64(col("__piece")))
    val boilerplate = chunks
      .groupBy(col("__h"))
      .agg(countDistinct(col("__id")).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("__h"))
    val cleaned = chunks
      .join(boilerplate, Seq("__h"), "left_anti")
      .groupBy(col("__id"))
      .agg(array_join(
        transform(
          array_sort(collect_list(struct(col("__pos"), col("__piece")))),
          e => e.getField("__piece")),
        "").as("__clean"))
    docs.select(col(idCol).as("__id") +: others.map(col): _*)
      .join(cleaned, Seq("__id"), "left")
      .select(col("__id").as(idCol) +:
        coalesce(col("__clean"), lit("")).as(textCol) +:
        others.map(col): _*)
  }

  /** Serialized Bloom filter over `xxhash64(content)` of every corpus
    * row — the constant-size stand-in for the corpus hash set. One
    * corpus pass, map-side combined, a single binary to the driver.
    * Sized by [[graft.functions.BloomFunctions.optimalNumBits]]; the
    * session's runtime-bloom clamp confs are raised to fit (they cap,
    * never fail — an under-sized sketch only raises the false-positive
    * rate, never produces a false negative).
    */
  def buildContentBloom(
      corpus: DataFrame, contentCol: String,
      expectedItems: Long, fpp: Double = 0.03): Array[Byte] = {
    import graft.functions.BloomFunctions._
    val bits = optimalNumBits(expectedItems, fpp)
    val conf = corpus.sparkSession.conf
    def raise(key: String, needed: Long): Unit =
      if (conf.getOption(key).forall(_.toLong < needed))
        conf.set(key, needed.toString)
    raise("spark.sql.optimizer.runtime.bloomFilter.maxNumItems", expectedItems)
    raise("spark.sql.optimizer.runtime.bloomFilter.maxNumBits", bits)
    corpus
      .select(bloomAgg(xxhash64(col(contentCol)), expectedItems, bits).as("bf"))
      .head().getAs[Array[Byte]](0)
  }

  /** [[exactIncremental]] with a Bloom pre-filter: batch rows whose
    * content hash is bloom-NEGATIVE are definitively new (no false
    * negatives) and bypass the anti-join entirely; only bloom-positives
    * — true duplicates plus an fpp-sized sliver — shuffle against the
    * corpus hash set. Output is row-identical to [[exactIncremental]];
    * the sketch only routes rows.
    *
    * The 100 TB shape: the corpus participates as one broadcast binary
    * (built once per ingest epoch by [[buildContentBloom]]) plus an
    * anti-join whose probe side is ~fpp × batch instead of the whole
    * batch. */
  def exactIncrementalBloom(
      batch: DataFrame, bloom: Array[Byte], corpusHashes: DataFrame,
      idCol: String, contentCol: String): DataFrame = {
    import graft.functions.BloomFunctions.bloomMightContain
    val probed = batch
      .withColumn("__h", md5(col(contentCol)))
      .withColumn("__maybe",
        bloomMightContain(bloom, xxhash64(col(contentCol))))
    val definitelyNew = probed.filter(!col("__maybe"))
    val checked = probed.filter(col("__maybe"))
      .join(corpusHashes.select(col("content_hash").as("__h")),
        Seq("__h"), "left_anti")
    definitelyNew.unionByName(checked)
      .groupBy(col("__h").as("content_hash"))
      .agg(min(col(idCol)).as("keep_id"), count(lit(1)).as("n_copies"))
  }

  // ------------------------------------------------------------------
  // Embedding near-dup (hyperplane LSH)
  // ------------------------------------------------------------------

  /** Embedding-cosine near-dup via random-hyperplane LSH: vectors
    * sharing a sign-bucket become candidates (equi-join on the packed
    * bucket long — similar vectors agree on most hyperplane signs), then
    * exact cosine verifies. `numPlanes` trades recall (fewer planes =
    * bigger buckets) against candidate volume. Scale: one narrow
    * projection + one equi-join; the corpus never cross-joins.
    *
    * MULTI-PROBE (Lv et al., "Multi-Probe LSH", VLDB 2007):
    * `probeFlips` > 0 additionally probes every bucket within that
    * Hamming distance of a vector's own bucket — for sign LSH the
    * near-miss buckets are exactly the bit-flips, so flipping ≤ f of
    * the `numPlanes` bits recovers pairs that disagree on up to f
    * plane signs. One table then buys the recall of many: a pair at
    * per-plane agreement p = 1−θ/π is recalled at P(Hamming ≤ f)
    * instead of p^planes (f = 1 at 4 planes: p⁴ + 4p³(1−p) — e.g.
    * 0.86 → 0.99 at θ = 25°), where the classic alternative pays L
    * independent tables (L× memory and L full scans). Cost: ONLY the
    * probe side of the join replicates (1 + planes [+ C(planes,2)]
    * rows of 8-byte keys + the vector); the indexed side and the
    * verify stay unchanged, and each true pair still arrives at the
    * verify exactly once (probe buckets are distinct, so a given
    * (a, b) meets on exactly one probe) — no dedup pass needed.
    * `probeFlips = 0` is the original single-bucket behavior. */
  def embeddingNearDup(
      vecs: DataFrame, idCol: String, vecCol: String, dim: Int,
      numPlanes: Int = 8, threshold: Double = 0.8,
      probeFlips: Int = 0): DataFrame = {
    import graft.functions.VectorFunctions._
    require(probeFlips >= 0 && probeFlips <= 2,
      "embeddingNearDup: probeFlips in 0..2 (3+ flips probes most of " +
        "the hypercube — lower numPlanes instead)")
    val bucketed = Parallelism.ensure(
      vecs.select(col(idCol).as("__id"), col(vecCol).as("__v")))
      .select(col("__id"), col("__v"),
        hyperplaneBucket(col("__v"), dim, numPlanes).as("__bkt"),
        norm(col("__v")).as("__n"))
    // probe bucket set: own bucket + all ≤ probeFlips bit-flips
    // (distinct by construction — each is a distinct XOR mask)
    val probeCols: Seq[org.apache.spark.sql.Column] =
      col("__bkt") +:
        ((if (probeFlips >= 1)
          (0 until numPlanes).map(p =>
            col("__bkt").bitwiseXOR(lit(1L << p)))
        else Seq.empty) ++
          (if (probeFlips >= 2)
            for { p <- 0 until numPlanes; q <- (p + 1) until numPlanes }
              yield col("__bkt").bitwiseXOR(lit((1L << p) | (1L << q)))
          else Seq.empty))
    val keyed = bucketed.repartition(col("__bkt"))
    val a =
      if (probeFlips == 0)
        keyed.select(col("__id").as("a_id"), col("__v").as("__va"),
          col("__bkt").as("__pb"), col("__n").as("__na"))
      else
        bucketed
          .select(col("__id").as("a_id"), col("__v").as("__va"),
            explode(array(probeCols: _*)).as("__pb"),
            col("__n").as("__na"))
          .repartition(col("__pb"))
    val b = keyed.select(col("__id").as("b_id"), col("__v").as("__vb"),
      col("__bkt").as("__bkt2"), col("__n").as("__nb"))
    a.join(b, col("__pb") === col("__bkt2") && col("a_id") < col("b_id"))
      .withColumn("cosine", round(
        cosinePrenormed(dot(col("__va"), col("__vb")), col("__na"), col("__nb")), 4))
      .filter(col("cosine") >= threshold)
      .select("a_id", "b_id", "cosine")
  }

  /** Embedding near-dedup with the same survivor policy as
    * [[dropNearDuplicates]]: sign-bucket candidate pairs, exact-cosine
    * verify, transitive clusters, keep the minimum-id vector per
    * cluster. */
  def dropEmbeddingNearDuplicates(
      vecs: DataFrame, idCol: String, vecCol: String, dim: Int,
      numPlanes: Int = 8, threshold: Double = 0.8,
      probeFlips: Int = 0): DataFrame = {
    val pairs = embeddingNearDup(vecs, idCol, vecCol, dim, numPlanes,
      threshold, probeFlips)
    val losers = connectedComponents(pairs, "a_id", "b_id")
      .filter(col("component") =!= col("id"))
      .select(col("id").as(idCol))
    vecs.join(losers, Seq(idCol), "left_anti")
  }

  /** Semantic dedup over an embedding corpus — the SemDeDup recipe
    * (Abbas et al., "SemDeDup: Data-efficient learning at web-scale
    * through semantic deduplication", arXiv:2303.09540): k-means
    * partitions the embedding space, only WITHIN-cluster pairs are
    * compared (learned blocking — the step that makes web-scale
    * semantic dedup tractable), pairs with cosine ≥ `threshold` form
    * duplicate groups, and each group keeps the member with the LOWEST
    * cosine to its cluster centroid — the paper's policy: retain the
    * cluster's outliers, drop its redundant core. Ties → lowest id.
    * Unlike [[embeddingNearDup]]'s hyperplane LSH (recall decided by
    * plane count), blocking recall here is decided by the clustering:
    * a duplicate pair split across clusters is not compared — the
    * paper accepts this, and larger `k` trades block size against
    * split risk.
    *
    * Plan shape: centroid training + assignment are Ann's
    * zero-exchange projections (model ships in the plan); the pair
    * join is an equi-join on centroid_id over repartitioned bounded
    * blocks — quadratic WITHIN a cluster, so pick k ≈ n/(target
    * cluster size) exactly as with any blocked pairing; groups resolve
    * via the O(log² n) connected components; survivor selection is one
    * min-struct aggregate per group + an anti-join. */
  def semanticDedup(
      vecs: DataFrame, idCol: String, vecCol: String, k: Int,
      threshold: Double = 0.95, iters: Int = 3,
      seed: Long = 42L, saltBuckets: Int = 1): DataFrame = {
    require(k > 0, "semanticDedup: k > 0")
    semanticDedupWith(vecs,
      Ann.trainCentroids(
        vecs.select(col(idCol), col(vecCol)), idCol, vecCol, k, iters,
        seed),
      idCol, vecCol, threshold, saltBuckets)
  }

  /** [[semanticDedup]] against PRETRAINED centroids ((centroid_id,
    * vecCol) as [[Ann.trainCentroids]] emits) — the production shape:
    * the clustering is trained once (or shared with the IVF index,
    * which uses the same model) and every dedup pass pays only
    * assignment + within-cluster pairing. */
  def semanticDedupWith(
      vecs: DataFrame, centroids: DataFrame, idCol: String,
      vecCol: String, threshold: Double = 0.95,
      saltBuckets: Int = 1): DataFrame = {
    import graft.functions.VectorFunctions._
    require(threshold > 0 && threshold <= 1,
      "semanticDedup: threshold in (0, 1]")
    require(saltBuckets >= 1, "semanticDedup: saltBuckets >= 1")
    val assigned = Ann.assignBuckets(
      Parallelism.ensure(vecs.select(col(idCol), col(vecCol))),
      centroids.select(col("centroid_id").as(idCol), col(vecCol)),
      idCol, vecCol)
      .select(col(idCol).as("__id"), col(vecCol).as("__v"),
        norm(col(vecCol)).as("__n"), col("centroid_id"))
      .repartition(col("centroid_id"))
      .localCheckpoint(false)
    // saltBuckets > 1 splits the per-cluster quadratic work the way
    // FuzzyMatch.link splits hot blocks: the left side takes ONE
    // deterministic salt per row, the right side replicates across
    // every salt, so the pair set (and the result) is identical but a
    // cluster's scoring spreads over saltBuckets times more tasks —
    // the escape hatch for a skewed clustering where one cluster holds
    // most of the corpus and its pairs serialise through one task.
    // MEASURED at the registered q76 config (k=16, 100k 64-dim
    // vectors, 32 threads): salt=4 is only ~6% faster (7.65 -> 7.18 s
    // interleaved A/B, StressR13, results verified identical) — at
    // this scale training + components dominate, not the pair join —
    // so the default stays 1; reach for it when the cluster-size
    // histogram (Corpus.keyProfile on centroid_id) shows real skew.
    val a0 = assigned.select(col("centroid_id"), col("__id").as("a_id"),
      col("__v").as("__va"), col("__n").as("__na"))
    val a =
      if (saltBuckets <= 1) a0.withColumn("__salt", lit(0))
      else a0.withColumn("__salt",
        pmod(xxhash64(col("a_id")), lit(saltBuckets)).cast("int"))
    val b0 = assigned.select(col("centroid_id").as("__c2"),
      col("__id").as("b_id"), col("__v").as("__vb"), col("__n").as("__nb"))
    val b =
      if (saltBuckets <= 1) b0.withColumn("__salt2", lit(0))
      else b0.withColumn("__salt2",
        explode(sequence(lit(0), lit(saltBuckets - 1))))
    val edges = a
      .join(b, col("centroid_id") === col("__c2") &&
        col("__salt") === col("__salt2") && col("a_id") < col("b_id"))
      .filter(cosinePrenormed(dot(col("__va"), col("__vb")),
        col("__na"), col("__nb")) >= threshold)
      .select("a_id", "b_id")
    val cc = connectedComponents(edges, "a_id", "b_id")
    val cent = centroids.select(col("centroid_id"),
      col(vecCol).as("__cv"), norm(col(vecCol)).as("__cn"))
    val simToCent = assigned.join(broadcast(cent), "centroid_id")
      .select(col("__id").as("id"),
        cosinePrenormed(dot(col("__v"), col("__cv")),
          col("__n"), col("__cn")).as("__sc"))
    val keepers = cc.join(simToCent, "id")
      .groupBy(col("component"))
      .agg(min(struct(col("__sc"), col("id"))).as("__k"))
      .select(col("__k.id").as("id"))
    val losers = cc.join(keepers, Seq("id"), "left_anti")
      .select(col("id").as(idCol))
    vecs.join(losers, Seq(idCol), "left_anti")
  }

  /** Persisted sign-bucket state of an embedding corpus: ONE table of
    * (id, vec, shard, bucket, norm) — the same single-table/
    * continuous-ingest rationale as [[MinhashIndex]], for the embedding
    * modality. The bucket function is deterministic in (dim,
    * numPlanes), so buckets computed in different runs (or loaded from
    * parquet) stay join-compatible.
    *
    * `shard` = bucket mod [[Dedup.IndexShards]] (deterministic in the
    * bucket, so build/probe always agree). [[save]] partitions by it:
    * a probing batch touches only its own sign-buckets, so the scan of
    * the (vector-sized) corpus prunes to the batch's shards — the
    * embedding twin of MinhashIndex's candidate-shard pruning, and
    * even tighter because the join key itself determines the shard. */
  final case class EmbeddingIndex(entries: DataFrame) {
    /** Same empty-input guard as [[MinhashIndex.save]]. */
    def save(dir: String, mode: String = "error"): Unit = {
      val w = entries.write.mode(mode)
      if (entries.isEmpty) w.parquet(s"$dir/entries")
      else w.partitionBy("shard").parquet(s"$dir/entries")
    }

    def materialize(): EmbeddingIndex =
      EmbeddingIndex(entries.localCheckpoint(false))

    def union(delta: EmbeddingIndex): EmbeddingIndex =
      EmbeddingIndex(entries.unionByName(delta.entries))
  }

  object EmbeddingIndex {
    /** Pre-shard saves load with the shard backfilled from the bucket
      * (same values save() would have written). */
    def load(spark: org.apache.spark.sql.SparkSession, dir: String): EmbeddingIndex = {
      IndexMaintenance.healUnreadable(spark, dir, Seq("entries"))
      val e = spark.read.parquet(s"$dir/entries")
      EmbeddingIndex(IndexMaintenance.dropTombstoned(
        if (e.columns.contains("shard")) e
        else e.withColumn("shard", embeddingShardOf(col("bucket"))),
        spark, dir))
    }
  }

  private def embeddingShardOf(bucket: Column): Column =
    pmod(bucket, lit(IndexShards.toLong)).cast("int")

  /** Build the sign-bucket index for an embedding corpus. The same
    * (dim, numPlanes) MUST be used for every later probe. */
  def buildEmbeddingIndex(
      vecs: DataFrame, idCol: String, vecCol: String, dim: Int,
      numPlanes: Int = 8): EmbeddingIndex = {
    import graft.functions.VectorFunctions._
    EmbeddingIndex(Parallelism.ensure(
      vecs.select(col(idCol).as("id"), col(vecCol).as("vec")))
      .select(col("id"), col("vec"),
        hyperplaneBucket(col("vec"), dim, numPlanes).as("bucket"))
      .select(col("id"), col("vec"),
        embeddingShardOf(col("bucket")).as("shard"), col("bucket"),
        norm(col("vec")).as("nrm")))
  }

  /** Near-dup pairs between a new embedding batch and the indexed
    * corpus: (corpus a_id, batch b_id, cosine ≥ threshold). Batch side
    * bucketed once and broadcast (`broadcastBatch = false` for shuffle
    * joins); the corpus index never moves beyond the bucket equi-join.
    *
    * `probeFlips` > 0 is [[embeddingNearDup]]'s MULTI-PROBE on the
    * incremental path: the BATCH (the small side — exactly where
    * replication is cheap) also probes every index bucket within that
    * Hamming distance, recovering corpus near-dups that disagree on
    * up to `probeFlips` plane signs without touching the index or its
    * shard layout. Shard pruning widens to the probe set's shards;
    * each (corpus, batch) pair still meets on exactly one probe
    * bucket, so no dedup pass is needed. */
  def incrementalEmbeddingNearDup(
      batch: DataFrame, index: EmbeddingIndex, idCol: String,
      vecCol: String, dim: Int, numPlanes: Int = 8,
      threshold: Double = 0.8, broadcastBatch: Boolean = true,
      probeFlips: Int = 0): DataFrame = {
    import graft.functions.VectorFunctions._
    require(probeFlips >= 0 && probeFlips <= 2,
      "incrementalEmbeddingNearDup: probeFlips in 0..2")
    val b1 = batch
      .select(col(idCol).as("b_id"), col(vecCol).as("__vb"),
        hyperplaneBucket(col(vecCol), dim, numPlanes).as("bucket"),
        norm(col(vecCol)).as("__nb"))
    val probeCols: Seq[org.apache.spark.sql.Column] =
      col("bucket") +:
        ((if (probeFlips >= 1)
          (0 until numPlanes).map(p =>
            col("bucket").bitwiseXOR(lit(1L << p)))
        else Seq.empty) ++
          (if (probeFlips >= 2)
            for { p <- 0 until numPlanes; q <- (p + 1) until numPlanes }
              yield col("bucket").bitwiseXOR(lit((1L << p) | (1L << q)))
          else Seq.empty))
    val b0 =
      (if (probeFlips == 0) b1
       else b1.select(col("b_id"), col("__vb"), col("__nb"),
         explode(array(probeCols: _*)).as("bucket")))
        .localCheckpoint(false)
    // multi-probe REPLICATES the batch 1 + planes [+ C(planes,2)]
    // times before the broadcast — ~37x at the default 8 planes but
    // ~2000x at 62 planes with probeFlips=2, which can push an
    // innocent-looking batch past the broadcast threshold (r14
    // ADVICE). Above the replication bound the probe join falls back
    // to a shuffle join: same result, the exchange instead of an
    // oversized broadcast.
    val replication = probeCols.size
    val MaxBroadcastReplication = 128
    val doBroadcast = broadcastBatch &&
      (replication <= MaxBroadcastReplication || {
        log.warn(s"incrementalEmbeddingNearDup: probe replication " +
          s"$replication > $MaxBroadcastReplication " +
          s"(numPlanes=$numPlanes, probeFlips=$probeFlips) - " +
          "falling back to a shuffle join for the probe side")
        false
      })
    val b = if (doBroadcast) broadcast(b0) else b0
    // on a SAVED index, the batch's sign-buckets determine the shards
    // it can possibly match — a tiny driver-collected set that prunes
    // the (vector-sized) corpus scan to the batch's partitions; an
    // in-memory index has nothing to prune, skip the extra job
    val entries =
      if (!isFileBacked(index.entries)) index.entries
      else {
        val batchShards = b0
          .select(embeddingShardOf(col("bucket")).as("s")).distinct()
          .collect().map(_.getInt(0)).toSeq
        index.entries.filter(col("shard").isin(batchShards: _*))
      }
    entries
      .join(b, Seq("bucket"))
      .withColumn("cosine", round(
        cosinePrenormed(dot(col("vec"), col("__vb")), col("nrm"), col("__nb")), 4))
      .filter(col("cosine") >= threshold)
      .select(col("id").as("a_id"), col("b_id"), col("cosine"))
  }

  /** Incremental embedding near-dedup: drop batch vectors
    * near-duplicating the indexed corpus, dedup the remainder within
    * the batch, return (survivors, delta-index) — the embedding twin of
    * [[incrementalDedup]]. */
  def incrementalEmbeddingDedup(
      batch: DataFrame, index: EmbeddingIndex, idCol: String,
      vecCol: String, dim: Int, numPlanes: Int = 8,
      threshold: Double = 0.8, broadcastBatch: Boolean = true,
      probeFlips: Int = 0): (DataFrame, EmbeddingIndex) = {
    val hits = incrementalEmbeddingNearDup(batch, index, idCol, vecCol,
      dim, numPlanes, threshold, broadcastBatch, probeFlips)
      .select(col("b_id").as(idCol))
    val survivors = dropEmbeddingNearDuplicates(
      batch.join(hits, Seq(idCol), "left_anti"), idCol, vecCol, dim,
      numPlanes, threshold, probeFlips)
    (survivors,
      buildEmbeddingIndex(survivors, idCol, vecCol, dim, numPlanes))
  }

  // ------------------------------------------------------------------
  // SimHash
  // ------------------------------------------------------------------

  /** 64-bit SimHash over shingles: per bit, vote +1/-1 by whether the
    * shingle's xxhash64 has that bit set; the final bit is set iff the
    * vote sum is positive. Array-expression only (shift amounts are
    * columns, so the SQL shiftright/shiftleft are invoked via
    * call_function).
    */
  def simhash64(shingleArr: Column): Column = {
    val votes = aggregate(
      transform(shingleArr, x => xxhash64(x)), // hash each shingle once
      array_repeat(lit(0), 64),
      (acc, h) =>
        transform(acc, (v, i) =>
          v + when(call_function("shiftright", h, i).bitwiseAND(lit(1L)) === 1L,
            1).otherwise(-1))
    )
    aggregate(
      zip_with(votes, sequence(lit(0), lit(63)), (v, i) =>
        when(v > 0, call_function("shiftleft", lit(1L), i)).otherwise(lit(0L))),
      lit(0L),
      (acc, b) => acc.bitwiseOR(b)
    )
  }

  /** Band boundaries for a 64-bit SimHash at a given hamming radius.
    *
    * Pigeonhole recall guarantee: splitting 64 bits into `maxHamming + 1`
    * disjoint bands means any pair at hamming ≤ maxHamming has at least
    * one band with ZERO differing bits — so banding on `h + 1` bands
    * gives 100% candidate recall at radius h (the post-filter then
    * removes false positives exactly). Returns (shift, width) per band,
    * widths as even as possible (e.g. h=8 → 9 bands: 8×7 bits + 1×8).
    */
  private[graft] def simhashBands(maxHamming: Int): Seq[(Int, Int)] = {
    require(maxHamming >= 0 && maxHamming < 64,
      s"maxHamming must be in [0, 63], got $maxHamming")
    val bands = maxHamming + 1
    val base = 64 / bands
    val extra = 64 % bands // first `extra` bands get one more bit
    val widths = Seq.tabulate(bands)(i => if (i < extra) base + 1 else base)
    widths.scanLeft(0)(_ + _).zip(widths).map { case (shift, w) => (shift, w) }
  }

  /** SimHash near-dup candidates: block on `maxHamming + 1` disjoint
    * bit-bands of the 64-bit hash. Band count DERIVES from the radius so
    * the pigeonhole recall contract holds at any maxHamming (a fixed
    * 4x16 banding is only complete to hamming ≤ 3); SimhashRecallSpec
    * pins 100% candidate recall on planted pairs at exactly maxHamming.
    *
    * Selectivity is the price of radius: band width is 64/(h+1) bits,
    * so random-pair collision probability per band is 2^-width —
    * h = 3 gives 16-bit bands (2^16 buckets, the classic Manku
    * configuration, corpus-scale selective), while h = 8 gives 7-bit
    * bands (128 buckets per band, ~7% of ALL pairs become candidates).
    * Keep h ≤ 3 for whole-corpus dedup; radii beyond that are for
    * small or pre-blocked inputs where the exact hamming post-filter
    * can afford the candidate volume.
    */
  def simhashCandidates(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 2, maxHamming: Int = 3): DataFrame =
    simhashBandPairs(
      simhashFeatures(docs, idCol, textCol, shingleN), maxHamming)

  /** (\_\_id, __sim) SimHash frame shared by candidate generation, the
    * index build and the incremental probe. */
  private def simhashFeatures(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int): DataFrame = {
    val simCol =
      if (docs.sparkSession.catalog.functionExists("simhash64"))
        (sh: Column) => call_function("simhash64", sh)
      else simhash64 _
    Parallelism.ensure(
      docs.select(col(idCol).as("__id"), col(textCol).as("__t")))
      .select(col("__id"),
        simCol(shinglesCol(docs, col("__t"), shingleN)).as("__sim"))
  }

  /** SimHash near-dedup with the survivor policy of
    * [[dropNearDuplicates]]: banded candidates, exact-hamming verify,
    * transitive clusters, keep the minimum-id doc per cluster. */
  def dropSimhashDuplicates(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 2, maxHamming: Int = 3): DataFrame = {
    val pairs = simhashCandidates(docs, idCol, textCol, shingleN, maxHamming)
    val losers = connectedComponents(pairs, "a_id", "b_id")
      .filter(col("component") =!= col("id"))
      .select(col("id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Persisted SimHash state of a corpus: ONE table of (id, sim) — at
    * 8 bytes of state per document this is the LIGHTEST of the three
    * incremental indexes (MinHash stores shingles + band buckets,
    * embeddings store the vectors). Bands are pure bit math recomputed
    * at probe time from the radius, so one index serves ANY maxHamming
    * — unlike [[MinhashIndex]], whose band buckets bake in the banding
    * parameters. */
  final case class SimhashIndex(entries: DataFrame) {
    def save(dir: String, mode: String = "error"): Unit =
      entries.write.mode(mode).parquet(s"$dir/entries")

    def materialize(): SimhashIndex =
      SimhashIndex(entries.localCheckpoint(false))

    def union(delta: SimhashIndex): SimhashIndex =
      SimhashIndex(entries.unionByName(delta.entries))
  }

  object SimhashIndex {
    def load(spark: org.apache.spark.sql.SparkSession, dir: String): SimhashIndex =
      SimhashIndex(spark.read.parquet(s"$dir/entries"))
  }

  /** Build the SimHash index for a (deduped) corpus. The same
    * `shingleN` MUST be used for every later probe; `maxHamming` is a
    * probe-time choice. */
  def buildSimhashIndex(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 2): SimhashIndex =
    SimhashIndex(simhashFeatures(docs, idCol, textCol, shingleN)
      .select(col("__id").as("id"), col("__sim").as("sim")))

  /** Near-dup pairs between a new batch and the SimHash-indexed corpus:
    * (corpus a_id, batch b_id, hamming ≤ maxHamming). Batch is signed
    * once and broadcast against the index's banded view; the corpus
    * never shuffles beyond the band equi-join. */
  def incrementalSimhashNearDup(
      batch: DataFrame, index: SimhashIndex, idCol: String,
      textCol: String, shingleN: Int = 2, maxHamming: Int = 3,
      broadcastBatch: Boolean = true): DataFrame = {
    val feat = simhashFeatures(batch, idCol, textCol, shingleN)
      .localCheckpoint(false)
    val b0 = feat.select(col("__id").as("b_id"), col("__sim").as("__simb"),
      explode(simhashBandStructs(col("__sim"), maxHamming)).as("__bk"))
      .select(col("b_id"), col("__simb"),
        col("__bk.band"), col("__bk.bucket"))
    val b = if (broadcastBatch) broadcast(b0) else b0
    index.entries
      .select(col("id").as("a_id"), col("sim").as("__sima"),
        explode(simhashBandStructs(col("sim"), maxHamming)).as("__bk"))
      .select(col("a_id"), col("__sima"), col("__bk.band"), col("__bk.bucket"))
      .join(b, Seq("band", "bucket"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("__sima").bitwiseXOR(col("__simb"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Incremental SimHash near-dedup: drop batch docs within `maxHamming`
    * of the indexed corpus, dedup the remainder within the batch,
    * return (survivors, delta-index) — completing the incremental
    * family (exact/Bloom = q63/q67, MinHash = q64, embedding = q65). */
  def incrementalSimhashDedup(
      batch: DataFrame, index: SimhashIndex, idCol: String,
      textCol: String, shingleN: Int = 2, maxHamming: Int = 3,
      broadcastBatch: Boolean = true): (DataFrame, SimhashIndex) = {
    val hits = incrementalSimhashNearDup(batch, index, idCol, textCol,
      shingleN, maxHamming, broadcastBatch)
      .select(col("b_id").as(idCol))
    val survivors = dropSimhashDuplicates(
      batch.join(hits, Seq(idCol), "left_anti"), idCol, textCol,
      shingleN, maxHamming)
    (survivors, buildSimhashIndex(survivors, idCol, textCol, shingleN))
  }

  // ------------------------------------------------------------------
  // Near-dup clustering (connected components) + survivor selection
  // ------------------------------------------------------------------

  /** Connected components over an undirected pair list, via alternating
    * large-star / small-star rounds (Kiveris et al., "Connected
    * Components in MapReduce and Beyond", SoCC'14) — the standard
    * shared-nothing formulation: every round is two key-grouped
    * aggregations plus two equi-joins on node ids, converging in
    * O(log² n) rounds regardless of component diameter (plain min-label
    * propagation needs O(diameter) rounds — a 1M-long chain of near-dups
    * would take 1M rounds; this takes ~40). No driver-side graph state:
    * the edge list never leaves the cluster, so the operator holds at
    * corpus scale where the pair graph itself is distributed.
    *
    * Each round's edge list is `localCheckpoint`ed: iterative plans
    * otherwise stack lineage until planning itself dominates.
    *
    * Returns one row per node appearing in `pairs`: (id, component),
    * where component is the minimum node id in the node's component.
    * Singleton docs (no near-dup edge) don't appear — they are their
    * own component trivially.
    */
  def connectedComponents(
      pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 50): DataFrame =
    connectedComponentsWithRounds(pairs, aCol, bCol, maxIter)._1

  /** [[connectedComponents]] plus the number of rounds it took — the
    * convergence telemetry an operator at real scale alerts on (rounds
    * creeping toward maxIter means the pair graph's shape changed, e.g.
    * a threshold regression chaining the whole corpus together). Also
    * logged at info. */
  /** Edge-count bound under which components resolve by a DRIVER
    * union-find instead of the distributed loop. The deduped edge list
    * is counted anyway (the loop's own convergence bookkeeping), so
    * the switch is free; at 500k edges the collect is ~8 MB — the same
    * bounded-collect discipline as PCA's 64k sample and BPE's 30k
    * vocab. Why it exists: each distributed round is ~5 shuffles of
    * fixed scheduling cost, so a SMALL pair graph (the common case —
    * near-dup pairs are a sliver of any curated corpus) pays seconds
    * of round overhead for milliseconds of actual work (measured:
    * 874 edges took ~5 s distributed, <0.1 s on the driver). Above
    * the bound the shared-nothing large-star/small-star loop runs
    * exactly as before — the 100 TB path is untouched. Sized by the
    * shared [[DriverBudget]] model (~512 B/edge transient incl. the
    * resolve-time map state — r15 unification). */
  val DriverCcMaxEdges: Long = DriverBudget.CcEdges

  def connectedComponentsWithRounds(
      pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int = 50): (DataFrame, Int) =
    connectedComponentsWithRounds(pairs, aCol, bCol, maxIter,
      DriverCcMaxEdges)

  /** [[connectedComponentsWithRounds]] with an explicit driver-path
    * bound (`driverMaxEdges = 0` forces the distributed loop — specs
    * pin both paths equal). */
  def connectedComponentsWithRounds(
      pairs: DataFrame, aCol: String, bCol: String,
      maxIter: Int, driverMaxEdges: Long): (DataFrame, Int) = {
    // canonical directed form: (u, v) with u > v ("child" -> smaller)
    var edges = pairs
      .select(greatest(col(aCol), col(bCol)).as("u"),
        least(col(aCol), col(bCol)).as("v"))
      .filter(col("u") =!= col("v"))
      .distinct()
      .localCheckpoint(false)
    // each round's count CARRIES to the next as its edges.count():
    // recounting the checkpointed previous round was one whole job per
    // round of pure waste (measured: the loop's fixed per-round job
    // cost dominates small graphs end to end)
    var edgeCount = edges.count()
    // driver path only for integral ids (the union-find runs on
    // longs); string/decimal ids take the distributed loop, which is
    // type-agnostic
    val integralIds = edges.schema("u").dataType match {
      case org.apache.spark.sql.types.LongType |
           org.apache.spark.sql.types.IntegerType |
           org.apache.spark.sql.types.ShortType |
           org.apache.spark.sql.types.ByteType => true
      case _ => false
    }
    // rounds = 0 is the DRIVER-PATH SENTINEL: the union-find resolves
    // in one pass, so no distributed round ran — callers reading the
    // rounds telemetry (convergence alerting) should treat 0 as "took
    // the driver path", not "converged instantly".
    if (integralIds && edgeCount > 0L && edgeCount <= driverMaxEdges) {
      log.info(s"connectedComponents: $edgeCount edges <= " +
        s"$driverMaxEdges — resolved by driver union-find (rounds=0)")
      return (driverComponents(edges), 0)
    }
    var iter = 0
    var converged = edgeCount == 0L
    while (!converged && iter < maxIter) {
      // LARGE-STAR: for each node u, m = min(N(u) ∪ {u}); connect every
      // strictly-larger neighbor to m. Operates on the symmetric view.
      val sym = edges.select(col("u"), col("v"))
        .union(edges.select(col("v").as("u"), col("u").as("v")))
      val lsMins = sym.groupBy("u")
        .agg(min(col("v")).as("__mn"))
        .select(col("u"), least(col("__mn"), col("u")).as("m"))
      val ls = sym.join(lsMins, "u")
        .filter(col("v") > col("u"))
        .select(col("v").as("u"), col("m").as("v")) // v > u >= m, so u > v holds
        .distinct()
      // SMALL-STAR: edges already point larger -> smaller; for each u,
      // m = min of its smaller neighbors; connect u and every smaller
      // neighbor to m.
      val ssMins = ls.groupBy("u").agg(min(col("v")).as("m"))
      val next = ls.join(ssMins, "u")
        .select(col("v").as("node"), col("m"))
        .union(ssMins.select(col("u").as("node"), col("m")))
        .filter(col("node") =!= col("m"))
        .select(col("node").as("u"), col("m").as("v"))
        .distinct()
        .localCheckpoint(false)
      // At the fixpoint both passes leave the star forest unchanged.
      // The (shuffling) set-compare only runs once counts agree —
      // counts differ on most non-final rounds, so the common case is
      // ONE count over the new checkpointed edge list (the previous
      // round's count carried over).
      val nextCount = next.count()
      converged = nextCount == edgeCount && next.except(edges).isEmpty
      edges = next
      edgeCount = nextCount
      iter += 1
    }
    if (!converged && edgeCount > 0L)
      throw new IllegalStateException(
        s"connectedComponents did not converge in $maxIter rounds")
    log.info(s"connectedComponents converged in $iter rounds " +
      s"(maxIter=$maxIter)")
    // star forest: every non-root points straight at its component min
    val cc = edges.select(col("u").as("id"), col("v").as("component"))
      .union(edges.select(col("v").as("id"), col("v").as("component")))
      .distinct()
    (cc, iter)
  }

  /** Driver union-find over a bounded, already-deduped (u, v) edge
    * list — exact min-label components, identical contract to the
    * distributed loop's output: one row per node appearing in an edge,
    * (id, component = min node id of the component), in the INPUT's
    * id type. Path-halving find + union-by-min keeps the pass
    * effectively linear. */
  private def driverComponents(edges: DataFrame): DataFrame = {
    val spark = edges.sparkSession
    val idType = edges.schema("u").dataType
    val pairs = edges.collect().map { r =>
      (r.getAs[Number](0).longValue(), r.getAs[Number](1).longValue())
    }
    // min-label union-find: parent(x) follows to the component's
    // current minimum; union keeps the smaller root as parent
    val parent = scala.collection.mutable.HashMap.empty[Long, Long]
    def find(x: Long): Long = {
      var r = x
      while (parent.getOrElse(r, r) != r) r = parent(r)
      var c = x
      while (parent.getOrElse(c, c) != c) {
        val nxt = parent(c); parent(c) = r; c = nxt
      }
      r
    }
    pairs.foreach { case (u, v) =>
      parent.getOrElseUpdate(u, u)
      parent.getOrElseUpdate(v, v)
      val (ru, rv) = (find(u), find(v))
      if (ru != rv) {
        if (ru < rv) parent(rv) = ru else parent(ru) = rv
      }
    }
    import spark.implicits._
    val rows = parent.keys.toSeq.sorted.map(id => (id, find(id)))
    rows.toDF("id", "component")
      .select(col("id").cast(idType).as("id"),
        col("component").cast(idType).as("component"))
  }

  /** End-to-end corpus near-dedup: MinHash-LSH candidate pairs, exact
    * Jaccard verify, connected-component clustering, then keep the
    * minimum-id document of every near-dup cluster (docs with no
    * near-dup survive untouched). This is the shape a training-data
    * pipeline actually runs — pairs alone aren't a dedup until a
    * survivor policy collapses each cluster, and clustering must be
    * transitive (A~B, B~C puts A,C in one cluster even when A~C scores
    * below threshold). The loser set is tiny relative to the corpus, so
    * the final filter is a broadcast-able left-anti join keyed on id.
    */
  def dropNearDuplicates(
      docs: DataFrame, idCol: String, textCol: String,
      shingleN: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.5): DataFrame = {
    val pairs = minhashNearDup(docs, idCol, textCol, shingleN, numHashes,
      bands, threshold)
    val cc = connectedComponents(pairs, "a_id", "b_id")
    val losers = cc.filter(col("component") =!= col("id"))
      .select(col("id").as(idCol))
    docs.join(losers, Seq(idCol), "left_anti")
  }

  /** Banding + bucket self-join over a precomputed (__id, __sim) frame —
    * split out so recall tests can plant exact signatures. Emits
    * (a_id, b_id, hamming) with hamming ≤ maxHamming. */
  /** array<struct<band,bucket>> for a sim column at a given radius —
    * shared by whole-corpus banding and the incremental probe (both
    * sides MUST band identically or buckets never match). */
  private[graft] def simhashBandStructs(sim: Column, maxHamming: Int): Column =
    array(simhashBands(maxHamming).zipWithIndex.map {
      case ((shift, width), i) =>
        val mask = if (width == 64) -1L else (1L << width) - 1L
        struct(lit(i).as("band"),
          call_function("shiftright", sim, lit(shift))
            .bitwiseAND(lit(mask)).as("bucket"))
    }: _*)

  private[graft] def simhashBandPairs(
      sh: DataFrame, maxHamming: Int): DataFrame = {
    val banded = sh.select(
      col("__id"), col("__sim"),
      explode(simhashBandStructs(col("__sim"), maxHamming)).as("__bk"))
      .select(col("__id"), col("__sim"), col("__bk.band"), col("__bk.bucket"))
      .repartition(col("band"), col("bucket"))
    val l = banded.select(col("__id").as("a_id"), col("__sim").as("sim_a"),
      col("band"), col("bucket"))
    val r = banded.select(col("__id").as("b_id"), col("__sim").as("sim_b"),
      col("band").as("band2"), col("bucket").as("bucket2"))
    l.join(r, col("band") === col("band2") && col("bucket") === col("bucket2") &&
        col("a_id") < col("b_id"))
      .select(col("a_id"), col("b_id"),
        bit_count(col("sim_a").bitwiseXOR(col("sim_b"))).as("hamming"))
      .distinct()
      .filter(col("hamming") <= maxHamming)
  }

  /** Cross-document duplicated-SPAN removal — the substring-level dedup
    * between [[dropRepeatedLines]] (needs shared line breaks) and whole-
    * document dedup (needs full equality): any word `gramN`-gram that
    * appears in at least `minDocs` DISTINCT documents marks its token
    * span [pos, pos+gramN-1] as duplicated; overlapping and adjacent
    * spans merge into maximal islands; each document comes back with
    * the covered tokens removed plus the island/token counts. This is
    * the token-level form of the suffix-array substring dedup of Lee et
    * al. 2022 ("Deduplicating Training Data Makes Language Models
    * Better"): a shared passage of length n is covered wall-to-wall by
    * its n-gramN+1 duplicated grams, so contiguous shared prose is
    * removed exactly as the suffix-array method would, at gramN-1-token
    * edge resolution — and the whole computation is three keyed
    * shuffles instead of a distributed suffix array.
    *
    * Scale shape: grams shuffle as (xxhash64, id, pos) — 8-byte gram
    * payload like dropRepeatedLines, same collision bound (~grams²/2⁶⁴,
    * a colliding innocent span is dropped; negligible below ~10⁹
    * distinct grams); the dup-gram set is found by a map-side-combined
    * distinct-doc count and semi-joins back on the hash; span merge is
    * two window passes over ONE (doc, pos) sort; reconstruction joins
    * the bounded per-doc span list back to the docs relation — document
    * text itself never shuffles. Islands per doc are bounded by
    * len/gramN, so the in-row position filter is cheap.
    */
  def dropDuplicateSpans(
      docs: DataFrame, idCol: String, textCol: String,
      gramN: Int = 8, minDocs: Int = 2): DataFrame = {
    require(gramN >= 2, "dropDuplicateSpans: gramN >= 2")
    require(minDocs >= 2, "dropDuplicateSpans: minDocs >= 2")
    val others = docs.columns.filterNot(c => c == idCol || c == textCol)
    val toks = split(col(textCol), " ")
    // (doc, pos, gramHash) for every gramN-gram; docs shorter than
    // gramN emit nothing (sequence() descends when stop < start, so
    // the short side must be guarded, not clamped).
    val grams = Parallelism.ensure(
      docs.select(col(idCol).as("__id"), toks.as("__w")))
      .select(col("__id"),
        posexplode(
          when(size(col("__w")) >= gramN,
            transform(sequence(lit(1), size(col("__w")) - (gramN - 1)),
              i => xxhash64(concat_ws(" ", slice(col("__w"), i, lit(gramN))))))
          .otherwise(array().cast("array<bigint>")))
          .as(Seq("__off", "__h")))
      .select(col("__id"), (col("__off") + 1).as("__pos"), col("__h"))
    val dupGrams = grams
      .groupBy(col("__h"))
      .agg(countDistinct(col("__id")).as("__nd"))
      .filter(col("__nd") >= minDocs)
      .select(col("__h"))
    // Duplicated occurrences → maximal covered islands per doc. Both
    // window passes share one (partition, order) spec = one sort.
    val w = Window.partitionBy(col("__id")).orderBy(col("__pos"))
    val prevMaxEnd = max(col("__pos") + (gramN - 1))
      .over(w.rowsBetween(Window.unboundedPreceding, -1))
    val occ = grams
      .join(dupGrams, Seq("__h"), "left_semi")
      .withColumn("__start",
        when(prevMaxEnd.isNull || col("__pos") > prevMaxEnd + 1, 1L)
          .otherwise(0L))
      .withColumn("__island",
        sum(col("__start")).over(w.rowsBetween(Window.unboundedPreceding, 0)))
    val spans = occ
      .groupBy(col("__id"), col("__island"))
      .agg(min(col("__pos")).as("__s"),
        (max(col("__pos")) + (gramN - 1)).as("__e"))
      .groupBy(col("__id"))
      .agg(
        sort_array(collect_list(struct(col("__s"), col("__e")))).as("__spans"),
        count(lit(1)).as("__nspans"),
        sum(col("__e") - col("__s") + 1).as("__ntok"))
    val covered = (p: Column, sp: Column) =>
      exists(sp, s => p >= s.getField("__s") && p <= s.getField("__e"))
    docs.select(col(idCol).as("__id") +: (col(textCol) +: others.map(col)): _*)
      .join(spans, Seq("__id"), "left")
      .select(
        col("__id").as(idCol) +:
          (array_join(
            when(col("__spans").isNull, toks)
              .otherwise(filter(toks,
                (t: Column, i0: Column) => !covered(i0 + 1, col("__spans")))),
            " ").as(textCol) +:
            coalesce(col("__ntok"), lit(0L)).as("dup_tokens") +:
            coalesce(col("__nspans"), lit(0L)).as("dup_spans") +:
            others.map(col)): _*)
  }
}
