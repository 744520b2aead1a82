package graft.sources

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{StringType, StructField, StructType}

/** Schema'd text-format readers and a scale-aware parquet writer — the
  * ingest/egress boundary of the pipeline (ref: the CSV snapshots the
  * reference's stages exchange, votervoice/__main__.py:15-33; pandas
  * `read_csv` infers dtypes per file, which a distributed engine must
  * not do).
  *
  * Scale posture:
  * - Schemas are EXPLICIT, never inferred: `inferSchema` is a full
  *   extra pass over the data before the real read — at 100 TB that
  *   doubles the scan, and per-file inference can disagree across
  *   files and silently widen types.
  * - FAILFAST by default: a malformed row aborts the job instead of
  *   becoming a silent null. The quarantine variant captures bad rows
  *   in a side column so load jobs can divert them without losing the
  *   batch.
  * - Writes partition by the columns queries filter on (partition
  *   pruning at read time) and bound file sizes with
  *   `maxRecordsPerFile` (a 100 GB single file defeats parallel
  *   scheduling; a million 1 MB files defeat the scan planner).
  */
object Records {

  /** CSV with an explicit schema. FAILFAST: malformed input aborts. */
  def csv(
      spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ","): DataFrame =
    spark.read
      .schema(schema)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "FAILFAST")
      .csv(path)

  /** CSV with bad-row quarantine: returns (good, bad) DataFrames. Bad
    * rows carry the raw line in `raw`; good rows match `schema`
    * exactly.
    *
    * The parsed frame is persisted before the corrupt-column split:
    * Spark disallows filtering a raw scan on the corrupt column alone
    * (SPARK-21610 — the pushed-down filter would bypass the parse that
    * populates it), so both branches must read a materialized parse.
    * `storageLevel` defaults to memory-with-disk-spill; for loads that
    * dwarf cluster memory, pass `StorageLevel.DISK_ONLY` — or better,
    * land the parsed+corrupt frame to parquet once and split from
    * there (one extra sequential write instead of a giant cache). */
  def csvQuarantine(
      spark: SparkSession, path: String, schema: StructType,
      header: Boolean = true, delimiter: String = ",",
      storageLevel: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): (DataFrame, DataFrame) = {
    val withCorrupt = StructType(schema.fields :+
      StructField("__corrupt", StringType, nullable = true))
    val read = spark.read
      .schema(withCorrupt)
      .option("header", header.toString)
      .option("delimiter", delimiter)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "__corrupt")
      .csv(path)
      .persist(storageLevel)
    val good = read.filter(col("__corrupt").isNull)
      .select(schema.fieldNames.map(col).toSeq: _*)
    val bad = read.filter(col("__corrupt").isNotNull)
      .select(col("__corrupt").as("raw"))
    (good, bad)
  }

  /** JSON-lines with an explicit schema, FAILFAST. One JSON object per
    * line — the only JSON layout that splits across executors
    * (multiline JSON documents are single-split). */
  def jsonl(
      spark: SparkSession, path: String, schema: StructType): DataFrame =
    spark.read
      .schema(schema)
      .option("mode", "FAILFAST")
      .json(path)

  /** JSON-lines with bad-row quarantine: returns (good, bad) exactly
    * like [[csvQuarantine]] — PERMISSIVE parse into a corrupt side
    * column, persisted once before the split (same SPARK-21610
    * constraint: neither branch may filter a raw scan on the corrupt
    * column alone). Bad rows carry the raw line in `raw`. */
  def jsonlQuarantine(
      spark: SparkSession, path: String, schema: StructType,
      storageLevel: org.apache.spark.storage.StorageLevel =
        org.apache.spark.storage.StorageLevel.MEMORY_AND_DISK): (DataFrame, DataFrame) = {
    val withCorrupt = StructType(schema.fields :+
      StructField("__corrupt", StringType, nullable = true))
    val read = spark.read
      .schema(withCorrupt)
      .option("mode", "PERMISSIVE")
      .option("columnNameOfCorruptRecord", "__corrupt")
      .json(path)
      .persist(storageLevel)
    val good = read.filter(col("__corrupt").isNull)
      .select(schema.fieldNames.map(col).toSeq: _*)
    val bad = read.filter(col("__corrupt").isNotNull)
      .select(col("__corrupt").as("raw"))
    (good, bad)
  }

  /** Parquet write partitioned for downstream pruning: directory
    * partitions on `partitionCols` (equality/range filters on them
    * never touch other partitions' files), rows clustered within
    * partitions by `sortCols` (tighter min/max row-group stats →
    * better row-group skipping), file sizes bounded by
    * `maxRecordsPerFile`. */
  def writePartitioned(
      df: DataFrame, path: String,
      partitionCols: Seq[String],
      sortCols: Seq[String] = Nil,
      maxRecordsPerFile: Long = 5000000L): Unit = {
    val clustered =
      if (sortCols.nonEmpty)
        df.sortWithinPartitions((partitionCols ++ sortCols).map(col): _*)
      else df
    clustered.write
      .mode("error")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
  }

  /** Z-ordered parquet write: rows are laid out along a Morton curve
    * over the quantile buckets of `zCols` (numeric), so every file
    * covers a small hyper-rectangle of the combined value space and
    * parquet min/max stats skip files for predicates on ANY curve
    * column — where a linear sort only serves its leading column.
    *
    * Cost: one approx-quantile sketch pass per column (constant driver
    * memory) + the range shuffle + the write — the standard one-time
    * layout job, paid once to make every subsequent selective scan
    * cheaper. `bits` controls grid resolution (6 → 64 buckets/column);
    * file-level skipping saturates well below per-row precision. */
  def writeZOrdered(
      df: DataFrame, path: String, zCols: Seq[String],
      bits: Int = 6, numFiles: Int = 64,
      maxRecordsPerFile: Long = 5000000L): Unit = {
    import graft.functions.LayoutFunctions._
    require(zCols.size >= 2,
      "writeZOrdered: needs >= 2 columns (use writePartitioned sortCols for 1)")
    val buckets = zCols.map { c =>
      quantileBucket(col(c), quantileBounds(df, c, bits))
    }
    df.withColumn("__z", zValue(buckets, bits))
      .repartitionByRange(numFiles, col("__z"))
      .sortWithinPartitions("__z")
      .drop("__z")
      .write
      .mode("error")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
  }

  /** Parquet write with BLOOM FILTERS on the named columns — the
    * file-skipping companion to [[writeZOrdered]] for point lookups on
    * HIGH-CARDINALITY keys (ids, content hashes), where min/max stats
    * are useless unless the data is sorted by that exact key: an
    * `id = x` probe skips every file whose bloom says "definitely not
    * here" at ~fpp false-positive cost, regardless of layout. Pair
    * with clustering on a DIFFERENT column set — blooms answer the
    * keys the sort order can't. `ndv` sizes each filter (bits scale
    * with distinct values per file; the writer caps at
    * `maxBloomBytes`). */
  def writeWithBloom(
      df: DataFrame, path: String, bloomCols: Seq[String],
      ndv: Long = 1000000L, maxBloomBytes: Long = 8L << 20,
      maxRecordsPerFile: Long = 5000000L): Unit = {
    require(bloomCols.nonEmpty, "writeWithBloom: no bloom columns")
    val w = df.write
      .mode("error")
      .option("parquet.bloom.filter.max.bytes", maxBloomBytes)
      .option("maxRecordsPerFile", maxRecordsPerFile)
    bloomCols.foldLeft(w) { (acc, c) =>
      acc.option(s"parquet.bloom.filter.enabled#$c", "true")
        .option(s"parquet.bloom.filter.expected.ndv#$c", ndv)
    }.parquet(path)
  }

  /** Idempotent partition reload: replaces ONLY the directory
    * partitions present in `df`, leaving every other partition's files
    * untouched (dynamic partition overwrite). The re-run-safe shape for
    * incremental loads — a failed daily batch reruns without touching
    * history and without a full-table rewrite. */
  def upsertPartitions(
      df: DataFrame, path: String,
      partitionCols: Seq[String],
      maxRecordsPerFile: Long = 5000000L): Unit =
    df.write
      .mode("overwrite")
      .option("partitionOverwriteMode", "dynamic")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .partitionBy(partitionCols: _*)
      .parquet(path)
}
