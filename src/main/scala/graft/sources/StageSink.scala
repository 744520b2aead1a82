package graft.sources

import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Timestamped, stage-foldered export sink + source (ref: votervoice/
  * __main__.py:12-30 save_records — EXTRACT_FILES/TRANSFORMED_FILES/
  * MATCHED_FILES/QUERY_FILES folders, exports named
  * `<name>_<session->?<timestamp>` with timestamp
  * %Y-%m-%d-%H%M%S-%f).
  *
  * Spark-first: the export is a distributed write (parquet by default —
  * columnar, splittable; CSV kept for reference-compatible handoff).
  * The timestamp is injectable so tests and replays are deterministic.
  * `loadLatest` picks the newest export for a (stage, name) the way
  * the reference's -t/-m flows re-read a prior stage's file.
  */
object StageSink {

  val Stages = Seq("EXTRACT_FILES", "TRANSFORMED_FILES", "MATCHED_FILES",
    "QUERY_FILES")

  // reference: datetime.strftime(..., "%Y-%m-%d-%H%M%S-%f")
  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd-HHmmss-SSSSSS")
    .withZone(ZoneOffset.UTC)

  def stamp(at: Instant): String = fmt.format(at)

  /** Writes `df` to
    * `<baseDir>/<stage>/<name>_[<info->]<timestamp>` and returns the
    * path. `coalesceTo` bounds output files for small exports (None =
    * keep the natural partitioning — the right call at scale).
    */
  def save(
      df: DataFrame, baseDir: String, stage: String, name: String,
      at: Instant, additionalInfo: Seq[String] = Nil,
      format: String = "parquet",
      coalesceTo: Option[Int] = None): String = {
    val infix =
      if (additionalInfo.isEmpty) "" else additionalInfo.mkString("-") + "-"
    writeTo(df, baseDir, stage, s"${name}_$infix${stamp(at)}", format,
      coalesceTo)
  }

  /** Batch-id-keyed snapshot: `<baseDir>/<stage>/<name>_b<batchId>`.
    * The folder name is DETERMINISTIC for a given batch id — a retried
    * micro-batch (foreachBatch is at-least-once: write done, checkpoint
    * commit lost) recomputes the same path, and `mode("overwrite")`
    * makes the replay idempotent: the retry rewrites the same folder
    * with the same deterministic bytes. (A wall-clock stamp in the name
    * would fork a fresh folder on every retry = silent duplicates;
    * `mode("error")` would throw on every restart once a partial folder
    * exists = a wedged stream.) The zero-padded id keeps batch order
    * equal to name order. */
  def saveBatch(
      df: DataFrame, baseDir: String, stage: String, name: String,
      batchId: Long, format: String = "parquet",
      coalesceTo: Option[Int] = None): String =
    writeTo(df, baseDir, stage, f"${name}_b$batchId%010d", format,
      coalesceTo, mode = "overwrite")

  private def writeTo(
      df: DataFrame, baseDir: String, stage: String, folder: String,
      format: String, coalesceTo: Option[Int],
      mode: String = "error"): String = {
    require(Stages.contains(stage), s"unknown stage $stage (want $Stages)")
    val path = s"$baseDir/$stage/$folder"
    val out = coalesceTo.map(df.coalesce).getOrElse(df)
    val writer = out.write.mode(mode)
    (format match {
      case "csv" => writer.option("header", "true")
      case _ => writer
    }).format(format).save(path)
    path
  }

  // `name_b0000000042` -> Some(42); anything else -> None. Accepts any
  // run of >= 10 digits after the 'b': %010d pads to 10 but emits MORE
  // digits past batch 10^10, and classifying those as "timestamped"
  // would trip the mixed-kind guard below forever. Numeric comparison
  // handles the variable widths.
  private def batchIdOf(name: String, folder: String): Option[Long] = {
    val suffix = folder.stripPrefix(s"${name}_")
    if (suffix.length >= 11 && suffix.head == 'b' &&
      suffix.tail.forall(_.isDigit)) Some(suffix.tail.toLong) else None
  }

  /** Loads the newest export matching `<name>_*` under the stage
    * folder. Batch-keyed exports (`name_b<10-digit id>`) compare by
    * NUMERIC batch id; timestamped exports compare lexicographically
    * (the reference's `%Y-%m-%d-%H%M%S-%f` format sorts correctly as a
    * string). The two kinds carry incomparable keys (a batch counter vs
    * a wall clock), so a (stage, name) must hold only one kind — mixing
    * them fails loudly here rather than silently returning whichever
    * sorts last.
    *
    * Concurrency caveat: a batch-keyed replay rewrites its folder with
    * `mode("overwrite")`, which deletes before rewriting — a reader
    * that picked that folder as newest during the retry window can fail
    * or see partial data. Acceptable for the stage-handoff cadence
    * (reader and writer are phases of one pipeline, not concurrent
    * services); for stronger guarantees write to a temp folder and
    * atomically rename over the target. */
  def loadLatest(
      spark: SparkSession, baseDir: String, stage: String, name: String,
      format: String = "parquet"): DataFrame = {
    val dir = new java.io.File(s"$baseDir/$stage")
    val candidates = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith(s"${name}_"))
    require(candidates.nonEmpty, s"no $name export under $dir")
    val (batchKeyed, stamped) =
      candidates.partition(f => batchIdOf(name, f.getName).isDefined)
    require(batchKeyed.isEmpty || stamped.isEmpty,
      s"(stage=$stage, name=$name) mixes batch-keyed and timestamped " +
        s"exports — their orderings are incomparable; use distinct names. " +
        s"Found: ${candidates.map(_.getName).sorted.toSeq}")
    val latest =
      if (batchKeyed.nonEmpty)
        batchKeyed.maxBy(f => batchIdOf(name, f.getName).get)
      else stamped.maxBy(_.getName)
    val reader = format match {
      case "csv" => spark.read.option("header", "true")
      case _ => spark.read
    }
    reader.format(format).load(latest.getAbsolutePath)
  }
}
