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
    * micro-batch recomputes the same path, so `mode("error")` collides
    * with the earlier write and the replay fails loudly instead of
    * silently double-exporting (a wall-clock stamp in the name would
    * fork a fresh folder on every retry and defeat that check). The
    * zero-padded id keeps `loadLatest`'s lexicographic ordering equal
    * to batch order. */
  def saveBatch(
      df: DataFrame, baseDir: String, stage: String, name: String,
      batchId: Long, format: String = "parquet",
      coalesceTo: Option[Int] = None): String =
    writeTo(df, baseDir, stage, f"${name}_b$batchId%010d", format,
      coalesceTo)

  private def writeTo(
      df: DataFrame, baseDir: String, stage: String, folder: String,
      format: String, coalesceTo: Option[Int]): String = {
    require(Stages.contains(stage), s"unknown stage $stage (want $Stages)")
    val path = s"$baseDir/$stage/$folder"
    val out = coalesceTo.map(df.coalesce).getOrElse(df)
    val writer = out.write.mode("error")
    (format match {
      case "csv" => writer.option("header", "true")
      case _ => writer
    }).format(format).save(path)
    path
  }

  /** Loads the newest export matching `<name>_*` under the stage folder
    * (timestamps sort lexicographically in the reference's format). */
  def loadLatest(
      spark: SparkSession, baseDir: String, stage: String, name: String,
      format: String = "parquet"): DataFrame = {
    val dir = new java.io.File(s"$baseDir/$stage")
    val candidates = Option(dir.listFiles()).getOrElse(Array.empty)
      .filter(_.getName.startsWith(s"${name}_"))
      .sortBy(_.getName)
    require(candidates.nonEmpty, s"no $name export under $dir")
    val reader = format match {
      case "csv" => spark.read.option("header", "true")
      case _ => spark.read
    }
    reader.format(format).load(candidates.last.getAbsolutePath)
  }
}
