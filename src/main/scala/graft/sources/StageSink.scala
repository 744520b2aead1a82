package graft.sources

import java.time.{Instant, ZoneOffset}
import java.time.format.DateTimeFormatter

import org.apache.spark.sql.DataFrame

/** Timestamped, stage-foldered export sink (ref: votervoice/__main__
  * .py:15-33 — EXTRACT_FILES/TRANSFORMED_FILES/MATCHED_FILES/
  * QUERY_FILES folders with `<name>_<timestamp>.csv` exports).
  *
  * Spark-first: the export is a distributed write (parquet by default —
  * columnar, splittable; CSV kept for reference-compatible handoff).
  * The timestamp is injectable so tests and replays are deterministic.
  */
object StageSink {

  val Stages = Seq("EXTRACT", "TRANSFORMED", "MATCHED", "QUERY")

  private val fmt = DateTimeFormatter.ofPattern("yyyy-MM-dd-HH-mm-ss")
    .withZone(ZoneOffset.UTC)

  def stamp(at: Instant): String = fmt.format(at)

  /** Writes `df` to `<baseDir>/<stage>/<name>_<timestamp>` and returns
    * the path. `coalesceTo` bounds output files for small exports
    * (None = keep the natural partitioning — the right call at scale).
    */
  def save(
      df: DataFrame, baseDir: String, stage: String, name: String,
      at: Instant, format: String = "parquet",
      coalesceTo: Option[Int] = None): String = {
    require(Stages.contains(stage), s"unknown stage $stage (want $Stages)")
    val path = s"$baseDir/$stage/${name}_${stamp(at)}"
    val out = coalesceTo.map(df.coalesce).getOrElse(df)
    val writer = out.write.mode("error")
    (format match {
      case "csv" => writer.option("header", "true")
      case _ => writer
    }).format(format).save(path)
    path
  }
}
