package graft.sources

import java.time.Instant

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Stage orchestration: the reference's driver loop as one callable
  * pipeline (ref: votervoice/__main__.py:33-214 — the no-flag flow runs
  * EXTRACT → TRANSFORM → MATCH saving each stage; `-e`/`-t`/`-m` run a
  * single stage, the latter two re-reading a prior stage's export).
  *
  * Stages are plain DataFrame functions, so any operator composition
  * plugs in (HtmlTable extraction, TextFunctions transforms,
  * FuzzyMatch linkage — PipelineSpec wires exactly that). The match
  * stage returns TWO frames, saved to MATCHED_FILES and QUERY_FILES
  * (the reference's records_matched / records_query pair).
  *
  * Scale posture: after each stage is exported, the NEXT stage reads
  * the files back instead of chaining the in-memory plan. That makes
  * the stage boundary a real checkpoint — downstream failures resume
  * from the durable artifact rather than recomputing the whole lineage
  * (exactly the reference's file handoff, and the reason its `-t`/`-m`
  * flows exist), and no stage's plan grows past its own operators.
  */
object Pipeline {

  /** Export names per stage (reference defaults from __main__.py). */
  final case class Names(
      extract: String = "Ratings-Extract",
      transformed: String = "Ratings-Transformed",
      matched: String = "Ratings-Matched",
      query: String = "VSDB-Candidates")

  /** Paths written by a run; stages not executed are None. */
  final case class Exports(
      extract: Option[String] = None,
      transformed: Option[String] = None,
      matched: Option[String] = None,
      query: Option[String] = None)

  /** Full EXTRACT → TRANSFORM → MATCH run with per-stage exports
    * (the reference's no-flag flow, __main__.py:86-134).
    *
    * @param extract   produces the raw records (e.g. HtmlTable over
    *                  fetched pages)
    * @param transform transforms READ-BACK extract records
    * @param matcher   (transformed) => (matched, query) — the linkage
    *                  stage plus the DB-query frame it derives
    * @param session   additional-info tag carried in every export name
    */
  def run(
      spark: SparkSession,
      extract: () => DataFrame,
      transform: DataFrame => DataFrame,
      matcher: DataFrame => (DataFrame, DataFrame),
      baseDir: String, session: String, at: Instant,
      names: Names = Names(), format: String = "parquet",
      coalesceTo: Option[Int] = None): Exports = {
    val ePath = StageSink.save(extract(), baseDir, "EXTRACT_FILES",
      names.extract, at, Seq(session), format, coalesceTo)
    val rest = runFromExtracted(spark, read(spark, ePath, format),
      transform, matcher, baseDir, session, at, names, format, coalesceTo)
    rest.copy(extract = Some(ePath))
  }

  /** TRANSFORM → MATCH from an already-extracted frame (the `-t` flow
    * continued; also the tail of [[run]]). */
  def runFromExtracted(
      spark: SparkSession,
      extracted: DataFrame,
      transform: DataFrame => DataFrame,
      matcher: DataFrame => (DataFrame, DataFrame),
      baseDir: String, session: String, at: Instant,
      names: Names = Names(), format: String = "parquet",
      coalesceTo: Option[Int] = None): Exports = {
    val tPath = StageSink.save(transform(extracted), baseDir,
      "TRANSFORMED_FILES", names.transformed, at, Seq(session), format,
      coalesceTo)
    val rest = runFromTransformed(spark, read(spark, tPath, format),
      matcher, baseDir, session, at, names, format, coalesceTo)
    rest.copy(transformed = Some(tPath))
  }

  /** MATCH only, from a transformed frame (the `-m` flow,
    * __main__.py:187-214: two exports, matched + query). */
  def runFromTransformed(
      spark: SparkSession,
      transformed: DataFrame,
      matcher: DataFrame => (DataFrame, DataFrame),
      baseDir: String, session: String, at: Instant,
      names: Names = Names(), format: String = "parquet",
      coalesceTo: Option[Int] = None): Exports = {
    val (matched, query) = matcher(transformed)
    val mPath = StageSink.save(matched, baseDir, "MATCHED_FILES",
      names.matched, at, Seq(session), format, coalesceTo)
    val qPath = StageSink.save(query, baseDir, "QUERY_FILES",
      names.query, at, Seq(session), format, coalesceTo)
    Exports(matched = Some(mPath), query = Some(qPath))
  }

  /** Resume a stage from its LATEST prior export, like the reference's
    * `-t`/`-m` flows re-reading the newest stage file: e.g.
    * `resumeLatest(spark, base, "TRANSFORMED_FILES", names.transformed)`
    * feeds [[runFromTransformed]]. */
  def resumeLatest(
      spark: SparkSession, baseDir: String, stage: String, name: String,
      format: String = "parquet"): DataFrame =
    StageSink.loadLatest(spark, baseDir, stage, name, format)

  private def read(
      spark: SparkSession, path: String, format: String): DataFrame = {
    val reader = format match {
      case "csv" => spark.read.option("header", "true")
      case _ => spark.read
    }
    reader.format(format).load(path)
  }
}
