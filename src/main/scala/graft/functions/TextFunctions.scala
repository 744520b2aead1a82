package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Column functions re-expressing the reference's pandas string
  * transforms as codegen'd Catalyst expressions (regexp + built-ins
  * only, no UDFs).
  *
  * Ref: votervoice/transform.py:16-70 (get_name,
  * get_party_state_district), VALUES_TO_REPLACE (transform.py:7-10).
  */
object TextFunctions {

  /** Honorific titles stripped from the head of a composite info string
    * (ref: votervoice/transform.py:23-29). */
  val Titles: Seq[String] =
    Seq("Rep.", "Sen.", "Gov.", "Del.", "Hon.", "Mr.", "Mrs.", "Ms.")

  /** Name suffixes recognised at the tail (ref: transform.py:31-38).
    * Longest-first ordering (III before II) so the regex alternation is
    * unambiguous under both Java regex and RE2 semantics. */
  val Suffixes: Seq[String] = Seq("Jr.", "Sr.", "III", "II", "IV")

  private def alt(xs: Seq[String]): String =
    xs.map(_.replace(".", "\\.")).mkString("|")

  private val titleRe = s"^(${alt(Titles)})\\s"
  private val suffixRe = s"\\s(${alt(Suffixes)})$$"

  /** Drop a leading honorific title. */
  def stripTitle(info: Column): Column = regexp_replace(info, titleRe, "")

  /** Extract the trailing name suffix ('' when absent). */
  def extractSuffix(info: Column): Column =
    regexp_extract(stripTitle(info), suffixRe, 1)

  /** The name with title and suffix removed. */
  def baseName(info: Column): Column =
    regexp_replace(stripTitle(info), suffixRe, "")

  /** First token of the base name. */
  def firstName(info: Column): Column =
    regexp_extract(baseName(info), "^(\\S+)", 1)

  /** Last token of the base name. */
  def lastName(info: Column): Column =
    regexp_extract(baseName(info), "(\\S+)$", 1)

  /** Everything between first and last token ('' for 2-token names). */
  def middleName(info: Column): Column =
    regexp_extract(baseName(info), "^\\S+\\s(.*)\\s\\S+$", 1)

  /** Parsed name as a struct column (firstname, middlename, lastname,
    * suffix). Ref: votervoice/transform.py:16-56. */
  def parseName(info: Column): Column = struct(
    firstName(info).as("firstname"),
    middleName(info).as("middlename"),
    lastName(info).as("lastname"),
    extractSuffix(info).as("suffix"))

  // ------------------------------------------------------------------
  // (party-state-district) token — ref: transform.py:59-70
  // ------------------------------------------------------------------

  /** Party letter from a '(P-SS-DD)' token. */
  def party(info: Column): Column =
    regexp_extract(info, "\\(([A-Z])-", 1)

  /** Two-letter state from a '(P-SS-DD)' token. */
  def state(info: Column): Column =
    regexp_extract(info, "-([A-Z]{2})-", 1)

  /** District with zero-padding stripped; at-large delegate states map
    * to 'Delegate' (ref: transform.py:66-70 Delegate special-case). */
  def district(info: Column, delegateStates: Seq[String] = Seq("DC")): Column = {
    val raw = regexp_extract(info, "-(\\d+)\\)", 1)
    when(state(info).isin(delegateStates: _*), lit("Delegate"))
      .otherwise(raw.cast("int").cast("string"))
  }

  // ------------------------------------------------------------------
  // Value normalisation — ref: transform.py:7-10 VALUES_TO_REPLACE
  // ------------------------------------------------------------------

  /** Map-based value replacement (unmatched values pass through),
    * expressed as a chain of when/otherwise — constant-folded by
    * Catalyst into a single codegen'd conditional. */
  def replaceValues(c: Column, mapping: Map[String, String]): Column =
    mapping.foldLeft(c) { case (acc, (from, to)) =>
      when(c === from, lit(to)).otherwise(acc)
    }

  /** NaN/null → '' (the reference frames are pandas, where missing is
    * NaN; here missing is SQL NULL). */
  def nullToEmpty(c: Column): Column = coalesce(c, lit(""))
}
