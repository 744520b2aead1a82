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

  /** Title prefixes stripped from the head of a composite info string —
    * the reference's exact list, including multi-word legislative
    * titles (ref: votervoice/transform.py:22-33). `Pro Tempore` is
    * unanchored there, so it is here too. */
  val TitlePatterns: Seq[String] = Seq(
    "^Rep\\.\\s", "^Sen\\.\\s", "^Minority Leader\\s", "^Majority Leader\\s",
    "^Resident Commissioner\\s", "^Speaker\\s", "^Delegate\\s",
    "^President\\s", "^Senate President\\s", "Pro Tempore\\s")

  /** Trailing-suffix pattern (ref: transform.py:18-20): roman numerals,
    * Jr/Sr with optional dot, honorifics, and M.D. — optionally preceded
    * by a comma. */
  val SuffixRe: String =
    ",?\\s?((?:[IVX]{2,3}|Jr\\.?|Sr\\.?|Dr\\.?|Mr\\.?|Ms\\.?|Mrs\\.?|M\\.?\\s?D\\.?))$"

  private val ParenTokenRe = "\\s\\([^)]*\\)"
  private val MiddleInitialRe = "\\s+([A-Z]\\.)"

  /** Drop the '(P-SS-DD)'-style parenthesized token (step 1 of
    * get_name). */
  def stripParenToken(info: Column): Column =
    regexp_replace(info, ParenTokenRe, "")

  /** Drop every known title prefix (step 2). */
  def stripTitles(info: Column): Column =
    TitlePatterns.foldLeft(stripParenToken(info))(
      (acc, pat) => regexp_replace(acc, pat, ""))

  /** Extract the trailing name suffix ('' when absent). */
  def extractSuffix(info: Column): Column =
    regexp_extract(stripTitles(info), SuffixRe, 1)

  /** Name with title + suffix removed (the reference's
    * first_mid_last). */
  def baseName(info: Column): Column =
    regexp_replace(stripTitles(info), SuffixRe, "")

  /** Middle initial 'X.' extracted from the base name ('' if none). */
  def middleName(info: Column): Column =
    regexp_extract(baseName(info), MiddleInitialRe, 1)

  private def firstLast(info: Column): Column =
    regexp_replace(baseName(info), MiddleInitialRe, "")

  /** First whitespace token of the name. */
  def firstName(info: Column): Column =
    regexp_extract(firstLast(info), "^(\\S+)", 1)

  /** Everything after the first token — multi-word last names stay
    * intact, re-joined by single spaces (the reference joins
    * tokens[1:] with ' '). */
  def lastName(info: Column): Column =
    trim(regexp_replace(
      regexp_replace(firstLast(info), "^\\S+\\s*", ""), "\\s+", " "))

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

  /** The reference's exact token pattern: party, state_id, optional
    * district inside parentheses (transform.py:60). */
  val PsdRe: String = "\\((\\w+)-(\\w+)-?(\\w+)?\\)"

  /** Party from a '(P-SS-DD)' token. */
  def party(info: Column): Column = regexp_extract(info, PsdRe, 1)

  /** State id from a '(P-SS-DD)' token. */
  def state(info: Column): Column = regexp_extract(info, PsdRe, 2)

  /** District with leading zeros stripped ('07' → '7', '00' → '');
    * rows whose info string carries the Delegate title get district
    * 'Delegate' (ref: transform.py:59-70 — the flag is `^Delegate` on
    * the info string; the de-pad is regex `^0+` → ''). */
  def district(info: Column): Column = {
    val raw = regexp_replace(regexp_extract(info, PsdRe, 3), "^0+", "")
    when(info.rlike("^Delegate"), lit("Delegate")).otherwise(raw)
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

  /** The reference's votervoice scorecard methodology: raw per-vote
    * labels → plus/minus/star symbols (ref: votervoice/extract.py:22-29). */
  val RatingsMethodology: Map[String, String] = Map(
    "Voted with us" -> "+", "Voted against us" -> "-", "No position" -> "*",
    "vvSupportContainer" -> "+", "vvOpposeContainer" -> "-",
    "vvNeutralContainer" -> "*")

  /** Translate an array of per-vote labels into a rating string like
    * "++-*+" (unknown labels drop out, like the reference's loop —
    * votervoice/extract.py:36-49). */
  def ratingString(
      votes: Column,
      mapping: Map[String, String] = RatingsMethodology): Column = {
    val mapped = transform(votes, v =>
      mapping.foldLeft(lit(null).cast("string")) {
        case (acc, (label, sym)) => when(v === label, lit(sym)).otherwise(acc)
      })
    concat_ws("", filter(mapped, _.isNotNull))
  }

  // ------------------------------------------------------------------
  // Full-name parsing, _1034 style (national/_1034/transform.py:95-150
  // transform_name): unidecode fold, quoted/parenthesized nickname,
  // roman/Jr/Sr suffix, single-initial middle name, and BOTH name
  // orders — "First [M.] Last" and "Last, First".
  // ------------------------------------------------------------------

  /** unidecode-lite: fold the Latin accents scraped pages actually
    * carry to ASCII (a fixed `translate` — codegen'd, no per-char UDF;
    * DuckDB parity via strip_accents). */
  def foldAccents(c: Column): Column = translate(c,
    "áéíóúñçàèìòùâêîôûäëïöüÁÉÍÓÚÑ",
    "aeiouncaeiouaeiouaeiouAEIOUN")

  private val NicknameRe = "[\"(]([^\")]*)[\")]"
  private val FullSuffixRe = "(III|II|IV|Jr\\.?|Sr\\.?)"

  /** Nickname in quotes or parens ('' when absent). */
  def nickname(c: Column): Column = regexp_extract(c, NicknameRe, 1)

  /** Name parts from a free-form candidate name. Returns a struct of
    * (firstname, lastname, nickname, suffix, middlename); absent parts
    * are ''. Mirrors the reference's order of operations: fold, strip
    * nickname, strip suffix, strip middle initial, then split on the
    * comma if the "Last, First" order is used, else last whitespace
    * token is the lastname. */
  def parseFullName(info: Column): Column = {
    val folded = foldAccents(info)
    val c1 = regexp_replace(folded, "\\s?" + NicknameRe, "")
    val suffix = regexp_extract(c1, ",? ?" + FullSuffixRe + "$", 1)
    val c2 = regexp_replace(c1, ",? ?" + FullSuffixRe + "$", "")
    val middle = regexp_extract(c2, " ([A-Z]\\.) ", 1)
    val c3 = regexp_replace(c2, " [A-Z]\\. ", " ")
    val comma = c3.contains(",")
    val first = trim(when(comma, element_at(split(c3, ","), 2))
      .otherwise(regexp_replace(c3, " [^ ]+$", "")))
    val last = trim(when(comma, element_at(split(c3, ","), 1))
      .otherwise(regexp_extract(c3, "([^ ]+)$", 1)))
    struct(
      first.as("firstname"), last.as("lastname"),
      nickname(folded).as("nickname"), suffix.as("suffix"),
      middle.as("middlename"))
  }
}
