package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** URL canonicalization for web-corpus ingestion.
  *
  * Web-scale training corpora dedup and mix on URL keys before any
  * content-based pass (a crawl sees the same page under scheme/case/
  * port/tracking-param variants), and every data card publishes a
  * per-domain breakdown. Both need one canonical form, applied as a
  * pure projection at ingest.
  *
  * `urlNormalize` applies the deterministic subset of RFC 3986
  * normalization plus the tracking-param strip every crawl pipeline
  * carries:
  *   1. trim; drop the fragment (`#...` never reaches the server);
  *   2. lowercase the scheme and authority (case-insensitive per RFC);
  *   3. drop the scheme's default port (`:80` for http, `:443` for
  *      https — only for the matching scheme);
  *   4. drop tracking query params (`utm_*`, `gclid`, `fbclid`),
  *      preserving the order of the survivors, and the `?` itself if
  *      none survive (param surgery is split→filter→rejoin on `&` —
  *      regex-only removal mis-handles adjacent tracked params because
  *      each match consumes the next param's `&` separator);
  *   5. empty path → `/` (RFC 3986 §6.2.3).
  * Percent-encoding case and dot-segment normalization are out of
  * scope (rarely emitted by real servers; documenting the rule set
  * keeps the DuckDB oracle an exact replica). Strings that don't look
  * like absolute `scheme://` URLs pass through trimmed, never null —
  * an ingest filter can route them, but normalize itself drops
  * nothing.
  *
  * The split/filter/rejoin uses higher-order array functions
  * (CodegenFallback, not whole-stage codegen) — still a shuffle-free
  * projection; the regex steps around it stay codegen'd.
  */
object UrlFunctions {

  private val Scheme = "^([A-Za-z][A-Za-z0-9+.-]*)://"
  // non-capturing scheme prefix — patterns that extract the part AFTER
  // the scheme must not inherit Scheme's capture group as group 1
  private val SchemeNC = "^[A-Za-z][A-Za-z0-9+.-]*://"
  private val Tracked = "^(utm_[A-Za-z0-9]+|gclid|fbclid)="

  /** Canonical form of an absolute URL (see object doc for the rule
    * set); non-URL strings pass through trimmed. */
  def urlNormalize(url: Column): Column = {
    val u = regexp_replace(trim(url), "#.*$", "")
    val scheme = lower(regexp_extract(u, Scheme, 1))
    val auth0 = lower(regexp_extract(u, SchemeNC + "([^/?#]*)", 1))
    val auth = when(scheme === "http", regexp_replace(auth0, ":80$", ""))
      .when(scheme === "https", regexp_replace(auth0, ":443$", ""))
      .otherwise(auth0)
    val rest = regexp_replace(u, SchemeNC + "[^/?#]*", "")
    val path0 = regexp_extract(rest, "^([^?]*)", 1)
    val path = when(path0 === "", lit("/")).otherwise(path0)
    val query = regexp_extract(rest, "^[^?]*\\?(.*)$", 1)
    val kept = filter(split(query, "&"),
      p => p =!= "" && !p.rlike(Tracked))
    val q = array_join(kept, "&")
    val pq = concat(path,
      when(q === "", lit("")).otherwise(concat(lit("?"), q)))
    when(scheme === "", trim(url))
      .otherwise(concat(scheme, lit("://"), auth, pq))
  }

  /** Registrable host for grouping/domain stats: lowercased, port
    * dropped, leading `www.` stripped (the one alias subdomain that is
    * conventionally the same site). Empty string for non-URLs. */
  def urlHost(url: Column): Column =
    regexp_replace(
      lower(regexp_extract(trim(url), SchemeNC + "([^/?#:]*)", 1)),
      "^www\\.", "")
}
