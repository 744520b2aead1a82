package graft

import org.apache.spark.sql.functions._
import graft.functions.UrlFunctions
import graft.operators.Corpus

/** URL canonicalization + the domain profile and stratified sampler
  * built on it (q82/q83 operators). */
class UrlSpec extends SparkSpec {
  import spark.implicits._

  private def norm(u: String): String =
    Seq(u).toDF("u").select(UrlFunctions.urlNormalize(col("u")))
      .as[String].head()

  private def host(u: String): String =
    Seq(u).toDF("u").select(UrlFunctions.urlHost(col("u")))
      .as[String].head()

  test("urlNormalize lowercases scheme/host, strips default port and fragment") {
    assert(norm("HTTP://Example.COM:80/Path?a=1#frag") ==
      "http://example.com/Path?a=1")
    assert(norm("HTTPS://Example.com:443/") == "https://example.com/")
    // only the scheme's OWN default port is stripped
    assert(norm("https://example.com:8080/x") == "https://example.com:8080/x")
    assert(norm("http://example.com:443/x") == "http://example.com:443/x")
    // empty path -> "/" (RFC 3986 §6.2.3); path case preserved
    assert(norm("http://example.com") == "http://example.com/")
  }

  test("urlNormalize strips tracking params including adjacent ones") {
    // adjacent tracked params: the case a global-regex strip mis-handles
    // (each match consumes the separator the next match needs)
    assert(norm("http://a.com/p?utm_source=x&utm_medium=y&b=2") ==
      "http://a.com/p?b=2")
    assert(norm("http://a.com/p?utm_source=x") == "http://a.com/p")
    assert(norm("http://a.com/p?a=1&gclid=z") == "http://a.com/p?a=1")
    assert(norm("http://a.com/p?fbclid=q&a=1") == "http://a.com/p?a=1")
    // survivor order preserved; duplicate separators collapse
    assert(norm("http://a.com/p?b=2&&a=1") == "http://a.com/p?b=2&a=1")
  }

  test("urlNormalize passes non-URL strings through trimmed") {
    assert(norm("  not a url  ") == "not a url")
    assert(norm("mailto:x@y.z") == "mailto:x@y.z")
  }

  test("urlHost lowercases, drops port and leading www") {
    assert(host("HTTPS://WWW.Example.com:443/x?y#z") == "example.com")
    assert(host("http://sub.www.example.com/") == "sub.www.example.com")
    assert(host("not a url") == "")
  }

  test("domainProfile counts docs and distinct canonical urls per host") {
    val docs = Seq(
      "http://A.com/x?utm_source=s",  // canon: http://a.com/x
      "HTTP://a.com:80/x",            // same canonical url
      "http://a.com/y",               // second distinct url
      "https://WWW.b.org/"            // other host
    ).toDF("url")
    val m = Corpus.domainProfile(docs, "url")
      .collect().map(r => (r.getString(0), (r.getLong(1), r.getLong(2))))
      .toMap
    assert(m == Map("a.com" -> ((3L, 2L)), "b.org" -> ((1L, 1L))))
  }

  test("sampleStratified draws exact per-stratum counts, deterministic and nested") {
    val df = spark.range(1000)
      .select(col("id"), (col("id") % 3).cast("string").as("s"))
    // strata sizes: 334 / 333 / 333 -> 20% = ceil: 67, 67, 67
    val s20 = Corpus.sampleStratified(df, "s", "id", 20)
    val counts = s20.groupBy("s").count().as[(String, Long)].collect().toMap
    assert(counts == Map("0" -> 67L, "1" -> 67L, "2" -> 67L))
    // deterministic: a second run picks the identical id set
    val ids1 = s20.select("id").as[Long].collect().toSet
    val ids2 = Corpus.sampleStratified(df, "s", "id", 20)
      .select("id").as[Long].collect().toSet
    assert(ids1 == ids2)
    // nested: the 10% sample is a subset of the 20% sample
    val ids10 = Corpus.sampleStratified(df, "s", "id", 10)
      .select("id").as[Long].collect().toSet
    assert(ids10.subsetOf(ids1) && ids10.size == 34 * 3)
    // boundary percents
    assert(Corpus.sampleStratified(df, "s", "id", 100).count() == 1000)
    assert(Corpus.sampleStratified(df, "s", "id", 0).count() == 0)
  }
}
