package graft

import org.apache.spark.sql.functions._
import graft.functions.TextFunctions

class TextFunctionsSpec extends SparkSpec {
  import spark.implicits._

  private def parse(info: String): (String, String, String, String) = {
    val r = Seq(info).toDF("info").select(
      TextFunctions.firstName(col("info")),
      TextFunctions.middleName(col("info")),
      TextFunctions.lastName(col("info")),
      TextFunctions.extractSuffix(col("info"))).head
    (r.getString(0), r.getString(1), r.getString(2), r.getString(3))
  }

  test("full name with title, middle initial and suffix") {
    assert(parse("Rep. John A. Smith Jr.") === (("John", "A.", "Smith", "Jr.")))
  }

  test("comma suffix and paren token are handled like the reference") {
    assert(parse("Sen. First1 C. Last1, Jr. (R-TX-01)") ===
      (("First1", "C.", "Last1", "Jr.")))
  }

  test("two-token name") {
    assert(parse("Jane Doe") === (("Jane", "", "Doe", "")))
  }

  test("roman-numeral suffix via [IVX]{2,3}") {
    assert(parse("Sen. Al B. Carson III") === (("Al", "B.", "Carson", "III")))
  }

  test("multi-word title and multi-word last name") {
    assert(parse("Minority Leader Ann Van Der Berg") ===
      (("Ann", "", "Van Der Berg", "")))
  }

  test("M.D. suffix") {
    assert(parse("Rep. Bo K. Ruiz, M.D.") === (("Bo", "K.", "Ruiz", "M.D.")))
  }

  test("party-state-district: de-pad, Delegate title rule, missing district") {
    val df = Seq("Rep. X (R-TX-07)", "Delegate Y (D-DC-00)", "Z (I-VT)")
      .toDF("info").select(
        TextFunctions.party(col("info")).as("p"),
        TextFunctions.state(col("info")).as("s"),
        TextFunctions.district(col("info")).as("d"))
    val rows = df.collect().map(r => (r.getString(0), r.getString(1), r.getString(2)))
    assert(rows(0) === (("R", "TX", "7")))
    assert(rows(1) === (("D", "DC", "Delegate")))
    assert(rows(2) === (("I", "VT", "")))
  }

  test("replaceValues maps listed values and passes others through") {
    val out = Seq("BUILDING", "FURNITURE").toDF("v")
      .select(TextFunctions.replaceValues(col("v"),
        Map("BUILDING" -> "BLDG")).as("v"))
      .as[String].collect()
    assert(out === Array("BLDG", "FURNITURE"))
  }

  test("ratingString translates vote labels to symbols, dropping unknowns") {
    val out = Seq(Seq("Voted with us", "mystery", "Voted against us",
      "No position", "vvSupportContainer"))
      .toDF("votes")
      .select(TextFunctions.ratingString(col("votes"))).as[String].head
    assert(out === "+-*+")
  }

  test("nullToEmpty") {
    val out = Seq(Some("x"), None).toDF("v")
      .select(TextFunctions.nullToEmpty(col("v"))).as[String].collect()
    assert(out === Array("x", ""))
  }

  test("unicode_normalize composes, decomposes, folds compatibility forms") {
    def norm(s: String, form: String): String =
      Seq(s).toDF("t")
        .select(call_function("unicode_normalize", col("t"), lit(form)))
        .as[String].head
    // NFC composes combining sequences; plain ASCII is untouched
    assert(norm("cafe\u0301", "NFC") === "caf\u00e9")
    assert(norm("plain ascii", "NFC") === "plain ascii")
    // NFD decomposes the precomposed form back
    assert(norm("caf\u00e9", "NFD") === "cafe\u0301")
    // NFKC folds compatibility characters: fi-ligature, fullwidth A/1
    assert(norm("\ufb01t \uff21\uff11", "NFKC") === "fit A1")
    // nulls pass through; non-literal/bogus forms are rejected loudly
    val n = Seq[Option[String]](None).toDF("t")
      .select(call_function("unicode_normalize", col("t"), lit("NFC")))
      .collect()
    assert(n.head.isNullAt(0))
    intercept[Exception] {
      Seq("x").toDF("t")
        .select(call_function("unicode_normalize", col("t"), lit("NFX")))
        .collect()
    }
  }
}
