package graft

import graft.operators.SplitRows
import graft.functions.TextFunctions
import org.apache.spark.sql.functions.col

/** Split-row explosion + full-name parsing (_1034 extractor family). */
class SplitRowsSpec extends SparkSpec {
  import spark.implicits._

  test("splitZip pairs pieces by position, passes plain rows through") {
    val df = Seq(
      (1L, "A/B", "x/y", "keep1"),
      (2L, "C", "z", "keep2"))
      .toDF("id", "grade", "name", "other")
    val got = SplitRows.splitZip(df, Seq("grade", "name"), "/")
      .select("id", "grade", "name", "other")
      .as[(Long, String, String, String)].collect().sorted
    assert(got.toSeq == Seq(
      (1L, "A", "x", "keep1"), (1L, "B", "y", "keep1"),
      (2L, "C", "z", "keep2")))
  }

  test("splitZip ragged pieces pad with null, never mis-align") {
    val df = Seq((1L, "A/B/C", "x/y")).toDF("id", "grade", "name")
    val got = SplitRows.splitZip(df, Seq("grade", "name"), "/")
      .select("id", "grade", "name")
      .as[(Long, String, Option[String])].collect().sorted
    assert(got.toSeq == Seq(
      (1L, "A", Some("x")), (1L, "B", Some("y")), (1L, "C", None)))
  }

  test("splitZip is a pure projection (no exchange)") {
    val df = Seq((1L, "A/B")).toDF("id", "grade")
    val plan = SplitRows.splitZip(df, Seq("grade"), "/")
      .queryExecution.executedPlan.toString
    assert(!plan.contains("Exchange"), plan)
  }

  test("parseFullName handles every synthesized family") {
    val cases = Seq(
      ("Gárcía, José \"Pepe\"", ("Jose", "Garcia", "Pepe", "", "")),
      ("Ann Lee", ("Ann", "Lee", "", "", "")),
      ("John Q. Public", ("John", "Public", "", "", "Q.")),
      ("Sam Hill Jr.", ("Sam", "Hill", "", "Jr.", "")),
      ("Tom (Tommy) Ford III", ("Tom", "Ford", "Tommy", "III", "")),
      // multi-word first name, no other decorations
      ("Mary Jo Kane", ("Mary Jo", "Kane", "", "", "")))
    val got = cases.map(_._1).toDF("info")
      .select(TextFunctions.parseFullName(col("info")).as("p"))
      .select("p.firstname", "p.lastname", "p.nickname", "p.suffix",
        "p.middlename")
      .as[(String, String, String, String, String)].collect()
    cases.zip(got).foreach { case ((in, want), have) =>
      assert(have == want, s"input: $in")
    }
  }
}
