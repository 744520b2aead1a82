package graft

import java.sql.Timestamp

import org.apache.spark.sql.functions._
import graft.operators.{DistinctOn, HtmlTable, Sessionize, TextStats, Unpivot}

class OperatorsSpec extends SparkSpec {
  import spark.implicits._

  test("DistinctOn keeps first row per key under ordering") {
    val df = Seq((1, "a", 3), (1, "b", 5), (2, "c", 1))
      .toDF("k", "v", "ord")
    val out = DistinctOn(df, Seq(col("k")), Seq(col("ord").desc))
      .orderBy("k").collect()
    assert(out.map(_.getString(1)).toSeq === Seq("b", "c"))
  }

  test("Unpivot melts wide columns and drops nulls") {
    val wide = Seq((1, Some(10.0), None: Option[Double]))
      .toDF("id", "A", "B")
    val out = Unpivot(wide, Seq("id"), Seq("A", "B"), "var", "val")
      .collect()
    assert(out.length === 1)
    assert(out(0).getString(1) === "A" && out(0).getDouble(2) === 10.0)
  }

  test("Sessionize splits on gap and numbers sessions per key") {
    def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    val events = Seq(
      (1L, ts(0), 1L), (1L, ts(10), 2L), (1L, ts(50), 3L), // gap at 50
      (2L, ts(5), 4L))
      .toDF("user_id", "ts", "event_id")
    val out = Sessionize(events, "user_id", "ts", 30L * 60 * 1000, "event_id")
      .select("user_id", "event_id", "session_id")
      .orderBy("event_id").collect()
    assert(out.map(_.getLong(2)).toSeq === Seq(1L, 1L, 2L, 1L))
  }

  test("Sessionize and native session_window agree, including at the boundary") {
    // an event EXACTLY gap after its predecessor merges under BOTH
    // formulations (Spark's session window is boundary-inclusive,
    // verified here — q116's oracle encodes the same `> gap` split
    // rule as q20's lag+cumsum)
    def ts(min: Int) = Timestamp.valueOf(f"2024-01-01 00:$min%02d:00")
    val events = Seq(
      (1L, ts(0), 1L), (1L, ts(30), 2L), // boundary-exact successor
      (1L, ts(45), 3L),
      (2L, ts(0), 4L), (2L, ts(31), 5L)) // over the gap — splits
      .toDF("user_id", "ts", "event_id")
    val lagForm = Sessionize(events, "user_id", "ts", 30L * 60 * 1000,
      "event_id")
      .groupBy("user_id").agg(max(col("session_id")).as("n"))
      .as[(Long, Long)].collect().toMap
    val nativeForm = events
      .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
      .count()
      .groupBy("user_id").count()
      .as[(Long, Long)].collect().toMap
    assert(lagForm === Map(1L -> 1L, 2L -> 2L))
    assert(nativeForm === lagForm)
  }

  test("TextStats langId picks profile with most hits, first wins ties") {
    val out = Seq("the cat and the dog", "el gato y la casa", "xyz")
      .toDF("text")
      .select(TextStats.langId(col("text"))).as[String].collect()
    assert(out(0) === "en")
    assert(out(1) === "es")
    assert(out(2) === "en") // all-zero tie -> first profile
  }

  test("TextStats token counts") {
    val r = Seq("Hello, world! 42 tests.")
      .toDF("text")
      .select(
        TextStats.wsTokenCount(col("text")),
        TextStats.bpeTokenCount(col("text"))).head
    assert(r.getInt(0) === 4)
    // Hello , world ! 42 tests . -> 7
    assert(r.getInt(1) === 7)
  }

  test("TextStats fingerprint is order-sensitive") {
    val fp = Seq("a b c", "c b a").toDF("text")
      .select(TextStats.fingerprint(col("text"))).as[Long].collect()
    assert(fp(0) !== fp(1))
  }

  test("HtmlTable extracts cells, strips tags, unescapes entities") {
    val html =
      """<html><body><table>
        |<tr><th>Name</th><th>Score &amp; Rank</th></tr>
        |<tr><td><b>Alice</b></td><td> 95 </td></tr>
        |<tr><td>Bob&nbsp;Jr.</td><td>88</td></tr>
        |</table></body></html>""".stripMargin
    val tbl = Seq(html).toDF("page")
      .select(HtmlTable.extractTable(col("page")).as("t"))
      .as[Seq[Seq[String]]].head
    assert(tbl.length === 3)
    assert(tbl(0) === Seq("Name", "Score & Rank"))
    assert(tbl(1) === Seq("Alice", "95"))
    assert(tbl(2) === Seq("Bob Jr.", "88"))
  }

  test("HtmlTable toRecords keys body rows by header") {
    val html = "<table><tr><td>a</td><td>b</td></tr>" +
      "<tr><td>1</td><td>2</td></tr></table>"
    val out = HtmlTable.toRecords(
      Seq((7L, html)).toDF("page_id", "page"), "page", Seq("page_id"))
      .select("page_id", "row_idx", "record").collect()
    assert(out.length === 1)
    val rec = out(0).getMap[String, String](2)
    assert(rec("a") === "1" && rec("b") === "2")
  }
}
