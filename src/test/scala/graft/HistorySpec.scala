package graft

import java.sql.Date

import graft.operators.History

/** SCD2 semantics pinned on hand-built snapshot piles: version splits
  * happen exactly at value changes, gaps don't split, nulls compare
  * null-safely, and interval chains close correctly. */
class HistorySpec extends SparkSpec {
  import spark.implicits._

  private def d(s: String): Date = Date.valueOf(s)

  private def run(rows: Seq[(Long, String, String)]) =
    History.scd2(
      rows.map { case (k, dt, v) => (k, d(dt), v) }
        .toDF("id", "snap", "v"),
      "id", "snap", Seq("v"))
      .as[(Long, String, Date, Option[Date], Boolean)]
      .collect().sortBy(r => (r._1, r._3.toString))

  test("stable value collapses to one current version") {
    val got = run(Seq((1L, "2024-01-01", "a"), (1L, "2024-01-08", "a"),
      (1L, "2024-01-15", "a")))
    assert(got === Seq((1L, "a", d("2024-01-01"), None, true)))
  }

  test("each change opens a version and closes the previous at the change date") {
    val got = run(Seq(
      (1L, "2024-01-01", "a"), (1L, "2024-01-08", "b"),
      (1L, "2024-01-15", "b"), (1L, "2024-01-22", "c")))
    assert(got === Seq(
      (1L, "a", d("2024-01-01"), Some(d("2024-01-08")), false),
      (1L, "b", d("2024-01-08"), Some(d("2024-01-22")), false),
      (1L, "c", d("2024-01-22"), None, true)))
  }

  test("a date gap without a value change does not split the version") {
    val got = run(Seq((1L, "2024-01-01", "a"), (1L, "2024-03-01", "a")))
    assert(got === Seq((1L, "a", d("2024-01-01"), None, true)))
  }

  test("value returning to an earlier state is a NEW version") {
    val got = run(Seq(
      (1L, "2024-01-01", "a"), (1L, "2024-01-08", "b"),
      (1L, "2024-01-15", "a")))
    assert(got.map(r => (r._2, r._3)) ===
      Seq(("a", d("2024-01-01")), ("b", d("2024-01-08")),
        ("a", d("2024-01-15"))))
  }

  test("null attributes compare null-safely") {
    val got = run(Seq(
      (1L, "2024-01-01", null), (1L, "2024-01-08", null),
      (1L, "2024-01-15", "x")))
    assert(got.map(r => (Option(r._2), r._3, r._5)) === Seq(
      (None, d("2024-01-01"), false), (Some("x"), d("2024-01-15"), true)))
  }

  test("keys are independent; multiple tracked columns split on either") {
    val df = Seq(
      (1L, d("2024-01-01"), "a", 10), (1L, d("2024-01-08"), "a", 11),
      (2L, d("2024-01-01"), "a", 10), (2L, d("2024-01-08"), "a", 10))
      .toDF("id", "snap", "v", "n")
    val got = History.scd2(df, "id", "snap", Seq("v", "n"))
      .as[(Long, String, Int, Date, Option[Date], Boolean)]
      .collect().sortBy(r => (r._1, r._4.toString))
    assert(got === Seq(
      (1L, "a", 10, d("2024-01-01"), Some(d("2024-01-08")), false),
      (1L, "a", 11, d("2024-01-08"), None, true),
      (2L, "a", 10, d("2024-01-01"), None, true)))
  }

  // ---- scd2Apply (incremental merge) ----

  test("scd2Apply(scd2(s1..s3), s4) is row-identical to scd2(s1..s4)") {
    // edge keys: 1 unchanged, 2 changed, 3 new in s4, 4 absent from s4,
    // 5 flip-flops back to its first value, 6 null -> value
    val all = Seq(
      (1L, "2024-01-01", "a"), (1L, "2024-01-08", "a"), (1L, "2024-01-22", "a"),
      (2L, "2024-01-01", "a"), (2L, "2024-01-08", "b"), (2L, "2024-01-22", "c"),
      (3L, "2024-01-22", "z"),
      (4L, "2024-01-01", "x"), (4L, "2024-01-08", "x"),
      (5L, "2024-01-01", "p"), (5L, "2024-01-08", "q"), (5L, "2024-01-22", "p"),
      (6L, "2024-01-01", null), (6L, "2024-01-22", "v"))
    def df(rows: Seq[(Long, String, String)]) =
      rows.map { case (k, dt, v) => (k, d(dt), v) }.toDF("id", "snap", "v")
    val batch = History.scd2(df(all), "id", "snap", Seq("v"))
      .as[(Long, String, Date, Option[Date], Boolean)]
      .collect().sortBy(r => (r._1, r._3.toString))
    val incr = History.scd2Apply(
      History.scd2(df(all.filter(_._2 < "2024-01-22")), "id", "snap", Seq("v")),
      df(all.filter(_._2 == "2024-01-22")), "id", "snap", Seq("v"))
      .as[(Long, String, Date, Option[Date], Boolean)]
      .collect().sortBy(r => (r._1, r._3.toString))
    assert(incr === batch)
  }

  // ---- applyChanges (CDC merge) ----

  private def merge(snapshot: Seq[(Long, String)],
      feed: Seq[(Long, String, Long, String)]) =
    History.applyChanges(
      snapshot.toDF("id", "v"),
      feed.toDF("id", "v", "seq", "op"),
      "id", "seq", "op")
      .as[(Long, String)].collect().sortBy(_._1)

  test("applyChanges: untouched keys keep their snapshot row") {
    assert(merge(Seq(1L -> "a", 2L -> "b"), Seq((2L, "b2", 1L, "U")))
      === Seq(1L -> "a", 2L -> "b2"))
  }

  test("applyChanges: highest sequence wins per key") {
    assert(merge(Seq(1L -> "a"),
      Seq((1L, "a1", 1L, "U"), (1L, "a3", 3L, "U"), (1L, "a2", 2L, "U")))
      === Seq(1L -> "a3"))
  }

  test("applyChanges: a winning delete removes the key; a later upsert re-inserts") {
    assert(merge(Seq(1L -> "a", 2L -> "b"),
      Seq((1L, "a", 1L, "D"),
        (2L, "b", 1L, "D"), (2L, "b2", 2L, "U")))
      === Seq(2L -> "b2"))
  }

  test("applyChanges: feed inserts keys absent from the snapshot") {
    assert(merge(Seq(1L -> "a"), Seq((9L, "new", 1L, "U")))
      === Seq(1L -> "a", 9L -> "new"))
  }
}
