package graft

import org.apache.spark.sql.functions._
import graft.operators.EventFlow

/** Funnel + cohort retention semantics: strict step ordering, the
  * conversion window anchored at step 1, ISO-week cohorts. */
class EventFlowSpec extends SparkSpec {
  import spark.implicits._

  private def ev(rows: Seq[(Long, String, String)]) =
    rows.toDF("user_id", "event_type", "ts_s")
      .select(col("user_id"), col("event_type"),
        to_timestamp(col("ts_s")).as("ts"))

  test("funnel: strict order, earliest-match anchoring, 1-day window") {
    val events = ev(Seq(
      // full journey inside the window
      (1L, "view", "2024-01-01 00:00:00"),
      (1L, "click", "2024-01-01 01:00:00"),
      (1L, "purchase", "2024-01-01 02:00:00"),
      // click BEFORE the first view never counts
      (2L, "click", "2024-01-01 00:00:00"),
      (2L, "view", "2024-01-01 01:00:00"),
      (2L, "purchase", "2024-01-01 02:00:00"),
      // click outside the 1-day window from the anchor
      (3L, "view", "2024-01-01 00:00:00"),
      (3L, "click", "2024-01-03 00:00:00"),
      // purchase past the deadline even though the click was in time
      (4L, "view", "2024-01-01 00:00:00"),
      (4L, "click", "2024-01-01 01:00:00"),
      (4L, "purchase", "2024-01-02 01:00:00"),
      // never enters the funnel
      (5L, "purchase", "2024-01-01 00:00:00")))
    val out = EventFlow.funnel(events, "user_id", "ts", "event_type",
      steps = Seq(EventFlow.Step("view"), EventFlow.Step("click"),
        EventFlow.Step("purchase")),
      windowDays = 1)
      .as[(Int, String, Long)].collect()
      .map(r => r._1 -> ((r._2, r._3))).toMap
    assert(out === Map(
      1 -> (("view", 4L)),      // users 1-4 all have a view
      2 -> (("click", 2L)),     // users 1, 4
      3 -> (("purchase", 1L)))) // user 1 only
  }

  test("funnel: later same-step events can still satisfy a step") {
    // user's first view anchors; the qualifying click is the SECOND
    // one (first click precedes the view)
    val events = ev(Seq(
      (1L, "click", "2024-01-01 00:00:00"),
      (1L, "view", "2024-01-01 01:00:00"),
      (1L, "click", "2024-01-01 02:00:00")))
    val out = EventFlow.funnel(events, "user_id", "ts", "event_type",
      steps = Seq(EventFlow.Step("view"), EventFlow.Step("click")),
      windowDays = 1)
      .as[(Int, String, Long)].collect().map(r => r._1 -> r._3).toMap
    assert(out === Map(1 -> 1L, 2 -> 1L))
  }

  test("retention: ISO-week cohorts, distinct active weeks, offsets") {
    // 2024-01-01 is a Monday — weeks are 01-01 / 01-08 / 01-15
    val events = ev(Seq(
      (1L, "view", "2024-01-02 10:00:00"), // cohort w0
      (1L, "view", "2024-01-16 10:00:00"), // active w2
      (2L, "view", "2024-01-09 10:00:00"), // cohort w1
      (3L, "view", "2024-01-01 10:00:00"), // cohort w0
      (3L, "view", "2024-01-03 10:00:00"), // same week — counts once
      (3L, "view", "2024-01-10 10:00:00"))) // active w1
    val out = EventFlow.retention(events, "user_id", "ts")
      .select(col("cohort_week").cast("string"), col("week_offset"),
        col("users"))
      .as[(String, Int, Long)].collect().toSet
    assert(out === Set(
      ("2024-01-01", 0, 2L), // users 1 and 3
      ("2024-01-01", 1, 1L), // user 3
      ("2024-01-01", 2, 1L), // user 1
      ("2024-01-08", 0, 1L))) // user 2
  }

  test("cumulativeUsers: a user counts once, on their first day") {
    val events = ev(Seq(
      (1L, "view", "2024-01-01 10:00:00"),
      (1L, "view", "2024-01-03 10:00:00"), // returning — never recounted
      (2L, "view", "2024-01-01 23:00:00"),
      (3L, "view", "2024-01-03 00:00:00"),
      (4L, "view", "2024-01-05 12:00:00")))
    val got = EventFlow.cumulativeUsers(events, "user_id", "ts")
      .select(col("day").cast("string"), col("new_users"), col("cum_users"))
      .as[(String, Long, Long)].collect().sortBy(_._1)
    assert(got.toSeq === Seq(
      ("2024-01-01", 2L, 2L),  // users 1, 2
      ("2024-01-03", 1L, 3L),  // user 3 (user 1's return doesn't count)
      ("2024-01-05", 1L, 4L))) // user 4; day 2 and 4 have no row
  }

  test("maxConcurrency: half-open intervals — touching endpoints don't overlap") {
    val iv = Seq(
      // key a: [0,2) [1,3) [2,4) — the first ENDS exactly when the
      // third STARTS, so peak is 2 (at t=1 and t=2), not 3
      ("a", "2024-01-01 00:00:00", "2024-01-01 02:00:00"),
      ("a", "2024-01-01 01:00:00", "2024-01-01 03:00:00"),
      ("a", "2024-01-01 02:00:00", "2024-01-01 04:00:00"),
      // key b: three genuinely nested intervals → 3
      ("b", "2024-01-01 00:00:00", "2024-01-01 10:00:00"),
      ("b", "2024-01-01 01:00:00", "2024-01-01 09:00:00"),
      ("b", "2024-01-01 02:00:00", "2024-01-01 08:00:00"),
      // key c: disjoint intervals → 1
      ("c", "2024-01-01 00:00:00", "2024-01-01 01:00:00"),
      ("c", "2024-01-01 05:00:00", "2024-01-01 06:00:00"))
      .toDF("k", "s", "e")
      .select(col("k"), to_timestamp(col("s")).as("s"),
        to_timestamp(col("e")).as("e"))
    val out = EventFlow.maxConcurrency(iv, "k", col("s"), col("e"))
      .as[(String, Long)].collect().toMap
    assert(out === Map("a" -> 2L, "b" -> 3L, "c" -> 1L))
  }

  test("transitions: per-user consecutive pairs, tie-broken, P(to|from) sums to 1") {
    // u1: A→B→A ; u2: A→A→B ; u3: both events at the SAME ts — the
    // tie column (id) orders them deterministically as A→B ; u4: a
    // single event, no transition
    val ev2 = Seq(
      (1L, 1L, 10L, "A"), (1L, 2L, 11L, "B"), (1L, 3L, 12L, "A"),
      (2L, 1L, 20L, "A"), (2L, 2L, 21L, "A"), (2L, 3L, 22L, "B"),
      (3L, 5L, 30L, "A"), (3L, 5L, 31L, "B"),
      (4L, 9L, 40L, "C")).toDF("u", "t", "id", "typ")
    val got = EventFlow.transitions(ev2, "u", "t", "typ", "id")
      .select(col("from_type"), col("to_type"), col("n"), col("p"))
      .as[(String, String, Long, Double)].collect()
      .map(r => (r._1, r._2) -> ((r._3, r._4))).toMap
    assert(got === Map(
      ("A", "B") -> ((3L, 0.75)), ("A", "A") -> ((1L, 0.25)),
      ("B", "A") -> ((1L, 1.0))))
    // u4's lone event contributes nothing; C never appears
    assert(!got.keySet.exists { case (f, t) => f == "C" || t == "C" })
  }
}
