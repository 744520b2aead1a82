package graft

import org.apache.spark.sql.functions._
import graft.operators.Timeseries

/** Gap-fill spine and forward-fill edge semantics (q104). */
class TimeseriesSpec extends SparkSpec {
  import spark.implicits._

  private def pts(rows: Seq[(String, String, Double)]) =
    rows.toDF("sensor", "day_s", "reading")
      .select(col("sensor"), to_date(col("day_s")).as("day"),
        col("reading"))

  private def collect(out: org.apache.spark.sql.DataFrame) =
    out.select(col("sensor"), date_format(col("day"), "yyyy-MM-dd"),
      col("reading"))
      .as[(String, String, Double)].collect().toSeq.sorted

  test("gapFillForward: interior gaps fill from the last observation") {
    val out = Timeseries.gapFillForward(
      pts(Seq(("a", "2024-01-01", 1.0), ("a", "2024-01-04", 4.0))),
      "sensor", "day", "reading")
    assert(collect(out) === Seq(
      ("a", "2024-01-01", 1.0), ("a", "2024-01-02", 1.0),
      ("a", "2024-01-03", 1.0), ("a", "2024-01-04", 4.0)))
  }

  test("gapFillForward: spine is per-key — no leading days, no trailing spill") {
    // b starts later and ends earlier than a; its spine must be its
    // own [min, max], not the global range
    val out = Timeseries.gapFillForward(
      pts(Seq(
        ("a", "2024-01-01", 1.0), ("a", "2024-01-05", 5.0),
        ("b", "2024-01-03", 3.0), ("b", "2024-01-04", 4.0))),
      "sensor", "day", "reading")
    val byKey = collect(out).groupBy(_._1)
    assert(byKey("a").map(_._2) ===
      Seq("2024-01-01", "2024-01-02", "2024-01-03", "2024-01-04",
        "2024-01-05"))
    assert(byKey("b") === Seq(
      ("b", "2024-01-03", 3.0), ("b", "2024-01-04", 4.0)))
  }

  test("gapFillForward: an observed day keeps its own value, not a stale fill") {
    // same-day spine twin must NOT overwrite the fresh observation
    val out = Timeseries.gapFillForward(
      pts(Seq(("a", "2024-01-01", 1.0), ("a", "2024-01-02", 2.0),
        ("a", "2024-01-03", 3.0))),
      "sensor", "day", "reading")
    assert(collect(out) === Seq(
      ("a", "2024-01-01", 1.0), ("a", "2024-01-02", 2.0),
      ("a", "2024-01-03", 3.0)))
  }

  test("gapFillForward: single-observation key yields exactly its one day") {
    val out = Timeseries.gapFillForward(
      pts(Seq(("a", "2024-01-15", 7.5))), "sensor", "day", "reading")
    assert(collect(out) === Seq(("a", "2024-01-15", 7.5)))
  }
}
