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

  // --- ewmaTruncated: pinned against the exact scalar recursion run
  // over the same truncated window, in the same fold order.
  private def scalarEwma(
      xs: Seq[Double], alpha: Double, window: Int): Seq[Double] =
    xs.indices.map { i =>
      val frame = xs.slice(math.max(0, i - window + 1), i + 1)
      frame.tail.foldLeft(frame.head)((acc, x) => alpha * x + (1 - alpha) * acc)
    }

  test("ewmaTruncated: matches the scalar recursion exactly per key") {
    import spark.implicits._
    val xsA = Seq(10.0, 20.0, 5.0, 40.0, 40.0, 1.0, 7.0, 100.0, 2.0, 3.0)
    val xsB = Seq(4.0, 4.0, 4.0)
    val rows = xsA.zipWithIndex.map { case (x, i) => ("a", i.toLong, x) } ++
      xsB.zipWithIndex.map { case (x, i) => ("b", i.toLong, x) }
    val out = Timeseries.ewmaTruncated(
        rows.toDF("k", "t", "x"), "k", "t", "x", alpha = 0.25, window = 4)
      .select(col("k"), col("t"), col("ewma"))
      .as[(String, Long, Double)].collect()
      .groupBy(_._1).map { case (k, v) =>
        k -> v.sortBy(_._2).map(_._3).toSeq }
    assert(out("a") === scalarEwma(xsA, 0.25, 4))
    // a constant series is a fixed point regardless of truncation
    assert(out("b") === Seq(4.0, 4.0, 4.0))
  }

  test("ewmaTruncated: window=1 degenerates to the raw series") {
    import spark.implicits._
    val rows = Seq(("k", 0L, 3.5), ("k", 1L, -1.0), ("k", 2L, 9.0))
    val out = Timeseries.ewmaTruncated(
        rows.toDF("k", "t", "x"), "k", "t", "x", alpha = 0.25, window = 1)
      .select(col("t"), col("ewma")).as[(Long, Double)].collect()
      .sortBy(_._1).map(_._2).toSeq
    assert(out === Seq(3.5, -1.0, 9.0))
  }
}
