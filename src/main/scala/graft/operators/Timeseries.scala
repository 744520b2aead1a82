package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Sparse-to-dense time-series repair: build each key's full daily
  * spine and forward-fill the gaps — the metric-warehouse shape
  * (sensor readings, account balances, daily snapshots with holes)
  * that naive SQL solves with a calendar-table join.
  *
  * The plan here is JOIN-FREE: the spine rows are unioned with the
  * observed points and a single `last(ignoreNulls)` ordered window
  * fills forward. A calendar join would shuffle both sides on
  * (key, day) and then need a second key exchange for the fill
  * window; the union needs only the window's own key exchange.
  */
object Timeseries {

  /** Densify `points` (one row per (key, day) with a value — the
    * caller pre-aggregates duplicates) to every day in [min(day),
    * max(day)] PER KEY, forward-filling missing days from the last
    * observed value. Output columns keep the input names; leading
    * days before a key's first observation cannot occur (the spine
    * starts at the key's own min).
    *
    * Plan shape: a per-key bounds aggregate (map-side combined, one
    * row per key) feeds `sequence()`+`explode` — the spine is
    * generated IN-PLAN, never collected, and inherits the bounds
    * aggregate's key partitioning through the narrow explode. The
    * union tags observed rows 0 and spine rows 1; one window over
    * (key ORDER BY day, tag) forward-fills with `last(value,
    * ignoreNulls)` — an observed day sorts before its spine twin, so
    * same-day fills see the fresh value — and the spine rows are the
    * output. Exchanges: the bounds aggregate and the window's key
    * exchange (the observed-points side). At 100 TB the payload is
    * (key, day, value) triples only, and a key's whole series must
    * fit one partition's sort — true by construction for daily grain
    * (a decade is ~3.7k rows per key).
    */
  def gapFillForward(
      points: DataFrame, keyCol: String, dayCol: String,
      valCol: String): DataFrame = {
    val k = col(keyCol)
    val spine = points
      .groupBy(k).agg(min(col(dayCol)).as("__lo"), max(col(dayCol)).as("__hi"))
      .select(k, explode(sequence(col("__lo"), col("__hi"))).as(dayCol))
      .select(k, col(dayCol), lit(null).cast(
        points.schema(valCol).dataType).as(valCol), lit(1).as("__tag"))
    val observed = points
      .select(k, col(dayCol), col(valCol), lit(0).as("__tag"))
    val w = Window.partitionBy(k)
      .orderBy(col(dayCol), col("__tag"))
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    observed.unionByName(spine)
      .withColumn(valCol, last(col(valCol), ignoreNulls = true).over(w))
      .filter(col("__tag") === 1)
      .select(k, col(dayCol), col(valCol))
  }

  /** Truncated exponentially-weighted moving average per key: the
    * classic EWMA recursion `y = α·x + (1−α)·y_prev`, restarted over
    * only the last `window` points of each row (y seeds at the
    * window's OLDEST point). Truncation is what makes the recursion
    * distributable AND cross-engine exact: the unbounded form needs
    * either per-key sequential state or pow-weight prefix sums whose
    * (1−α)^−rank factors overflow on long series, while a bounded
    * frame is one `collect_list` over a rows-window plus an in-plan
    * left-to-right `aggregate` fold — the identical float operation
    * sequence DuckDB's `list_reduce` replays, so results match
    * bit-for-bit (pick α with an exact binary representation). The
    * truncation error of the dropped tail is ≤ (1−α)^window · max|x|.
    *
    * One exchange on the key; the fold is codegen'd per row. Appends
    * `ewma` (double, unrounded).
    */
  def ewmaTruncated(
      points: DataFrame, keyCol: String, orderCol: String, valCol: String,
      alpha: Double, window: Int): DataFrame = {
    require(alpha > 0 && alpha <= 1, "ewmaTruncated: alpha in (0,1]")
    require(window >= 1, "ewmaTruncated: window >= 1")
    val w = Window.partitionBy(col(keyCol)).orderBy(col(orderCol))
      .rowsBetween(-(window - 1), Window.currentRow)
    points
      .withColumn("__arr",
        collect_list(col(valCol).cast("double")).over(w))
      .withColumn("ewma", expr(
        s"aggregate(slice(__arr, 2, size(__arr) - 1), __arr[0], " +
          s"(acc, x) -> CAST($alpha AS DOUBLE) * x + " +
          s"CAST(${1 - alpha} AS DOUBLE) * acc)"))
      .drop("__arr")
  }
}
