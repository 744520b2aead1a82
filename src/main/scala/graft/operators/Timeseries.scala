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
}
