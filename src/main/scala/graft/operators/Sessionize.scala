package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

import graft.functions.TimeFunctions.tsMillis

/** Gap-based sessionization (batch form).
  *
  * Classic lag + cumulative-sum over a per-key ordered window: a row
  * starts a new session when its gap to the previous row exceeds
  * `gapMillis`. One shuffle on the key (the window partition); the
  * cumulative sum is computed within partitions — the canonical
  * distributed sessionization plan.
  *
  * The streaming twin lives in graft.streaming.StreamSessionize
  * (flatMapGroupsWithState with an event-time timeout).
  */
object Sessionize {

  /** Adds `session_id` (1-based long, per key) to each event row.
    *
    * @param keyCol   partition key (e.g. user_id)
    * @param tsCol    event-time column (timestamp)
    * @param tieBreak secondary ordering for equal timestamps
    */
  def apply(
      events: DataFrame, keyCol: String, tsCol: String,
      gapMillis: Long, tieBreak: String): DataFrame = {
    val ms = tsMillis(col(tsCol))
    val w = Window.partitionBy(col(keyCol)).orderBy(ms, col(tieBreak))
    val prev = lag(ms, 1).over(w)
    val isNew = when(prev.isNull || ms - prev > gapMillis, 1L).otherwise(0L)
    events
      .withColumn("session_id",
        sum(isNew).over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow)))
  }

  /** Per-session rollup: count, bounds (epoch ms), value sum. */
  def sessionStats(
      events: DataFrame, keyCol: String, tsCol: String,
      gapMillis: Long, tieBreak: String, valueCol: String): DataFrame =
    apply(events, keyCol, tsCol, gapMillis, tieBreak)
      .groupBy(col(keyCol), col("session_id"))
      .agg(
        count(lit(1)).as("n_events"),
        min(tsMillis(col(tsCol))).as("start_ms"),
        max(tsMillis(col(tsCol))).as("end_ms"),
        round(sum(col(valueCol)), 4).as("sum_value"))
}
