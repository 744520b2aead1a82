package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

import graft.functions.TimeFunctions.tsMillis

/** Structured Streaming twins of the batch event operators.
  *
  * Sessionization carries per-user state through
  * `flatMapGroupsWithState` with an event-time timeout: a session
  * closes when the watermark passes its end + gap (no more late events
  * can extend it). This is the standard distributed streaming-session
  * design — state is partitioned by key, sized O(active users), and
  * the watermark bounds it.
  */
object StreamSessionize {

  case class Event(user_id: Long, ts: Timestamp, value: Double)

  case class SessionState(
      startMs: Long, endMs: Long, n: Long, sum: Double)

  case class ClosedSession(
      user_id: Long, start_ms: Long, end_ms: Long,
      n_events: Long, sum_value: Double)

  /** Gap-based streaming sessionization.
    *
    * @param events    streaming Dataset (must be watermarked upstream
    *                  on `ts` — see [[sessionize]])
    * @param gapMillis session gap
    */
  def sessionUpdates(
      events: Dataset[Event], gapMillis: Long)(
      implicit spark: SparkSession): Dataset[ClosedSession] = {
    import spark.implicits._
    events
      .groupByKey(_.user_id)
      .flatMapGroupsWithState[SessionState, ClosedSession](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (userId: Long, batch: Iterator[Event], state: GroupState[SessionState]) =>
          if (state.hasTimedOut) {
            // watermark passed session end + gap: emit and clear
            val s = state.get
            state.remove()
            Iterator.single(
              ClosedSession(userId, s.startMs, s.endMs, s.n, s.sum))
          } else {
            val sorted = batch.toSeq.sortBy(_.ts.getTime)
            var cur = state.getOption
            val closed = Seq.newBuilder[ClosedSession]
            sorted.foreach { e =>
              val ms = e.ts.getTime
              cur match {
                case Some(s) if ms - s.endMs <= gapMillis =>
                  cur = Some(SessionState(
                    s.startMs, math.max(s.endMs, ms), s.n + 1, s.sum + e.value))
                case Some(s) =>
                  closed += ClosedSession(userId, s.startMs, s.endMs, s.n, s.sum)
                  cur = Some(SessionState(ms, ms, 1L, e.value))
                case None =>
                  cur = Some(SessionState(ms, ms, 1L, e.value))
              }
            }
            cur.foreach { s =>
              state.update(s)
              state.setTimeoutTimestamp(s.endMs + gapMillis)
            }
            closed.result().iterator
          }
      }
  }

  /** Full pipeline from an untyped streaming DataFrame with
    * (user_id, ts, value): watermark → typed → stateful sessionize. */
  def sessionize(
      events: DataFrame, gapMillis: Long, watermarkDelay: String)(
      implicit spark: SparkSession): Dataset[ClosedSession] = {
    import spark.implicits._
    val typed = events
      .select(col("user_id").cast("long"), col("ts").cast("timestamp"),
        col("value").cast("double"))
      .withWatermark("ts", watermarkDelay)
      .as[Event]
    sessionUpdates(typed, gapMillis)
  }

  /** Streaming exact dedup: first occurrence per content hash wins;
    * state is bounded by the watermark (a duplicate arriving later than
    * the delay is passed through — the standard streaming-dedup
    * contract of dropDuplicatesWithinWatermark). */
  def streamingDedup(
      docs: DataFrame, tsCol: String, contentCol: String,
      watermarkDelay: String): DataFrame =
    docs
      .withWatermark(tsCol, watermarkDelay)
      .withColumn("content_hash", md5(col(contentCol)))
      .dropDuplicatesWithinWatermark("content_hash")

  /** Native session-window streaming aggregation — q116's streaming
    * form: `session_window(ts, gap)` under a watermark merges a user's
    * events into dynamic sessions inside the aggregation itself (no
    * flatMapGroupsWithState handwriting); append mode emits a session
    * once the watermark passes its end + gap. [[sessionUpdates]] stays
    * the richer path (custom per-session state beyond aggregates);
    * this is the declarative one — same boundary-inclusive semantics
    * as the batch q116 (pinned there in OperatorsSpec). */
  def sessionWindowAgg(
      events: DataFrame, gap: String, watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(col("user_id"), session_window(col("ts"), gap))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(col("user_id"),
        tsMillis(col("session_window.start")).as("start_ms"),
        tsMillis(col("session_window.end")).as("end_ms"),
        col("n_events"), col("sum_value"))

  /** Tumbling event-time window aggregation with watermark — append
    * mode emits a window once the watermark passes its end. */
  def tumblingAgg(
      events: DataFrame, windowDuration: String,
      watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDuration), col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(
        tsMillis(col("window.start")).as("window_start_ms"),
        col("event_type"), col("n_events"), col("sum_value"))

  /** Sliding (hopping) window aggregation — q91's streaming form: each
    * event contributes to windowDuration/slideDuration overlapping
    * windows via the same in-plan `window()` explode (no join, no
    * extra state beyond one aggregate row per open window); append
    * mode emits a window once the watermark passes its end, exactly
    * like [[tumblingAgg]]. */
  def slidingAgg(
      events: DataFrame, windowDuration: String, slideDuration: String,
      watermarkDelay: String): DataFrame =
    events
      .withWatermark("ts", watermarkDelay)
      .groupBy(window(col("ts"), windowDuration, slideDuration),
        col("event_type"))
      .agg(count(lit(1)).as("n_events"),
        round(sum(col("value")), 4).as("sum_value"))
      .select(
        tsMillis(col("window.start")).as("window_start_ms"),
        col("event_type"), col("n_events"), col("sum_value"))
}
