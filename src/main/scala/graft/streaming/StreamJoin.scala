package graft.streaming

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Stream-stream interval joins — the streaming twin of the batch
  * event joins (q54 as-of, q55 range): correlate two live event
  * streams within a time band, e.g. "attach the views that preceded
  * each purchase by at most an hour".
  *
  * Spark-first shape: a plain equi-join on the key plus an interval
  * condition on the two event times, with BOTH sides watermarked.
  * Structured Streaming derives the state retention from the interval
  * bound + watermark delay and evicts buffered rows as the watermark
  * advances — state is bounded by (key cardinality × window), never by
  * stream length. Without the interval condition the state would grow
  * forever; this operator makes the band mandatory.
  *
  * At scale the join is a stateful hash exchange on the key, exactly
  * like the batch banded join — skewed keys degrade one state
  * partition and call for the same pre-salting as q55.
  */
object StreamJoin {

  /** Inner-joins `left` and `right` on `keyCol`, keeping pairs where
    * the right event time lies in [left time − windowMs, left time].
    * Column names on the two sides must be disjoint apart from
    * `keyCol` (prefix the right side before calling).
    *
    * The band is written as raw timestamp arithmetic (NOT through an
    * epoch-millis projection): Structured Streaming's state-cleanup
    * analysis must see the range constraint directly on the two
    * watermarked event-time attributes to derive eviction bounds — a
    * condition on derived columns would join correctly but keep state
    * forever.
    *
    * @param leftTs  event-time column on the left stream (watermarked
    *                by the caller)
    * @param rightTs event-time column on the right stream (ditto)
    */
  def withinWindow(
      left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: Column, rightTs: Column, windowMs: Long): DataFrame = {
    val band = expr(s"INTERVAL $windowMs MILLISECONDS")
    left.join(right,
      left(keyCol) === right(keyCol) &&
        rightTs <= leftTs && rightTs >= leftTs - band)
      .drop(right(keyCol))
  }

  /** [[withinWindow]] as a LEFT OUTER stream-stream join: every left
    * row eventually emits — matched pairs as they meet, unmatched left
    * rows with null right columns once the watermark passes their
    * band (only then can "no match" be decided; outer results are
    * inherently watermark-delayed, the documented Structured
    * Streaming semantic). Same bounded state as the inner form.
    */
  def withinWindowLeftOuter(
      left: DataFrame, right: DataFrame, keyCol: String,
      leftTs: Column, rightTs: Column, windowMs: Long): DataFrame = {
    val band = expr(s"INTERVAL $windowMs MILLISECONDS")
    left.join(right,
      left(keyCol) === right(keyCol) &&
        rightTs <= leftTs && rightTs >= leftTs - band,
      "leftOuter")
      .drop(right(keyCol))
  }
}
