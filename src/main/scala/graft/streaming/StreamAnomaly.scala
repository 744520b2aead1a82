package graft.streaming

import java.sql.Timestamp

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.{GroupState, GroupStateTimeout, OutputMode}

/** Streaming twin of the batch rolling z-score (q122,
  * Stats.rollingZscore): flag each metric event whose value deviates
  * more than `z` sample standard deviations from the mean of that
  * key's `lookback` PRECEDING events — evaluated continuously, as
  * events arrive.
  *
  * State is a fixed-size ring of the last `lookback` integer-scaled
  * values per key: O(keys × lookback × 8 bytes), independent of
  * stream length — the property that makes per-metric anomaly
  * monitoring run forever. Idle keys evict when the watermark passes
  * their last event + `idleMs` (EventTimeTimeout), so dead keys don't
  * accumulate either.
  *
  * The flag cut is the SAME cross-multiplied integer arithmetic as
  * the batch form — (m·x − s1)²·(m−1) > z²·m·(m·s2 − s1²) — so when
  * events arrive in event-time order (the monitoring deployment's
  * normal case) the streaming flags are IDENTICAL to the batch
  * query's, pinned in StreamingSpec across multi-batch feeds. Within
  * a micro-batch events sort by (ts, event_id); an event arriving
  * LATER than stream order is evaluated against the history as of
  * its arrival — the standard monitoring semantic (alert on what was
  * known, don't rewrite history).
  */
object StreamAnomaly {

  case class MetricEvent(key: Long, ts: Timestamp, event_id: Long, x: Long)

  case class RingState(vals: Seq[Long])

  case class Anomaly(key: Long, event_id: Long, ms: Long, x: Long,
      n_prior: Int, sum_prior: Long, zscore: Option[Double])

  /** Per-key stateful anomaly flags over a typed stream (watermark
    * applied upstream — see [[anomalies]]). */
  def anomalyUpdates(
      events: Dataset[MetricEvent], lookback: Int, z: Int,
      minPrior: Int, idleMs: Long)(
      implicit spark: SparkSession): Dataset[Anomaly] = {
    import spark.implicits._
    require(lookback >= 2 && minPrior >= 2 && z > 0,
      "anomalyUpdates: need lookback >= 2, minPrior >= 2, z > 0")
    events
      .groupByKey(_.key)
      .flatMapGroupsWithState[RingState, Anomaly](
        OutputMode.Append, GroupStateTimeout.EventTimeTimeout) {
        (key: Long, batch: Iterator[MetricEvent], state: GroupState[RingState]) =>
          if (state.hasTimedOut) {
            state.remove() // idle key: watermark passed last + idleMs
            Iterator.empty
          } else {
            var ring = state.getOption.map(_.vals.toVector)
              .getOrElse(Vector.empty[Long])
            var lastMs = 0L
            val out = Seq.newBuilder[Anomaly]
            batch.toSeq.sortBy(e => (e.ts.getTime, e.event_id)).foreach { e =>
              val m = ring.size
              if (m >= minPrior) {
                val s1 = ring.sum
                val s2 = ring.iterator.map(v => v * v).sum
                val dev = m.toLong * e.x - s1
                val varNum = m.toLong * s2 - s1 * s1
                if (dev * dev * (m - 1) > z.toLong * z * m * varNum) {
                  // HALF_UP at 4dp — bit-matches the batch form's
                  // round(zscore, 4) (math.rint would round half-even)
                  val zs = if (varNum > 0)
                    Some(BigDecimal(dev.toDouble / m /
                      math.sqrt(varNum.toDouble / (m.toLong * (m - 1))))
                      .setScale(4, BigDecimal.RoundingMode.HALF_UP)
                      .toDouble)
                  else None
                  out += Anomaly(key, e.event_id, e.ts.getTime, e.x,
                    m, s1, zs)
                }
              }
              ring = (ring :+ e.x).takeRight(lookback)
              lastMs = math.max(lastMs, e.ts.getTime)
            }
            state.update(RingState(ring))
            state.setTimeoutTimestamp(lastMs + idleMs)
            out.result().iterator
          }
      }
  }

  /** Full pipeline from an untyped streaming DataFrame with
    * (key, ts, event_id, x): watermark → typed → stateful flags. */
  def anomalies(
      events: DataFrame, lookback: Int, z: Int, minPrior: Int,
      idleMs: Long, watermarkDelay: String)(
      implicit spark: SparkSession): Dataset[Anomaly] = {
    import spark.implicits._
    val typed = events
      .select(col("key").cast("long"), col("ts").cast("timestamp"),
        col("event_id").cast("long"), col("x").cast("long"))
      .withWatermark("ts", watermarkDelay)
      .as[MetricEvent]
    anomalyUpdates(typed, lookback, z, minPrior, idleMs)
  }
}
