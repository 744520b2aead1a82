package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming UniMax sampling: the FROZEN per-source epoch rates from a
  * batch waterfilling run ([[graft.operators.Corpus.unimaxRates]] —
  * a #sources-sized artifact) applied to a live intake. Rates ride
  * into the plan as a map literal, the per-doc uniform is the same
  * md5-seeded construction as batch [[graft.operators.Corpus
  * .unimaxMix]], so sampling is a STATELESS projection + explode —
  * no state store, no broadcast rebuild per micro-batch, append-safe,
  * and decision-for-decision identical to the batch mix on the same
  * rows (StreamingSpec pins the equality). Sources the allocation
  * never saw sample at rate 0 — an unplanned source contributes
  * NOTHING rather than unbudgeted tokens (surface it via
  * [[intakeMeter]]'s n_in vs n_sampled gap).
  *
  * The allocation itself stays a BATCH planning step by design:
  * waterfilling needs global per-source totals, which a stream only
  * ever has a prefix of — recompute it on a cadence and restart the
  * sampler with fresh rates (the same freeze-and-refresh contract as
  * the ANN index and the DSIR model).
  */
object StreamUnimax {

  private def uniform(idCol: String, seed: String) =
    (conv(substring(md5(concat(col(idCol).cast("string"), lit(seed))),
      1, 8), 16, 10).cast("long") + lit(0.5)) / lit(4294967296.0)

  /** (everything in `stream`, copy) — each doc emitted
    * floor(rate_s) times plus one more with probability frac(rate_s),
    * exactly the batch arithmetic. Unknown sources drop (rate 0). */
  def sampled(stream: DataFrame, idCol: String, sourceCol: String,
      rates: Map[String, Double], seed: String = ""): DataFrame = {
    val rate = coalesce(
      element_at(typedlit(rates), col(sourceCol)), lit(0.0))
    val u = uniform(idCol, seed)
    val copies = (floor(rate).cast("int") +
      when(u < rate - floor(rate), 1).otherwise(0))
    val idx = when(copies > 0, sequence(lit(0), copies - lit(1)))
      .otherwise(array().cast("array<int>"))
    stream.withColumn("copy", explode(idx))
  }

  /** Windowed intake meter per (window, source): docs seen, docs
    * emitted after sampling, and the realized rate — the live check
    * that the intake mix still matches the plan (a drifting source
    * shows up as realized ≠ planned). One bounded state row per open
    * (window, source). */
  def intakeMeter(stream: DataFrame, tsCol: String, idCol: String,
      sourceCol: String, rates: Map[String, Double],
      windowLen: String, watermark: String,
      seed: String = ""): DataFrame = {
    val rate = coalesce(
      element_at(typedlit(rates), col(sourceCol)), lit(0.0))
    val u = uniform(idCol, seed)
    val copies = (floor(rate).cast("int") +
      when(u < rate - floor(rate), 1).otherwise(0))
    stream
      .withColumn("__copies", copies)
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col(sourceCol))
      .agg(count(lit(1)).as("n_in"),
        sum(col("__copies").cast("long")).as("n_sampled"),
        round(avg(col("__copies").cast("double")), 4)
          .as("realized_rate"))
  }
}
