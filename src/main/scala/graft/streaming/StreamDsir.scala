package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Streaming DSIR importance scoring: the model-as-literal form of
  * batch [[graft.operators.Corpus.dsirWeights]] applied to a live
  * intake. The bucketed log-ratio array
  * ([[graft.operators.Corpus.dsirModelArray]]) rides into the
  * codegen'd `dsir_score` kernel by closure, so per-document scoring
  * is a STATELESS projection — no state store, no broadcast rebuild
  * per micro-batch, no watermark needed for the score itself. The
  * optional windowed aggregate (mean score + admitted count above a
  * threshold) is the running "is this intake drifting off-domain"
  * meter, with one bounded state row per open window — the
  * StreamTokenCount discipline.
  */
object StreamDsir {

  /** Per-document scores: (everything in `stream`, dsir_score) —
    * pure projection, append-safe under any output mode. */
  def scored(stream: DataFrame, textCol: String,
      lr: Array[Double]): DataFrame =
    stream.withColumn("dsir_score",
      call_function("dsir_score", col(textCol), typedlit(lr.toSeq)))

  /** Windowed intake meter: per window, docs seen, mean score, and
    * how many clear `admitThreshold` — the number an admission
    * controller watches. State = one row per open window. */
  def intakeMeter(stream: DataFrame, tsCol: String, textCol: String,
      lr: Array[Double], windowLen: String, watermark: String,
      admitThreshold: Double): DataFrame =
    scored(stream, textCol, lr)
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen))
      .agg(count(lit(1)).as("n_docs"),
        avg(col("dsir_score")).as("mean_score"),
        sum(when(col("dsir_score") >= admitThreshold, 1L)
          .otherwise(0L)).as("n_admitted"))
}
