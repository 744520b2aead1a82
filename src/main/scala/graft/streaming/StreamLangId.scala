package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.{Classifier, LangId}

/** Streaming model-based language ID — q174's continuous twin: the
  * trained [[Classifier.MultiModel]] rides into the plan as literal
  * weights (native `pool_scores` reference object under
  * GraftExtensions), so per-document prediction WITH the
  * low-confidence stopword fallback is a STATELESS projection — no
  * state store, no broadcast rebuild per micro-batch, append-safe.
  * Identical expressions to the batch path, so streaming ≡ batch by
  * construction (StreamingSpec pins it row for row).
  *
  * The windowed language-mix meter is the intake-drift alarm a live
  * crawl watches (the CCNet shape: language routing before any
  * per-language stage): per (window, lang) doc counts and mean
  * confidence, one bounded state row per open (window, lang) — the
  * StreamTokenCount discipline.
  */
object StreamLangId {

  /** Per-document predictions: everything in `stream` + lang/conf/src
    * (src ∈ {model, fallback}) — pure projection. */
  def predicted(stream: DataFrame, textCol: String,
      model: Classifier.MultiModel, minConf: Double = 0.5): DataFrame =
    stream
      .withColumn("__p",
        LangId.predictWithFallback(col(textCol), model, minConf))
      .withColumn("lang", col("__p.lang"))
      .withColumn("conf", col("__p.conf"))
      .withColumn("src", col("__p.src"))
      .drop("__p")

  /** Windowed language mix: per (window, lang) — docs, mean model
    * confidence, fallback share. State = one row per open
    * (window, lang); idle windows close at the watermark. */
  def languageMix(stream: DataFrame, tsCol: String, textCol: String,
      model: Classifier.MultiModel, windowLen: String,
      watermark: String, minConf: Double = 0.5): DataFrame =
    predicted(stream, textCol, model, minConf)
      .withWatermark(tsCol, watermark)
      .groupBy(window(col(tsCol), windowLen), col("lang"))
      .agg(count(lit(1)).as("n_docs"),
        round(avg(col("conf")), 4).as("mean_conf"),
        sum(when(col("src") === "fallback", 1L).otherwise(0L))
          .as("n_fallback"))
}
