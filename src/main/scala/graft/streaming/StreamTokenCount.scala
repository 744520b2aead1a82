package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Bpe

/** Streaming exact-tokenizer accounting: windowed word/token totals
  * over a text stream under a trained BPE merge list — the running
  * "tokens ingested per window" meter a live training-data intake
  * needs (the streaming face of q157's batch counts, and the number
  * token-budget admission control would watch).
  *
  * Scale/state shape: the encode is the same codegen'd `bpe_encode`
  * pure projection the batch path uses (merge table broadcast by
  * closure, per-thread memo — no per-row state); the ONLY streaming
  * state is one (window, n_words, n_tokens) row per open window —
  * bounded by the watermark horizon regardless of stream volume,
  * the same discipline as tumblingAgg. Append mode emits each
  * window once, when the watermark closes it, so downstream totals
  * never double-count.
  */
object StreamTokenCount {

  /** Windowed (window, n_words, n_tokens) totals for a streaming
    * (ts, text) frame; words are the q154/q157 population
    * (lowercased [a-z]+ runs, 2..12 chars). */
  def tokenTotals(stream: DataFrame, tsCol: String, textCol: String,
      merges: Seq[String], windowLen: String,
      watermark: String): DataFrame =
    stream
      .withWatermark(tsCol, watermark)
      .select(col(tsCol).as("__ts"), explode(regexp_extract_all(
        lower(col(textCol)), lit("[a-z]+"), lit(0))).as("word"))
      .filter(length(col("word")).between(2, 12))
      .select(col("__ts"),
        size(Bpe.encodeCol(col("word"), merges)).cast("long").as("__n"))
      .groupBy(window(col("__ts"), windowLen))
      .agg(count(lit(1)).as("n_words"), sum(col("__n")).as("n_tokens"))
}
