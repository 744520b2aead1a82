package graft.streaming

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

import graft.operators.Corpus

/** q151's chunk-grain incremental diff as a STREAM: the old snapshot's
  * chunk multisets sit in a static frame, and every re-crawled
  * document flowing through the stream yields one diff row — (doc,
  * n_old, n_new, n_kept) — the moment it arrives, so the incremental
  * pipeline knows immediately how much of the doc's embedding/dedup
  * state carries over (n_kept) and how much to re-run (n_new −
  * n_kept).
  *
  * Streaming shape: each input ROW is a whole document, so its chunk
  * multiset is computed IN-PLAN per row (the native `cdc_cuts` kernel
  * + an md5 transform over the cut spans) — no streaming aggregation
  * anywhere, which keeps the query a plain append-mode stream-static
  * LEFT join (the old side broadcast or hash, Spark's choice). The
  * per-row kept count folds over the distinct chunk hashes with a
  * map lookup into the old multiset: O(chunks²) per doc on arrays of
  * ~len/modulus entries — negligible beside the md5s themselves.
  *
  * Removed docs (in the snapshot, never re-crawled) don't produce
  * rows — a stream can't observe absence; sweep those batch-side with
  * [[Corpus.chunkDiff]] when the crawl window closes.
  */
object StreamChunkDiff {

  /** Static side: per-doc chunk-hash multiset of the OLD snapshot as
    * (id, __old map<md5,count>, n_old). Compute once, reuse across
    * batches. */
  def snapshotCounts(docs: DataFrame, idCol: String, textCol: String,
      window: Int = 4, modulus: Int = 64): DataFrame =
    Corpus.cdcChunks(docs, idCol, textCol, window, modulus)
      .groupBy(col(idCol), col("chunk_md5"))
      .agg(count(lit(1)).as("__c"))
      .groupBy(col(idCol))
      .agg(
        map_from_entries(collect_list(struct(col("chunk_md5"), col("__c"))))
          .as("__old"),
        sum(col("__c")).as("n_old"))

  /** Append-mode diff: one output row per streamed doc. `oldCounts`
    * is [[snapshotCounts]]' result (or any frame with the same
    * columns). Also works on a batch frame — the plan is identical.
    */
  def diffStream(stream: DataFrame, oldCounts: DataFrame,
      idCol: String, textCol: String,
      window: Int = 4, modulus: Int = 64): DataFrame = {
    val cuts = call_function("cdc_cuts", col(textCol),
      lit(window), lit(modulus))
    stream
      .select(col(idCol), col(textCol), cuts.as("__cuts"))
      // null text folds to zero chunks like empty text — without the
      // guard, size(null __hs) is -1 under non-ANSI semantics
      .withColumn("__hs",
        when(length(col(textCol)).isNull || length(col(textCol)) === 0,
          array().cast("array<string>"))
          .otherwise(expr(
            s"""transform(sequence(1, size(__cuts) - 1), k ->
               |  md5(cast(substring($textCol,
               |    element_at(__cuts, k) + 1,
               |    element_at(__cuts, k + 1) - element_at(__cuts, k))
               |  as binary)))""".stripMargin)))
      .join(oldCounts.select(col(idCol), col("__old"), col("n_old")),
        Seq(idCol), "left")
      .select(col(idCol),
        coalesce(col("n_old"), lit(0L)).as("n_old"),
        size(col("__hs")).cast("long").as("n_new"),
        expr("""aggregate(array_distinct(__hs), 0L, (acc, h) ->
               |  acc + least(
               |    cast(size(filter(__hs, x -> x = h)) as bigint),
               |    coalesce(element_at(__old, h), 0L)))""".stripMargin)
          .as("n_kept"))
  }
}
