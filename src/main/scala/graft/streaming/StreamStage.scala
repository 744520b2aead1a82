package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.storage.StorageLevel

import graft.sources.StageSink

/** The reference's per-scrape cadence as a stream: each batch of
  * records lands as its own stage snapshot
  * (votervoice/__main__.py:15-33 — one EXTRACT/TRANSFORMED/MATCHED
  * export per session run).
  *
  * `foreachBatch` is the honest Spark shape for this: the transform
  * runs with FULL batch-engine semantics per micro-batch (windows,
  * broadcast joins, fuzzy linkage — operators that append-mode
  * streaming sinks can't express), and the sink below it stays a plain
  * distributed write.
  *
  * Replay discipline: snapshot folders are keyed on the micro-batch
  * id ALONE (`StageSink.saveBatch`), never on a wall clock.
  * foreachBatch is at-least-once — a batch whose write completed but
  * whose checkpoint commit was lost is retried with the SAME id — so
  * the retry recomputes the same folder path and the overwrite mode
  * inside `saveBatch` makes the replay idempotent (same bytes, same
  * folder) instead of either double-exporting (a wall-clock stamp
  * would fork a fresh folder per retry) or permanently wedging the
  * stream (`mode("error")` would throw on every restart once a
  * partial folder exists).
  */
object StreamStage {

  /** Per-micro-batch transform + batch-keyed snapshot export. Returns
    * the writer; callers pick the trigger and start. Empty batches
    * export nothing (no empty snapshot folders at idle). The
    * transformed frame is persisted across the emptiness probe and the
    * write so the per-batch plan (fuzzy linkage, joins) runs once, not
    * twice — DISK_ONLY, because a batch can be arbitrarily large and
    * this cache exists only to avoid recomputation, not to be fast. */
  def snapshotWriter(
      stream: DataFrame,
      transform: DataFrame => DataFrame,
      baseDir: String, stage: String, name: String,
      format: String = "parquet"): DataStreamWriter[Row] = {
    val exportBatch: (DataFrame, Long) => Unit = { (batch, batchId) =>
      val out = transform(batch).persist(StorageLevel.DISK_ONLY)
      try {
        if (out.take(1).nonEmpty) {
          StageSink.saveBatch(out, baseDir, stage, name, batchId,
            format = format)
        }
      } finally out.unpersist()
    }
    stream.writeStream
      .outputMode("append")
      .foreachBatch(exportBatch)
  }
}
