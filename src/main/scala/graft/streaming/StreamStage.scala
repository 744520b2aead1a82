package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

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
  * Exactly-once discipline: snapshot folders are keyed on the
  * micro-batch id ALONE (`StageSink.saveBatch`), never on a wall
  * clock. foreachBatch is at-least-once — a failed batch is retried
  * with the SAME id — so a retry recomputes the same folder path and
  * `mode("error")` collides with any partial earlier write, failing
  * loudly instead of silently exporting the batch twice. (A
  * wall-clock stamp in the folder name would give every retry a fresh
  * path and turn replays into silent duplicates.)
  */
object StreamStage {

  /** Per-micro-batch transform + batch-keyed snapshot export. Returns
    * the writer; callers pick the trigger and start. Empty batches
    * export nothing (no empty snapshot folders at idle). The
    * transformed frame is persisted across the emptiness probe and the
    * write so the per-batch plan (fuzzy linkage, joins) runs once, not
    * twice. */
  def snapshotWriter(
      stream: DataFrame,
      transform: DataFrame => DataFrame,
      baseDir: String, stage: String, name: String,
      format: String = "parquet"): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val out = transform(batch).persist()
        try {
          if (!out.isEmpty) {
            StageSink.saveBatch(out, baseDir, stage, name, batchId,
              format = format)
          }
        } finally {
          out.unpersist()
          ()
        }
      }
}
