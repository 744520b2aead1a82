package graft.streaming

import java.time.Instant

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter

import graft.sources.StageSink

/** The reference's per-scrape cadence as a stream: each batch of
  * records lands as its own timestamped stage snapshot
  * (votervoice/__main__.py:15-33 — one EXTRACT/TRANSFORMED/MATCHED
  * export per session run).
  *
  * `foreachBatch` is the honest Spark shape for this: the transform
  * runs with FULL batch-engine semantics per micro-batch (windows,
  * broadcast joins, fuzzy linkage — operators that append-mode
  * streaming sinks can't express), and the sink below it stays a plain
  * distributed write. Batch folders carry the micro-batch id, so a
  * RETRIED batch collides with its own earlier write and fails loudly
  * (StageSink writes with mode("error")) instead of silently
  * double-exporting — at-least-once becomes fail-loud-once.
  *
  * The clock is injectable (same reason StageSink's is): deterministic
  * tests and replays.
  */
object StreamStage {

  /** Per-micro-batch transform + timestamped snapshot export. Returns
    * the writer; callers pick the trigger and start. Empty batches
    * export nothing (no empty snapshot folders at idle). */
  def snapshotWriter(
      stream: DataFrame,
      transform: DataFrame => DataFrame,
      baseDir: String, stage: String, name: String,
      format: String = "parquet",
      clock: () => Instant = () => Instant.now()): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        val out = transform(batch)
        if (!out.isEmpty) {
          StageSink.save(out, baseDir, stage, name, clock(),
            additionalInfo = Seq(f"b$batchId%05d"), format = format)
        }
        ()
      }
}
