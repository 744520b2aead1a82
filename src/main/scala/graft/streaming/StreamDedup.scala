package graft.streaming

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.streaming.DataStreamWriter
import org.apache.spark.storage.StorageLevel

import graft.operators.Dedup
import graft.sources.StageSink

/** Streaming incremental near-dedup: each micro-batch dedups against
  * the corpus accumulated by every batch before it, via the on-disk
  * [[Dedup.MinhashIndex]] — the streaming face of the same
  * index-probe machinery batch ingest uses.
  *
  * `dropDuplicatesWithinWatermark` (StreamSessionize.streamingDedup)
  * covers EXACT dedup with bounded state; near-dedup state (shingle
  * sets + band keys for every retained doc) cannot live in a streaming
  * state store at corpus scale, so it lives where the batch path keeps
  * it: parquet. foreachBatch gives each micro-batch full batch-engine
  * semantics for the probe joins.
  *
  * Index layout: `<indexDir>/delta_b<batchId>/entries` — one delta
  * folder per micro-batch, all loaded as ONE parquet relation (a
  * multi-path scan, not an N-way union) for the next batch's probe. A
  * pre-seeded corpus index can be placed at `<indexDir>/seed/entries`
  * ([[Dedup.MinhashIndex.save]] into `<indexDir>/seed`).
  *
  * Replay discipline (foreachBatch is at-least-once): both outputs are
  * keyed on the batch id and overwritten on retry — survivors via
  * [[StageSink.saveBatch]], the index delta via its deterministic
  * folder — and a retry EXCLUDES its own delta folder from the index
  * it probes, so a batch never dedups against its own partial state.
  * Long-running streams should compact delta folders periodically
  * (load the index, save it as a new seed, clear the deltas) to bound
  * file counts — the scan stays correct either way.
  */
object StreamDedup {

  /** foreachBatch writer: near-dedup each micro-batch against the
    * accumulated index, export survivors as a batch-keyed snapshot
    * under `<baseDir>/<stage>/<name>_b<batchId>`, append the
    * survivors' delta to the index. Callers pick the trigger and
    * start. */
  def incrementalWriter(
      stream: DataFrame, idCol: String, textCol: String,
      baseDir: String, stage: String, name: String, indexDir: String,
      shingleN: Int = 3, numHashes: Int = 32, bands: Int = 8,
      threshold: Double = 0.5): DataStreamWriter[Row] = {
    val exportBatch: (DataFrame, Long) => Unit = { (batch, batchId) =>
      if (batch.take(1).nonEmpty) {
        val spark = batch.sparkSession
        val own = f"delta_b$batchId%010d"
        val priorEntries = Option(new java.io.File(indexDir).listFiles())
          .getOrElse(Array.empty)
          .filter(d => d.isDirectory && d.getName != own)
          .map(d => s"${d.getPath}/entries")
          .filter(p => new java.io.File(p).exists())
        // the batch feeds the probe AND the within-batch dedup AND the
        // delta build — pin it once (DISK_ONLY: correctness cache, a
        // batch can be arbitrarily large)
        val pinned = batch.persist(StorageLevel.DISK_ONLY)
        try {
          val fresh =
            if (priorEntries.isEmpty) pinned
            else {
              // one read per delta root: the entries are PARTITIONED by
              // shard, and partition discovery rejects multiple
              // partitioned roots in a single read; the probe's shard
              // filter pushes down into every scan of the union
              val index = Dedup.MinhashIndex(
                priorEntries.toIndexedSeq.map(spark.read.parquet(_))
                  .reduce(_ unionByName _))
              val hits = Dedup.incrementalNearDup(pinned, index, idCol,
                textCol, shingleN, numHashes, bands, threshold)
                .select(org.apache.spark.sql.functions.col("b_id").as(idCol))
              pinned.join(hits, Seq(idCol), "left_anti")
            }
          val survivors = Dedup.dropNearDuplicates(fresh, idCol, textCol,
            shingleN, numHashes, bands, threshold)
            .persist(StorageLevel.DISK_ONLY)
          try {
            StageSink.saveBatch(survivors, baseDir, stage, name, batchId)
            Dedup.buildMinhashIndex(survivors, idCol, textCol,
              shingleN, numHashes, bands)
              .save(s"$indexDir/$own", mode = "overwrite")
          } finally survivors.unpersist()
        } finally pinned.unpersist()
      }
    }
    stream.writeStream
      .outputMode("append")
      .foreachBatch(exportBatch)
  }
}
