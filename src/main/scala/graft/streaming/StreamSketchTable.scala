package graft.streaming

import org.apache.hadoop.fs.Path
import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.streaming.DataStreamWriter

/** Continuously-maintained DDSketch day table — q139's mergeable
  * quantile-sketch rollup kept up to date by a stream instead of
  * recomputed by a scan: each micro-batch's values fold into
  * per-day sketches (`dd_sketch_agg`), which merge LOSS-FREE into
  * the persisted day table (`dd_union_agg`) — so p50/p95/p99 over
  * any day range are answerable at any moment without rescanning
  * history, and the table stays a few KB per day (sketch size is
  * bounded by the data's dynamic range, not its volume).
  *
  * Replay discipline (StreamStage's contract): foreachBatch is
  * at-least-once, and a naive read-merge-overwrite would DOUBLE-COUNT
  * a replayed batch. The table is therefore kept as batchId-keyed
  * versions `dir/v=<batchId>`: version N is defined as (latest
  * version < N) ⊎ batch N — a retried batch recomputes from the same
  * predecessor and overwrites the same folder, byte-identically.
  * Reads take the latest version. Superseded versions are pruned to
  * `keepVersions` AFTER the new version lands (the immediate
  * predecessor always survives, which is exactly what a retry needs).
  *
  * Scale shape: the batch fold is one map-side-combined aggregate;
  * the merge unions day-grain tables (rows = days, not events), so
  * the per-batch cost is O(batch) + O(days) regardless of history.
  */
object StreamSketchTable {

  private def versions(spark: SparkSession, dir: String): Seq[(Long, Path)] = {
    val base = new Path(dir)
    val fs = base.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (!fs.exists(base)) Seq.empty
    else fs.listStatus(base).toSeq
      .filter(s => s.isDirectory && s.getPath.getName.startsWith("v="))
      .flatMap(s => s.getPath.getName.stripPrefix("v=").toLongOption
        .map(_ -> s.getPath))
      .sortBy(_._1)
  }

  /** Latest committed day table as (day, sk) — empty schema-correct
    * frame if nothing has landed yet. Quantiles read with
    * `dd_quantile(sk, q)`. */
  def read(spark: SparkSession, dir: String): DataFrame =
    versions(spark, dir).lastOption match {
      case Some((_, p)) => spark.read.parquet(p.toString)
      case None => spark.range(0)
        .select(col("id").cast("date").as("day"),
          lit(null).cast("binary").as("sk")).limit(0)
    }

  /** Fold one micro-batch into the day table (public so the replay
    * contract is testable directly). Empty batches still commit a
    * version (carrying the predecessor forward) so version ids stay
    * aligned with batch ids. */
  def mergeBatch(batch: DataFrame, batchId: Long, tsCol: String,
      valCol: String, alpha: Double, dir: String,
      keepVersions: Int = 2): Unit = {
    val spark = batch.sparkSession
    val bsk = batch.filter(col(tsCol).isNotNull)
      .groupBy(to_date(col(tsCol)).as("day"))
      .agg(expr(s"dd_sketch_agg($valCol, ${alpha}D)").as("sk"))
    val existing = versions(spark, dir)
    // Replay of the CURRENT batch id is legal (foreachBatch re-runs
    // the last uncommitted batch after a restart; the overwrite below
    // is what makes that idempotent). A version NEWER than batchId
    // means the streaming checkpoint was reset while the table dir
    // was kept: merging would fork history into low-numbered versions
    // while read() keeps serving the stale high-water version. Fail
    // loudly — the table dir must be cleared together with the
    // checkpoint.
    existing.lastOption.filter(_._1 > batchId).foreach { case (v, _) =>
      throw new IllegalStateException(
        s"StreamSketchTable: table at $dir already has version v=$v > " +
          s"incoming batchId=$batchId — the streaming checkpoint was " +
          "reset while the table dir was kept. Clear the table dir " +
          "together with the checkpoint (they version in lockstep).")
    }
    val prev = existing.takeWhile(_._1 < batchId).lastOption
    val merged = prev match {
      case Some((_, p)) =>
        spark.read.parquet(p.toString).union(bsk)
          .groupBy(col("day")).agg(expr("dd_union_agg(sk)").as("sk"))
      case None => bsk
    }
    merged.write.mode("overwrite").parquet(s"$dir/v=$batchId")
    // prune AFTER the new version is durable; best-effort
    val vs = versions(spark, dir)
    if (vs.size > keepVersions) {
      val fs = new Path(dir)
        .getFileSystem(spark.sparkContext.hadoopConfiguration)
      vs.dropRight(keepVersions).foreach { case (_, p) =>
        try fs.delete(p, true)
        catch { case _: java.io.IOException => () }
      }
    }
  }

  /** The continuously-maintained writer; callers pick the trigger and
    * start. `alpha` is the sketch's relative-error bound. */
  def writer(stream: DataFrame, tsCol: String, valCol: String,
      alpha: Double, dir: String,
      keepVersions: Int = 2): DataStreamWriter[Row] =
    stream.writeStream
      .outputMode("append")
      .foreachBatch { (batch: DataFrame, batchId: Long) =>
        mergeBatch(batch, batchId, tsCol, valCol, alpha, dir, keepVersions)
      }
}
