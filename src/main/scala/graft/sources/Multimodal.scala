package graft.sources

import org.apache.spark.sql.{DataFrame, Dataset, SparkSession}
import org.apache.spark.sql.functions._

/** Multimodal column plumbing: media as opaque `binary` columns with a
  * typed metadata struct, processed in partition-local batches.
  *
  * The Spark-side design is the real deliverable here — schema,
  * partition sizing, batch iteration, feature output shape. The codec
  * itself is STUBBED (`decodeStub`): this container has no image/audio
  * libraries, so the decode produces deterministic fake pixels from the
  * byte content. Swapping in a real codec changes ONE function and no
  * plan shape.
  *
  * Scale posture: media rows are large (MBs) — `mediaRepartition`
  * targets ~128 MB per partition by byte size, not row count, so
  * executors neither starve (1 huge row per task) nor OOM (thousands of
  * rows per task). Feature extraction is mapPartitions: one codec init
  * per partition, streaming through rows without materialising the
  * partition.
  */
object Multimodal {

  case class MediaMeta(
      kind: String, // image | audio | video
      width: Int, height: Int,
      sampleRate: Int, durationMs: Long)

  case class MediaRow(
      media_id: Long, bytes: Array[Byte], meta: MediaMeta)

  case class MediaFeatures(
      media_id: Long, kind: String, n_bytes: Long,
      features: Array[Float])

  /** Deterministic synthetic media table (stands in for a real binary
    * source; byte payload is a seeded pattern so tests are stable). */
  def syntheticMedia(spark: SparkSession, n: Int): Dataset[MediaRow] = {
    import spark.implicits._
    spark.range(n.toLong).map { i =>
      val kind = Seq("image", "audio", "video")((i % 3).toInt)
      val len = 256 + (i % 7).toInt * 128
      val bytes = Array.tabulate[Byte](len)(j => ((i * 31 + j) % 251).toByte)
      val meta = kind match {
        case "image" => MediaMeta(kind, 64 + (i % 4).toInt * 32, 64, 0, 0L)
        case "audio" => MediaMeta(kind, 0, 0, 16000, 1000L + i % 5000)
        case _       => MediaMeta(kind, 128, 128, 0, 2000L + i % 9000)
      }
      MediaRow(i, bytes, meta)
    }
  }

  /** STUB decode — a real implementation would invoke an image/audio
    * codec here. Deterministic fake: 8 float features from a rolling
    * byte hash. The signature (bytes, meta) => features is the real
    * contract. */
  def decodeStub(bytes: Array[Byte], meta: MediaMeta): Array[Float] = {
    val dim = 8
    val out = new Array[Float](dim)
    var acc = 17L
    var i = 0
    while (i < bytes.length) {
      acc = (acc * 31 + (bytes(i) & 0xFF)) % 4294967291L
      out(i % dim) += ((acc % 1000) / 1000.0f - 0.5f)
      i += 1
    }
    out
  }

  /** Repartition a media frame so each partition holds ~targetBytes of
    * payload (byte-weighted, not row-count) — the knob that keeps codec
    * tasks uniform at 100 TB.
    *
    * Payload size comes from METADATA, never a data pass (the previous
    * implementation ran `sum(length(bytes))` — a full second scan of
    * the binary payload): an explicit `totalBytesHint` if the caller
    * knows it, else the sum of input-file lengths from the filesystem
    * (zero jobs; compressed size, the right unit for IO-balanced
    * partitioning), else the optimizer's logical size estimate. */
  def mediaRepartition(
      df: DataFrame, bytesCol: String, targetBytes: Long,
      totalBytesHint: Option[Long] = None): DataFrame = {
    val total = totalBytesHint
      .orElse(inputFileBytes(df))
      .getOrElse(df.queryExecution.optimizedPlan.stats.sizeInBytes.toLong)
    val parts = math.max(1, (total / targetBytes).toInt)
    df.repartition(parts)
  }

  /** Sum of the frame's input-file sizes via filesystem metadata; None
    * when the frame isn't file-backed (e.g. an in-memory dataset). */
  private def inputFileBytes(df: DataFrame): Option[Long] = {
    val files = df.inputFiles
    if (files.isEmpty) None
    else {
      val hconf = df.sparkSession.sparkContext.hadoopConfiguration
      Some(files.map { f =>
        val p = new org.apache.hadoop.fs.Path(f)
        p.getFileSystem(hconf).getFileStatus(p).getLen
      }.sum)
    }
  }

  /** Batched feature extraction: mapPartitions so the (stub) codec is
    * initialised once per partition, and rows flow through in
    * `batchSize` groups — the record-batch shape a vectorised codec or
    * model forward-pass wants (one call per batch, not per row). */
  def extractFeatures(
      media: Dataset[MediaRow], batchSize: Int = 64)(
      implicit spark: SparkSession): Dataset[MediaFeatures] = {
    import spark.implicits._
    media.mapPartitions { rows =>
      // real impl: init codec/model once here
      rows.grouped(batchSize).flatMap { batch =>
        // real impl: one vectorised decode call over the whole batch
        batch.map { r =>
          MediaFeatures(r.media_id, r.meta.kind, r.bytes.length.toLong,
            decodeStub(r.bytes, r.meta))
        }
      }
    }
  }

  /** Resize plumbing for image rows: meta is updated for real (aspect
    * and target dims), the pixel transform itself is the STUB — a real
    * codec swap changes only `resizeBytesStub`. */
  def resizeBytesStub(bytes: Array[Byte], w: Int, h: Int): Array[Byte] = {
    // deterministic fake: sample bytes proportionally to the new area
    val n = math.max(16, math.min(bytes.length, w * h / 64))
    Array.tabulate[Byte](n)(i => bytes((i.toLong * bytes.length / n).toInt))
  }

  def resize(
      media: Dataset[MediaRow], targetW: Int, targetH: Int)(
      implicit spark: SparkSession): Dataset[MediaRow] = {
    import spark.implicits._
    media.map { r =>
      if (r.meta.kind != "image") r
      else r.copy(
        bytes = resizeBytesStub(r.bytes, targetW, targetH),
        meta = r.meta.copy(width = targetW, height = targetH))
    }
  }

  /** Frame sampling for video rows: emit every `stride`-th synthetic
    * frame index with its byte offset — the plumbing (explode shape)
    * for a real frame extractor. */
  def frameSample(
      media: Dataset[MediaRow], stride: Int)(
      implicit spark: SparkSession): DataFrame = {
    import spark.implicits._
    media.filter(_.meta.kind == "video")
      .flatMap { r =>
        val nFrames = math.max(1, (r.meta.durationMs / 1000L).toInt)
        (0 until nFrames by stride).map { f =>
          (r.media_id, f, f.toLong * 1000L, r.bytes.length.toLong)
        }
      }
      .toDF("media_id", "frame_idx", "offset_ms", "n_bytes")
  }
}
