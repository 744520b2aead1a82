package graft

import java.nio.file.Files
import java.time.Instant

import graft.sources.{Multimodal, StageSink}

class SourcesSpec extends SparkSpec {
  import spark.implicits._

  test("StageSink writes timestamped stage-foldered exports with session tag") {
    val base = Files.createTempDirectory("graft_sink").toString
    val df = Seq((1, "a"), (2, "b")).toDF("id", "v")
    val at = Instant.parse("2024-03-04T05:06:07.000123Z")
    val path = StageSink.save(df, base, "TRANSFORMED_FILES", "Ratings-Transformed",
      at, additionalInfo = Seq("2023-2024"), format = "csv", coalesceTo = Some(1))
    assert(path === s"$base/TRANSFORMED_FILES/" +
      "Ratings-Transformed_2023-2024-2024-03-04-050607-000123")
    val back = spark.read.option("header", "true").csv(path)
    assert(back.count() === 2)
    assert(back.columns.toSeq === Seq("id", "v"))
  }

  test("StageSink rejects unknown stages and double-writes; loadLatest picks newest") {
    val base = Files.createTempDirectory("graft_sink2").toString
    val df = Seq((1, "a")).toDF("id", "v")
    val at = Instant.parse("2024-03-04T05:06:07.000001Z")
    intercept[IllegalArgumentException] {
      StageSink.save(df, base, "BOGUS", "x", at)
    }
    StageSink.save(df, base, "EXTRACT_FILES", "x", at)
    intercept[Exception] { // mode("error") refuses overwrite
      StageSink.save(df, base, "EXTRACT_FILES", "x", at)
    }
    val df2 = Seq((9, "z")).toDF("id", "v")
    StageSink.save(df2, base, "EXTRACT_FILES", "x",
      Instant.parse("2024-03-05T00:00:00.000001Z"))
    val latest = StageSink.loadLatest(spark, base, "EXTRACT_FILES", "x")
    assert(latest.count() === 1)
    assert(latest.head.getInt(0) === 9)
  }

  test("Multimodal feature extraction preserves ids and emits fixed-dim features") {
    implicit val s = spark
    val media = Multimodal.syntheticMedia(spark, 30)
    val feats = Multimodal.extractFeatures(media).collect()
    assert(feats.length === 30)
    assert(feats.forall(_.features.length === 8))
    // deterministic: same input -> same features
    val again = Multimodal.extractFeatures(media).collect()
    assert(feats.map(_.features.toSeq).toSeq ===
      again.map(_.features.toSeq).toSeq)
    // kinds round-robin
    assert(feats.count(_.kind == "image") === 10)
  }

  test("Multimodal resize updates image meta, leaves audio/video untouched") {
    implicit val s = spark
    val media = Multimodal.syntheticMedia(spark, 12)
    val resized = Multimodal.resize(media, 32, 32).collect()
    val images = resized.filter(_.meta.kind == "image")
    assert(images.nonEmpty)
    assert(images.forall(r => r.meta.width == 32 && r.meta.height == 32))
    val audio = resized.filter(_.meta.kind == "audio")
    assert(audio.forall(_.meta.sampleRate == 16000))
  }

  test("Multimodal frameSample explodes video rows by stride") {
    implicit val s = spark
    val media = Multimodal.syntheticMedia(spark, 9) // ids 2,5,8 are video
    val frames = Multimodal.frameSample(media, stride = 2)
    val byId = frames.groupBy("media_id").count().collect()
      .map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(byId.keySet === Set(2L, 5L, 8L))
    assert(byId.values.forall(_ >= 1))
  }

  test("mediaRepartition sizes partitions by payload bytes") {
    implicit val s = spark
    val media = Multimodal.syntheticMedia(spark, 64).toDF()
    val parts = Multimodal.mediaRepartition(media, "bytes", targetBytes = 4096)
      .rdd.getNumPartitions
    assert(parts >= 2) // 64 rows * ~600B >> 4KB target
  }
}
