package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.GZIPOutputStream

import org.apache.spark.sql.SparkSession
import org.apache.spark.sql.functions._

import graft.sources.Warc

/** WARC-source throughput measurement (the §6 "measure, don't guess"
  * bar for sources/Warc.scala): synthesizes many-file archives of
  * HTML response records — the Common Crawl shape — and measures the
  * full read → HTTP-split → body-bytes aggregate at two scales, plain
  * and gzipped. Files parallelise one-per-task (WARC has no
  * mid-stream split points), so the 10× point doubles as the
  * parallelism check: wall time should grow far slower than bytes
  * while file count ≥ cores. Prints one JSON line per configuration:
  * {files, records, mb, sec, mb_per_sec}. */
object StressWarc {

  // framing through the product's own write face — the stress must
  // measure the format the library actually writes
  private def record(i: Long, body: Array[Byte]): Array[Byte] =
    Warc.responseRecord(s"http://example.com/$i",
      "2024-01-01T00:00:00Z", s"urn:uuid:$i", body)

  /** ~2 KB of deterministic HTML per record. */
  private def body(i: Long): Array[Byte] = {
    val sb = new java.lang.StringBuilder(2200)
    sb.append("<html><head><title>doc ").append(i).append("</title></head><body>")
    var k = 0
    while (k < 40) {
      sb.append("<p>paragraph ").append(k).append(" of document ").append(i)
        .append(" with some repeated crawl-like filler text here</p>")
      k += 1
    }
    sb.append("</body></html>")
    sb.toString.getBytes(ISO_8859_1)
  }

  private def writeFiles(dir: java.io.File, files: Int, recsPerFile: Int,
      gz: Boolean): Long = {
    dir.mkdirs()
    var bytes = 0L
    for (f <- 0 until files) {
      val bos = new ByteArrayOutputStream(recsPerFile * 2600)
      for (r <- 0 until recsPerFile) {
        val i = f.toLong * recsPerFile + r
        bos.write(record(i, body(i)))
      }
      val plain = bos.toByteArray
      val out = if (gz) {
        val z = new ByteArrayOutputStream()
        val g = new GZIPOutputStream(z); g.write(plain); g.close()
        z.toByteArray
      } else plain
      bytes += plain.length // throughput counts UNCOMPRESSED bytes
      val fo = new FileOutputStream(new java.io.File(dir,
        f"part$f%03d.warc${if (gz) ".gz" else ""}"))
      fo.write(out); fo.close()
    }
    bytes
  }

  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[32]")
      .config("spark.sql.shuffle.partitions", "32")
      .config("spark.ui.enabled", "false").getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val base = java.nio.file.Files.createTempDirectory("graft_warc_stress")
      .toFile

    // (files, recs/file): 1x ≈ 80 MB over 32 files, 10x ≈ 800 MB
    def deleteRecursively(f: java.io.File): Unit = {
      Option(f.listFiles()).getOrElse(Array.empty).foreach(deleteRecursively)
      f.delete()
    }
    for ((files, recs, gz) <- Seq(
      (32, 1000, false), (32, 1000, true),
      (32, 10000, false), (32, 10000, true))) {
      val dir = new java.io.File(base, s"w_${files}_${recs}_$gz")
      val bytes = writeFiles(dir, files, recs, gz)
      // warm-up once, then median of 3 timed passes
      def pass(): (Long, Double) = {
        val t0 = System.nanoTime()
        val row = Warc.read(spark, dir.getPath + "/*")
          .filter(col("warc_type") === "response" && col("ok"))
          .agg(count(lit(1)), sum(length(col("body")))).head
        (row.getLong(0), (System.nanoTime() - t0) / 1e9)
      }
      pass()
      val runs = Seq.fill(3)(pass())
      val n = runs.head._1
      require(n == files.toLong * recs, s"expected ${files * recs}, got $n")
      val sec = runs.map(_._2).sorted.apply(1)
      val mb = bytes / 1e6
      println(f"""{"files":$files,"records":$n,"gz":$gz,"mb":$mb%.1f,"sec":$sec%.2f,"mb_per_sec":${mb / sec}%.0f}""")
      // delete per config: peak disk stays one archive set (~1.2 GB),
      // and repeated runs leave nothing in /tmp (the scratch-dir
      // discipline a past round's review already had to restore once)
      deleteRecursively(dir)
    }
    deleteRecursively(base)
    spark.stop()
  }
}
