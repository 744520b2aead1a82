package graft

import java.io.{ByteArrayOutputStream, FileOutputStream}
import java.nio.charset.StandardCharsets.ISO_8859_1
import java.util.zip.GZIPOutputStream

import graft.sources.Warc

/** WARC ingest: record framing, HTTP pre-split, gzip (multi-member),
  * payload capping and the truncation quarantine. */
class WarcSpec extends SparkSpec {
  import spark.implicits._

  private def record(warcType: String, url: String,
      payload: Array[Byte], extra: String = ""): Array[Byte] = {
    val h = (s"WARC/1.0\r\n" +
      s"WARC-Type: $warcType\r\n" +
      s"WARC-Record-ID: <urn:uuid:$warcType-${payload.length}>\r\n" +
      s"WARC-Date: 2024-01-01T00:00:00Z\r\n" +
      (if (url != null) s"WARC-Target-URI: $url\r\n" else "") +
      extra +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes(ISO_8859_1)
    val out = new ByteArrayOutputStream()
    out.write(h); out.write(payload); out.write("\r\n\r\n".getBytes(ISO_8859_1))
    out.toByteArray
  }

  private val httpPayload = ("HTTP/1.1 200 OK\r\n" +
    "Content-Type: text/html; charset=utf-8\r\n" +
    "Server: test\r\n\r\n" +
    "<html><body>hello warc</body></html>").getBytes(ISO_8859_1)

  private def fixture: Array[Byte] = {
    val out = new ByteArrayOutputStream()
    out.write(record("warcinfo", null,
      "software: graft-test\r\n".getBytes(ISO_8859_1)))
    out.write(record("response", "http://example.com/a", httpPayload,
      extra = "Content-Type: application/http;msgtype=response\r\n"))
    out.write(record("metadata", "http://example.com/a",
      "fetchTimeMs: 7".getBytes(ISO_8859_1)))
    out.toByteArray
  }

  private def writeTmp(name: String, bytes: Array[Byte]): String = {
    val dir = java.nio.file.Files.createTempDirectory("graft_warc")
    val f = new java.io.File(dir.toFile, name)
    val o = new FileOutputStream(f)
    o.write(bytes); o.close()
    f.getPath
  }

  test("plain WARC: three records, HTTP response pre-split") {
    val path = writeTmp("a.warc", fixture)
    val rows = Warc.read(spark, path).orderBy("record_index").collect()
    assert(rows.length === 3)
    assert(rows.forall(_.getAs[Boolean]("ok")))
    assert(rows.map(_.getAs[String]("warc_type")).toSeq ===
      Seq("warcinfo", "response", "metadata"))
    val resp = rows(1)
    assert(resp.getAs[String]("url") === "http://example.com/a")
    assert(resp.getAs[Int]("http_status") === 200)
    assert(resp.getAs[String]("http_content_type")
      .startsWith("text/html"))
    assert(new String(resp.getAs[Array[Byte]]("body"), ISO_8859_1) ===
      "<html><body>hello warc</body></html>")
    // non-HTTP records keep their raw payload as the body, status null
    assert(rows(2).isNullAt(rows(2).fieldIndex("http_status")))
    assert(new String(rows(2).getAs[Array[Byte]]("body"), ISO_8859_1) ===
      "fetchTimeMs: 7")
  }

  test("gzip: whole-file and per-record-member layouts both decode") {
    def gzWhole(b: Array[Byte]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val g = new GZIPOutputStream(bos); g.write(b); g.close()
      bos.toByteArray
    }
    // per-record members: each record its own gzip member, concatenated
    val members = new ByteArrayOutputStream()
    members.write(gzWhole(record("warcinfo", null,
      "software: graft-test\r\n".getBytes(ISO_8859_1))))
    members.write(gzWhole(record("response", "http://example.com/a",
      httpPayload,
      extra = "Content-Type: application/http;msgtype=response\r\n")))
    for (bytes <- Seq(gzWhole(fixture), members.toByteArray)) {
      val path = writeTmp("a.warc.gz", bytes)
      val rows = Warc.read(spark, path).collect()
      assert(rows.forall(_.getAs[Boolean]("ok")))
      assert(rows.exists(r => r.getAs[String]("warc_type") == "response" &&
        r.getAs[Int]("http_status") == 200))
    }
  }

  test("truncated file quarantines with parsing stopped, prior records intact") {
    val whole = fixture
    val cut = java.util.Arrays.copyOfRange(whole, 0, whole.length - 60)
    val path = writeTmp("t.warc", cut)
    val rows = Warc.read(spark, path).orderBy("record_index").collect()
    assert(rows.length === 3)
    assert(rows.take(2).forall(_.getAs[Boolean]("ok")))
    val bad = rows(2)
    assert(!bad.getAs[Boolean]("ok") && bad.getAs[String]("err").nonEmpty)
  }

  test("payload cap truncates with the flag set and keeps framing aligned") {
    val path = writeTmp("a.warc", fixture)
    val rows = Warc.read(spark, path, maxPayloadBytes = 8)
      .orderBy("record_index").collect()
    assert(rows.length === 3, "skip-not-read keeps later records parseable")
    assert(rows.forall(_.getAs[Boolean]("ok")))
    assert(rows.forall(_.getAs[Boolean]("truncated")))
    assert(rows(1).getAs[Array[Byte]]("body").length === 8)
  }

  test("corrupt gzip quarantines — header, mid-stream and CRC classes") {
    def gzWhole(b: Array[Byte]): Array[Byte] = {
      val bos = new ByteArrayOutputStream()
      val g = new GZIPOutputStream(bos); g.write(b); g.close()
      bos.toByteArray
    }
    // (a) bad member header: not gzip at all but named .gz — the
    // ZipException fires at GZIPInputStream CONSTRUCTION
    val notGz = writeTmp("bad.warc.gz",
      "this is not gzip data at all".getBytes(ISO_8859_1))
    val a = Warc.read(spark, notGz).collect()
    assert(a.length === 1 && !a(0).getAs[Boolean]("ok"))
    assert(a(0).getAs[String]("err").contains("unreadable archive"))
    // (b) corrupt deflate mid-stream: flip bytes INSIDE the member —
    // the ZipException fires in the record loop; one quarantine row,
    // task survives
    val gz = gzWhole(fixture)
    val mid = gz.clone()
    for (i <- gz.length / 2 until math.min(gz.length / 2 + 24, gz.length))
      mid(i) = (mid(i) ^ 0x5a).toByte
    val b = Warc.read(spark, writeTmp("mid.warc.gz", mid)).collect()
    assert(b.nonEmpty && b.exists(!_.getAs[Boolean]("ok")))
    // (c) a second healthy file in the same scan still parses — the
    // corrupt shard quarantined instead of failing the job
    val dir = java.nio.file.Files.createTempDirectory("graft_warc_mix")
    for ((n, bytes) <- Seq("bad.warc.gz" ->
        "junk".getBytes(ISO_8859_1), "good.warc.gz" -> gz)) {
      val o = new FileOutputStream(new java.io.File(dir.toFile, n))
      o.write(bytes); o.close()
    }
    val mixed = Warc.read(spark, s"$dir/*.warc.gz").collect()
    assert(mixed.count(_.getAs[Boolean]("ok")) === 3) // the good fixture
    assert(mixed.count(!_.getAs[Boolean]("ok")) === 1)
  }

  test("newline-free garbage quarantines at the line cap, never buffers the stream") {
    // 3 MB of 'x' with no newline: the old readLine would buffer it
    // all; the cap quarantines at 1 MiB through the WarcFormat path
    val noise = Array.fill[Byte](3 << 20)('x'.toByte)
    val rows = Warc.read(spark, writeTmp("noise.warc", noise)).collect()
    assert(rows.length === 1 && !rows(0).getAs[Boolean]("ok"))
    assert(rows(0).getAs[String]("err").contains("exceeds"))
  }

  test("a multi-KB header line (long URI) parses — the cap must not amplify") {
    // WARC imposes no header-line limit and real crawls carry long
    // data:/query-string URIs; a 100 KB URI must parse, not
    // quarantine the rest of a healthy shard
    val longUrl = "http://example.com/?q=" + "a" * 100000
    val bytes = {
      val out = new ByteArrayOutputStream()
      out.write(record("response", longUrl, httpPayload,
        extra = "Content-Type: application/http;msgtype=response\r\n"))
      out.write(record("metadata", "http://example.com/after",
        "ok".getBytes(ISO_8859_1)))
      out.toByteArray
    }
    val rows = Warc.read(spark, writeTmp("long.warc", bytes))
      .orderBy("record_index").collect()
    assert(rows.length === 2 && rows.forall(_.getAs[Boolean]("ok")))
    assert(rows(0).getAs[String]("url") === longUrl)
  }

  test("composes with the corpus operators: WARC bodies are documents") {
    val path = writeTmp("a.warc", fixture)
    val docs = Warc.read(spark, path)
      .filter($"warc_type" === "response" && $"ok")
      .select($"url", org.apache.spark.sql.functions
        .col("body").cast("string").as("text"))
    val toks = docs.select(
      graft.operators.TextStats.wsTokenCount($"text").as("n"))
      .as[Int].head
    assert(toks > 0)
  }
}
