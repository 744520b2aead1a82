package graft.sources

import java.io.{BufferedInputStream, DataInputStream, EOFException, InputStream}
import java.util.zip.GZIPInputStream

import org.apache.spark.sql.{DataFrame, Row, SparkSession}
import org.apache.spark.sql.types._

/** WARC (ISO 28500) web-archive ingest — the standard container for
  * web crawls (Common Crawl ships petabytes of `.warc.gz`), and the
  * raw input face of an LLM data pipeline: WARC → text extraction
  * (q120 main content / CssExtract) → quality/dedup/mixing.
  *
  * Scale shape: files arrive via `sparkContext.binaryFiles`, whose
  * `PortableDataStream` is OPENED LAZILY per task — records are
  * stream-parsed off the (optionally gzip) input one at a time, so a
  * multi-GB archive never materializes in executor memory; the only
  * per-record allocation is its own payload, and even that is capped
  * at `maxPayloadBytes` (oversized bodies truncate with a flag —
  * the multimodal decode-cap discipline). Parallelism is per-file
  * (WARC is a concatenation format with no split points mid-stream;
  * real deployments shard into many ~1 GB files, which is exactly
  * the layout binaryFiles parallelises over).
  *
  * Gzip: `.warc.gz` files are read through GZIPInputStream, which
  * consumes CONCATENATED members — both the per-record-member layout
  * Common Crawl uses and whole-file compression decode identically.
  *
  * Quarantine discipline (the Multimodal corrupt-bytes contract): a
  * malformed record emits one `ok = false` row carrying the error
  * and parsing of that FILE stops — WARC has no mid-stream resync
  * point (a scan for the next `WARC/` magic could land inside a
  * payload), so truncation is surfaced, never silently skipped.
  *
  * HTTP response records additionally pre-split into status /
  * headers' content-type / body at parse time (the payload is
  * already in hand — splitting later in SQL would re-scan it).
  *
  * Reference counterpart: none (the reference scrapes live HTML);
  * this is the archival-input face a 100 TB pipeline starts from.
  */
object Warc {

  val schema: StructType = StructType(Seq(
    StructField("file", StringType, nullable = false),
    StructField("record_index", IntegerType, nullable = false),
    StructField("warc_type", StringType, nullable = true),
    StructField("record_id", StringType, nullable = true),
    StructField("url", StringType, nullable = true),
    StructField("warc_date", StringType, nullable = true),
    StructField("content_type", StringType, nullable = true),
    StructField("content_length", LongType, nullable = true),
    StructField("http_status", IntegerType, nullable = true),
    StructField("http_content_type", StringType, nullable = true),
    // the HTTP entity body for parsed response records, the raw WARC
    // payload otherwise — one binary column, never both copies
    StructField("body", BinaryType, nullable = true),
    StructField("truncated", BooleanType, nullable = false),
    StructField("ok", BooleanType, nullable = false),
    StructField("err", StringType, nullable = false)))

  /** Read a WARC path (glob ok; `.gz` names decompress) into one row
    * per record. `maxPayloadBytes` caps what a record may allocate —
    * longer payloads truncate (flagged) but the stream stays aligned
    * because the remainder is SKIPPED, not read. */
  def read(spark: SparkSession, path: String,
      maxPayloadBytes: Int = 16 << 20): DataFrame = {
    require(maxPayloadBytes > 0, "Warc.read: maxPayloadBytes > 0")
    val cap = maxPayloadBytes
    val rdd = spark.sparkContext.binaryFiles(path)
      .flatMap { case (name, pds) =>
        // GZIPInputStream reads the member HEADER at construction, so
        // a corrupt/non-gzip `.gz` throws HERE, not in the record
        // loop — quarantine it like any malformed record (one
        // ok=false row), or one bad shard kills the whole job at
        // crawl scale. ONLY deterministic decode errors quarantine
        // (ZipException = bytes are not gzip; EOFException = file
        // truncated mid-header): a transient IOException from the
        // underlying storage (socket timeout on HDFS/S3) must
        // PROPAGATE so Spark's task retry can recover the data — a
        // quarantine row there would be silent, permanent loss of a
        // healthy shard.
        val opened: Either[String, DataInputStream] =
          {
            val base: InputStream = pds.open()
            try Right(new DataInputStream(new BufferedInputStream(
              if (name.toLowerCase.endsWith(".gz"))
                new GZIPInputStream(base)
              else base, 1 << 16)))
            catch {
              case e @ (_: java.util.zip.ZipException | _: EOFException) =>
                try base.close() catch { case _: Exception => () }
                Left(s"unreadable archive: ${e.getClass.getSimpleName}:" +
                  s" ${String.valueOf(e.getMessage).take(120)}")
              case e: Throwable =>
                // transient open failure (storage IOException etc.):
                // it must PROPAGATE to the task retry — but the
                // already-opened handle must not leak across retries
                // (the completion listener is only registered on the
                // success path)
                try base.close() catch { case _: Exception => () }
                throw e
            }
          }
        opened match {
          case Left(err) =>
            Iterator.single(Row(name, 0, null, null, null, null, null,
              null, null, null, null, false, false, err))
          case Right(in) =>
            // a limit/take may abandon the iterator mid-file — close
            // the handle (and the gzip inflater's native buffer) at
            // task end, not at GC, or a wide scan exhausts file
            // descriptors
            Option(org.apache.spark.TaskContext.get()).foreach(
              _.addTaskCompletionListener[Unit] { _ =>
                try in.close() catch { case _: Exception => () }
              })
            recordIterator(name, in, cap)
        }
      }
    spark.createDataFrame(rdd, schema)
  }

  /** Serialize ONE HTTP-response record — the WRITE face, enough to
    * build valid archives for round trips, fixtures and staging
    * (a full crawler writer is out of scope). The framing is exactly
    * what [[read]] parses: version line, headers, Content-Length'd
    * payload, blank-line separator. */
  def responseRecord(url: String, date: String, recordId: String,
      body: Array[Byte],
      httpContentType: String = "text/html"): Array[Byte] = {
    val iso = java.nio.charset.StandardCharsets.ISO_8859_1
    val http = (s"HTTP/1.1 200 OK\r\nContent-Type: $httpContentType\r\n\r\n")
      .getBytes(iso) ++ body
    (s"WARC/1.0\r\nWARC-Type: response\r\n" +
      s"WARC-Record-ID: <$recordId>\r\n" +
      s"WARC-Date: $date\r\n" +
      s"WARC-Target-URI: $url\r\n" +
      "Content-Type: application/http;msgtype=response\r\n" +
      s"Content-Length: ${http.length}\r\n\r\n").getBytes(iso) ++
      http ++ "\r\n\r\n".getBytes(iso)
  }

  /** Lazily parse records off one stream; closes it at exhaustion or
    * first error. */
  private[sources] def recordIterator(file: String, in: DataInputStream,
      cap: Int): Iterator[Row] = new Iterator[Row] {
    private var idx = 0
    private var done = false
    private var pending: Row = _

    private def close(): Unit = { done = true; try in.close() catch { case _: Exception => () } }

    override def hasNext: Boolean = {
      if (pending != null) return true
      if (done) return false
      pending = readRecord()
      pending != null
    }

    override def next(): Row = {
      if (!hasNext) throw new NoSuchElementException
      val r = pending; pending = null; r
    }

    /** null = clean end of stream. */
    private def readRecord(): Row =
      try {
        // skip inter-record blank lines; EOF here is a clean end
        var line = readLine(in)
        while (line != null && line.isEmpty) line = readLine(in)
        if (line == null) { close(); return null }
        if (!line.startsWith("WARC/"))
          throw new WarcFormat(s"expected WARC/ version line, got '${line.take(40)}'")
        // header block to the first blank line
        val headers = scala.collection.mutable.Map.empty[String, String]
        var h = readLine(in)
        while (h != null && h.nonEmpty) {
          val i = h.indexOf(':')
          if (i <= 0) throw new WarcFormat(s"malformed header '${h.take(40)}'")
          headers(h.substring(0, i).trim.toLowerCase) =
            h.substring(i + 1).trim
          h = readLine(in)
        }
        if (h == null) throw new WarcFormat("EOF inside header block")
        val len = headers.get("content-length").flatMap(_.toLongOption)
          .getOrElse(throw new WarcFormat("missing Content-Length"))
        if (len < 0) throw new WarcFormat(s"negative Content-Length $len")
        val take = math.min(len, cap.toLong).toInt
        val payload = new Array[Byte](take)
        in.readFully(payload)
        var remaining = len - take
        while (remaining > 0) {
          val s = in.skip(remaining)
          if (s <= 0) {
            if (in.read() < 0) throw new EOFException("payload")
            remaining -= 1
          } else remaining -= s
        }
        val warcType = headers.get("warc-type").orNull
        val (status, mime, body) =
          if (warcType == "response" &&
              headers.get("content-type").exists(_.startsWith("application/http")))
            splitHttp(payload)
          else (null, null, payload)
        val r = Row(file, idx, warcType, headers.get("warc-record-id").orNull,
          headers.get("warc-target-uri").orNull,
          headers.get("warc-date").orNull,
          headers.get("content-type").orNull, len,
          status, mime, body, len > take, true, "")
        idx += 1
        r
      } catch {
        case e: EOFException =>
          close()
          // JDK readFully throws EOFException with a NULL message
          val where = Option(e.getMessage).getOrElse("unexpected EOF")
          Row(file, idx, null, null, null, null, null, null, null, null,
            null, false, false, s"truncated record: $where")
        case e: WarcFormat =>
          close()
          Row(file, idx, null, null, null, null, null, null, null, null,
            null, false, false, e.getMessage)
        // gzip decode errors surface MID-STREAM as ZipException (bad
        // member header after a clean member boundary, CRC mismatch
        // at member end) — same quarantine contract as a framing
        // error: one ok=false row, parsing of the file stops (no
        // resync point exists inside a corrupt deflate run). Other
        // IOExceptions (transient storage faults) deliberately
        // PROPAGATE: the task fails and Spark's retry recovers the
        // shard — quarantining those would silently lose healthy
        // records (EOFException, the deterministic truncation case,
        // is handled above).
        case e: java.util.zip.ZipException =>
          close()
          Row(file, idx, null, null, null, null, null, null, null, null,
            null, false, false,
            s"corrupt gzip: ${e.getClass.getSimpleName}: " +
              String.valueOf(e.getMessage).take(120))
      }

    /** One CRLF (or LF) terminated ISO-8859-1 line; null at EOF.
      * Length-capped at 1 MiB: a line past that means the glob
      * matched a non-WARC (or corrupt) file whose newline-free run
      * would otherwise buffer the whole remaining stream — defeating
      * the maxPayloadBytes bounded-allocation contract. The cap sits
      * far above any legitimate header (WARC imposes no line limit
      * and real crawls carry multi-KB data:/query-string URIs, so a
      * tight cap would amplify one long header into whole-file
      * loss); capped lines quarantine through the normal WarcFormat
      * path instead of growing the builder. */
    private def readLine(s: DataInputStream): String = {
      val maxLine = 1 << 20
      val sb = new java.lang.StringBuilder(96)
      var c = s.read()
      if (c < 0) return null
      while (c >= 0 && c != '\n') {
        if (c != '\r') {
          if (sb.length() >= maxLine)
            throw new WarcFormat(
              s"header line exceeds $maxLine bytes — not a WARC stream")
          sb.append(c.toChar)
        }
        c = s.read()
      }
      sb.toString
    }
  }

  private final class WarcFormat(msg: String) extends Exception(msg)

  /** Split an HTTP/1.x response payload into (status, content-type,
    * body). A payload that is not parseable HTTP comes back whole as
    * the body with null status — never an error (the WARC record
    * itself was fine). */
  private[sources] def splitHttp(
      payload: Array[Byte]): (Integer, String, Array[Byte]) = {
    val sep = indexOfDoubleCrlf(payload)
    if (sep < 0) return (null, null, payload)
    val head = new String(payload, 0, sep, java.nio.charset.StandardCharsets.ISO_8859_1)
    val lines = head.split("\r?\n")
    if (lines.isEmpty || !lines(0).startsWith("HTTP/")) return (null, null, payload)
    val status = lines(0).split(" ").lift(1).flatMap(_.toIntOption)
      .map(Integer.valueOf).orNull
    val mime = lines.iterator.drop(1)
      .map(_.split(":", 2))
      .collectFirst { case Array(k, v) if k.equalsIgnoreCase("content-type") => v.trim }
      .orNull
    val bodyStart = sep + 4
    (status, mime, java.util.Arrays.copyOfRange(payload, math.min(bodyStart, payload.length), payload.length))
  }

  private def indexOfDoubleCrlf(b: Array[Byte]): Int = {
    var i = 0
    while (i + 3 < b.length) {
      if (b(i) == '\r' && b(i + 1) == '\n' && b(i + 2) == '\r' && b(i + 3) == '\n')
        return i
      i += 1
    }
    -1
  }
}
