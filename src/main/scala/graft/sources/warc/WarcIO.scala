package graft.sources.warc

import java.io.ByteArrayOutputStream
import java.util.zip.{GZIPInputStream, GZIPOutputStream}
import scala.collection.mutable.ArrayBuffer

/** WARC (ISO 28500) reader/writer — the container an actual web crawl
  * ships in (Common Crawl's own distribution format). Executor-side,
  * JDK-only, loud failures, same discipline as the image/audio codecs.
  *
  * Layout implemented: WARC/1.0 and 1.1 records — a version line, CRLF
  * header lines to an empty line, `Content-Length` octet framing, a
  * CRLF CRLF record separator — and the standard `.warc.gz` convention
  * of one gzip MEMBER per record, concatenated (java's GZIPInputStream
  * walks concatenated members natively). `response` records carry an
  * HTTP/1.1 message; [[httpBody]] splits its status line + headers from
  * the entity body. Unknown record types (warcinfo, request, metadata)
  * parse fine and are the CALLER's to skip — a reader that only
  * tolerates response records would choke on every real crawl file.
  *
  * Scale shape: WARC files are SCAN INPUT (one binaryFile row per
  * file), the record walk is a narrow per-file kernel, and payloads
  * never shuffle — the media-decode discipline applied to the crawl's
  * outermost container.
  */
object WarcIO {

  final case class WarcRecord(
      warcType: String, targetUri: Option[String],
      headers: Map[String, String], payload: Array[Byte])

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"malformed WARC: $msg")

  private val Crlf = "\r\n".getBytes("US-ASCII")

  /** Read one CRLF-terminated ASCII line starting at `pos`; returns
    * (line without terminator, next position).
    */
  private def line(b: Array[Byte], pos: Int): (String, Int) = {
    var p = pos
    while (p + 1 < b.length && !(b(p) == '\r' && b(p + 1) == '\n')) p += 1
    if (p + 1 >= b.length) fail(s"unterminated header line at offset $pos")
    (new String(b, pos, p - pos, "US-ASCII"), p + 2)
  }

  /** Parse an UNCOMPRESSED WARC stream into its records. Strict:
    * version line, mandatory Content-Length, exact CRLF CRLF record
    * separators, no trailing garbage.
    */
  def parseWarc(bytes: Array[Byte]): Seq[WarcRecord] = {
    val out = ArrayBuffer.empty[WarcRecord]
    var pos = 0
    while (pos < bytes.length) {
      val (version, afterVersion) = line(bytes, pos)
      if (version != "WARC/1.0" && version != "WARC/1.1")
        fail(s"bad version line '$version' at offset $pos")
      var p = afterVersion
      val headers = scala.collection.mutable.LinkedHashMap.empty[String, String]
      var done = false
      while (!done) {
        val (l, np) = line(bytes, p)
        p = np
        if (l.isEmpty) done = true
        else {
          val colon = l.indexOf(':')
          if (colon <= 0) fail(s"bad header line '$l'")
          headers(l.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)) =
            l.substring(colon + 1).trim
        }
      }
      val len = headers.getOrElse("content-length", fail("missing Content-Length"))
        .toIntOption.getOrElse(fail("non-numeric Content-Length"))
      if (len < 0 || p + len > bytes.length)
        fail(s"Content-Length $len exceeds stream (${bytes.length - p} left)")
      val payload = java.util.Arrays.copyOfRange(bytes, p, p + len)
      p += len
      // the spec's record separator: exactly two CRLFs
      for (_ <- 0 until 2) {
        if (p + 1 >= bytes.length || bytes(p) != '\r' || bytes(p + 1) != '\n')
          fail(s"missing record separator at offset $p")
        p += 2
      }
      out += WarcRecord(
        headers.getOrElse("warc-type", fail("missing WARC-Type")),
        headers.get("warc-target-uri"), headers.toMap, payload)
      pos = p
    }
    out.toSeq
  }

  /** Parse a `.warc.gz` file (concatenated per-record gzip members). */
  def readWarcGz(bytes: Array[Byte]): Seq[WarcRecord] = {
    val in = new GZIPInputStream(new java.io.ByteArrayInputStream(bytes))
    val buf = new ByteArrayOutputStream()
    val chunk = new Array[Byte](8192)
    var n = in.read(chunk)
    while (n >= 0) { buf.write(chunk, 0, n); n = in.read(chunk) }
    parseWarc(buf.toByteArray)
  }

  /** Split an HTTP/1.1 response payload into (status code, entity body).
    * Strict on the status line and the blank-line boundary.
    */
  def httpBody(payload: Array[Byte]): (Int, Array[Byte]) = {
    val (status, afterStatus) = line(payload, 0)
    if (!status.startsWith("HTTP/1.")) fail(s"bad HTTP status line '$status'")
    val parts = status.split(" ")
    if (parts.length < 2) fail(s"bad HTTP status line '$status'")
    val code = parts(1).toIntOption.getOrElse(fail(s"bad HTTP status '$status'"))
    var p = afterStatus
    var done = false
    while (!done) {
      val (l, np) = line(payload, p)
      p = np
      if (l.isEmpty) done = true
    }
    (code, java.util.Arrays.copyOfRange(payload, p, payload.length))
  }

  // ------------------------------------------------------------------
  // Writer (fixture path): the standard one-gzip-member-per-record
  // .warc.gz layout, with a leading warcinfo record like a real crawl
  // file — so every reader must prove it SKIPS non-response records.
  // ------------------------------------------------------------------

  private def gzipMember(record: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    val gz = new GZIPOutputStream(bos)
    gz.write(record); gz.close()
    bos.toByteArray
  }

  private def record(
      warcType: String, extraHeaders: Seq[(String, String)],
      payload: Array[Byte]): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    def put(s: String): Unit = {
      bos.write(s.getBytes("US-ASCII")); bos.write(Crlf)
    }
    put("WARC/1.0")
    put(s"WARC-Type: $warcType")
    extraHeaders.foreach { case (k, v) => put(s"$k: $v") }
    put(s"Content-Length: ${payload.length}")
    bos.write(Crlf)
    bos.write(payload)
    bos.write(Crlf); bos.write(Crlf)
    bos.toByteArray
  }

  /** Build one `.warc.gz` file: a warcinfo member followed by one
    * response member per (uri, html) page, each page wrapped in an
    * HTTP/1.1 200 message.
    */
  def writeWarcGz(pages: Seq[(String, String)]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val info = "software: graft-fixture\r\nformat: WARC File Format 1.0\r\n"
      .getBytes("US-ASCII")
    out.write(gzipMember(record("warcinfo",
      Seq("Content-Type" -> "application/warc-fields"), info)))
    for ((uri, html) <- pages) {
      val body = html.getBytes("UTF-8")
      val http = new ByteArrayOutputStream()
      http.write(("HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=utf-8\r\n" +
        s"Content-Length: ${body.length}\r\n\r\n").getBytes("US-ASCII"))
      http.write(body)
      out.write(gzipMember(record("response",
        Seq("WARC-Target-URI" -> uri,
          "Content-Type" -> "application/http; msgtype=response"),
        http.toByteArray)))
    }
    out.toByteArray
  }
}
