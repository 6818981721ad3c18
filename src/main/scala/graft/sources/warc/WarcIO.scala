package graft.sources.warc

import java.io.{ByteArrayInputStream, ByteArrayOutputStream, EOFException, InputStream}
import java.nio.charset.Charset
import java.util.zip.{GZIPInputStream, GZIPOutputStream, InflaterInputStream}

/** WARC (ISO 28500) reader/writer — the container an actual web crawl
  * ships in (Common Crawl's own distribution format). Executor-side,
  * JDK-only, loud failures, same discipline as the image/audio codecs.
  *
  * Layout implemented: WARC/1.0 and 1.1 records — a version line, CRLF
  * header lines to an empty line, `Content-Length` octet framing, a
  * CRLF CRLF record separator — and the standard `.warc.gz` convention
  * of one gzip MEMBER per record, concatenated (java's GZIPInputStream
  * walks concatenated members natively). `response` records carry an
  * HTTP/1.1 message; [[httpEntity]] splits the status line + headers
  * and DECODES the entity the way a browser would: `Transfer-Encoding:
  * chunked` de-framed, `Content-Encoding: gzip/deflate/zstd` decoded
  * (brotli rejects by name), the charset resolved in the WHATWG order
  * — BOM first (UTF-8/16LE/16BE), then the `Content-Type` header, then
  * the HTML5 meta prescan (real crawl records are dominated by chunked
  * and/or compressed bodies and non-UTF-8 charsets). Unknown
  * record types (warcinfo, request, metadata) parse fine and are the
  * CALLER's to skip — a reader that only tolerates response records
  * would choke on every real crawl file.
  *
  * Scale shape: WARC files are SCAN INPUT (one binaryFile row per
  * file), and the record walk is INCREMENTAL — [[warcRecords]] returns
  * an `Iterator` that inflates one gzip member / parses one record at
  * a time, so resident memory is bounded by the LARGEST SINGLE RECORD,
  * never the decompressed file. That bound is what lets the same
  * kernel ingest a real ~1 GB `.warc.gz` (3-5 GB decompressed — past
  * the 2 GB JVM array cap a whole-file inflate would need). Payloads
  * never shuffle — the media-decode discipline applied to the crawl's
  * outermost container.
  */
object WarcIO {

  final case class WarcRecord(
      warcType: String, targetUri: Option[String],
      headers: Map[String, String], payload: Array[Byte])

  /** An HTTP/1.1 response entity with its framing and content codings
    * removed: `body` is the actual document bytes and `charset` is the
    * `Content-Type` charset parameter (UTF-8 when absent — the modern
    * web's de-facto default).
    */
  final case class HttpEntity(
      status: Int, headers: Map[String, String], body: Array[Byte],
      charset: Charset) {
    def text: String = new String(body, charset)
  }

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"malformed WARC: $msg")

  private val Crlf = "\r\n".getBytes("US-ASCII")

  // ------------------------------------------------------------------
  // Incremental record walk
  // ------------------------------------------------------------------

  /** Read one CRLF-terminated ASCII line from the stream. The stream
    * is consumed byte-at-a-time (callers hand in buffered streams:
    * GZIPInputStream buffers internally, the uncompressed path wraps a
    * ByteArrayInputStream), so no read-ahead ever crosses a record
    * boundary. EOF before the terminator is a framing error.
    */
  private def line(in: InputStream): String = {
    val sb = new java.lang.StringBuilder(64)
    var prev = -1
    var c = in.read()
    while (c >= 0) {
      if (prev == '\r' && c == '\n') {
        sb.setLength(sb.length - 1)
        return sb.toString
      }
      sb.append(c.toChar)
      prev = c
      c = in.read()
    }
    fail(s"unterminated header line (EOF after '${sb.toString.take(40)}')")
  }

  private def readFully(in: InputStream, n: Int, what: String): Array[Byte] = {
    val buf = new Array[Byte](n)
    var off = 0
    while (off < n) {
      val r = in.read(buf, off, n - off)
      if (r < 0) fail(s"$what exceeds stream (${n - off} short)")
      off += r
    }
    buf
  }

  /** Walk an (already decompressed) WARC stream record by record.
    * Strict: version line, mandatory Content-Length, exact CRLF CRLF
    * record separators, no trailing garbage. The iterator holds at
    * most ONE record's payload at a time — the memory bound is the
    * largest single record, independent of file size.
    */
  def warcRecords(in: InputStream): Iterator[WarcRecord] = new Iterator[WarcRecord] {
    private var nextRecord: WarcRecord = _
    private var finished = false

    private def advance(): Unit = {
      val first = in.read()
      if (first < 0) { finished = true; return }
      // put the consumed byte back into the version-line parse
      val version = {
        val rest = line(in)
        first.toChar.toString + rest
      }
      if (version != "WARC/1.0" && version != "WARC/1.1")
        fail(s"bad version line '$version'")
      val headers = scala.collection.mutable.LinkedHashMap.empty[String, String]
      var done = false
      while (!done) {
        val l = line(in)
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
      if (len < 0) fail(s"negative Content-Length $len")
      val payload = readFully(in, len, s"Content-Length $len")
      // the spec's record separator: exactly two CRLFs
      val sep = new Array[Byte](4)
      var got = 0
      while (got < 4) {
        val r = in.read(sep, got, 4 - got)
        if (r < 0) fail("missing record separator")
        got += r
      }
      if (!(sep(0) == '\r' && sep(1) == '\n' && sep(2) == '\r' && sep(3) == '\n'))
        fail("missing record separator")
      nextRecord = WarcRecord(
        headers.getOrElse("warc-type", fail("missing WARC-Type")),
        headers.get("warc-target-uri"), headers.toMap, payload)
    }

    override def hasNext: Boolean = {
      if (!finished && nextRecord == null) advance()
      !finished && nextRecord != null
    }
    override def next(): WarcRecord = {
      if (!hasNext) throw new NoSuchElementException("end of WARC stream")
      val r = nextRecord
      nextRecord = null
      r
    }
  }

  /** Parse an UNCOMPRESSED WARC byte array into its records (strict —
    * eager convenience over [[warcRecords]]).
    */
  def parseWarc(bytes: Array[Byte]): Seq[WarcRecord] =
    warcRecords(new ByteArrayInputStream(bytes)).toSeq

  /** Walk a `.warc.gz` file (concatenated per-record gzip members)
    * INCREMENTALLY: one member is inflated per record as the iterator
    * advances; the decompressed file is never materialized. Resident
    * memory = compressed input (the scan row) + largest single record.
    */
  def readWarcGz(bytes: Array[Byte]): Iterator[WarcRecord] =
    readWarcGzStream(new ByteArrayInputStream(bytes))

  /** Same walk over any compressed stream (the streaming-ingest face
    * can hand in a file/network stream and never hold the compressed
    * bytes either).
    */
  def readWarcGzStream(in: InputStream): Iterator[WarcRecord] =
    warcRecords(new GZIPInputStream(in, 64 << 10))

  // ------------------------------------------------------------------
  // HTTP entity decoding
  // ------------------------------------------------------------------

  private def gunzip(b: Array[Byte]): Array[Byte] = {
    val in = new GZIPInputStream(new ByteArrayInputStream(b), 64 << 10)
    try in.readAllBytes()
    catch { case e: java.io.IOException => fail(s"bad gzip entity: ${e.getMessage}") }
  }

  private def unzstd(b: Array[Byte]): Array[Byte] = {
    // zstd-jni ships with Spark itself (spark uses it for shuffle/event
    // -log compression), so the live web's third content coding costs
    // no new dependency. Streaming API: the decompressed size is not
    // trusted from the frame header.
    val in = new com.github.luben.zstd.ZstdInputStream(
      new ByteArrayInputStream(b))
    try in.readAllBytes()
    catch { case e: java.io.IOException => fail(s"bad zstd entity: ${e.getMessage}") }
    finally in.close()
  }

  private def inflate(b: Array[Byte]): Array[Byte] = {
    // HTTP 'deflate' is the zlib format; some legacy servers send raw
    // deflate — accept both (zlib first, raw on a zlib header error)
    def run(raw: Boolean): Array[Byte] = {
      val in = new InflaterInputStream(
        new ByteArrayInputStream(b), new java.util.zip.Inflater(raw))
      in.readAllBytes()
    }
    try run(raw = false)
    catch {
      case _: java.io.IOException =>
        try run(raw = true)
        catch { case e: java.io.IOException => fail(s"bad deflate entity: ${e.getMessage}") }
    }
  }

  /** De-frame a `Transfer-Encoding: chunked` body: hex-size line (with
    * optional ;extensions), chunk bytes, CRLF, repeated to the 0-size
    * chunk, then optional trailer headers to a blank line.
    */
  private def dechunk(b: Array[Byte]): Array[Byte] = {
    val in = new ByteArrayInputStream(b)
    val out = new ByteArrayOutputStream(b.length)
    var done = false
    while (!done) {
      val sizeLine = line(in)
      val semi = sizeLine.indexOf(';')
      val hexStr = (if (semi >= 0) sizeLine.substring(0, semi) else sizeLine).trim
      val size =
        try Integer.parseInt(hexStr, 16)
        catch { case _: NumberFormatException => fail(s"bad chunk size '$sizeLine'") }
      if (size < 0) fail(s"negative chunk size $size")
      if (size == 0) {
        // trailers (rare) run to a blank line
        var l = line(in)
        while (l.nonEmpty) l = line(in)
        done = true
      } else {
        out.write(readFully(in, size, s"chunk of $size"))
        val crlf = readFully(in, 2, "chunk terminator")
        if (!(crlf(0) == '\r' && crlf(1) == '\n')) fail("chunk missing CRLF")
      }
    }
    if (in.available() != 0) fail(s"${in.available()} bytes after last chunk")
    out.toByteArray
  }

  private val CharsetParam = "(?i)charset=\"?([A-Za-z0-9_:.+-]+)\"?".r.unanchored

  private val MetaCharset =
    """(?i)<meta[^>]{0,200}?charset\s*=\s*["']?([A-Za-z0-9_:.+-]+)""".r.unanchored

  /** Browser-style fallback when the Content-Type header carries no
    * charset: sniff a `<meta charset=…>` / http-equiv declaration in
    * the first 1024 body bytes (the HTML5 prescan window).
    */
  private def sniffMetaCharset(body: Array[Byte]): Option[String] = {
    val window = new String(body, 0, math.min(1024, body.length), "ISO-8859-1")
    MetaCharset.findFirstMatchIn(window).map(_.group(1))
  }

  /** Split and DECODE an HTTP/1.1 response payload: status line +
    * headers parsed; `Transfer-Encoding: chunked` de-framed, then
    * `Content-Encoding: gzip/x-gzip/deflate` inflated (the wire order,
    * reversed); the `Content-Type` charset resolved (UTF-8 default).
    * Anything else — another transfer coding, an unknown content
    * coding, an unknown charset — fails loudly rather than leaking
    * framing bytes into extracted text.
    */
  def httpEntity(payload: Array[Byte]): HttpEntity = {
    val in = new ByteArrayInputStream(payload)
    val status = line(in)
    if (!status.startsWith("HTTP/1.")) fail(s"bad HTTP status line '$status'")
    val parts = status.split(" ")
    if (parts.length < 2) fail(s"bad HTTP status line '$status'")
    val code = parts(1).toIntOption.getOrElse(fail(s"bad HTTP status '$status'"))
    val headers = scala.collection.mutable.LinkedHashMap.empty[String, String]
    var done = false
    while (!done) {
      val l = line(in)
      if (l.isEmpty) done = true
      else {
        val colon = l.indexOf(':')
        if (colon <= 0) fail(s"bad HTTP header line '$l'")
        headers(l.substring(0, colon).trim.toLowerCase(java.util.Locale.ROOT)) =
          l.substring(colon + 1).trim
      }
    }
    var body = in.readAllBytes()
    headers.get("transfer-encoding").foreach { te =>
      te.trim.toLowerCase(java.util.Locale.ROOT) match {
        case "chunked"  => body = dechunk(body)
        case "identity" => ()
        case other      => fail(s"unsupported Transfer-Encoding '$other'")
      }
    }
    headers.get("content-encoding").foreach { ce =>
      ce.trim.toLowerCase(java.util.Locale.ROOT) match {
        case "gzip" | "x-gzip" => body = gunzip(body)
        case "deflate"         => body = inflate(body)
        case "zstd"            => body = unzstd(body)
        case "br" => fail("Content-Encoding 'br' (brotli) is unsupported " +
          "(no JDK/Spark-classpath decoder; reject rather than mis-decode)")
        case "identity" | ""   => ()
        case other             => fail(s"unsupported Content-Encoding '$other'")
      }
    }
    // Charset precedence per the WHATWG sniffing order: a BOM wins over
    // the transport header and the meta prescan (a BOM'd UTF-16 page
    // would otherwise mis-sniff: the ASCII prescan can't see its meta
    // tag). The BOM is framing — stripped from the document bytes.
    val bom: Option[(Charset, Int)] =
      if (body.length >= 3 && body(0) == 0xEF.toByte &&
          body(1) == 0xBB.toByte && body(2) == 0xBF.toByte)
        Some((java.nio.charset.StandardCharsets.UTF_8, 3))
      else if (body.length >= 2 && body(0) == 0xFF.toByte && body(1) == 0xFE.toByte)
        Some((java.nio.charset.StandardCharsets.UTF_16LE, 2))
      else if (body.length >= 2 && body(0) == 0xFE.toByte && body(1) == 0xFF.toByte)
        Some((java.nio.charset.StandardCharsets.UTF_16BE, 2))
      else None
    val charset = bom match {
      case Some((cs, skip)) =>
        body = java.util.Arrays.copyOfRange(body, skip, body.length)
        cs
      case None =>
        val declared = headers.get("content-type") match {
          case Some(CharsetParam(name)) => Some(name)
          case _ => sniffMetaCharset(body)
        }
        declared match {
          case Some(name) =>
            try Charset.forName(name)
            catch {
              case _: java.nio.charset.IllegalCharsetNameException |
                  _: java.nio.charset.UnsupportedCharsetException =>
                fail(s"unsupported charset '$name'")
            }
          case None => java.nio.charset.StandardCharsets.UTF_8
        }
    }
    HttpEntity(code, headers.toMap, body, charset)
  }

  // ------------------------------------------------------------------
  // Writer (fixture path): the standard one-gzip-member-per-record
  // .warc.gz layout, with a leading warcinfo record like a real crawl
  // file — so every reader must prove it SKIPS non-response records.
  // Pages cycle through the entity layerings a live crawl actually
  // carries (plain, chunked, gzip'd, latin-1 charset, meta-charset,
  // zstd, BOM'd UTF-16LE) — so every reader must prove extraction
  // survives ALL of them.
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

  private def gzipBytes(b: Array[Byte]): Array[Byte] = gzipMember(b)

  private def chunkBytes(b: Array[Byte], chunkSize: Int): Array[Byte] = {
    val out = new ByteArrayOutputStream(b.length + 64)
    var off = 0
    while (off < b.length) {
      val n = math.min(chunkSize, b.length - off)
      out.write(s"${n.toHexString}\r\n".getBytes("US-ASCII"))
      out.write(b, off, n)
      out.write(Crlf)
      off += n
    }
    out.write("0\r\n\r\n".getBytes("US-ASCII"))
    out.toByteArray
  }

  private def latin1Encodable(s: String): Boolean =
    java.nio.charset.StandardCharsets.ISO_8859_1.newEncoder().canEncode(s)

  /** Build one HTTP/1.1 200 message for `html`, layered per `variant`:
    * 0 plain UTF-8; 1 chunked; 2 gzip Content-Encoding; 3 ISO-8859-1
    * header charset when the page is encodable (else chunked + gzip
    * stacked — both layers at once, decoded innermost-last on read);
    * 4 NO header charset, the page declaring itself via an injected
    * `<meta charset>` tag (the HTML5 prescan path) when it has a head
    * and is latin-1 encodable, else the bare no-charset UTF-8 default;
    * 5 (r18) zstd Content-Encoding — the live web's third coding;
    * 6 (r18) BOM'd UTF-16LE body with NO header charset — only the BOM
    * identifies the encoding (the WHATWG sniff order's first step).
    */
  private def httpMessage(html: String, variant: Int): Array[Byte] = {
    val latin1 = variant == 3 && latin1Encodable(html)
    val meta = variant == 4 && latin1Encodable(html) && html.contains("<head>")
    val htmlOut =
      if (meta)
        html.replaceFirst("<head>",
          "<head><meta charset=\"iso-8859-1\">")
      else html
    val charsetName = if (latin1) "iso-8859-1" else "utf-8"
    val raw =
      if (variant == 6)
        // BOM then UTF-16LE code units — the body's only encoding signal
        Array[Byte](0xFF.toByte, 0xFE.toByte) ++
          htmlOut.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)
      else htmlOut.getBytes(
        if (latin1 || meta) "ISO-8859-1" else "UTF-8")
    val headers = new StringBuilder("HTTP/1.1 200 OK\r\n")
    if (variant == 4 || variant == 6) headers ++= "Content-Type: text/html\r\n"
    else headers ++= s"Content-Type: text/html; charset=$charsetName\r\n"
    val body: Array[Byte] = variant match {
      case 1 =>
        headers ++= "Transfer-Encoding: chunked\r\n"
        chunkBytes(raw, 300)
      case 2 =>
        val gz = gzipBytes(raw)
        headers ++= s"Content-Encoding: gzip\r\nContent-Length: ${gz.length}\r\n"
        gz
      case 3 if !latin1 =>
        headers ++= "Content-Encoding: gzip\r\nTransfer-Encoding: chunked\r\n"
        chunkBytes(gzipBytes(raw), 300)
      case 5 =>
        val z = com.github.luben.zstd.Zstd.compress(raw)
        headers ++= s"Content-Encoding: zstd\r\nContent-Length: ${z.length}\r\n"
        z
      case _ =>
        headers ++= s"Content-Length: ${raw.length}\r\n"
        raw
    }
    val out = new ByteArrayOutputStream(body.length + 128)
    out.write((headers.toString + "\r\n").getBytes("US-ASCII"))
    out.write(body)
    out.toByteArray
  }

  /** Build one `.warc.gz` file: a warcinfo member followed by one
    * response member per (uri, html) page, each page wrapped in an
    * HTTP/1.1 200 message whose entity layering cycles through the
    * real-crawl variants (see [[httpMessage]]).
    */
  def writeWarcGz(pages: Seq[(String, String)]): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    val info = "software: graft-fixture\r\nformat: WARC File Format 1.0\r\n"
      .getBytes("US-ASCII")
    out.write(gzipMember(record("warcinfo",
      Seq("Content-Type" -> "application/warc-fields"), info)))
    for (((uri, html), i) <- pages.zipWithIndex) {
      out.write(gzipMember(record("response",
        Seq("WARC-Target-URI" -> uri,
          "Content-Type" -> "application/http; msgtype=response"),
        httpMessage(html, i % 7))))
    }
    out.toByteArray
  }
}
