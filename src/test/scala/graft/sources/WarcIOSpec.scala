package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.warc.WarcIO
import WarcIO._

class WarcIOSpec extends AnyFunSuite {

  private val pages = Seq(
    // seven pages on purpose: writeWarcGz cycles the entity layerings
    // (plain / chunked / gzip / latin-1-header / meta-charset / zstd /
    // BOM'd UTF-16LE) per page index, so this fixture exercises every
    // variant
    "http://example.test/doc/0" -> "<html><body><p>hello world</p></body></html>",
    "http://example.test/doc/1" -> "<html><body><p>café ümläut</p></body></html>",
    "http://example.test/doc/2" -> "<html><body><p>third page with some more text</p></body></html>",
    "http://example.test/doc/3" -> "<html><body><p>vierte Seite: naïve café</p></body></html>",
    "http://example.test/doc/4" -> "<html><head><title>T</title></head><body><p>pâge déclarée</p></body></html>",
    "http://example.test/doc/5" -> "<html><body><p>zstd compressed sixth page</p></body></html>",
    "http://example.test/doc/6" -> "<html><body><p>UTF-16 seventh: ✓ काफी 页面</p></body></html>")

  test("warc.gz round trip: warcinfo + responses, uris and bodies intact " +
      "through chunked / gzip / charset / meta-charset / zstd / BOM layers") {
    val bytes = writeWarcGz(pages)
    val records = readWarcGz(bytes).toSeq
    assert(records.size == 8)
    assert(records.head.warcType == "warcinfo")
    val resp = records.tail
    assert(resp.forall(_.warcType == "response"))
    assert(resp.map(_.targetUri.get) == pages.map(_._1))
    val entities = resp.map(r => httpEntity(r.payload))
    assert(entities.forall(_.status == 200))
    for (((e, (_, html)), i) <- entities.zip(pages).zipWithIndex if i != 4)
      assert(e.text == html, s"text fidelity through the entity layers (page $i)")
    // the layers really are present on the wire: page 1 chunked, page 2
    // gzip'd, page 3 latin-1 (it is ISO-8859-1 encodable)
    assert(entities(1).headers.contains("transfer-encoding") ||
      httpEntityRaw(resp(1)).contains("chunked"))
    assert(httpEntityRaw(resp(2)).contains("Content-Encoding: gzip"))
    assert(httpEntityRaw(resp(3)).contains("charset=iso-8859-1"))
    assert(entities(3).charset == java.nio.charset.StandardCharsets.ISO_8859_1)
    // page 4: NO header charset — the body's injected <meta charset>
    // declares ISO-8859-1 and the sniffer must honor it (the bytes are
    // genuinely latin-1: the é is a single 0xE9)
    assert(!httpEntityRaw(resp(4)).toLowerCase.contains("charset="))
    assert(entities(4).charset == java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(entities(4).text ==
      "<html><head><meta charset=\"iso-8859-1\"><title>T</title></head>" +
        "<body><p>pâge déclarée</p></body></html>")
    // page 5 (r18): zstd content coding really on the wire
    assert(httpEntityRaw(resp(5)).contains("Content-Encoding: zstd"))
    // page 6 (r18): no header charset, no (visible) meta — the BOM is
    // the only encoding signal, and the body on the wire is 16-bit
    assert(!httpEntityRaw(resp(6)).toLowerCase.contains("charset="))
    assert(entities(6).charset == java.nio.charset.StandardCharsets.UTF_16LE)
  }

  /** The pre-decode header block of a response payload, for pinning
    * what the WRITER put on the wire.
    */
  private def httpEntityRaw(r: WarcRecord): String = {
    val s = new String(r.payload, "ISO-8859-1")
    s.substring(0, s.indexOf("\r\n\r\n"))
  }

  test("the file is CONCATENATED gzip members, one per record") {
    val bytes = writeWarcGz(pages)
    var members = 0
    var i = 0
    while (i + 2 < bytes.length) {
      if ((bytes(i) & 0xff) == 0x1f && (bytes(i + 1) & 0xff) == 0x8b &&
          bytes(i + 2) == 8) members += 1
      i += 1
    }
    assert(members >= 5, s"expected >=5 gzip members, found $members")
  }

  // ------------------------------------------------------------------
  // Incrementality: the walk must be bounded by the largest single
  // record, never the decompressed file (a real ~1 GB .warc.gz
  // decompresses past the 2 GB JVM array cap).
  // ------------------------------------------------------------------

  private def rawRecord(warcType: String, payload: Array[Byte],
      extra: Seq[(String, String)] = Nil): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    def put(s: String): Unit = bos.write((s + "\r\n").getBytes("US-ASCII"))
    put("WARC/1.0"); put(s"WARC-Type: $warcType")
    extra.foreach { case (k, v) => put(s"$k: $v") }
    put(s"Content-Length: ${payload.length}"); put("")
    bos.write(payload); put(""); put("")
    bos.toByteArray
  }

  private def gz(b: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val g = new java.util.zip.GZIPOutputStream(bos)
    g.write(b); g.close(); bos.toByteArray
  }

  /** 150 members × 64 KiB of incompressible payload: total decompressed
    * (~9.4 MiB) exceeds any one member by >100×.
    */
  private def bigWarcGz(nRecords: Int = 150): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    for (k <- 0 until nRecords) {
      // genuinely incompressible payload (seeded PRNG), so each gzip
      // member stays ~64 KiB on the wire and the consumed-bytes pin
      // below measures the WALK, not compression luck
      val payload = new Array[Byte](64 << 10)
      new java.util.Random(k.toLong).nextBytes(payload)
      out.write(gz(rawRecord("resource", payload)))
    }
    out.toByteArray
  }

  test("the record walk is INCREMENTAL: emitting record 1 consumes ~one " +
      "gzip member of input, not the whole file") {
    val bytes = bigWarcGz()
    var consumed = 0L
    val counting = new java.io.FilterInputStream(
        new java.io.ByteArrayInputStream(bytes)) {
      override def read(): Int = {
        val r = super.read(); if (r >= 0) consumed += 1; r
      }
      override def read(b: Array[Byte], off: Int, len: Int): Int = {
        val r = super.read(b, off, len); if (r > 0) consumed += r; r
      }
    }
    val it = readWarcGzStream(counting)
    val first = it.next()
    assert(first.payload.length == 64 << 10)
    // one ~64 KiB member + the inflater's 64 KiB read-ahead buffer —
    // nowhere near the full compressed file
    assert(consumed < bytes.length / 20,
      s"consumed $consumed of ${bytes.length} compressed bytes for record 1")
    assert(it.size == 149, "the rest of the walk still completes")
  }

  test("parsing is LAZY: records before a corrupt tail are served; the " +
      "corruption only fails when the walk reaches it") {
    val good = bigWarcGz(10)
    val corrupt = good ++ gz("WARC/9.9\r\n\r\n\r\n\r\n".getBytes("US-ASCII"))
    val it = readWarcGz(corrupt)
    for (_ <- 0 until 10) assert(it.next().warcType == "resource",
      "good prefix must parse (whole-file parsing would have thrown already)")
    val e = intercept[IllegalArgumentException](it.hasNext)
    assert(e.getMessage.contains("bad version line"))
  }

  test("uncompressed parse is strict about framing") {
    def bad(b: Array[Byte], msg: String): Unit = {
      val e = intercept[IllegalArgumentException](parseWarc(b))
      assert(e.getMessage.contains(msg), e.getMessage)
    }
    val payload = "HTTP/1.1 200 OK\r\n\r\nhi".getBytes("US-ASCII")
    val good = ("WARC/1.0\r\nWARC-Type: response\r\n" +
      s"Content-Length: ${payload.length}\r\n\r\n").getBytes("US-ASCII") ++
      payload ++ "\r\n\r\n".getBytes("US-ASCII")
    assert(parseWarc(good).size == 1)
    bad("WARC/2.0\r\n".getBytes ++ good.drop(10), "bad version line")
    bad(("WARC/1.0\r\nWARC-Type: response\r\n\r\n\r\n\r\n").getBytes,
      "missing Content-Length")
    bad(good.dropRight(6), "exceeds stream") // payload truncated
    bad(good.dropRight(2), "missing record separator")
    // trailing garbage after the last separator is a framing error too
    bad(good ++ "x".getBytes, "malformed WARC")
    bad(good ++ "XXXX/9.9\r\n\r\n\r\n".getBytes, "bad version line")
  }

  // ------------------------------------------------------------------
  // HTTP entity decoding
  // ------------------------------------------------------------------

  test("httpEntity is strict about the status line, parses headers, and " +
      "passes identity bodies through") {
    intercept[IllegalArgumentException](
      httpEntity("FTP/1.0 200\r\n\r\n".getBytes("US-ASCII")))
    val e = httpEntity(
      "HTTP/1.1 404 Not Found\r\nX-Thing: y\r\n\r\ngone".getBytes("US-ASCII"))
    assert(e.status == 404 && new String(e.body, "US-ASCII") == "gone")
    assert(e.headers("x-thing") == "y")
    assert(e.charset == java.nio.charset.StandardCharsets.UTF_8,
      "UTF-8 default when no Content-Type charset")
  }

  test("chunked bodies are de-framed exactly (sizes in hex, extensions " +
      "tolerated, trailers consumed, bad framing loud)") {
    val body = "0005;ext=1\r\nhello\r\nb\r\n, chunked w\r\n4\r\norld\r\n" +
      "0\r\nX-Trailer: t\r\n\r\n"
    val msg = ("HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n" + body)
      .getBytes("US-ASCII")
    assert(new String(httpEntity(msg).body, "US-ASCII") == "hello, chunked world")
    val badSize = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\nzz\r\nhi\r\n0\r\n\r\n"
    val e1 = intercept[IllegalArgumentException](
      httpEntity(badSize.getBytes("US-ASCII")))
    assert(e1.getMessage.contains("bad chunk size"))
    val trailing = "HTTP/1.1 200 OK\r\nTransfer-Encoding: chunked\r\n\r\n2\r\nhi\r\n0\r\n\r\nJUNK"
    val e2 = intercept[IllegalArgumentException](
      httpEntity(trailing.getBytes("US-ASCII")))
    assert(e2.getMessage.contains("after last chunk"))
  }

  test("gzip and deflate content codings are inflated; unknown codings " +
      "and charsets fail loudly") {
    val text = "compressed entity body"
    val gzMsgOut = new java.io.ByteArrayOutputStream()
    gzMsgOut.write("HTTP/1.1 200 OK\r\nContent-Encoding: gzip\r\n\r\n"
      .getBytes("US-ASCII"))
    gzMsgOut.write(gz(text.getBytes("UTF-8")))
    assert(new String(httpEntity(gzMsgOut.toByteArray).body, "UTF-8") == text)

    val deflated = {
      val bos = new java.io.ByteArrayOutputStream()
      val d = new java.util.zip.DeflaterOutputStream(bos)
      d.write(text.getBytes("UTF-8")); d.close(); bos.toByteArray
    }
    val dfMsgOut = new java.io.ByteArrayOutputStream()
    dfMsgOut.write("HTTP/1.1 200 OK\r\nContent-Encoding: deflate\r\n\r\n"
      .getBytes("US-ASCII"))
    dfMsgOut.write(deflated)
    assert(new String(httpEntity(dfMsgOut.toByteArray).body, "UTF-8") == text)

    // brotli rejects BY NAME (r18): common on the live web, no
    // JDK/Spark-classpath decoder — the reason must say what it is
    val e1 = intercept[IllegalArgumentException](httpEntity(
      "HTTP/1.1 200 OK\r\nContent-Encoding: br\r\n\r\nx".getBytes("US-ASCII")))
    assert(e1.getMessage.contains("brotli"), e1.getMessage)
    val e0 = intercept[IllegalArgumentException](httpEntity(
      "HTTP/1.1 200 OK\r\nContent-Encoding: lzma\r\n\r\nx".getBytes("US-ASCII")))
    assert(e0.getMessage.contains("unsupported Content-Encoding"))
    val e2 = intercept[IllegalArgumentException](httpEntity(
      "HTTP/1.1 200 OK\r\nTransfer-Encoding: gzip\r\n\r\nx".getBytes("US-ASCII")))
    assert(e2.getMessage.contains("unsupported Transfer-Encoding"))
    val e3 = intercept[IllegalArgumentException](httpEntity(
      "HTTP/1.1 200 OK\r\nContent-Type: text/html; charset=klingon-8\r\n\r\nx"
        .getBytes("US-ASCII")))
    assert(e3.getMessage.contains("unsupported charset"))
  }

  test("zstd content coding decodes (r18: the live web's third coding, " +
      "via the Spark-classpath zstd) and a corrupt frame fails loudly") {
    val text = "zstd entity body: repeated repeated repeated payload"
    val z = com.github.luben.zstd.Zstd.compress(text.getBytes("UTF-8"))
    val out = new java.io.ByteArrayOutputStream()
    out.write("HTTP/1.1 200 OK\r\nContent-Encoding: zstd\r\n\r\n"
      .getBytes("US-ASCII"))
    out.write(z)
    assert(new String(httpEntity(out.toByteArray).body, "UTF-8") == text)
    val e = intercept[IllegalArgumentException](httpEntity(
      "HTTP/1.1 200 OK\r\nContent-Encoding: zstd\r\n\r\nnot a zstd frame"
        .getBytes("US-ASCII")))
    assert(e.getMessage.contains("bad zstd entity"), e.getMessage)
  }

  test("BOM wins the charset-sniff order (r18): UTF-16LE/BE/UTF-8 BOMs " +
      "beat the header charset and the meta prescan; the BOM is stripped") {
    val html = "<html><body><p>BOM page: ✓ काफी</p></body></html>"
    def msg(headers: String, body: Array[Byte]): Array[Byte] = {
      val out = new java.io.ByteArrayOutputStream()
      out.write(s"HTTP/1.1 200 OK\r\n$headers\r\n".getBytes("US-ASCII"))
      out.write(body)
      out.toByteArray
    }
    // UTF-16LE BOM, NO header charset: the ASCII meta prescan cannot
    // see a 16-bit page — only the BOM identifies it
    val le = httpEntity(msg("Content-Type: text/html\r\n",
      Array[Byte](0xFF.toByte, 0xFE.toByte) ++
        html.getBytes(java.nio.charset.StandardCharsets.UTF_16LE)))
    assert(le.charset == java.nio.charset.StandardCharsets.UTF_16LE)
    assert(le.text == html)
    // UTF-16BE BOM beats a WRONG header charset (WHATWG order)
    val be = httpEntity(msg(
      "Content-Type: text/html; charset=iso-8859-1\r\n",
      Array[Byte](0xFE.toByte, 0xFF.toByte) ++
        html.getBytes(java.nio.charset.StandardCharsets.UTF_16BE)))
    assert(be.charset == java.nio.charset.StandardCharsets.UTF_16BE)
    assert(be.text == html)
    // UTF-8 BOM: stripped, not decoded as a leading U+FEFF
    val u8 = httpEntity(msg("Content-Type: text/html\r\n",
      Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
        html.getBytes("UTF-8")))
    assert(u8.charset == java.nio.charset.StandardCharsets.UTF_8)
    assert(u8.text == html)
  }

  test("charset is honored: latin-1 bytes decode to the same text") {
    val html = "<p>café ümläut</p>"
    val out = new java.io.ByteArrayOutputStream()
    out.write(("HTTP/1.1 200 OK\r\nContent-Type: text/html; " +
      "charset=ISO-8859-1\r\n\r\n").getBytes("US-ASCII"))
    out.write(html.getBytes("ISO-8859-1"))
    val e = httpEntity(out.toByteArray)
    assert(e.charset == java.nio.charset.StandardCharsets.ISO_8859_1)
    assert(e.text == html)
    // and the bytes really differ from UTF-8 (é is ONE byte here)
    assert(e.body.length == html.getBytes("ISO-8859-1").length)
    assert(e.body.length < html.getBytes("UTF-8").length)
  }
}
