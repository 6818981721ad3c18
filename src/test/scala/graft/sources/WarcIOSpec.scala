package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.warc.WarcIO
import WarcIO._

class WarcIOSpec extends AnyFunSuite {

  private val pages = Seq(
    "http://example.test/doc/0" -> "<html><body><p>hello world</p></body></html>",
    "http://example.test/doc/1" -> "<html><body><p>café ümläut</p></body></html>",
    "http://example.test/doc/2" -> "<html><body><p>third</p></body></html>")

  test("warc.gz round trip: warcinfo + responses, uris and bodies intact") {
    val bytes = writeWarcGz(pages)
    val records = readWarcGz(bytes)
    assert(records.size == 4)
    assert(records.head.warcType == "warcinfo")
    val resp = records.tail
    assert(resp.forall(_.warcType == "response"))
    assert(resp.map(_.targetUri.get) == pages.map(_._1))
    for ((r, (_, html)) <- resp.zip(pages)) {
      val (code, body) = httpBody(r.payload)
      assert(code == 200)
      assert(new String(body, "UTF-8") == html, "UTF-8 body fidelity")
    }
  }

  test("the file is CONCATENATED gzip members, one per record") {
    val bytes = writeWarcGz(pages)
    // count gzip member magics at member starts: every record boundary
    // begins a fresh member (1f 8b 08)
    var members = 0
    var i = 0
    while (i + 2 < bytes.length) {
      if ((bytes(i) & 0xff) == 0x1f && (bytes(i + 1) & 0xff) == 0x8b &&
          bytes(i + 2) == 8) members += 1
      i += 1
    }
    assert(members >= 4, s"expected >=4 gzip members, found $members")
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

  test("httpBody is strict about the status line") {
    intercept[IllegalArgumentException](
      httpBody("FTP/1.0 200\r\n\r\n".getBytes("US-ASCII")))
    val (code, body) =
      httpBody("HTTP/1.1 404 Not Found\r\nX: y\r\n\r\ngone".getBytes("US-ASCII"))
    assert(code == 404 && new String(body, "US-ASCII") == "gone")
  }
}
