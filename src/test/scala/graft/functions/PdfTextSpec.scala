package graft.functions

import org.scalatest.funsuite.AnyFunSuite

/** PdfText pins. The golden fixtures under fixtures/pdf_golden are
  * written INDEPENDENTLY by tools/gen_pdf_fixture.py (raw bytes +
  * python zlib, not this code), so the extractor — xref resolution,
  * object/stream parsing, FlateDecode, page-tree walk, text operators
  * — is checked against bytes it did not produce. The writer's bytes
  * round-trip through the extractor.
  */
class PdfTextSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("fixtures/pdf_golden", name))

  test("extracts the independent fixture: nested page tree, TJ kerns, " +
      "quote shows, hex strings, escapes, split content streams, raw + " +
      "indirect-/Length streams, cp1252 bytes") {
    val txt = new String(fixture("manifest.json"), "UTF-8")
    val m = """"text": "((?:[^"\\]|\\.)*)"""".r.findFirstMatchIn(txt)
      .getOrElse(fail("manifest parse"))
    val want = m.group(1).replace("\\n", "\n").replace("\\\"", "\"")
    val bytes = fixture("rich.pdf")
    assert(PdfText.pageCount(bytes) == 3)
    assert(PdfText.extract(bytes) == want)
  }

  test("writer round trip: escapes, unicode, multi-line, multi-page") {
    val pages = Seq(
      Seq("plain first line", "second (with parens) and \\backslash",
        "unicode: café — ümläut ✓"),
      Seq("page two, single line"),
      Seq("", "empty first line above"))
    val pdf = PdfText.writePdf(pages)
    assert(new String(pdf.take(8), "US-ASCII").startsWith("%PDF-"))
    assert(PdfText.pageCount(pdf) == 3)
    assert(PdfText.extract(pdf) == pages.map(_.mkString("\n")).mkString("\n"))
  }

  test("Flate really is on the wire (round trip is not a plain-text echo)") {
    val pdf = PdfText.writePdf(Seq(Seq("the quick brown fox")))
    val s = new String(pdf, "ISO-8859-1")
    assert(s.contains("/FlateDecode"))
    assert(!s.contains("the quick brown fox"),
      "page text must not appear uncompressed in the file")
  }

  test("xref-STREAM golden (r18): /Type/XRef with W fields, /Index " +
      "subsections, PNG-Up predictor, ObjStm-compressed page tree, and " +
      "an indirect /Length resolved through a type-2 entry — text " +
      "identity with the classic-table golden") {
    val bytes = fixture("xrefstream.pdf")
    val pages = PdfText.extractPages(bytes)
    assert(pages.size == 3)
    assert(pages.mkString("\n") == PdfText.extract(fixture("rich.pdf")),
      "xref-stream framing must extract identically to the classic framing")
    // the 1.5 machinery is really on the wire
    val s = new String(bytes, "ISO-8859-1")
    assert(s.contains("/ObjStm") && s.contains("/XRef") &&
      s.contains("/Predictor 12"))
    assert(!s.contains("trailer"), "pure 1.5 file has no classic trailer")
  }

  test("HYBRID golden (r18): classic table whose trailer /XRefStm " +
      "supplies the type-2 entries (stream has precedence over the " +
      "table's free marks); TIFF predictor 2 on the supplemental stream") {
    val bytes = fixture("hybrid.pdf")
    val pages = PdfText.extractPages(bytes)
    assert(pages == Seq("hybrid xref resolved\nsecond line"))
    val s = new String(bytes, "ISO-8859-1")
    assert(s.contains("/XRefStm") && s.contains("/Predictor 2"))
  }

  test("writer round trip in the 1.5 framing: writePdfXrefStream is " +
      "text-identical to writePdf and really emits ObjStm + predictor") {
    val pages = Seq(
      Seq("plain first line", "second (with parens) and \\backslash",
        "unicode: café — ümläut ✓"),
      Seq("page two, single line"),
      Seq("", "empty first line above"))
    val pdf = PdfText.writePdfXrefStream(pages)
    assert(PdfText.extractPages(pdf).size == 3)
    assert(PdfText.extract(pdf) == PdfText.extract(PdfText.writePdf(pages)))
    val s = new String(pdf, "ISO-8859-1")
    assert(s.contains("/ObjStm") && s.contains("/Predictor 12"))
    assert(!s.contains("/Type /Catalog"),
      "catalog must live inside the compressed ObjStm, not in the clear")
  }

  test("filter CHAINS golden (r18): [ASCII85Decode, FlateDecode] applied " +
      "in array order, bare ASCIIHexDecode with embedded whitespace, " +
      "MSB-first LZWDecode through a 9->10-bit width bump, and " +
      "RunLengthDecode — python bytes the engine did not produce") {
    val pages = PdfText.extractPages(fixture("filters.pdf"))
    assert(pages.size == 4)
    assert(pages(0) == "ascii85 then flate survives\nwith a zero\u0000group maybe")
    assert(pages(1) == "hex page two")
    val lzwWant = (0 until 40).map(i =>
      f"lzw line $i%02d: alpha$i%02d beta${(i * 7) % 100}%02d gamma${(i * 13) % 100}%02d")
      .mkString("\n")
    assert(pages(2) == lzwWant, "LZW page (incl. the dictionary growth " +
      "behind the width bump) must decode exactly")
    assert(pages(3) == "rle page: aaaaaaaaaaaaaaaaaaaaaa then text")
    val s = new String(fixture("filters.pdf"), "ISO-8859-1")
    assert(s.contains("[/ASCII85Decode /FlateDecode]") &&
      s.contains("/ASCIIHexDecode") && s.contains("/LZWDecode") &&
      s.contains("/RunLengthDecode"))
    // malformed encodings reject loudly
    def badStream(filter: String, payload: String, msg: String): Unit = {
      val pdf = ("%PDF-1.4\n" +
        "1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n" +
        "2 0 obj\n<< /Type /Pages /Count 1 /Kids [3 0 R] >>\nendobj\n" +
        "3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\nendobj\n")
      val o4at = pdf.length
      val full = pdf +
        s"4 0 obj\n<< /Length ${payload.length} /Filter /$filter >>\n" +
        s"stream\n$payload\nendstream\nendobj\n"
      val offs = Seq(9, pdf.indexOf("2 0 obj"), pdf.indexOf("3 0 obj"), o4at)
      val xrefAt = full.length
      val tail = s"xref\n0 5\n0000000000 65535 f \n" +
        offs.map(o => f"$o%010d 00000 n \n").mkString +
        s"trailer\n<< /Size 5 /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n"
      val e = intercept[IllegalArgumentException](
        PdfText.extract((full + tail).getBytes("ISO-8859-1")))
      assert(e.getMessage.contains(msg), e.getMessage)
    }
    badStream("ASCIIHexDecode", "48656C6C", "missing '>' EOD")
    badStream("ASCII85Decode", "9jqo^", "missing '~>' EOD")
    badStream("ASCII85Decode", "uuuuu~>", "overflows 32 bits")
    badStream("RunLengthDecode", "\u0004hello", "ends without EOD")
    // LZW: clear(256) then code 300 — beyond the fresh 258-entry table
    badStream("LZWDecode", "\u0080\u004b\u0000", "beyond table")
  }

  test("ENCRYPTED golden (r19): the standard security handler with an " +
      "EMPTY user password decrypts — RC4-40 (V1/R2), RC4-128 (V2/R3), " +
      "AES-128-CBC (V4/R4 /AESV2 crypt filters), per-object keys over " +
      "independent python RC4/MD5/AES fixtures (AES pinned to the " +
      "FIPS-197 vector generator-side) — including an encrypted string " +
      "in the page dict; a REAL user password rejects loudly") {
    for ((f, label) <- Seq(("rc4_40.pdf", "rc4-40"),
        ("rc4_128.pdf", "rc4-128"), ("aes128.pdf", "aes-128"))) {
      val pages = PdfText.extractPages(fixture(f))
      assert(pages == Seq(s"$label secret line\nsecond line"), f)
    }
    val e = intercept[IllegalArgumentException](
      PdfText.extract(fixture("passworded.pdf")))
    assert(e.getMessage.contains("requires a user password"), e.getMessage)
  }

  test("degenerate /Encrypt, mistyped-startxref, and non-Flate files fail loudly") {
    // a bare << /Filter /Standard >> Encrypt dict has no key material
    val e1 = intercept[IllegalArgumentException](
      PdfText.extract(fixture("encrypted.pdf")))
    assert(e1.getMessage.contains("/Encrypt missing"), e1.getMessage)
    // startxref pointing at an object that is neither a table nor a
    // /Type/XRef stream (pre-r18 this doubled as the xref-stream reject)
    val e2 = intercept[IllegalArgumentException](
      PdfText.extract(fixture("notxref.pdf")))
    assert(e2.getMessage.contains("not /Type/XRef"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](
      PdfText.extract(fixture("badfilter.pdf")))
    assert(e3.getMessage.contains("unsupported stream filter"), e3.getMessage)
  }

  test("layoutLines: breaks replace exactly one space — mkString(\" \") " +
      "is the identity; runs of spaces are never broken") {
    val texts = Seq(
      "short",
      "a b c d e f",
      "word " * 40 + "tail",
      "double  space  runs stay  intact plus a veryverylongwordthatexceedswidthentirely ok",
      "")
    for (t <- texts; w <- Seq(1, 7, 60)) {
      val lines = PdfText.layoutLines(t, w)
      assert(lines.mkString(" ") == t, s"identity broke for '$t' at width $w")
    }
    // width is honored when a single-space boundary exists in range
    assert(PdfText.layoutLines("word " * 40 + "tail", 20)
      .forall(_.length <= 20))
  }

  test("shown strings with a FE FF BOM decode as UTF-16BE; EF BB BF " +
      "as BOM'd UTF-8 (ISO 32000 7.9.2.2) — not cp1252 garbage (r18)") {
    // hex string <FEFF 0412 0430> = UTF-16BE "\u0412\u0430"
    val content = "BT <FEFF04120430> Tj ET".getBytes("US-ASCII")
    assert(PdfText.extractPageText(content) == "\u0412\u0430")
    val utf8 = "BT (".getBytes("US-ASCII") ++
      Array[Byte](0xEF.toByte, 0xBB.toByte, 0xBF.toByte) ++
      "caf\u00e9".getBytes("UTF-8") ++ ") Tj ET".getBytes("US-ASCII")
    assert(PdfText.extractPageText(utf8) == "caf\u00e9")
    // and a BOM-less latin-1 byte string still falls back to cp1252
    assert(PdfText.extractPageText(
      Array[Byte]('B', 'T', ' ', '(', 0xE9.toByte, ')', ' ', 'T', 'j',
        ' ', 'E', 'T')) == "\u00e9")
  }

  test("FONT golden (r19): /Differences over WinAnsi (AGL + uniXXXX/uXXXXX " +
      "names, symbolic flag overridden by a declared /Encoding), named " +
      "Standard/MacRoman encodings with a mid-page Tf switch, a simple-font " +
      "/ToUnicode whose CMap WINS over the byte heuristic, and " +
      "Type0/Identity-H 2-byte CIDs through bfchar + incrementing and " +
      "ARRAY-form bfranges") {
    val bytes = fixture("fonts.pdf")
    val pages = PdfText.extractPages(bytes)
    assert(pages.size == 4)
    // /Differences: A->Eacute B->eacute a->uni0142 b->u1F600 (non-BMP);
    // 0x80/0xE9 fall through to the WinAnsi base
    assert(pages(0) == "Éé ł😀 €é")
    // StandardEncoding: 0x27 quoteright, 0x60 quoteleft, 0xAE/0xAF fi/fl;
    // then the SAME page switches fonts to MacRoman (0x8E = eacute)
    assert(pages(1) == "’std‘ ﬁﬂ\ncafé")
    // simple-font ToUnicode: bfchar 0x01 -> "Xy" (two-char destination),
    // bfrange maps codes 'A'..'Z' to 'a'..'z' — proof the CMap is
    // consulted instead of any byte heuristic
    assert(pages(2) == "Xyabc")
    // Type0: <0001>H, bfrange <0002>-<0004>->e.., array bfrange "ll"/"o"
    assert(pages(3) == "Hello\nfg")
  }

  test("font rejects (r19): used fonts with no public mapping fail " +
      "loudly instead of emitting cp1252 guesswork") {
    val e1 = intercept[IllegalArgumentException](
      PdfText.extract(fixture("badfont.pdf")))
    assert(e1.getMessage.contains("symbolic font with neither"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      PdfText.extract(fixture("badglyph.pdf")))
    assert(e2.getMessage.contains("no public Unicode mapping"), e2.getMessage)
    val e3 = intercept[IllegalArgumentException](
      PdfText.extract(fixture("notounicode.pdf")))
    assert(e3.getMessage.contains("Type0 without /ToUnicode"), e3.getMessage)
  }

  test("writer round trip in the Type0 framing (r19): writePdfType0 is " +
      "text-identical to writePdf — incl. non-BMP text through " +
      "surrogate-pair /ToUnicode destinations — and the text is never " +
      "in the clear (2-byte CID hex show strings)") {
    val pages = Seq(
      Seq("plain first line", "unicode: café — ümläut ✓",
        "astral: 😀 ok"),
      Seq("page two, single line"))
    val pdf = PdfText.writePdfType0(pages)
    assert(PdfText.pageCount(pdf) == 2)
    assert(PdfText.extract(pdf) == PdfText.extract(PdfText.writePdf(pages)))
    val s = new String(pdf, "ISO-8859-1")
    assert(s.contains("/Identity-H") && s.contains("/ToUnicode") &&
      s.contains("/CIDFontType2"))
    assert(!s.contains("plain first line"),
      "show strings are CID hex, so source text must not appear verbatim")
  }

  test("a reference CYCLE fails loudly, not with a stack overflow (r18)") {
    // hand-built file: object 1 (catalog) points /Pages at 2; 2 and 3
    // reference each other in a loop
    val body = new StringBuilder("%PDF-1.4\n")
    val offs = scala.collection.mutable.ArrayBuffer.empty[Int]
    def obj(s: String): Unit = { offs += body.length; body ++= s }
    obj("1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n")
    obj("2 0 obj\n3 0 R\nendobj\n")
    obj("3 0 obj\n2 0 R\nendobj\n")
    val xrefAt = body.length
    body ++= s"xref\n0 4\n0000000000 65535 f \n"
    offs.foreach(o => body ++= f"$o%010d 00000 n \n")
    body ++= s"trailer\n<< /Size 4 /Root 1 0 R >>\nstartxref\n$xrefAt\n%%EOF\n"
    val e = intercept[IllegalArgumentException](
      PdfText.extract(body.toString.getBytes("ISO-8859-1")))
    assert(e.getMessage.contains("circular reference"), e.getMessage)
  }

  test("malformed files fail loudly") {
    def bad(b: Array[Byte], msg: String): Unit = {
      val e = intercept[IllegalArgumentException](PdfText.extract(b))
      assert(e.getMessage.contains(msg), e.getMessage)
    }
    bad("not a pdf at all".getBytes("US-ASCII"), "missing %PDF- header")
    bad("%PDF-1.4\nno tail".getBytes("US-ASCII"), "missing startxref")
    val good = PdfText.writePdf(Seq(Seq("x")))
    // corrupt the startxref offset to point into the void
    val s = new String(good, "ISO-8859-1")
    val at = s.lastIndexOf("startxref")
    val mangled = (s.substring(0, at) + "startxref\n99999999\n%%EOF\n")
      .getBytes("ISO-8859-1")
    bad(mangled, "out of range")
    // truncate the flate stream body
    val zAt = s.indexOf("stream\n") + 7
    val cut = good.take(zAt + 4) ++ good.drop(zAt + 12)
    // (xref offsets now lie, but the header/startxref still parse; any
    // loud failure is acceptable — pin the prefix)
    val e = intercept[IllegalArgumentException](PdfText.extract(cut))
    assert(e.getMessage.startsWith("malformed PDF"), e.getMessage)
  }
}
