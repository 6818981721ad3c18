package graft.functions

import java.io.ByteArrayOutputStream
import java.util.zip.{Deflater, Inflater}

/** PDF text extraction — after HTML, the largest text modality in a
  * real crawl. Executor-side, JDK-only, loud failures: the
  * [[HtmlText]] discipline on ISO 32000's carrier format.
  *
  * Layout implemented: the classic cross-reference TABLE resolved from
  * `startxref` (with `/Prev` chains, newest entry wins), indirect
  * objects (`N G obj … endobj`) over the full object syntax —
  * dictionaries, arrays, names with `#xx` escapes, literal strings
  * with octal/char escapes and balanced parens, hex strings, refs —
  * streams framed by `/Length` (direct or indirect) and decoded
  * through `/FlateDecode` (the repo's existing zlib inflate), the
  * Catalog → `/Pages` → `/Kids` page-tree walk, and the content-stream
  * text operators: `BT`/`ET`, `Tj`, `TJ`, `'`, `"`, with `Td`/`TD`
  * (dy ≠ 0), `T*`, and `Tm` as line breaks. Shown bytes decode as
  * strict UTF-8 when valid, else Windows-1252 (the de-facto simple-
  * font byte encoding). Encrypted files, xref STREAMS (/Type/XRef),
  * non-Flate filters, predictors, and inline images fail loudly —
  * silently-wrong text is worse than no text in a training corpus.
  *
  * Scale shape: PDFs are SCAN INPUT (binaryFile rows or a bytes
  * column); extraction is a narrow per-document kernel — document
  * bytes never shuffle.
  */
object PdfText {

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"malformed PDF: $msg")

  // ------------------------------------------------------------------
  // Object model + lexer
  // ------------------------------------------------------------------

  final case class PRef(num: Int)
  final case class PName(v: String)
  final case class PStream(dict: Map[String, Any], raw: Array[Byte])

  private final class Lexer(b: Array[Byte], var p: Int) {
    def bytesLeft: Int = b.length - p

    def ws(): Unit = {
      var go = true
      while (go) {
        if (p < b.length && (b(p) == ' ' || b(p) == '\n' || b(p) == '\r' ||
            b(p) == '\t' || b(p) == '\f' || b(p) == 0)) p += 1
        else if (p < b.length && b(p) == '%') {
          while (p < b.length && b(p) != '\n' && b(p) != '\r') p += 1
        } else go = false
      }
    }

    def expect(s: String): Unit = {
      ws()
      if (!startsWith(s)) fail(s"expected '$s' at offset $p")
      p += s.length
    }

    def startsWith(s: String): Boolean =
      p + s.length <= b.length &&
        (0 until s.length).forall(i => b(p + i) == s.charAt(i))

    private def isDelim(c: Byte): Boolean =
      c == '(' || c == ')' || c == '<' || c == '>' || c == '[' || c == ']' ||
        c == '{' || c == '}' || c == '/' || c == '%'
    private def isWs(c: Byte): Boolean =
      c == ' ' || c == '\n' || c == '\r' || c == '\t' || c == '\f' || c == 0

    def keywordAhead(): String = {
      ws()
      var q = p
      while (q < b.length && !isWs(b(q)) && !isDelim(b(q))) q += 1
      new String(b, p, q - p, "US-ASCII")
    }

    def name(): PName = {
      // '/' already known present
      p += 1
      val sb = new java.lang.StringBuilder()
      while (p < b.length && !isWs(b(p)) && !isDelim(b(p))) {
        if (b(p) == '#' && p + 2 < b.length) {
          sb.append(Integer.parseInt(
            new String(b, p + 1, 2, "US-ASCII"), 16).toChar)
          p += 3
        } else { sb.append((b(p) & 0xff).toChar); p += 1 }
      }
      PName(sb.toString)
    }

    def literalString(): Array[Byte] = {
      // '(' already consumed by caller? No: consume here
      p += 1
      val out = new ByteArrayOutputStream()
      var depth = 1
      while (depth > 0) {
        if (p >= b.length) fail("unterminated literal string")
        val c = b(p)
        if (c == '\\') {
          p += 1
          if (p >= b.length) fail("dangling escape in string")
          b(p) match {
            case 'n' => out.write('\n'); p += 1
            case 'r' => out.write('\r'); p += 1
            case 't' => out.write('\t'); p += 1
            case 'b' => out.write('\b'); p += 1
            case 'f' => out.write('\f'); p += 1
            case '(' => out.write('('); p += 1
            case ')' => out.write(')'); p += 1
            case '\\' => out.write('\\'); p += 1
            case '\r' =>
              p += 1; if (p < b.length && b(p) == '\n') p += 1 // continuation
            case '\n' => p += 1 // continuation
            case d if d >= '0' && d <= '7' =>
              var v = 0; var n = 0
              while (n < 3 && p < b.length && b(p) >= '0' && b(p) <= '7') {
                v = v * 8 + (b(p) - '0'); p += 1; n += 1
              }
              out.write(v & 0xff)
            case other => out.write(other); p += 1 // \x -> x
          }
        } else if (c == '(') { depth += 1; out.write(c); p += 1 }
        else if (c == ')') {
          depth -= 1
          if (depth > 0) out.write(c)
          p += 1
        } else { out.write(c); p += 1 }
      }
      out.toByteArray
    }

    def hexString(): Array[Byte] = {
      // '<' consumed by caller context check; here p is at '<'
      p += 1
      val out = new ByteArrayOutputStream()
      var hi = -1
      var done = false
      while (!done) {
        if (p >= b.length) fail("unterminated hex string")
        val c = b(p)
        if (c == '>') { done = true; p += 1 }
        else if (isWs(c)) p += 1
        else {
          val v = Character.digit(c.toChar, 16)
          if (v < 0) fail(s"bad hex-string char '${c.toChar}'")
          if (hi < 0) hi = v else { out.write((hi << 4) | v); hi = -1 }
          p += 1
        }
      }
      if (hi >= 0) out.write(hi << 4) // odd count: pad 0
      out.toByteArray
    }

    /** One object-syntax value (no stream handling — caller's job). */
    def value(): Any = {
      ws()
      if (p >= b.length) fail("unexpected end of objects")
      val c = b(p)
      if (c == '/') name()
      else if (c == '(') literalString()
      else if (c == '<' && p + 1 < b.length && b(p + 1) == '<') {
        p += 2
        val m = Map.newBuilder[String, Any]
        var done = false
        while (!done) {
          ws()
          if (startsWith(">>")) { p += 2; done = true }
          else {
            if (p >= b.length || b(p) != '/') fail(s"dict key not a name at $p")
            val k = name().v
            m += (k -> value())
          }
        }
        m.result()
      }
      else if (c == '<') hexString()
      else if (c == '[') {
        p += 1
        val arr = Vector.newBuilder[Any]
        var done = false
        while (!done) {
          ws()
          if (p < b.length && b(p) == ']') { p += 1; done = true }
          else arr += value()
        }
        arr.result()
      }
      else if (c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9')) {
        // number — or an "N G R" indirect reference
        val save = p
        val n1 = numberToken()
        if (n1.isInstanceOf[Long]) {
          val save2 = p
          ws()
          if (p < b.length && b(p) >= '0' && b(p) <= '9') {
            val n2 = numberToken()
            ws()
            if (n2.isInstanceOf[Long] && p < b.length && b(p) == 'R' &&
                (p + 1 >= b.length || isWs(b(p + 1)) || isDelim(b(p + 1)))) {
              p += 1
              return PRef(n1.asInstanceOf[Long].toInt)
            }
          }
          p = save2
          n1
        } else { p = save; numberToken() }
      }
      else {
        val kw = keywordAhead()
        kw match {
          case "true" => p += 4; true
          case "false" => p += 5; false
          case "null" => p += 4; null
          case other => fail(s"unexpected token '$other' at $p")
        }
      }
    }

    def numberToken(): Any = {
      ws()
      val start = p
      if (p < b.length && (b(p) == '+' || b(p) == '-')) p += 1
      var isReal = false
      while (p < b.length &&
          ((b(p) >= '0' && b(p) <= '9') || b(p) == '.')) {
        if (b(p) == '.') isReal = true
        p += 1
      }
      val s = new String(b, start, p - start, "US-ASCII")
      if (s.isEmpty || s == "+" || s == "-") fail(s"bad number at $start")
      if (isReal) s.toDouble else s.toLong
    }
  }

  // ------------------------------------------------------------------
  // Document structure
  // ------------------------------------------------------------------

  private final class Doc(bytes: Array[Byte]) {
    private val (offsets, trailer) = readXref()
    private val cache = scala.collection.mutable.Map.empty[Int, Any]

    private def readXref(): (Map[Int, Long], Map[String, Any]) = {
      if (!new String(bytes, 0, math.min(8, bytes.length), "US-ASCII")
          .startsWith("%PDF-")) fail("missing %PDF- header")
      val tailStart = math.max(0, bytes.length - 2048)
      val tail = new String(bytes, tailStart, bytes.length - tailStart, "ISO-8859-1")
      val sx = tail.lastIndexOf("startxref")
      if (sx < 0) fail("missing startxref")
      val lx = new Lexer(bytes, tailStart + sx + "startxref".length)
      val first = lx.value() match {
        case n: Long => n
        case other => fail(s"bad startxref offset $other")
      }
      var offs = Map.empty[Int, Long]
      var trailerDict: Map[String, Any] = null
      var next = first
      var hops = 0
      while (next >= 0) {
        if (hops > 32) fail("xref /Prev chain too deep")
        hops += 1
        if (next > Int.MaxValue || next >= bytes.length)
          fail(s"xref offset $next out of range")
        val l = new Lexer(bytes, next.toInt)
        l.ws()
        if (!l.startsWith("xref"))
          fail("cross-reference STREAMS are unsupported (classic xref table required)")
        l.p += 4
        var parsingSections = true
        while (parsingSections) {
          l.ws()
          if (l.startsWith("trailer")) parsingSections = false
          else {
            val start = l.value() match {
              case n: Long => n.toInt
              case o => fail(s"bad xref subsection start $o")
            }
            val count = l.value() match {
              case n: Long => n.toInt
              case o => fail(s"bad xref subsection count $o")
            }
            l.ws()
            for (i <- 0 until count) {
              val entry = new String(bytes, l.p, 20, "US-ASCII")
              val off = entry.substring(0, 10).toLongOption
                .getOrElse(fail(s"bad xref entry '$entry'"))
              val kind = entry.charAt(17)
              // older entries must not override newer ones
              if (kind == 'n' && !offs.contains(start + i))
                offs += ((start + i) -> off)
              l.p += 20
            }
          }
        }
        l.expect("trailer")
        val t = l.value() match {
          case d: Map[String @unchecked, Any @unchecked] => d
          case o => fail(s"trailer is not a dict: $o")
        }
        if (trailerDict == null) trailerDict = t
        if (t.contains("Encrypt")) fail("encrypted PDFs are unsupported")
        next = t.get("Prev") match {
          case Some(n: Long) => n
          case Some(o) => fail(s"bad /Prev $o")
          case None => -1
        }
      }
      (offs, trailerDict)
    }

    def deref(v: Any): Any = v match {
      case PRef(num) => deref(load(num))
      case other => other
    }

    private def load(num: Int): Any = cache.getOrElseUpdate(num, {
      val off = offsets.getOrElse(num, fail(s"object $num not in xref"))
      val l = new Lexer(bytes, off.toInt)
      val gotNum = l.value() match {
        case n: Long => n.toInt
        case o => fail(s"bad object header at $off: $o")
      }
      if (gotNum != num) fail(s"xref points $num at object $gotNum")
      l.value() // generation
      l.expect("obj")
      val v = l.value()
      l.ws()
      if (l.startsWith("stream")) {
        val dict = v match {
          case d: Map[String @unchecked, Any @unchecked] => d
          case o => fail(s"stream without dict: $o")
        }
        l.p += "stream".length
        if (l.p < bytes.length && bytes(l.p) == '\r') l.p += 1
        if (l.p < bytes.length && bytes(l.p) == '\n') l.p += 1
        val len = deref(dict.getOrElse("Length", fail("stream missing /Length"))) match {
          case n: Long => n.toInt
          case o => fail(s"bad /Length $o")
        }
        if (l.p + len > bytes.length) fail(s"stream of $len exceeds file")
        val raw = java.util.Arrays.copyOfRange(bytes, l.p, l.p + len)
        l.p += len
        l.expect("endstream")
        PStream(dict, raw)
      } else v
    })

    def decodedStream(v: Any): Array[Byte] = deref(v) match {
      case PStream(dict, raw) =>
        if (dict.contains("DecodeParms"))
          fail("stream predictors (/DecodeParms) are unsupported")
        dict.get("Filter").map(deref) match {
          case None => raw
          case Some(PName("FlateDecode")) => inflate(raw)
          case Some(Vector(PName("FlateDecode"))) => inflate(raw)
          case Some(other) => fail(s"unsupported stream filter $other")
        }
      case o => fail(s"not a stream: $o")
    }

    /** Page content streams in document order. */
    def pageContents(): Seq[Array[Byte]] = {
      val root = deref(trailer.getOrElse("Root", fail("trailer missing /Root"))) match {
        case d: Map[String @unchecked, Any @unchecked] => d
        case o => fail(s"/Root is not a dict: $o")
      }
      val pagesRef = root.getOrElse("Pages", fail("catalog missing /Pages"))
      val out = Vector.newBuilder[Array[Byte]]
      def walk(node: Any): Unit = deref(node) match {
        case d: Map[String @unchecked, Any @unchecked] =>
          deref(d.getOrElse("Type", PName(""))) match {
            case PName("Pages") =>
              deref(d.getOrElse("Kids", fail("/Pages missing /Kids"))) match {
                case kids: Vector[Any @unchecked] => kids.foreach(walk)
                case o => fail(s"/Kids is not an array: $o")
              }
            case PName("Page") =>
              d.get("Contents").map(deref) match {
                case None => out += Array.emptyByteArray
                case Some(PStream(sd, raw)) =>
                  out += decodedStream(PStream(sd, raw))
                case Some(arr: Vector[Any @unchecked]) =>
                  // multiple content streams form ONE logical stream,
                  // separated by whitespace
                  val joined = new ByteArrayOutputStream()
                  arr.foreach { s =>
                    joined.write(decodedStream(s)); joined.write('\n')
                  }
                  out += joined.toByteArray
                case Some(o) => fail(s"bad /Contents: $o")
              }
            case o => fail(s"page-tree node of type $o")
          }
        case o => fail(s"page-tree node is not a dict: $o")
      }
      walk(pagesRef)
      out.result()
    }
  }

  private def inflate(raw: Array[Byte]): Array[Byte] = {
    val inf = new Inflater()
    inf.setInput(raw)
    val out = new ByteArrayOutputStream(raw.length * 4)
    val buf = new Array[Byte](8192)
    try {
      while (!inf.finished()) {
        val n = inf.inflate(buf)
        if (n == 0 && inf.needsInput()) fail("truncated FlateDecode stream")
        out.write(buf, 0, n)
      }
    } catch {
      case e: java.util.zip.DataFormatException =>
        fail(s"bad FlateDecode stream: ${e.getMessage}")
    } finally inf.end()
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // Content-stream text extraction
  // ------------------------------------------------------------------

  private def decodeShown(b: Array[Byte]): String = {
    // strict UTF-8 when valid, else Windows-1252 (the de-facto
    // simple-font single-byte encoding)
    val dec = java.nio.charset.StandardCharsets.UTF_8.newDecoder()
    try dec.decode(java.nio.ByteBuffer.wrap(b)).toString
    catch {
      case _: java.nio.charset.CharacterCodingException =>
        new String(b, java.nio.charset.Charset.forName("windows-1252"))
    }
  }

  /** Extract the text of ONE page's content stream: shown strings in
    * operator order, a '\n' at every line-break operator.
    */
  def extractPageText(content: Array[Byte]): String = {
    val l = new Lexer(content, 0)
    val lines = Vector.newBuilder[String]
    val cur = new java.lang.StringBuilder()
    val operands = scala.collection.mutable.ArrayBuffer.empty[Any]
    var inText = false
    var any = false
    // breaks are separators BETWEEN shown text: positioning before the
    // first show op (the initial Td) must not open with an empty line
    def newline(): Unit = if (any) {
      lines += cur.toString
      cur.setLength(0)
    }
    while ({ l.ws(); l.p < content.length }) {
      val c = content(l.p)
      if (c == '/' || c == '(' || c == '<' || c == '[' ||
          c == '+' || c == '-' || c == '.' || (c >= '0' && c <= '9')) {
        operands += l.value()
      } else {
        val op = l.keywordAhead()
        if (op.isEmpty) fail(s"stray delimiter '${c.toChar}' in content stream")
        l.p += op.length
        op match {
          case "BT" => inText = true
          case "ET" => inText = false
          case "BI" => fail("inline images (BI) are unsupported")
          case "Tj" if inText =>
            operands.lastOption match {
              case Some(b: Array[Byte]) => cur.append(decodeShown(b)); any = true
              case o => fail(s"Tj without a string operand: $o")
            }
          case "TJ" if inText =>
            operands.lastOption match {
              case Some(arr: Vector[Any @unchecked]) =>
                arr.foreach {
                  case b: Array[Byte] => cur.append(decodeShown(b)); any = true
                  case _: Long | _: Double => () // kerning adjustments
                  case o => fail(s"bad TJ element $o")
                }
              case o => fail(s"TJ without an array operand: $o")
            }
          case "'" if inText =>
            newline()
            operands.lastOption match {
              case Some(b: Array[Byte]) => cur.append(decodeShown(b)); any = true
              case o => fail(s"' without a string operand: $o")
            }
          case "\"" if inText =>
            newline()
            operands.lastOption match {
              case Some(b: Array[Byte]) => cur.append(decodeShown(b)); any = true
              case o => fail(s"\" without a string operand: $o")
            }
          case "Td" | "TD" if inText =>
            val dy = operands.lastOption match {
              case Some(n: Long) => n.toDouble
              case Some(d: Double) => d
              case o => fail(s"$op without numeric operands: $o")
            }
            if (dy != 0.0) newline()
          case "T*" if inText => newline()
          case "Tm" if inText => newline()
          case _ => () // graphics/state operators: ignored
        }
        operands.clear()
      }
    }
    newline()
    lines.result().mkString("\n")
  }

  /** Whole-document text: pages joined with '\n'. */
  def extract(bytes: Array[Byte]): String =
    new Doc(bytes).pageContents().map(extractPageText).mkString("\n")

  /** Number of pages (a cheap structural probe). */
  def pageCount(bytes: Array[Byte]): Int = new Doc(bytes).pageContents().size

  // ------------------------------------------------------------------
  // Writer (fixture path): a real two-object-tree PDF with
  // Flate-compressed content streams, correct xref offsets, and the
  // text as one Tj per line with TD line breaks — so every reader must
  // prove extraction survives compression, string escaping, and the
  // operator walk.
  // ------------------------------------------------------------------

  private def escapeString(s: String): Array[Byte] = {
    val utf8 = s.getBytes("UTF-8")
    val out = new ByteArrayOutputStream(utf8.length + 8)
    utf8.foreach { b =>
      if (b == '(' || b == ')' || b == '\\') { out.write('\\'); out.write(b) }
      else if (b == '\n') out.write("\\n".getBytes("US-ASCII"))
      else if (b == '\r') out.write("\\r".getBytes("US-ASCII"))
      else out.write(b)
    }
    out.toByteArray
  }

  private def deflate(b: Array[Byte]): Array[Byte] = {
    val d = new Deflater()
    d.setInput(b); d.finish()
    val out = new ByteArrayOutputStream(b.length / 2 + 64)
    val buf = new Array[Byte](8192)
    while (!d.finished()) out.write(buf, 0, d.deflate(buf))
    d.end()
    out.toByteArray
  }

  /** Greedy line layout at single-space boundaries (never inside a run
    * of spaces): every break replaces exactly one ' ', so
    * `lines.mkString(" ")` reproduces the input byte-for-byte — the
    * invariant that lets an extraction oracle replay a laid-out
    * document as plain text identity.
    */
  def layoutLines(text: String, width: Int): Seq[String] = {
    require(width > 0, s"width must be positive, got $width")
    val breaks = (1 until math.max(1, text.length - 1)).filter { i =>
      text.charAt(i) == ' ' &&
        text.charAt(i - 1) != ' ' && text.charAt(i + 1) != ' '
    }
    val out = Vector.newBuilder[String]
    var start = 0
    while (start < text.length) {
      val inRange = breaks.filter(b => b > start && b <= start + width)
      val cut =
        if (start + width >= text.length) -1
        else if (inRange.nonEmpty) inRange.last
        else breaks.find(_ > start).getOrElse(-1)
      if (cut < 0) { out += text.substring(start); start = text.length }
      else { out += text.substring(start, cut); start = cut + 1 }
    }
    val r = out.result()
    if (r.isEmpty) Seq("") else r
  }

  /** Build one PDF: one page per element of `pages`, each page's lines
    * shown as `Tj` + `TD` breaks inside a Flate-compressed content
    * stream.
    */
  def writePdf(pages: Seq[Seq[String]]): Array[Byte] = {
    require(pages.nonEmpty, "PDF writer needs at least one page")
    val out = new ByteArrayOutputStream()
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Long]
    def obj(body: Array[Byte]): Unit = {
      offsets += out.size().toLong
      out.write(s"${offsets.size} 0 obj\n".getBytes("US-ASCII"))
      out.write(body)
      out.write("\nendobj\n".getBytes("US-ASCII"))
    }
    out.write("%PDF-1.4\n%âãÏÓ\n".getBytes("ISO-8859-1"))
    // object numbering: 1 catalog, 2 pages, 3 font, then per page
    // 2 objects (page, contents)
    val nPages = pages.size
    val kidNums = (0 until nPages).map(i => 4 + 2 * i)
    obj(("<< /Type /Catalog /Pages 2 0 R >>").getBytes("US-ASCII"))
    obj((s"<< /Type /Pages /Count $nPages /Kids [" +
      kidNums.map(n => s"$n 0 R").mkString(" ") + "] >>").getBytes("US-ASCII"))
    obj(("<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>")
      .getBytes("US-ASCII"))
    for ((lines, i) <- pages.zipWithIndex) {
      val contentNum = 4 + 2 * i + 1
      obj((s"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] " +
        s"/Resources << /Font << /F1 3 0 R >> >> " +
        s"/Contents $contentNum 0 R >>").getBytes("US-ASCII"))
      val content = new ByteArrayOutputStream()
      content.write("BT /F1 12 Tf 72 720 Td\n".getBytes("US-ASCII"))
      for ((line, j) <- lines.zipWithIndex) {
        if (j > 0) content.write("0 -14 TD\n".getBytes("US-ASCII"))
        content.write('(')
        content.write(escapeString(line))
        content.write(") Tj\n".getBytes("US-ASCII"))
      }
      content.write("ET".getBytes("US-ASCII"))
      val z = deflate(content.toByteArray)
      val head = s"<< /Length ${z.length} /Filter /FlateDecode >>\nstream\n"
      offsets += out.size().toLong
      out.write(s"${offsets.size} 0 obj\n".getBytes("US-ASCII"))
      out.write(head.getBytes("US-ASCII"))
      out.write(z)
      out.write("\nendstream\nendobj\n".getBytes("US-ASCII"))
    }
    val xrefAt = out.size()
    val n = offsets.size
    out.write(s"xref\n0 ${n + 1}\n".getBytes("US-ASCII"))
    out.write("0000000000 65535 f \n".getBytes("US-ASCII"))
    offsets.foreach { o =>
      out.write(f"$o%010d 00000 n \n".getBytes("US-ASCII"))
    }
    out.write((s"trailer\n<< /Size ${n + 1} /Root 1 0 R >>\n" +
      s"startxref\n$xrefAt\n%%EOF\n").getBytes("US-ASCII"))
    out.toByteArray
  }
}
