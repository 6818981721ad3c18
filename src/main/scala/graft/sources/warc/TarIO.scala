package graft.sources.warc

/** USTAR (POSIX.1-1988 tar) reader/writer with pax (POSIX.1-2001)
  * long-name support — the shard container multimodal training sets
  * actually ship in: the WebDataset convention stores a sample as
  * adjacent members `{key}.jpg` + `{key}.json` inside plain `.tar`
  * shards, streamed sequentially at training time. Executor-side,
  * JDK-only, loud failures, the [[WarcIO]] discipline on the
  * 512-byte-block format: header checksums are VERIFIED, octal size
  * fields parsed strictly, data padded to block boundaries, the
  * two-zero-block terminator required. Pax `x` members are PARSED and
  * their `path=` record overrides the next member's name, and GNU `L`
  * longname members do the same (WebDataset keys routinely exceed
  * USTAR's 100+155 name/prefix limits and real shards ship BOTH
  * conventions); global `g` members are parsed and rejected loudly if
  * they try to set a path; other special types fail loudly.
  *
  * Scale shape: shards are SCAN INPUT (one binaryFile row per shard);
  * the member walk is an INCREMENTAL per-shard iterator — one member's
  * payload resident at a time, never the whole shard expanded — and
  * payloads never shuffle.
  */
object TarIO {

  final case class TarEntry(name: String, bytes: Array[Byte])

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"malformed tar: $msg")

  private def octal(b: Array[Byte], off: Int, len: Int, what: String): Long = {
    var i = off
    val end = off + len
    // leading spaces/NULs tolerated, terminated by space or NUL
    while (i < end && (b(i) == ' ' || b(i) == 0)) i += 1
    var v = 0L
    var any = false
    while (i < end && b(i) != ' ' && b(i) != 0) {
      val c = b(i)
      if (c < '0' || c > '7') fail(s"non-octal $what field")
      v = v * 8 + (c - '0')
      any = true
      i += 1
    }
    if (!any) fail(s"empty $what field")
    v
  }

  private def headerChecksum(h: Array[Byte], off: Int): Long = {
    var sum = 0L
    var i = 0
    while (i < 512) {
      // the checksum field itself (148-155) counts as spaces
      sum += (if (i >= 148 && i < 156) ' ' else h(off + i) & 0xff)
      i += 1
    }
    sum
  }

  /** Parse a pax extended-header payload: repeated `len key=value\n`
    * records where `len` is the DECIMAL byte length of the whole
    * record including itself and the newline, value UTF-8. Returns the
    * `path` override when present; rejects a global (`g`) path loudly
    * — a blanket rename of every following member is never what a
    * shard reader should silently apply.
    */
  private def paxPath(payload: Array[Byte], global: Boolean): Option[String] = {
    var path: Option[String] = None
    var i = 0
    while (i < payload.length) {
      var j = i
      while (j < payload.length && payload(j) >= '0' && payload(j) <= '9') j += 1
      if (j == i || j >= payload.length || payload(j) != ' ')
        fail("bad pax record length")
      val len = new String(payload, i, j - i, "US-ASCII").toInt
      if (len <= j - i + 1 || i + len > payload.length ||
          payload(i + len - 1) != '\n')
        fail("bad pax record framing")
      val body = new String(payload, j + 1, i + len - 1 - (j + 1), "UTF-8")
      val eq = body.indexOf('=')
      if (eq < 0) fail(s"bad pax record '$body' (no '=')")
      if (body.substring(0, eq) == "path") {
        if (global) fail("global pax 'path' override unsupported")
        path = Some(body.substring(eq + 1))
      }
      i += len
    }
    path
  }

  /** Walk a tar stream into its regular-file entries, INCREMENTALLY:
    * the iterator verifies each header checksum as it advances and
    * holds one member payload at a time. Skips directories (type '5');
    * parses pax 'x' members and applies their `path=` override to the
    * next member; parses 'g' members (loud on a global path); rejects
    * other special types loudly.
    */
  def readTar(bytes: Array[Byte]): Iterator[TarEntry] = new Iterator[TarEntry] {
    private var p = 0
    private var finished = false
    private var pending: TarEntry = _
    private var pathOverride: Option[String] = None

    private def advance(): Unit = {
      while (pending == null && !finished) {
        if (p + 512 > bytes.length) fail("truncated header block")
        // terminator: a zero block (spec asks for two; require both)
        if ((0 until 512).forall(i => bytes(p + i) == 0)) {
          if (p + 1024 > bytes.length ||
              !(512 until 1024).forall(i => bytes(p + i) == 0))
            fail("single zero block — tar requires two terminator blocks")
          if (pathOverride.isDefined)
            fail("pax/longname path override with no following member")
          finished = true
        } else {
          val stored = octal(bytes, p + 148, 8, "checksum")
          val actual = headerChecksum(bytes, p)
          if (stored != actual)
            fail(s"header checksum mismatch at offset $p ($stored != $actual)")
          var nameEnd = p
          while (nameEnd < p + 100 && bytes(nameEnd) != 0) nameEnd += 1
          var name = new String(bytes, p, nameEnd - p, "US-ASCII")
          // USTAR prefix field (offset 345, 155 bytes): long paths store
          // their leading directories here — ignoring it would silently
          // truncate names
          if (bytes(p + 345) != 0) {
            var pe = p + 345
            while (pe < p + 500 && bytes(pe) != 0) pe += 1
            name = new String(bytes, p + 345, pe - (p + 345), "US-ASCII") +
              "/" + name
          }
          val size = octal(bytes, p + 124, 12, "size")
          if (size > Int.MaxValue) fail(s"entry '$name' too large ($size)")
          val tf = bytes(p + 156)
          p += 512
          val dataEnd = p + size.toInt
          if (dataEnd > bytes.length) fail(s"entry '$name' data truncated")
          tf match {
            case 0 | '0' =>
              val resolved = pathOverride.getOrElse(name)
              pathOverride = None
              pending = TarEntry(resolved,
                java.util.Arrays.copyOfRange(bytes, p, dataEnd))
            case '5' =>
              pathOverride = None // a pax override names the dir, not a file
            case 'x' =>
              // precedence is explicit (r17 ADVICE, refined r19): TWO
              // path records pending for one member is ambiguous —
              // whose name applies? — and fails loudly. But an 'x'
              // member carrying only NON-path records (mtime/uid —
              // mixed producers pair GNU 'L' longnames with per-file
              // pax metadata members) neither conflicts with nor
              // clears a pending 'L'/'x' override.
              val px = paxPath(
                java.util.Arrays.copyOfRange(bytes, p, dataEnd), global = false)
              if (px.isDefined) {
                if (pathOverride.isDefined)
                  fail("pax 'x' path record while a path override is already pending")
                pathOverride = px
              }
            case 'g' =>
              paxPath(java.util.Arrays.copyOfRange(bytes, p, dataEnd),
                global = true)
            case 'L' =>
              // GNU longname: the payload is the NUL-terminated name of
              // the next member (the other long-name convention real
              // shards ship in, alongside pax)
              if (pathOverride.isDefined)
                fail("GNU 'L' member while a path override is already pending")
              var e = p
              while (e < dataEnd && bytes(e) != 0) e += 1
              if (e == p) fail("empty GNU longname payload")
              pathOverride = Some(new String(bytes, p, e - p, "UTF-8"))
            case other =>
              fail(s"unsupported tar entry type '${other.toChar}' for '$name'")
          }
          p = dataEnd + ((512 - size.toInt % 512) % 512)
        }
      }
    }

    override def hasNext: Boolean = {
      if (pending == null && !finished) advance()
      pending != null
    }
    override def next(): TarEntry = {
      if (!hasNext) throw new NoSuchElementException("end of tar stream")
      val e = pending
      pending = null
      e
    }
  }

  /** Write a plain USTAR archive of regular files (the WebDataset shard
    * layout: adjacent members per sample key, two-zero-block
    * terminator).
    */
  def writeTar(entries: Seq[(String, Array[Byte])]): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    for ((name, data) <- entries) {
      require(name.getBytes("US-ASCII").length <= 100,
        s"tar entry name too long: $name")
      val h = new Array[Byte](512)
      val nb = name.getBytes("US-ASCII")
      System.arraycopy(nb, 0, h, 0, nb.length)
      def putOctal(off: Int, len: Int, v: Long): Unit = {
        val s = s"%0${len - 1}o".format(v)
        System.arraycopy(s.getBytes("US-ASCII"), 0, h, off, s.length)
        h(off + len - 1) = 0
      }
      putOctal(100, 8, 420) // mode 0644
      putOctal(108, 8, 0); putOctal(116, 8, 0) // uid/gid
      putOctal(124, 12, data.length.toLong)
      putOctal(136, 12, 0L) // mtime: fixed for determinism
      h(156) = '0'
      // POSIX magic "ustar" NUL + version "00"
      System.arraycopy("ustar".getBytes("US-ASCII"), 0, h, 257, 5)
      h(262) = 0; h(263) = '0'; h(264) = '0'
      // checksum last: field as spaces during the sum
      java.util.Arrays.fill(h, 148, 156, ' '.toByte)
      val sum = headerChecksum(h, 0)
      val cs = "%06o".format(sum)
      System.arraycopy(cs.getBytes("US-ASCII"), 0, h, 148, 6)
      h(154) = 0; h(155) = ' '
      out.write(h)
      out.write(data)
      val pad = (512 - data.length % 512) % 512
      out.write(new Array[Byte](pad))
    }
    out.write(new Array[Byte](1024))
    out.toByteArray
  }
}
