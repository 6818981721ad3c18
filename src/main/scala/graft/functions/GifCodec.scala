package graft.functions

import scala.collection.mutable.ArrayBuffer

/** GIF (87a/89a) codec — executor-side, JDK-only, loud failures.
  *
  * GIFs are a steady share of any real web crawl (VERDICT r15 closed the
  * Adam7/CMYK gaps; GIF was the remaining first-class image wire format
  * the image-dedup family error-tagged). Same discipline as
  * [[ImageCodecs]]: the wire format is hand-parsed from the published
  * spec (GIF89a, CompuServe 1990 — logical screen descriptor, color
  * tables, LZW-compressed image data in ≤255-byte sub-blocks, graphic
  * control extensions, four-pass row interlace), deterministic output,
  * malformed containers rejected with messages rather than misread into
  * plausible pixels. GifCodecSpec cross-checks both directions against
  * the JDK's independent ImageIO GIF implementation.
  *
  * Decoded output is RGB (or RGBA when any frame carries a transparent
  * index) — GIF is inherently palette-indexed, so a grayscale fixture
  * palette (i,i,i) makes intensity aggregates over the RGB samples equal
  * the index aggregates, which is what lets a SQL oracle replay the
  * pixel arithmetic of a GIF-decoding plan off the source embedding
  * (the q202 lossless-codec discipline; GIF's LZW is lossless).
  *
  * Animation: [[decodeGifFrames]] composites every frame onto the
  * logical screen honoring disposal methods 0/1 (leave), 2 (restore to
  * background = transparent per the de-facto standard all browsers
  * implement), and 3 (restore to previous canvas). Scale shape: decode
  * is a narrow per-row kernel inside mapPartitions — media bytes never
  * shuffle, exactly like the PNG/JPEG/WAV/Y4M paths.
  */
object GifCodec {

  import ImageCodecs.Raster

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(msg)

  /** One decoded image block, pre-composite: palette-resolved RGB(A)
    * samples for the frame's own rect plus placement/animation fields.
    */
  final case class GifFrame(
      left: Int, top: Int, width: Int, height: Int,
      disposal: Int, delayCs: Int, transparentIdx: Int, interlaced: Boolean,
      indices: Array[Int], palette: Array[Int])

  final case class Gif(
      width: Int, height: Int, frames: Seq[GifFrame])

  // ------------------------------------------------------------------
  // Parsing
  // ------------------------------------------------------------------

  private def u16le(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)

  /** Full container parse: header, logical screen, every image block
    * with its graphic-control state. Strict: truncated blocks, LZW
    * streams that decode to the wrong pixel count, out-of-palette
    * indices, frame rects outside the logical screen, and a missing
    * trailer all fail loudly.
    */
  def parseGif(bytes: Array[Byte]): Gif = {
    if (bytes.length < 13) fail(s"GIF: truncated header (${bytes.length} bytes)")
    val sig = new String(bytes, 0, 6, "US-ASCII")
    if (sig != "GIF87a" && sig != "GIF89a") fail(s"GIF: bad signature '$sig'")
    val w = u16le(bytes, 6); val h = u16le(bytes, 8)
    if (w <= 0 || h <= 0) fail(s"GIF: bad logical screen ${w}x$h")
    val packed = bytes(10) & 0xff
    var p = 13
    val gct: Array[Int] =
      if ((packed & 0x80) != 0) {
        val n = 1 << ((packed & 0x07) + 1)
        if (p + 3 * n > bytes.length) fail("GIF: truncated global color table")
        val t = readColorTable(bytes, p, n); p += 3 * n; t
      } else null

    val frames = ArrayBuffer.empty[GifFrame]
    // pending graphic-control state (applies to the next image block)
    var disposal = 0; var delayCs = 0; var transparentIdx = -1
    var sawTrailer = false

    while (!sawTrailer) {
      if (p >= bytes.length) fail("GIF: missing trailer (0x3B)")
      (bytes(p) & 0xff) match {
        case 0x3b =>
          sawTrailer = true; p += 1
        case 0x21 => // extension
          if (p + 1 >= bytes.length) fail("GIF: truncated extension")
          val label = bytes(p + 1) & 0xff
          p += 2
          if (label == 0xf9) { // graphic control
            if (p >= bytes.length || (bytes(p) & 0xff) != 4)
              fail("GIF: graphic control block size != 4")
            val gp = bytes(p + 1) & 0xff
            disposal = (gp >> 2) & 0x07
            if (disposal > 3) fail(s"GIF: reserved disposal method $disposal")
            delayCs = u16le(bytes, p + 2)
            transparentIdx = if ((gp & 1) != 0) bytes(p + 4) & 0xff else -1
            p += 5
            if (p >= bytes.length || bytes(p) != 0)
              fail("GIF: graphic control not terminated")
            p += 1
          } else { // comment / application / plain text: skip sub-blocks
            p = skipSubBlocks(bytes, p)
          }
        case 0x2c => // image descriptor
          if (p + 10 > bytes.length) fail("GIF: truncated image descriptor")
          val left = u16le(bytes, p + 1); val top = u16le(bytes, p + 3)
          val fw = u16le(bytes, p + 5); val fh = u16le(bytes, p + 7)
          val ip = bytes(p + 9) & 0xff
          p += 10
          if (fw <= 0 || fh <= 0 || left + fw > w || top + fh > h)
            fail(s"GIF: frame rect ${fw}x$fh@($left,$top) outside ${w}x$h screen")
          val lct: Array[Int] =
            if ((ip & 0x80) != 0) {
              val n = 1 << ((ip & 0x07) + 1)
              if (p + 3 * n > bytes.length) fail("GIF: truncated local color table")
              val t = readColorTable(bytes, p, n); p += 3 * n; t
            } else null
          val pal = if (lct != null) lct else gct
          if (pal == null) fail("GIF: image block with no color table")
          if (p >= bytes.length) fail("GIF: truncated LZW header")
          val mcs = bytes(p) & 0xff
          if (mcs < 2 || mcs > 11) fail(s"GIF: bad LZW min code size $mcs")
          p += 1
          val dataStart = p
          p = skipSubBlocks(bytes, p)
          val data = concatSubBlocks(bytes, dataStart)
          val raw = lzwDecode(mcs, data, fw * fh)
          val interlaced = (ip & 0x40) != 0
          val idx = if (interlaced) deinterlace(raw, fw, fh) else raw
          var i = 0
          while (i < idx.length) {
            if (idx(i) >= pal.length)
              fail(s"GIF: pixel index ${idx(i)} >= palette size ${pal.length}")
            i += 1
          }
          frames += GifFrame(left, top, fw, fh, disposal, delayCs,
            transparentIdx, interlaced, idx, pal)
          disposal = 0; delayCs = 0; transparentIdx = -1
        case b =>
          fail(f"GIF: unknown block introducer 0x$b%02x at offset $p")
      }
    }
    if (frames.isEmpty) fail("GIF: no image blocks")
    Gif(w, h, frames.toSeq)
  }

  private def readColorTable(b: Array[Byte], o: Int, n: Int): Array[Int] = {
    val t = new Array[Int](n)
    var i = 0
    while (i < n) {
      t(i) = ((b(o + 3 * i) & 0xff) << 16) |
        ((b(o + 3 * i + 1) & 0xff) << 8) | (b(o + 3 * i + 2) & 0xff)
      i += 1
    }
    t
  }

  private def skipSubBlocks(b: Array[Byte], start: Int): Int = {
    var p = start
    while (true) {
      if (p >= b.length) fail("GIF: unterminated sub-block chain")
      val n = b(p) & 0xff
      p += 1
      if (n == 0) return p
      if (p + n > b.length) fail("GIF: truncated sub-block")
      p += n
    }
    p
  }

  private def concatSubBlocks(b: Array[Byte], start: Int): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    var p = start
    var done = false
    while (!done) {
      val n = b(p) & 0xff
      p += 1
      if (n == 0) done = true
      else { out.write(b, p, n); p += n }
    }
    out.toByteArray
  }

  // ------------------------------------------------------------------
  // LZW (GIF variant: LSB-first codes, growing width 3..12 bits)
  // ------------------------------------------------------------------

  private def lzwDecode(mcs: Int, data: Array[Byte], nPixels: Int): Array[Int] = {
    val clear = 1 << mcs
    val eoi = clear + 1
    val prefix = new Array[Int](4096)
    val suffix = new Array[Int](4096)
    val out = new Array[Int](nPixels)
    var outN = 0

    var codeSize = mcs + 1
    var next = eoi + 1
    var prev = -1

    var bitPos = 0
    val nBits = data.length * 8
    def readCode(): Int = {
      if (bitPos + codeSize > nBits) -1
      else {
        var v = 0; var i = 0
        while (i < codeSize) {
          val bp = bitPos + i
          if ((data(bp >> 3) & (1 << (bp & 7))) != 0) v |= 1 << i
          i += 1
        }
        bitPos += codeSize
        v
      }
    }
    // expand code into out (codes < clear are literals; others chain
    // through prefix links). Returns the FIRST index of the expansion.
    val stack = new Array[Int](4096)
    def emit(code: Int, extraFirst: Int): Int = {
      var sp = 0
      var c = code
      while (c >= clear) {
        if (sp >= stack.length) fail("GIF: corrupt LZW prefix chain")
        stack(sp) = suffix(c); sp += 1; c = prefix(c)
      }
      val first = c
      if (outN + sp + 1 + (if (extraFirst >= 0) 1 else 0) > nPixels)
        fail(s"GIF: LZW decodes past declared pixel count $nPixels")
      out(outN) = c; outN += 1
      while (sp > 0) { sp -= 1; out(outN) = stack(sp); outN += 1 }
      if (extraFirst >= 0) { out(outN) = extraFirst; outN += 1 }
      first
    }

    var done = false
    while (!done) {
      val code = readCode()
      if (code < 0) fail("GIF: LZW stream ended without EOI")
      else if (code == clear) {
        codeSize = mcs + 1; next = eoi + 1; prev = -1
      } else if (code == eoi) {
        done = true
      } else if (prev < 0) {
        if (code >= clear) fail(s"GIF: first LZW code $code not a literal")
        emit(code, -1)
        prev = code
      } else if (code < next) {
        val first = emit(code, -1)
        if (next < 4096) {
          prefix(next) = prev; suffix(next) = first; next += 1
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        }
        prev = code
      } else if (code == next && next < 4096) {
        // KwKwK: str(prev) + first(str(prev))
        var c = prev
        while (c >= clear) c = prefix(c)
        emit(prev, c)
        prefix(next) = prev; suffix(next) = c; next += 1
        if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
        prev = code
      } else {
        fail(s"GIF: LZW code $code out of range (next=$next)")
      }
    }
    if (outN != nPixels)
      fail(s"GIF: LZW decoded $outN pixels, expected $nPixels")
    out
  }

  private[functions] def lzwEncode(mcs: Int, indices: Array[Int]): Array[Byte] = {
    val clear = 1 << mcs
    val eoi = clear + 1
    val out = new java.io.ByteArrayOutputStream()
    var cur = 0; var curBits = 0
    var codeSize = mcs + 1
    def put(code: Int): Unit = {
      cur |= code << curBits
      curBits += codeSize
      while (curBits >= 8) {
        out.write(cur & 0xff); cur >>>= 8; curBits -= 8
      }
    }
    var dict = new java.util.HashMap[Integer, Integer]()
    var next = eoi + 1
    def reset(): Unit = {
      dict = new java.util.HashMap[Integer, Integer]()
      next = eoi + 1
      codeSize = mcs + 1
    }
    put(clear)
    var prefix = indices(0)
    if (prefix >= clear) fail(s"GIF: index $prefix exceeds palette for mcs=$mcs")
    var i = 1
    while (i < indices.length) {
      val k = indices(i)
      if (k >= clear) fail(s"GIF: index $k exceeds palette for mcs=$mcs")
      val key = Integer.valueOf((prefix << 12) | k)
      val hit = dict.get(key)
      if (hit != null) {
        prefix = hit.intValue()
      } else {
        put(prefix)
        if (next < 4096) {
          dict.put(key, Integer.valueOf(next))
          if (next == (1 << codeSize) && codeSize < 12) codeSize += 1
          next += 1
        } else {
          // table full: clear and restart (simplest spec-legal policy;
          // any conformant decoder resets on the CLEAR code)
          put(clear)
          reset()
        }
        prefix = k
      }
      i += 1
    }
    put(prefix)
    put(eoi)
    if (curBits > 0) out.write(cur & 0xff)
    out.toByteArray
  }

  // four-pass interlace: rows 0,8,16,… then 4,12,… then 2,6,… then 1,3,…
  private val InterlacePasses = Seq((0, 8), (4, 8), (2, 4), (1, 2))

  private def deinterlace(raw: Array[Int], w: Int, h: Int): Array[Int] = {
    val out = new Array[Int](raw.length)
    var src = 0
    for ((start, step) <- InterlacePasses) {
      var y = start
      while (y < h) {
        System.arraycopy(raw, src, out, y * w, w)
        src += w
        y += step
      }
    }
    out
  }

  private[functions] def interlaceRows(h: Int): Array[Int] = {
    val rows = ArrayBuffer.empty[Int]
    for ((start, step) <- InterlacePasses) {
      var y = start
      while (y < h) { rows += y; y += step }
    }
    rows.toArray
  }

  // ------------------------------------------------------------------
  // Decode entry points
  // ------------------------------------------------------------------

  /** Decode a (single-image) GIF to a raster on the logical screen.
    * RGB when fully opaque; RGBA when the frame carries a transparent
    * index. Multi-image containers must go through [[decodeGifFrames]];
    * decoding only the first frame of an animation silently drops
    * content, so that fails loudly here.
    */
  def decodeGif(bytes: Array[Byte]): Raster = {
    val g = parseGif(bytes)
    if (g.frames.size != 1)
      fail(s"GIF: ${g.frames.size} frames — use decodeGifFrames for animations")
    compose(g).head
  }

  /** Decode an animated GIF into per-frame composited rasters of the
    * logical screen, honoring disposal methods (0/1 leave, 2 restore to
    * transparent background, 3 restore previous).
    */
  def decodeGifFrames(bytes: Array[Byte]): Seq[Raster] = compose(parseGif(bytes))

  /** Composite an already-[[parseGif]]-ed container (one parse serves
    * both the wire-format facts and the pixels).
    */
  def render(g: Gif): Seq[Raster] = compose(g)

  private def compose(g: Gif): Seq[Raster] = {
    val n = g.width * g.height
    val anyTrans = g.frames.exists(_.transparentIdx >= 0)
    val ch = if (anyTrans) 4 else 3
    // canvas as (rgb, alpha); starts fully transparent black
    val rgb = new Array[Int](n)
    val alpha = new Array[Int](n)
    val out = ArrayBuffer.empty[Raster]
    for (f <- g.frames) {
      val (savedRgb, savedAlpha) =
        if (f.disposal == 3) (rgb.clone(), alpha.clone()) else (null, null)
      var fy = 0
      while (fy < f.height) {
        var fx = 0
        while (fx < f.width) {
          val idx = f.indices(fy * f.width + fx)
          if (idx != f.transparentIdx) {
            val o = (f.top + fy) * g.width + (f.left + fx)
            rgb(o) = f.palette(idx); alpha(o) = 255
          }
          fx += 1
        }
        fy += 1
      }
      val px = new Array[Int](n * ch)
      var i = 0
      while (i < n) {
        px(i * ch) = (rgb(i) >> 16) & 0xff
        px(i * ch + 1) = (rgb(i) >> 8) & 0xff
        px(i * ch + 2) = rgb(i) & 0xff
        if (ch == 4) px(i * ch + 3) = alpha(i)
        i += 1
      }
      out += Raster(g.width, g.height, ch, px)
      f.disposal match {
        case 2 => // restore the frame rect to (transparent) background
          var y = 0
          while (y < f.height) {
            var x = 0
            while (x < f.width) {
              val o = (f.top + y) * g.width + (f.left + x)
              rgb(o) = 0; alpha(o) = 0
              x += 1
            }
            y += 1
          }
        case 3 =>
          System.arraycopy(savedRgb, 0, rgb, 0, n)
          System.arraycopy(savedAlpha, 0, alpha, 0, n)
        case _ => () // 0/1: leave
      }
    }
    out.toSeq
  }

  // ------------------------------------------------------------------
  // Encode (fixture path): grayscale palette, real LZW wire format
  // ------------------------------------------------------------------

  private val GrayPalette: Array[Byte] = {
    val t = new Array[Byte](768)
    var i = 0
    while (i < 256) {
      t(3 * i) = i.toByte; t(3 * i + 1) = i.toByte; t(3 * i + 2) = i.toByte
      i += 1
    }
    t
  }

  private def writeSubBlocks(
      out: java.io.ByteArrayOutputStream, data: Array[Byte]): Unit = {
    var p = 0
    while (p < data.length) {
      val n = math.min(255, data.length - p)
      out.write(n)
      out.write(data, p, n)
      p += n
    }
    out.write(0)
  }

  private def writeHeader(
      out: java.io.ByteArrayOutputStream, w: Int, h: Int): Unit = {
    out.write("GIF89a".getBytes("US-ASCII"))
    out.write(w & 0xff); out.write((w >> 8) & 0xff)
    out.write(h & 0xff); out.write((h >> 8) & 0xff)
    out.write(0xf7) // GCT present, 8-bit color resolution, 256 entries
    out.write(0)    // background index
    out.write(0)    // aspect
    out.write(GrayPalette)
  }

  private def writeImageBlock(
      out: java.io.ByteArrayOutputStream, left: Int, top: Int,
      w: Int, h: Int, indices: Array[Int], interlaced: Boolean): Unit = {
    require(indices.length == w * h,
      s"GIF encode: ${indices.length} indices for ${w}x$h")
    out.write(0x2c)
    out.write(left & 0xff); out.write((left >> 8) & 0xff)
    out.write(top & 0xff); out.write((top >> 8) & 0xff)
    out.write(w & 0xff); out.write((w >> 8) & 0xff)
    out.write(h & 0xff); out.write((h >> 8) & 0xff)
    out.write(if (interlaced) 0x40 else 0x00)
    val rowOrder =
      if (interlaced) interlaceRows(h).map(y => y * w)
      else Array.tabulate(h)(_ * w)
    val seq = new Array[Int](w * h)
    var d = 0
    for (ro <- rowOrder) {
      System.arraycopy(indices, ro, seq, d, w)
      d += w
    }
    out.write(8) // min code size (256-entry palette)
    writeSubBlocks(out, lzwEncode(8, seq))
  }

  /** Encode one grayscale frame (0-255 intensities as palette indices
    * into the identity gray table) as a real GIF89a stream; optional
    * four-pass interlace; optional keyed transparency (pixels equal to
    * `transparentIdx` become holes).
    */
  def encodeGifGray(
      w: Int, h: Int, pixels: Array[Int],
      interlaced: Boolean = false, transparentIdx: Int = -1): Array[Byte] = {
    val out = new java.io.ByteArrayOutputStream()
    writeHeader(out, w, h)
    if (transparentIdx >= 0) {
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write(0x01) // transparent flag, disposal 0
      out.write(0); out.write(0) // delay
      out.write(transparentIdx)
      out.write(0)
    }
    writeImageBlock(out, 0, 0, w, h, pixels, interlaced)
    out.write(0x3b)
    out.toByteArray
  }

  /** One frame of an animation to encode: full placement + animation
    * controls (delay in centiseconds, disposal 0-3, optional
    * transparent index).
    */
  final case class GifFrameSpec(
      left: Int, top: Int, width: Int, height: Int, pixels: Array[Int],
      delayCs: Int = 4, disposal: Int = 1, transparentIdx: Int = -1,
      interlaced: Boolean = false)

  /** Encode an animated GIF89a (NETSCAPE2.0 loop extension + one
    * graphic-control + image block per frame) with a grayscale global
    * palette.
    */
  def encodeGifAnimated(
      w: Int, h: Int, frames: Seq[GifFrameSpec]): Array[Byte] = {
    require(frames.nonEmpty, "GIF encode: no frames")
    val out = new java.io.ByteArrayOutputStream()
    writeHeader(out, w, h)
    // NETSCAPE2.0 application extension: loop forever
    out.write(0x21); out.write(0xff); out.write(11)
    out.write("NETSCAPE2.0".getBytes("US-ASCII"))
    out.write(3); out.write(1); out.write(0); out.write(0)
    out.write(0)
    for (f <- frames) {
      require(f.disposal >= 0 && f.disposal <= 3, s"bad disposal ${f.disposal}")
      out.write(0x21); out.write(0xf9); out.write(4)
      out.write((f.disposal << 2) | (if (f.transparentIdx >= 0) 1 else 0))
      out.write(f.delayCs & 0xff); out.write((f.delayCs >> 8) & 0xff)
      out.write(math.max(0, f.transparentIdx))
      out.write(0)
      writeImageBlock(out, f.left, f.top, f.width, f.height, f.pixels,
        f.interlaced)
    }
    out.write(0x3b)
    out.toByteArray
  }
}
