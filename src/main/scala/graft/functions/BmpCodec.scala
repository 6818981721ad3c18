package graft.functions

/** BMP (Windows DIB) codec — executor-side, JDK-only, loud failures.
  *
  * BMPs are the remaining uncompressed raster format a real crawl
  * carries (screenshots, scanned uploads, legacy galleries). Same
  * discipline as [[ImageCodecs]]/[[GifCodec]]: the wire format is
  * hand-parsed (BITMAPFILEHEADER + BITMAPINFOHEADER incl. the V4/V5
  * extensions whose prefix is identical, bottom-up OR top-down row
  * order, 4-byte row padding, BGR sample order, BGRA palette entries
  * for the indexed profile), deterministic output, unsupported
  * profiles (RLE, bitfields, 1/4/16/32-bit) rejected with messages.
  * BmpCodecSpec cross-checks both directions against the JDK's
  * independent ImageIO BMP implementation.
  *
  * BMP is uncompressed, so decode is exact — a SQL oracle replays the
  * pixel arithmetic of a BMP-decoding plan straight off the source
  * embedding (the q202 lossless-codec discipline).
  */
object BmpCodec {

  import ImageCodecs.Raster

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(msg)

  private def u16(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8)
  private def i32(b: Array[Byte], o: Int): Int =
    (b(o) & 0xff) | ((b(o + 1) & 0xff) << 8) |
      ((b(o + 2) & 0xff) << 16) | ((b(o + 3) & 0xff) << 24)

  /** Decode an 8-bit-palette or 24-bit BI_RGB BMP. Palette images
    * resolve through their BGRA color table to RGB; 24-bit rows are
    * BGR. Top-down (negative height) and bottom-up rows both handled;
    * row stride padded to 4 bytes.
    */
  def decodeBmp(bytes: Array[Byte]): Raster = {
    if (bytes.length < 54) fail(s"BMP: truncated header (${bytes.length} bytes)")
    if (bytes(0) != 'B' || bytes(1) != 'M') fail("BMP: bad signature")
    val dataOff = i32(bytes, 10)
    val dibSize = i32(bytes, 14)
    // 40 = BITMAPINFOHEADER; 52/56/108/124 = V2/V3/V4/V5 share the prefix
    if (!Set(40, 52, 56, 108, 124).contains(dibSize))
      fail(s"BMP: unsupported DIB header size $dibSize")
    val w = i32(bytes, 18)
    val hRaw = i32(bytes, 22)
    val topDown = hRaw < 0
    val h = math.abs(hRaw)
    if (w <= 0 || h == 0) fail(s"BMP: bad dimensions ${w}x$hRaw")
    if (u16(bytes, 26) != 1) fail(s"BMP: planes ${u16(bytes, 26)} != 1")
    val bpp = u16(bytes, 28)
    if (bpp != 8 && bpp != 24)
      fail(s"BMP: unsupported bit depth $bpp (want 8 or 24)")
    val compression = i32(bytes, 30)
    if (compression != 0)
      fail(s"BMP: unsupported compression $compression (want BI_RGB=0)")
    val palette: Array[Int] =
      if (bpp == 8) {
        val declared = i32(bytes, 46)
        val n = if (declared == 0) 256 else declared
        if (n < 1 || n > 256) fail(s"BMP: bad palette size $n")
        val base = 14 + dibSize
        if (base + 4 * n > bytes.length) fail("BMP: truncated palette")
        Array.tabulate(n) { i =>
          // entries are BGRA (reserved 4th byte)
          ((bytes(base + 4 * i + 2) & 0xff) << 16) |
            ((bytes(base + 4 * i + 1) & 0xff) << 8) |
            (bytes(base + 4 * i) & 0xff)
        }
      } else null
    // size arithmetic in Long: a crafted header with a huge width would
    // overflow Int (w*bpp negative), trivially passing the bounds check
    // and dying later with a raw AIOOBE / oversized allocation instead
    // of the codec's descriptive failure
    val rowBytesL = (w.toLong * bpp / 8 + 3) & ~3L
    val pxCountL = w.toLong * h * 3
    if (pxCountL > (1L << 30))
      fail(s"BMP: implausible dimensions ${w}x$h (${pxCountL / 3} pixels)")
    val rowBytes = rowBytesL.toInt
    if (dataOff < 0 || dataOff.toLong + rowBytesL * h > bytes.length)
      fail(s"BMP: pixel data (offset $dataOff, ${rowBytesL * h} bytes) " +
        s"exceeds file size ${bytes.length}")
    val px = new Array[Int](pxCountL.toInt)
    var y = 0
    while (y < h) {
      val srcRow = dataOff + (if (topDown) y else h - 1 - y) * rowBytes
      var x = 0
      while (x < w) {
        val o = (y * w + x) * 3
        if (bpp == 8) {
          val idx = bytes(srcRow + x) & 0xff
          if (idx >= palette.length)
            fail(s"BMP: pixel index $idx >= palette size ${palette.length}")
          val c = palette(idx)
          px(o) = (c >> 16) & 0xff; px(o + 1) = (c >> 8) & 0xff
          px(o + 2) = c & 0xff
        } else {
          val s = srcRow + x * 3 // BGR
          px(o) = bytes(s + 2) & 0xff; px(o + 1) = bytes(s + 1) & 0xff
          px(o + 2) = bytes(s) & 0xff
        }
        x += 1
      }
      y += 1
    }
    Raster(w, h, 3, px)
  }

  private def writeHeader(
      out: java.io.ByteArrayOutputStream, fileSize: Int, dataOff: Int,
      w: Int, h: Int, bpp: Int, paletteN: Int): Unit = {
    def w16(v: Int): Unit = { out.write(v & 0xff); out.write((v >> 8) & 0xff) }
    def w32(v: Int): Unit = { w16(v & 0xffff); w16((v >> 16) & 0xffff) }
    out.write('B'); out.write('M')
    w32(fileSize); w32(0); w32(dataOff)
    w32(40) // BITMAPINFOHEADER
    w32(w); w32(h) // positive = bottom-up
    w16(1); w16(bpp)
    w32(0) // BI_RGB
    w32(fileSize - dataOff)
    w32(2835); w32(2835) // 72 dpi
    w32(paletteN); w32(0)
  }

  /** Encode grayscale pixels as an 8-bit-palette bottom-up BMP (identity
    * gray BGRA palette) — the fixture path for the indexed profile.
    */
  def encodeBmpGray(w: Int, h: Int, pixels: Array[Int]): Array[Byte] = {
    require(pixels.length == w * h, s"${pixels.length} pixels for ${w}x$h")
    val rowBytes = (w + 3) & ~3
    val dataOff = 54 + 1024
    val out = new java.io.ByteArrayOutputStream()
    writeHeader(out, dataOff + rowBytes * h, dataOff, w, h, 8, 256)
    var i = 0
    while (i < 256) { // BGRA identity gray
      out.write(i); out.write(i); out.write(i); out.write(0)
      i += 1
    }
    var y = h - 1
    while (y >= 0) {
      var x = 0
      while (x < w) { out.write(pixels(y * w + x)); x += 1 }
      var p = w
      while ((p & 3) != 0) { out.write(0); p += 1 }
      y -= 1
    }
    out.toByteArray
  }

  /** Encode grayscale pixels as a 24-bit BGR bottom-up BMP (r=g=b) —
    * the fixture path for the truecolor profile.
    */
  def encodeBmpGray24(w: Int, h: Int, pixels: Array[Int]): Array[Byte] = {
    require(pixels.length == w * h, s"${pixels.length} pixels for ${w}x$h")
    val rowBytes = (w * 3 + 3) & ~3
    val out = new java.io.ByteArrayOutputStream()
    writeHeader(out, 54 + rowBytes * h, 54, w, h, 24, 0)
    var y = h - 1
    while (y >= 0) {
      var x = 0
      while (x < w) {
        val v = pixels(y * w + x)
        out.write(v); out.write(v); out.write(v)
        x += 1
      }
      var p = w * 3
      while ((p & 3) != 0) { out.write(0); p += 1 }
      y -= 1
    }
    out.toByteArray
  }
}
