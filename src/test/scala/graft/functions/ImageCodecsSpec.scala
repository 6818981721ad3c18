package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import javax.imageio.ImageIO
import java.awt.image.BufferedImage
import graft.functions.ImageCodecs.Raster

/** ImageCodecs must be validated against an INDEPENDENT implementation
  * (the ADVICE r13 blosc lesson: a codec validated only against itself
  * decodes wrong bytes into well-formed wrong pixels with nothing to
  * catch it). The JDK ships its own PNG and JPEG codecs via ImageIO —
  * a genuinely separate lineage — so every test here crosses the two:
  * PNG must agree EXACTLY in both directions (lossless format), JPEG
  * within the T.81 Annex-A IDCT tolerance (±1 per sample for same-stream
  * decode; chroma-upsampled color compared on the luma it determines).
  */
class ImageCodecsSpec extends AnyFunSuite {

  // deterministic pseudo-random pixels (no Random: reproducible failures)
  private def pix(i: Int, salt: Int): Int =
    (((i * 2654435761L + salt * 40503L) >>> 16) & 0xff).toInt

  private def gradient(w: Int, h: Int, ch: Int): Array[Int] = {
    val out = new Array[Int](w * h * ch)
    var i = 0
    while (i < out.length) {
      val p = i / ch; val c = i % ch
      val x = p % w; val y = p / w
      out(i) = math.min(255, (x * 2 + y * 2 + c * 7) % 256)
      i += 1
    }
    out
  }

  private def toBuffered(r: Raster): BufferedImage = {
    val t = r.channels match {
      case 1 => BufferedImage.TYPE_BYTE_GRAY
      case 3 => BufferedImage.TYPE_3BYTE_BGR
      case 4 => BufferedImage.TYPE_4BYTE_ABGR
    }
    val img = new BufferedImage(r.width, r.height, t)
    var y = 0
    while (y < r.height) {
      var x = 0
      while (x < r.width) {
        val o = (y * r.width + x) * r.channels
        if (r.channels == 1)
          // raster samples, NOT setRGB: TYPE_BYTE_GRAY's getRGB/setRGB
          // round-trips through sRGB gamma and distorts gray values
          img.getRaster.setSample(x, y, 0, r.pixels(o))
        else {
          val rgb = r.channels match {
            case 3 => (0xff << 24) | (r.pixels(o) << 16) |
              (r.pixels(o + 1) << 8) | r.pixels(o + 2)
            case 4 => (r.pixels(o + 3) << 24) | (r.pixels(o) << 16) |
              (r.pixels(o + 1) << 8) | r.pixels(o + 2)
          }
          img.setRGB(x, y, rgb)
        }
        x += 1
      }
      y += 1
    }
    img
  }

  private def fromBuffered(img: BufferedImage, ch: Int): Array[Int] = {
    val out = new Array[Int](img.getWidth * img.getHeight * ch)
    var y = 0
    while (y < img.getHeight) {
      var x = 0
      while (x < img.getWidth) {
        val rgb = if (ch == 1) 0 else img.getRGB(x, y)
        val o = (y * img.getWidth + x) * ch
        ch match {
          case 1 => out(o) = img.getRaster.getSample(x, y, 0)
          case 3 =>
            out(o) = (rgb >> 16) & 0xff
            out(o + 1) = (rgb >> 8) & 0xff
            out(o + 2) = rgb & 0xff
          case 4 =>
            out(o) = (rgb >> 16) & 0xff
            out(o + 1) = (rgb >> 8) & 0xff
            out(o + 2) = rgb & 0xff
            out(o + 3) = (rgb >> 24) & 0xff
        }
        x += 1
      }
      y += 1
    }
    out
  }

  private def imageIoBytes(img: BufferedImage, fmt: String): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(img, fmt, bos), s"ImageIO has no $fmt writer")
    bos.toByteArray
  }

  // ==================================================================
  // PNG
  // ==================================================================

  test("PNG round trip is exact for gray/RGB/RGBA across all 5 filters") {
    for ((ch, salt) <- Seq((1, 1), (3, 2), (4, 3))) {
      val w = 23; val h = 11 // non-multiples: edge rows/cols exercised
      val px = Array.tabulate(w * h * ch)(i => pix(i, salt))
      for (f <- 0 to 4) {
        val bytes = ImageCodecs.encodePng(Raster(w, h, ch, px), _ => f)
        val back = ImageCodecs.decodePng(bytes)
        assert(back.width == w && back.height == h && back.channels == ch)
        assert(back.pixels.sameElements(px), s"ch=$ch filter=$f diverged")
      }
      // rotating filters (the engine's embeddingsAsPng path)
      val rot = ImageCodecs.decodePng(
        ImageCodecs.encodePng(Raster(w, h, ch, px), y => y % 5))
      assert(rot.pixels.sameElements(px), s"ch=$ch rotating filters diverged")
    }
  }

  test("PNG: ImageIO decodes our bytes exactly (independent reader)") {
    for (ch <- Seq(1, 3, 4)) {
      val w = 17; val h = 9
      val px = Array.tabulate(w * h * ch)(i => pix(i, 7 * ch))
      val bytes = ImageCodecs.encodePng(Raster(w, h, ch, px), y => y % 5)
      val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, "ImageIO rejected our PNG")
      assert(fromBuffered(img, ch).sameElements(px),
        s"ch=$ch: ImageIO read different pixels from our PNG")
    }
  }

  test("PNG: we decode ImageIO-written bytes exactly (independent writer)") {
    for (ch <- Seq(1, 3)) {
      val w = 31; val h = 13
      val px = Array.tabulate(w * h * ch)(i => pix(i, 11 * ch))
      val bytes = imageIoBytes(toBuffered(Raster(w, h, ch, px)), "png")
      val back = ImageCodecs.decodePng(bytes)
      assert(back.width == w && back.height == h)
      // ImageIO may write gray as gray (ch 1) or RGB; normalize
      val got =
        if (back.channels == ch) back.pixels
        else if (ch == 1 && back.channels == 3)
          back.pixels.grouped(3).map(_.head).toArray
        else fail(s"unexpected channels ${back.channels}")
      assert(got.sameElements(px), s"ch=$ch: our decode of ImageIO PNG diverged")
    }
  }

  test("PNG: malformed containers fail loudly, never decode garbage") {
    val good = ImageCodecs.encodePng(
      Raster(8, 8, 1, Array.tabulate(64)(pix(_, 5))))
    // bad signature
    val badSig = good.clone(); badSig(0) = 0x00
    assert(intercept[IllegalArgumentException](
      ImageCodecs.decodePng(badSig)).getMessage.contains("signature"))
    // flipped bit inside IDAT payload -> CRC catches it
    val flipped = good.clone(); flipped(45) = (flipped(45) ^ 0x40).toByte
    assert(intercept[IllegalArgumentException](
      ImageCodecs.decodePng(flipped)).getMessage.contains("CRC"))
    // truncation
    assert(intercept[IllegalArgumentException](
      ImageCodecs.decodePng(good.take(good.length - 10)))
      .getMessage.nonEmpty)
    // unknown interlace method announced in IHDR -> loud reject (flip
    // byte + fix CRC); Adam7 (method 1) itself decodes since r16
    val adam = good.clone()
    adam(8 + 4 + 4 + 12) = 2 // IHDR interlace byte: no such method
    val crc = new java.util.zip.CRC32()
    crc.update(adam, 12, 17) // chunk type + 13 data bytes
    val cv = crc.getValue.toInt
    adam(29) = (cv >>> 24).toByte; adam(30) = (cv >>> 16).toByte
    adam(31) = (cv >>> 8).toByte; adam(32) = cv.toByte
    assert(intercept[IllegalArgumentException](
      ImageCodecs.decodePng(adam)).getMessage.contains("interlace"))
    // hostile declared chunk length near 2^31: the bounds check must do
    // Long arithmetic or the Int sum wraps negative, skips the reject,
    // and the CRC update throws an uncontrolled AIOOBE (ADVICE r14)
    val hostile = good.clone()
    hostile(8) = 0x7f.toByte; hostile(9) = 0xff.toByte
    hostile(10) = 0xff.toByte; hostile(11) = 0xf0.toByte
    assert(intercept[IllegalArgumentException](
      ImageCodecs.decodePng(hostile)).getMessage.contains("overruns"))
  }

  test("PNG: zlib FDICT stream fails loudly instead of spinning (ADVICE r14)") {
    // hand-built container: valid IHDR/IEND, IDAT payload is a zlib
    // header with the FDICT bit set (0x78 0x20 passes the %31 check) —
    // Inflater stalls with needsDictionary, inflate() returns 0 with
    // needsInput() false, and the old loop condition never exited
    def chunk(ctype: String, data: Array[Byte]): Array[Byte] = {
      val bos = new java.io.ByteArrayOutputStream()
      val len = data.length
      bos.write(Array[Byte]((len >>> 24).toByte, (len >>> 16).toByte,
        (len >>> 8).toByte, len.toByte))
      val body = ctype.getBytes("US-ASCII") ++ data
      bos.write(body)
      val crc = new java.util.zip.CRC32(); crc.update(body)
      val cv = crc.getValue.toInt
      bos.write(Array[Byte]((cv >>> 24).toByte, (cv >>> 16).toByte,
        (cv >>> 8).toByte, cv.toByte))
      bos.toByteArray
    }
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    val ihdr = chunk("IHDR", Array[Byte](0, 0, 0, 1, 0, 0, 0, 1, 8, 0, 0, 0, 0))
    val fdictIdat = chunk("IDAT",
      Array[Byte](0x78, 0x20, 1, 2, 3, 4, 0, 0)) // header + dict adler + junk
    val iend = chunk("IEND", Array.empty)
    val ex = intercept[IllegalArgumentException](
      ImageCodecs.decodePng(sig ++ ihdr ++ fdictIdat ++ iend))
    assert(ex.getMessage.contains("stalled") || ex.getMessage.contains("truncated"))
  }

  private def pngChunk(ctype: String, data: Array[Byte]): Array[Byte] = {
    val bos = new java.io.ByteArrayOutputStream()
    val len = data.length
    bos.write(Array[Byte]((len >>> 24).toByte, (len >>> 16).toByte,
      (len >>> 8).toByte, len.toByte))
    val body = ctype.getBytes("US-ASCII") ++ data
    bos.write(body)
    val crc = new java.util.zip.CRC32(); crc.update(body)
    val cv = crc.getValue.toInt
    bos.write(Array[Byte]((cv >>> 24).toByte, (cv >>> 16).toByte,
      (cv >>> 8).toByte, cv.toByte))
    bos.toByteArray
  }

  test("palette PNG: round trip at depths 1/2/4/8, with and without tRNS (r15)") {
    for (depth <- Seq(1, 2, 4, 8)) {
      val nColors = math.min(1 << depth, 7) // non-power-of-two palette
      val palette = Array.tabulate(nColors)(i =>
        (((i * 37 + 11) % 256) << 16) | (((i * 59 + 3) % 256) << 8) |
          ((i * 83 + 29) % 256))
      val w = 13; val h = 5 // odd width: sub-byte rows have slack bits
      val idx = Array.tabulate(w * h)(i => pix(i, depth) % nColors)
      val back = ImageCodecs.decodePng(
        ImageCodecs.encodePngPalette(w, h, idx, palette, None, depth))
      assert(back.width == w && back.height == h && back.channels == 3,
        s"depth=$depth")
      idx.zipWithIndex.foreach { case (pi, i) =>
        val p = palette(pi)
        assert(back.pixels(3 * i) == ((p >> 16) & 0xff) &&
          back.pixels(3 * i + 1) == ((p >> 8) & 0xff) &&
          back.pixels(3 * i + 2) == (p & 0xff),
          s"depth=$depth pixel $i: palette entry $pi misdecoded")
      }
      // tRNS: alpha per entry, shorter than the palette (tail = opaque)
      val trns = Array.tabulate(math.min(3, nColors))(i => 40 * i)
      val withA = ImageCodecs.decodePng(
        ImageCodecs.encodePngPalette(w, h, idx, palette, Some(trns), depth))
      assert(withA.channels == 4, s"depth=$depth: tRNS must yield RGBA")
      idx.zipWithIndex.foreach { case (pi, i) =>
        val want = if (pi < trns.length) trns(pi) else 255
        assert(withA.pixels(4 * i + 3) == want,
          s"depth=$depth pixel $i: alpha ${withA.pixels(4 * i + 3)} != $want")
      }
    }
  }

  test("palette PNG: ImageIO agrees in both directions (r15)") {
    // ours -> ImageIO
    val palette = Array.tabulate(16)(i =>
      (((i * 17) % 256) << 16) | (((i * 29) % 256) << 8) | ((i * 43) % 256))
    val w = 9; val h = 7
    val idx = Array.tabulate(w * h)(i => pix(i, 61) % palette.length)
    val bytes = ImageCodecs.encodePngPalette(w, h, idx, palette, None, 4)
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO rejected our palette PNG")
    idx.zipWithIndex.foreach { case (pi, i) =>
      val got = img.getRGB(i % w, i / w) & 0xffffff
      assert(got == palette(pi), s"pixel $i: ImageIO read ${got.toHexString}")
    }
    // ImageIO -> ours: TYPE_BYTE_INDEXED writes a PLTE container
    val src = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED)
    for (y <- 0 until h; x <- 0 until w)
      src.setRGB(x, y, palette(idx(y * w + x)) | 0xff000000)
    val ioBytes = imageIoBytes(src, "png")
    val ours = ImageCodecs.decodePng(ioBytes)
    for (y <- 0 until h; x <- 0 until w) {
      val want = src.getRGB(x, y)
      val o = (y * w + x) * ours.channels
      assert(ours.pixels(o) == ((want >> 16) & 0xff) &&
        ours.pixels(o + 1) == ((want >> 8) & 0xff) &&
        ours.pixels(o + 2) == (want & 0xff),
        s"($x,$y): our decode of ImageIO palette PNG diverged")
    }
  }

  test("16-bit PNG: high-byte downconvert, ImageIO sample agreement (r15)") {
    val w = 11; val h = 6
    val s16 = Array.tabulate(w * h)(i => (pix(i, 71) << 8) | pix(i, 72))
    val bytes = ImageCodecs.encodePngGray16(w, h, s16)
    val back = ImageCodecs.decodePng(bytes)
    assert(back.width == w && back.height == h && back.channels == 1)
    s16.zipWithIndex.foreach { case (v, i) =>
      assert(back.pixels(i) == (v >> 8),
        s"pixel $i: ${back.pixels(i)} != high byte ${v >> 8}")
    }
    // ImageIO reads the same container as TYPE_USHORT_GRAY; its 16-bit
    // samples must equal ours pre-downconvert
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO rejected our 16-bit PNG")
    s16.zipWithIndex.foreach { case (v, i) =>
      assert(img.getRaster.getSample(i % w, i / w, 0) == v,
        s"pixel $i: ImageIO 16-bit sample diverged")
    }
  }

  test("sub-byte grayscale + gray-alpha PNG profiles decode (r15)") {
    // 2-bit gray, hand-built container: samples scale v*255/3
    val sig = Array[Byte](0x89.toByte, 'P', 'N', 'G', 0x0d, 0x0a, 0x1a, 0x0a)
    def gray2(w: Int, h: Int, vals: Array[Int]): Array[Byte] = {
      val stride = (w * 2 + 7) / 8
      val raw = new Array[Byte]((stride + 1) * h)
      for (y <- 0 until h; x <- 0 until w) {
        val bitPos = x * 2
        val at = y * (stride + 1) + 1 + (bitPos >> 3)
        raw(at) = (raw(at) | (vals(y * w + x) << (8 - 2 - (bitPos & 7)))).toByte
      }
      val bos = new java.io.ByteArrayOutputStream()
      val defl = new java.util.zip.Deflater(); defl.setInput(raw); defl.finish()
      val buf = new Array[Byte](4096)
      while (!defl.finished()) bos.write(buf, 0, defl.deflate(buf))
      val ihdr = java.nio.ByteBuffer.allocate(13)
        .putInt(w).putInt(h).put(2.toByte).put(0.toByte)
        .put(0.toByte).put(0.toByte).put(0.toByte)
      sig ++ pngChunk("IHDR", ihdr.array()) ++
        pngChunk("IDAT", bos.toByteArray) ++ pngChunk("IEND", Array.empty)
    }
    val vals = Array(0, 1, 2, 3, 3, 2, 1, 0, 1, 3)
    val r = ImageCodecs.decodePng(gray2(5, 2, vals))
    assert(r.channels == 1)
    vals.zipWithIndex.foreach { case (v, i) =>
      assert(r.pixels(i) == v * 255 / 3, s"2-bit gray pixel $i")
    }
    // gray+alpha (color type 4): decodes to RGBA with r=g=b
    def grayAlpha(w: Int, h: Int, ga: Array[(Int, Int)]): Array[Byte] = {
      val stride = w * 2
      val raw = new Array[Byte]((stride + 1) * h)
      for (y <- 0 until h; x <- 0 until w) {
        raw(y * (stride + 1) + 1 + 2 * x) = ga(y * w + x)._1.toByte
        raw(y * (stride + 1) + 2 + 2 * x) = ga(y * w + x)._2.toByte
      }
      val bos = new java.io.ByteArrayOutputStream()
      val defl = new java.util.zip.Deflater(); defl.setInput(raw); defl.finish()
      val buf = new Array[Byte](4096)
      while (!defl.finished()) bos.write(buf, 0, defl.deflate(buf))
      val ihdr = java.nio.ByteBuffer.allocate(13)
        .putInt(w).putInt(h).put(8.toByte).put(4.toByte)
        .put(0.toByte).put(0.toByte).put(0.toByte)
      sig ++ pngChunk("IHDR", ihdr.array()) ++
        pngChunk("IDAT", bos.toByteArray) ++ pngChunk("IEND", Array.empty)
    }
    val ga = Array.tabulate(6)(i => (pix(i, 81), pix(i, 82)))
    val g = ImageCodecs.decodePng(grayAlpha(3, 2, ga))
    assert(g.channels == 4)
    ga.zipWithIndex.foreach { case ((gv, av), i) =>
      assert(g.pixels(4 * i) == gv && g.pixels(4 * i + 1) == gv &&
        g.pixels(4 * i + 2) == gv && g.pixels(4 * i + 3) == av,
        s"gray-alpha pixel $i")
    }
    // ImageIO agreement on the gray-alpha container — via raster
    // samples, not getRGB (which routes gray through sRGB gamma and
    // distorts values, the toBuffered caveat)
    val img = ImageIO.read(new java.io.ByteArrayInputStream(
      grayAlpha(3, 2, ga)))
    assert(img != null, "ImageIO rejected the gray-alpha container")
    ga.zipWithIndex.foreach { case ((gv, av), i) =>
      val rs = img.getRaster
      assert(rs.getSample(i % 3, i / 3, 0) == gv &&
        rs.getSample(i % 3, i / 3, 1) == av,
        s"gray-alpha pixel $i vs ImageIO raster samples")
    }
  }

  // ==================================================================
  // JPEG
  // ==================================================================

  test("JPEG: block-constant images round-trip EXACTLY (flat quantizer)") {
    val bside = 8
    val side = bside * 8
    val blocks = Array.tabulate(bside * bside)(i => pix(i, 21))
    val px = Array.tabulate(side * side) { i =>
      val bx = (i % side) / 8; val by = (i / side) / 8
      blocks(by * bside + bx)
    }
    val bytes = ImageCodecs.encodeJpegGray(side, side, px)
    val back = ImageCodecs.decodeJpeg(bytes)
    assert(back.width == side && back.height == side && back.channels == 1)
    assert(back.pixels.sameElements(px),
      "DC-only blocks with quantizer 1 must decode exactly")
  }

  test("JPEG: ImageIO decodes our block-constant bytes within ±1") {
    val side = 24
    val px = Array.tabulate(side * side) { i =>
      val bx = (i % side) / 8; val by = (i / side) / 8
      40 * by + 13 * bx + 5
    }
    val bytes = ImageCodecs.encodeJpegGray(side, side, px)
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO rejected our JPEG")
    val got = fromBuffered(img, 1)
    val maxDiff = got.zip(px).map { case (a, b) => math.abs(a - b) }.max
    assert(maxDiff <= 1,
      s"ImageIO read our JPEG with max pixel diff $maxDiff (>1)")
  }

  test("JPEG: general grayscale agrees with ImageIO within ±1 " +
      "(same stream, independent decoders)") {
    val w = 37; val h = 21 // non-multiples of 8: edge blocks exercised
    val px = gradient(w, h, 1)
    val bytes = imageIoBytes(toBuffered(Raster(w, h, 1, px)), "jpg")
    val ours = ImageCodecs.decodeJpeg(bytes)
    assert(ours.width == w && ours.height == h && ours.channels == 1)
    val ref = fromBuffered(
      ImageIO.read(new java.io.ByteArrayInputStream(bytes)), 1)
    val maxDiff = ours.pixels.zip(ref).map { case (a, b) => math.abs(a - b) }.max
    assert(maxDiff <= 1,
      s"grayscale decode diverges from ImageIO by $maxDiff (>1)")
  }

  test("JPEG: subsampled color agrees with ImageIO on luma within ±2") {
    // the JDK writer emits 4:2:0 for color input; chroma UPSAMPLING is
    // implementation-defined (we replicate, libjpeg-style decoders
    // triangle-filter), so RGB is compared through the luma it
    // determines (BT.601 Y is chroma-free) plus a loose smooth-image
    // RGB band for the chroma path itself.
    val w = 40; val h = 24
    val px = gradient(w, h, 3)
    val bytes = imageIoBytes(toBuffered(Raster(w, h, 3, px)), "jpg")
    val ours = ImageCodecs.decodeJpeg(bytes)
    assert(ours.width == w && ours.height == h && ours.channels == 3)
    val ref = fromBuffered(
      ImageIO.read(new java.io.ByteArrayInputStream(bytes)), 3)
    def luma(p: Array[Int], o: Int): Double =
      0.299 * p(o) + 0.587 * p(o + 1) + 0.114 * p(o + 2)
    var maxY = 0.0; var maxRgb = 0; var i = 0
    while (i < w * h) {
      maxY = math.max(maxY, math.abs(luma(ours.pixels, 3 * i) - luma(ref, 3 * i)))
      var c = 0
      while (c < 3) {
        maxRgb = math.max(maxRgb, math.abs(ours.pixels(3 * i + c) - ref(3 * i + c)))
        c += 1
      }
      i += 1
    }
    assert(maxY <= 2.0, s"luma diverges from ImageIO by $maxY (>2)")
    assert(maxRgb <= 16,
      s"smooth-gradient RGB diverges by $maxRgb (>16) — more than an " +
        "upsampling-filter difference explains")
  }

  test("JPEG: malformed containers fail loudly") {
    val px = Array.tabulate(64)(pix(_, 31))
    val good = ImageCodecs.encodeJpegGray(8, 8, px)
    assert(intercept[IllegalArgumentException](
      ImageCodecs.decodeJpeg(good.drop(2))).getMessage.contains("SOI"))
    assert(intercept[IllegalArgumentException](
      ImageCodecs.decodeJpeg(good.take(good.length / 2))).getMessage.nonEmpty)
    // SOF2 is SUPPORTED since r15, so flipping SOF0->SOF2 produces a
    // stream whose scan header is invalid FOR progressive (a full
    // 0..63 band on a DC scan) — still a loud reject, not a misdecode
    val prog = good.clone()
    val sofAt = prog.sliding(2).indexWhere(s =>
      (s(0) & 0xff) == 0xff && (s(1) & 0xff) == 0xc0)
    prog(sofAt + 1) = 0xc2.toByte
    assert(intercept[IllegalArgumentException](
      ImageCodecs.decodeJpeg(prog)).getMessage.contains("progressive"))
  }

  // ==================================================================
  // Progressive JPEG (SOF2, r15)
  // ==================================================================

  private def imageIoProgressive(img: BufferedImage): Array[Byte] = {
    import javax.imageio.ImageWriteParam
    val writer = ImageIO.getImageWritersByFormatName("jpeg").next()
    val param = writer.getDefaultWriteParam
    param.setProgressiveMode(ImageWriteParam.MODE_DEFAULT)
    param.setCompressionMode(ImageWriteParam.MODE_EXPLICIT)
    param.setCompressionQuality(1.0f)
    val bos = new java.io.ByteArrayOutputStream()
    val ios = ImageIO.createImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new javax.imageio.IIOImage(img, null, null), param)
    ios.close(); writer.dispose()
    bos.toByteArray
  }

  private def isSof2(bytes: Array[Byte]): Boolean =
    bytes.sliding(2).exists(s =>
      (s(0) & 0xff) == 0xff && (s(1) & 0xff) == 0xc2)

  test("progressive JPEG: our SOF2 encode decodes identically to the " +
      "baseline encode of the same pixels; block-constant is EXACT (r15)") {
    // general pixels: both fixture encoders share the flat-quantizer FDCT,
    // so the two scan layouts must reconstruct the same raster
    val w = 37; val h = 21
    val px = gradient(w, h, 1)
    val progBytes = ImageCodecs.encodeJpegGrayProgressive(w, h, px)
    assert(isSof2(progBytes), "fixture encoder must emit SOF2")
    val prog = ImageCodecs.decodeJpeg(progBytes)
    val base = ImageCodecs.decodeJpeg(ImageCodecs.encodeJpegGray(w, h, px))
    assert(prog.width == w && prog.height == h && prog.channels == 1)
    assert(prog.pixels.sameElements(base.pixels),
      "progressive and baseline scans of identical coefficients diverged")
    // block-constant: DC-only spectrum + quantizer 1 -> exact round trip,
    // and the whole AC scan is one EOB-run chain (the eobrun decode path)
    val side = 40
    val bc = Array.tabulate(side * side) { i =>
      val bx = (i % side) / 8; val by = (i / side) / 8
      pix(by * 5 + bx, 41)
    }
    val bcDecoded = ImageCodecs.decodeJpeg(
      ImageCodecs.encodeJpegGrayProgressive(side, side, bc))
    assert(bcDecoded.pixels.sameElements(bc),
      "block-constant progressive round trip must be exact")
  }

  test("progressive JPEG: ImageIO decodes our SOF2 bytes within ±1") {
    val w = 24; val h = 16
    val px = gradient(w, h, 1)
    val bytes = ImageCodecs.encodeJpegGrayProgressive(w, h, px)
    val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    assert(img != null, "ImageIO rejected our progressive JPEG")
    val got = fromBuffered(img, 1)
    val maxDiff = got.zip(px).map { case (a, b) => math.abs(a - b) }.max
    assert(maxDiff <= 1,
      s"ImageIO read our progressive JPEG with max diff $maxDiff (>1)")
  }

  test("progressive JPEG: we decode the JDK writer's successive-" +
      "approximation scan script; grayscale within ±1 of ImageIO") {
    // the JDK's default progressive script uses spectral selection AND
    // successive approximation (DC first/refine, AC first at Al>0, AC
    // refine) — decoding its output exercises every G.1.2 path
    val w = 37; val h = 21
    val px = gradient(w, h, 1)
    val bytes = imageIoProgressive(toBuffered(Raster(w, h, 1, px)))
    assert(isSof2(bytes), "JDK writer did not emit SOF2 — test is vacuous")
    val ours = ImageCodecs.decodeJpeg(bytes)
    assert(ours.width == w && ours.height == h && ours.channels == 1)
    val ref = fromBuffered(
      ImageIO.read(new java.io.ByteArrayInputStream(bytes)), 1)
    val maxDiff = ours.pixels.zip(ref).map { case (a, b) => math.abs(a - b) }.max
    assert(maxDiff <= 1,
      s"progressive decode diverges from ImageIO by $maxDiff (>1)")
  }

  test("progressive JPEG: JDK-written subsampled color agrees with " +
      "ImageIO on luma within ±2") {
    val w = 40; val h = 24
    val px = gradient(w, h, 3)
    val bytes = imageIoProgressive(toBuffered(Raster(w, h, 3, px)))
    assert(isSof2(bytes), "JDK writer did not emit SOF2 — test is vacuous")
    val ours = ImageCodecs.decodeJpeg(bytes)
    assert(ours.width == w && ours.height == h && ours.channels == 3)
    val ref = fromBuffered(
      ImageIO.read(new java.io.ByteArrayInputStream(bytes)), 3)
    def luma(p: Array[Int], o: Int): Double =
      0.299 * p(o) + 0.587 * p(o + 1) + 0.114 * p(o + 2)
    var maxY = 0.0; var i = 0
    while (i < w * h) {
      maxY = math.max(maxY,
        math.abs(luma(ours.pixels, 3 * i) - luma(ref, 3 * i)))
      i += 1
    }
    assert(maxY <= 2.0, s"progressive color luma diverges by $maxY (>2)")
  }

  test("progressive JPEG: malformed scans fail loudly") {
    val px = Array.tabulate(24 * 24)(pix(_, 51))
    val good = ImageCodecs.encodeJpegGrayProgressive(24, 24, px)
    // truncated mid-scan
    assert(intercept[IllegalArgumentException](
      ImageCodecs.decodeJpeg(good.take(good.length / 2))).getMessage.nonEmpty)
    // an AC scan declaring 3 components is out of spec: craft by patching
    // the second SOS's component count (byte after the SOS length)
    val sosOffsets = good.indices.dropRight(1).filter(i =>
      (good(i) & 0xff) == 0xff && (good(i + 1) & 0xff) == 0xda)
    assert(sosOffsets.length == 2, "fixture must carry DC + AC scans")
    val bad = good.clone()
    bad(sosOffsets(1) + 4) = 3.toByte
    assert(intercept[IllegalArgumentException](
      ImageCodecs.decodeJpeg(bad)).getMessage.nonEmpty)
    // spectral selection out of range (Se > 63)
    val badSe = good.clone()
    // AC SOS payload: len(2) ns(1) comp(2) Ss Se AhAl -> Se at +8
    badSe(sosOffsets(1) + 8) = 77.toByte
    assert(intercept[IllegalArgumentException](
      ImageCodecs.decodeJpeg(badSe)).getMessage.contains("spectral"))
    // AC scan arriving before the component's DC scan (r16, ADVICE r15):
    // swap the two scan segments wholesale — the decoder must fail
    // loudly, not decode with DC = 0
    val eoiOff = good.length - 2
    assert((good(eoiOff) & 0xff) == 0xff && (good(eoiOff + 1) & 0xff) == 0xd9)
    val head = good.take(sosOffsets(0))
    val scan1 = good.slice(sosOffsets(0), sosOffsets(1))
    val scan2 = good.slice(sosOffsets(1), eoiOff)
    val swapped = head ++ scan2 ++ scan1 ++ good.drop(eoiOff)
    assert(intercept[IllegalArgumentException](
      ImageCodecs.decodeJpeg(swapped)).getMessage.contains("AC scan before DC"))
    // a repeated DC first scan must also be loud
    val dupDc = head ++ scan1 ++ scan1 ++ scan2 ++ good.drop(eoiOff)
    assert(intercept[IllegalArgumentException](
      ImageCodecs.decodeJpeg(dupDc)).getMessage.contains("duplicate DC"))
  }

  test("SOF2 flag comes from the marker walk: FF C2 inside an APPn " +
      "payload must not mark a baseline stream progressive (r16, ADVICE r15)") {
    val base = ImageCodecs.encodeJpegGray(8, 8, Array.tabulate(64)(pix(_, 3)))
    assert(!ImageCodecs.jpegIsProgressive(base))
    // inject an APP1 segment whose payload contains FF C2 right after SOI
    val app1 = Array[Byte](0xff.toByte, 0xe1.toByte, 0, 8,
      0xff.toByte, 0xc2.toByte, 1, 2, 3, 4)
    val poisoned = base.take(2) ++ app1 ++ base.drop(2)
    assert(!ImageCodecs.jpegIsProgressive(poisoned),
      "APPn payload bytes must not raise the SOF2 flag")
    // the decode itself still works (APP1 is skipped by length)
    assert(ImageCodecs.decodeJpeg(poisoned).pixels
      .sameElements(ImageCodecs.decodeJpeg(base).pixels))
    // and a REAL progressive stream still flags
    val prog = ImageCodecs.encodeJpegGrayProgressive(8, 8,
      Array.tabulate(64)(pix(_, 3)))
    assert(ImageCodecs.jpegIsProgressive(prog))
  }

  // ==================================================================
  // Adam7 interlace + keyed transparency (r16)
  // ==================================================================

  test("Adam7 PNG: round trip is exact for gray/RGB/RGBA at sizes that " +
      "exercise empty and edge passes (r16)") {
    for {
      ch <- Seq(1, 3, 4)
      (w, h) <- Seq((1, 1), (2, 2), (3, 3), (5, 1), (1, 5), (8, 8),
        (13, 7), (16, 16), (17, 19))
    } {
      val px = gradient(w, h, ch)
      // rotating filter across the GLOBAL pass-row counter exercises all
      // five unfilter branches against pass-local prior rows
      val bytes = ImageCodecs.encodePngInterlaced(
        Raster(w, h, ch, px), filterFor = i => i % 5)
      val got = ImageCodecs.decodePng(bytes)
      assert(got.width == w && got.height == h && got.channels == ch)
      assert(got.pixels.sameElements(px),
        s"ch=$ch ${w}x$h: Adam7 round trip diverged")
    }
  }

  test("Adam7 PNG: ImageIO decodes our interlaced bytes exactly (r16)") {
    for (ch <- Seq(1, 3, 4)) {
      val (w, h) = (13, 11)
      val px = gradient(w, h, ch)
      val bytes = ImageCodecs.encodePngInterlaced(
        Raster(w, h, ch, px), filterFor = i => (i + 2) % 5)
      val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, "ImageIO rejected our interlaced PNG")
      assert(fromBuffered(img, ch).sameElements(px),
        s"ch=$ch: ImageIO read different pixels from our Adam7 PNG")
    }
  }

  test("Adam7 PNG: malformed interlace fields and short pass streams " +
      "fail loudly (r16)") {
    val good = ImageCodecs.encodePngInterlaced(
      Raster(8, 8, 1, gradient(8, 8, 1)))
    // IHDR interlace byte = 2 (unknown method): find IHDR data offset —
    // signature(8) + len(4) + type(4) + 13 bytes; interlace is the last
    val bad = good.clone()
    bad(8 + 8 + 12) = 2.toByte
    // fix the IHDR CRC so the reject is the interlace check, not the CRC
    val crc = new java.util.zip.CRC32()
    crc.update(bad, 12, 4 + 13)
    val cv = crc.getValue.toInt
    bad(8 + 8 + 13) = (cv >>> 24).toByte
    bad(8 + 8 + 14) = (cv >>> 16).toByte
    bad(8 + 8 + 15) = (cv >>> 8).toByte
    bad(8 + 8 + 16) = cv.toByte
    assert(intercept[IllegalArgumentException](
      ImageCodecs.decodePng(bad)).getMessage.contains("interlace"))
    // a sequential stream declared interlaced is SHORTER than the seven
    // passes need (interlaced rasters carry extra filter bytes) — the
    // inflate length check must reject it, not misread pixel geometry
    val seq = ImageCodecs.encodePng(Raster(8, 8, 1, gradient(8, 8, 1)))
    val lie = seq.clone()
    lie(8 + 8 + 12) = 1.toByte
    val crc2 = new java.util.zip.CRC32()
    crc2.update(lie, 12, 4 + 13)
    val cv2 = crc2.getValue.toInt
    lie(8 + 8 + 13) = (cv2 >>> 24).toByte
    lie(8 + 8 + 14) = (cv2 >>> 16).toByte
    lie(8 + 8 + 15) = (cv2 >>> 8).toByte
    lie(8 + 8 + 16) = cv2.toByte
    val lieMsg = intercept[IllegalArgumentException](
      ImageCodecs.decodePng(lie)).getMessage
    assert(lieMsg.contains("truncated") || lieMsg.contains("decompressed"),
      s"short interlaced stream must fail on length, got: $lieMsg")
  }

  // ==================================================================
  // CMYK / YCCK JPEG (r16)
  // ==================================================================

  test("CMYK JPEG: block-constant 4-component round trip is exact, " +
      "composite matches the documented integer formula (r16)") {
    // 16x16 = 4 blocks; stored planes are Adobe-INVERTED values
    val (w, h) = (16, 16)
    def blockPlane(vals: Array[Int]): Array[Int] =
      Array.tabulate(w * h)(i => vals(((i / w) / 8) * 2 + (i % w) / 8))
    val cP = blockPlane(Array(255, 128, 0, 77))
    val mP = blockPlane(Array(200, 255, 10, 150))
    val yP = blockPlane(Array(50, 0, 255, 230))
    val kP = blockPlane(Array(255, 255, 128, 40))
    val bytes = ImageCodecs.encodeJpegAdobe(w, h, Seq(cP, mP, yP, kP),
      transform = 0)
    val r = ImageCodecs.decodeJpeg(bytes)
    assert(r.width == w && r.height == h && r.channels == 3,
      "CMYK must composite to RGB")
    var i = 0
    while (i < w * h) {
      assert(r.pixels(i * 3) == (cP(i) * kP(i) + 127) / 255 &&
        r.pixels(i * 3 + 1) == (mP(i) * kP(i) + 127) / 255 &&
        r.pixels(i * 3 + 2) == (yP(i) * kP(i) + 127) / 255,
        s"pixel $i: CMYK composite diverged")
      i += 1
    }
  }

  test("CMYK JPEG: ImageIO's raster of our bytes returns the stored " +
      "planes (independent entropy/DCT pin) (r16)") {
    val (w, h) = (8, 8)
    val planes = Seq(
      Array.fill(64)(210), Array.fill(64)(99),
      Array.fill(64)(3), Array.fill(64)(180))
    val bytes = ImageCodecs.encodeJpegAdobe(w, h, planes, transform = 0)
    // the JDK JPEG reader cannot color-manage CMYK but reads the RAW
    // raster — an independent decode of our entropy coding and DCT
    val it = ImageIO.getImageReadersByFormatName("jpeg")
    assert(it.hasNext, "no JDK JPEG reader")
    val reader = it.next()
    reader.setInput(ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    val raster = reader.readRaster(0, null)
    assert(raster.getNumBands == 4, "JDK must see 4 bands")
    for (b <- 0 until 4; y <- 0 until h; x <- 0 until w)
      assert(raster.getSample(x, y, b) == planes(b)(y * w + x),
        s"band $b ($x,$y): JDK raster diverged from the stored plane")
  }

  test("YCCK JPEG: decodes through the inverse matrix to the CMYK " +
      "composite within IDCT/matrix rounding (r16)") {
    val (w, h) = (8, 8)
    // desired stored-CMYK (inverted) values, one constant block
    val (c, m, yv, k) = (180, 90, 30, 200)
    // forward BT.601 of (c', m', y') — what a YCCK writer stores
    def clamp(v: Double) = math.max(0, math.min(255, v.round.toInt))
    val lum = clamp(0.299 * c + 0.587 * m + 0.114 * yv)
    val cb = clamp(128 - 0.168736 * c - 0.331264 * m + 0.5 * yv)
    val cr = clamp(128 + 0.5 * c - 0.418688 * m - 0.081312 * yv)
    val bytes = ImageCodecs.encodeJpegAdobe(w, h,
      Seq(Array.fill(64)(lum), Array.fill(64)(cb), Array.fill(64)(cr),
        Array.fill(64)(k)), transform = 2)
    val r = ImageCodecs.decodeJpeg(bytes)
    assert(r.channels == 3)
    val want = Seq((c * k + 127) / 255, (m * k + 127) / 255,
      (yv * k + 127) / 255)
    (0 until 3).foreach { ch =>
      assert(math.abs(r.pixels(ch) - want(ch)) <= 3,
        s"channel $ch: YCCK ${r.pixels(ch)} vs CMYK-direct ${want(ch)} " +
          "(forward+inverse matrix rounding must stay within 3)")
    }
  }

  test("4-component JPEG: transform-1 APP14 rejected, missing APP14 " +
      "decodes as raw CMYK (r16)") {
    val planes = Seq(Array.fill(64)(100), Array.fill(64)(100),
      Array.fill(64)(100), Array.fill(64)(255))
    val good = ImageCodecs.encodeJpegAdobe(8, 8, planes, transform = 0)
    // flip the APP14 transform byte to 1 (YCbCr): illegal with 4 comps
    val bad = good.clone()
    // APP14 data starts after SOI(2) + marker(2) + len(2): transform is
    // the last byte of the 14-byte segment payload
    val trOff = 2 + 2 + 2 + 11
    assert((bad(trOff) & 0xff) == 0, "fixture layout changed")
    bad(trOff) = 1
    assert(intercept[IllegalArgumentException](
      ImageCodecs.decodeJpeg(bad)).getMessage.contains("transform 1"))
    // strip APP14 entirely (marker 2 + len-covered 14 bytes): 4
    // components default to raw CMYK
    val stripped = good.take(2) ++ good.drop(2 + 16)
    val r = ImageCodecs.decodeJpeg(stripped)
    assert(r.pixels(0) == (100 * 255 + 127) / 255,
      "APP14-less 4-component stream must composite as raw CMYK")
  }

  test("gray/truecolor tRNS: keyed transparency decodes to an alpha " +
      "channel, ImageIO agrees on 8-bit (r16, ADVICE r15)") {
    // 8-bit gray, key = 7: scanlines are (filter 0, then w samples)
    val gvals = Array(7, 8, 9, 7)
    val gScan = Array[Byte](0, 7, 8, 0, 9, 7)
    val gBytes = ImageCodecs.pngContainer(2, 2, 8, 0,
      Seq(("tRNS", Array[Byte](0, 7))), gScan)
    val g = ImageCodecs.decodePng(gBytes)
    assert(g.channels == 4, "gray+tRNS must widen to RGBA")
    gvals.zipWithIndex.foreach { case (v, i) =>
      assert(g.pixels(i * 4) == v && g.pixels(i * 4 + 1) == v &&
        g.pixels(i * 4 + 2) == v, s"pixel $i gray value")
      assert(g.pixels(i * 4 + 3) == (if (v == 7) 0 else 255),
        s"pixel $i alpha vs key")
    }
    val gImg = ImageIO.read(new java.io.ByteArrayInputStream(gBytes))
    assert(gImg != null && gImg.getColorModel.hasAlpha,
      "ImageIO must see the gray tRNS alpha")
    gvals.zipWithIndex.foreach { case (v, i) =>
      val argb = gImg.getRGB(i % 2, i / 2)
      assert(((argb >>> 24) & 0xff) == (if (v == 7) 0 else 255),
        s"pixel $i: ImageIO alpha diverged")
    }
    // 8-bit truecolor, key = (1, 2, 3): only the EXACT triple is keyed
    val tScan = Array[Byte](0, 1, 2, 3, 1, 2, 4, 0, 1, 2, 3, 9, 9, 9)
    val tBytes = ImageCodecs.pngContainer(2, 2, 8, 2,
      Seq(("tRNS", Array[Byte](0, 1, 0, 2, 0, 3))), tScan)
    val t = ImageCodecs.decodePng(tBytes)
    assert(t.channels == 4)
    val wantAlpha = Seq(0, 255, 0, 255)
    wantAlpha.zipWithIndex.foreach { case (a, i) =>
      assert(t.pixels(i * 4 + 3) == a, s"truecolor pixel $i alpha")
    }
    val tImg = ImageIO.read(new java.io.ByteArrayInputStream(tBytes))
    assert(tImg != null && tImg.getColorModel.hasAlpha)
    wantAlpha.zipWithIndex.foreach { case (a, i) =>
      assert(((tImg.getRGB(i % 2, i / 2) >>> 24) & 0xff) == a,
        s"truecolor pixel $i: ImageIO alpha diverged")
    }
    // 16-bit gray: the key compares at FULL stored precision — samples
    // 0x0102 (== key -> transparent) and 0x0103 (high byte equal, low
    // byte differs -> opaque) must differ in alpha
    val g16Scan = Array[Byte](0, 1, 2, 1, 3)
    val g16 = ImageCodecs.decodePng(ImageCodecs.pngContainer(2, 1, 16, 0,
      Seq(("tRNS", Array[Byte](1, 2))), g16Scan))
    assert(g16.channels == 4)
    assert(g16.pixels(0) == 1 && g16.pixels(4) == 1,
      "16-bit gray downconverts to the high byte")
    assert(g16.pixels(3) == 0, "exact 16-bit key match must be transparent")
    assert(g16.pixels(7) == 255,
      "low-byte mismatch must stay opaque — the key compares at full " +
        "precision, not on the downconverted byte")
    // tRNS on an alpha-bearing color type stays loudly illegal
    val gaScan = Array[Byte](0, 5, 200.toByte)
    val bad = intercept[IllegalArgumentException](ImageCodecs.decodePng(
      ImageCodecs.pngContainer(1, 1, 8, 4,
        Seq(("tRNS", Array[Byte](0, 5))), gaScan)))
    assert(bad.getMessage.contains("spec-illegal"))
  }

  test("Adam7 PNG: interlaced palette and sub-byte profiles decode " +
      "against the sequential reference (r16)") {
    // build a 9x5 depth-4 gray image both ways from the same samples:
    // the interlaced container must land on the identical raster
    val (w, h) = (9, 5)
    val vals = Array.tabulate(w * h)(i => pix(i, 77) & 0xf)
    def pack4(row: Array[Int]): Array[Byte] = {
      val out = new Array[Byte]((row.length + 1) / 2)
      row.zipWithIndex.foreach { case (v, i) =>
        out(i / 2) = (out(i / 2) | (v << (if (i % 2 == 0) 4 else 0))).toByte
      }
      out
    }
    val seqScan = new java.io.ByteArrayOutputStream()
    (0 until h).foreach { y =>
      seqScan.write(0)
      seqScan.write(pack4(vals.slice(y * w, (y + 1) * w)))
    }
    val seqPng = ImageCodecs.pngContainer(w, h, 4, 0, Nil,
      seqScan.toByteArray)
    val ref = ImageCodecs.decodePng(seqPng)
    // Adam7: emit the seven passes' packed sub-rows from the same grid
    val passes = Seq((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
      (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    val intScan = new java.io.ByteArrayOutputStream()
    passes.foreach { case (xs, ys, xd, yd) =>
      val pw = math.max(0, (w - xs + xd - 1) / xd)
      val ph = math.max(0, (h - ys + yd - 1) / yd)
      if (pw > 0 && ph > 0) (0 until ph).foreach { py =>
        intScan.write(0)
        intScan.write(pack4(Array.tabulate(pw)(px =>
          vals((ys + py * yd) * w + (xs + px * xd)))))
      }
    }
    val intPng = ImageCodecs.pngContainer(w, h, 4, 0, Nil,
      intScan.toByteArray, interlace = 1)
    val got = ImageCodecs.decodePng(intPng)
    assert(got.channels == ref.channels && got.pixels.sameElements(ref.pixels),
      "interlaced sub-byte decode diverged from the sequential reference")
    // and ImageIO agrees with both
    val img = ImageIO.read(new java.io.ByteArrayInputStream(intPng))
    assert(img != null, "ImageIO rejected the interlaced depth-4 PNG")
    (0 until w * h).foreach { i =>
      assert(img.getRaster.getSample(i % w, i / w, 0) * 255 / 15 ==
        ref.pixels(i), s"pixel $i: ImageIO sub-byte interlace diverged")
    }
  }
}
