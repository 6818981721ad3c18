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
    // Adam7 announced in IHDR -> loud reject (flip byte + fix CRC)
    val adam = good.clone()
    adam(8 + 4 + 4 + 12) = 1 // IHDR interlace byte
    val crc = new java.util.zip.CRC32()
    crc.update(adam, 12, 17) // chunk type + 13 data bytes
    val cv = crc.getValue.toInt
    adam(29) = (cv >>> 24).toByte; adam(30) = (cv >>> 16).toByte
    adam(31) = (cv >>> 8).toByte; adam(32) = cv.toByte
    assert(intercept[IllegalArgumentException](
      ImageCodecs.decodePng(adam)).getMessage.contains("Adam7"))
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
  }
}
