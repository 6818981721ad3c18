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
    // progressive must be rejected by NAME, not misdecoded: flip SOF0->SOF2
    val prog = good.clone()
    val sofAt = prog.sliding(2).indexWhere(s =>
      (s(0) & 0xff) == 0xff && (s(1) & 0xff) == 0xc0)
    prog(sofAt + 1) = 0xc2.toByte
    assert(intercept[IllegalArgumentException](
      ImageCodecs.decodeJpeg(prog)).getMessage.contains("progressive"))
  }
}
