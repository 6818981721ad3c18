package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import javax.imageio.ImageIO
import java.awt.image.BufferedImage
import GifCodec._
import ImageCodecs.Raster

/** GIF codec pins. The JDK ships an independent GIF implementation via
  * ImageIO — both directions are cross-checked against it (GIF's LZW is
  * lossless, so agreement is exact), plus hand-built streams for the
  * animation/disposal semantics ImageIO's plain `read` doesn't surface.
  */
class GifCodecSpec extends AnyFunSuite {

  /** Deterministic pseudo-noise image: enough distinct 2-grams to grow
    * the LZW code width and (at larger sizes) overflow the 4096-entry
    * table, exercising the clear/reset path.
    */
  private def noise(w: Int, h: Int, seed: Int): Array[Int] =
    Array.tabulate(w * h)(i => ((i * 2654435761L + seed * 40503L) >>> 16).toInt & 0xff)

  private def gray(r: Raster): Array[Int] = {
    assert(r.channels == 3 || r.channels == 4, s"channels=${r.channels}")
    val out = new Array[Int](r.width * r.height)
    var i = 0
    while (i < out.length) {
      val o = i * r.channels
      assert(r.pixels(o) == r.pixels(o + 1) && r.pixels(o) == r.pixels(o + 2),
        s"non-gray sample at $i")
      out(i) = r.pixels(o)
      i += 1
    }
    out
  }

  test("round trip: sequential and interlaced, odd sizes, code growth") {
    for {
      (w, h) <- Seq((1, 1), (7, 3), (8, 8), (16, 16), (255, 2), (64, 64), (100, 100))
      il <- Seq(false, true)
    } {
      val px = noise(w, h, w * 1000 + h)
      val bytes = encodeGifGray(w, h, px, interlaced = il)
      val r = decodeGif(bytes)
      assert(r.width == w && r.height == h, s"${w}x$h il=$il: wrong dims")
      assert(gray(r).sameElements(px), s"${w}x$h il=$il: pixel mismatch")
    }
  }

  test("ImageIO decodes our bytes exactly (independent reader)") {
    for (il <- Seq(false, true)) {
      val (w, h) = (23, 17)
      val px = noise(w, h, 7)
      val img = ImageIO.read(
        new java.io.ByteArrayInputStream(encodeGifGray(w, h, px, interlaced = il)))
      assert(img != null, "ImageIO rejected our GIF")
      assert(img.getWidth == w && img.getHeight == h)
      for (y <- 0 until h; x <- 0 until w) {
        val rgb = img.getRGB(x, y)
        val v = px(y * w + x)
        assert((rgb & 0xffffff) == ((v << 16) | (v << 8) | v),
          s"il=$il ($x,$y): ImageIO read ${rgb & 0xffffff}, want gray $v")
      }
    }
  }

  test("we decode ImageIO-written bytes exactly (independent writer)") {
    val (w, h) = (31, 19)
    val px = noise(w, h, 11)
    // an explicit identity-gray palette image: TYPE_BYTE_GRAY would route
    // setRGB through a linear-gray colorspace conversion and store
    // different samples
    val ramp = Array.tabulate(256)(_.toByte)
    val icm = new java.awt.image.IndexColorModel(8, 256, ramp, ramp, ramp)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_BYTE_INDEXED, icm)
    for (y <- 0 until h; x <- 0 until w)
      img.getRaster.setSample(x, y, 0, px(y * w + x))
    val bos = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(img, "gif", bos), "ImageIO has no gif writer")
    val r = decodeGif(bos.toByteArray)
    assert(r.width == w && r.height == h)
    // ImageIO's gray->palette quantization is exact for a gray ramp image
    val got = gray(r)
    for (i <- px.indices)
      assert(got(i) == px(i), s"pixel $i: got ${got(i)}, want ${px(i)}")
  }

  test("keyed transparency: transparent index becomes alpha-0 holes") {
    val (w, h) = (4, 2)
    val px = Array(10, 20, 10, 30, 40, 10, 50, 60)
    val r = decodeGif(encodeGifGray(w, h, px, transparentIdx = 10))
    assert(r.channels == 4)
    for (i <- px.indices) {
      val a = r.pixels(i * 4 + 3)
      assert(a == (if (px(i) == 10) 0 else 255), s"alpha wrong at $i")
    }
  }

  test("animation: disposal 1 accumulates partial frames") {
    val base = GifFrameSpec(0, 0, 4, 4, Array.fill(16)(100), disposal = 1)
    val patch = GifFrameSpec(1, 1, 2, 2, Array(1, 2, 3, 4), disposal = 1)
    val frames = decodeGifFrames(encodeGifAnimated(4, 4, Seq(base, patch)))
    assert(frames.size == 2)
    val f1 = gray(frames.head)
    assert(f1.forall(_ == 100))
    val f2 = gray(frames(1))
    // patch lands at (1,1)-(2,2); rest keeps 100
    val want = Array(
      100, 100, 100, 100,
      100, 1, 2, 100,
      100, 3, 4, 100,
      100, 100, 100, 100)
    assert(f2.sameElements(want), s"composited frame 2 wrong: ${f2.toSeq}")
  }

  test("animation: disposal 2 restores the rect to transparent background") {
    val base = GifFrameSpec(0, 0, 3, 3, Array.fill(9)(50), disposal = 1)
    val flash = GifFrameSpec(0, 0, 2, 1, Array(200, 201), disposal = 2,
      transparentIdx = 255)
    val after = GifFrameSpec(2, 2, 1, 1, Array(9), disposal = 1,
      transparentIdx = 255)
    val frames = decodeGifFrames(encodeGifAnimated(3, 3, Seq(base, flash, after)))
    assert(frames.size == 3)
    // any frame carries transparency -> all composited frames are RGBA
    assert(frames.forall(_.channels == 4))
    val f3 = frames(2)
    // after flash's disposal-2, (0,0)-(1,0) are transparent holes
    assert(f3.pixels(3) == 0 && f3.pixels(7) == 0, "disposal-2 rect not cleared")
    // untouched base pixel still opaque 50
    assert(f3.pixels(2 * 4) == 50 && f3.pixels(2 * 4 + 3) == 255)
    // the new frame's own pixel
    val o = (2 * 3 + 2) * 4
    assert(f3.pixels(o) == 9 && f3.pixels(o + 3) == 255)
  }

  test("animation: disposal 3 restores the previous canvas") {
    val base = GifFrameSpec(0, 0, 2, 2, Array(10, 20, 30, 40), disposal = 1)
    val blot = GifFrameSpec(0, 0, 2, 2, Array.fill(4)(99), disposal = 3)
    val last = GifFrameSpec(0, 0, 1, 1, Array(7), disposal = 1)
    val frames = decodeGifFrames(encodeGifAnimated(2, 2, Seq(base, blot, last)))
    val f3 = gray(frames(2))
    // blot disposed to previous -> base shows through except the new pixel
    assert(f3.sameElements(Array(7, 20, 30, 40)), s"got ${f3.toSeq}")
  }

  test("ImageIO agrees on every composited frame of a disposal-1 animation") {
    val specs = Seq(
      GifFrameSpec(0, 0, 5, 4, noise(5, 4, 1), disposal = 1),
      GifFrameSpec(1, 1, 3, 2, noise(3, 2, 2), disposal = 1),
      GifFrameSpec(0, 2, 4, 2, noise(4, 2, 3), disposal = 1))
    val bytes = encodeGifAnimated(5, 4, specs)
    val frames = decodeGifFrames(bytes)
    val rd = ImageIO.getImageReadersByFormatName("gif").next()
    rd.setInput(ImageIO.createImageInputStream(
      new java.io.ByteArrayInputStream(bytes)))
    assert(rd.getNumImages(true) == 3)
    // composite ImageIO's per-frame rasters independently (disposal 1 =
    // draw each frame at its offset over the running canvas)
    val canvas = new BufferedImage(5, 4, BufferedImage.TYPE_INT_RGB)
    val g2 = canvas.createGraphics()
    for (i <- 0 until 3) {
      val fr = rd.read(i)
      g2.drawImage(fr, specs(i).left, specs(i).top, null)
      val ours = frames(i)
      for (y <- 0 until 4; x <- 0 until 5) {
        val o = (y * 5 + x) * ours.channels
        val want = canvas.getRGB(x, y) & 0xffffff
        val got = (ours.pixels(o) << 16) | (ours.pixels(o + 1) << 8) | ours.pixels(o + 2)
        assert(got == want, s"frame $i ($x,$y): got $got want $want")
      }
    }
    g2.dispose()
  }

  test("malformed containers fail loudly") {
    val good = encodeGifGray(4, 4, noise(4, 4, 5))
    def bad(b: Array[Byte]): Unit =
      intercept[IllegalArgumentException](decodeGif(b))
    bad("NOTGIF".getBytes ++ good.drop(6)) // signature
    bad(good.dropRight(1)) // missing trailer
    bad(good.take(10)) // truncated
    // declared pixel count vs LZW payload: shrink height in the image
    // descriptor (offset: 6 header + 7 LSD + 768 GCT = 781; height at +8)
    val shrunk = good.clone()
    shrunk(781 + 7) = 2; shrunk(781 + 8) = 0
    bad(shrunk)
    // decodeGif refuses multi-frame containers
    val anim = encodeGifAnimated(2, 2,
      Seq(GifFrameSpec(0, 0, 2, 2, Array(1, 2, 3, 4)),
        GifFrameSpec(0, 0, 2, 2, Array(5, 6, 7, 8))))
    intercept[IllegalArgumentException](decodeGif(anim))
    assert(decodeGifFrames(anim).size == 2)
  }

  test("LZW table overflow (clear/reset mid-stream) round trips") {
    // 200x100 noise: 20k pixels of high-entropy 2-grams overflows the
    // 4096-entry table several times
    val (w, h) = (200, 100)
    val px = noise(w, h, 99)
    val r = decodeGif(encodeGifGray(w, h, px))
    assert(gray(r).sameElements(px))
    // and ImageIO agrees the stream is legal
    val img = ImageIO.read(
      new java.io.ByteArrayInputStream(encodeGifGray(w, h, px)))
    assert(img != null)
    assert((img.getRGB(w - 1, h - 1) & 0xff) == px(w * h - 1))
  }
}
