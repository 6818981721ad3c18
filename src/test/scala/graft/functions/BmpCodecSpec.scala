package graft.functions

import org.scalatest.funsuite.AnyFunSuite
import javax.imageio.ImageIO
import java.awt.image.BufferedImage
import BmpCodec._

/** BMP codec pins against the JDK's independent ImageIO BMP
  * implementation, both directions, plus the parser's loud-failure
  * contract (row padding, bottom-up vs top-down, palette bounds).
  */
class BmpCodecSpec extends AnyFunSuite {

  private def noise(w: Int, h: Int, seed: Int): Array[Int] =
    Array.tabulate(w * h)(i => ((i * 2654435761L + seed * 40503L) >>> 16).toInt & 0xff)

  private def gray(r: ImageCodecs.Raster): Array[Int] = {
    assert(r.channels == 3)
    Array.tabulate(r.width * r.height) { i =>
      val o = i * 3
      assert(r.pixels(o) == r.pixels(o + 1) && r.pixels(o) == r.pixels(o + 2),
        s"non-gray sample at $i")
      r.pixels(o)
    }
  }

  test("round trip: 8-bit palette and 24-bit, padded and unpadded widths") {
    for {
      (w, h) <- Seq((1, 1), (4, 4), (5, 3), (7, 2), (8, 8), (33, 9))
      wide <- Seq(false, true)
    } {
      val px = noise(w, h, w * 100 + h)
      val bytes = if (wide) encodeBmpGray24(w, h, px) else encodeBmpGray(w, h, px)
      val r = decodeBmp(bytes)
      assert(r.width == w && r.height == h, s"${w}x$h wide=$wide dims")
      assert(gray(r).sameElements(px), s"${w}x$h wide=$wide pixels")
    }
  }

  test("ImageIO decodes our bytes exactly (independent reader)") {
    val (w, h) = (11, 6)
    val px = noise(w, h, 3)
    for ((bytes, paletted) <- Seq(
        (encodeBmpGray(w, h, px), true), (encodeBmpGray24(w, h, px), false))) {
      val img = ImageIO.read(new java.io.ByteArrayInputStream(bytes))
      assert(img != null, "ImageIO rejected our BMP")
      for (y <- 0 until h; x <- 0 until w) {
        val v = px(y * w + x)
        if (paletted)
          // ImageIO recognizes the identity-gray palette and loads a
          // TYPE_BYTE_GRAY image whose getRGB goes through a gray→sRGB
          // colorspace conversion; the RAW sample is the palette index
          assert(img.getRaster.getSample(x, y, 0) == v,
            s"($x,$y) palette: want index $v")
        else
          assert((img.getRGB(x, y) & 0xffffff) == ((v << 16) | (v << 8) | v),
            s"($x,$y) 24-bit: want gray $v")
      }
    }
  }

  test("we decode ImageIO-written bytes exactly (independent writer)") {
    val (w, h) = (9, 7)
    val px = noise(w, h, 5)
    val img = new BufferedImage(w, h, BufferedImage.TYPE_3BYTE_BGR)
    for (y <- 0 until h; x <- 0 until w) {
      val v = px(y * w + x)
      img.setRGB(x, y, (v << 16) | (v << 8) | v)
    }
    val bos = new java.io.ByteArrayOutputStream()
    assert(ImageIO.write(img, "bmp", bos), "ImageIO has no bmp writer")
    val r = decodeBmp(bos.toByteArray)
    assert(r.width == w && r.height == h)
    assert(gray(r).sameElements(px))
  }

  test("top-down (negative height) rows land correctly") {
    // hand-flip a bottom-up container into top-down: negate the height
    // and reverse the stored row order
    val (w, h) = (5, 3)
    val px = noise(w, h, 9)
    val up = encodeBmpGray24(w, h, px)
    val rowBytes = (w * 3 + 3) & ~3
    val down = up.clone()
    // height field at offset 22, little-endian
    val neg = -h
    down(22) = (neg & 0xff).toByte; down(23) = ((neg >> 8) & 0xff).toByte
    down(24) = ((neg >> 16) & 0xff).toByte; down(25) = ((neg >> 24) & 0xff).toByte
    for (y <- 0 until h)
      System.arraycopy(up, 54 + (h - 1 - y) * rowBytes, down, 54 + y * rowBytes,
        rowBytes)
    val r = decodeBmp(down)
    assert(gray(r).sameElements(px), "top-down decode diverged")
  }

  test("malformed containers fail loudly") {
    val good = encodeBmpGray(4, 4, noise(4, 4, 1))
    def bad(b: Array[Byte], msg: String): Unit = {
      val e = intercept[IllegalArgumentException](decodeBmp(b))
      assert(e.getMessage.contains(msg), e.getMessage)
    }
    bad("XX".getBytes ++ good.drop(2), "bad signature")
    bad(good.take(40), "truncated header")
    val rle = good.clone(); rle(30) = 1 // compression field
    bad(rle, "unsupported compression 1")
    val deep = good.clone(); deep(28) = 16
    bad(deep, "unsupported bit depth 16")
    bad(good.dropRight(8), "exceeds file size")
  }
}
