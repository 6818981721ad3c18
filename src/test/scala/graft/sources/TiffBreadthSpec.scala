package graft.sources.tiff

import java.awt.image.BufferedImage
import java.io.ByteArrayOutputStream
import java.nio.file.{Files, Paths}
import javax.imageio.{IIOImage, ImageIO, ImageWriteParam}
import javax.imageio.stream.MemoryCacheImageOutputStream

import graft.SparkSpec
import graft.n5.N5
import org.apache.spark.sql.functions._

/** TIFF breadth beyond striped grayscale (r7 VERDICT #6): tiled layouts
  * decode, RGB series ingest per-channel (the reference's tifffile
  * tolerance, `tif_to_n5.py:21`), and the two hard walls — BigTIFF and
  * accidentally feeding RGB to the grayscale path — fail with curated
  * messages instead of opaque raster errors.
  */
class TiffBreadthSpec extends SparkSpec {

  private def rgb(w: Int, h: Int, z: Int): BufferedImage = {
    val im = new BufferedImage(w, h, BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until h; x <- 0 until w) {
      val r = (x + y + z) % 256
      val g = (2 * x + z) % 256
      val b = (3 * y + z) % 256
      im.setRGB(x, y, (r << 16) | (g << 8) | b)
    }
    im
  }

  private def tiffBytes(im: BufferedImage): Array[Byte] = {
    val bos = new ByteArrayOutputStream()
    require(ImageIO.write(im, "tiff", bos))
    bos.toByteArray
  }

  test("a tiled grayscale TIFF decodes like a striped one") {
    val w = 40; val h = 24
    val px = Array.tabulate(w * h)(i => i % 251)
    val im = TiffIO.buildImage(w, h, px, 8)
    val writer = ImageIO.getImageWritersByFormatName("tiff").next()
    val param = writer.getDefaultWriteParam
    param.setTilingMode(ImageWriteParam.MODE_EXPLICIT)
    param.setTiling(16, 16, 0, 0)
    val bos = new ByteArrayOutputStream()
    val ios = new MemoryCacheImageOutputStream(bos)
    writer.setOutput(ios)
    writer.write(null, new IIOImage(im, null, null), param)
    ios.close()
    val s = TiffIO.decode(bos.toByteArray)
    assert((s.width, s.height, s.bits) == (w, h, 8))
    assert(s.pixels.toSeq == px.toSeq, "tiled decode diverges from source pixels")
  }

  test("an RGB slice series ingests into per-channel c{b} volumes") {
    val (w, h, nz) = (20, 10, 3)
    val dir = Files.createTempDirectory("rgbtif")
    for (z <- 0 until nz)
      Files.write(dir.resolve(f"slice_$z%05d.tif"), tiffBytes(rgb(w, h, z)))
    val root = Files.createTempDirectory("rgbn5").toString + "/v.n5"
    val (bands, attrs) = TiffVolume.ingestSlicesPerChannel(
      spark, dir.toString, root, "vol/s0", Array(8, 8, 2))
    assert(bands == 3)
    assert(attrs.dimensions.toSeq == Seq(w.toLong, h.toLong, nz.toLong))
    // every channel is a full volume carrying ITS band's values
    val expected = Seq[(Long, Long, Long) => Long](
      (x, y, z) => (x + y + z) % 256,
      (x, y, z) => (2 * x + z) % 256,
      (x, y, z) => (3 * y + z) % 256)
    for (b <- 0 until 3) {
      val bad = N5.elements(N5.read(spark, root, s"c$b/vol/s0"))
        .select(col("x"), col("y"), col("z"), col("v"))
        .collect().count { r =>
          expected(b)(r.getLong(0), r.getLong(1), r.getLong(2)) !=
            r.getAs[Number](3).longValue()
        }
      assert(bad == 0, s"channel $b has $bad mismatched voxels")
    }
  }

  test("feeding an RGB series to the grayscale ingest fails with guidance") {
    val dir = Files.createTempDirectory("rgbwrong")
    Files.write(dir.resolve("slice_00000.tif"), tiffBytes(rgb(8, 8, 0)))
    val root = Files.createTempDirectory("rgbwrongn5").toString + "/v.n5"
    val ex = intercept[Exception] {
      TiffVolume.ingestSlices(spark, dir.toString, root, "vol/s0", Array(8, 8, 1))
    }
    val chain = Iterator.iterate(ex: Throwable)(_.getCause)
      .takeWhile(_ != null).map(e => Option(e.getMessage).getOrElse("")).toSeq
    assert(chain.exists(_.contains("ingestSlicesPerChannel")),
      s"expected the per-channel guidance, got: $chain")
  }

  test("BigTIFF input fails with a curated message, not an opaque error") {
    // classic BigTIFF header: II, version 43, offset bytesize 8
    val bytes = Array[Byte]('I', 'I', 43, 0, 8, 0, 0, 0,
      16, 0, 0, 0, 0, 0, 0, 0)
    val ex = intercept[IllegalArgumentException] { TiffIO.decode(bytes) }
    assert(ex.getMessage.contains("BigTIFF"))
    val ex2 = intercept[IllegalArgumentException] { TiffIO.decodeBands(bytes) }
    assert(ex2.getMessage.contains("BigTIFF"))
  }

  test("16-bit grayscale via the band decoder keeps its depth") {
    val px = Array.tabulate(12)(i => i * 5000 % 65536)
    val enc = TiffIO.encode(4, 3, px, 16)
    val bands = TiffIO.decodeBands(enc)
    assert(bands.size == 1)
    assert(bands.head.bits == 16)
    assert(bands.head.pixels.toSeq == px.toSeq)
  }
}
