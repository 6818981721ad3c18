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

  test("a many-file gappy series ingests through the distributed manifest " +
      "in numeric order") {
    // 420 slices — far more than any partition count — with GAPPY numeric
    // suffixes (step 3, starting at 7) and MIXED zero-padding, so numeric
    // order ≠ lexical order and rank ≠ raw suffix: the r12 DataFrame-
    // resident manifest (distributed sort + zipWithIndex + executor-side
    // open-per-task; no driver collect of (path, z) pairs) must still
    // assign z = dense numeric rank, exactly like the old driver-side sort
    val (w, h, nz) = (6, 4, 420)
    val dir = Files.createTempDirectory("manytif")
    for (i <- 0 until nz) {
      val suffix = 7 + 3 * i
      val name =
        if (i % 2 == 0) f"s_$suffix%07d.tif" else s"s_$suffix.tif"
      Files.write(dir.resolve(name),
        TiffIO.encode(w, h, Array.fill(w * h)(i % 251), 8))
    }
    val root = Files.createTempDirectory("manyn5").toString + "/v.n5"
    val attrs = TiffVolume.ingestSlices(
      spark, dir.toString, root, "vol/s0", Array(4, 4, 64))
    assert(attrs.dimensions.toSeq == Seq(w.toLong, h.toLong, nz.toLong))
    val perZ = N5.elements(N5.read(spark, root, "vol/s0"))
      .groupBy(col("z")).agg(min(col("v")).as("lo"), max(col("v")).as("hi"))
      .collect().map(r => (r.getLong(0),
        r.getAs[Number](1).longValue(), r.getAs[Number](2).longValue()))
    assert(perZ.length == nz)
    assert(perZ.forall { case (z, lo, hi) => lo == z % 251 && hi == z % 251 },
      "slice content must land at its dense numeric rank")
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

  /** Hand-built minimal BigTIFF (header, one IFD, strip data): the same
    * build-the-container-by-hand discipline as the classic-TIFF cases
    * above, but with the 0x2B header, 20-byte IFD entries and 64-bit
    * offsets. Multiple strips exercise the external offset-array path
    * (a LONG8 array of count > 1 can't live inline in the value field).
    */
  private def bigTiffGray(
      w: Int, h: Int, px: Array[Int], bits: Int,
      rowsPerStrip: Int, le: Boolean = true): Array[Byte] = {
    import java.nio.{ByteBuffer, ByteOrder}
    require(px.length == w * h)
    val bps = bits / 8
    val strips = (h + rowsPerStrip - 1) / rowsPerStrip
    val nTags = 9
    val ifdOff = 16L
    var dataOff = ifdOff + 8 + nTags * 20 + 8
    val extOffs = if (strips > 1) { val o = dataOff; dataOff += strips * 8; o } else 0L
    val extCnts = if (strips > 1) { val o = dataOff; dataOff += strips * 8; o } else 0L
    val rowBytes = w * bps
    val counts = (0 until strips)
      .map(s => (math.min(rowsPerStrip, h - s * rowsPerStrip) * rowBytes).toLong)
    val offs = counts.scanLeft(dataOff)(_ + _).init
    val buf = ByteBuffer.allocate((dataOff + counts.sum).toInt)
      .order(if (le) ByteOrder.LITTLE_ENDIAN else ByteOrder.BIG_ENDIAN)
    buf.put((if (le) "II" else "MM").getBytes)
    buf.putShort(43); buf.putShort(8); buf.putShort(0)
    buf.putLong(ifdOff)
    buf.putLong(nTags)
    // inline values are left-justified in the 8-byte field, written at
    // the field's own type width (an inline SHORT is 2 bytes + 6 pad)
    def entry(tag: Int, typ: Int, count: Long, value: Long): Unit = {
      buf.putShort(tag.toShort); buf.putShort(typ.toShort); buf.putLong(count)
      typ match {
        case 3 => buf.putShort(value.toShort); buf.put(new Array[Byte](6))
        case 16 => buf.putLong(value)
      }
    }
    entry(256, 3, 1, w) // ImageWidth
    entry(257, 3, 1, h) // ImageLength
    entry(258, 3, 1, bits) // BitsPerSample
    entry(259, 3, 1, 1) // Compression: none
    entry(262, 3, 1, 1) // Photometric: BlackIsZero
    if (strips > 1) entry(273, 16, strips, extOffs)
    else entry(273, 16, 1, offs.head) // StripOffsets
    entry(277, 3, 1, 1) // SamplesPerPixel
    entry(278, 3, 1, rowsPerStrip) // RowsPerStrip
    if (strips > 1) entry(279, 16, strips, extCnts)
    else entry(279, 16, 1, counts.head) // StripByteCounts
    buf.putLong(0) // no next IFD
    if (strips > 1) { offs.foreach(buf.putLong); counts.foreach(buf.putLong) }
    px.foreach(v => if (bps == 1) buf.put(v.toByte) else buf.putShort(v.toShort))
    buf.array()
  }

  test("a multi-strip little-endian BigTIFF decodes like classic TIFF") {
    val w = 20; val h = 11
    val px = Array.tabulate(w * h)(i => i % 251)
    val s = TiffIO.decode(bigTiffGray(w, h, px, bits = 8, rowsPerStrip = 4))
    assert((s.width, s.height, s.bits) == (w, h, 8))
    assert(s.pixels.toSeq == px.toSeq, "BigTIFF decode diverges from source pixels")
  }

  test("a 16-bit big-endian BigTIFF keeps its depth and byte order") {
    val px = Array.tabulate(12)(i => i * 5000 % 65536)
    val bands = TiffIO.decodeBands(
      bigTiffGray(4, 3, px, bits = 16, rowsPerStrip = 3, le = false))
    assert(bands.size == 1 && bands.head.bits == 16)
    assert(bands.head.pixels.toSeq == px.toSeq)
  }

  test("a BigTIFF slice series ingests into an N5 volume end-to-end") {
    val (w, h, nz) = (16, 9, 3)
    val dir = Files.createTempDirectory("bigtif")
    for (z <- 0 until nz)
      Files.write(dir.resolve(f"slice_$z%05d.tif"),
        bigTiffGray(w, h,
          Array.tabulate(w * h)(i => (i + 7 * z) % 256), bits = 8,
          rowsPerStrip = 4))
    val root = Files.createTempDirectory("bigtifn5").toString + "/v.n5"
    val attrs = TiffVolume.ingestSlices(
      spark, dir.toString, root, "vol/s0", Array(8, 8, 2))
    assert(attrs.dimensions.toSeq == Seq(w.toLong, h.toLong, nz.toLong))
    val bad = N5.elements(N5.read(spark, root, "vol/s0"))
      .select(col("x"), col("y"), col("z"), col("v"))
      .collect().count { r =>
        val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
        ((x + y * w) + 7 * z) % 256 != r.getAs[Number](3).longValue()
      }
    assert(bad == 0, s"$bad mismatched voxels after BigTIFF ingest")
  }

  test("a truncated BigTIFF fails loudly with a BigTIFF-specific message") {
    // a bare header whose first IFD points past EOF — the old hard
    // rejection is gone; the failure is now a parse diagnostic
    val bytes = Array[Byte]('I', 'I', 43, 0, 8, 0, 0, 0,
      16, 0, 0, 0, 0, 0, 0, 0)
    val ex = intercept[IllegalArgumentException] { TiffIO.decode(bytes) }
    assert(ex.getMessage.contains("truncated BigTIFF"))
    // unsupported features are named, not mis-decoded: LZW compression
    val lzw = bigTiffGray(4, 3, Array.fill(12)(1), bits = 8, rowsPerStrip = 3)
    // tag 259 (Compression) is the 4th entry: header 16 + count 8 +
    // 3 * 20 + tag/type/count prefix 12 = value field at offset 96
    lzw(96) = 5
    val ex2 = intercept[IllegalArgumentException] { TiffIO.decode(lzw) }
    assert(ex2.getMessage.contains("compression"))
  }

  test("16-bit grayscale via the band decoder keeps its depth") {
    val px = Array.tabulate(12)(i => i * 5000 % 65536)
    val enc = TiffIO.encode(4, 3, px, 16)
    val bands = TiffIO.decodeBands(enc)
    assert(bands.size == 1)
    assert(bands.head.bits == 16)
    assert(bands.head.pixels.toSeq == px.toSeq)
  }

  test("native BigTIFF gray encoder round-trips through the native " +
      "reader and matches the ImageIO classic path pixel-for-pixel (r16)") {
    for ((w, h) <- Seq((1, 1), (4, 3), (16, 16), (23, 7))) {
      val px = Array.tabulate(w * h)(i => (i * 37 + 11) % 256)
      val big = TiffIO.encodeBigTiffGray(w, h, px)
      assert(BigTiff.isBigTiff(big), "encoder must emit the 0x2B magic")
      val s = TiffIO.decode(big) // routes to the native BigTiff reader
      assert(s.width == w && s.height == h && s.bits == 8)
      assert(s.pixels.toSeq == px.toSeq, s"${w}x$h BigTIFF diverged")
      // same pixels as the ImageIO classic container — the two TIFF
      // flavors are interchangeable sources for the hash queries
      val classic = TiffIO.decode(TiffIO.encode(w, h, px, 8))
      assert(classic.pixels.toSeq == s.pixels.toSeq)
    }
    // geometry guards stay loud
    assert(intercept[IllegalArgumentException](
      TiffIO.encodeBigTiffGray(2, 2, Array(1, 2, 3)))
      .getMessage.contains("geometry"))
  }
}
