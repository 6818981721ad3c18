package graft.sources

import java.io.{File, FileOutputStream}
import java.nio.file.Files
import javax.imageio.{IIOImage, ImageIO}
import javax.imageio.stream.FileImageOutputStream

import graft.SparkSpec
import graft.n5.{N5, N5Meta}
import graft.sources.tiff.{OmeTiffVolume, TiffIO}
import org.apache.spark.sql.functions._

/** Multi-channel OME-style ingest tests: synthesize a deterministic
  * multi-page TIFF (2 channels x 5 z of 16x12), ingest under both page
  * orders and with a crop box, verify per-voxel against the generator
  * formula v = (c*100 + z*10 + (x+y)) % 256.
  */
class OmeTiffSpec extends SparkSpec {

  private val (nc, nz, w, h) = (2, 5, 16, 12)
  private def voxel(c: Int, z: Int, y: Int, x: Int): Int =
    (c * 100 + z * 10 + x + y) % 256

  /** Write a multi-page TIFF with the given (c,z)->page ordering. */
  private def makeTiff(order: String): String = {
    val f = File.createTempFile(s"ome_$order", ".tif")
    val writer = ImageIO.getImageWritersByFormatName("tiff").next()
    val out = new FileImageOutputStream(f)
    writer.setOutput(out)
    writer.prepareWriteSequence(null)
    val pages = (0 until nc * nz).map { p =>
      // invert pageIndex: find (c,z) whose index is p
      val (c, z) = (for {
        c <- 0 until nc; z <- 0 until nz
        if OmeTiffVolume.pageIndex(order, c, z, nc, nz) == p
      } yield (c, z)).head
      val px = Array.tabulate(w * h)(i => voxel(c, z, i / w, i % w))
      val bytes = TiffIO.encode(w, h, px, 8)
      ImageIO.read(new java.io.ByteArrayInputStream(bytes))
    }
    pages.foreach(img => writer.writeToSequence(new IIOImage(img, null, null), null))
    writer.endWriteSequence()
    out.close()
    f.getAbsolutePath
  }

  test("pageIndex maps czyx and zcyx orders correctly (R11)") {
    assert(OmeTiffVolume.pageIndex("cz", 1, 3, 2, 5) == 8)
    assert(OmeTiffVolume.pageIndex("zc", 1, 3, 2, 5) == 7)
  }

  test("multi-channel ingest splits channels into c{c}/s0 datasets") {
    for (order <- Seq("cz", "zc")) {
      val tiff = makeTiff(order)
      val (np, ww, hh) = OmeTiffVolume.pageGeometry(
        Files.readAllBytes(new File(tiff).toPath))
      assert(np == nc * nz && ww == w && hh == h)
      val root = Files.createTempDirectory(s"ome5_$order").toString
      val attrs = OmeTiffVolume.ingest(spark, tiff, root, "s0", nc, order,
        blockSize = Array(8, 8, 4),
        pixelResolution = Some((Array(0.5, 0.5, 1.0), "um")))
      assert(attrs.length == nc)
      assert(attrs.head.dimensions.toSeq == Seq(16L, 12L, 5L))
      // root pixelResolution attr present (R12)
      val rootAttrs = N5Meta.readJson(
        new org.apache.hadoop.fs.Path(root, "attributes.json"))
      assert(rootAttrs.get("pixelResolution").get("unit").asText() == "um")
      for (c <- 0 until nc) {
        val e = N5.elements(N5.read(spark, root, s"c$c/s0")).collect()
        assert(e.length == w * h * nz, s"order=$order c=$c")
        e.foreach { r =>
          val (x, y, z) = (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2).toInt)
          assert(r.getAs[Number](3).intValue() == voxel(c, z, y, x),
            s"order=$order c=$c voxel($x,$y,$z)")
        }
      }
    }
  }

  test("crop box prunes pages and shifts the origin (ometif_to_n5 crop)") {
    val tiff = makeTiff("cz")
    val root = Files.createTempDirectory("omecrop").toString
    val crop = OmeTiffVolume.CropBox(
      cStart = 1, cSize = 1, zStart = 1, zSize = 3,
      yStart = 2, ySize = 6, xStart = 4, xSize = 8)
    OmeTiffVolume.ingest(spark, tiff, root, "s0", nc, "cz",
      crop = Some(crop), blockSize = Array(8, 8, 4))
    val e = N5.elements(N5.read(spark, root, "c1/s0")).collect()
    assert(e.length == 8 * 6 * 3)
    e.foreach { r =>
      val (x, y, z) = (r.getLong(0).toInt, r.getLong(1).toInt, r.getLong(2).toInt)
      assert(r.getAs[Number](3).intValue() ==
        voxel(1, z + 1, y + 2, x + 4), s"cropped voxel ($x,$y,$z)")
    }
  }
}
