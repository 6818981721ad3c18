package graft

import java.nio.file.Files
import graft.n5.{N5, N5Meta}
import org.apache.spark.sql.functions._

/** R15 CLI dispatch: drive every subcommand against temp dirs. */
class CliSpec extends SparkSpec {

  private val fixtureRoot = "/root/reference/data/test.n5"
  private val fixtureDs = "mri/c0/s0"

  test("n52tif -> tif2n5 -> rechunk -> multiscale -> create pipeline") {
    val tmp = Files.createTempDirectory("cli").toString
    Cli.run(spark, List("n52tif", fixtureRoot, fixtureDs, s"$tmp/tif"))
    assert(Files.list(java.nio.file.Paths.get(s"$tmp/tif"))
      .filter(_.toString.endsWith(".tif")).count() == 27)

    Cli.run(spark, List("tif2n5", s"$tmp/tif", s"$tmp/a.n5", "vol/s0",
      "96,96,16", "gzip"))
    val a = N5Meta.datasetAttributes(s"$tmp/a.n5", "vol/s0")
    assert(a.dimensions.toSeq == Seq(186L, 226L, 27L))
    assert(a.blockSize.toSeq == Seq(96, 96, 16))

    Cli.run(spark, List("rechunk", s"$tmp/a.n5", "vol/s0",
      s"$tmp/b.n5", "vol/s0", "64,64,64"))
    val e = N5.elements(N5.read(spark, s"$tmp/b.n5", "vol/s0"))
      .agg(count(lit(1)), sum(col("v"))).collect()(0)
    assert(e.getLong(0) == 1134972L && e.getLong(1) == 40784917L)

    Cli.run(spark, List("multiscale", s"$tmp/b.n5", "vol", "2,2,2", "1"))
    assert(N5Meta.datasetAttributes(s"$tmp/b.n5", "vol/s1")
      .dimensions.toSeq == Seq(93L, 113L, 13L))

    Cli.run(spark, List("create", s"$tmp/b.n5", "vol/s0",
      s"$tmp/c.n5", "empty/s0", "raw", "uint16"))
    val c = N5Meta.datasetAttributes(s"$tmp/c.n5", "empty/s0")
    assert(c.compression.codec == "raw" && c.dataType.name == "uint16")

    Cli.run(spark, List("n52tif-box", s"$tmp/b.n5", "vol/s0",
      s"$tmp/box.tif", "100,100,0", "150,180,16"))
    val (pages, w, h) = graft.sources.tiff.OmeTiffVolume.pageGeometry(
      Files.readAllBytes(java.nio.file.Paths.get(s"$tmp/box.tif")))
    assert(pages == 16 && w == 50 && h == 80)

    // LAST (destructive): create over an existing dataset clears its
    // stale blocks (reference overwrite=True semantics) — the new empty
    // dataset must scan as empty
    Cli.run(spark, List("create", s"$tmp/b.n5", "vol/s0",
      s"$tmp/b.n5", "vol/s0"))
    assert(N5.read(spark, s"$tmp/b.n5", "vol/s0").count() == 0,
      "stale blocks survived create(overwrite)")
  }

  test("rgb2n5 dispatch splits an RGB series into per-channel volumes") {
    val tmp = Files.createTempDirectory("clirgb").toString
    val im = new java.awt.image.BufferedImage(
      8, 6, java.awt.image.BufferedImage.TYPE_INT_RGB)
    for (y <- 0 until 6; x <- 0 until 8)
      im.setRGB(x, y, ((x * 3) << 16) | ((y * 5) << 8) | (x + y))
    val bos = new java.io.ByteArrayOutputStream()
    javax.imageio.ImageIO.write(im, "tiff", bos)
    Files.createDirectories(java.nio.file.Paths.get(s"$tmp/in"))
    Files.write(java.nio.file.Paths.get(s"$tmp/in/slice_00000.tif"),
      bos.toByteArray)
    Cli.run(spark, List("rgb2n5", s"$tmp/in", s"$tmp/rgb.n5", "vol/s0",
      "4,4,1"))
    for (b <- 0 until 3) {
      val a = N5Meta.datasetAttributes(s"$tmp/rgb.n5", s"c$b/vol/s0")
      assert(a.dimensions.toSeq == Seq(8L, 6L, 1L), s"channel $b dims")
    }
    // green channel value at (2,3) is y*5 = 15
    val g = N5.elements(N5.read(spark, s"$tmp/rgb.n5", "c1/vol/s0"))
      .filter(col("x") === 2 && col("y") === 3)
      .collect()(0).getAs[Number]("v").longValue()
    assert(g == 15L)
  }

  test("multiscale dispatch accepts the min reducer") {
    val tmp = Files.createTempDirectory("climin").toString
    Cli.run(spark, List("n52tif", fixtureRoot, fixtureDs, s"$tmp/tif"))
    Cli.run(spark, List("tif2n5", s"$tmp/tif", s"$tmp/m.n5", "vol/s0",
      "64,64,64", "gzip"))
    Cli.run(spark, List("multiscale", s"$tmp/m.n5", "vol", "2,2,2", "1", "min"))
    val s1 = N5.elements(N5.read(spark, s"$tmp/m.n5", "vol/s1"))
      .agg(count(lit(1))).collect()(0).getLong(0)
    assert(s1 == 93L * 113 * 13)
  }

  test("ometif2n5 dispatch ingests a 2-channel multi-page tiff") {
    import javax.imageio.ImageIO
    import javax.imageio.stream.FileImageOutputStream
    val tmp = Files.createTempDirectory("cliome").toString
    val f = new java.io.File(s"$tmp/in.tif")
    val writer = ImageIO.getImageWritersByFormatName("tiff").next()
    val out = new FileImageOutputStream(f)
    writer.setOutput(out)
    writer.prepareWriteSequence(null)
    // page order cz: pages (c0,z0),(c0,z1),(c1,z0),(c1,z1), 8x6 gradient
    for (c <- 0 until 2; z <- 0 until 2) {
      val px = Array.tabulate(8 * 6)(i => (c * 50 + z * 10 + i) % 256)
      val img = ImageIO.read(new java.io.ByteArrayInputStream(
        graft.sources.tiff.TiffIO.encode(8, 6, px, 8)))
      writer.writeToSequence(new javax.imageio.IIOImage(img, null, null), null)
    }
    writer.endWriteSequence(); out.close()
    Cli.run(spark, List("ometif2n5", f.getAbsolutePath, s"$tmp/o.n5", "s0",
      "2", "cz", "8,8,8"))
    for (c <- 0 until 2) {
      val a = N5Meta.datasetAttributes(s"$tmp/o.n5", s"c$c/s0")
      assert(a.dimensions.toSeq == Seq(8L, 6L, 2L))
      val s = N5.elements(N5.read(spark, s"$tmp/o.n5", s"c$c/s0"))
        .agg(sum(col("v"))).collect()(0).getLong(0)
      val expected = (for (z <- 0 until 2; i <- 0 until 48)
        yield (c * 50 + z * 10 + i) % 256).sum.toLong
      assert(s == expected, s"channel $c voxel sum")
    }
  }

  test("blosc DDL writes n5-blosc-shaped attributes and round-trips") {
    // r12 late: blosc WRITE landed (BloscCodec.encode — the heuristic-
    // free lz4 profile), so DDL must emit the n5-blosc attribute shape
    // and read back as the blosc codec with its clevel
    val c = graft.n5.Compression("blosc", 7)
    val tmp = java.nio.file.Files.createTempDirectory("bloscddl")
    graft.n5.N5Meta.writeDatasetAttributes(tmp.toString, "d",
      graft.n5.DatasetAttributes(Array(4L, 4L, 1L), Array(4, 4, 1),
        graft.n5.Dtype.UInt8, c))
    val back = graft.n5.N5Meta.datasetAttributes(tmp.toString, "d")
    assert(back.compression.codec == "blosc" && back.compression.level == 7)
    val json = java.nio.file.Files.readString(
      tmp.resolve("d/attributes.json")).replaceAll("\\s", "")
    assert(json.contains("\"cname\"") && json.contains("\"clevel\":7") &&
      json.contains("\"shuffle\":0"))
  }
}
