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
  }

  test("unsupported blosc compression fails with a clear message") {
    val ex = intercept[IllegalArgumentException] {
      graft.n5.Compression("blosc")
    }
    assert(ex.getMessage.contains("blosc"))
  }
}
