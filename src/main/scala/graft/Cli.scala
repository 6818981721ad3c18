package graft

import graft.n5.{Compression, Dtype, Multiscale, N5}
import graft.sources.tiff.TiffVolume
import org.apache.spark.sql.SparkSession

/** CLI dispatch over the engine's volume operations — the Spark analogue of
  * the reference's five argparse mains (R15; `tif_to_n5.py:63-107`,
  * `n5_to_tif.py:54-86`, `n5_multiscale.py:139-211`, `create_n5.py:40-59`).
  * `--master` replaces `--dask-scheduler`; Spark conf replaces the dask
  * YAML config flattening.
  *
  * Usage:
  *   graft.Cli tif2n5 <inDir> <outRoot> <dataset> [blockSize x,y,z] [codec] [dtype]
  *   graft.Cli rgb2n5 <inDir> <outRoot> <dataset> [blockSize x,y,z] [codec] [dtype]
  *   graft.Cli n52tif <root> <dataset> <outDir> [prefix]
  *   graft.Cli n52tif-box <root> <dataset> <out.tif> <x0,y0,z0> <x1,y1,z1> [bits]
  *   graft.Cli ometif2n5 <in.tif> <outRoot> <dataset> <nChannels> [pageOrder] [blockSize] [codec]
  *   graft.Cli rechunk <srcRoot> <srcDs> <dstRoot> <dstDs> <bx,by,bz>
  *   graft.Cli multiscale <root> <group> [fx,fy,fz] [maxLevels] [mean|mode|min|max] [fillValue — mean only]
  *   graft.Cli create <templateRoot> <templateDs> <outRoot> <outDs> [codec] [dtype]
  */
object Cli {
  def main(args: Array[String]): Unit = {
    val builder = SparkSession.builder()
      .appName("graft-cli")
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.extensions", "graft.GraftExtensions")
    // spark-submit injects spark.master; default to local[*] elsewhere
    if (!sys.props.contains("spark.master") && !sys.env.contains("MASTER"))
      builder.master(s"local[${sys.env.getOrElse("SPARK_GRAFT_CPUS", "*")}]")
    val spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val rc =
      try { run(spark, args.toList); 0 }
      catch {
        case e: UsageException => System.err.println(e.getMessage); 2
      } finally spark.stop()
    if (rc != 0) sys.exit(rc)
  }

  /** Unknown/malformed command line. run() throws this instead of killing
    * the JVM — sys.exit from library code would terminate an embedding
    * process (or test runner) and skip main's `finally spark.stop()`.
    */
  final class UsageException(msg: String) extends IllegalArgumentException(msg)

  private def ints(s: String): Array[Int] = s.split(",").map(_.trim.toInt)

  def run(spark: SparkSession, args: List[String]): Unit = args match {
    case "tif2n5" :: in :: root :: ds :: rest =>
      val bs = rest.headOption.map(ints).getOrElse(Array(512, 512, 512))
      val codec = Compression(rest.drop(1).headOption.getOrElse("gzip"))
      // dtype arg (reference --dtype, tif_to_n5.py): 16-bit series need it
      val dt = rest.drop(2).headOption.map(Dtype.fromName).getOrElse(Dtype.UInt8)
      val a = TiffVolume.ingestSlices(spark, in, root, ds, bs,
        dtype = dt, compression = codec)
      println(s"ingested ${a.dimensions.mkString("x")} as $root/$ds")
    // RGB / multi-band slice series → one volume per channel at c{b}/<ds>
    case "rgb2n5" :: in :: root :: ds :: rest =>
      val bs = rest.headOption.map(ints).getOrElse(Array(512, 512, 512))
      val codec = Compression(rest.drop(1).headOption.getOrElse("gzip"))
      val dt = rest.drop(2).headOption.map(Dtype.fromName).getOrElse(Dtype.UInt8)
      val (nc, a) = TiffVolume.ingestSlicesPerChannel(spark, in, root, ds, bs,
        dtype = dt, compression = codec)
      println(s"ingested $nc channels (${a.dimensions.mkString("x")}) " +
        s"under $root/c*/$ds")
    case "n52tif" :: root :: ds :: out :: rest =>
      val n = TiffVolume.exportSlices(spark, root, ds, out,
        rest.headOption.getOrElse("slice_"))
      println(s"exported $n slices to $out")
    case "rechunk" :: sr :: sd :: dr :: dd :: bs :: Nil =>
      val a = N5.rechunk(spark, sr, sd, dr, dd, ints(bs))
      println(s"rechunked to ${a.blockSize.mkString("x")} at $dr/$dd")
    case "multiscale" :: root :: group :: rest =>
      val f = rest.headOption.map(ints).getOrElse(Array(2, 2, 2))
      val n = rest.drop(1).headOption.map(_.toInt).getOrElse(8)
      // "mode" for label volumes (most-frequent id; mean invents labels);
      // fillValue switches to zarr fill semantics over sparse volumes
      val method = rest.drop(2).headOption.getOrElse("mean")
      val fill = rest.drop(3).headOption.map(_.toDouble)
      if (fill.isDefined && method != "mean")
        throw new UsageException(
          s"fillValue is implemented for the mean reducer only, got '$method'")
      val levels = Multiscale.buildPyramid(spark, root, group, f, n,
        method = method, fill = fill)
      println(s"built ${levels.length} levels under $root/$group ($method)")
    // single-box export (reference n5_to_tif block dispatch,
    // `n5_to_tif.py:81-86`): start/end are x,y,z CSV, end exclusive
    case "n52tif-box" :: root :: ds :: out :: st :: en :: rest =>
      val bits = rest.headOption.map(_.toInt).getOrElse(0)
      TiffVolume.exportBox(spark, root, ds, out,
        st.split(",").map(_.trim.toLong), en.split(",").map(_.trim.toLong), bits)
      println(s"exported box [$st,$en) to $out")
    // OME-style multi-channel ingest (reference ometif_to_n5 CLI,
    // `ometif_to_n5.py:209-293`): one dataset per channel at c{c}/<ds>
    case "ometif2n5" :: in :: root :: ds :: nc :: rest =>
      require(nc.toInt > 0, s"nChannels must be positive, got $nc")
      val order = rest.headOption.getOrElse("cz")
      val bs = rest.drop(1).headOption.map(ints).getOrElse(Array(128, 128, 128))
      val codec = Compression(rest.drop(2).headOption.getOrElse("gzip"))
      val as = graft.sources.tiff.OmeTiffVolume.ingest(spark, in, root, ds,
        nc.toInt, order, blockSize = bs, compression = codec)
      println(s"ingested ${as.length} channels " +
        s"(${as.head.dimensions.mkString("x")}) under $root/c*/$ds")
    case "create" :: tr :: td :: or :: od :: rest =>
      val codec = rest.headOption.filter(_ != "same").map(Compression(_))
      val dt = rest.drop(1).headOption.filter(_ != "same").map(Dtype.fromName)
      val a = N5.createDatasetLike(tr, td, or, od, codec, dt)
      println(s"created $or/$od (${a.dataType.name}, " +
        s"${a.compression.codec}, ${a.dimensions.mkString("x")})")
    case other =>
      throw new UsageException(
        s"unknown command: ${other.mkString(" ")}\n" +
          "commands: tif2n5 rgb2n5 n52tif n52tif-box ometif2n5 rechunk multiscale create")
  }
}
