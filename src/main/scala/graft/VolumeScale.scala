package graft

import org.apache.spark.sql.{Row, SparkSession}
import org.apache.spark.sql.functions._
import org.apache.spark.sql.types._

/** Volume-family scale probe (r14, VERDICT r13 next-round #6): the
  * q190/q193 fixture is 4 blocks / 1.1 MB, so the face-only-exchange
  * claim of `operators/VolumeCC` had zero at-scale measurements. This
  * main GENERATES a deterministic synthetic N5 volume of the requested
  * cube dimension (uint8, gzip, 128³ blocks — the reference's own block
  * geometry) and measures the full family:
  *
  *   - components(): wall seconds + component count. The pattern is a
  *     sphere lattice (radius 6 around every multiple-of-32 lattice
  *     point), so the EXPECTED component count is closed-form
  *     ((dim/32)+1)³ — a correctness check at scale, not just a timing —
  *     and every sphere crosses a 32-aligned boundary, so block
  *     stitching is exercised everywhere, not on a lucky subset.
  *   - stitch exchange: the faces pass emits one row per foreground
  *     block-face voxel; its row count × ~56 B (6 ints + 2 longs) is the
  *     bytes the stitch actually shuffles, to compare against raw volume
  *     bytes (the ≪ claim).
  *   - labelVolume + uint32 write-back + re-read (the q193 path).
  *
  * Usage: graft.VolumeScale <workDir> <dim> [blockSize] — dim 1024 ⇒
  * 1.07 GB raw; blockSize defaults to 128 and is the documented 100 TB
  * lever (r15, VERDICT r14 #8): the stitch exchange is face area, so
  * doubling the block edge halves the face share — measure 256³ blocks
  * against the frozen 128³ curve.
  * Prints ONE JSON line; BASELINE.md records the curve across dims.
  */
object VolumeScale {
  def main(args: Array[String]): Unit = {
    val Array(workDir, dimS) = args.take(2)
    val dim = dimS.toInt
    val bsArg = args.lift(2).map(_.toInt).getOrElse(128)
    require(dim % 128 == 0, s"dim must be a multiple of 128, got $dim")
    require(bsArg > 0 && dim % bsArg == 0,
      s"blockSize $bsArg must divide dim $dim")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.n5.{Compression, DatasetAttributes, Dtype, N5}

    val bs = bsArg
    val g = dim / bs
    val attrs = DatasetAttributes(
      Array(dim.toLong, dim.toLong, dim.toLong), Array(bs, bs, bs),
      Dtype.UInt8, Compression("gzip", 1))

    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime(); val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }

    // ---- generate: one task per block, voxels from the lattice formula
    val grids = for (gz <- 0 until g; gy <- 0 until g; gx <- 0 until g)
      yield (gx, gy, gz)
    val schema = StructType(Seq(
      StructField("gx", IntegerType), StructField("gy", IntegerType),
      StructField("gz", IntegerType),
      StructField("x0", LongType), StructField("y0", LongType),
      StructField("z0", LongType),
      StructField("shape", ArrayType(IntegerType)),
      StructField("data", ArrayType(ShortType))))
    val blocks = spark.createDataFrame(
      spark.sparkContext.parallelize(grids, math.min(grids.size, cpus.toInt * 4))
        .map { case (gx, gy, gz) =>
          val data = new Array[Short](bs * bs * bs)
          var i = 0
          while (i < data.length) {
            val x = gx * bs + i % bs
            val y = gy * bs + (i / bs) % bs
            val z = gz * bs + i / (bs * bs)
            def d(c: Int) = { val m = (c + 16) % 32 - 16; m * m }
            data(i) = if (d(x) + d(y) + d(z) <= 36) 200 else 10
            i += 1
          }
          Row(gx, gy, gz, gx.toLong * bs, gy.toLong * bs, gz.toLong * bs,
            Seq(bs, bs, bs), data.toSeq)
        }, schema)
    val root = s"$workDir/vol_${dim}_b$bs.n5"
    val hp = new org.apache.hadoop.fs.Path(root)
    val fs = hp.getFileSystem(spark.sparkContext.hadoopConfiguration)
    if (fs.exists(hp)) fs.delete(hp, true)
    val (_, tGen) = timed(N5.write(blocks, root, "raw", attrs))

    // ---- components ------------------------------------------------
    val scan = N5.read(spark, root, "raw")
    val ((nComp, nFg), tCc) = timed {
      val c = graft.operators.VolumeCC.components(scan, dim, dim, 128)
        .agg(count(lit(1)), sum(col("n_voxels"))).head()
      (c.getLong(0), c.getLong(1))
    }
    val expComp = { val c = dim / 32 + 1; c.toLong * c * c }

    // ---- stitch exchange: foreground block-face voxels --------------
    val (faceRows, tFace) = timed {
      N5.elementsScan(spark, root, "raw")
        .filter(col("v") >= 128 &&
          (col("x") % bs === 0 || col("x") % bs === bs - 1 ||
            col("y") % bs === 0 || col("y") % bs === bs - 1 ||
            col("z") % bs === 0 || col("z") % bs === bs - 1))
        .count()
    }

    // ---- label write-back (q193 path) -------------------------------
    val (_, tLabel) = timed {
      val labels = graft.operators.VolumeCC.labelVolume(scan, dim, dim, 128)
      val outAttrs = DatasetAttributes(attrs.dimensions, attrs.blockSize,
        Dtype.UInt32, Compression("gzip", 1))
      N5.write(
        N5.blocksFromElements(labels, outAttrs,
          org.apache.spark.sql.types.LongType),
        root, "labels", outAttrs)
    }

    val volBytes = dim.toLong * dim * dim
    val stitchBytes = faceRows * 56L
    def f2(v: Double) = f"$v%.2f"
    println(
      s"""{"metric":"volume_scale","dim":$dim,"block":$bs,"vol_bytes":$volBytes,""" +
        s""""gen_sec":${f2(tGen)},"cc_sec":${f2(tCc)},""" +
        s""""components":$nComp,"expected":$expComp,"fg":$nFg,""" +
        s""""face_rows":$faceRows,"stitch_bytes":$stitchBytes,""" +
        s""""stitch_frac":${f2(stitchBytes.toDouble / volBytes)},""" +
        s""""face_scan_sec":${f2(tFace)},"label_write_sec":${f2(tLabel)}}""")
    spark.stop()
  }
}
