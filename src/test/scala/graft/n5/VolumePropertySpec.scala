package graft.n5

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._
/** Property-based volume laws (SURVEY §5.4) over seeded random cases:
  * read(write(v)) == v, box reads commute with rechunk, and the windowed
  * mean of a constant volume is constant.
  */
class VolumePropertySpec extends SparkSpec {

  /** 5 deterministic random (dims, blockSize, seed) cases. */
  private def cases: Seq[(Array[Long], Array[Int], Long)] = {
    val rng = new scala.util.Random(20260812L)
    def in(lo: Int, hi: Int) = lo + rng.nextInt(hi - lo + 1)
    Seq.fill(5)((
      Array(in(3, 20).toLong, in(3, 20).toLong, in(3, 12).toLong),
      Array(in(2, 8), in(2, 8), in(2, 8)),
      rng.nextLong().abs % 1000000L))
  }

  private def forAllCases(f: (Array[Long], Array[Int], Long) => Unit): Unit =
    cases.foreach { case (d, b, s) => f(d, b, s) }

  /** Deterministic voxel value from coordinates. */
  private def voxel(seed: Long, x: Long, y: Long, z: Long): Long =
    math.abs(seed + x * 31 + y * 131 + z * 1031) % 256

  /** Materialize a synthetic volume as an N5 dataset; returns its root. */
  private def writeVolume(
      dims: Array[Long], bs: Array[Int], seed: Long): String = {
    val root = Files.createTempDirectory("prop").toString
    val attrs = DatasetAttributes(dims, bs, Dtype.UInt8, Compression("gzip"))
    val elems = spark.range(dims.product)
      .select(
        (col("id") % dims(0)).as("x"),
        ((col("id") / dims(0)) % dims(1)).cast("long").as("y"),
        (col("id") / (dims(0) * dims(1))).cast("long").as("z"))
      .select(col("x"), col("y"), col("z"),
        (abs(lit(seed) + col("x") * 31 + col("y") * 131 + col("z") * 1031) % 256)
          .as("v"))
    val blocks = N5.blocksFromElements(elems, attrs,
      org.apache.spark.sql.types.ShortType)
    N5.write(blocks, root, "vol/s0", attrs)
    root
  }

  test("read(write(v)) == v for random volumes and block sizes") {
    forAllCases { (dims, bs, seed) =>
      val root = writeVolume(dims, bs, seed)
      val back = N5.elements(N5.read(spark, root, "vol/s0")).collect()
      assert(back.length == dims.product)
      back.foreach { r =>
        val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
        assert(r.getAs[Number](3).longValue() == voxel(seed, x, y, z),
          s"voxel ($x,$y,$z) dims=${dims.mkString("x")} bs=${bs.mkString("x")}")
      }
    }
  }

  test("writeBox law: persisted overlay equals the in-memory overlay") {
    forAllCases { (dims, bs, seed) =>
      val root = writeVolume(dims, bs, seed)
      val rng = new scala.util.Random(seed)
      def pick(d: Long): (Long, Long) = {
        val a = rng.nextInt(d.toInt)
        (a.toLong, (a + 1 + rng.nextInt(d.toInt - a)).toLong)
      }
      val (x0, x1) = pick(dims(0))
      val (y0, y1) = pick(dims(1))
      val (z0, z1) = pick(dims(2))
      val start = Array(x0, y0, z0)
      val end = Array(x1, y1, z1)
      def patched(x: Long, y: Long, z: Long): Long =
        (x * 7 + y * 3 + z * 11 + seed) % 256
      val patch = N5.boxGrid(spark, start, end)
        .select(col("x"), col("y"), col("z"),
          ((col("x") * 7 + col("y") * 3 + col("z") * 11 + seed) % 256).as("v"))
      N5.writeBox(spark, root, "vol/s0", start, end, patch)
      val back = N5.elements(N5.read(spark, root, "vol/s0")).collect()
      assert(back.length == dims.product)
      back.foreach { r =>
        val (x, y, z) = (r.getLong(0), r.getLong(1), r.getLong(2))
        val inBox = x >= x0 && x < x1 && y >= y0 && y < y1 && z >= z0 && z < z1
        val expected = if (inBox) patched(x, y, z) else voxel(seed, x, y, z)
        assert(r.getAs[Number](3).longValue() == expected,
          s"voxel ($x,$y,$z) box=[${start.mkString(",")},${end.mkString(",")}) " +
            s"dims=${dims.mkString("x")} bs=${bs.mkString("x")}")
      }
    }
  }

  test("rechunk preserves voxels and box reads commute with rechunk") {
    forAllCases { (dims, bs, seed) =>
      val root = writeVolume(dims, bs, seed)
      val root2 = Files.createTempDirectory("prop2").toString
      N5.rechunk(spark, root, "vol/s0", root2, "vol/s0",
        Array(bs(0) + 1, math.max(2, bs(1) - 1), bs(2) + 2))
      val box = (Array(1L, 1L, 1L),
        Array(math.min(dims(0), 4L), math.min(dims(1), 5L), math.min(dims(2), 3L)))
      val a = N5.readBox(spark, root, "vol/s0", box._1, box._2)
        .orderBy("x", "y", "z").collect().toSeq
      val b = N5.readBox(spark, root2, "vol/s0", box._1, box._2)
        .orderBy("x", "y", "z").collect().toSeq
      assert(a == b, s"box read differs after rechunk dims=${dims.mkString("x")}")
    }
  }

  test("block-local coarsen equals element coarsen on random volumes") {
    forAllCases { (dims0, bs0, seed) =>
      // force factor-divisible block sizes (the block-local precondition)
      val bs = bs0.map(b => math.max(2, b / 2 * 2))
      val dims = dims0.map(d => math.max(4L, d))
      val r1 = writeVolume(dims, bs, seed)
      val r2 = writeVolume(dims, bs, seed)
      Multiscale.downsampleLevelBlockLocal(spark, r1, "vol", 1, Array(2, 2, 2))
      Multiscale.downsampleLevelElements(spark, r2, "vol", 1, Array(2, 2, 2))
      val a = N5.elements(N5.read(spark, r1, "vol/s1"))
      val b = N5.elements(N5.read(spark, r2, "vol/s1"))
        .withColumnRenamed("v", "v2")
      val j = a.join(b, Seq("x", "y", "z"))
      assert(a.count() == dims.zip(Seq(2, 2, 2)).map { case (d, f) => d / f }.product,
        s"dims=${dims.mkString("x")} bs=${bs.mkString("x")}")
      assert(j.count() == a.count())
      assert(j.filter(col("v") =!= col("v2")).count() == 0L,
        s"coarsen mismatch dims=${dims.mkString("x")} bs=${bs.mkString("x")}")
    }
  }

  test("windowed mean of a constant volume is that constant") {
    val dims = Array(8L, 8L, 4L)
    val root = Files.createTempDirectory("propc").toString
    val attrs = DatasetAttributes(dims, Array(4, 4, 2), Dtype.UInt8,
      Compression("gzip"))
    val elems = spark.range(dims.product)
      .select((col("id") % dims(0)).as("x"),
        ((col("id") / dims(0)) % dims(1)).cast("long").as("y"),
        (col("id") / (dims(0) * dims(1))).cast("long").as("z"),
        lit(7).as("v"))
    N5.write(N5.blocksFromElements(elems, attrs,
      org.apache.spark.sql.types.ShortType), root, "vol/s0", attrs)
    Multiscale.downsampleLevel(spark, root, "vol", 1, Array(2, 2, 2))
    val s1 = N5.elements(N5.read(spark, root, "vol/s1"))
    assert(s1.count() == 4L * 4 * 2)
    assert(s1.filter(col("v") =!= 7).count() == 0L)
  }
}
