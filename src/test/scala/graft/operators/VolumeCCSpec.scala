package graft.operators

import graft.SparkSpec
import graft.n5.N5
import org.apache.spark.sql.functions._

/** VolumeCC must equal a naive whole-volume BFS labeling — including
  * components spanning block boundaries — and its ids must be the
  * deterministic min-voxel-index of each cluster.
  */
class VolumeCCSpec extends SparkSpec {

  private val root = "/root/reference/data/test.n5"
  private val ds = "mri/c0/s0"
  private val (dimX, dimY, dimZ) = (186L, 226L, 27L)

  private def naive(threshold: Long): Map[Long, Long] = {
    // materialize the dense volume via the element view
    val vox = N5.elements(N5.read(spark, root, ds))
      .select(col("x"), col("y"), col("z"), col("v"))
      .collect()
    val nx = dimX.toInt; val ny = dimY.toInt; val nz = dimZ.toInt
    val v = new Array[Long](nx * ny * nz)
    vox.foreach { r =>
      v((r.getLong(0) + dimX * (r.getLong(1) + dimY * r.getLong(2))).toInt) =
        r.getAs[Number](3).longValue
    }
    val comp = new Array[Long](nx * ny * nz)
    java.util.Arrays.fill(comp, -1L)
    val sizes = scala.collection.mutable.HashMap.empty[Long, Long]
    var i = 0
    while (i < v.length) {
      if (v(i) >= threshold && comp(i) == -1L) {
        // BFS from i; label = min index reached = i (scan order)
        var size = 0L
        val q = scala.collection.mutable.Queue(i)
        comp(i) = i.toLong
        while (q.nonEmpty) {
          val c = q.dequeue(); size += 1
          val x = c % nx; val y = (c / nx) % ny; val z = c / (nx * ny)
          Seq((x - 1, y, z), (x + 1, y, z), (x, y - 1, z),
            (x, y + 1, z), (x, y, z - 1), (x, y, z + 1)).foreach {
            case (xx, yy, zz) =>
              if (xx >= 0 && xx < nx && yy >= 0 && yy < ny &&
                  zz >= 0 && zz < nz) {
                val j = xx + nx * (yy + ny * zz)
                if (v(j) >= threshold && comp(j) == -1L) {
                  comp(j) = i.toLong; q.enqueue(j)
                }
              }
          }
        }
        sizes.update(i.toLong, size)
      }
      i += 1
    }
    sizes.toMap
  }

  test("block-stitched components equal the naive whole-volume BFS") {
    val threshold = 128L
    val got = VolumeCC
      .components(N5.read(spark, root, ds), dimX, dimY, threshold)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expected = naive(threshold)
    assert(got.size == expected.size,
      s"component count ${got.size} vs naive ${expected.size}")
    val bad = expected.filter { case (k, n) => got.get(k) != Some(n) }
    assert(bad.isEmpty,
      s"${bad.size} components diverge, e.g. ${bad.take(3)}")
    // BFS label = min scan index = min global voxel id, so ids match 1:1
    info(s"components=${got.size}, foreground=${got.values.sum}, " +
      s"top=${got.toSeq.sortBy(p => (-p._2, p._1)).take(10)}")
    assert(got.values.sum == expected.values.sum)
  }

  test("components are chunking-invariant: 32-cube rechunk equals the " +
      "fixture chunking") {
    // rechunking multiplies the number of block boundaries ~4x per axis;
    // identical output proves the stitching join, not block-local luck
    val tmp = java.nio.file.Files.createTempDirectory("vcc").toString
    N5.rechunk(spark, root, ds, s"$tmp/r.n5", "vol/s0", Array(32, 32, 32))
    val a = VolumeCC.components(N5.read(spark, root, ds), dimX, dimY, 128L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val b = VolumeCC
      .components(N5.read(spark, s"$tmp/r.n5", "vol/s0"), dimX, dimY, 128L)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    assert(a == b, s"chunking changed the labeling: ${a.size} vs ${b.size}")
  }
}
