package graft.n5

import java.nio.file.Files

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Sparse volumes: missing block files are legal (zarr/N5 fill-value
  * semantics). The block scan lists only stored blocks; readBox fills the
  * gaps with zeros so a box read is always dense, like
  * `da.from_zarr(...)[slices]` in the reference.
  */
class SparseVolumeSpec extends SparkSpec {

  /** 64x64x16 uint8 volume, 32^3 blocks (grid 2x2x1) — but only TWO of
    * the four blocks are written: (0,0,0) and (1,1,0).
    */
  private lazy val root: String = {
    val tmp = Files.createTempDirectory("sparse").toString
    val attrs = DatasetAttributes(Array(64L, 64L, 16L), Array(32, 32, 32),
      Dtype.UInt8, Compression("gzip"))
    val elems = N5.boxGrid(spark, Array(0L, 0L, 0L), Array(64L, 64L, 16L))
      .select(col("x"), col("y"), col("z"),
        ((col("x") + col("y") + col("z")) % 251 + 1).as("v")) // never 0
      .filter((col("x") < 32 && col("y") < 32)
        || (col("x") >= 32 && col("y") >= 32))
    N5.write(N5.blocksFromElements(elems, attrs,
      org.apache.spark.sql.types.ShortType), s"$tmp/s.n5", "vol/s0", attrs)
    s"$tmp/s.n5"
  }

  test("block scan lists only stored blocks") {
    val grids = N5.read(spark, root, "vol/s0")
      .select(col("gx"), col("gy"), col("gz")).collect()
      .map(r => (r.getInt(0), r.getInt(1), r.getInt(2))).toSet
    assert(grids == Set((0, 0, 0), (1, 1, 0)))
  }

  test("readBox fills missing blocks with zeros (dense, zarr semantics)") {
    val box = N5.readBox(spark, root, "vol/s0",
      Array(16L, 16L, 0L), Array(48L, 48L, 8L))
    val r = box.agg(count(lit(1)).as("n"),
      sum(when(col("v") === 0, 1L).otherwise(0L)).as("zeros")).collect()(0)
    assert(r.getLong(0) == 32L * 32 * 8, "box must be dense")
    // the box covers a quarter of each of the 4 grid positions; the two
    // missing ones contribute 16x16x8 zeros each
    assert(r.getLong(1) == 2L * 16 * 16 * 8, s"zero fill wrong: ${r.getLong(1)}")
  }

  test("readBox(fillMissing = false) returns only stored voxels") {
    val box = N5.readBox(spark, root, "vol/s0",
      Array(16L, 16L, 0L), Array(48L, 48L, 8L), fillMissing = false)
    assert(box.count() == 2L * 16 * 16 * 8)
    assert(box.filter(col("v") === 0).count() == 0)
  }

  test("a fully stored box has no synthesized rows") {
    val box = N5.readBox(spark, root, "vol/s0",
      Array(0L, 0L, 0L), Array(32L, 32L, 16L))
    assert(box.count() == 32L * 32 * 16)
    assert(box.filter(col("v") === 0).count() == 0)
  }
}
