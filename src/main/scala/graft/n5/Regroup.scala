package graft.n5

import graft.sources.n5.N5Schema
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Block-fragment regroup: the scale-safe rechunk (SURVEY §7 "hard parts").
  *
  * The element-explode formulation shuffles one ROW PER VOXEL — O(10¹¹)
  * rows for a 100 TB volume, dominated by per-row shuffle/sort overhead.
  * This formulation slices each source block into the ≤8 (typically)
  * fragments that intersect output blocks and shuffles one row per
  * FRAGMENT: the same bytes move, but row count drops by ~blockSize³ and
  * assembly is primitive array pastes instead of a groupBy-sort over
  * voxels. Equivalence with the element path is property-tested.
  *
  * Float payloads travel as raw Double bits inside the Long array (exact),
  * so one typed pipeline serves every dtype.
  */
object Regroup {

  /** One source-block slice destined for output block (tgx,tgy,tgz):
    * placed at offset (ox,oy,oz) with shape (sx,sy,sz), x-fastest payload.
    */
  final case class Frag(
      tgx: Int, tgy: Int, tgz: Int,
      ox: Int, oy: Int, oz: Int,
      sx: Int, sy: Int, sz: Int,
      data: Array[Long])

  final case class OutBlock(
      gx: Int, gy: Int, gz: Int, shape: Array[Int], data: Array[Long])

  /** Block rows as a typed Dataset with the payload widened to Long,
    * keyed by the three `keys` columns cast to LONG. Integer dtypes go
    * through the NATIVE-typed encoder plus a primitive widening loop — a
    * `cast("array<bigint>")` would pay a per-element Catalyst cast and an
    * intermediate array per block (~30% slower block reads, measured on
    * the q85 volume). Float dtypes travel as raw Double bits (exact; the
    * convention of every typed pipeline here).
    */
  private[n5] def typedLongBlocks(
      blocks: DataFrame, dtype: Dtype, keys: Seq[String])
      : org.apache.spark.sql.Dataset[(Long, Long, Long, Array[Int], Array[Long])] = {
    import blocks.sparkSession.implicits._
    import org.apache.spark.sql.types._
    val base = blocks.select(
      col(keys(0)).cast("long"), col(keys(1)).cast("long"),
      col(keys(2)).cast("long"), col("shape"), col("data"))
    def widen[T](f: T => Long)(
        t: (Long, Long, Long, Array[Int], Array[T])): (Long, Long, Long, Array[Int], Array[Long]) = {
      val d = t._5
      val o = new Array[Long](d.length)
      var i = 0
      while (i < d.length) { o(i) = f(d(i)); i += 1 }
      (t._1, t._2, t._3, t._4, o)
    }
    N5Schema.elementType(dtype) match {
      case ShortType =>
        base.as[(Long, Long, Long, Array[Int], Array[Short])]
          .map(widen[Short](_.toLong))
      case ByteType =>
        base.as[(Long, Long, Long, Array[Int], Array[Byte])]
          .map(widen[Byte](_.toLong))
      case IntegerType =>
        base.as[(Long, Long, Long, Array[Int], Array[Int])]
          .map(widen[Int](_.toLong))
      case LongType =>
        base.as[(Long, Long, Long, Array[Int], Array[Long])]
      case FloatType =>
        base.as[(Long, Long, Long, Array[Int], Array[Float])]
          .map(widen[Float](f => java.lang.Double.doubleToRawLongBits(f.toDouble)))
      case DoubleType =>
        base.as[(Long, Long, Long, Array[Int], Array[Double])]
          .map(widen[Double](java.lang.Double.doubleToRawLongBits))
      case other =>
        throw new IllegalArgumentException(s"bad element type $other")
    }
  }

  /** Shuffle fragments to their output blocks and paste (shared by
    * rechunk and the slice-ingest path).
    */
  def assemble(
      frags: org.apache.spark.sql.Dataset[Frag],
      dst: DatasetAttributes): org.apache.spark.sql.Dataset[OutBlock] = {
    import frags.sparkSession.implicits._
    frags
      .groupByKey(f => (f.tgx, f.tgy, f.tgz))
      .mapGroups { (key: (Int, Int, Int), it: Iterator[Frag]) =>
        val (tgx, tgy, tgz) = key
        val tshape = dst.blockShape(Array(tgx, tgy, tgz))
        val Array(tsx, tsy, _) = tshape
        val out = new Array[Long](tshape.product)
        it.foreach { f =>
          var z = 0
          while (z < f.sz) {
            var y = 0
            while (y < f.sy) {
              val srcBase = (y + z * f.sy) * f.sx
              val dstBase = (f.ox +
                (f.oy + y) * tsx + (f.oz + z) * tsx.toLong * tsy).toInt
              System.arraycopy(f.data, srcBase, out, dstBase, f.sx)
              y += 1
            }
            z += 1
          }
        }
        OutBlock(tgx, tgy, tgz, tshape, out)
      }
  }

  /** Fragment full z-slices (z, x-fastest pixels of a w×h plane) into the
    * block-column rectangles they intersect — the scale path for slice
    * ingest: shuffle rows are fragments (blocks-per-slice), not pixels.
    * Slices may arrive offset in z (streaming slabs pass absolute z).
    */
  def slicesToBlocks(
      slices: org.apache.spark.sql.Dataset[(Long, Array[Long])],
      dst: DatasetAttributes): org.apache.spark.sql.Dataset[OutBlock] = {
    import slices.sparkSession.implicits._
    val Array(w, h, _) = dst.dimensions.map(_.toInt)
    val Array(nbx, nby, nbz) = dst.blockSize
    val frags = slices.flatMap { case (z, px) =>
      val gz = (z / nbz).toInt
      val oz = (z - gz.toLong * nbz).toInt
      val fr = Seq.newBuilder[Frag]
      var tgy = 0
      while (tgy.toLong * nby < h) {
        val y0 = tgy * nby
        val fy = math.min(nby, h - y0)
        var tgx = 0
        while (tgx.toLong * nbx < w) {
          val x0 = tgx * nbx
          val fx = math.min(nbx, w - x0)
          val buf = new Array[Long](fx * fy)
          var y = 0
          while (y < fy) {
            System.arraycopy(px, x0 + (y0 + y) * w, buf, y * fx, fx)
            y += 1
          }
          fr += Frag(tgx, tgy, gz, 0, 0, oz, fx, fy, 1, buf)
          tgx += 1
        }
        tgy += 1
      }
      fr.result()
    }
    assemble(frags, dst)
  }

  /** Assembled blocks as a writer-ready DataFrame: the ONE place the
    * typed pipeline's Long payloads become the dtype's Spark element type,
    * decoding float values from their raw Double bits. Every element/
    * fragment path (rechunk, multiscale, blocksFromElements, writeBox)
    * ends here, so the bits convention cannot drift between them.
    */
  def blocksDF(
      assembled: org.apache.spark.sql.Dataset[OutBlock],
      elemT: org.apache.spark.sql.types.DataType,
      isFloat: Boolean): DataFrame =
    if (isFloat) {
      import assembled.sparkSession.implicits._
      assembled
        .map(b => (b.gx, b.gy, b.gz, b.shape,
          b.data.map(java.lang.Double.longBitsToDouble)))
        .toDF("gx", "gy", "gz", "shape", "data")
        .withColumn("data", col("data").cast(s"array<${elemT.catalogString}>"))
    } else
      assembled.toDF()
        .select(col("gx"), col("gy"), col("gz"), col("shape"),
          col("data").cast(s"array<${elemT.catalogString}>").as("data"))

  /** Write assembled blocks with the dtype's Spark element type. */
  def writeAssembled(
      assembled: org.apache.spark.sql.Dataset[OutBlock],
      dstRoot: String, dstDataset: String, dst: DatasetAttributes): Unit =
    writeAssembledAs(assembled, dstRoot, dstDataset, dst, isFloat = false)

  /** Like writeAssembled, but decodes float payloads travelling as raw
    * Double bits in the Long array (the typed-pipeline convention).
    */
  def writeAssembledAs(
      assembled: org.apache.spark.sql.Dataset[OutBlock],
      dstRoot: String, dstDataset: String, dst: DatasetAttributes,
      isFloat: Boolean): Unit =
    N5.write(blocksDF(assembled, N5Schema.elementType(dst.dataType), isFloat),
      dstRoot, dstDataset, dst)

  /** Rechunk src dataset into dstRoot/dstDataset with a new block size.
    * One fragment shuffle; no element explosion.
    */
  def rechunkBlocks(
      spark: SparkSession, srcRoot: String, srcDataset: String,
      dstRoot: String, dstDataset: String, newBlockSize: Array[Int],
      compression: Compression = Compression("gzip")): DatasetAttributes = {
    val src = N5Meta.datasetAttributes(srcRoot, srcDataset)
    val dst = src.copy(blockSize = newBlockSize, compression = compression)
    val isFloat =
      src.dataType == Dtype.Float32 || src.dataType == Dtype.Float64

    import spark.implicits._
    // one typed pipeline for every dtype (native-typed read; floats as
    // raw Double bits — see typedLongBlocks)
    val typed = typedLongBlocks(
      N5.read(spark, srcRoot, srcDataset), src.dataType, Seq("x0", "y0", "z0"))

    val Array(nbx, nby, nbz) = newBlockSize
    val frags = typed.flatMap { case (x0, y0, z0, sshape, data) =>
      val Array(ssx, ssy, ssz) = sshape
      val fr = Seq.newBuilder[Frag]
      var tgz = (z0 / nbz).toInt
      while (tgz.toLong * nbz < z0 + ssz) {
        var tgy = (y0 / nby).toInt
        while (tgy.toLong * nby < y0 + ssy) {
          var tgx = (x0 / nbx).toInt
          while (tgx.toLong * nbx < x0 + ssx) {
            // intersection box in global coords
            val ix0 = math.max(x0, tgx.toLong * nbx)
            val ix1 = math.min(x0 + ssx, (tgx + 1).toLong * nbx)
            val iy0 = math.max(y0, tgy.toLong * nby)
            val iy1 = math.min(y0 + ssy, (tgy + 1).toLong * nby)
            val iz0 = math.max(z0, tgz.toLong * nbz)
            val iz1 = math.min(z0 + ssz, (tgz + 1).toLong * nbz)
            val (fx, fy, fz) = ((ix1 - ix0).toInt, (iy1 - iy0).toInt, (iz1 - iz0).toInt)
            val buf = new Array[Long](fx * fy * fz)
            var z = 0
            while (z < fz) {
              var y = 0
              while (y < fy) {
                val srcBase = ((ix0 - x0) +
                  (iy0 - y0 + y) * ssx + (iz0 - z0 + z) * ssx.toLong * ssy).toInt
                val dstBase = (y + z * fy) * fx
                System.arraycopy(data, srcBase, buf, dstBase, fx)
                y += 1
              }
              z += 1
            }
            fr += Frag(tgx, tgy, tgz,
              (ix0 - tgx.toLong * nbx).toInt, (iy0 - tgy.toLong * nby).toInt,
              (iz0 - tgz.toLong * nbz).toInt, fx, fy, fz, buf)
            tgx += 1
          }
          tgy += 1
        }
        tgz += 1
      }
      fr.result()
    }

    writeAssembledAs(assemble(frags, dst), dstRoot, dstDataset, dst, isFloat)
    dst
  }
}
