package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

import java.nio.file.Files

/** Z-order key: the expression tree must compute the exact Morton
  * interleave (pinned against a bit-twiddling reference implementation),
  * and `writeZOrdered` must produce range-disjoint files so min/max
  * statistics prune box predicates on any dimension.
  */
class ZOrderSpec extends SparkSpec {

  /** Reference Morton interleave, plain Scala bit arithmetic. */
  private def morton(vals: Seq[Long], bitsPer: Int): Long = {
    val n = vals.size
    var acc = 0L
    for ((v, j) <- vals.zipWithIndex; i <- 0 until bitsPer)
      acc |= ((v >> i) & 1L) << (i * n + j)
    acc
  }

  test("zValue matches the reference interleave on random points") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    val pts = Seq.fill(500)((rng.nextInt(256).toLong, rng.nextInt(256).toLong,
      rng.nextInt(256).toLong))
    val got = pts.toDF("x", "y", "z")
      .select(col("x"), col("y"), col("z"),
        ZOrder.zValue(Seq(col("x"), col("y"), col("z")), 8).as("zv"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2)) -> r.getLong(3))
      .toMap
    for (((x, y, z), zv) <- got)
      assert(zv == morton(Seq(x, y, z), 8), s"($x,$y,$z)")
  }

  test("zValue masks high bits and neighbors share long key prefixes") {
    import spark.implicits._
    // values >= 2^bits fold onto their low bits (documented contract)
    val r = Seq((257L, 1L)).toDF("x", "y")
      .select(ZOrder.zValue(Seq(col("x"), col("y")), 8).as("zv"))
      .head().getLong(0)
    assert(r == morton(Seq(1L, 1L), 8))
    // locality: a unit step in one dim moves the key by less than a
    // full-range step in the OTHER dim's high bit would
    val near = morton(Seq(100L, 100L), 8) - morton(Seq(100L, 101L), 8)
    val far = morton(Seq(100L, 100L), 8) - morton(Seq(228L, 100L), 8)
    assert(math.abs(near) < math.abs(far))
  }

  test("zValue rejects degenerate configs") {
    intercept[IllegalArgumentException](ZOrder.zValue(Seq.empty, 8))
    intercept[IllegalArgumentException](ZOrder.zValue(Seq(col("x")), 64))
    intercept[IllegalArgumentException](
      ZOrder.zValue(Seq(col("x"), col("y")), 32))
  }

  test("writeZOrdered preserves rows and yields range-disjoint files") {
    import spark.implicits._
    val rng = new scala.util.Random(13)
    val df = Seq.fill(4000)((rng.nextInt(256).toLong, rng.nextInt(256).toLong))
      .zipWithIndex.map { case ((x, y), i) => (x, y, i.toLong) }
      .toDF("x", "y", "row_id")
    val dir = Files.createTempDirectory("zorder").toFile
    dir.deleteOnExit()
    val path = dir.getAbsolutePath + "/t"
    ZOrder.writeZOrdered(df.repartition(4), Seq("x", "y"), 8, path,
      numFiles = 4)

    val back = spark.read.parquet(path)
    assert(back.count() == 4000)
    assert(back.select(sum(col("row_id"))).head().getLong(0) ==
      (0L until 4000L).sum)

    // per-file zval intervals must not overlap (repartitionByRange + sort)
    val files = back.inputFiles.toSeq
    assert(files.size > 1, "expected several range partitions")
    val spans = files.map { f =>
      val r = spark.read.parquet(f)
        .select(ZOrder.zValue(Seq(col("x"), col("y")), 8).as("zv"))
        .agg(min(col("zv")), max(col("zv"))).head()
      (r.getLong(0), r.getLong(1))
    }.sortBy(_._1)
    for (Seq((_, hi), (lo, _)) <- spans.sliding(2))
      assert(hi <= lo, s"overlapping zval ranges across files: $spans")
  }

  test("writeZOrdered refuses a clashing scratch column") {
    import spark.implicits._
    val df = Seq((1L, 2L, 3L)).toDF("x", "y", "__zval")
    intercept[IllegalArgumentException](
      ZOrder.writeZOrdered(df, Seq("x", "y"), 8, "/tmp/unused"))
  }

  test("zone-map pruning beats a linear sort on its worst-case strip (q140)") {
    // probe the layout where a single-column sort is worst: a strip WIDE
    // on the sorted key (orderkey: whole domain) and NARROW on the other
    // (partkey: ~2%). The orderkey-sorted strawman passes every file
    // (each spans the whole partkey domain); the z-layout bounds every
    // file to a rectangle of the plane, so only the files crossing the
    // thin strip survive the zone-map check.
    val li = graft.Tables.load(spark, "/root/testdata/sf0.01", "lineitem")
      .select(col("l_orderkey"), col("l_partkey"), col("l_quantity"))
    val r = li.agg(
      min(col("l_orderkey")).cast("long"), max(col("l_orderkey")).cast("long"),
      min(col("l_partkey")).cast("long"), max(col("l_partkey")).cast("long"))
      .head()
    val keyed = li
      .withColumn("__a", ZOrder.scaleToBits(col("l_orderkey"), r.getLong(0), r.getLong(1), 16))
      .withColumn("__b", ZOrder.scaleToBits(col("l_partkey"), r.getLong(2), r.getLong(3), 16))
    val tmp = java.nio.file.Files.createTempDirectory("zprune").toString
    val nFiles = 16
    ZOrder.writeZOrdered(keyed, Seq("__a", "__b"), 16, s"$tmp/z", numFiles = nFiles)
    li.repartitionByRange(nFiles, col("l_orderkey"))
      .sortWithinPartitions("l_orderkey")
      .write.mode("overwrite").parquet(s"$tmp/linear")

    val aHi = r.getLong(1) + 1
    val (bLo, bHi) = (100L, 140L) // ~2% of the partkey domain
    val zHit = ZOrder.overlapCount(
      ZOrder.zoneMap(spark, s"$tmp/z", "l_orderkey", "l_partkey"), 0, aHi, bLo, bHi)
    val linHit = ZOrder.overlapCount(
      ZOrder.zoneMap(spark, s"$tmp/linear", "l_orderkey", "l_partkey"), 0, aHi, bLo, bHi)
    assert(linHit.toInt == nFiles,
      s"strawman should open every file on the wide-narrow strip, got $linHit")
    assert(zHit <= nFiles / 2,
      s"z-layout overlap $zHit of $nFiles files — expected 2-D pruning")

    // and the layout never changes answers: box aggregate equality
    def boxAgg(df: org.apache.spark.sql.DataFrame) = df
      .filter(col("l_orderkey").between(1000, 3000) &&
        col("l_partkey").between(100, 300))
      .agg(count(lit(1)), round(sum(col("l_quantity")), 2)).head()
    assert(boxAgg(spark.read.parquet(s"$tmp/z")) == boxAgg(li),
      "z-layout changed the box answer")
  }
}
