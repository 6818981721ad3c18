package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Z-order (Morton) curve layout: interleave the bits of several integer
  * dimensions into one sort key so that sorting by it co-locates rows that
  * are close in EVERY dimension, not just the leading one. Writing a table
  * z-sorted gives min/max file and row-group statistics that prune on ANY
  * filtered dimension — a single-column sort prunes only its own column
  * and leaves a trailing-dimension filter scanning everything.
  *
  * This is the relational analogue of the reference's spatial chunking: an
  * N5 volume is pruned on x, y AND z because blocks are axis-aligned boxes
  * (`n5_utils.py:6-18`); a z-ordered parquet table gets the same
  * any-dimension locality for element tables and event/feature logs. At
  * 100 TB the layout is a one-time `repartitionByRange(zval)` shuffle at
  * ingest (exactly like the bucketed-join layout in [[Layout]]), after
  * which every box-shaped predicate reads a curve-contiguous fraction of
  * the files instead of the whole table.
  *
  * The interleave itself is a pure expression tree of shifts/masks —
  * codegen'd, shuffle-free, and reproducible in DuckDB for the oracle.
  */
object ZOrder {

  /** Morton key over `cols`, taking the LOW `bitsPer` bits of each (the
    * caller maps values into [0, 2^bitsPer) — higher bits are masked off,
    * which silently merges distant points, so range-check upstream).
    * Bit i of column j lands at position i·n + j; total bits n·bitsPer
    * must fit a non-negative LONG.
    */
  def zValue(cols: Seq[Column], bitsPer: Int): Column = {
    val n = cols.size
    require(n > 0, "at least one dimension required")
    require(bitsPer > 0 && n * bitsPer <= 63,
      s"$n dims x $bitsPer bits = ${n * bitsPer} bits; must be in (0, 63]")
    val terms = for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bitsPer
    } yield shiftleft(
      shiftright(c.cast("long"), i).bitwiseAND(lit(1L)), i * n + j)
    terms.reduce(_ bitwiseOR _)
  }

  /** The same interleave in DuckDB SQL (bit-disjoint terms summed), for
    * oracle queries: `zValueSql(Seq("x", "y"), 8)`.
    */
  def zValueSql(cols: Seq[String], bitsPer: Int): String = {
    val n = cols.size
    require(n > 0 && bitsPer > 0 && n * bitsPer <= 63)
    (for {
      (c, j) <- cols.zipWithIndex
      i <- 0 until bitsPer
    } yield s"(((CAST($c AS BIGINT) >> $i) & 1) << ${i * n + j})")
      .mkString(" + ")
  }

  /** Write `df` z-ordered on `dims` as parquet: one range shuffle on the
    * Morton key, sorted within partitions, key dropped from the files.
    * `maxRecordsPerFile` bounds file size so min/max pruning has
    * granularity to work with. `numFiles > 0` pins the range-partition
    * count (otherwise spark.sql.shuffle.partitions + AQE decide — fine at
    * scale, but AQE coalesces a small table to one file, defeating the
    * layout).
    */
  def writeZOrdered(
      df: DataFrame, dims: Seq[String], bitsPer: Int, path: String,
      maxRecordsPerFile: Long = 0L, numFiles: Int = 0): Unit = {
    val key = "__zval"
    require(!df.columns.contains(key), s"input already has scratch column $key")
    val keyed = df.withColumn(key, zValue(dims.map(col), bitsPer))
    (if (numFiles > 0) keyed.repartitionByRange(numFiles, col(key))
     else keyed.repartitionByRange(col(key)))
      .sortWithinPartitions(col(key))
      .drop(key)
      .write.mode("overwrite")
      .option("maxRecordsPerFile", maxRecordsPerFile)
      .parquet(path)
  }

  /** Linear quantization of a raw numeric column from its closed domain
    * [min, max] into [0, 2^bits) — the upstream range mapping [[zValue]]'s
    * low-bits contract requires (r12, the q140 face). Collisions inside
    * one cell are harmless: they land in the same curve neighborhood. */
  def scaleToBits(c: Column, min: Long, max: Long, bits: Int): Column = {
    require(bits > 0 && bits <= 31, s"bits must be in (0, 31], got $bits")
    val cells = 1L << bits
    val span = math.max(max - min + 1, 1L)
    // the double product can round UP for spans near 2^53, mapping c=max
    // to `cells` — outside zValue's [0, 2^bits) contract; clamp (r12
    // ADVICE)
    least(
      floor((c.cast("long") - lit(min)).cast("double") * cells / span)
        .cast("long"),
      lit(cells - 1))
  }

  /** Per-file (min, max) ranges of two columns — the zone map a pruning
    * reader consults (parquet footers locally, per-file column ranges in
    * any catalog). Computed distributively: one scan, one file-keyed agg
    * (r12). Used by ZOrderSpec to pin the overlap bound and by callers
    * auditing a layout. */
  def zoneMap(spark: org.apache.spark.sql.SparkSession, path: String,
      colA: String, colB: String): DataFrame =
    spark.read.parquet(path)
      .groupBy(input_file_name().as("file"))
      .agg(min(col(colA)).as("a_min"), max(col(colA)).as("a_max"),
        min(col(colB)).as("b_min"), max(col(colB)).as("b_max"))

  /** How many files of the layout an (a, b) box query must open, per the
    * zone map (r12). */
  def overlapCount(zones: DataFrame,
      aLo: Long, aHi: Long, bLo: Long, bHi: Long): Long =
    zones.filter(col("a_max") >= aLo && col("a_min") <= aHi &&
      col("b_max") >= bLo && col("b_min") <= bHi).count()
}
