package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.functions._

/** Point-in-interval range join that plans as an EQUI-join on time bins —
  * the scale path for "which events fall inside which windows" joins that
  * Spark would otherwise plan as a broadcast-nested-loop (or worse,
  * cartesian) theta join.
  *
  * Construction: pick a bin width W. Every interval [start, end) explodes
  * into the bins it overlaps (floor(start/W) .. floor((end-1)/W)); every
  * point maps to its single bin floor(ts/W). A point's bin is one of the
  * interval's bins iff the point CAN fall inside the interval, so the
  * bin equi-join finds each true match exactly once and the residual
  * predicate start <= ts < end discards false bin-mates. No match is
  * duplicated (the point has one bin) and none is lost (the interval
  * covers all bins its span touches).
  *
  * Scale notes (100 TB): the shuffle is hash(bin [+ keys]) — both sides
  * partition by calendar locality instead of replicating one side. Bin
  * count per interval is ceil(len/W)+1, so choose W near the typical
  * interval length: the interval side inflates by ~2x while a theta join
  * replicates the FULL point side per executor. Intervals much longer
  * than W inflate proportionally (they are the skew to watch); a dense
  * bin (flash-crowd hour) skews like any hot key and composes with
  * SkewJoin.salted on the bin column if needed. Bin arithmetic is exact:
  * integer microseconds, subtract-mod before the divide, so engines
  * cannot disagree at bin boundaries.
  */
object RangeJoin {

  private val BinCol = "__bin"

  /** Exact floor(us / binMicros) for any long timestamp: subtracting the
    * (always non-negative) pmod makes the numerator an exact multiple, so
    * the INTEGRAL division is floor for either sign. Long arithmetic
    * end-to-end — a double division would only be exact below 2^53 and
    * could round boundary micros across bins for extreme epochs.
    */
  private def binOf(us: Column, binMicros: Long): Column = {
    import org.apache.spark.sql.GraftSqlBridge
    import org.apache.spark.sql.catalyst.expressions.{IntegralDivide, Literal}
    GraftSqlBridge.column(IntegralDivide(
      GraftSqlBridge.expression(us - pmod(us, lit(binMicros))),
      Literal(binMicros)))
  }

  /** Join `points` to every interval of `intervals` whose half-open
    * [startCol, endCol) span contains the point's `tsCol`, optionally
    * scoped by additional equi-`keys` present on both sides. Degenerate
    * intervals (end <= start) match nothing and are dropped. Column sets
    * must be disjoint apart from `keys` (fail-loudly — a silent
    * auto-rename would corrupt the residual predicate).
    */
  def pointInInterval(
      points: DataFrame, tsCol: String,
      intervals: DataFrame, startCol: String, endCol: String,
      binMicros: Long, keys: Seq[String] = Nil): DataFrame = {
    require(binMicros > 0, s"binMicros must be positive, got $binMicros")
    val overlap = points.columns.toSet
      .intersect(intervals.columns.toSet) -- keys
    require(overlap.isEmpty,
      s"point/interval sides share non-key columns: ${overlap.mkString(", ")}")
    require(!points.columns.contains(BinCol) && !intervals.columns.contains(BinCol),
      s"input already has scratch column $BinCol")
    val p = points.withColumn(BinCol,
      binOf(unix_micros(col(tsCol)), binMicros))
    val i = intervals
      .filter(col(endCol) > col(startCol))
      .withColumn(BinCol, explode(sequence(
        binOf(unix_micros(col(startCol)), binMicros),
        binOf(unix_micros(col(endCol)) - 1, binMicros))))
    p.join(i, keys :+ BinCol)
      .filter(col(tsCol) >= col(startCol) && col(tsCol) < col(endCol))
      .drop(BinCol)
  }
}
