package graft.functions

import org.apache.spark.sql.{Encoder, Encoders}
import org.apache.spark.sql.expressions.Aggregator

/** Mutable aggregation buffer: running log-sum + count. */
final case class GeoBuf(var logSum: Double, var n: Long)

/** Geometric mean as a typed Aggregator (the SURVEY §2.3 UDAF row).
  *
  * Distributed-safe by construction: `reduce` does map-side partial
  * aggregation per partition, `merge` combines partials — the same two-phase
  * shape as Spark's built-in aggregates, so at 100 TB the shuffle carries one
  * (logSum, n) pair per group per partition.
  */
object GeoMean extends Aggregator[java.lang.Double, GeoBuf, Double] {
  override def zero: GeoBuf = GeoBuf(0.0, 0L)
  override def reduce(b: GeoBuf, a: java.lang.Double): GeoBuf = {
    // SQL exp(avg(ln(x))) skips NULL inputs — match it; non-positive
    // input would silently poison the log-sum (-Inf/NaN), so fail loudly
    if (a != null) {
      require(a > 0.0, s"geo_mean requires positive input, got $a")
      b.logSum += math.log(a); b.n += 1
    }
    b
  }
  override def merge(x: GeoBuf, y: GeoBuf): GeoBuf =
    GeoBuf(x.logSum + y.logSum, x.n + y.n)
  override def finish(b: GeoBuf): Double =
    if (b.n == 0L) Double.NaN else math.exp(b.logSum / b.n)
  override def bufferEncoder: Encoder[GeoBuf] = Encoders.product[GeoBuf]
  override def outputEncoder: Encoder[Double] = Encoders.scalaDouble
}
