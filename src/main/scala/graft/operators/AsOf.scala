package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-safe "last non-null value at or before each row" — the as-of join
  * kernel (q12 shape; reference-world analogue: latest event state joined
  * onto each observation).
  *
  * The naive formulation windows over `partitionBy(key)`: one pathological
  * key (a bot user with 10⁸ events) serializes its whole history into a
  * single task — the 100×-scale caveat flagged on q12 in round 1. This
  * formulation bounds every window partition by (key, time bucket) and
  * carries state across buckets via a window over the per-bucket SUMMARY,
  * whose row count is the number of touched buckets, not events:
  *
  *   1. within (key, bucket): running last non-null carrier — bounded by
  *      events-per-key-per-bucket;
  *   2. per (key, bucket): the bucket's final carrier value (max-by-order);
  *   3. across buckets per key: last non-null final of strictly EARLIER
  *      buckets (the carry-in) — bucket-count-sized data;
  *   4. result = coalesce(within-bucket running, carry-in), joined back
  *      co-partitioned on (key, bucket).
  *
  * Exactness: floor-bucketing puts equal timestamps in the same bucket, so
  * the carry-in only ever contains strictly-earlier rows and in-bucket ties
  * are resolved by `order` exactly as the naive window would. Nulls in the
  * key form their own group (null-safe join), matching the naive window's
  * null partition.
  */
object AsOf {

  /** @param order   ascending tie-break columns (must make rows per key
    *                unique for deterministic results), e.g. (ts, event_id)
    * @param carrier value to carry forward; null rows are carried OVER
    * @param out     name of the added result column
    */
  def lastNonNullOver(
      df: DataFrame, key: String, ts: String, order: Seq[Column],
      carrier: Column, out: String, bucketSeconds: Long = 86400L): DataFrame = {
    require(bucketSeconds > 0, "bucketSeconds must be positive")
    // scratch names would silently clobber-and-drop caller columns
    val scratch = Seq("__b", "__ord", "__local", "__k2", "__b2", "__carry")
    val clash = df.columns.toSet.intersect(scratch.toSet)
    require(clash.isEmpty, s"input already has scratch column(s) $clash")
    val local = df
      .withColumn("__b",
        floor(unix_timestamp(col(ts)) / bucketSeconds).cast("long"))
      .withColumn("__ord", struct(order: _*))
      .withColumn("__local", last(carrier, ignoreNulls = true)
        .over(Window.partitionBy(col(key), col("__b"))
          .orderBy(col("__ord").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    // bucket-final value = __local of the bucket's last row (struct max
    // compares __ord first; __ord is never null)
    val summary = local.groupBy(col(key), col("__b"))
      .agg(max(struct(col("__ord"), col("__local")))
        .getField("__local").as("__final"))
    val carry = summary
      .withColumn("__carry", last(col("__final"), ignoreNulls = true)
        .over(Window.partitionBy(col(key)).orderBy(col("__b").asc)
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col(key).as("__k2"), col("__b").as("__b2"), col("__carry"))
    local
      .join(carry, col(key) <=> col("__k2") && col("__b") === col("__b2"), "left")
      .withColumn(out, coalesce(col("__local"), col("__carry")))
      .drop("__b", "__ord", "__local", "__k2", "__b2", "__carry")
  }
}
