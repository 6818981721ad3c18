package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-safe running (prefix) sum per key — the q57 sequence-packing
  * shape, and the general cure for `sum(...).over(partitionBy(key))`
  * hot-key serialization (same bucketed-carry scheme as [[AsOf]]):
  *
  *   1. within (key, bucket): running sum under `order` — bounded;
  *   2. per (key, bucket): the bucket total (a plain groupBy sum);
  *   3. across buckets per key: sum of strictly-earlier bucket totals
  *      (the carry-in) — a window over bucket-count-sized data;
  *   4. result = within-bucket running + carry-in.
  *
  * EXACT for integer/decimal values (addition is associative). For
  * floating-point values the regrouped addition order can differ from the
  * naive single-window sum in the last ulps — keep the naive window where
  * bit-parity with an external oracle matters (q19), or accept the ulp.
  *
  * Precondition: `bucket` must be monotone non-decreasing w.r.t. `order`
  * within each key (e.g. day(ts) when ordering by ts; id div N when
  * ordering by id), or earlier rows would land in later buckets and the
  * carry would double-count.
  */
object PrefixSum {

  def runningSum(
      df: DataFrame, key: String, bucket: Column, order: Seq[Column],
      value: Column, out: String): DataFrame = {
    // scratch names would silently clobber-and-drop caller columns
    val scratch = Seq("__pb", "__pord", "__pv", "__plocal", "__pk2", "__pb2",
      "__pcarry")
    val clash = df.columns.toSet.intersect(scratch.toSet)
    require(clash.isEmpty, s"input already has scratch column(s) $clash")
    val local = df
      .withColumn("__pb", bucket)
      .withColumn("__pord", struct(order: _*))
      .withColumn("__pv", value)
      .withColumn("__plocal", sum(col("__pv"))
        .over(Window.partitionBy(col(key), col("__pb"))
          .orderBy(col("__pord").asc)
          .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    val summary = local.groupBy(col(key), col("__pb"))
      .agg(sum(col("__pv")).as("__ptot"))
    val carry = summary
      .withColumn("__pcarry", sum(col("__ptot"))
        .over(Window.partitionBy(col(key)).orderBy(col("__pb").asc)
          .rowsBetween(Window.unboundedPreceding, -1)))
      .select(col(key).as("__pk2"), col("__pb").as("__pb2"), col("__pcarry"))
    local
      .join(carry,
        col(key) <=> col("__pk2") && col("__pb") === col("__pb2"), "left")
      // null only when the whole prefix is null-valued, like the naive
      // window's sum (which ignores nulls but is null over an empty set)
      .withColumn(out,
        when(col("__plocal").isNull && col("__pcarry").isNull, lit(null))
          .otherwise(coalesce(col("__plocal"), lit(0)) +
            coalesce(col("__pcarry"), lit(0))))
      .drop("__pb", "__pord", "__pv", "__plocal", "__pk2", "__pb2", "__pcarry")
  }
}
