package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-safe as-of kernel: bucketed carry-forward must equal the naive
  * single-window formulation on real data (several bucket widths, incl.
  * widths that misalign with day boundaries) and on a synthetic hot-key
  * distribution where one key holds most rows.
  */
class AsOfSpec extends SparkSpec {

  private def naive(ev: DataFrame): DataFrame = {
    val w = Window.partitionBy(col("user_id"))
      .orderBy(col("ts").asc, col("is_purchase").asc, col("event_id").asc)
      .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    ev.withColumn("last_click_ts",
      last(when(col("event_type") === "click", col("ts")), ignoreNulls = true)
        .over(w))
  }

  private def bucketed(ev: DataFrame, width: Long): DataFrame =
    AsOf.lastNonNullOver(ev, "user_id", "ts",
      Seq(col("ts"), col("is_purchase"), col("event_id")),
      when(col("event_type") === "click", col("ts")),
      "last_click_ts", width)

  private def purchases(df: DataFrame): Map[Long, Any] =
    df.filter(col("event_type") === "purchase")
      .select(col("event_id"), col("last_click_ts")).collect()
      .map(r => r.getLong(0) -> r.get(1)).toMap

  test("bucketed as-of equals the naive window on events, any bucket width") {
    val ev = Tables.load(spark, "/root/testdata/sf0.01", "events")
      .filter(col("event_type").isin("click", "purchase"))
      .withColumn("is_purchase", (col("event_type") === "purchase").cast("int"))
    val expect = purchases(naive(ev))
    assert(expect.nonEmpty)
    for (width <- Seq(3601L, 86400L, 604800L)) {
      val got = purchases(bucketed(ev, width))
      assert(got == expect, s"bucket width $width diverges from naive window")
    }
  }

  test("hot key: one user with most rows still matches, null keys too") {
    import spark.implicits._
    val rng = new scala.util.Random(7)
    // user 1 holds 20k of 21k rows; a null-user group exercises the
    // null-safe carry join
    val rows = (0 until 21000).map { i =>
      val user: java.lang.Long =
        if (i % 21 == 20) null
        else if (i % 21 < 20) java.lang.Long.valueOf(1L)
        else java.lang.Long.valueOf(2L + i % 3)
      val t = java.sql.Timestamp.valueOf(
        java.time.LocalDateTime.of(2024, 1, 1, 0, 0, 0)
          .plusSeconds(rng.nextInt(40 * 86400).toLong))
      (i.toLong, user, t, if (rng.nextBoolean()) "click" else "purchase")
    }
    val ev = rows.toDF("event_id", "user_id", "ts", "event_type")
      .withColumn("is_purchase", (col("event_type") === "purchase").cast("int"))
    val expect = purchases(naive(ev))
    val got = purchases(bucketed(ev, 86400L))
    assert(got == expect)
    // and the partitions really were bounded: no (key,bucket) group holds
    // more than a few days' worth of the hot key
    val maxGroup = ev
      .withColumn("b", floor(unix_timestamp(col("ts")) / 86400L))
      .groupBy(col("user_id"), col("b")).count()
      .agg(max(col("count"))).collect()(0).getLong(0)
    assert(maxGroup < 2000, s"bucketing failed to bound partitions: $maxGroup")
  }
}
