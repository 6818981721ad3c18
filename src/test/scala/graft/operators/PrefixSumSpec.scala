package graft.operators

import graft.{SparkSpec, Tables}
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Skew-safe prefix sum: bucketed carry must equal the naive single-window
  * running sum exactly for integer values, on real data and on a hot-key
  * distribution with nulls.
  */
class PrefixSumSpec extends SparkSpec {

  test("bucketed running sum equals the naive window on documents") {
    val d = Tables.load(spark, "/root/testdata/sf0.01", "documents")
      .select(col("source"), col("doc_id"), TF.tokenCount(col("text")).as("tok"))
    val naive = d.withColumn("cum", sum(col("tok"))
      .over(Window.partitionBy(col("source")).orderBy(col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
    def collectCum(df: DataFrame): Map[Long, Long] =
      df.select(col("doc_id"), col("cum")).collect()
        .map(r => r.getLong(0) -> r.getLong(1)).toMap
    val expect = collectCum(naive)
    for (width <- Seq(64L, 1024L)) {
      val got = collectCum(PrefixSum.runningSum(d, "source",
        expr(s"CAST(doc_id div $width AS BIGINT)"), Seq(col("doc_id")),
        col("tok"), "cum"))
      assert(got == expect, s"bucket width $width diverges")
    }
  }

  test("hot key with null values and null keys matches the naive window") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    val rows = (0 until 20000).map { i =>
      val key: java.lang.Long =
        if (i % 40 == 39) null else java.lang.Long.valueOf((i % 40) / 38L)
      val v: java.lang.Long =
        if (i % 7 == 0) null else java.lang.Long.valueOf(rng.nextInt(100).toLong)
      (i.toLong, key, v)
    }
    val df = rows.toDF("id", "k", "v")
    val naive = df.withColumn("cum", sum(col("v"))
      .over(Window.partitionBy(col("k")).orderBy(col("id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)))
      .select(col("id"), col("cum")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1)))
      .toMap
    val got = PrefixSum.runningSum(df, "k",
      expr("CAST(id div 512 AS BIGINT)"), Seq(col("id")), col("v"), "cum")
      .select(col("id"), col("cum")).collect()
      .map(r => r.getLong(0) -> (if (r.isNullAt(1)) null else r.getLong(1)))
      .toMap
    assert(got == naive)
  }
}
