package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** Loaders for the driver-provided synthetic corpus (TESTDATA.md).
  *
  * Tables are plain parquet; Catalyst handles column pruning and filter
  * pushdown into the scan, so every query should start from these loaders
  * rather than caching or materializing intermediates. At 100 TB the same
  * loaders point at a partitioned table root and nothing else changes.
  */
object Tables {
  val names: Seq[String] = Seq(
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings")

  def load(spark: SparkSession, dir: String, name: String): DataFrame =
    spark.read.parquet(s"$dir/$name.parquet")

  /** Register all tables as temp views (for spark.sql-style queries). */
  def registerAll(spark: SparkSession, dir: String): Unit =
    names.foreach(n => load(spark, dir, n).createOrReplaceTempView(n))
}
