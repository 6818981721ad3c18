package graft

import org.apache.spark.sql.{DataFrame, SparkSession}

/** One declared operator check from SURVEY.md §2.3: a Spark-side builder and
  * (when SQL-expressible) the equivalent DuckDB oracle SQL the driver runs on
  * the same parquet tables. Column names/aliases MUST match between the two —
  * the driver sorts columns by name before hashing values.
  *
  * Determinism rules (FIXTURES.md): total ORDER BY over all output columns
  * with explicit null ordering, ROUND(x,4) on double aggregates, UTC
  * timestamps, LIMIT only after total order.
  */
final case class QueryDef(
    name: String,
    build: (SparkSession, String) => DataFrame,
    oracle: Option[String])

object QueryDef {
  def sql(name: String, oracle: String)(
      build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, build, Some(oracle))

  /** Non-SQL-expressible op: driver records a weaker rows-only check. */
  def rowsOnly(name: String)(
      build: (SparkSession, String) => DataFrame): QueryDef =
    QueryDef(name, build, None)
}
