package org.apache.spark.sql

import org.apache.spark.sql.catalyst.expressions.Expression
import org.apache.spark.sql.classic.ExpressionUtils

/** Minimal bridge into `private[sql]` surface: Column <-> Expression
  * conversion, needed to expose native Catalyst expressions (e.g.
  * graft.functions.VectorL2Norm) through the public Column API.
  */
object GraftSqlBridge {
  def column(e: Expression): Column = ExpressionUtils.column(e)
  def expression(c: Column): Expression = ExpressionUtils.expression(c)

  /** Register a SQL function on an ALREADY-RUNNING session (extensions can
    * only bind at build time; driver-provided sessions need this path).
    */
  def registerFunction(
      spark: SparkSession, name: String,
      builder: Seq[Expression] => Expression): Unit =
    spark.sessionState.functionRegistry
      .createOrReplaceTempFunction(name, builder, "scala_udf")

  /** Free the cached blocks behind a `localCheckpoint`ed Dataset (r20).
    * Iterative operators retire one checkpointed label/rank vector per
    * round; left to the async ContextCleaner those blocks pile up until
    * a later GC and the cleanup steals time from whatever query runs
    * NEXT (measured: queries following checkpoint-heavy ones drifted
    * +0.2–0.7 s). Unpersisting the retired round's RDD directly frees
    * the blocks on the spot. No-op for plans that carry no LogicalRDD.
    */
  def unpersistCheckpoint(df: Dataset[_]): Unit =
    df.queryExecution.analyzed.foreach {
      case r: org.apache.spark.sql.execution.LogicalRDD =>
        r.rdd.unpersist(blocking = false)
      case _ => ()
    }
}
