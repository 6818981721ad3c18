package graft

import org.apache.spark.sql.catalyst.expressions.ScalaUDF
import org.apache.spark.sql.execution.SparkPlan
import org.apache.spark.sql.execution.joins.CartesianProductExec

/** Whole-surface physical-plan LINT: while PlanAuditSpec pins specific
  * scale-critical plans query-by-query, this spec sweeps EVERY declared
  * query and asserts the global invariants no plan may ever violate at
  * 100 TB, so a future query (or an optimizer-visible refactor of a
  * shared helper) cannot quietly regress them:
  *
  *  - no CartesianProductExec anywhere — an unbounded non-broadcast
  *    product is never acceptable; the only intentional nested-loop
  *    query (q11 theta join) is bounded by a broadcast side and plans
  *    as BroadcastNestedLoopJoin, which stays allowed;
  *  - no Python evaluation nodes — the engine is JVM-codegen only;
  *  - ScalaUDF expressions only in q65, the one declared scalar-UDF
  *    surface row (everything else must use built-ins or native
  *    codegen'd expressions).
  *
  * Build failures are collected and failed loudly too: every declared
  * query must at least PLAN at the smallest fixture SF.
  */
class PlanLintSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  private val udfAllowed = Set("q65_scalar_udf")

  private def scalaUdfs(plan: SparkPlan): Seq[ScalaUDF] =
    plan.collect { case n =>
      n.expressions.flatMap(_.collect { case u: ScalaUDF => u })
    }.flatten

  test("every declared query plans without cartesian products, Python eval, or undeclared UDFs") {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    try {
      // AQE off so the prepared plan exposes its real operator tree
      // (AdaptiveSparkPlanExec hides children from collect)
      spark.conf.set(key, "false")
      Queries.all.foreach { q =>
        try {
          val plan = q.build(spark, dir).queryExecution.executedPlan
          if (plan.collect { case c: CartesianProductExec => c }.nonEmpty)
            offenders += s"${q.name}: CartesianProduct in physical plan"
          if (plan.collect {
                case n if n.nodeName.contains("Python") => n
              }.nonEmpty)
            offenders += s"${q.name}: Python evaluation node in plan"
          if (!udfAllowed(q.name) && scalaUdfs(plan).nonEmpty)
            offenders += s"${q.name}: undeclared ScalaUDF in plan"
        } catch {
          case e: Throwable =>
            offenders += s"${q.name}: failed to plan at sf0.001: " +
              s"${e.getClass.getSimpleName}: ${String.valueOf(e.getMessage).take(200)}"
        }
      }
      // the declared UDF row must actually exercise the UDF surface —
      // if q65 stops planning a ScalaUDF the surface claim is stale
      val q65 = Queries.byName("q65_scalar_udf").build(spark, dir)
        .queryExecution.executedPlan
      assert(scalaUdfs(q65).nonEmpty,
        "q65 must plan a ScalaUDF — it is the declared UDF surface row")
    } finally spark.conf.set(key, prev)
    assert(offenders.isEmpty,
      s"${offenders.size} plan-lint offenders:\n" + offenders.mkString("\n"))
  }
}
