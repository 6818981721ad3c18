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

  test("suite-wide WindowExec inventory: every partition-less window is " +
      "either bounded-input by construction or explicitly justified (r15)") {
    // A partition-less WindowExec moves ALL its input rows to one
    // partition — the q61-class hazard DistributedRank (q153/q201)
    // exists to retire. This inventory sweeps every declared plan and
    // fails on any partition-less window over an input that is not in
    // the justified set below, so a new query cannot quietly ship a
    // global single-reducer sort over corpus-sized data.
    //
    // Justifications (audited r15):
    //  - "bounded": the window input is bounded BY CONSTRUCTION well
    //    below one executor's memory at ANY corpus size (aggregate
    //    outputs keyed by a bounded domain, pre-limited top-k slices,
    //    codebook/probe tables, per-bin histograms, release shards);
    //  - "contrast": q61 keeps the stock window DELIBERATELY as the
    //    measured baseline q153/q201 are compared against.
    // EXACTLY the partition-less set the r15 audit found (11 queries);
    // an entry here that stops being needed should be REMOVED, so the
    // map cannot silently whitelist future windows
    val justified: Map[String, String] = Map(
      "q121_histogram_cdf" -> "bounded (21 histogram bins)",
      "q146_hybrid_rrf" -> "bounded (two TakeOrdered top-20 ranker slices)",
      "q159_mixture_token_budget" -> "bounded (20 domain rate rows in the waterfilling solver)",
      "q160_release_sharding" -> "bounded (16 shard boundary rows)",
      "q175_interval_concurrency" -> "bounded (PrefixSum per-bucket carry table: one row per day bucket)",
      "q190_volume_cc" -> "bounded (rank over the TakeOrdered top-10 component slice)",
      "q191_volume_region_props" -> "bounded (rank over the TakeOrdered top-10 slice)",
      "q192_volume_mip" -> "bounded (rank over the TakeOrdered top-5 slice)",
      "q193_volume_label_writeback" -> "bounded (rank over the TakeOrdered top-5 slice)",
      "q198_daily_autocorrelation" -> "bounded (day-bounded series: 365 rows/year at any event volume)",
      "q200_benford_audit" -> "bounded (9 digit cells)")
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    val offenders = scala.collection.mutable.ArrayBuffer[String]()
    val inventory = scala.collection.mutable.ArrayBuffer[String]()
    val partitionlessSet = scala.collection.mutable.Set[String]()
    try {
      spark.conf.set(key, "false")
      Queries.all.foreach { q =>
        try {
          val plan = q.build(spark, dir).queryExecution.executedPlan
          val wins = plan.collect {
            case w: org.apache.spark.sql.execution.window.WindowExec => w
          }
          val partitionless = wins.count(_.partitionSpec.isEmpty)
          val keyed = wins.size - partitionless
          if (wins.nonEmpty)
            inventory += f"${q.name}%-40s partitionless=$partitionless keyed=$keyed"
          if (partitionless > 0) {
            partitionlessSet += q.name
            if (!justified.contains(q.name))
              offenders += s"${q.name}: $partitionless partition-less WindowExec " +
                "without a bounded-input justification"
          }
        } catch {
          case e: Throwable =>
            offenders += s"${q.name}: failed to plan: ${e.getClass.getSimpleName}"
        }
      }
    } finally spark.conf.set(key, prev)
    info(s"WindowExec inventory (${inventory.size} queries):")
    inventory.foreach(info(_))
    // stale allowlist entries are offenders too: the map must describe
    // exactly what exists, or it quietly pre-authorizes future windows
    val stale = justified.keySet -- partitionlessSet
    assert(stale.isEmpty,
      s"justified entries with no partition-less window anymore: $stale")
    assert(offenders.isEmpty,
      s"${offenders.size} unjustified partition-less windows:\n" +
        offenders.mkString("\n"))
  }
}
