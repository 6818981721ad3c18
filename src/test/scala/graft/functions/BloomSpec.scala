package graft.functions

import graft.{Queries, SparkSpec, Tables}
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.functions._

/** Bloom-pre-filtered decontamination (q135): the properties that make the
  * bloom sketch SAFE (no false negatives — the pre-filter can never change
  * the confirmed answer) and USEFUL (the pass rate on disjoint keys tracks
  * the configured fpp, so the exchange after the filter is fpp-bounded,
  * not corpus-sized), plus the plan pin that the native expression sits on
  * the scan side BEFORE the confirmation join.
  */
class BloomSpec extends SparkSpec {
  import spark.implicits._

  private val sf = "/root/testdata/sf0.001"

  test("bloom membership has no false negatives; disjoint-key pass rate tracks fpp") {
    val members = (0 until 2000).map(i => s"member-gram-$i").toDF("gram")
    val bloom = BloomRef.build(members, "gram", expectedItems = 2000L, fpp = 0.01)
    // every inserted key must probe true — this is the property that lets
    // the pre-filter precede the exact confirmation join without changing it
    val kept = members
      .filter(NativeExpressions.bloomMightContain(col("gram"), bloom))
      .count()
    assert(kept == 2000L, s"bloom dropped ${2000L - kept} true members")
    // a disjoint key set should pass at ~fpp — pin an order-of-magnitude
    // bound (10x the configured 1%), not an exact rate
    val others = (0 until 10000).map(i => s"other-gram-$i").toDF("gram")
    val fp = others
      .filter(NativeExpressions.bloomMightContain(col("gram"), bloom))
      .count()
    assert(fp <= 1000L, s"false-positive rate ${fp / 10000.0} far above fpp=0.01")
  }

  test("q135 equals the exact join without the bloom pre-filter") {
    val dir = sf
    val toks = TextFunctions.tokens(TextFunctions.normalizeText(col("text")))
    val exploded = Tables.load(spark, dir, "documents")
      .select(col("doc_id"), explode(NativeExpressions.wordNgrams(toks, 3)).as("gram"))
    val probeGrams = exploded.filter(col("doc_id") < 10).select(col("gram")).distinct()
    val exact = exploded.filter(col("doc_id") >= 10)
      .join(broadcast(probeGrams), Seq("gram"))
      .groupBy(col("doc_id")).agg(countDistinct(col("gram")).as("n_shared"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    val withBloom = Queries.byName("q135_decontaminate_bloom").build(spark, dir)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    // q135 rows with n_shared == 0 come from the left join-back; the exact
    // map only holds contaminated docs
    withBloom.foreach { case (doc, n) =>
      assert(exact.getOrElse(doc, 0L) == n,
        s"doc $doc: bloom path n_shared=$n, exact=${exact.getOrElse(doc, 0L)}")
    }
  }

  test("q135 plan: bloom filter precedes the broadcast confirmation join; one corpus exchange") {
    // AQE disabled so the prepared plan tree is traversable (an
    // AdaptiveSparkPlanExec hides its children from collect — the
    // PlanAuditSpec.hashExchanges discipline)
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val df = Queries.byName("q135_decontaminate_bloom").build(spark, sf)
      val p = df.queryExecution.explainString(ExplainMode.fromString("formatted"))
      assert(p.contains("bloom_might_contain"),
        s"native bloom probe missing from the plan:\n$p")
      // the probe must run BELOW the confirmation join (scan side), not
      // above it — assert structurally: some broadcast join has the bloom
      // filter inside one of its input subtrees
      val exec = df.queryExecution.executedPlan
      val joins = exec.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec => j
      }
      assert(joins.nonEmpty, s"no broadcast confirmation join:\n$exec")
      val joinWithBloomInput = joins.exists(_.children.exists(c =>
        c.toString.contains("bloom_might_contain")))
      assert(joinWithBloomInput,
        s"bloom probe is not an INPUT to the confirmation join:\n$exec")
    } finally spark.conf.set(key, prev)
  }
}
