package graft

import org.apache.spark.sql.functions._

/** q142 — in-engine trained logistic-regression quality classifier.
  * The DuckDB oracle already pins bit-level reproducibility of the three
  * GD iterations; this spec pins that the training LEARNS: decision
  * accuracy against the weak labels clearly beats the majority class
  * (3 full-batch steps at lr 1 underfit by design — scores hug 0.5 —
  * but the ordering must already separate).
  */
class QualityClassifierSpec extends SparkSpec {

  test("classifier beats the majority class at the gate SF") {
    val out = Queries.byName("q142_quality_classifier")
      .build(spark, "/root/testdata/sf0.01")
      .select(col("keep"), col("label"))
      .collect()
    val n = out.length.toDouble
    val acc = out.count(r => r.getBoolean(0) == (r.getInt(1) == 1)) / n
    val majority = math.max(out.count(_.getInt(1) == 1) / n,
      out.count(_.getInt(1) == 0) / n)
    assert(acc >= 0.8, s"accuracy $acc — training failed to separate")
    assert(acc > majority + 0.2,
      s"accuracy $acc vs majority $majority — no better than constant")
  }
}
