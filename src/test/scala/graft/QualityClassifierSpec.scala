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

  test("q162 calibration report partitions the corpus and exposes the underfit") {
    val dir = "/root/testdata/sf0.01"
    val rows = Queries.byName("q162_classifier_calibration")
      .build(spark, dir).collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val nDocs = spark.read.parquet(s"$dir/documents.parquet").count()
    assert(total == nDocs, s"bins must partition the corpus: $total vs $nDocs")
    rows.foreach { r =>
      val bin = r.getAs[Long]("bin")
      val m = r.getAs[Double]("mean_score")
      assert(bin >= 0 && bin <= 9)
      // mean score must lie in its own bin (bin 9 absorbs score 1.0)
      assert(m >= bin / 10.0 - 1e-9 && (bin == 9 || m < (bin + 1) / 10.0),
        s"mean score $m outside bin $bin")
      assert(r.getAs[Double]("gap") >= 0.0 && r.getAs[Double]("gap") <= 1.0)
    }
    // the documented r12 behavior: 3 GD steps SEPARATE (q142 accuracy
    // pin) but underfit toward 0.5 — calibration must surface that as a
    // large gap in the above-threshold bin rather than hide it
    val above = rows.filter(_.getAs[Long]("bin") >= 5)
    assert(above.nonEmpty, "some mass must clear the 0.5 threshold")
    assert(above.exists(_.getAs[Double]("gap") > 0.2),
      "underfit scores near 0.5 with pos_rate ~1 must show a real gap — " +
        "if this starts failing, training got sharper; update the doc")
  }
}
