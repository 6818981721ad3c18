package graft.operators

import graft.SparkSpec

/** The normal-equations solve must (1) recover an exactly-linear system to
  * FP precision with R² = 1, (2) reproduce numpy's lstsq fit on the real
  * sf0.01 feature table (constants derived outside the engine), and
  * (3) fail loudly on singular designs instead of emitting garbage.
  */
class OlsSpec extends SparkSpec {

  test("recovers an exact linear relation with R^2 = 1") {
    import spark.implicits._
    val rows = for (i <- 1 to 200) yield {
      val x1 = (i % 17).toDouble
      val x2 = (i % 5).toDouble * 0.5
      val x3 = ((i * 7) % 11).toDouble - 5.0
      (2.0 * x1 - 3.0 * x2 + 0.5 * x3 + 7.0, x1, x2, x3)
    }
    val fit = Ols.fit(rows.toDF("y", "x1", "x2", "x3"),
      "y", Seq("x1", "x2", "x3"))
    assert(fit.n == 200)
    assert(math.abs(fit.betas(0) - 2.0) < 1e-9, s"b1 ${fit.betas(0)}")
    assert(math.abs(fit.betas(1) + 3.0) < 1e-9, s"b2 ${fit.betas(1)}")
    assert(math.abs(fit.betas(2) - 0.5) < 1e-9, s"b3 ${fit.betas(2)}")
    assert(math.abs(fit.intercept - 7.0) < 1e-9)
    assert(math.abs(fit.r2 - 1.0) < 1e-9)
  }

  test("matches numpy lstsq on the sf0.01 q197 feature table") {
    // constants from numpy.linalg over the identical feature definitions
    // (tokens/100 ~ chars/1000 + chars-per-token + type-token ratio)
    import org.apache.spark.sql.functions._
    import graft.functions.{TextFunctions => TF}
    val toks = TF.tokens(col("text"))
    val nTok = size(toks).cast("double")
    val feats = graft.Tables
      .load(spark, "/root/testdata/sf0.01", "documents")
      .select((nTok / 100.0).as("y"),
        (col("n_chars").cast("double") / 1000.0).as("x1"),
        (col("n_chars").cast("double") / nTok).as("x2"),
        (size(array_distinct(toks)).cast("double") / nTok).as("x3"))
    val fit = Ols.fit(feats, "y", Seq("x1", "x2", "x3"))
    def e4(x: Double) = math.floor(1e4 * x + 0.5).toLong
    assert(fit.n == 500)
    assert(fit.betas.map(e4) == Seq(17964L, -691L, -231L),
      s"betas ${fit.betas.map(e4)}")
    assert(e4(fit.intercept) == 3980L, s"icpt ${e4(fit.intercept)}")
    assert(e4(fit.r2) == 9987L, s"r2 ${e4(fit.r2)}")
  }

  test("singular design fails loudly") {
    import spark.implicits._
    // x2 is constant -> zero variance -> normal equations singular
    val df = (1 to 50).map(i => (i.toDouble, i.toDouble, 3.0))
      .toDF("y", "x1", "x2")
    val e = intercept[IllegalArgumentException] {
      Ols.fit(df, "y", Seq("x1", "x2"))
    }
    assert(e.getMessage.contains("singular"))
  }
}
