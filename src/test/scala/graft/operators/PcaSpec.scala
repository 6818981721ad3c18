package graft.operators

import graft.{SparkSpec, Tables}

/** The Jacobi eigensolver must reproduce numpy's spectrum — constants
  * derived OUTSIDE the engine (numpy.linalg.eigvalsh over the population
  * covariance of the sf0.01 embeddings) — and be exact on a closed-form
  * matrix.
  */
class PcaSpec extends SparkSpec {

  test("sf0.01 spectrum matches numpy-derived constants (top-5 e6, " +
      "trace e6, explained share)") {
    val (trace, eig) = Pca.spectrum(
      Tables.load(spark, "/root/testdata/sf0.01", "embeddings"), 64)
    def e6(x: Double) = math.floor(1e6 * x + 0.5).toLong
    assert(e6(trace) == 997603L, s"trace ${e6(trace)}")
    assert(eig.take(5).map(e6) == Seq(27513L, 27167L, 26618L, 25589L, 25365L),
      s"top-5 ${eig.take(5).map(e6)}")
    val explained5 = math.floor(1e4 * eig.take(5).sum / trace + 0.5).toLong
    assert(explained5 == 1326L, s"explained $explained5")
    // spectral identity at much tighter precision than the oracle's e6
    assert(math.abs(eig.sum - trace) < 1e-9)
    assert(eig.forall(_ >= -1e-9), "covariance must be PSD")
  }

  test("Jacobi is exact on a closed-form 2x2 block matrix") {
    // embed [[2,1],[1,2]] (eigenvalues 3, 1) in a 64-dim identity-like
    // covariance via synthetic vectors is overkill — test the solver
    // path through spectrum() with vectors crafted to a known covariance:
    // x = (±1, ±1, 0, ...) with perfect correlation between dims 0 and 1
    // gives cov = [[1,1],[1,1]] ⊕ 0: eigenvalues (2, 1*0 ... ) = [2, 0...]
    import spark.implicits._
    val vecs = Seq(
      Array(1f, 1f) ++ Array.fill(62)(0f),
      Array(-1f, -1f) ++ Array.fill(62)(0f))
    val df = vecs.map(v => Tuple1(v)).toDF("embedding")
    val (trace, eig) = Pca.spectrum(df, 64)
    assert(math.abs(trace - 2.0) < 1e-12)
    assert(math.abs(eig.head - 2.0) < 1e-10, s"lead eigenvalue ${eig.head}")
    assert(eig.tail.forall(e => math.abs(e) < 1e-10))
  }
}
