package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Multi-feature ordinary least squares by the normal equations (q197):
  * the closed-form regression a data pipeline runs for quality-signal
  * calibration and drift diagnostics, where p is a handful of columns and
  * n is the corpus.
  *
  * Plan shape: ONE map-side-combined HashAggregate computes every needed
  * moment — count, means, the p×p feature covariance (upper triangle),
  * the p feature/target covariances, and var(y) — via Spark's built-in
  * `covar_pop`/`var_pop` (DeclarativeAggregate: codegen'd, Welford-merge
  * numerically stable, O(p²) state per partition regardless of n). The
  * p×p solve runs on the driver (metadata-cheap, the q194/q196
  * discipline) by Gaussian elimination with partial pivoting.
  *
  * Result: (n, β (aligned with `features`), intercept, R²) where
  * intercept = ȳ − β·x̄ and R² = β·cov(x,y)/var(y) — the population
  * explained-variance identity for a with-intercept fit.
  */
object Ols {

  final case class Fit(n: Long, betas: Seq[Double], intercept: Double,
      r2: Double)

  /** Fit `target ~ features` over `df`. Column expressions must already
    * be numeric (cast upstream); rows are assumed non-null by contract
    * (the declared pipelines compute features from non-null text).
    */
  def fit(df: DataFrame, target: String, features: Seq[String]): Fit = {
    val p = features.length
    require(p >= 1, "need at least one feature")
    val aggs =
      Seq(count(lit(1)).as("n"), avg(col(target)).as("my"),
        var_pop(col(target)).as("vy")) ++
      features.map(f => avg(col(f)).as(s"m_$f")) ++
      (for (i <- 0 until p; j <- i until p) yield
        covar_pop(col(features(i)), col(features(j))).as(s"s_${i}_$j")) ++
      features.zipWithIndex.map { case (f, i) =>
        covar_pop(col(f), col(target)).as(s"c_$i")
      }
    val row = df.agg(aggs.head, aggs.tail: _*).head()
    val n = row.getAs[Long]("n")
    val my = row.getAs[Double]("my")
    val vy = row.getAs[Double]("vy")
    val means = features.map(f => row.getAs[Double](s"m_$f"))
    val s = Array.ofDim[Double](p, p)
    for (i <- 0 until p; j <- i until p) {
      val v = row.getAs[Double](s"s_${i}_$j")
      s(i)(j) = v; s(j)(i) = v
    }
    val c = Array.tabulate(p)(i => row.getAs[Double](s"c_$i"))

    // Gaussian elimination with partial pivoting on [S | c].
    val a = Array.tabulate(p, p + 1)((i, j) => if (j < p) s(i)(j) else c(i))
    for (k <- 0 until p) {
      val piv = (k until p).maxBy(i => math.abs(a(i)(k)))
      require(math.abs(a(piv)(k)) > 1e-12 * math.max(1.0, s(k)(k)),
        s"singular normal equations at column $k")
      val tmp = a(k); a(k) = a(piv); a(piv) = tmp
      for (i <- k + 1 until p) {
        val f = a(i)(k) / a(k)(k)
        for (j <- k to p) a(i)(j) -= f * a(k)(j)
      }
    }
    val beta = new Array[Double](p)
    for (i <- p - 1 to 0 by -1) {
      var acc = a(i)(p)
      for (j <- i + 1 until p) acc -= a(i)(j) * beta(j)
      beta(i) = acc / a(i)(i)
    }
    val intercept = my - beta.indices.map(i => beta(i) * means(i)).sum
    val r2 = beta.indices.map(i => beta(i) * c(i)).sum / vy
    Fit(n, beta.toSeq, intercept, r2)
  }
}
