package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.col

/** PCA spectrum of an embedding column (q196): population covariance via
  * ONE distributed pass into constant-size per-partition buffers
  * (d + d(d+1)/2 doubles — dimension-bounded, corpus-independent),
  * partials folded on the driver in FIXED partition order (bitwise-
  * deterministic under any scheduling), eigenvalues by cyclic Jacobi.
  * The spectral identity Σλ = tr(Σ) is the oracle's end-to-end check;
  * PcaSpec pins the full spectrum against numpy-derived constants.
  */
object Pca {

  /** (trace, eigenvalues sorted descending) of the population covariance
    * of `embeddings.embedding` (ARRAY<FLOAT> of dimension `d`).
    */
  def spectrum(embeddings: DataFrame, d: Int): (Double, Seq[Double]) = {
    val spark = embeddings.sparkSession
    import spark.implicits._
    val tri = d * (d + 1) / 2
    val parts = embeddings
      .select(col("embedding")).as[Array[Float]]
      .rdd.mapPartitionsWithIndex { (pid, it) =>
        val sums = new Array[Double](d)
        val prods = new Array[Double](tri)
        var n = 0L
        it.foreach { v =>
          n += 1
          var i = 0
          while (i < d) {
            val xi = v(i).toDouble
            sums(i) += xi
            var j = 0
            while (j <= i) {
              prods(i * (i + 1) / 2 + j) += xi * v(j).toDouble
              j += 1
            }
            i += 1
          }
        }
        Iterator.single((pid, n, sums, prods))
      }.collect().sortBy(_._1)
    val n = parts.map(_._2).sum
    val sums = new Array[Double](d)
    val prods = new Array[Double](tri)
    parts.foreach { case (_, _, ps, pp) =>
      var i = 0
      while (i < d) { sums(i) += ps(i); i += 1 }
      i = 0
      while (i < tri) { prods(i) += pp(i); i += 1 }
    }
    val a = Array.ofDim[Double](d, d)
    for (i <- 0 until d; j <- 0 to i) {
      val c = prods(i * (i + 1) / 2 + j) / n - (sums(i) / n) * (sums(j) / n)
      a(i)(j) = c; a(j)(i) = c
    }
    val trace = (0 until d).map(i => a(i)(i)).sum
    var sweep = 0
    var off = Double.MaxValue
    while (off > 1e-12 && sweep < 100) {
      off = 0.0
      for (p <- 0 until d; q <- p + 1 until d) {
        off = math.max(off, math.abs(a(p)(q)))
        if (math.abs(a(p)(q)) > 1e-14) {
          val theta = (a(q)(q) - a(p)(p)) / (2.0 * a(p)(q))
          // sign(0) must be +1: equal diagonal entries (theta = 0) need the
          // full 45-degree rotation, not the signum(0)=0 no-op.
          val sign = if (theta >= 0.0) 1.0 else -1.0
          val t = sign /
            (math.abs(theta) + math.sqrt(theta * theta + 1.0))
          val c = 1.0 / math.sqrt(t * t + 1.0)
          val sn = t * c
          for (k <- 0 until d) {
            val akp = a(k)(p); val akq = a(k)(q)
            a(k)(p) = c * akp - sn * akq
            a(k)(q) = sn * akp + c * akq
          }
          for (k <- 0 until d) {
            val apk = a(p)(k); val aqk = a(q)(k)
            a(p)(k) = c * apk - sn * aqk
            a(q)(k) = sn * apk + c * aqk
          }
        }
      }
      sweep += 1
    }
    (trace, (0 until d).map(i => a(i)(i)).sorted.reverse)
  }
}
