package graft.functions

import graft.functions.{NativeExpressions => NE}
import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Approximate-nearest-neighbour search over an embedding column.
  *
  * Brute force is the exactness baseline (one pass, TakeOrdered top-k).
  * The scale path is sign-random-projection LSH: nPlanes deterministic
  * hyperplanes give 2^nPlanes buckets; a probe only scans its own bucket
  * plus the nPlanes buckets at Hamming distance 1 (multi-probe), so the
  * candidate set is ~n·(nPlanes+1)/2^nPlanes instead of n. All hyperplane
  * signs derive from xxhash64(plane*dim + i) — no stored model, any
  * executor recomputes them, and bucket assignment is a narrow expression.
  */
object VectorSearch {

  /** Sign-projection bucket id for an ARRAY<FLOAT> column. */
  def signBucket(vec: Column, nPlanes: Int, dim: Int): Column = {
    def planeSum(j: Int): Column =
      aggregate(
        zip_with(vec, sequence(lit(0), lit(dim - 1)), (x, i) =>
          x.cast("double") * when(
            xxhash64((lit(j * dim) + i).cast("long"))
              .bitwiseAND(lit(1L)) === 0L, lit(1.0)).otherwise(lit(-1.0))),
        lit(0.0), (acc, x) => acc + x)
    (0 until nPlanes)
      .map(j => when(planeSum(j) > 0, lit(1 << j)).otherwise(lit(0)))
      .reduce((a, b) => a + b)
  }

  /** Exact top-k neighbours per probe (excluding self). */
  def bruteForceTopK(emb: DataFrame, probes: DataFrame, k: Int): DataFrame = {
    val p = broadcast(probes
      .select(col("vec_id").as("pid"), col("embedding").as("pv")))
    val w = Window.partitionBy(col("pid"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    emb.join(p, col("vec_id") =!= col("pid"))
      .select(col("pid"), col("vec_id"),
        round(NE.vectorCosine(col("embedding"), col("pv")), 4).as("cosine"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("pid"), col("rnk"), col("vec_id"), col("cosine"))
  }

  /** LSH top-k: candidates limited to the probe's bucket and its
    * Hamming-1 neighbours. Returns the same schema as bruteForceTopK.
    */
  def lshTopK(
      emb: DataFrame, probes: DataFrame, k: Int,
      nPlanes: Int = 6, dim: Int = 64): DataFrame = {
    val bucketed = emb
      .withColumn("bucket", signBucket(col("embedding"), nPlanes, dim))
    // probe-side: explode own bucket + all hamming-1 buckets
    val probeSet = (0 to nPlanes).map { j =>
      if (j == nPlanes) col("bucket")
      else col("bucket").bitwiseXOR(lit(1 << j))
    }
    val p = broadcast(probes
      .withColumn("bucket", signBucket(col("embedding"), nPlanes, dim))
      .select(col("vec_id").as("pid"), col("embedding").as("pv"),
        explode(array(probeSet: _*)).as("bucket")))
    val w = Window.partitionBy(col("pid"))
      .orderBy(col("cosine").desc, col("vec_id").asc)
    bucketed.join(p, Seq("bucket"))
      .filter(col("vec_id") =!= col("pid"))
      .select(col("pid"), col("vec_id"),
        round(NE.vectorCosine(col("embedding"), col("pv")), 4).as("cosine"))
      .withColumn("rnk", row_number().over(w))
      .filter(col("rnk") <= k)
      .select(col("pid"), col("rnk"), col("vec_id"), col("cosine"))
  }
}
