package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** LSH ANN quality: recall of the bucketed search against brute force on
  * the sf0.01 embeddings, and candidate-set shrinkage (the point of LSH).
  */
class VectorSearchSpec extends SparkSpec {

  private lazy val emb =
    spark.read.parquet("/root/testdata/sf0.01/embeddings.parquet")
      .select(col("vec_id"), col("embedding"))

  private lazy val probes = emb.filter(col("vec_id") < 10)

  test("native VectorDotF/L2Norm agree with the higher-order-function path") {
    import graft.functions.{NativeExpressions => NE, VectorFunctions => VF}
    val two = emb.limit(50)
      .select(col("vec_id"), col("embedding"),
        VF.toDoubles(col("embedding")).as("vd"))
    val cmp = two.select(
      abs(NE.vectorL2Norm(col("embedding")) - VF.l2norm(col("vd"))).as("dn"),
      abs(NE.vectorDot(col("embedding"), col("embedding"))
        - VF.dot(col("vd"), col("vd"))).as("dd"))
      .agg(max(col("dn")), max(col("dd"))).collect()(0)
    assert(cmp.getDouble(0) == 0.0, "norms must agree bit-for-bit")
    assert(cmp.getDouble(1) == 0.0, "dots must agree bit-for-bit")
  }

  test("lsh buckets are deterministic and cover the corpus") {
    val b1 = emb.withColumn("b",
      VectorSearch.signBucket(col("embedding"), 6, 64))
      .select("vec_id", "b").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val b2 = emb.withColumn("b",
      VectorSearch.signBucket(col("embedding"), 6, 64))
      .select("vec_id", "b").collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(b1 == b2)
    assert(b1.values.forall(b => b >= 0 && b < 64))
    assert(b1.values.toSet.size > 8, "buckets should spread")
  }

  test("lsh top-10 recall vs brute force, with bounded candidate sets") {
    val k = 10
    val brute = VectorSearch.bruteForceTopK(emb, probes, k)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val lsh = VectorSearch.lshTopK(emb, probes, k, nPlanes = 6, dim = 64)
      .collect().groupBy(_.getLong(0))
      .view.mapValues(_.map(_.getLong(2)).toSet).toMap
    val recalls = brute.keys.toSeq.map { pid =>
      val got = lsh.getOrElse(pid, Set.empty)
      got.intersect(brute(pid)).size.toDouble / k
    }
    val avgRecall = recalls.sum / recalls.size
    info(f"avg recall@10 = $avgRecall%.2f over ${recalls.size} probes")
    assert(avgRecall >= 0.25,
      f"avg recall $avgRecall%.2f too low for hamming-1 multiprobe")

    // efficiency: candidates scanned per probe must be a small fraction
    val bucketed = emb.withColumn("bucket",
      VectorSearch.signBucket(col("embedding"), 6, 64))
    val sizes = bucketed.groupBy("bucket").count().collect()
      .map(r => r.getInt(0) -> r.getLong(1)).toMap
    val probeBuckets = probes.withColumn("bucket",
      VectorSearch.signBucket(col("embedding"), 6, 64))
      .select("bucket").collect().map(_.getInt(0))
    val total = emb.count().toDouble
    val masks = VectorSearch.probeMasks(6, 2)
    val avgCand = probeBuckets.map { b =>
      masks.map(m => sizes.getOrElse(b ^ m, 0L)).sum
    }.sum.toDouble / probeBuckets.length
    info(f"avg candidates = $avgCand%.0f of $total%.0f (${avgCand / total * 100}%.1f%%)")
    assert(avgCand / total < 0.5, "LSH must scan well under half the corpus")
  }
}
