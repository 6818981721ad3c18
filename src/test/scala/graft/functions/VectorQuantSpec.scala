package graft.functions

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.functions._

/** Int8 quantization invariants on the real embedding corpus: codes stay
  * in [-127, 127], per-element reconstruction error is bounded by half a
  * quantization step, and the zero vector round-trips without dividing by
  * zero.
  */
class VectorQuantSpec extends SparkSpec {

  test("codes bounded and MSE within (scale/2)^2 on real embeddings") {
    val df = Tables.load(spark, "/root/testdata/sf0.001", "embeddings")
      .withColumn("scale", VectorFunctions.int8Scale(col("embedding")))
      .withColumn("qv",
        VectorFunctions.quantizeInt8(col("embedding"), col("scale")))
      .select(col("vec_id"), col("scale"),
        array_min(col("qv")).as("qmin"), array_max(col("qv")).as("qmax"),
        VectorFunctions.dequantMse(col("embedding"), col("qv"), col("scale"))
          .as("mse"))
    val bad = df.filter(col("qmin") < -127 || col("qmax") > 127 ||
      col("mse") > col("scale") * col("scale") / 4.0 + lit(1e-12))
    assert(df.count() > 0)
    assert(bad.count() == 0, bad.limit(5).collect().mkString("; "))
  }

  test("int8 serving recall@10 >= 0.8 vs float search over 10 probes (r13)") {
    // the q154 contract: ranking over dequantized int8 codes must find
    // (nearly) the same neighbors as ranking over the raw floats — at
    // the (scale/2)^2 MSE bound above, order inversions are confined to
    // near-ties
    val e = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
      .withColumn("scale", VectorFunctions.int8Scale(col("embedding")))
    val deq = e
      .withColumn("qv",
        VectorFunctions.quantizeInt8(col("embedding"), col("scale")))
      .select(col("vec_id"),
        VectorFunctions.toDoubles(col("embedding")).as("fv"),
        transform(col("qv"), c => c * col("scale")).as("dv"))
      .cache()
    def top10(pid: Long, vcol: String): Seq[Long] = {
      val p = deq.filter(col("vec_id") === pid)
        .select(col(vcol).as("pv"))
      deq.filter(col("vec_id") =!= pid).crossJoin(broadcast(p))
        .select(col("vec_id"),
          round(VectorFunctions.cosine(col(vcol), col("pv")), 4).as("c"))
        .orderBy(col("c").desc, col("vec_id").asc).limit(10)
        .collect().map(_.getLong(0)).toSeq
    }
    val recalls = (0L until 10L).map { pid =>
      val f = top10(pid, "fv").toSet
      val q = top10(pid, "dv").toSet
      (f intersect q).size.toDouble / 10.0
    }
    deq.unpersist()
    val avg = recalls.sum / recalls.size
    info(f"int8 recall@10 = $avg%.2f over 10 probes")
    assert(avg >= 0.8, s"int8 ranking diverged from float: $recalls")
  }

  test("pq_adc_tables kernel == the declarative per-center l2sq towers (r19)") {
    val emb = Tables.load(spark, "/root/testdata/sf0.01", "embeddings")
      .select(col("vec_id"), col("embedding"))
    val cb = VectorSearch.trainPqCodebook(emb, subspaces = 8, k = 16,
      iters = 2)
    val w = cb.head.head.length
    def l2sqDecl(pv: org.apache.spark.sql.Column, b: Int, c: Seq[Double]) =
      round(aggregate(
        zip_with(slice(pv, b * w + 1, w), typedlit(c), (x, y) => (x - y) * (x - y)),
        lit(0.0), (acc, x) => acc + x), 4)
    val pv = VectorFunctions.toDoubles(col("embedding"))
    val rows = emb.limit(50).select(col("vec_id"),
        NativeExpressions.pqAdcTables(pv, cb).as("k"),
        array(cb.indices.map(b =>
          array(cb(b).map(c => l2sqDecl(pv, b, c)): _*)): _*).as("r"))
      .collect()
    val bad = rows.filter(r =>
      r.getSeq[Seq[Double]](1) != r.getSeq[Seq[Double]](2))
    assert(bad.isEmpty,
      s"${bad.length} probe rows diverged; first: ${bad.headOption}")
  }

  test("zero vector: scale 1.0, all-zero codes, zero error") {
    import spark.implicits._
    val df = Seq((1L, Array.fill(8)(0.0f))).toDF("vec_id", "embedding")
      .withColumn("scale", VectorFunctions.int8Scale(col("embedding")))
      .withColumn("qv",
        VectorFunctions.quantizeInt8(col("embedding"), col("scale")))
    val r = df.select(col("scale"), array_max(abs_codes(col("qv"))).as("mx"),
      VectorFunctions.dequantMse(col("embedding"), col("qv"), col("scale"))
        .as("mse")).head()
    assert(r.getDouble(0) == 1.0 && r.getInt(1) == 0 && r.getDouble(2) == 0.0)
  }

  private def abs_codes(qv: org.apache.spark.sql.Column) =
    transform(qv, x => abs(x))
}
