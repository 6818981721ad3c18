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
