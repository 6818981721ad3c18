package graft.sources.n5

import java.nio.file.Files

import graft.SparkSpec
import graft.n5.{Compression, DatasetAttributes, Dtype, N5}
import org.apache.spark.sql.functions._

/** The columnar element scan must produce exactly the rows of the lazy
  * posexplode view for EVERY dtype — one branch per primitive fill in
  * N5ElementsReader, so each needs a pin (uint8/float32 are also covered
  * end-to-end by RoundTripSpec/RegroupSpec; this sweep adds the rest).
  */
class ElementScanSpec extends SparkSpec {

  private val dims = Array(12L, 10L, 6L)

  private def volume(dtype: Dtype): (String, String) = {
    val root = Files.createTempDirectory("elemscan").toString + "/t.n5"
    val ds = "vol/s0"
    val attrs = DatasetAttributes(dims, Array(5, 4, 3), dtype, Compression("gzip"))
    val elemT = N5Schema.elementType(dtype)
    val elems = spark.range(dims.product)
      .select((col("id") % dims(0)).as("x"),
        ((col("id") / dims(0)) % dims(1)).cast("long").as("y"),
        (col("id") / (dims(0) * dims(1))).cast("long").as("z"))
      .select(col("x"), col("y"), col("z"),
        ((col("x") * 3 + col("y") * 5 + col("z") * 7) % 97).cast(elemT).as("v"))
    N5.write(N5.blocksFromElements(elems, attrs, elemT), root, ds, attrs)
    (root, ds)
  }

  for (dtype <- Seq(Dtype.UInt8, Dtype.Int8, Dtype.UInt16, Dtype.Int16,
      Dtype.UInt32, Dtype.Int32, Dtype.Int64, Dtype.Float32, Dtype.Float64)) {
    test(s"columnar element scan equals the lazy view for ${dtype.name}") {
      val (root, ds) = volume(dtype)
      def canon(df: org.apache.spark.sql.DataFrame): Seq[String] =
        df.orderBy(col("z"), col("y"), col("x"))
          .collect().map(_.mkString("|")).toSeq
      val columnar = canon(N5.elementsScan(spark, root, ds))
      val lazyView = canon(N5.elements(N5.read(spark, root, ds)))
      assert(columnar.size == dims.product)
      assert(columnar == lazyView, s"${dtype.name} columnar/lazy divergence")
    }
  }
}
