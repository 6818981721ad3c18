package graft
import org.apache.spark.sql.SparkSession
object ExplainSimple {
  def main(args: Array[String]): Unit = {
    val spark = SparkSession.builder().master("local[4]")
      .config("spark.sql.shuffle.partitions","4")
      .config("spark.sql.session.timeZone","UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong","true")
      .config("spark.ui.enabled","false").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")
    args.foreach { n => println(s"===== $n ====="); Queries.byName(n).build(spark, "/root/testdata/sf0.01").explain() }
    spark.stop()
  }
}
