package graft

import org.apache.spark.sql.SparkSession
import org.scalatest.funsuite.AnyFunSuite

/** SQL-surface registration of the native expressions via
  * SparkSessionExtensions (own session — extensions bind at build time).
  */
class GraftExtensionsSpec extends AnyFunSuite {

  test("vector_dot / vector_l2_norm usable from pure SQL") {
    val spark = SparkSession.builder()
      .master("local[2]")
      .appName("graft-ext-test")
      .config("spark.ui.enabled", "false")
      .withExtensions(new GraftExtensions)
      .getOrCreate()
    try {
      val r = spark.sql(
        """SELECT
          |  vector_dot(CAST(array(1.0, 2.0, 3.0) AS ARRAY<FLOAT>),
          |             CAST(array(4.0, 5.0, 6.0) AS ARRAY<FLOAT>)) AS d,
          |  vector_l2_norm(CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS n
          |""".stripMargin).collect()(0)
      assert(r.getDouble(0) == 32.0)
      assert(r.getDouble(1) == 5.0)
    } finally spark.stop()
  }
}
