package graft

/** SQL-surface registration of the native expressions — exercised via the
  * runtime registration path on the shared session (the builder-time
  * extensions path uses the same function builders).
  */
class GraftExtensionsSpec extends SparkSpec {

  test("vector_dot / vector_l2_norm usable from pure SQL") {
    GraftExtensions.registerOn(spark)
    val r = spark.sql(
      """SELECT
        |  vector_dot(CAST(array(1.0, 2.0, 3.0) AS ARRAY<FLOAT>),
        |             CAST(array(4.0, 5.0, 6.0) AS ARRAY<FLOAT>)) AS d,
        |  vector_l2_norm(CAST(array(3.0, 4.0) AS ARRAY<FLOAT>)) AS n
        |""".stripMargin).collect()(0)
    assert(r.getDouble(0) == 32.0)
    assert(r.getDouble(1) == 5.0)
  }
}
