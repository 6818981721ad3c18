package graft.sources

import graft.SparkSpec

/** Pure-SQL user story: the N5 connector is reachable without any Scala —
  * `CREATE TABLE ... USING n5` registers a block table in the catalog, and
  * the GraftExtensions SQL functions work against it.
  */
class N5SqlDdlSpec extends SparkSpec {

  test("CREATE TABLE USING n5 exposes the fixture to pure SQL") {
    spark.sql("DROP TABLE IF EXISTS fixture_vol")
    spark.sql(
      """CREATE TABLE fixture_vol USING n5
        |OPTIONS (path '/root/reference/data/test.n5', dataset 'mri/c0/s0')""".stripMargin)
    try {
      val rows = spark.sql(
        """SELECT gx, gy, gz, size(data) AS n,
          |  aggregate(data, 0L, (a, x) -> a + x) AS checksum
          |FROM fixture_vol ORDER BY gx, gy, gz""".stripMargin).collect()
      assert(rows.length == 4)
      assert(rows.head.getInt(0) == 0 && rows.head.getLong(4) == 18077459L)
      // grid predicates still prune through the catalog table
      val one = spark.sql(
        "SELECT count(*) AS c FROM fixture_vol WHERE gx = 1 AND gy = 1")
        .collect()(0).getLong(0)
      assert(one == 1L)
    } finally spark.sql("DROP TABLE fixture_vol")
  }
}
