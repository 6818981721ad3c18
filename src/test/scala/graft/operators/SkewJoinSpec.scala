package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Salted skew join must be a pure physical rewrite: bit-identical results
  * to the plain join for every salt count and probe-preserving join type,
  * while the physical plan actually joins on (key, salt).
  */
class SkewJoinSpec extends SparkSpec {

  private def canon(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet.ensuring(_ != null)

  private lazy val probe = Tables.load(spark, "/root/testdata/sf0.001", "events")
    .select(col("user_id").as("k"), col("value"))
  private lazy val build = Tables.load(spark, "/root/testdata/sf0.001", "customer")
    .select(col("c_custkey").as("k"), col("c_nationkey"))

  test("salted inner join equals plain join for several salt counts") {
    val plain = canon(probe.join(build, Seq("k"), "inner"))
    assert(plain.nonEmpty)
    for (salts <- Seq(1, 3, 8))
      assert(canon(SkewJoin.salted(probe, build, Seq("k"), salts)) == plain,
        s"salts=$salts diverges from the plain join")
  }

  test("salted left join preserves unmatched probe rows, null keys too") {
    import spark.implicits._
    val rng = new scala.util.Random(11)
    // one hot key with most rows, some unmatched keys, some null keys
    val p = (1 to 5000).map(i =>
      (if (i % 50 == 0) Option.empty[Long]
       else if (i % 10 < 8) Some(7L)
       else Some(rng.nextInt(30).toLong), i.toLong))
      .toDF("k", "row_id")
    val b = (0 until 20).map(k => (k.toLong, s"dim_$k")).toDF("k", "attr")
    val plain = canon(p.join(b, Seq("k"), "left"))
    val salted = canon(SkewJoin.salted(p, b, Seq("k"), 6, "left"))
    assert(salted == plain)
    // null keys survive on the probe side exactly once
    assert(plain.count(_.startsWith("null|")) == 100)
  }

  test("physical plan joins on (key, salt) — hot key spread over shuffle keys") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val df = SkewJoin.salted(probe, build, Seq("k"), 8)
      df.count() // materialize so AQE finalizes the physical plan
      val lines = df.queryExecution.executedPlan.toString.split('\n')
      val join = lines.filter(l =>
        l.contains("SortMergeJoin") || l.contains("ShuffledHashJoin"))
      assert(join.nonEmpty, "expected a shuffled join with broadcast disabled")
      assert(join.exists(_.contains("__salt")),
        s"join keys lack the salt: ${join.mkString("; ")}")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("guards: bad salts, non-probe-preserving type, scratch clash") {
    intercept[IllegalArgumentException](
      SkewJoin.salted(probe, build, Seq("k"), 0))
    intercept[IllegalArgumentException](
      SkewJoin.salted(probe, build, Seq("k"), 4, "full_outer"))
    intercept[IllegalArgumentException](
      SkewJoin.salted(probe.withColumn("__salt", lit(1)), build, Seq("k"), 4))
  }
}
