package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions._

/** Co-located bucketed join: two tables written with Layout.writeBucketed
  * on the same key and bucket count must (a) join with ZERO shuffle
  * exchanges in the physical plan and (b) produce exactly the plain-join
  * result. This pins the 100 TB layout story: the ingest-time bucket
  * shuffle is paid once, every downstream join on the key is narrow.
  */
class BucketedJoinSpec extends SparkSpec {

  private val db = "bucketspec"

  private def canon(df: DataFrame): Set[String] =
    df.collect().map(_.mkString("|")).toSet

  test("bucketed orders⨝lineitem plans with no exchange and matches plain join") {
    val dir = "/root/testdata/sf0.001"
    val orders = Tables.load(spark, dir, "orders")
      .select(col("o_orderkey"), col("o_orderdate"), col("o_totalprice"))
    val lineitem = Tables.load(spark, dir, "lineitem")
      .select(col("l_orderkey"), col("l_quantity"), col("l_extendedprice"))
    val loc = java.nio.file.Files.createTempDirectory("bucketspec").toString
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    spark.sql(s"CREATE DATABASE $db LOCATION '$loc'")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Layout.writeBucketed(orders, s"$db.b_orders", "o_orderkey", 8,
        Seq("o_orderkey"))
      Layout.writeBucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        s"$db.b_lineitem", "o_orderkey", 8, Seq("o_orderkey"))
      val joined = spark.table(s"$db.b_orders")
        .join(spark.table(s"$db.b_lineitem"), Seq("o_orderkey"))
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"bucketed join still shuffles: ${exchanges.mkString("; ")}")
      val plain = canon(orders.join(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        Seq("o_orderkey")))
      assert(plain.nonEmpty)
      assert(canon(joined) == plain)
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }

  test("bucketed digest-store anti-join (q99 shape) plans with no exchange") {
    import spark.implicits._
    val docs = Seq(
      (0L, "alpha"), (1L, "alpha"), (2L, "beta"), (3L, "gamma"),
      (4L, "delta"), (5L, "delta"), (6L, "eps"), (7L, "zeta"))
      .toDF("doc_id", "text")
      .withColumn("digest", sha2(col("text"), 256))
    val loc = java.nio.file.Files.createTempDirectory("bucketspec2").toString
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    spark.sql(s"CREATE DATABASE $db LOCATION '$loc'")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Layout.writeBucketed(
        docs.filter(col("doc_id") % 2 === 0).select(col("digest")).distinct(),
        s"$db.hist", "digest", 4, Seq("digest"))
      Layout.writeBucketed(
        docs.filter(col("doc_id") % 2 === 1).select(col("doc_id"), col("digest")),
        s"$db.incoming", "digest", 4, Seq("digest"))
      val fresh = spark.table(s"$db.incoming")
        .join(spark.table(s"$db.hist"), Seq("digest"), "left_anti")
      val exchanges = fresh.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"bucketed anti-join still shuffles: ${exchanges.mkString("; ")}")
      // doc 1 duplicates history's "alpha", doc 5 duplicates "delta"
      assert(fresh.select(col("doc_id")).collect().map(_.getLong(0)).sorted
        .toSeq == Seq(3L, 7L))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }

  test("bucketed band-store left join (q189 shape) plans with no exchange " +
      "before the per-doc aggregate") {
    import spark.implicits._
    // history band keys vs incoming band keys — the minhash-store join:
    // both sides bucketed by the band key, so the join itself must not
    // shuffle; only the per-doc rollup afterwards exchanges (delta-sized)
    val hist = Seq(("k1", 10L), ("k2", 11L), ("k3", 12L))
      .toDF("bk", "hist_id")
    val inc = Seq((100L, "k1"), (100L, "k9"), (101L, "k8"), (102L, "k2"))
      .toDF("doc_id", "bk")
    val loc = java.nio.file.Files.createTempDirectory("bucketspec3").toString
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    spark.sql(s"CREATE DATABASE $db LOCATION '$loc'")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      Layout.writeBucketed(hist, s"$db.hist_bands", "bk", 4, Seq("bk"))
      Layout.writeBucketed(inc, s"$db.inc_bands", "bk", 4, Seq("bk"))
      val joined = spark.table(s"$db.inc_bands")
        .join(spark.table(s"$db.hist_bands"), Seq("bk"), "left")
      val exchanges = joined.queryExecution.executedPlan.collect {
        case e: ShuffleExchangeExec => e
      }
      assert(exchanges.isEmpty,
        s"bucketed band join still shuffles: ${exchanges.mkString("; ")}")
      val got = joined.groupBy(col("doc_id"))
        .agg(countDistinct(col("hist_id")).as("n"))
        .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
      assert(got == Map(100L -> 1L, 101L -> 0L, 102L -> 1L))
    } finally {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
      spark.sql(s"DROP DATABASE IF EXISTS $db CASCADE")
    }
  }
}
