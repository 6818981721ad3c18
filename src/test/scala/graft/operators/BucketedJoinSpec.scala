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
}
