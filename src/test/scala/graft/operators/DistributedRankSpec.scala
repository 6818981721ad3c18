package graft.operators

import graft.{SparkSpec, Tables}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** DistributedRank must equal Spark's own window functions exactly —
  * including tie runs that span range-partition boundaries — while
  * running at range parallelism instead of #distinct-window-keys.
  */
class DistributedRankSpec extends SparkSpec {

  private val sfDir = "/root/testdata/sf0.01"

  private def orders = Tables.load(spark, sfDir, "orders")
    .select(col("o_orderkey"), col("o_orderstatus"), col("o_totalprice"),
      col("o_orderdate"))

  private def assertMatchesWindow(
      orderCols: Seq[(String, Boolean)], numPartitions: Int): Unit = {
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(orderCols.map { case (c, asc) =>
        if (asc) col(c).asc else col(c).desc }: _*)
    val expected = orders.select(col("o_orderkey"),
        row_number().over(w).as("rn"), rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"),
        percent_rank().over(w).as("prnk"), cume_dist().over(w).as("cd"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    val got = DistributedRank.withRanks(orders, Seq("o_orderstatus"),
        orderCols, numPartitions = numPartitions)
      .select(col("o_orderkey"), col("rn"), col("rnk"), col("drnk"),
        col("prnk"), col("cd"))
      .collect()
      .map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getInt(3), r.getDouble(4), r.getDouble(5)))
      .toMap
    assert(got.size == expected.size, s"${got.size} vs ${expected.size} rows")
    val bad = expected.collect {
      case (k, e) if {
        val g = got(k)
        // rn is only defined up to tie permutation when the order is not
        // total; compare it only when ranks are tie-free (rnk == rn)
        g._2 != e._2 || g._3 != e._3 || g._4 != e._4 || g._5 != e._5
      } => k -> (expected(k), got(k))
    }
    assert(bad.isEmpty, s"${bad.size} rows diverge, e.g. ${bad.take(3)}")
  }

  test("tied order column (o_orderdate): ranks equal Spark windows " +
      "across partition-boundary tie runs") {
    // 13 range partitions over ~1.5k rows × 3 statuses guarantees both
    // group splits and tie runs crossing partition boundaries
    assertMatchesWindow(Seq(("o_orderdate", true)), numPartitions = 13)
  }

  test("total order (price desc, key asc): rn == rnk everywhere and both " +
      "equal Spark windows") {
    val out = DistributedRank.withRanks(orders, Seq("o_orderstatus"),
      Seq(("o_totalprice", false), ("o_orderkey", true)), numPartitions = 7)
    assert(out.filter(col("rn") =!= col("rnk")).count() == 0,
      "a total order admits no rank ties")
    assertMatchesWindow(
      Seq(("o_totalprice", false), ("o_orderkey", true)), numPartitions = 7)
  }

  test("parallelism: computation runs at range width, not #window-keys") {
    val out = DistributedRank.withRanks(orders, Seq("o_orderstatus"),
      Seq(("o_orderdate", true)), numPartitions = 13)
    val statuses = orders.select(col("o_orderstatus")).distinct().count()
    assert(out.rdd.getNumPartitions > statuses,
      s"ranks computed in ${out.rdd.getNumPartitions} partitions — must " +
        s"exceed the $statuses window keys a hash-window would collapse to")
  }

  test("null order values rank identically to Spark windows (r13)") {
    // nulls sort first under the default asc ordering and tie with each
    // other; the boundary-stat merge must treat them like any other run
    import spark.implicits._
    val df = Seq(
      (1L, "A", null.asInstanceOf[java.lang.Double]),
      (2L, "A", null.asInstanceOf[java.lang.Double]),
      (3L, "A", java.lang.Double.valueOf(1.0)),
      (4L, "A", java.lang.Double.valueOf(1.0)),
      (5L, "A", java.lang.Double.valueOf(2.0)),
      (6L, "B", null.asInstanceOf[java.lang.Double]),
      (7L, "B", java.lang.Double.valueOf(3.0))
    ).toDF("id", "k", "v")
    val w = Window.partitionBy(col("k")).orderBy(col("v").asc)
    val expected = df.select(col("id"), rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"), cume_dist().over(w).as("cd"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap
    val got = DistributedRank.withRanks(df, Seq("k"), Seq(("v", true)),
        numPartitions = 3)
      .select(col("id"), col("rnk"), col("drnk"), col("cd"))
      .collect().map(r => r.getLong(0) ->
        (r.getInt(1), r.getInt(2), r.getDouble(3))).toMap
    assert(got == expected, s"nulls diverged: $got vs $expected")
  }

  test("global order (empty partCols) equals a partition-less window — " +
      "the q181 curriculum shape") {
    // the global-sample-order use case: NO window key at all. Spark's own
    // partition-less window collapses to one reducer; DistributedRank must
    // produce the identical numbers at range parallelism.
    val w = Window.orderBy(col("o_orderdate").asc, col("o_orderkey").asc)
    val expected = orders.select(col("o_orderkey"),
        row_number().over(w).as("rn"), rank().over(w).as("rnk"),
        dense_rank().over(w).as("drnk"))
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3)))
      .toMap
    val got = DistributedRank.withRanks(orders, Seq(),
        Seq(("o_orderdate", true), ("o_orderkey", true)), numPartitions = 11)
      .select(col("o_orderkey"), col("rn"), col("rnk"), col("drnk"))
      .collect()
      .map(r => r.getLong(0) -> (r.getInt(1), r.getInt(2), r.getInt(3)))
      .toMap
    assert(got.size == expected.size)
    val bad = expected.filter { case (k, e) => got(k) != e }
    assert(bad.isEmpty, s"${bad.size} rows diverge, e.g. ${bad.take(3)}")
  }

  test("ntile equals Spark's ntile (r14): uneven buckets and n < k") {
    // q61's shape: total order (price desc, key asc) so ntile is
    // well-defined; group sizes are not multiples of 4, exercising the
    // first-(n mod k)-buckets-one-larger rule
    val w = Window.partitionBy(col("o_orderstatus"))
      .orderBy(col("o_totalprice").desc, col("o_orderkey").asc)
    val expected = orders.select(col("o_orderkey"), ntile(4).over(w).as("nt"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val got = DistributedRank.withRanks(orders, Seq("o_orderstatus"),
        Seq(("o_totalprice", false), ("o_orderkey", true)),
        numPartitions = 7, ntileBuckets = Some(4))
      .select(col("o_orderkey"), col("nt"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(got.size == expected.size)
    val bad = expected.filter { case (k, e) => got(k) != e }
    assert(bad.isEmpty, s"${bad.size} ntiles diverge, e.g. ${bad.take(3)}")
    // fewer rows than buckets: each row its own bucket (Spark semantics)
    import spark.implicits._
    val tiny = Seq((1L, "A", 5.0), (2L, "A", 3.0)).toDF("id", "k", "v")
    val wt = Window.partitionBy(col("k")).orderBy(col("v").asc)
    val expTiny = tiny.select(col("id"), ntile(4).over(wt).as("nt"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    val gotTiny = DistributedRank.withRanks(tiny, Seq("k"), Seq(("v", true)),
        numPartitions = 2, ntileBuckets = Some(4))
      .select(col("id"), col("nt"))
      .collect().map(r => r.getLong(0) -> r.getInt(1)).toMap
    assert(gotTiny == expTiny, s"n<k diverged: $gotTiny vs $expTiny")
  }

  test("single partition and empty input degrade gracefully") {
    val one = DistributedRank.withRanks(orders.limit(50),
      Seq("o_orderstatus"), Seq(("o_orderdate", true)), numPartitions = 1)
    assert(one.count() == 50)
    val none = DistributedRank.withRanks(orders.filter(col("o_orderkey") < 0),
      Seq("o_orderstatus"), Seq(("o_orderdate", true)), numPartitions = 3)
    assert(none.count() == 0)
  }
}
