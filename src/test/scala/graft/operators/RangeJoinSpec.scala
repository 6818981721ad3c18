package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.joins.BroadcastNestedLoopJoinExec
import org.apache.spark.sql.functions._

/** Binned range join must be a pure physical rewrite of the inequality
  * join: identical rows (including boundary points and duplicate
  * timestamps) while planning as an equi-join on the bin column — no
  * nested-loop replication of either side.
  */
class RangeJoinSpec extends SparkSpec {

  private val HOUR = 3600L * 1000000L

  /** events with adversarial timestamps: exact bin boundaries, one tick
    * either side, duplicates.
    */
  private def points: DataFrame = {
    import spark.implicits._
    val base = java.time.Instant.parse("2024-03-01T00:00:00Z")
    Seq(
      (1L, 0L), (2L, 1L), (3L, HOUR - 1), (4L, HOUR), (5L, HOUR),
      (6L, 2 * HOUR - 1), (7L, 2 * HOUR), (8L, 3 * HOUR + 17),
      (9L, 26 * HOUR), (10L, 49 * HOUR - 1))
      .map { case (id, us) =>
        (id, java.sql.Timestamp.from(base.plusNanos(us * 1000)))
      }
      .toDF("pid", "ts")
  }

  private def intervals: DataFrame = {
    import spark.implicits._
    val base = java.time.Instant.parse("2024-03-01T00:00:00Z")
    Seq(
      // [0h, 2h) — spans two bins exactly
      (100L, 0L, 2 * HOUR),
      // [1h, 1h) — degenerate, matches nothing
      (101L, HOUR, HOUR),
      // [30min, 90min) — interior, off-boundary
      (102L, HOUR / 2, HOUR + HOUR / 2),
      // [25h, 50h) — long interval, many bins
      (103L, 25 * HOUR, 50 * HOUR))
      .map { case (id, a, b) =>
        (id, java.sql.Timestamp.from(base.plusNanos(a * 1000)),
          java.sql.Timestamp.from(base.plusNanos(b * 1000)))
      }
      .toDF("win_id", "ws", "we")
  }

  private def canon(df: DataFrame): Set[(Long, Long)] =
    df.select(col("pid"), col("win_id")).collect()
      .map(r => (r.getLong(0), r.getLong(1))).toSet

  test("matches the plain inequality join exactly, boundaries included") {
    val binned = RangeJoin.pointInInterval(
      points, "ts", intervals, "ws", "we", binMicros = HOUR)
    val theta = points.join(intervals,
      col("ts") >= col("ws") && col("ts") < col("we"))
    assert(canon(binned) == canon(theta))
    // half-open semantics spot checks: ts=2h is NOT in [0h,2h); ts=0 is
    assert(canon(binned).contains((1L, 100L)))
    assert(!canon(binned).contains((7L, 100L)))
    // degenerate interval matched nothing
    assert(!canon(binned).exists(_._2 == 101L))
  }

  test("equivalence on the sf0.001 events table against the theta join") {
    val e = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
    val w = e.filter(col("event_id") % 97 === 0)
      .select(col("event_id").as("win_id"), col("ts").as("ws"),
        (col("ts") + expr("INTERVAL 2 HOURS")).as("we"))
    val p = e.select(col("event_id").as("pid"), col("ts"))
    val binned = RangeJoin.pointInInterval(
      p, "ts", w, "ws", "we", binMicros = HOUR)
    val theta = p.join(w, col("ts") >= col("ws") && col("ts") < col("we"))
    assert(canon(binned) == canon(theta))
    assert(canon(binned).nonEmpty)
  }

  test("plans as an equi-join, not a nested loop") {
    val prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    try {
      spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
      val plan = RangeJoin.pointInInterval(
        points, "ts", intervals, "ws", "we", binMicros = HOUR)
        .queryExecution.executedPlan
      val bnl = plan.collect { case j: BroadcastNestedLoopJoinExec => j }
      assert(bnl.isEmpty, s"range join fell back to nested loop: $bnl")
      val hasEqui = plan.toString.contains("SortMergeJoin") ||
        plan.toString.contains("ShuffledHashJoin")
      assert(hasEqui, s"expected a shuffled equi-join:\n$plan")
    } finally spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
  }

  test("additional equi keys scope the match") {
    import spark.implicits._
    val base = java.time.Instant.parse("2024-03-01T00:00:00Z")
    def t(us: Long) = java.sql.Timestamp.from(base.plusNanos(us * 1000))
    val p = Seq((1L, "a", t(10L)), (2L, "b", t(10L)))
      .toDF("pid", "k", "ts")
    val i = Seq((100L, "a", t(0L), t(HOUR))).toDF("win_id", "k", "ws", "we")
    val got = canon(RangeJoin.pointInInterval(
      p, "ts", i, "ws", "we", binMicros = HOUR, keys = Seq("k")))
    assert(got == Set((1L, 100L)), s"key scoping failed: $got")
  }

  test("seeded random points/intervals equal the theta join at random bin widths") {
    import spark.implicits._
    val rng = new scala.util.Random(20260812L)
    val base = java.time.Instant.parse("2024-03-01T00:00:00Z")
    def t(us: Long) = java.sql.Timestamp.from(base.plusNanos(us * 1000))
    (1 to 5).foreach { round =>
      val span = 100L * HOUR
      val p = (1 to 200).map(i => (i.toLong, t(rng.nextLong().abs % span)))
        .toDF("pid", "ts")
      val i = (1 to 40).map { j =>
        val a = rng.nextLong().abs % span
        // mix of zero-length, sub-bin, and multi-bin intervals
        val len = rng.nextInt(3) match {
          case 0 => 0L
          case 1 => rng.nextLong().abs % HOUR
          case _ => rng.nextLong().abs % (10 * HOUR)
        }
        (j.toLong, t(a), t(a + len))
      }.toDF("win_id", "ws", "we")
      val bin = Seq(HOUR / 7, HOUR, 3 * HOUR + 1)(round % 3)
      val binned = RangeJoin.pointInInterval(p, "ts", i, "ws", "we", bin)
      val theta = p.join(i, col("ts") >= col("ws") && col("ts") < col("we"))
      assert(canon(binned) == canon(theta), s"round $round bin $bin")
    }
  }

  test("colliding non-key columns fail loudly") {
    val e = intercept[IllegalArgumentException](
      RangeJoin.pointInInterval(
        points.withColumn("ws", col("ts")), "ts",
        intervals, "ws", "we", binMicros = HOUR))
    assert(e.getMessage.contains("share non-key columns"))
  }
}
