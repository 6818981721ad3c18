package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** CDC latest-wins apply (operators/CdcApply.scala, the q141 engine).
  * Pins the contract that makes the incremental path trustworthy at
  * scale: merge(snapshot, delta) — the delta-proportional form — equals
  * currentState(full log), including tombstone deletes, re-inserts after
  * delete, and keys untouched by the delta; plus the broadcast shape of
  * the untouched-keys anti-join.
  */
class CdcApplySpec extends SparkSpec {
  import spark.implicits._

  // (key, seq, payload, op) — seq is the recency order
  private lazy val log: DataFrame = Seq(
    ("a", 1L, "a1", "U"), ("a", 2L, "a2", "U"),            // plain upsert
    ("b", 1L, "b1", "U"), ("b", 2L, "b2", "D"),            // deleted
    ("c", 1L, "c1", "U"), ("c", 2L, "c2", "D"), ("c", 3L, "c3", "U"), // re-insert
    ("d", 1L, "d1", "U"),                                  // untouched by delta
    ("e", 1L, "e1", "D")                                   // born dead
  ).toDF("k", "seq", "payload", "op")

  private def state(df: DataFrame): Set[(String, Long, String)] =
    CdcApply.currentState(df, Seq("k"), Seq("seq"), Some("op"))
      .select(col("k"), col("seq"), col("payload"))
      .as[(String, Long, String)].collect().toSet

  test("currentState: latest wins, tombstones delete, re-inserts live") {
    assert(state(log) == Set(("a", 2L, "a2"), ("c", 3L, "c3"), ("d", 1L, "d1")))
  }

  test("merge(snapshot, delta) equals currentState(full log)") {
    val cut = 2L // snapshot = state as of seq < 2, delta = seq >= 2
    val snapshot = CdcApply.currentState(
      log.filter(col("seq") < cut), Seq("k"), Seq("seq"), Some("op"))
    val delta = log.filter(col("seq") >= cut)
    val merged = CdcApply.merge(snapshot, delta, Seq("k"), Seq("seq"), Some("op"))
    assert(merged.select(col("k"), col("seq"), col("payload"))
      .as[(String, Long, String)].collect().toSet == state(log),
      "incremental merge diverged from the full-log reduction")
  }

  test("merge plans the untouched-keys anti-join as broadcast") {
    val snapshot = CdcApply.currentState(
      log.filter(col("seq") < 2), Seq("k"), Seq("seq"), Some("op"))
    val delta = log.filter(col("seq") >= 2)
    val plan = CdcApply.merge(snapshot, delta, Seq("k"), Seq("seq"), Some("op"))
      .queryExecution.executedPlan.toString
    assert(plan.contains("BroadcastHashJoin") && plan.contains("LeftAnti"),
      s"expected a broadcast anti-join for untouched keys, got:\n$plan")
  }

  test("q141 face equals the naive window formulation on events") {
    val ev = graft.Tables.load(spark, "/root/testdata/sf0.001", "events")
      .select(col("user_id"), col("event_id"), col("ts"), col("event_type"),
        when(col("event_type") === "error", "D").otherwise("U").as("op"))
    val viaOp = CdcApply.currentState(ev, Seq("user_id"),
        Seq("ts", "event_id"), Some("op"))
      .select(col("user_id"), col("event_id")).as[(Long, Long)].collect().toSet
    val w = org.apache.spark.sql.expressions.Window
      .partitionBy(col("user_id"))
      .orderBy(col("ts").desc, col("event_id").desc)
    val naive = ev.withColumn("rn", row_number().over(w))
      .filter(col("rn") === 1 && col("op") =!= "D")
      .select(col("user_id"), col("event_id")).as[(Long, Long)].collect().toSet
    assert(viaOp == naive)
  }
}
