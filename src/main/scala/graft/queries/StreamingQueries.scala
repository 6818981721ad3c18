package graft.queries

import graft.{QueryDef, Tables}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Event-time windowing surface (SURVEY §2.3 streaming rows), declared as
  * batch-mode queries so the DuckDB oracle can hash-check them; the
  * stream-equals-batch property for the same operators is covered by
  * graft.streaming.StreamingSpec (Structured Streaming, Trigger.AvailableNow).
  *
  * Scale notes: tumbling/sliding windows are plain hash aggregates on the
  * derived window key — one shuffle, map-side partial agg. Session windows
  * shuffle by user and sort within partition (same shape as the as-of join
  * q12); a single hot user is the only skew risk.
  */
object StreamingQueries {

  private def ev(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "events")

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // Tumbling 1-hour window aggregate.
    QueryDef.sql(
      "q70_window_tumbling",
      """SELECT CAST(time_bucket(INTERVAL 1 hour, ts) AS TIMESTAMP) AS w,
        |  count(*) AS n, round(sum(value), 4) AS sv
        |FROM events GROUP BY w ORDER BY w ASC""".stripMargin) { (s, dir) =>
      ev(s, dir)
        .groupBy(window(col("ts"), "1 hour"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv"))
        .select(col("window.start").as("w"), col("n"), col("sv"))
        .orderBy(col("w").asc)
    },

    // ------------------------------------------------------------------
    // Sliding 1-hour window, 30-minute step: every event lands in exactly
    // two windows.
    QueryDef.sql(
      "q71_window_sliding",
      """WITH s AS (SELECT ts, value,
        |  unnest([CAST(time_bucket(INTERVAL 30 minutes, ts) AS TIMESTAMP),
        |          CAST(time_bucket(INTERVAL 30 minutes, ts) AS TIMESTAMP)
        |            - INTERVAL 30 minutes]) AS w
        |  FROM events)
        |SELECT w, count(*) AS n, round(sum(value), 4) AS sv
        |FROM s GROUP BY w ORDER BY w ASC""".stripMargin) { (s, dir) =>
      ev(s, dir)
        .groupBy(window(col("ts"), "1 hour", "30 minutes"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv"))
        .select(col("window.start").as("w"), col("n"), col("sv"))
        .orderBy(col("w").asc)
    },

    // ------------------------------------------------------------------
    // Session windows (30-minute gap) per user; oracle reconstructs
    // sessions with lag + cumulative break flags. Spark's session_window
    // is [t, t+gap) — an event EXACTLY gap-distant starts a new session —
    // so the oracle break condition is >=, not >.
    QueryDef.sql(
      "q72_window_session",
      """WITH o AS (SELECT user_id, event_id, ts, value,
        |  CASE WHEN lag(ts) OVER w IS NULL
        |       OR ts - lag(ts) OVER w >= INTERVAL 30 minutes
        |       THEN 1 ELSE 0 END AS brk
        |  FROM events
        |  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
        |s AS (SELECT *, sum(brk) OVER (PARTITION BY user_id ORDER BY ts, event_id
        |        ROWS UNBOUNDED PRECEDING) AS sess
        |      FROM o)
        |SELECT user_id, CAST(min(ts) AS TIMESTAMP) AS sess_start,
        |  count(*) AS n, round(sum(value), 4) AS sv
        |FROM s GROUP BY user_id, sess
        |ORDER BY user_id ASC, sess_start ASC""".stripMargin) { (s, dir) =>
      ev(s, dir)
        .groupBy(col("user_id"), session_window(col("ts"), "30 minutes"))
        .agg(count(lit(1)).as("n"), round(sum(col("value")), 4).as("sv"))
        .select(col("user_id"), col("session_window.start").as("sess_start"),
          col("n"), col("sv"))
        .orderBy(col("user_id").asc, col("sess_start").asc)
    },

    // ------------------------------------------------------------------
    // Stream-stream join (click→purchase attribution within 60 minutes),
    // declared in batch mode for the oracle; the WATERMARKED streaming
    // run of the same Streams.clickAttribution plan — where the time
    // bound becomes the join-state eviction policy — is asserted equal
    // in StreamingSpec.
    QueryDef.sql(
      "q110_stream_stream_join",
      """SELECT c.user_id, c.event_id AS click_id, v.event_id AS purchase_id,
        |  CAST(c.ts AS TIMESTAMP) AS click_ts,
        |  CAST(v.ts AS TIMESTAMP) AS purchase_ts,
        |  round(v.value, 4) AS purchase_value
        |FROM events c JOIN events v ON c.user_id = v.user_id
        |WHERE c.event_type = 'click' AND v.event_type = 'purchase'
        |  AND v.ts >= c.ts AND v.ts <= c.ts + INTERVAL 60 minutes
        |ORDER BY c.user_id ASC, click_id ASC, purchase_id ASC""".stripMargin) {
      (s, dir) =>
        graft.streaming.Streams.clickAttribution(ev(s, dir))
          .orderBy(col("user_id").asc, col("click_id").asc,
            col("purchase_id").asc)
    },

    // ------------------------------------------------------------------
    // LEFT OUTER stream-stream join: every click emits, matched or
    // null-extended. The streaming form's outer rows trail the watermark
    // (emitted only when no purchase can still arrive); StreamingSpec
    // asserts prefix-completeness. Batch mode (here) is a plain left
    // outer join with the same time-range condition.
    QueryDef.sql(
      "q112_stream_stream_outer",
      """SELECT c.user_id, c.event_id AS click_id, v.event_id AS purchase_id,
        |  CAST(c.ts AS TIMESTAMP) AS click_ts,
        |  CAST(v.ts AS TIMESTAMP) AS purchase_ts,
        |  round(v.value, 4) AS purchase_value
        |FROM (SELECT * FROM events WHERE event_type = 'click') c
        |LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') v
        |  ON c.user_id = v.user_id
        |  AND v.ts >= c.ts AND v.ts <= c.ts + INTERVAL 60 minutes
        |ORDER BY c.user_id ASC, click_id ASC,
        |  purchase_id ASC NULLS FIRST""".stripMargin) {
      (s, dir) =>
        graft.streaming.Streams.clickAttributionOuter(ev(s, dir))
          .orderBy(col("user_id").asc, col("click_id").asc,
            col("purchase_id").asc_nulls_first)
    }
  )
}
