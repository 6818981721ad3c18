package graft.operators

import org.apache.spark.sql.{Column, DataFrame}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Latest-wins CDC apply — the MERGE INTO / upsert-apply semantics open
  * Spark lacks without a table format: reduce a changelog (key, recency
  * ordering, optional tombstone op) to current state, and apply a delta
  * changelog incrementally onto an existing state snapshot.
  *
  * Two shapes, one contract (CdcApplySpec pins their equivalence):
  *
  *  - [[currentState]] — the full-log reduction: one key-hash exchange +
  *    partition-local sort (a `row_number` window), then the tombstone
  *    filter. Under a key-bucketed layout (Layout.writeBucketed) the
  *    exchange elides and the cost is a partition-local scan.
  *  - [[merge]] — the incremental form a 100 TB pipeline actually runs:
  *    the delta reduces to per-key last rows FIRST (delta-sized work),
  *    then the snapshot joins ONLY against the delta's key set — an
  *    anti-join that broadcasts when the delta is small, so the
  *    snapshot streams through unshuffled and untouched keys are never
  *    rewritten. This is the query-level analogue of what Delta/Iceberg
  *    MERGE does at the file level.
  *
  * Ordering must be total per key (pass a tiebreaker, e.g. event_id) —
  * otherwise "latest" is nondeterministic in any engine.
  */
object CdcApply {

  /** Reduce a changelog to current state: per key, the row that is last
    * under `orderCols` (ascending recency — latest wins); keys whose
    * last row has `opCol` = 'D' are deleted from the state. */
  def currentState(
      changelog: DataFrame, keys: Seq[String], orderCols: Seq[String],
      opCol: Option[String] = None): DataFrame = {
    val w = Window.partitionBy(keys.map(col): _*)
      .orderBy(orderCols.map(col(_).desc): _*)
    val last = changelog.withColumn("__rn", row_number().over(w))
      .filter(col("__rn") === 1).drop("__rn")
    opCol.map(c => last.filter(col(c) =!= "D")).getOrElse(last)
  }

  /** Apply a delta changelog onto an existing state snapshot (same
    * schema as the changelog rows). Untouched snapshot keys pass through
    * without a shuffle (anti-join against the delta's reduced key set —
    * broadcast-sized when the delta is); touched keys take the delta's
    * latest row, tombstones drop out. Assumes every snapshot row is
    * older than every delta row (the snapshot IS the state as of the
    * delta's start — the invariant an incremental pipeline maintains). */
  def merge(
      snapshot: DataFrame, delta: DataFrame, keys: Seq[String],
      orderCols: Seq[String], opCol: Option[String] = None,
      broadcastDelta: Boolean = true): DataFrame = {
    val keyCols: Seq[Column] = keys.map(col)
    val deltaLast = currentState(delta, keys, orderCols, opCol = None)
    // broadcastDelta = false for the rare delta too big to broadcast:
    // the anti-join then shuffles both sides on the key (still elidable
    // under a shared bucketed layout)
    val deltaKeys = deltaLast.select(keyCols: _*).distinct()
    val untouched = snapshot.join(
      if (broadcastDelta) broadcast(deltaKeys) else deltaKeys, keys, "left_anti")
    val applied = opCol.map(c => deltaLast.filter(col(c) =!= "D"))
      .getOrElse(deltaLast)
    untouched.unionByName(applied)
  }
}
