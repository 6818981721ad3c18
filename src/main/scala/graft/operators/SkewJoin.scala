package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.catalyst.plans.{Inner, JoinType, LeftOuter}
import org.apache.spark.sql.functions._

/** Salted equi-join for skewed probe keys — the standard remedy when one
  * hot key would funnel a partition-sized row group into a single reducer
  * and neither of the two free fixes applies: the build side is too large
  * to broadcast, and AQE's skew-join splitting cannot rewrite the exchange
  * (it only fires on sort-merge joins directly consuming a shuffle, not
  * when the skewed side feeds a window/agg first or in stream-stream
  * joins).
  *
  * Formulation: each probe row gets a salt in [0, salts) that varies
  * WITHIN a key (hash of the whole row, not the key), so a hot key's rows
  * spread over `salts` distinct shuffle keys; the build side is replicated
  * once per salt via a literal-range explode. Joining on (keys…, salt)
  * then meets every matching (probe, build) pair exactly once — the probe
  * row's own salt copy — so the result is EXACTLY the plain join for any
  * probe-preserving join type.
  *
  * Cost model: build-side shuffle volume is multiplied by `salts`; probe
  * volume is unchanged. Use when |build| · salts ≪ |probe-hot-key|, the
  * same regime where the reference's completion-flag fan-in stays small
  * (`ometif_to_n5.py:148`). Fully-duplicate probe rows share a salt —
  * spread degrades only if a hot key is mostly identical rows.
  */
object SkewJoin {

  private val SaltCol = "__salt"

  /** @param probe    skewed (large) side; preserved under "left"
    * @param build    replicated side (must NOT be broadcast-sized — use
    *                 `broadcast()` instead if it is)
    * @param keys     equi-join column names present on both sides
    * @param salts    number of salt buckets a hot key is spread over
    * @param joinType "inner" or "left"/"left_outer" (probe-preserving —
    *                 right/full would duplicate unmatched build rows per
    *                 salt copy)
    */
  def salted(
      probe: DataFrame, build: DataFrame, keys: Seq[String], salts: Int,
      joinType: String = "inner"): DataFrame = {
    require(salts > 0, s"salts must be positive, got $salts")
    require(keys.nonEmpty, "at least one equi-join key required")
    // normalize through Spark's own parser so every alias IT accepts
    // ("inner", "left", "leftouter", "left_outer" — case-insensitive,
    // underscores stripped; an embedded space is NOT accepted) passes the
    // check; rethrow its generic parse error with the probe-preserving
    // context a caller actually needs
    val parsed =
      try JoinType(joinType)
      catch {
        case e: IllegalArgumentException => throw new IllegalArgumentException(
          s"unsupported join type '$joinType' for salted join — use one of " +
            "inner, left, leftouter, left_outer (probe-preserving)", e)
      }
    require(Seq(Inner, LeftOuter).contains(parsed),
      s"join type '$joinType' is not probe-preserving; salted replication " +
        "would duplicate unmatched build rows")
    require(!probe.columns.contains(SaltCol) && !build.columns.contains(SaltCol),
      s"input already has scratch column $SaltCol")
    val p = probe.withColumn(SaltCol,
      pmod(hash(probe.columns.toIndexedSeq.map(col): _*), lit(salts)))
    val b = build.withColumn(SaltCol,
      explode(array((0 until salts).map(lit(_)): _*)))
    p.join(b, keys :+ SaltCol, joinType).drop(SaltCol)
  }
}
