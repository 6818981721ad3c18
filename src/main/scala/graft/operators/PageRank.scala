package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions.{abs, broadcast, coalesce, col, count, lit, round, sum}

/** Result of a [[PageRank.run]]: the rank vector and how many iterations
  * actually ran (== maxIters under a fixed schedule; fewer when the
  * delta-based stop triggered first).
  */
final case class PageRankResult(ranks: DataFrame, iterations: Int)

/** PageRank over a DataFrame edge list — the Pregel-on-DataFrames shape
  * q129 introduced, extracted as a reusable operator with the two
  * standard-formulation options the frozen oracle query deliberately
  * omits (r11 VERDICT #7):
  *
  *   - `redistributeDangling`: a sink node's rank mass is re-spread
  *     uniformly instead of dropped, so Σ pr stays 1 every iteration
  *     (the textbook formulation). Costs ONE extra tiny aggregate per
  *     round — the dangling set's rank sum — broadcast back as a
  *     scalar; nothing edge-sized moves.
  *   - `tol`: delta-based convergence stop — iterate until
  *     Σ |pr_t − pr_{t−1}| < tol or `maxIters`, whichever first. Costs
  *     one more tiny agg per round (an N-row join of consecutive rank
  *     vectors, both already checkpointed).
  *
  * Scale shape (unchanged from q129): the edge list must be
  * pre-materialized by the caller (localCheckpoint — iterating raw
  * lineage re-runs upstream candidate generation every round); each
  * iteration is one src-keyed join + map-side-combined agg on dst + a
  * left join back to the N-row node set, re-checkpointed so lineage
  * stays bounded. `roundDecimals` keeps every iterate on a fixed value
  * lattice (the cross-engine determinism discipline of the oracle
  * queries); pass None for full double precision.
  */
object PageRank {

  /** @param nodes  one column `node` — every vertex, including edgeless
    * @param edges  columns `src`, `dst` — pre-checkpointed by the caller
    */
  def run(
      nodes: DataFrame, edges: DataFrame,
      damping: Double = 0.85,
      maxIters: Int = 20,
      redistributeDangling: Boolean = false,
      tol: Double = 0.0,
      roundDecimals: Option[Int] = None): PageRankResult = {
    require(maxIters > 0, s"maxIters must be positive, got $maxIters")
    require(damping > 0 && damping < 1, s"damping must be in (0,1), got $damping")
    def lattice(c: org.apache.spark.sql.Column): org.apache.spark.sql.Column =
      roundDecimals.fold(c)(d => round(c, d))
    // r19: join outdeg into the edge set ONCE and hash-partition it by
    // src before materializing — localCheckpoint preserves the physical
    // partitioning, so every iteration's contribution join reuses it and
    // only the N-row rank vector is exchanged per round. The old loop
    // re-shuffled the edge set AND re-joined deg every iteration: two
    // edge-sized exchanges per round that at 100 TB dominate the whole
    // computation (guide §2.4 — the edge set is the big side and it
    // never changes).
    val edgesWithDeg = edges
      .join(edges.groupBy(col("src")).agg(count(lit(1)).as("outdeg")), "src")
      .repartition(col("src"))
      .localCheckpoint()
    // distinct sources, only needed for the dangling-mass anti-join
    lazy val srcNodes = edgesWithDeg.select(col("src")).distinct()
      .localCheckpoint()
    // the node set is re-read every round (left join) — materialize it
    // once, partitioned on the join key
    val nodeSet = nodes.repartition(col("node")).localCheckpoint()
    val n = nodeSet.count().toDouble
    require(n > 0, "empty node set")
    var pr = nodeSet
      .select(col("node"), lattice(lit(1.0 / n)).as("pr"))
      .localCheckpoint()
    var it = 0
    var done = false
    while (it < maxIters && !done) {
      // dangling mass: one tiny aggregate over the N-row rank vector
      // (rank of nodes with no out-edges), broadcast as a scalar
      val dangling =
        if (!redistributeDangling) 0.0
        else pr.join(broadcast(srcNodes).withColumnRenamed("src", "node"),
            Seq("node"), "left_anti")
          .agg(coalesce(sum(col("pr")), lit(0.0))).collect()(0).getDouble(0)
      // With a lattice, the per-edge contribution is put on an INTEGER
      // e(d+4) lattice and summed as longs: floor(pr_eD · 1e4 / outdeg).
      // A double sum of pr/outdeg is association-order-dependent, and a
      // result within 1 ulp of a .5·10^-d boundary then rounds
      // differently between engines (observed r14: one q151 node at
      // sf0.1 flipped at 1e-8 when the edge set changed). The integer
      // sum is exact in ANY order, and the SQL oracle replays the same
      // integer division, so the straddle class is gone by construction.
      // (The double intermediates are exact: pr_eD·1e4 ≤ 10^(d+4) and
      // the floor of the correctly-rounded division cannot misround —
      // a non-divisible quotient sits ≥ 1/outdeg below the next
      // integer, orders of magnitude beyond 1 ulp at this scale.)
      val contrib = roundDecimals match {
        case Some(d) =>
          val unit = math.pow(10.0, d + 4)
          edgesWithDeg
            .join(pr.withColumnRenamed("node", "src"), "src")
            .groupBy(col("dst"))
            .agg((sum(org.apache.spark.sql.functions.floor(
                round(col("pr") * math.pow(10.0, d)) * lit(1e4)
                  / col("outdeg")).cast("long")).cast("double") / lit(unit))
              .as("m"))
            .withColumnRenamed("dst", "node")
        case None =>
          edgesWithDeg
            .join(pr.withColumnRenamed("node", "src"), "src")
            .groupBy(col("dst"))
            .agg(sum(col("pr") / col("outdeg")).as("m"))
            .withColumnRenamed("dst", "node")
      }
      val next = nodeSet
        .join(contrib, Seq("node"), "left")
        .select(col("node"), lattice(
          lit((1.0 - damping) / n)
            + lit(damping) * (coalesce(col("m"), lit(0.0))
              + lit(damping_dangling(dangling, n)))).as("pr"))
        .localCheckpoint()
      it += 1
      if (tol > 0.0) {
        // one more tiny agg: L1 delta of consecutive N-row rank vectors
        val delta = next.withColumnRenamed("pr", "pn")
          .join(pr, Seq("node"))
          .agg(coalesce(sum(abs(col("pn") - col("pr"))), lit(0.0)))
          .collect()(0).getDouble(0)
        done = delta < tol
      }
      pr = next
    }
    PageRankResult(pr, it)
  }

  /** Per-node share of the redistributed dangling mass (0 when the
    * option is off).
    */
  private def damping_dangling(danglingMass: Double, n: Double): Double =
    danglingMass / n
}
