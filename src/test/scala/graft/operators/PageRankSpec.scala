package graft.operators

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** The standard-formulation options q129's frozen oracle omits (r11
  * VERDICT #7): dangling-mass redistribution and the delta convergence
  * stop, pinned on a small graph WITH sinks against a driver-side
  * reference power iteration.
  */
class PageRankSpec extends SparkSpec {

  // 6 nodes; 5 is a SINK (no out-edges), 4 points only at the sink
  private val edgeList = Seq(
    (0L, 1L), (0L, 2L), (1L, 2L), (2L, 0L), (3L, 2L), (4L, 5L), (2L, 4L))
  private val n = 6

  private def dfs = {
    import spark.implicits._
    (spark.createDataset((0L until n.toLong)).toDF("node"),
      edgeList.toDF("src", "dst").localCheckpoint())
  }

  /** Driver-side reference power iteration (doubles, no lattice). */
  private def reference(
      iters: Int, redistribute: Boolean): Array[Double] = {
    val out = edgeList.groupBy(_._1).map { case (s, es) => s -> es.size }
    var pr = Array.fill(n)(1.0 / n)
    for (_ <- 1 to iters) {
      val next = Array.fill(n)(0.15 / n)
      val dangling =
        if (redistribute)
          (0 until n).filterNot(i => out.contains(i.toLong)).map(pr).sum
        else 0.0
      for (i <- 0 until n) next(i) += 0.85 * dangling / n
      edgeList.foreach { case (s, d) =>
        next(d.toInt) += 0.85 * pr(s.toInt) / out(s)
      }
      pr = next
    }
    pr
  }

  private def ranksOf(r: PageRankResult): Array[Double] = {
    val m = r.ranks.collect().map(x => x.getLong(0) -> x.getDouble(1)).toMap
    Array.tabulate(n)(i => m(i.toLong))
  }

  test("dangling redistribution conserves rank mass on a graph with sinks") {
    val (nodes, edges) = dfs
    val kept = PageRank.run(nodes, edges, maxIters = 10,
      redistributeDangling = true)
    assert(math.abs(ranksOf(kept).sum - 1.0) < 1e-9,
      "redistributed PageRank must conserve Σ pr = 1")
    val dropped = PageRank.run(nodes, edges, maxIters = 10,
      redistributeDangling = false)
    assert(ranksOf(dropped).sum < 1.0 - 1e-6,
      "dropping dangling mass must leak rank on a graph with sinks")
    // both match the driver-side reference iteration elementwise
    val refKept = reference(10, redistribute = true)
    val refDropped = reference(10, redistribute = false)
    ranksOf(kept).zip(refKept).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-12, s"redistributed: $a vs $b") }
    ranksOf(dropped).zip(refDropped).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-12, s"dropped: $a vs $b") }
  }

  test("delta convergence stops before maxIters and matches the fixed point") {
    val (nodes, edges) = dfs
    val r = PageRank.run(nodes, edges, maxIters = 200,
      redistributeDangling = true, tol = 1e-10)
    assert(r.iterations < 200,
      s"tol=1e-10 should converge well before 200 iterations, ran ${r.iterations}")
    // the stopped vector is a fixed point: one more iteration moves < tol
    val more = PageRank.run(nodes, edges, maxIters = r.iterations + 1,
      redistributeDangling = true)
    ranksOf(r).zip(ranksOf(more)).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-8, s"$a vs $b") }
  }

  test("the lattice option reproduces q129's frozen arithmetic") {
    val (nodes, edges) = dfs
    val r = PageRank.run(nodes, edges, maxIters = 5,
      redistributeDangling = false, roundDecimals = Some(8))
    // every iterate was rounded: values live on the 1e-8 lattice
    ranksOf(r).foreach { v =>
      assert(math.abs(v * 1e8 - math.round(v * 1e8)) < 1e-4, s"off-lattice $v") }
    // and agrees with the unlatticed run to lattice precision
    val free = PageRank.run(nodes, edges, maxIters = 5,
      redistributeDangling = false)
    ranksOf(r).zip(ranksOf(free)).foreach { case (a, b) =>
      assert(math.abs(a - b) < 1e-6, s"$a vs $b") }
  }
}
