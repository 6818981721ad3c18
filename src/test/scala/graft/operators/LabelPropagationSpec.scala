package graft.operators

import graft.SparkSpec

/** Pins for operators/LabelPropagation — the q171 engine.
  *
  * The deterministic synchronous variant is fully reproducible, so every
  * test asserts EXACT labels against a driver-side replay of the same
  * rule (argmax by count, ties to the smallest label).
  */
class LabelPropagationSpec extends SparkSpec {

  /** Driver-side reference: synchronous rounds, min-label tie-break. */
  private def reference(
      nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    val adj = (edges ++ edges.map(e => (e._2, e._1)))
      .groupBy(_._1).map { case (k, v) => k -> v.map(_._2) }
    var lab = nodes.map(n => n -> n).toMap
    for (_ <- 0 until iters) {
      lab = nodes.map { n =>
        adj.get(n) match {
          case None => n -> lab(n)
          case Some(nbrs) =>
            val counts = nbrs.map(lab).groupBy(identity)
              .map { case (l, xs) => (l, xs.size) }
            // max count, then min label
            val best = counts.toSeq.minBy { case (l, c) => (-c, l) }._1
            n -> best
        }
      }.toMap
    }
    lab
  }

  private def run(
      nodes: Seq[Long], edges: Seq[(Long, Long)], iters: Int): Map[Long, Long] = {
    import spark.implicits._
    val n = nodes.toDF("node")
    val e = edges.toDF("src", "dst")
    LabelPropagation.run(n, e, iters)
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  // two triangles bridged by one edge — one CC, but two dense cores
  private val nodes = (0L to 6L).toSeq
  private val edges = Seq(
    (0L, 1L), (1L, 2L), (0L, 2L), // triangle A
    (3L, 4L), (4L, 5L), (3L, 5L), // triangle B
    (2L, 3L)) // bridge; 6 is isolated

  test("two bridged triangles resolve to two communities, not one") {
    val got = run(nodes, edges, 5)
    assert(got == reference(nodes, edges, 5), s"exact replay mismatch: $got")
    val communities = got.filterNot(_._1 == 6L).values.toSet
    assert(communities.size == 2,
      s"bridge must not merge the triangles: $got")
    // within each triangle all labels agree
    assert(Set(got(0L), got(1L), got(2L)).size == 1)
    assert(Set(got(3L), got(4L), got(5L)).size == 1)
  }

  test("an isolated node keeps its own label forever") {
    val got = run(nodes, edges, 5)
    assert(got(6L) == 6L)
  }

  test("zero iterations returns the identity labeling") {
    val got = run(nodes, edges, 0)
    assert(got == nodes.map(n => n -> n).toMap)
  }

  test("ties break to the smallest label (and match the replay) on a path") {
    // node 1 sees neighbors {0, 2} with labels {0, 2} at round 1 — a
    // 1-1 tie; the deterministic rule must pick 0
    val pathNodes = Seq(0L, 1L, 2L)
    val pathEdges = Seq((0L, 1L), (1L, 2L))
    for (it <- 1 to 4) {
      val got = run(pathNodes, pathEdges, it)
      assert(got == reference(pathNodes, pathEdges, it),
        s"iter $it mismatch: $got")
    }
    assert(run(pathNodes, pathEdges, 1)(1L) == 0L)
  }
}
