package graft.operators

import graft.SparkSpec

/** Pins for operators/Triangles — the q176 engine. Exact counts against a
  * driver-side naive enumeration on graphs chosen to stress the degree
  * orientation: complete graphs (every wedge closes), stars (no triangle
  * despite a max-degree hub), shared-degree ties (the (deg, id) total
  * order must stay antisymmetric), and overlapping triangles.
  */
class TrianglesSpec extends SparkSpec {

  private def naive(
      nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    val es = edges.map { case (a, b) => if (a < b) (a, b) else (b, a) }.toSet
    val tris = for {
      u <- nodes; v <- nodes if u < v; w <- nodes if v < w
      if es((u, v)) && es((v, w)) && es((u, w))
    } yield Seq(u, v, w)
    val counts = tris.flatten.groupBy(identity)
      .map { case (n, xs) => n -> xs.size.toLong }
    nodes.map(n => n -> counts.getOrElse(n, 0L)).toMap
  }

  private def run(
      nodes: Seq[Long], edges: Seq[(Long, Long)]): Map[Long, Long] = {
    import spark.implicits._
    Triangles.perNodeCounts(nodes.toDF("node"), edges.toDF("src", "dst"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
  }

  test("K4: every node sits in 3 of the 4 triangles") {
    val nodes = Seq(0L, 1L, 2L, 3L)
    val edges = for (a <- 0 to 3; b <- a + 1 to 3) yield (a.toLong, b.toLong)
    val got = run(nodes, edges)
    assert(got == nodes.map(_ -> 3L).toMap, s"got $got")
  }

  test("a star has no triangles despite the max-degree hub") {
    val nodes = (0L to 6L).toSeq
    val edges = (1L to 6L).map(i => (0L, i))
    assert(run(nodes, edges) == nodes.map(_ -> 0L).toMap)
  }

  test("two triangles sharing an edge + an isolated node (exact replay)") {
    // {0,1,2} and {1,2,3} share edge (1,2); node 4 isolated
    val nodes = (0L to 4L).toSeq
    val edges = Seq((0L, 1L), (0L, 2L), (1L, 2L), (1L, 3L), (2L, 3L))
    val got = run(nodes, edges)
    assert(got == naive(nodes, edges), s"got $got")
    assert(got(1L) == 2L && got(4L) == 0L)
  }

  test("all-equal degrees (C5 plus chords) match the naive enumeration") {
    // 5-cycle with all five "skip" chords = K5: heavy (deg, id) ties
    val nodes = (0L to 4L).toSeq
    val edges = for (a <- 0 to 4; b <- a + 1 to 4) yield (a.toLong, b.toLong)
    val got = run(nodes, edges)
    assert(got == naive(nodes, edges), s"got $got")
    assert(got.values.toSet == Set(6L)) // C(4,2) triangles through each
  }
}
