package graft.operators

import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Distributed triangle counting via degree orientation — the standard
  * O(m^{3/2}) scheme (Schank & Wagner 2005; Suri & Vassilvitskii's MapReduce
  * formulation, WWW 2011): orient every undirected edge from its
  * lower-(degree, id) endpoint to its higher one, enumerate wedges at the
  * SOURCE of two oriented edges, and close each wedge against the oriented
  * edge set. Orientation is what makes this scale: every vertex's oriented
  * out-degree is O(sqrt m) on any graph (a vertex of degree d > sqrt m can
  * only point at vertices of degree >= d, and there are < sqrt m of those),
  * so the wedge join's fan-out is bounded even on power-law graphs where a
  * naive neighbor self-join explodes quadratically at hub nodes.
  *
  * Determinism: each triangle {u,v,w} is enumerated exactly once (as the
  * wedge at its smallest endpoint in the (degree, id) total order), so the
  * per-node counts are exact, not estimates — an id-ordered naive
  * triple-join oracle must agree value for value.
  *
  * Plan shape: degree = one keyed agg over the doubled edge list; the
  * orientation is a narrow expression; the wedge enumeration is one
  * src-keyed self-join; the closure is one (src,dst)-keyed semi-equi-join;
  * per-node counts are one explode + keyed agg. No global ordering, no
  * driver-side structure, every exchange keyed.
  */
object Triangles {

  /** @param nodes one column `node` — every vertex (zero-triangle vertices
    *              are kept with count 0)
    * @param edges columns `src`, `dst`, each undirected edge ONCE
    *              (direction irrelevant, no self-loops, no duplicates)
    * @return (node, triangles) — number of triangles containing the node
    */
  def perNodeCounts(nodes: DataFrame, edges: DataFrame): DataFrame = {
    val e = edges.select(col("src"), col("dst"))
    val bidir = e.union(e.select(col("dst"), col("src")))
    val deg = bidir.groupBy(col("src").as("node"))
      .agg(count(lit(1)).as("deg"))
    // total order key (deg, id); orient low -> high
    val withK = e
      .join(deg.select(col("node").as("src"), col("deg").as("dsrc")), "src")
      .join(deg.select(col("node").as("dst"), col("deg").as("ddst")), "dst")
    val oriented = withK.select(
      when(struct(col("dsrc").as("d"), col("src").as("i"))
          < struct(col("ddst").as("d"), col("dst").as("i")),
        struct(col("src").as("from"), col("dst").as("to"),
          struct(col("ddst").as("d"), col("dst").as("i")).as("tok")))
        .otherwise(
          struct(col("dst").as("from"), col("src").as("to"),
            struct(col("dsrc").as("d"), col("src").as("i")).as("tok"))).as("o"))
      .select(col("o.from").as("from"), col("o.to").as("to"),
        col("o.tok").as("tok"))
      .localCheckpoint()
    // wedges at the smallest endpoint: pair the two out-neighbors in
    // (deg, id) order so each unordered wedge appears once
    val a = oriented.select(col("from"), col("to").as("v"), col("tok").as("kv"))
    val b = oriented.select(col("from"), col("to").as("w"), col("tok").as("kw"))
    val wedges = a.join(b, Seq("from")).filter(col("kv") < col("kw"))
      .select(col("from").as("u"), col("v"), col("w"))
    val closing = oriented.select(col("from").as("v"), col("to").as("w"))
    val tris = wedges.join(closing, Seq("v", "w"))
    val members = tris.select(explode(array(col("u"), col("v"), col("w")))
      .as("node"))
      .groupBy(col("node")).agg(count(lit(1)).as("triangles"))
    nodes.join(members, Seq("node"), "left")
      .select(col("node"),
        coalesce(col("triangles"), lit(0L)).as("triangles"))
  }
}
