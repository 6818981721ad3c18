package graft

import org.apache.spark.sql.{Column, SparkSession}
import org.apache.spark.sql.functions._

/** Scaled-k scale probe for the cell-bucketed vector family (r13).
  *
  * The oracle queries freeze k for determinism (q111/q113/q115/q129 at
  * k=8, q133/q134/q150/q151 at k=32), so no oracle row can demonstrate
  * the family's actual 100 TB design point: k growing WITH the corpus,
  * keeping the candidate space (nAssign²/k)·n² ~linear in n. This main
  * measures that directly, outside the oracle set: train at the given k,
  * generate semantic-dedup pairs and the kNN graph, and report candidate
  * counts + wall seconds as ONE JSON line.
  *
  * Usage (positional; mode rides in arg 3):
  *   graft.ScaleK <sfDir> <k> <nAssign>                 — flat IVF curve
  *   graft.ScaleK <sfDir> <kHalf> <aProbe> imi          — IMI product cells
  *   graft.ScaleK <sfDir> <kHalf> <cap> imimp <margin> [flat]
  *                                                       — margin multi-probe
  *   graft.ScaleK <sfDir> <kHalf> <cap> assign <margin> — flat-scan vs
  *                                       two-level-descent assignment cost
  * Run with k ∝ corpus size (e.g. 32 @ sf0.1, 128 @ sf1, 512 @ sf10) and
  * compare rows/sec across the points; BASELINE.md records the curves.
  */
object ScaleK {
  def main(args: Array[String]): Unit = {
    val Array(sfDir, kS, nAssignS) = args.take(3)
    val k = kS.toInt
    val nAssign = nAssignS.toInt
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    import graft.functions.{VectorSearch => VS}
    val e = Tables.load(spark, sfDir, "embeddings")
      .select(col("vec_id"), col("embedding"))
    val n = e.count()
    def timed[A](f: => A): (A, Double) = {
      val t0 = System.nanoTime()
      val a = f
      (a, (System.nanoTime() - t0) / 1e9)
    }
    val spread = Tables.spread(spark, e)
    // "assign" mode (r16, VERDICT r15 #2 done-criterion): positional
    // args <sfDir> <kHalf> <cap> assign <margin> — trains the IMI
    // half-codebooks at the FORCED kHalf, then times the corpus
    // assignment twice: the flat O(kHalf·dim)-per-vector centroid scan
    // vs the two-level O(√kHalf·dim) descent, reporting per-vector µs
    // for both plus the cell-set agreement (how many (vec_id, cell)
    // assignments the descent reproduces) — run at sf1 and sf10 with
    // the same forced kHalf to show the descent's per-vector cost stays
    // ~flat while the flat scan's grows with kHalf
    if (args.lift(3).contains("assign")) {
      import graft.functions.{NativeExpressions => NEx, VectorFunctions => VFx}
      val margin = args(4).toDouble
      val cap = nAssign
      val kHalf = if (k == 0) VS.scaledKHalf(n) else k
      val ((cb1, cb2, half), tTrain) =
        timed(VS.trainImiCodebooks(e, k = kHalf, iters = 3, sampleBuckets = 3))
      val v1 = VFx.toDoubles(slice(col("embedding"), 1, half))
      val v2 = VFx.toDoubles(slice(col("embedding"), half + 1, half))
      def assignWith(c1: Column, c2: Column) = spread
        .withColumn("c2", explode(c2)).withColumn("c1", explode(c1))
        .select(col("vec_id"), (col("c1") * cb2.size + col("c2")).as("cell"))
      val flatA = assignWith(
        NEx.ivfTopCellsMargin(v1, cb1, cap, margin),
        NEx.ivfTopCellsMargin(v2, cb2, cap, margin))
      // optional args(5)/args(6): the super-level dial (default = the
      // cell-level cap/margin — the production choice being measured)
      val sCap = args.lift(5).map(_.toInt).getOrElse(cap)
      val sMargin = args.lift(6).map(_.toDouble).getOrElse(margin)
      val (g1, g2) = (VS.superCluster(cb1), VS.superCluster(cb2))
      val hierA = assignWith(
        NEx.ivfTopCellsMarginHier(v1, g1, cap, margin, sCap, sMargin),
        NEx.ivfTopCellsMarginHier(v2, g2, cap, margin, sCap, sMargin))
      val (nFlat, tFlat) = timed(flatA.count())
      val (nHier, tHier) = timed(hierA.count())
      val (nCommon, _) = timed(
        hierA.intersect(flatA).count())
      // downstream recall — what the dedup composites actually consume:
      // thresholded pairs from each assignment (pair recall survives
      // assignment divergence because near-dup members descend alike)
      def pairsOf(a: org.apache.spark.sql.DataFrame) = {
        val withV = a.join(spread, Seq("vec_id"))
          .select(col("cell"), col("vec_id"), col("embedding"))
        VS.pairsWithinCells(withV, 0.4)
      }
      val (pFlat, tpF) = timed(pairsOf(flatA).count())
      val (pHier, tpH) = timed(pairsOf(hierA).count())
      println(
        s"""{"metric":"scale_k_assign","sf":"$sfDir","n":$n,"kHalf":$kHalf,""" +
          s""""cap":$cap,"margin":$margin,"superCap":$sCap,""" +
          s""""superMargin":$sMargin,"train_sec":${f"$tTrain%.2f"},""" +
          s""""flat_assigned":$nFlat,"flat_sec":${f"$tFlat%.2f"},""" +
          s""""flat_us_per_vec":${f"${tFlat * 1e6 / n}%.2f"},""" +
          s""""hier_assigned":$nHier,"hier_sec":${f"$tHier%.2f"},""" +
          s""""hier_us_per_vec":${f"${tHier * 1e6 / n}%.2f"},""" +
          s""""common_assignments":$nCommon,""" +
          s""""flat_pairs":$pFlat,"flat_pairs_sec":${f"$tpF%.2f"},""" +
          s""""hier_pairs":$pHier,"hier_pairs_sec":${f"$tpH%.2f"}}""")
      spark.stop()
      return
    }
    // "asym" mode (r16 exploration): ASYMMETRIC candidate generation —
    // every vector is STORED once under its top-1×top-1 product cell,
    // and only the PROBE side explodes through the margin-gated
    // multi-probe; candidates are probe ⋈ stored on cell. Pair work is
    // n·expansion·occupancy instead of Σ_cells (n_c·expansion)² — ~an
    // order of magnitude less at the cap-4 dial — at the price of the
    // boundary-boundary pairs only a SHARED SECONDARY cell finds (both
    // members probe a cell neither owns). This mode measures that recall
    // delta vs the symmetric join and vs the flat quantizer before any
    // production rewiring: <sfDir> <kHalf> <cap> asym <margin>.
    if (args.lift(3).contains("asym")) {
      import graft.functions.{NativeExpressions => NEx}
      val margin = args(4).toDouble
      val cap = nAssign
      val kHalf = if (k == 0) VS.scaledKHalf(n) else k
      val ((cb1, cb2, half), tTrain) =
        timed(VS.trainImiCodebooks(e, k = kHalf, iters = 3, sampleBuckets = 3))
      val stored = VS.imiAssignCells(spread, cb1, cb2, half, aProbe = 1)
      val probes = VS.imiAssignCellsMp(spread, cb1, cb2, half, cap, margin)
      def side(d: org.apache.spark.sql.DataFrame, tag: String) =
        d.select(col("cell"), col("vec_id").as(s"id_$tag"),
          col("embedding").as(s"v$tag"),
          NEx.vectorL2Norm(col("embedding")).as(s"n$tag"))
      val asym = side(probes, "a").join(side(stored, "b"), Seq("cell"))
        .filter(col("id_a") =!= col("id_b"))
        .select(least(col("id_a"), col("id_b")).as("lo"),
          greatest(col("id_a"), col("id_b")).as("hi"),
          round(NEx.vectorDot(col("va"), col("vb"))
            / (col("na") * col("nb")), 4).as("cosine"))
        .filter(col("cosine") >= 0.4)
        .distinct()
      val (nAsym, tAsym) = timed(asym.count())
      val (nSym, tSym) = timed(VS.imiDedupPairsMp(
        spread, cb1, cb2, half, cap, margin, threshold = 0.4).count())
      println(
        s"""{"metric":"scale_k_asym","sf":"$sfDir","n":$n,"kHalf":$kHalf,""" +
          s""""cap":$cap,"margin":$margin,"train_sec":${f"$tTrain%.2f"},""" +
          s""""asym_pairs":$nAsym,"asym_sec":${f"$tAsym%.2f"},""" +
          s""""sym_pairs":$nSym,"sym_sec":${f"$tSym%.2f"}}""")
      spark.stop()
      return
    }
    // "imimp" mode (r15): the margin-gated symmetric multi-probe face —
    // positional args <sfDir> <k> <cap> imimp <margin> [flat]: arg 1 is
    // kHalf (0 = the production scaledKHalf formula), arg 2 the per-half
    // probe cap (it rides in the nAssign slot), args(3) the mode flag,
    // args(4) the margin, and an optional args(5)="flat" also runs the
    // flat quantizer at the SAME cell count for the recall ratio the
    // VERDICT r14 #2 pin needs; reports the assignment expansion
    // (rows per vector) alongside pairs/graph timings
    if (args.lift(3).contains("imimp")) {
      val margin = args(4).toDouble
      val kHalf = if (k == 0) VS.scaledKHalf(n) else k
      val ((cb1, cb2, half), tTrain) =
        timed(VS.trainImiCodebooks(e, k = kHalf, iters = 3, sampleBuckets = 3))
      val nAssigned = VS.imiAssignCellsMp(
        spread, cb1, cb2, half, cap = nAssign, margin = margin).count()
      val (nPairs, tPairs) = timed(
        VS.imiDedupPairsMp(spread, cb1, cb2, half, cap = nAssign,
          margin = margin, threshold = 0.4).count())
      val (nEdges, tGraph) = timed(
        VS.imiKnnGraphMp(spread, cb1, cb2, half, cap = nAssign,
          margin = margin, k = 5).count())
      val flatPart = if (args.lift(5).contains("flat")) {
        val (cents, tF) = timed(
          VS.trainIvfCodebook(e, k = kHalf * kHalf, iters = 3, sampleBuckets = 3))
        val (nF, tFp) = timed(
          VS.semanticDedupPairs(spread, cents, nAssign = 2, threshold = 0.4)
            .count())
        s""","flat_pairs":$nF,"flat_train_sec":${f"$tF%.2f"}""" +
          s""","flat_pairs_sec":${f"$tFp%.2f"}"""
      } else ""
      println(
        s"""{"metric":"scale_k_imimp","sf":"$sfDir","n":$n,"kHalf":$kHalf,""" +
          s""""cells":${kHalf * kHalf},"cap":$nAssign,"margin":$margin,""" +
          s""""assigned":$nAssigned,"train_sec":${f"$tTrain%.2f"},""" +
          s""""pairs":$nPairs,"pairs_sec":${f"$tPairs%.2f"},""" +
          s""""knn_edges":$nEdges,"graph_sec":${f"$tGraph%.2f"}$flatPart}""")
      spark.stop()
      return
    }
    // optional 4th arg "imi": k is the PER-HALF codebook size; the
    // product space spans k² cells at k-cost train+assign — the O(√K)
    // face measured against the flat runs at K = k²
    if (args.lift(3).contains("imi")) {
      val ((cb1, cb2, half), tTrain) =
        timed(VS.trainImiCodebooks(e, k = k, iters = 3, sampleBuckets = 3))
      val (nPairs, tPairs) = timed(
        VS.imiDedupPairs(spread, cb1, cb2, half, aProbe = nAssign,
          threshold = 0.4).count())
      println(
        s"""{"metric":"scale_k_imi","sf":"$sfDir","n":$n,"kHalf":$k,""" +
          s""""cells":${k * k},"aProbe":$nAssign,""" +
          s""""train_sec":${f"$tTrain%.2f"},"pairs":$nPairs,""" +
          s""""pairs_sec":${f"$tPairs%.2f"}}""")
    } else {
      val (cents, tTrain) =
        timed(VS.trainIvfCodebook(e, k = k, iters = 3, sampleBuckets = 3))
      val (nPairs, tPairs) = timed(
        VS.semanticDedupPairs(spread, cents, nAssign = nAssign, threshold = 0.4)
          .count())
      val (nEdges, tGraph) = timed(
        VS.knnGraph(spread, cents, nAssign = nAssign, k = 5).count())
      println(
        s"""{"metric":"scale_k","sf":"$sfDir","n":$n,"k":$k,"nAssign":$nAssign,""" +
          s""""train_sec":${f"$tTrain%.2f"},"pairs":$nPairs,""" +
          s""""pairs_sec":${f"$tPairs%.2f"},"knn_edges":$nEdges,""" +
          s""""graph_sec":${f"$tGraph%.2f"}}""")
    }
    spark.stop()
  }
}
