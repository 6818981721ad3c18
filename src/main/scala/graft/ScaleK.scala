package graft

import org.apache.spark.sql.SparkSession
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
  * Usage: graft.ScaleK <sfDir> <k> <nAssign> — run with k ∝ corpus size
  * (e.g. 32 @ sf0.1, 128 @ sf1, 512 @ sf10) and compare rows/sec across
  * the three points; BASELINE.md records the resulting curve.
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
    // optional 4th arg "imimp" (r15): the margin-gated symmetric
    // multi-probe face — k per half (0 = the production scaledKHalf
    // formula), arg 3 is the per-half probe cap, arg 5 the margin; also
    // reports the assignment expansion (rows per vector) and, when a 6th
    // arg "flat" is given, the flat quantizer's pairs at the SAME cell
    // count for the recall ratio the VERDICT r14 #2 pin needs
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
