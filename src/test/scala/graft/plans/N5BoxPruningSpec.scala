package graft.plans

import graft.SparkSpec
import graft.n5.N5
import graft.sources.n5.N5Scan
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.execution.datasources.v2.BatchScanExec
import org.apache.spark.sql.functions._

/** The N5BoxPruning analyzer rule: ad-hoc range predicates on the element
  * view must prune block FILES in the DSv2 scan (fixture grid is 2×2×1,
  * blockSize 128³, dims 186×226×27), and must never change results.
  */
class N5BoxPruningSpec extends SparkSpec {

  private val root = "/root/reference/data/test.n5"
  private val ds = "mri/c0/s0"

  private def elems: DataFrame = N5.elements(N5.read(spark, root, ds))

  /** N5 scans in the planned physical plan (unwrapping AQE). */
  private def scansOf(df: DataFrame): Seq[N5Scan] = {
    val plan = df.queryExecution.executedPlan match {
      case a: org.apache.spark.sql.execution.adaptive.AdaptiveSparkPlanExec =>
        a.executedPlan
      case p => p
    }
    plan.collect { case b: BatchScanExec => b.scan.asInstanceOf[N5Scan] }
  }

  /** Surviving block count reported by the planned N5 scan. */
  private def scannedBlocks(df: DataFrame): Long = {
    val scans = scansOf(df)
    assert(scans.length == 1, s"expected one N5 scan, got ${scans.length}")
    scans.head.estimateStatistics().numRows().getAsLong
  }

  test("x upper bound prunes to the gx=0 block column") {
    val df = elems.filter(col("x") < 100)
    assert(scannedBlocks(df) == 2)
    assert(df.count() == 100L * 226 * 27)
  }

  test("two-axis box prunes to a single block") {
    val df = elems.filter(col("x") < 100 && col("y") >= 130)
    assert(scannedBlocks(df) == 1)
    assert(df.count() == 100L * 96 * 27)
    // values agree with the explicit readBox API on the same box
    val viaRule = df.agg(sum(col("v"))).collect()(0).getLong(0)
    val viaReadBox = N5.readBox(spark, root, ds,
      Array(0L, 130L, 0L), Array(100L, 226L, 27L))
      .agg(sum(col("v"))).collect()(0).getLong(0)
    assert(viaRule == viaReadBox)
  }

  test("equality predicate prunes to one block column") {
    val df = elems.filter(col("x") === 150)
    assert(scannedBlocks(df) == 2) // gx=1 column: blocks (1,0,0),(1,1,0)
    assert(df.count() == 226L * 27)
  }

  test("between and literal-first forms prune") {
    val between = elems.filter(col("x").between(50, 60))
    assert(scannedBlocks(between) == 2)
    assert(between.count() == 11L * 226 * 27)
    val litFirst = elems.filter(lit(100) > col("x"))
    assert(scannedBlocks(litFirst) == 2)
    assert(litFirst.count() == 100L * 226 * 27)
  }

  test("chained filters prune cumulatively without duplicating") {
    val df = elems.filter(col("x") < 100).filter(col("y") >= 130)
    assert(scannedBlocks(df) == 1)
    assert(df.count() == 100L * 96 * 27)
  }

  test("disjunctions are not pruned but stay correct") {
    val df = elems.filter(col("x") < 10 || col("y") < 10)
    assert(scannedBlocks(df) == 4) // conservative: no pruning through OR
    assert(df.count() == 10L * 226 * 27 + 186L * 10 * 27 - 10L * 10 * 27)
  }

  test("non-axis filters leave the scan untouched") {
    val df = elems.filter(col("v") > 200)
    assert(scannedBlocks(df) == 4)
  }

  test("renamed coordinate column still prunes (alias keeps metadata)") {
    val df = elems.select(col("x").as("px"), col("v")).filter(col("px") < 100)
    assert(scannedBlocks(df) == 2)
    assert(df.count() == 100L * 226 * 27)
  }

  test("derived coordinate expressions never prune") {
    // (x * 2) < 100 implies x < 50 but the rule must NOT reason about
    // arbitrary arithmetic — no metadata on the derived alias, no pruning
    val df = elems.select((col("x") * 2).as("dx"), col("v"))
      .filter(col("dx") < 100)
    assert(scannedBlocks(df) == 4)
    assert(df.count() == 50L * 226 * 27)
  }

  test("filter above a two-relation join is conservatively skipped") {
    val a = elems.select(col("x"), col("v").as("va"))
    val b = elems.select(col("x").as("bx"), col("v").as("vb"))
    val joined = a.join(b, col("x") === col("bx"))
      .filter(col("x") === 0 && col("va") === col("vb"))
    val scans = scansOf(joined)
    assert(scans.length == 2)
    // the filter's subtree holds two N5 relations -> no pruning on either
    scans.foreach(s =>
      assert(s.estimateStatistics().numRows().getAsLong == 4))
    // x===0 matches y*z pairs from gx=0 blocks on both sides, self-equijoined
    assert(joined.count() > 0)
  }

  test("a window between the filter and the scan blocks pruning") {
    import org.apache.spark.sql.expressions.Window
    // row_number must rank ALL voxels of each z-slice; pruning below the
    // window would silently renumber — the rule must bail on the unsafe path
    val w = Window.partitionBy(col("z")).orderBy(col("y"), col("x"))
    val df = elems.withColumn("r", row_number().over(w))
      .filter(col("x") < 100)
    assert(scannedBlocks(df) == 4, "pruning through a Window is unsound")
    val maxR = df.agg(max(col("r"))).collect()(0).getInt(0)
    assert(maxR == 225 * 186 + 99 + 1, s"rank computed over pruned input: $maxR")
  }

  test("re-analysis of a growing plan does not stack duplicate grid filters") {
    var df = elems.filter(col("x") < 100).filter(col("y") >= 130)
    // each chained operation re-analyzes the whole tree and re-runs the rule
    (1 to 4).foreach(_ => df = df.select(col("x"), col("y"), col("z"), col("v")))
    df = df.filter(col("v") >= 0)
    val filters = df.queryExecution.analyzed.collect {
      case f: org.apache.spark.sql.catalyst.plans.logical.Filter => f
    }
    // 3 user filters + exactly one injected filter per axis bound (x, y)
    assert(filters.length <= 5, s"grid filters stacked: ${filters.length}")
    assert(scannedBlocks(df) == 1)
    assert(df.count() == 100L * 96 * 27)
  }

  test("filters applied per side before a join prune each side") {
    val a = elems.filter(col("x") < 100).select(col("x"), col("y"), col("v").as("va"))
    val b = elems.filter(col("x") >= 130).select(col("x").as("bx"), col("y").as("by"), col("v").as("vb"))
    val joined = a.join(b, col("y") === col("by") && col("x") === col("bx") - 130)
    val counts = scansOf(joined)
      .map(_.estimateStatistics().numRows().getAsLong)
    assert(counts.sorted == Seq(2L, 2L), s"per-side pruning missing: $counts")
  }
}
