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

  /** Surviving block count reported by the planned N5 scan. */
  private def scannedBlocks(df: DataFrame): Long = {
    val scans = df.queryExecution.executedPlan.collect {
      case b: BatchScanExec => b
    }
    assert(scans.length == 1, s"expected one N5 scan, got ${scans.length}")
    scans.head.scan.asInstanceOf[N5Scan].estimateStatistics()
      .numRows().getAsLong
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
}
