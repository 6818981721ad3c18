package graft.operators

import scala.collection.mutable.ArrayBuffer

import org.apache.spark.sql.{DataFrame, Row}
import org.apache.spark.sql.functions.col
import org.apache.spark.sql.types.{DoubleType, IntegerType, StructField, StructType}

/** Fully-parallel window ranking (r13) — the scale path for the q61 rank
  * family. `Window.partitionBy(k)` hash-partitions by the window key, so
  * a low-cardinality key (order status: 3 values) collapses a 100 TB
  * rank to 3 reducers no matter the cluster size — the window family's
  * measured worst-in-suite scaling (BASELINE.md: 8.2× per 10× data) is
  * this shape. Here the same ranks are computed with cluster-wide
  * parallelism:
  *
  *   1. range-repartition + partition-local sort on
  *      (partCols, orderSpec) — the distributed sort Spark already does
  *      for ORDER BY, parallel in the number of RANGES, not keys;
  *   2. one streaming pass per partition collects per (partition,
  *      window-group) boundary statistics — row/dense counts, first/last
  *      order values, leading/trailing tie-run lengths. ONE small row
  *      per group-fragment reaches the driver (≤ partitions + groups);
  *   3. the driver prefix-merges fragments per group (row offsets, dense
  *      offsets, tie runs continuing across partition boundaries,
  *      trailing-run extensions for cume_dist) and broadcasts the
  *      adjustment table;
  *   4. a second streaming pass emits global row_number / rank /
  *      dense_rank / percent_rank / cume_dist per row — narrow, no
  *      further exchange.
  *
  * Trade-offs, stated: the two streaming passes run as row-level
  * `mapPartitions` (the sanctioned last resort — this is genuinely
  * per-partition imperative logic with cross-row state), so they are
  * outside whole-stage codegen; the win is parallelism `#ranges` vs
  * `#distinct keys`, which dominates whenever keys ≪ cores. Tie runs
  * are buffered per run (cume_dist needs the run end); a single
  * pathological all-tied partition buffers that partition. Ranks emit
  * as Int, matching Spark's window functions.
  *
  * Semantics match `rank()/dense_rank()/percent_rank()/cume_dist()`
  * exactly (ties = equal order VALUES; percent_rank = (rank-1)/(N-1),
  * 0.0 at N=1; cume_dist = run-end/N) — DistributedRankSpec pins
  * equality against Spark's own windows on tied and untied columns, and
  * q153's oracle replays the definition in DuckDB.
  */
object DistributedRank {

  private case class Frag(
      pid: Int, partKey: Seq[Any], nRows: Long, nDense: Long,
      firstOrd: Seq[Any], lastOrd: Seq[Any], nLead: Long, nTrail: Long)

  private case class Adj(
      rowOff: Long, denseOff: Long, continues: Boolean,
      leadRunStartRow: Long, extraTrail: Long, n: Long)

  /** Hard ceiling on pass 1's driver-collected group fragments. The
    * contract is a LOW-CARDINALITY window key: fragments number at most
    * partitions + distinct keys (each partition holds fragments for the
    * keys its range covers, +1 per boundary), so a million of them means
    * the key is high-cardinality and stock `Window.partitionBy` — which
    * parallelizes across keys just fine in that regime — is the right
    * operator. Failing fast here beats a silent driver OOM
    * (ADVICE r13: nothing previously prevented a per-row key from
    * turning the collect into the row count).
    */
  val MaxFragments: Int = 1 << 20

  /** Append `rn`/`rnk`/`drnk`/`prnk`/`cd` (and with `ntileBuckets` set,
    * `nt`) columns over the window (partCols, orderSpec) with full
    * parallelism. `orderSpec` entries are (column, ascending).
    *
    * `ntileBuckets = Some(k)` emits Spark's `ntile(k)`: bucket sizes
    * floor(n/k) with the first n mod k buckets one larger — pure local
    * arithmetic from the global row number and group size already in
    * hand, no extra pass.
    *
    * Contract: partCols must be LOW-cardinality (the q61/q153 shape —
    * the whole point is ranges ≫ keys). Pass 1 collects one fragment
    * per (partition, group) to the driver; [[MaxFragments]] bounds that
    * loudly.
    */
  def withRanks(
      df: DataFrame, partCols: Seq[String],
      orderSpec: Seq[(String, Boolean)],
      numPartitions: Int = 0,
      ntileBuckets: Option[Int] = None): DataFrame = {
    require(ntileBuckets.forall(_ > 0), s"ntile buckets must be > 0")
    val spark = df.sparkSession
    val sortCols = partCols.map(col(_).asc) ++
      orderSpec.map { case (c, asc) => if (asc) col(c).asc else col(c).desc }
    val ranged =
      if (numPartitions > 0) df.repartitionByRange(numPartitions, sortCols: _*)
      else df.repartitionByRange(sortCols: _*)
    // freeze data + partitioning so both passes see identical layout
    val sorted = ranged.sortWithinPartitions(sortCols: _*).localCheckpoint()
    val schema = sorted.schema
    val pIdx = partCols.map(schema.fieldIndex).toArray
    val oIdx = orderSpec.map { case (c, _) => schema.fieldIndex(c) }.toArray

    def keyOf(r: Row, idx: Array[Int]): Seq[Any] = idx.toSeq.map(r.get)

    // ---- pass 1: per-partition group-fragment statistics --------------
    val fragsRdd = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      val out = ArrayBuffer.empty[Frag]
      var pk: Seq[Any] = null
      var first: Seq[Any] = null
      var last: Seq[Any] = null
      var nRows = 0L; var nDense = 0L; var nLead = 0L; var nTrail = 0L
      var leadOpen = false
      def flush(): Unit =
        if (pk != null) {
          out += Frag(pid, pk, nRows, nDense, first, last, nLead, nTrail)
          // executor-side guard: throw BEFORE a high-cardinality key's
          // fragments ever travel to (and OOM) the driver
          if (out.size > MaxFragments) throw new IllegalArgumentException(
            s"DistributedRank: partition $pid produced > $MaxFragments window-" +
              "group fragments — the partition key is high-cardinality, " +
              "which violates this operator's contract; use a stock " +
              "Window.partitionBy (it parallelizes across keys) instead")
        }
      it.foreach { r =>
        val k = keyOf(r, pIdx)
        val o = keyOf(r, oIdx)
        if (pk == null || k != pk) {
          flush()
          pk = k; first = o; last = o
          nRows = 1L; nDense = 1L; nLead = 1L; nTrail = 1L; leadOpen = true
        } else {
          nRows += 1
          if (o != last) { nDense += 1; last = o; nTrail = 1; leadOpen = false }
          else { nTrail += 1; if (leadOpen) nLead += 1 }
        }
      }
      flush()
      out.iterator
    }
    // TOTAL pre-count BEFORE the collect: the per-partition guard above
    // bounds each partition, but many partitions each under the cap could
    // still OOM the driver inside collect() before the old post-collect
    // require ever ran (ADVICE r14). The count job reuses the sort
    // shuffle; only Frag stats flow, never payload rows.
    val nFrags = fragsRdd.count()
    require(nFrags <= MaxFragments,
      s"DistributedRank: $nFrags window-group fragments exceed the " +
        s"$MaxFragments bound — partition key too high-cardinality for the " +
        "driver prefix-merge; use a stock Window.partitionBy instead")
    val frags: Array[Frag] = fragsRdd.collect()

    // ---- driver prefix-merge per window group -------------------------
    val adjMap = scala.collection.mutable.HashMap.empty[(Int, Seq[Any]), Adj]
    frags.groupBy(_.partKey).foreach { case (_, fs0) =>
      val fs = fs0.sortBy(_.pid)
      // backward sweep: trailing-run extension into later partitions
      val trailExt = new Array[Long](fs.length)
      var nextLeadExt = 0L
      var nextFirst: Seq[Any] = null
      for (i <- fs.indices.reverse) {
        val e = fs(i)
        trailExt(i) =
          if (nextFirst != null && nextFirst == e.lastOrd) nextLeadExt else 0L
        nextLeadExt = e.nLead + (if (e.nDense == 1L) trailExt(i) else 0L)
        nextFirst = e.firstOrd
      }
      val total = fs.map(_.nRows).sum
      // forward sweep: offsets + boundary tie runs
      var cumRows = 0L; var cumDense = 0L
      var prevLast: Seq[Any] = null
      var trailRunStart = 0L
      for (i <- fs.indices) {
        val e = fs(i)
        val continues = prevLast != null && e.firstOrd == prevLast
        val leadStart = if (continues) trailRunStart else cumRows + 1
        adjMap((e.pid, e.partKey)) = Adj(cumRows,
          cumDense - (if (continues) 1L else 0L),
          continues, leadStart, trailExt(i), total)
        trailRunStart =
          if (e.nDense == 1L && continues) trailRunStart
          else cumRows + e.nRows - e.nTrail + 1
        cumRows += e.nRows
        cumDense += e.nDense - (if (continues) 1L else 0L)
        prevLast = e.lastOrd
      }
    }
    val bc = spark.sparkContext.broadcast(adjMap.toMap)

    // ---- pass 2: streaming global ranks, tie runs buffered ------------
    val outSchema = StructType(schema.fields ++ (Seq(
      StructField("rn", IntegerType, nullable = false),
      StructField("rnk", IntegerType, nullable = false),
      StructField("drnk", IntegerType, nullable = false),
      StructField("prnk", DoubleType, nullable = false),
      StructField("cd", DoubleType, nullable = false)) ++
      ntileBuckets.map(_ => StructField("nt", IntegerType, nullable = false))))
    // Spark's ntile(k): the first (n mod k) buckets hold floor(n/k)+1
    // rows, the rest floor(n/k); nt is derived from the global row
    // number alone
    def ntileOf(gRow: Long, n: Long, k: Int): Int = {
      val base = n / k
      val extra = n % k
      val bigSpan = (base + 1) * extra
      if (base == 0) gRow.toInt // fewer rows than buckets: row i -> bucket i
      else if (gRow <= bigSpan) ((gRow + base) / (base + 1)).toInt
      else (extra + (gRow - bigSpan + base - 1) / base).toInt
    }
    val outRdd = sorted.rdd.mapPartitionsWithIndex { (pid, it) =>
      val adjs = bc.value
      new Iterator[Row] {
        private val buf = scala.collection.mutable.Queue.empty[Row]
        private var pk: Seq[Any] = null
        private var adj: Adj = null
        private var localRow = 0L
        private var localDense = 0L
        private var runStartLocal = 0L
        private var curOrd: Seq[Any] = null
        private val run = ArrayBuffer.empty[(Row, Long, Long, Long)]
        private var pending: Row = _

        private def emitRun(runEndGlobal: Long): Unit = {
          run.foreach { case (r, gRow, gRank, gDense) =>
            val n = adj.n
            val prnk = if (n > 1) (gRank - 1).toDouble / (n - 1) else 0.0
            val cd = runEndGlobal.toDouble / n
            val base = Seq[Any](gRow.toInt, gRank.toInt, gDense.toInt, prnk, cd)
            buf += Row.fromSeq(r.toSeq ++
              (base ++ ntileBuckets.map(k => ntileOf(gRow, n, k))))
          }
          run.clear()
        }
        private def closeGroup(): Unit = if (adj != null && run.nonEmpty) {
          // the group's trailing run may extend into later partitions
          emitRun(adj.rowOff + localRow + adj.extraTrail)
        }
        private def accept(r: Row): Unit = {
          val k = keyOf(r, pIdx)
          val o = keyOf(r, oIdx)
          if (pk == null || k != pk) {
            closeGroup()
            pk = k
            adj = adjs((pid, k))
            localRow = 0L; localDense = 0L; runStartLocal = 1L; curOrd = null
          }
          localRow += 1
          if (curOrd == null) { curOrd = o; localDense = 1L; runStartLocal = 1L }
          else if (o != curOrd) {
            // run closed inside this partition: end = previous local row
            emitRun(adj.rowOff + localRow - 1)
            curOrd = o; localDense += 1; runStartLocal = localRow
          }
          val gRow = adj.rowOff + localRow
          val inLeadRun = runStartLocal == 1L
          val gRank =
            if (inLeadRun && adj.continues) adj.leadRunStartRow
            else adj.rowOff + runStartLocal
          val gDense = adj.denseOff + localDense
          run += ((r, gRow, gRank, gDense))
        }
        def hasNext: Boolean = {
          while (buf.isEmpty && it.hasNext) accept(it.next())
          if (buf.isEmpty) { closeGroup(); adj = null }
          buf.nonEmpty
        }
        def next(): Row = buf.dequeue()
      }
    }
    spark.createDataFrame(outRdd, outSchema)
  }
}
