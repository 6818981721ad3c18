package graft

import org.apache.spark.sql.catalyst.plans.physical.HashPartitioning
import org.apache.spark.sql.execution.ExplainMode
import org.apache.spark.sql.execution.exchange.ShuffleExchangeExec
import org.apache.spark.sql.functions.col

/** Physical-plan regression guards for the scale-critical properties the
  * engine relies on (SURVEY §4): predicate pushdown into the parquet scan,
  * column pruning, broadcast joins for dimension tables, map-side partial
  * aggregation, and top-k via TakeOrdered instead of a global sort. These
  * are the properties that decide whether a plan survives a 100× scale-up,
  * so they are pinned here rather than trusted to stay accidental.
  */
class PlanAuditSpec extends SparkSpec {

  private val sf = "/root/testdata/sf0.001"

  private def formatted(name: String): String =
    Queries.byName(name).build(spark, sf)
      .queryExecution.explainString(ExplainMode.fromString("formatted"))

  /** Hash-partitioning shuffle exchanges actually present in the physical
    * plan tree. Counting plan NODES (not formatted-explain text — in
    * 'formatted' mode the operator name and its hashpartitioning arguments
    * are on separate lines, so a string regex always finds zero) with AQE
    * disabled so the prepared plan still contains its exchanges.
    */
  private def hashExchanges(name: String): Seq[ShuffleExchangeExec] = {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      Queries.byName(name).build(spark, sf)
        .queryExecution.executedPlan.collect {
          case e: ShuffleExchangeExec
              if e.outputPartitioning.isInstanceOf[HashPartitioning] => e
        }
    } finally spark.conf.set(key, prev)
  }

  test("q03: filter predicates are pushed into the parquet scan") {
    val p = formatted("q03_filter_forecast_revenue")
    assert(p.contains("GreaterThanOrEqual(l_shipdate"), "shipdate range not pushed")
    assert(p.contains("LessThan(l_quantity,24.0)"), "quantity bound not pushed")
  }

  test("q03: scan reads only the four referenced columns") {
    val p = formatted("q03_filter_forecast_revenue")
    val readSchema = p.linesIterator.find(_.startsWith("ReadSchema:")).get
    assert(!readSchema.contains("l_comment") && !readSchema.contains("l_orderkey"),
      s"scan reads more than it needs: $readSchema")
    assert(readSchema.contains("l_extendedprice") && readSchema.contains("l_discount"))
  }

  test("q01: aggregation is map-side partial before the exchange") {
    val p = formatted("q01_agg_pricing_summary")
    assert(p.contains("partial_sum"), "no map-side combine in Q1 aggregation")
  }

  test("q05: dimension join is a broadcast hash join") {
    val p = formatted("q05_join_broadcast")
    assert(p.contains("BroadcastHashJoin"), "nation join should broadcast")
  }

  test("q06: top-10 is TakeOrdered, customer side broadcasts") {
    val p = formatted("q06_join_shipping_priority")
    assert(p.contains("TakeOrderedAndProject"),
      "LIMIT after ORDER BY must plan as TakeOrdered, not a global sort")
    assert(p.contains("BroadcastHashJoin"), "filtered customer dim should broadcast")
  }

  test("q09: semi join plans as LeftSemi") {
    assert(formatted("q09_join_semi").contains("LeftSemi"))
  }

  test("q41: probe-side cosine top-k is broadcast + TakeOrdered") {
    val p = formatted("q41_cosine_topk")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"))
    assert(p.contains("TakeOrderedAndProject"))
  }

  test("q42: minhash signatures are row-local; first exchange is the band join") {
    val p = formatted("q42_dedup_minhash_lsh")
    assert(p.contains("minhash_sigs"),
      "signatures must come from the native row-local kernel")
    // exactly TWO hash exchanges: the band-bucket groupBy and the final
    // candidate-pair distinct. A third would mean the per-doc signature
    // agg crept back in.
    val shuffles = hashExchanges("q42_dedup_minhash_lsh")
    assert(shuffles.size == 2,
      s"expected band-bucket + pair-distinct exchanges only, found " +
        s"${shuffles.size}: ${shuffles.mkString("; ")}")
  }

  test("q34: global top-k avoids a full sort") {
    assert(formatted("q34_topk_sort").contains("TakeOrderedAndProject"))
  }

  test("q59: IVF probe join broadcasts; assignment adds no extra exchange") {
    val p = formatted("q59_ann_ivf")
    assert(p.contains("BroadcastHashJoin"),
      "probe-cells side must broadcast — the corpus side may not shuffle for the join")
    // the only exchanges allowed are the probe broadcast and the window's
    // per-pid hash partitioning; cell ASSIGNMENT must stay narrow
    val shuffles = hashExchanges("q59_ann_ivf")
    assert(shuffles.size <= 12,
      s"IVF plan has ${shuffles.size} hash exchanges: ${shuffles.mkString("; ")}")
  }

  test("q110: type filters reach the scans; time bound rides the user equi-join") {
    val p = formatted("q110_stream_stream_join")
    assert(p.contains("EqualTo(event_type,click)"), "click filter not pushed")
    assert(p.contains("EqualTo(event_type,purchase)"), "purchase filter not pushed")
    // the 60-minute range must be a residual on the user_id equi-join, not
    // a join strategy of its own — a nested-loop here is quadratic at scale
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "stream-stream join must plan as an equi-join on user_id")
  }

  test("q111: pair generation is keyed on shared cells, never a product") {
    val p = formatted("q111_dedup_semantic_cells")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "cell-restricted pairing must plan as an equi-join on cell — " +
        "a product would silently reintroduce the n² q45 shape")
    // r16: the pairing is the grouped block kernel (one cell-keyed
    // aggregate feeding a MapPartitions pair loop) — the candidate space
    // is still Σ n_c², never n², but no join node remains; accept either
    // the kernel shape or the legacy keyed join
    assert((p.contains("HashAggregate") && p.contains("MapPartitions"))
        || p.contains("BroadcastHashJoin") || p.contains("SortMergeJoin")
        || p.contains("ShuffledHashJoin"),
      "expected the cell-keyed grouped pair kernel (or a keyed join) " +
        "for intra-cell pair generation")
  }

  test("q112: outer stream-stream join keeps the q110 pushed-filter equi-join shape") {
    val p = formatted("q112_stream_stream_outer")
    assert(p.contains("EqualTo(event_type,click)"), "click filter not pushed")
    assert(p.contains("EqualTo(event_type,purchase)"), "purchase filter not pushed")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "outer stream-stream join must plan as an equi-join on user_id — " +
        "the time bound is a residual, never a join strategy")
  }

  test("q113: survivor labeling is a keyed join; no product anywhere in the pass") {
    // the closure itself runs ConnectedComponents (lineage truncated per
    // round, so its rounds don't appear here); what must stay pinned is
    // that the visible plan — pair generation feeding the closure and the
    // final corpus ⟕ component labeling — contains only keyed joins.
    val p = formatted("q113_dedup_semantic_survivors")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "semantic-survivor pass must never plan a product")
  }

  test("q115: knn-graph candidates form cell-locally, never a product") {
    val p = formatted("q115_knn_graph")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "kNN-graph candidate generation must stay cell-keyed — a product is the n² shape")
    // r19: the cell self-join gave way to the grouped block kernel — the
    // candidate space forms inside a per-cell collect_list aggregation
    // (one cell-keyed exchange), so the pin is the grouped-kernel shape
    // rather than a join operator
    assert(p.contains("collect_list"),
      "expected the per-cell grouped kernel (collect_list over cell)")
  }

  test("q115: the full candidate set shuffles at most once (two-stage top-k)") {
    // stage-1 per-(cell, src) ranking must reuse the cell join's hash
    // partitioning (HashPartitioning(cell) satisfies the window's
    // ClusteredDistribution(cell, src)) — only the ≤ nAssign·k survivors
    // per src may reach the dedup + global-rank exchanges. Exchange
    // budget: ≤ 2 for the join sides (scored candidates), and everything
    // after stage 1 operates on the pruned set. A third full-candidate
    // exchange means the stage-1 window regressed into its own shuffle.
    val shuffles = hashExchanges("q115_knn_graph")
    assert(shuffles.size <= 4,
      s"knn-graph has ${shuffles.size} hash exchanges — stage-1 ranking " +
        "must ride the join partitioning, not add a full-candidate shuffle")
    val cellKeyed = shuffles.count(
      _.outputPartitioning.asInstanceOf[HashPartitioning]
        .expressions.exists(_.toString.contains("cell")))
    assert(cellKeyed <= 2,
      s"$cellKeyed cell-keyed exchanges — the candidate set shuffled more than once per side")
  }

  test("q114: mixture rates broadcast back; the corpus is never shuffled for the rate join") {
    // the rate table (one row per domain) must reach the corpus as a
    // BroadcastHashJoin on the domain key; the only products allowed are
    // the single-row total⨯counts broadcasts (5×1 rows). A CartesianProduct
    // would mean the corpus side itself entered an unkeyed join.
    val p = formatted("q114_domain_mixture")
    assert(p.contains("BroadcastHashJoin"),
      "per-domain rate table must broadcast — the corpus side streams once")
    assert(!p.contains("CartesianProduct"),
      "mixture pass must not plan an unbroadcast product")
  }

  test("q95: boilerplate gram agg keeps its map-side combine") {
    assert(formatted("q95_boilerplate_ngrams").contains("partial_count"),
      "gram doc-frequency agg lost map-side partial aggregation")
  }

  test("q96: gram chain evaluates once; agg in exactly two hash exchanges") {
    val p = formatted("q96_repetition_filter")
    // the r5 regression: CollapseProject/filter-pushdown inlined the gram
    // array into every consumer, re-running tokenization ~6x per row. The
    // explode+agg shape evaluates the tokenize chain in exactly ONE
    // Project node. (r19: the chain's tokenizer is the ws_tokens kernel,
    // not regexp_replace+split — count the kernel.)
    assert("ws_tokens".r.findAllIn(p).size == 1,
      "tokenize chain duplicated across plan nodes again")
    val shuffles = hashExchanges("q96_repetition_filter")
    assert(shuffles.size == 2,
      s"expected (doc_id,gram) + doc_id agg exchanges only, found " +
        s"${shuffles.size}: ${shuffles.mkString("; ")}")
    assert(p.contains("partial_count"), "per-doc counts lost map-side combine")
  }

  test("q97: contamination probe side broadcasts") {
    assert(formatted("q97_contamination_scan").contains("BroadcastHashJoin"),
      "probe grams must broadcast — the corpus side may not shuffle for the join")
  }

  test("q100: trained-IVF index scan is bucket-pruned to the probed cells") {
    // building the query trains the codebook and writes the cell-bucketed
    // index table as a side effect (bounded: sf0.001, 500 vectors)
    val p = formatted("q100_ann_ivf_trained")
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(p)
      .getOrElse(fail(s"index scan is not bucketed:\n$p"))
    assert(sel.group(1).toInt < sel.group(2).toInt,
      s"probe cells selected ${sel.group(1)} of ${sel.group(2)} buckets — no pruning")
    assert(p.contains("BroadcastHashJoin"), "probe-cells side must broadcast")
  }

  test("q104: IVF-PQ scan is bucket-pruned and carries codes, not vectors") {
    val p = formatted("q104_ann_ivfpq")
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(p)
      .getOrElse(fail(s"index scan is not bucketed:\n$p"))
    assert(sel.group(1).toInt < sel.group(2).toInt,
      s"probe cells selected ${sel.group(1)} of ${sel.group(2)} buckets — no pruning")
    // the stored index exposes only (vec_id, cell, codes) — the scan must
    // not read a raw embedding column
    val readSchema = p.linesIterator
      .filter(_.contains("ReadSchema:"))
      .find(_.contains("codes"))
      .getOrElse(fail("no codes-table scan in the plan"))
    assert(!readSchema.contains("embedding"),
      s"IVF-PQ scan reads raw vectors: $readSchema")
  }

  test("q105/q106: probe-only plans have zero training stages, pruned scans") {
    // build (or recover) the catalog FIRST so constructing the probe
    // queries below does no training work at all
    graft.functions.AnnIndex.ensure(spark, sf)
    for (name <- Seq("q105_ann_ivf_probe", "q106_ann_ivfpq_probe")) {
      val p = formatted(name)
      // training would appear as HashAggregate stages (k-means / PQ means
      // are keyed aggregations); the probe plan is scan + broadcast join
      // + window only
      assert(!p.contains("HashAggregate"),
        s"$name probe plan contains an aggregation — training leaked in:\n$p")
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(p)
        .getOrElse(fail(s"$name index scan is not bucketed:\n$p"))
      assert(sel.group(1).toInt < sel.group(2).toInt,
        s"$name selected ${sel.group(1)} of ${sel.group(2)} buckets — no pruning")
    }
    // the probe-side scan of the codes index must stay vector-free
    val readSchema = formatted("q106_ann_ivfpq_probe").linesIterator
      .filter(_.contains("ReadSchema:"))
      .find(_.contains("codes"))
      .getOrElse(fail("no codes-table scan in the q106 plan"))
    assert(!readSchema.contains("embedding"),
      s"probe-only IVF-PQ scan reads raw vectors: $readSchema")
  }

  test("q206: the persisted-IMI probe plan has zero training stages and a " +
      "pruned bucketed scan (r14)") {
    // build (or recover) the IMI catalog FIRST — constructing the probe
    // plan below must do no training work
    graft.functions.AnnIndex.ensureImi(spark, sf)
    val p = formatted("q206_ann_imi_probe")
    assert(!p.contains("HashAggregate"),
      s"q206 probe plan contains an aggregation — training leaked in:\n$p")
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(p)
      .getOrElse(fail(s"q206 index scan is not bucketed:\n$p"))
    assert(sel.group(1).toInt < sel.group(2).toInt,
      s"q206 selected ${sel.group(1)} of ${sel.group(2)} buckets — no pruning")
  }

  test("q106: probe-only execution schedules no training- or write-shaped jobs") {
    graft.functions.AnnIndex.ensure(spark, sf)
    // job-level pin of the lifecycle split, keyed to job CONTENT rather
    // than a raw count (a raw ceiling flakes with AQE's stage-to-job
    // accounting across Spark versions): with the catalog built, every
    // job this query schedules must be probe-shaped. Training betrays
    // itself by its call sites — the Lloyd rounds are collect()s issued
    // inside VectorSearch's trainers, and an index (re)write is a
    // saveAsTable — so the stage names, which carry the action call
    // site, must show neither.
    spark.sparkContext.setJobGroup("q106-probe-audit", "probe-only audit")
    try Queries.byName("q106_ann_ivfpq_probe").build(spark, sf).collect()
    finally spark.sparkContext.clearJobGroup()
    val tracker = spark.sparkContext.statusTracker
    // the status store is fed asynchronously — give the last job's
    // stages a beat to land before reading them
    val deadline = System.nanoTime + 10L * 1000 * 1000 * 1000
    def stageNames: Seq[String] = tracker.getJobIdsForGroup("q106-probe-audit")
      .toSeq.flatMap(id => tracker.getJobInfo(id).toSeq)
      .flatMap(_.stageIds().toSeq)
      .flatMap(sid => tracker.getStageInfo(sid).toSeq)
      .map(_.name())
    // poll until the job set is STABLE across two reads 100ms apart —
    // re-reading immediately after the first read always saw zero growth
    // and skipped the wait entirely, letting the assertions run on a
    // partially populated store
    var names = stageNames
    var stable = false
    while (System.nanoTime < deadline && !stable) {
      Thread.sleep(100)
      val n = stageNames
      stable = n.size == names.size
      names = n
    }
    assert(names.nonEmpty, "no stages recorded for the probe job group")
    // writes are saveAsTable/insertInto call sites; "parquet at" would be
    // a read-side schema job (Tables.load) and is legitimately probe-shaped
    val trainingShaped = names.filter(n =>
      n.startsWith("collect at VectorSearch") || n.contains("saveAsTable")
        || n.contains("insertInto"))
    assert(trainingShaped.isEmpty,
      s"probe-only path scheduled training/write-shaped stages: $trainingShaped")
    // generous drift-tolerant ceiling as a backstop (measured 11 jobs;
    // a training chain adds ~19 more)
    val jobs = tracker.getJobIdsForGroup("q106-probe-audit").length
    assert(jobs <= 25,
      s"probe-only path scheduled $jobs jobs — training is leaking into the probe")
  }

  test("q108: the appended index scan still bucket-prunes, vector-free") {
    // building the query runs the base build + delta append side effects,
    // then returns the probe plan over the APPENDED codes table — the pin
    // is that appended files join the same bucket layout (pruning intact)
    // and the scan stays on (vec_id, cell, codes)
    val p = formatted("q108_ann_index_append")
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findFirstMatchIn(p)
      .getOrElse(fail(s"appended index scan is not bucketed:\n$p"))
    assert(sel.group(1).toInt < sel.group(2).toInt,
      s"probe cells selected ${sel.group(1)} of ${sel.group(2)} buckets — no pruning")
    val readSchema = p.linesIterator
      .filter(_.contains("ReadSchema:"))
      .find(_.contains("codes"))
      .getOrElse(fail("no codes-table scan in the q108 plan"))
    assert(!readSchema.contains("embedding"),
      s"appended IVF-PQ scan reads raw vectors: $readSchema")
  }

  test("q109: tombstone exclusion is a broadcast anti-join; pruned, vector-free scan") {
    // building the query runs the build+append+delete side effects, then
    // returns the probe plan over the appended-minus-tombstoned index.
    // The pins: (1) the tombstone anti-join BROADCASTS — a shuffled
    // (sort-merge) anti-join would re-shuffle the whole index for a
    // deletion list that is small between compactions by contract;
    // (2) bucket pruning and the vector-free codes scan survive the
    // extra join.
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val qe = Queries.byName("q109_ann_index_delete").build(spark, sf)
        .queryExecution
      import org.apache.spark.sql.catalyst.plans.LeftAnti
      val bAnti = qe.executedPlan.collect {
        case j: org.apache.spark.sql.execution.joins.BroadcastHashJoinExec
            if j.joinType == LeftAnti => j
      }
      assert(bAnti.nonEmpty,
        s"tombstone anti-join is not a broadcast hash join:\n${qe.executedPlan}")
      val shuffledAnti = qe.executedPlan.collect {
        case j: org.apache.spark.sql.execution.joins.SortMergeJoinExec
            if j.joinType == LeftAnti => j
        case j: org.apache.spark.sql.execution.joins.ShuffledHashJoinExec
            if j.joinType == LeftAnti => j
      }
      assert(shuffledAnti.isEmpty,
        "tombstone anti-join shuffled the index side")
      val p = qe.explainString(ExplainMode.fromString("formatted"))
      val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
        .findFirstMatchIn(p)
        .getOrElse(fail(s"tombstoned index scan is not bucketed:\n$p"))
      assert(sel.group(1).toInt < sel.group(2).toInt,
        s"probe cells selected ${sel.group(1)} of ${sel.group(2)} buckets — no pruning")
      val readSchema = p.linesIterator
        .filter(_.contains("ReadSchema:"))
        .find(_.contains("codes"))
        .getOrElse(fail("no codes-table scan in the q109 plan"))
      assert(!readSchema.contains("embedding"),
        s"tombstoned IVF-PQ scan reads raw vectors: $readSchema")
    } finally spark.conf.set(key, prev)
  }

  test("q107: rerank fetches candidates via broadcast; vectors never shuffle") {
    graft.functions.AnnIndex.ensure(spark, sf)
    val p = formatted("q107_ann_ivfpq_rerank")
    assert(p.contains("BroadcastHashJoin"),
      "candidate list must broadcast against the vectors table")
    // the raw-vector side may not hash-shuffle for the rerank join — the
    // only hash exchange allowed is the per-pid window partitioning
    val shuffles = hashExchanges("q107_ann_ivfpq_rerank")
    assert(shuffles.size <= 2,
      s"rerank plan has ${shuffles.size} hash exchanges: ${shuffles.mkString("; ")}")
    // BOTH index scans prune: the vector-free codes scan (ADC stage) AND
    // the raw-vector fetch for the rerank — candidates live in the probed
    // cells by construction, so a full vectors scan would be a scale bug
    val sel = "SelectedBucketsCount: (\\d+) out of (\\d+)".r
      .findAllMatchIn(p).toSeq
    assert(sel.size >= 2,
      s"expected two bucket-pruned scans (codes + vectors), found ${sel.size}")
    sel.foreach(m => assert(m.group(1).toInt < m.group(2).toInt,
      s"scan selected ${m.group(1)} of ${m.group(2)} buckets — no pruning"))
  }

  test("q81: element stats run on the columnar n5 scan") {
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val p = Queries.byName("q81_n5_element_stats").build(spark, sf)
        .queryExecution.executedPlan.toString
      // the elements view must reach codegen through the vectorized
      // bridge, not via block rows + posexplode
      assert(p.contains("ColumnarToRow"),
        s"element scan is not columnar:\n$p")
      assert(!p.contains("Generate"),
        s"posexplode generator crept back into the element path:\n$p")
    } finally spark.conf.set(key, prev)
  }

  test("box predicates prune the columnar element scan to one block file") {
    // fixture grid is 2x2x1 (128^3 blocks over 186x226x27): the q86-shaped
    // box x<100 && y>=130 && z<16 intersects exactly block (0,1,0).
    // maxBlocksPerPartition=1 makes partitions == surviving block FILES,
    // so the count is a direct pruning observation (grouping would
    // otherwise pack all four 2 MiB blocks into one 128 MiB partition and
    // the assertion would hold even with pruning broken)
    def partsFor(filtered: org.apache.spark.sql.DataFrame => org.apache.spark.sql.DataFrame): Int = {
      val df = filtered(spark.read.format("n5")
        .option("dataset", "mri/c0/s0")
        .option("view", "elements")
        .option("maxBlocksPerPartition", "1")
        .load("/root/reference/data/test.n5"))
      val scans = df.queryExecution.executedPlan.collect {
        case b: org.apache.spark.sql.execution.datasources.v2.BatchScanExec => b
      }
      assert(scans.nonEmpty, "no v2 batch scan in the plan")
      scans.head.inputRDD.getNumPartitions
    }
    assert(partsFor(identity) == 4, "fixture should expose 4 block files")
    assert(partsFor(_.filter(col("x") < 100 && col("y") >= 130 && col("z") < 16)) == 1,
      "x/y/z pushdown should prune the scan to the single intersecting block")
  }

  test("q68: quantization is narrow — only the final total-order exchange") {
    val shuffles = hashExchanges("q68_embedding_quantize")
    assert(shuffles.isEmpty,
      s"per-row quantization must not hash-shuffle, found ${shuffles.size}: " +
        shuffles.mkString("; "))
  }

  test("q69: corpus pipeline runs in exactly two hash exchanges") {
    // one for the digest window (dedup), one for the split aggregation;
    // quality scoring and token counting must stay fused into narrow stages
    val shuffles = hashExchanges("q69_corpus_pipeline")
    assert(shuffles.size == 2,
      s"expected digest + split exchanges only, found ${shuffles.size}: " +
        shuffles.mkString("; "))
    val p = formatted("q69_corpus_pipeline")
    assert(p.contains("partial_count") || p.contains("partial_sum"),
      "split aggregation lost its map-side combine")
  }

  test("q125: typed grouped-map plans ONE hash exchange and rides the " +
      "secondary sort on the shuffle's partition-local sort") {
    // flatMapSortedGroups' contract at scale: the per-group event-order
    // iteration must come from the shuffle's own per-partition sort, not
    // a second exchange or a global sort — one hash exchange on the key,
    // then a LOCAL SortExec over (key, date, orderkey) feeding MapGroups.
    val shuffles = hashExchanges("q125_grouped_map_typed")
    assert(shuffles.size == 1,
      s"grouped-map should shuffle once (got ${shuffles.size})")
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val sorts = Queries.byName("q125_grouped_map_typed").build(spark, sf)
        .queryExecution.executedPlan.collect {
          case s: org.apache.spark.sql.execution.SortExec => s
        }
      val local = sorts.filter(!_.global)
      assert(local.size == 1,
        s"expected exactly the grouped-map's partition-local sort, got $sorts")
      assert(local.head.sortOrder.size == 3,
        s"local sort must cover key + the two secondary-sort columns: " +
          s"${local.head.sortOrder}")
      // the only global sort is the presentation orderBy
      assert(sorts.count(_.global) == 1)
    } finally spark.conf.set(key, prev)
  }

  test("q126: typed cogroup co-partitions both sides with one exchange " +
      "each and nothing after") {
    // CoGroup's contract at scale: each side is hash-exchanged on its
    // key ONCE (elidable entirely under a shared bucket layout) and the
    // merged iterators stream — no broadcast, no post-cogroup shuffle
    // except the presentation sort.
    val shuffles = hashExchanges("q126_cogroup_reconcile")
    assert(shuffles.size == 2,
      s"cogroup should shuffle each side exactly once (got ${shuffles.size})")
  }

  test("q128: exact-k sample is TakeOrdered, never a global sort") {
    val p = formatted("q128_sample_exact_k")
    assert(p.contains("TakeOrderedAndProject"),
      s"exact-k carve-out fell back to a global sort:\n$p")
    assert(!p.contains("Exchange rangepartitioning"),
      "exact-k sample must not range-shuffle the corpus")
  }

  test("runtime bloom filter injects on a selective fact-fact join") {
    // the 100 TB lever Catalyst ships for big-big joins neither side of
    // which broadcasts: a bloom filter built from the SELECTIVE side's
    // join keys is injected into the other side's scan, discarding
    // non-matching rows BEFORE the shuffle. Default thresholds target
    // cluster-sized inputs, so pin the capability with them lowered —
    // the plan must carry might_contain on the lineitem side.
    val confs = Seq(
      "spark.sql.optimizer.runtime.bloomFilter.enabled" -> "true",
      "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold" -> "0",
      "spark.sql.optimizer.runtime.bloomFilter.creationSideThreshold" -> "100MB",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      val o = graft.Tables.load(spark, sf, "orders")
        .filter(col("o_totalprice") > 500000) // selective creation side
      val li = graft.Tables.load(spark, sf, "lineitem")
      val p = li.join(o, col("l_orderkey") === col("o_orderkey"))
        .groupBy(col("o_orderstatus")).count()
        .queryExecution.executedPlan.toString
      assert(p.contains("might_contain"),
        s"no runtime bloom filter injected on the application side:\n$p")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("AQE splits a skewed join partition at runtime") {
    // the OTHER half of the skew story: operators/SkewJoin salts
    // proactively (q67); AQE's skew-join handles the skew you did NOT
    // predict, splitting an oversized shuffle partition into parallel
    // sub-reads at runtime. Pinned with thresholds scaled to local data:
    // 90% of the left rows share one key, so its partition must come
    // back marked skew-split.
    val confs = Seq(
      "spark.sql.adaptive.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.enabled" -> "true",
      "spark.sql.adaptive.skewJoin.skewedPartitionFactor" -> "1.2",
      "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes" -> "8KB",
      "spark.sql.adaptive.advisoryPartitionSizeInBytes" -> "4KB",
      "spark.sql.adaptive.coalescePartitions.enabled" -> "false",
      "spark.sql.autoBroadcastJoinThreshold" -> "-1")
    val saved = confs.map { case (k, _) => k -> spark.conf.getOption(k) }
    confs.foreach { case (k, v) => spark.conf.set(k, v) }
    try {
      import spark.implicits._
      val left = spark.range(200000)
        .select(org.apache.spark.sql.functions
          .when(col("id") % 10 === 0, col("id")).otherwise(0L).as("k"),
          col("id").as("v"))
      val right = spark.range(2000).select(col("id").as("k"), (col("id") * 2).as("w"))
      val j = left.join(right, "k")
        .groupBy((col("k") % 7).as("g"))
        .agg(org.apache.spark.sql.functions.count(col("v")).as("c"))
      j.collect() // AQE decides at runtime — must execute, not just plan
      val plan = j.queryExecution.executedPlan.toString
      assert(plan.contains("skew=true"),
        s"AQE did not mark the skewed partition split:\n$plan")
    } finally saved.foreach {
      case (k, Some(v)) => spark.conf.set(k, v)
      case (k, None) => spark.conf.unset(k)
    }
  }

  test("q143: per-group exact-k runs group-local limits before the exchange") {
    // the rank<=k filter over the window must trigger WindowGroupLimit:
    // partial per-partition group heaps ahead of the shuffle (the
    // per-group analogue of q128's TakeOrderedAndProject), so the
    // exchange carries at most k rows per group per partition
    val p = formatted("q143_sample_per_group")
    assert(p.contains("WindowGroupLimit"),
      s"rank-filter did not plan group-local limits:\n$p")
    assert("WindowGroupLimit".r.findAllIn(p).length >= 2,
      "expected BOTH partial (pre-shuffle) and final group limits")
  }

  test("q131: star join broadcasts the dimension chain and pushes the " +
      "date range into the orders scan") {
    val p = formatted("q131_star_join_q5")
    val bhj = "BroadcastHashJoin".r.findAllIn(p).length
    assert(bhj >= 3,
      s"expected supplier/nation/region (at least) to broadcast, got $bhj:\n$p")
    assert(p.contains("GreaterThanOrEqual(o_orderdate"),
      "orderdate lower bound not pushed into the scan")
    assert(p.contains("IsNotNull(r_name)") || p.contains("EqualTo(r_name"),
      "region filter not pushed into the scan")
  }

  test("q132: bucketed co-located join + per-key agg plan with ZERO " +
      "shuffle exchanges") {
    // The entire join + groupBy rides the on-disk bucket layout; the
    // only movement in the whole query is the 25-row TakeOrdered.
    val shuffles = hashExchanges("q132_bucketed_join")
    assert(shuffles.isEmpty,
      s"bucketed join should be exchange-free, got ${shuffles.size}")
  }

  test("q152: release-pipeline capstone stays inside its exchange budget") {
    // the capstone composes quality gate + exact dedup + semantic dedup +
    // decontamination + split + card; its 100 TB claim is that the
    // composition stays data-reducing and shuffle-BOUNDED. Budget
    // breakdown (hash exchanges only — the two drop-set anti-joins are
    // explicitly broadcast and must NOT appear here): the corpus-quality
    // join, the digest self-agg + canonical join, the decontam probe
    // distinct + per-doc shared-gram countDistinct, and the final split
    // card agg. Every corpus-to-corpus join is on a reducing key set;
    // a regression that shuffles the corpus an extra time breaks this.
    val shuffles = hashExchanges("q152_release_pipeline")
    assert(shuffles.size <= 7,
      s"q152 exchange budget blown: ${shuffles.size} hash exchanges:\n" +
        shuffles.mkString("\n"))
    // the drop-sets must stay broadcast: no hash exchange may carry the
    // anti-join keys alone
    val p = formatted("q152_release_pipeline")
    assert(p.contains("BroadcastHashJoin") || p.contains("BroadcastNestedLoop"),
      "drop-set anti-joins lost their broadcast")
  }

  test("q154: int8 serving keeps the q41 broadcast + TakeOrdered shape") {
    val p = formatted("q154_ann_int8_serving")
    assert(p.contains("BroadcastNestedLoopJoin") || p.contains("BroadcastHashJoin"),
      "probe side must broadcast — the corpus may not shuffle for the join")
    assert(p.contains("TakeOrderedAndProject"),
      "top-10 must plan as TakeOrdered, not a global sort")
  }

  test("q156: IMI product-cell pairing is a keyed join, assignment narrow") {
    // the IMI face must keep the q111 discipline: candidates form via an
    // equi-join on the product cell, never a cartesian product; the
    // two-half assignment is a narrow expression chain (no exchange of
    // its own beyond the pairing join's)
    val p = formatted("q156_dedup_semantic_imi")
    assert(!p.contains("CartesianProduct") && !p.contains("BroadcastNestedLoopJoin"),
      "IMI pairing must stay cell-keyed — a product is the n² shape")
    assert(p.contains("ivf_top_cells"),
      "assignment must come from the native codebook kernel")
  }

  test("q159: epoch rates broadcast back; corpus never shuffles for the rate join") {
    // q114's discipline for the budgeted solver: the per-domain rate
    // table reaches the corpus as a BroadcastHashJoin on source, the
    // epoch explode stays narrow, and no unbroadcast product appears
    // anywhere (the solver's total/lambda one-row joins are broadcast
    // nested loops over single rows — allowed).
    val p = formatted("q159_mixture_token_budget")
    assert(p.contains("BroadcastHashJoin"),
      "per-domain rate table must broadcast — the corpus side streams once")
    assert(!p.contains("CartesianProduct"),
      "mixture pass must not plan an unbroadcast product")
    assert(p.contains("Generate") && p.contains("sequence"),
      "epoch materialization must be the narrow sequence+explode")
  }

  test("q160: shard assignment never plans a corpus-sized single-partition window") {
    // PrefixSum's point: the within-bucket window partitions by
    // (g, bucket) — corpus-sized data only ever enters a PARTITIONED
    // window; the only unpartitioned window is the carry over the
    // bucket table. SinglePartition exchanges must therefore only feed
    // tiny inputs (the carry + the final ordered report).
    val plan = {
      val key = "spark.sql.adaptive.enabled"
      val prev = spark.conf.get(key)
      try {
        spark.conf.set(key, "false")
        Queries.byName("q160_release_sharding").build(spark, sf)
          .queryExecution.executedPlan
      } finally spark.conf.set(key, prev)
    }
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, "expected window nodes from PrefixSum")
    val (unpart, part) = windows.partition(_.partitionSpec.isEmpty)
    assert(part.nonEmpty,
      "the corpus running sum must run under a PARTITIONED window")
    // every unpartitioned window must sit above a bucket-level agg
    // (its subtree contains the bucket-total HashAggregate), never the
    // raw corpus scan
    unpart.foreach { w =>
      assert(w.child.collectFirst {
          case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
        }.nonEmpty,
        "unpartitioned carry window must consume the bucket-total agg, " +
          "not corpus-sized input")
    }
  }

  test("q170: the set-similarity join is pure equi joins — no nested loop") {
    // the whole point of prefix filtering: a SIMILARITY join planned as
    // keyed equi-joins (candidates on prefix elements, verify on ids).
    // A nested-loop or cartesian anywhere means the blocking regressed
    // to all-pairs.
    val p = formatted("q170_setsim_prefix_join")
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"),
      "prefix-filter join must never plan a nested loop")
    assert(p.contains("SortMergeJoin") || p.contains("ShuffledHashJoin")
        || p.contains("BroadcastHashJoin"),
      "candidate/verify joins must be hash/merge equi-joins")
  }

  test("q177: banded levenshtein joins on the length bin, no nested loop") {
    val p = formatted("q177_editdist_blocked")
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"),
      "length-band blocking must plan as an equi join")
  }

  test("q174: weighted sample is TakeOrdered, never a global sort") {
    val p = formatted("q174_weighted_sample")
    assert(p.contains("TakeOrderedAndProject"),
      "A-ES top-k must plan as TakeOrdered")
  }

  test("q175: the global sweep runs through the bucketed carry, not a " +
      "corpus-sized single-partition window") {
    val plan = {
      val key = "spark.sql.adaptive.enabled"
      val prev = spark.conf.get(key)
      try {
        spark.conf.set(key, "false")
        Queries.byName("q175_interval_concurrency").build(spark, sf)
          .queryExecution.executedPlan
      } finally spark.conf.set(key, prev)
    }
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.nonEmpty, "expected window nodes")
    // windows on the constant sweep key (__g) — the PrefixSum local +
    // carry — must consume the per-timestamp NET aggregate, never the
    // raw event scan; the session windows partition by user_id (high
    // cardinality) and are exempt
    windows.filter(_.partitionSpec.exists(_.toString.contains("__g")))
      .foreach { w =>
        assert(w.child.collectFirst {
            case a: org.apache.spark.sql.execution.aggregate.HashAggregateExec => a
          }.nonEmpty,
          "sweep windows must consume the net-delta aggregate, not events")
      }
  }

  test("q181: the global curriculum order plans NO window at all — " +
      "DistributedRank, not a partition-less WindowExec") {
    // `Window.orderBy(...)` with no key moves the corpus to ONE reducer
    // (the bench's own WindowExec warning); the whole point of q181 is
    // that the global position comes from the range-parallel operator.
    val plan = {
      val key = "spark.sql.adaptive.enabled"
      val prev = spark.conf.get(key)
      try {
        spark.conf.set(key, "false")
        Queries.byName("q181_curriculum_order").build(spark, sf)
          .queryExecution.executedPlan
      } finally spark.conf.set(key, prev)
    }
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty,
      "curriculum order must never plan a WindowExec")
  }

  test("q201: the keyed rank family plans ZERO WindowExec — q61's exact " +
      "query at range parallelism") {
    // q61's Window.partitionBy(o_orderstatus) is 3 reducers at any
    // cluster size; q201 computes the identical five rank functions
    // (ntile included) through DistributedRank and must never fall back
    // to a hash window.
    val plan = {
      val key = "spark.sql.adaptive.enabled"
      val prev = spark.conf.get(key)
      try {
        spark.conf.set(key, "false")
        Queries.byName("q201_rank_keyed_distributed").build(spark, sf)
          .queryExecution.executedPlan
      } finally spark.conf.set(key, prev)
    }
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty,
      "keyed distributed rank must never plan a WindowExec")
  }

  test("q187: three global percent-ranks plan ZERO WindowExec — all " +
      "ranking through DistributedRank at range parallelism") {
    val plan = {
      val key = "spark.sql.adaptive.enabled"
      val prev = spark.conf.get(key)
      try {
        spark.conf.set(key, "false")
        Queries.byName("q187_quality_rank_fusion").build(spark, sf)
          .queryExecution.executedPlan
      } finally spark.conf.set(key, prev)
    }
    val windows = plan.collect {
      case w: org.apache.spark.sql.execution.window.WindowExec => w
    }
    assert(windows.isEmpty,
      "rank fusion must never plan a partition-less WindowExec")
    assert(plan.toString.contains("TakeOrderedAndProject"),
      "the final top-100 must be TakeOrdered, not a global sort")
  }

  test("q183: the release diff is one co-keyed full-outer equi join, " +
      "never a nested loop") {
    val p = formatted("q183_release_diff")
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"),
      "diff must join on doc_id as an equi join")
    assert(p.contains("FullOuter"), "diff must plan a full-outer join")
    assert(p.contains("HashAggregate"),
      "status counts must map-side combine")
  }

  test("q179: hard-negative mining keeps the knn-graph shape — keyed " +
      "cell join, no nested loop, per-cell window with no extra exchange") {
    val p = formatted("q179_hard_negatives")
    assert(!p.contains("BroadcastNestedLoop") && !p.contains("CartesianProduct"),
      "candidate generation must be the cell equi join")
  }

  test("whole-stage codegen spans the Q1 pipeline") {
    // AQE materializes codegen stages lazily; disable it for the probe so
    // the prepared plan shows the WholeStageCodegen spans directly.
    val key = "spark.sql.adaptive.enabled"
    val prev = spark.conf.get(key)
    try {
      spark.conf.set(key, "false")
      val p = Queries.byName("q01_agg_pricing_summary").build(spark, sf)
        .queryExecution.executedPlan.toString
      // codegen stages print as "*(id) Operator" in the prepared plan
      assert(p.contains("*(1) HashAggregate") || p.contains("*(1) Project"),
        s"Q1 hot path fell out of codegen:\n$p")
    } finally spark.conf.set(key, prev)
  }
}
