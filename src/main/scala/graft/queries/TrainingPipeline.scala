package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.{TextFunctions => TF}
import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.expressions.Window
import org.apache.spark.sql.functions._

/** Corpus-construction operators every large-scale training-data pipeline
  * runs downstream of dedup/quality filtering: deterministic sampling,
  * train/val/test splitting, sequence packing, and TF-IDF term scoring.
  *
  * Scale discipline: sampling and splitting are pure narrow filters on a
  * content-stable hash (no rand(), no global state — reproducible across
  * engines, partitionings and reruns, and a re-run on a grown corpus keeps
  * prior assignments). Packing is one window pass partitioned by source;
  * TF-IDF is two hash aggregations and a shuffle join on term — all
  * formulations whose shuffle volume is the data reduction itself.
  */
object TrainingPipeline {

  private def docs(s: SparkSession, dir: String): DataFrame =
    Tables.load(s, dir, "documents")

  /** Deterministic bucket in [0, 10): first 8 md5 hex chars of the key as
    * an integer, mod 10. Identical arithmetic in DuckDB.
    */
  private def hashBucket(key: org.apache.spark.sql.Column) =
    conv(substring(md5(key.cast("string")), 1, 8), 16, 10).cast("long") % 10

  private val bucketSql =
    "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT % 10"

  /** q159's waterfilling solver, reusable: per-domain epoch rates for
    * weights w_d = (src id % 3) * 9 + 1, budget B = 2 * total chars,
    * epoch cap E = 3. Returns (source, w, n_docs, chars_avail, rate)
    * with rate at the ROUND-6 precision the materialization thresholds
    * on (the q159 report re-rounds to 4 for display only). The rate
    * table is what a streaming mixture gate serves with
    * (`Streams.mixtureGate`) — solver offline, rates as literals online.
    */
  def mixtureRates(s: SparkSession, dir: String): DataFrame = {
    val d = docs(s, dir)
    val c = d.groupBy(col("source")).agg(
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).as("chars_avail"))
      .select(col("source"),
        ((substring(col("source"), 4, 10).cast("int") % 3) * 9 + 1)
          .cast("double").as("w"),
        col("chars_avail").cast("double").as("t"),
        col("n_docs"), col("chars_avail"))
    val tot = c.agg(sum(col("w")).as("wsum"),
      (lit(2.0) * sum(col("t"))).as("b"))
    val sDf = c.withColumn("lam_d", lit(3.0) * col("t") / col("w"))
    val ord = Window.orderBy(col("lam_d"), col("source"))
    val pre = ord.rowsBetween(Window.unboundedPreceding, -1)
    val o = sDf
      .withColumn("pcap",
        coalesce(sum(lit(3.0) * col("t")).over(pre), lit(0.0)))
      .withColumn("pw", coalesce(sum(col("w")).over(pre), lit(0.0)))
      .withColumn("plam", coalesce(lag(col("lam_d"), 1).over(ord), lit(0.0)))
    val cand = o.crossJoin(broadcast(tot))
      .withColumn("lam_c",
        (col("b") - col("pcap")) / (col("wsum") - col("pw")))
    val lam = cand
      .filter(col("plam") <= col("lam_c") && col("lam_c") < col("lam_d"))
      .agg(min(round(col("lam_c"), 6)).as("lam"))
    sDf.crossJoin(broadcast(lam))
      .withColumn("rate", round(
        least(lit(3.0),
          coalesce(col("lam"), lit(1e18)) * col("w") / col("t")), 6))
      .select(col("source"), col("w"), col("n_docs"), col("chars_avail"),
        col("rate"))
  }

  /** q142's oracle scaffolding, shared with q162: the feature CTEs and
    * the rounded 3-iteration GD chain ending in weight table w3.
    */
  private def gdDot(w: String) =
    s"($w.w0*f0 + $w.w1*f1 + $w.w2*f2 + $w.w3*f3)"
  private def gdStep(prev: String, cur: String) =
    s"$cur AS (SELECT " + (0 to 3).map(i =>
      s"round(min(w.w$i) + avg((y - 1/(1+exp(-${gdDot("w")})))*f$i), 8) AS w$i")
      .mkString(", ") + s" FROM f, $prev w)"
  private val gdCtes =
    s"""base AS (SELECT doc_id, text, n_chars,
       |    string_split_regex(lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))), '\\s+') AS toks
       |  FROM documents),
       |f AS (SELECT doc_id, 1.0 AS f0,
       |    round(least(length(text) / 1000.0, 1.0), 6) AS f1,
       |    round(CASE WHEN length(text) = 0 THEN 0.0
       |      ELSE CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE)
       |        / length(text) END, 6) AS f2,
       |    round(CASE WHEN len(toks) = 0 THEN 0.0
       |      ELSE CAST(len(list_distinct(toks)) AS DOUBLE) / len(toks) END, 6) AS f3,
       |    CASE WHEN n_chars >= 300 THEN 1.0 ELSE 0.0 END AS y
       |  FROM base),
       |w1 AS (SELECT round(avg((y - 0.5)*f0), 8) AS w0,
       |    round(avg((y - 0.5)*f1), 8) AS w1,
       |    round(avg((y - 0.5)*f2), 8) AS w2,
       |    round(avg((y - 0.5)*f3), 8) AS w3 FROM f),
       |${gdStep("w1", "w2")},
       |${gdStep("w2", "w3")}""".stripMargin

  /** q142's engine side, shared with q162: the localCheckpoint'd feature
    * table and the 3-iteration trained weights (rounded to 8 decimals
    * per iteration — the cross-engine determinism contract).
    */
  def qualityTraining(
      s: SparkSession, dir: String): (DataFrame, Array[Double]) = {
    val toks = TF.tokens(TF.normalizeText(col("text")))
    val f = Tables.spread(s, docs(s, dir)).select(col("doc_id"),
        lit(1.0).as("f0"),
        round(least(length(col("text")) / lit(1000.0), lit(1.0)), 6).as("f1"),
        round(when(length(col("text")) === 0, 0.0)
          .otherwise(length(regexp_replace(col("text"), "[^A-Za-z]", ""))
            .cast("double") / length(col("text"))), 6).as("f2"),
        round(when(size(toks) === 0, 0.0)
          .otherwise(size(array_distinct(toks)).cast("double")
            / size(toks)), 6).as("f3"),
        when(col("n_chars") >= 300, 1.0).otherwise(0.0).as("y"))
      .localCheckpoint()
    val feats = Seq("f0", "f1", "f2", "f3")
    var w = Array.fill(4)(0.0)
    for (_ <- 1 to 3) {
      val z = feats.zipWithIndex
        .map { case (c, i) => col(c) * lit(w(i)) }.reduce(_ + _)
      val resid = col("y") - lit(1.0) / (lit(1.0) + exp(-z))
      val g = f.agg(avg(resid * col("f0")), avg(resid * col("f1")),
        avg(resid * col("f2")), avg(resid * col("f3"))).head()
      w = w.indices.map(i => BigDecimal(w(i) + g.getDouble(i))
        .setScale(8, BigDecimal.RoundingMode.HALF_UP).toDouble).toArray
    }
    (f, w)
  }

  /** Final codegen'd score column over literal weights. */
  private def gdScore(w: Array[Double]) = {
    val z = Seq("f0", "f1", "f2", "f3").zipWithIndex
      .map { case (c, i) => col(c) * lit(w(i)) }.reduce(_ + _)
    round(lit(1.0) / (lit(1.0) + exp(-z)), 4)
  }

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    // Stratified deterministic ~10% sample: keep bucket 0. Hash-based, so
    // the sample is reproducible and consistent across reruns/engines —
    // the rand()-free sampling a training pipeline needs for lineage.
    QueryDef.sql(
      "q55_sample_stratified",
      s"""SELECT source, count(*) AS n_sampled,
         |  CAST(sum(n_chars) AS BIGINT) AS chars
         |FROM documents
         |WHERE $bucketSql = 0
         |GROUP BY source ORDER BY source ASC""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .filter(hashBucket(col("doc_id")) === 0)
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_sampled"), sum(col("n_chars")).as("chars"))
        .orderBy(col("source").asc)
    },

    // ------------------------------------------------------------------
    // Deterministic 80/10/10 train/val/test split on the same hash family.
    // A document's split never changes when the corpus grows — the
    // property that keeps eval sets uncontaminated across pipeline runs.
    QueryDef.sql(
      "q56_train_split",
      s"""WITH b AS (SELECT source, n_chars, $bucketSql AS bk FROM documents)
         |SELECT CASE WHEN bk < 8 THEN 'train' WHEN bk = 8 THEN 'val'
         |         ELSE 'test' END AS split,
         |  count(*) AS n_docs, CAST(sum(n_chars) AS BIGINT) AS chars
         |FROM b GROUP BY split ORDER BY split ASC""".stripMargin) { (s, dir) =>
      val bk = hashBucket(col("doc_id"))
      docs(s, dir)
        .withColumn("split",
          when(bk < 8, "train").when(bk === 8, "val").otherwise("test"))
        .groupBy(col("split"))
        .agg(count(lit(1)).as("n_docs"), sum(col("n_chars")).as("chars"))
        .orderBy(col("split").asc)
    },

    // ------------------------------------------------------------------
    // Sequence packing: assign documents (in stable doc_id order, per
    // source) to contiguous 4096-token bins via a running token sum —
    // the standard pre-tokenization packing pass. One window per source
    // partition; at 100 TB the partition key spreads sources across the
    // cluster and no global sort is needed.
    QueryDef.sql(
      "q57_sequence_packing",
      """WITH t AS (SELECT source, doc_id,
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS BIGINT) AS tok
        |  FROM documents),
        |c AS (SELECT source, tok,
        |    sum(tok) OVER (PARTITION BY source ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM t),
        |b AS (SELECT source, (cum - tok) // 4096 AS bin,
        |    CAST(sum(tok) AS BIGINT) AS bin_tokens
        |  FROM c GROUP BY source, bin)
        |SELECT source, CAST(count(*) AS BIGINT) AS n_bins,
        |  CAST(max(bin_tokens) AS BIGINT) AS max_bin_tokens,
        |  round(avg(bin_tokens), 4) AS avg_bin_tokens
        |FROM b GROUP BY source ORDER BY source ASC""".stripMargin) { (s, dir) =>
      // skew-safe bucketed prefix sum (graft.operators.PrefixSum): a hot
      // source cannot serialize its running token count into one task;
      // exact for integer token counts, naive-window equivalence pinned
      // in PrefixSumSpec
      graft.operators.PrefixSum.runningSum(
        docs(s, dir).select(col("source"), col("doc_id"),
          TF.tokenCount(col("text")).as("tok")),
        "source", expr("CAST(doc_id div 1024 AS BIGINT)"),
        Seq(col("doc_id")), col("tok"), "cum")
        .select(col("source"), col("tok"),
          expr("(cum - tok) div 4096").as("bin"))
        .groupBy(col("source"), col("bin"))
        .agg(sum(col("tok")).as("bin_tokens"))
        .groupBy(col("source"))
        .agg(count(lit(1)).as("n_bins"),
          max(col("bin_tokens")).as("max_bin_tokens"),
          round(avg(col("bin_tokens")), 4).as("avg_bin_tokens"))
        .orderBy(col("source").asc)
    },

    // ------------------------------------------------------------------
    // TF-IDF top-5 terms for probe documents. Term frequencies and
    // document frequencies are both map-side-combined hash aggs; the
    // tf⨝df join shuffles on the term — vocabulary-sized, not corpus-
    // sized. Probe restriction pushes below the join.
    QueryDef.sql(
      "q58_tfidf_topk",
      """WITH toks AS (SELECT doc_id,
        |    unnest(string_split_regex(trim(lower(text)), '\s+')) AS tok
        |  FROM documents),
        |tf AS (SELECT doc_id, tok, count(*) AS tf
        |  FROM toks WHERE length(tok) > 0 GROUP BY doc_id, tok),
        |dfreq AS (SELECT tok, count(*) AS df FROM tf GROUP BY tok),
        |n AS (SELECT count(*) AS n FROM documents),
        |scored AS (SELECT tf.doc_id, tf.tok,
        |    round(tf.tf * ln(CAST(n.n AS DOUBLE) / dfreq.df), 4) AS tfidf
        |  FROM tf JOIN dfreq USING (tok) CROSS JOIN n
        |  WHERE tf.doc_id < 5),
        |ranked AS (SELECT doc_id, tok, tfidf,
        |    row_number() OVER (PARTITION BY doc_id
        |      ORDER BY tfidf DESC, tok ASC) AS rnk
        |  FROM scored)
        |SELECT doc_id, CAST(rnk AS INTEGER) AS rnk, tok, tfidf
        |FROM ranked WHERE rnk <= 5
        |ORDER BY doc_id ASC, rnk ASC""".stripMargin) { (s, dir) =>
      val toks = docs(s, dir)
        .select(col("doc_id"),
          explode(TF.tokens(lower(trim(col("text"))))).as("tok"))
        .filter(length(col("tok")) > 0)
      val tf = toks.groupBy(col("doc_id"), col("tok"))
        .agg(count(lit(1)).as("tf"))
      val dfreq = tf.groupBy(col("tok")).agg(count(lit(1)).as("df"))
      val n = broadcast(docs(s, dir).agg(count(lit(1)).as("n")))
      val w = Window.partitionBy(col("doc_id"))
        .orderBy(col("tfidf").desc, col("tok").asc)
      tf.filter(col("doc_id") < 5)
        .join(dfreq, "tok")
        .crossJoin(n)
        .select(col("doc_id"), col("tok"),
          round(col("tf") * log(col("n").cast("double") / col("df")), 4)
            .as("tfidf"))
        .withColumn("rnk", row_number().over(w))
        .filter(col("rnk") <= 5)
        .select(col("doc_id"), col("rnk"), col("tok"), col("tfidf"))
        .orderBy(col("doc_id").asc, col("rnk").asc)
    },

    // ------------------------------------------------------------------
    // Domain-mixture rebalancing: deterministically downsample over-
    // represented domains (here: languages) to a uniform target mix —
    // the data-mixing pass between dedup and tokenization. Per-domain
    // acceptance rate = min(1, target_share / actual_share); a document
    // survives iff its content-stable md5 fraction (salted 'mix' so it
    // is independent of the q55/q56 sampling family) falls below its
    // domain's rate. rand()-free, so the kept set is reproducible across
    // engines/reruns, and hash-threshold survival makes kept sets NESTED
    // as rates move: a domain growing (rate shrinking) only drops docs,
    // never swaps them — reruns on a grown corpus don't churn the mix.
    // Scale shape: the rate table is one row per domain — computed in
    // one tiny agg and broadcast back — so the corpus streams once
    // through a narrow filter; no shuffle touches document text. The
    // final per-domain report is a second map-side-combined agg.
    QueryDef.sql(
      "q114_domain_mixture",
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |t AS (SELECT CAST(sum(n) AS DOUBLE) AS total,
        |    CAST(count(*) AS BIGINT) AS nd FROM c),
        |r AS (SELECT c.lang, c.n,
        |    least(1.0, (t.total / t.nd) / c.n) AS rate
        |  FROM c CROSS JOIN t),
        |k AS (SELECT d.lang, count(*) AS n_kept
        |  FROM documents d JOIN r ON d.lang = r.lang
        |  WHERE ('0x' || substr(md5('mix' || CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |      % 1000000 / 1000000.0 < r.rate
        |  GROUP BY d.lang)
        |SELECT r.lang, CAST(r.n AS BIGINT) AS n_docs,
        |  CAST(coalesce(k.n_kept, 0) AS BIGINT) AS n_kept,
        |  round(r.rate, 4) AS rate
        |FROM r LEFT JOIN k ON r.lang = k.lang
        |ORDER BY r.lang ASC""".stripMargin) { (s, dir) =>
      val d = docs(s, dir)
      val c = d.groupBy(col("lang")).agg(count(lit(1)).as("n"))
      val t = c.agg(sum(col("n")).cast("double").as("total"),
        count(lit(1)).as("nd"))
      val r = c.crossJoin(broadcast(t))
        .select(col("lang"), col("n"),
          least(lit(1.0), (col("total") / col("nd")) / col("n")).as("rate"))
      val frac = (conv(substring(
          md5(concat(lit("mix"), col("doc_id").cast("string"))), 1, 8),
          16, 10).cast("long") % 1000000) / lit(1000000.0)
      val kept = d.join(broadcast(r.select(col("lang"), col("rate"))), "lang")
        .filter(frac < col("rate"))
        .groupBy(col("lang")).agg(count(lit(1)).as("n_kept"))
      r.join(kept, Seq("lang"), "left")
        .select(col("lang"), col("n").as("n_docs"),
          coalesce(col("n_kept"), lit(0L)).as("n_kept"),
          round(col("rate"), 4).as("rate"))
        .orderBy(col("lang").asc)
    },

    // ------------------------------------------------------------------
    // TEMPERATURE-SCALED DOMAIN RESAMPLING (q216, r15) — the multilingual
    // sampling classic (mT5/XLM-R style): sampling share q_i ∝ p_i^α
    // flattens the domain distribution between uniform (α=0) and natural
    // (α=1), UPSAMPLING rare domains (repeat > 1 epoch) and DOWNSAMPLING
    // dominant ones — where q114 only downsamples to uniform. α = 0.5
    // here, deliberately: sqrt is IEEE-correctly-rounded in every engine
    // while pow(x, 0.3) is not, so the shares are reproducible
    // bit-for-bit. Determinism discipline: the per-domain repeat factor
    // is computed ONCE from the ≤|domains|-row count table (driver-side,
    // domain-ordered left-fold sum — the oracle replays it with an
    // ORDER BY lang list_reduce, same association), frozen on the e4
    // integer lattice, and rides into the corpus pass as a broadcast
    // literal table; per-doc emission = floor(r) epochs + 1 more iff the
    // salted-md5 fraction clears frac(r) (the q159 epoch discipline —
    // rand()-free, rerun-stable, nested under growth). Scale shape: one
    // tiny agg + one narrow broadcast-joined corpus pass; text never
    // shuffles.
    QueryDef.sql(
      "q216_temperature_mixture",
      """WITH c AS (SELECT lang, count(*) AS n FROM documents GROUP BY lang),
        |tot AS (SELECT
        |    list_reduce(list(sqrt(CAST(n AS DOUBLE)) ORDER BY lang ASC),
        |      (a, b) -> a + b) AS t,
        |    CAST(sum(n) AS DOUBLE) AS total FROM c),
        |r AS (SELECT c.lang, c.n,
        |    CAST(floor(sqrt(CAST(c.n AS DOUBLE)) / tot.t * tot.total / c.n
        |      * 10000.0 + 0.5) AS BIGINT) AS repeat_e4
        |  FROM c CROSS JOIN tot),
        |em AS (SELECT d.lang,
        |    sum(r.repeat_e4 // 10000
        |      + CASE WHEN ('0x' || substr(md5('tsamp' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
        |          % 10000 < r.repeat_e4 % 10000 THEN 1 ELSE 0 END) AS n_emitted
        |  FROM documents d JOIN r ON r.lang = d.lang
        |  GROUP BY d.lang)
        |SELECT r.lang, CAST(r.n AS BIGINT) AS n_docs, r.repeat_e4,
        |  CAST(coalesce(em.n_emitted, 0) AS BIGINT) AS n_emitted
        |FROM r LEFT JOIN em ON em.lang = r.lang
        |ORDER BY r.lang ASC""".stripMargin) { (s, dir) =>
      val d = docs(s, dir)
      // domain table is ≤|langs| rows: resolve the temperature shares on
      // the driver with a DOMAIN-ORDERED left-fold (the oracle's
      // list_reduce association), freeze on the e4 lattice
      val counts = d.groupBy(col("lang")).agg(count(lit(1)).as("n"))
        .collect().map(r => (r.getString(0), r.getLong(1))).sortBy(_._1)
      // the driver-side solve is |domains|-bounded BY CONTRACT (language
      // codes); a mistaken high-cardinality column must fail loudly, not
      // grow the collect
      require(counts.length <= 100000,
        s"q216: ${counts.length} domains exceed the driver-solve bound — " +
          "the mixture table must be domain-sized, not corpus-sized")
      val total = counts.map(_._2).sum.toDouble
      val t = counts.foldLeft(0.0)((a, c) => a + math.sqrt(c._2.toDouble))
      val rTbl = s.createDataFrame(counts.map { case (lang, n) =>
        val r4 = math.floor(
          math.sqrt(n.toDouble) / t * total / n * 10000.0 + 0.5).toLong
        (lang, n, r4, r4 / 10000L, r4 % 10000L)
      }.toSeq).toDF("lang", "n_docs", "repeat_e4", "base", "fr")
      val frac = conv(substring(
        md5(concat(lit("tsamp"), col("doc_id").cast("string"))), 1, 8),
        16, 10).cast("long") % 10000
      val emitted = d.select(col("lang"), col("doc_id"))
        // the broadcast hint is scoped to the joins where the tiny side
        // is a legal BUILD side: here (inner, rTbl right) and below
        // (left outer, emitted right). Hinting rTbl itself would ride
        // its lineage onto the LEFT of the outer join, where build-left
        // is unsupported — Spark logs an ignored-hint warning per pass
        .join(broadcast(rTbl), Seq("lang"))
        .select(col("lang"),
          (col("base") + when(frac < col("fr"), 1L).otherwise(0L))
            .as("em"))
        .groupBy(col("lang")).agg(sum(col("em")).as("n_emitted"))
      rTbl.join(broadcast(emitted), Seq("lang"), "left")
        .select(col("lang"), col("n_docs"), col("repeat_e4"),
          coalesce(col("n_emitted"), lit(0L)).as("n_emitted"))
        .orderBy(col("lang").asc)
    },

    // ------------------------------------------------------------------
    // EXACT-k reproducible global sample (r11) — "carve out exactly 200
    // eval documents, the same 200 every run, on any cluster size."
    // q55/q56's hash-bucket predicates give a reproducible ~fraction;
    // an eval set needs an exact COUNT, which means a global order over
    // a salted hash — but never a global sort: orderBy+limit plans as
    // TakeOrderedAndProject, a per-partition O(n log k) heap + one
    // k-sized merge on the driver. The salt ('eval-v1') versions the
    // carve-out: bump it and the sample redraws independently of every
    // other hash family in the pipeline (bucket splits, dedup digests).
    QueryDef.sql(
      "q128_sample_exact_k",
      """SELECT doc_id, lang, source,
        |  md5('eval-v1' || CAST(doc_id AS VARCHAR)) AS rk
        |FROM documents
        |ORDER BY rk ASC, doc_id ASC LIMIT 200""".stripMargin) { (s, dir) =>
      docs(s, dir)
        .select(col("doc_id"), col("lang"), col("source"),
          md5(concat(lit("eval-v1"), col("doc_id").cast("string")))
            .as("rk"))
        .orderBy(col("rk").asc, col("doc_id").asc)
        .limit(200)
    },

    // ------------------------------------------------------------------
    // IN-ENGINE TRAINED QUALITY CLASSIFIER (r12) — the fastText-style
    // quality gate of a GPT-3/LLaMA-class pipeline, trained INSIDE the
    // engine: logistic regression over cheap per-doc features (length
    // saturation, alpha ratio, distinct-token ratio + bias), weak labels
    // from a length rule, three full-batch gradient-descent iterations.
    // Distributed shape: each iteration is ONE map-side-combined
    // aggregate producing a 4-scalar gradient (the only thing that ever
    // reaches the driver); the feature table is localCheckpoint'd once
    // so the 3 training passes + the scoring pass never recompute the
    // regex feature extraction, and scoring is a narrow codegen'd
    // expression over broadcast-literal weights. At 100 TB: training
    // cost is 3 linear passes (or 1 over a slice — the lever is the
    // slice, not the algorithm), scoring streams once. Determinism:
    // weights round to 8 decimals after EVERY iteration (both engines
    // restart each pass from bit-identical weights — drift cannot
    // compound), per-feature values round to 6 at extraction, scores to
    // 4; iteration 1 needs no sigmoid (sigma(0) = 0.5 exactly). The
    // oracle replays all three iterations CTE-for-CTE.
    QueryDef.sql(
      "q142_quality_classifier",
      s"""WITH $gdCtes
         |SELECT f.doc_id,
         |  round(1/(1+exp(-${gdDot("w")})), 4) AS score,
         |  CAST(y AS INTEGER) AS label,
         |  round(1/(1+exp(-${gdDot("w")})), 4) >= 0.5 AS keep
         |FROM f, w3 w ORDER BY f.doc_id ASC""".stripMargin) { (s, dir) =>
      val (f, w) = qualityTraining(s, dir)
      val score = gdScore(w)
      f.select(col("doc_id"), score.as("score"),
          col("y").cast("int").as("label"), (score >= 0.5).as("keep"))
        .orderBy(col("doc_id").asc)
    },

    // ------------------------------------------------------------------
    // PER-GROUP EXACT-k SAMPLE (r12) — q128's eval carve-out, stratified:
    // exactly 20 reproducible docs PER SOURCE (per-domain eval sets need
    // fixed-size strata, not a global draw that under-samples small
    // domains). Same salted-md5 determinism ('eval-v2' versions this
    // hash family independently). Plan shape: the rank-then-filter pair
    // triggers Spark's WindowGroupLimit — per-partition group-local
    // top-k heaps run BEFORE the exchange, so the shuffle carries at
    // most k rows per group per partition, never the full group (the
    // per-group analogue of q128's TakeOrderedAndProject; pinned in
    // PlanAuditSpec).
    QueryDef.sql(
      "q143_sample_per_group",
      """WITH r AS (SELECT doc_id, source,
        |    md5('eval-v2' || CAST(doc_id AS VARCHAR)) AS rk
        |  FROM documents),
        |k AS (SELECT *, row_number() OVER (PARTITION BY source
        |    ORDER BY rk ASC, doc_id ASC) AS rn FROM r)
        |SELECT source, doc_id, rk FROM k WHERE rn <= 20
        |ORDER BY source ASC, rk ASC, doc_id ASC""".stripMargin) { (s, dir) =>
      val w = org.apache.spark.sql.expressions.Window
        .partitionBy(col("source")).orderBy(col("rk").asc, col("doc_id").asc)
      docs(s, dir)
        .select(col("doc_id"), col("source"),
          md5(concat(lit("eval-v2"), col("doc_id").cast("string"))).as("rk"))
        .withColumn("rn", row_number().over(w))
        .filter(col("rn") <= 20)
        .select(col("source"), col("doc_id"), col("rk"))
        .orderBy(col("source").asc, col("rk").asc, col("doc_id").asc)
    },

    // ------------------------------------------------------------------
    // OBSERVED IN-FLIGHT METRICS (q157, r13) — Dataset.observe /
    // CollectMetrics: release-audit metrics collected in the SAME job
    // that materializes the output, not by a second scan. Here the
    // q56-family split assignment is written to its release path while
    // an Observation piggybacks per-split counts, char totals, and a
    // bucket-skew bound onto that one pass; the query's result row IS
    // what the observation handed back after the write action. At
    // 100 TB this is the difference between auditing a snapshot for
    // free and re-reading it: CollectMetrics folds into the write
    // job's tasks (map-side, no extra exchange, no extra scan). The
    // oracle recomputes the same aggregates declaratively — observe
    // cannot change them, which is exactly the property worth pinning.
    QueryDef.sql(
      "q157_observed_metrics",
      """WITH sp AS (SELECT doc_id, n_chars,
        |    CASE WHEN ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::BIGINT
        |        % 10 < 8 THEN 'train' ELSE 'val' END AS split
        |  FROM documents)
        |SELECT CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS total_chars,
        |  CAST(sum(CASE WHEN split = 'train' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_train,
        |  CAST(sum(CASE WHEN split = 'val' THEN 1 ELSE 0 END) AS BIGINT)
        |    AS n_val,
        |  CAST(max(n_chars) AS BIGINT) AS max_chars
        |FROM sp""".stripMargin) { (s, dir) =>
      val bucket = conv(substring(md5(col("doc_id").cast("string")), 1, 8),
        16, 10).cast("long") % 10
      val sp = docs(s, dir)
        .select(col("doc_id"), col("n_chars"),
          when(bucket < 8, "train").otherwise("val").as("split"))
      val obs = org.apache.spark.sql.Observation("q157")
      val observed = sp.observe(obs,
        count(lit(1)).as("n_docs"),
        sum(col("n_chars")).cast("long").as("total_chars"),
        sum(when(col("split") === "train", 1L).otherwise(0L)).cast("long")
          .as("n_train"),
        sum(when(col("split") === "val", 1L).otherwise(0L)).cast("long")
          .as("n_val"),
        max(col("n_chars")).cast("long").as("max_chars"))
      // ONE action: the release write; the metrics ride its tasks. A
      // fresh per-invocation temp dir (the q193 discipline): a fixed
      // hashCode-derived path raced concurrent runs on mode(overwrite)
      // and collided across distinct dirs (ADVICE r13)
      val out = java.nio.file.Files
        .createTempDirectory("graft_observe_split").toString
      observed.write.mode("overwrite").parquet(out)
      val m = obs.get
      import s.implicits._
      Seq((m("n_docs").asInstanceOf[Long],
          m("total_chars").asInstanceOf[Long],
          m("n_train").asInstanceOf[Long],
          m("n_val").asInstanceOf[Long],
          m("max_chars").asInstanceOf[Long]))
        .toDF("n_docs", "total_chars", "n_train", "n_val", "max_chars")
    },

    // ------------------------------------------------------------------
    // TOKEN-BUDGET MIXTURE MATERIALIZATION (r13) — the step between the
    // dataset card and the release that a Llama/GPT-class data recipe
    // actually runs: given per-domain TARGET WEIGHTS, a GLOBAL token
    // budget B, and an epoch cap E, decide how many epochs of each
    // domain to take (continuous, fractional) and MATERIALIZE the
    // repeated dataset deterministically. q114 rebalances to a uniform
    // mix by downsampling only; this solves the general weighted case
    // WITH upsampling (epochs > 1) under a budget — classic
    // WATERFILLING, closed-form: take_d = min(lam*w_d, E*T_d) with lam
    // chosen so sum(take) = B. Sort domains by saturation point
    // lam_d = E*T_d/w_d; prefix sums give, for each candidate saturated
    // prefix, lam = (B - sum_sat E*T) / (W - sum_sat w); exactly one
    // prefix brackets its own lam (total(lam) is continuous increasing)
    // — pure window functions over the PER-DOMAIN table (tens of rows at
    // 100 TB; the single-partition WindowExec is the q121 precedent).
    // Weights here derive from the source id (tiers 1/10/19) and
    // B = 2 epochs' worth of corpus with E = 3: tier-19 domains
    // saturate at rate 3.0 while tier-1 stay fractional, so BOTH
    // branches of the solver are exercised at every SF. Materialization:
    // floor(rate) full epochs per doc + one extra iff the salted
    // content-stable md5 fraction falls under the fractional part — the
    // q114/q55 hash discipline, so the emitted multiset is reproducible
    // across engines, partitionings, and reruns. Scale shape: one tiny
    // per-domain agg, the solver on that table only, rates broadcast
    // back; the corpus streams ONCE through a narrow <=E-fold
    // sequence+explode (no shuffle ever touches text); the report is
    // one map-side-combined agg over the emitted rows. FP determinism:
    // every windowed sum is over integer-valued doubles (exact at any
    // association); lam rounds to 6 decimals before rates, rates round
    // to 6 before the epoch threshold.
    QueryDef.sql(
      "q159_mixture_token_budget",
      """WITH c AS (SELECT source,
        |    CAST(CAST(substr(source, 4) AS INT) % 3 * 9 + 1 AS DOUBLE) AS w,
        |    CAST(sum(n_chars) AS DOUBLE) AS t,
        |    CAST(count(*) AS BIGINT) AS n_docs,
        |    CAST(sum(n_chars) AS BIGINT) AS chars_avail
        |  FROM documents GROUP BY source),
        |tot AS (SELECT sum(w) AS wsum, 2.0 * sum(t) AS b FROM c),
        |s AS (SELECT c.*, 3.0 * t / w AS lam_d FROM c),
        |o AS (SELECT s.*,
        |    coalesce(sum(3.0 * t) OVER (ORDER BY lam_d, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS pcap,
        |    coalesce(sum(w) OVER (ORDER BY lam_d, source
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0.0) AS pw,
        |    coalesce(lag(lam_d) OVER (ORDER BY lam_d, source), 0.0) AS plam
        |  FROM s),
        |cand AS (SELECT o.*, (tt.b - pcap) / (tt.wsum - pw) AS lam_c
        |  FROM o CROSS JOIN tot tt),
        |lam AS (SELECT min(round(lam_c, 6)) AS lam FROM cand
        |  WHERE plam <= lam_c AND lam_c < lam_d),
        |r AS (SELECT s.source, s.w, s.t, s.n_docs, s.chars_avail,
        |    round(least(3.0, coalesce(l.lam, 1e18) * s.w / s.t), 6) AS rate
        |  FROM s CROSS JOIN lam l),
        |m AS (SELECT d.source, d.n_chars,
        |    CAST(floor(r.rate) AS BIGINT)
        |      + CASE WHEN ('0x' || substr(md5('mixb' || CAST(d.doc_id AS VARCHAR)), 1, 8))::BIGINT
        |          % 1000000 / 1000000.0 < r.rate - floor(r.rate)
        |        THEN 1 ELSE 0 END AS copies
        |  FROM documents d JOIN r ON d.source = r.source),
        |e AS (SELECT source, CAST(sum(copies) AS BIGINT) AS rows_emitted,
        |    CAST(sum(copies * n_chars) AS BIGINT) AS chars_emitted
        |  FROM m GROUP BY source)
        |SELECT r.source, CAST(r.w AS BIGINT) AS weight, r.n_docs,
        |  r.chars_avail, round(r.rate, 4) AS rate,
        |  coalesce(e.rows_emitted, 0) AS rows_emitted,
        |  coalesce(e.chars_emitted, 0) AS chars_emitted
        |FROM r LEFT JOIN e ON r.source = e.source
        |ORDER BY r.source ASC""".stripMargin) { (s, dir) =>
      val d = docs(s, dir)
      val r = mixtureRates(s, dir)
      val frac = (conv(substring(
          md5(concat(lit("mixb"), col("doc_id").cast("string"))), 1, 8),
          16, 10).cast("long") % 1000000) / lit(1000000.0)
      val withCopies = d
        .join(broadcast(r.select(col("source"), col("rate"))), "source")
        .withColumn("copies",
          floor(col("rate")) +
            when(frac < col("rate") - floor(col("rate")), 1L).otherwise(0L))
      // the REAL (doc, epoch) materialization a release writes: a narrow
      // <=E-fold expansion, no shuffle on text; copies=0 docs drop via
      // the empty-array (non-outer) explode
      val emitted = withCopies
        .select(col("source"), col("n_chars"),
          explode(when(col("copies") > 0,
              sequence(lit(1L), col("copies")))
            .otherwise(array().cast("array<long>"))).as("epoch"))
      val e = emitted.groupBy(col("source")).agg(
        count(lit(1)).as("rows_emitted"),
        sum(col("n_chars")).as("chars_emitted"))
      r.join(e, Seq("source"), "left")
        .select(col("source"), col("w").cast("long").as("weight"),
          col("n_docs"), col("chars_avail"),
          round(col("rate"), 4).as("rate"),
          coalesce(col("rows_emitted"), lit(0L)).as("rows_emitted"),
          coalesce(col("chars_emitted"), lit(0L)).as("chars_emitted"))
        .orderBy(col("source").asc)
    },

    // ------------------------------------------------------------------
    // BYTE-BALANCED RELEASE SHARDING + MANIFEST (r13) — the export step
    // after the mixture is decided: split the ordered corpus into S
    // shards of ~equal BYTES (not rows — doc sizes are skewed) and emit
    // the manifest the serving side prunes with (per shard: doc count,
    // bytes, ordered key range, domain spread). Shard of a doc =
    // (cumStart * S) div total where cumStart = inclusive running sum of
    // bytes minus own size ∈ [0, total) — pure integer arithmetic, so
    // the assignment is deterministic across engines. The running sum is
    // operators/PrefixSum (the q57 bucketed-carry scheme): within-bucket
    // windows stay bounded (doc_id div 1000 buckets), the cross-bucket
    // carry is a window over the BUCKET table — no single-reducer global
    // window ever touches corpus-sized data, which is what makes this
    // shard assignment hold at 100 TB (contrast the naive
    // sum().over(orderBy) — one reducer). The manifest agg is map-side
    // combined over S*sources cells. At scale the export writes
    // partitionBy(shard); the query's output IS the manifest artifact.
    QueryDef.sql(
      "q160_release_sharding",
      """WITH c AS (SELECT doc_id, source, n_chars,
        |    sum(n_chars) OVER (ORDER BY doc_id
        |      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
        |  FROM documents),
        |t AS (SELECT CAST(sum(n_chars) AS BIGINT) AS total FROM documents),
        |sh AS (SELECT doc_id, source, n_chars,
        |    ((cum - n_chars) * 16) // t.total AS shard
        |  FROM c CROSS JOIN t)
        |SELECT CAST(shard AS BIGINT) AS shard,
        |  CAST(count(*) AS BIGINT) AS n_docs,
        |  CAST(sum(n_chars) AS BIGINT) AS shard_chars,
        |  CAST(min(doc_id) AS BIGINT) AS min_key,
        |  CAST(max(doc_id) AS BIGINT) AS max_key,
        |  CAST(count(DISTINCT source) AS BIGINT) AS n_sources
        |FROM sh GROUP BY shard ORDER BY shard ASC""".stripMargin) { (s, dir) =>
      import graft.operators.PrefixSum
      val d = docs(s, dir)
        .select(col("doc_id"), col("source"), col("n_chars"))
        .withColumn("g", lit(0))
      val cum = PrefixSum.runningSum(
        d, "g", expr("doc_id div 1000"), Seq(col("doc_id")),
        col("n_chars"), "cum")
      val t = d.agg(sum(col("n_chars")).as("total"))
      cum.crossJoin(broadcast(t))
        .withColumn("shard", expr("((cum - n_chars) * 16) div total"))
        .groupBy(col("shard"))
        .agg(count(lit(1)).as("n_docs"),
          sum(col("n_chars")).as("shard_chars"),
          min(col("doc_id")).as("min_key"),
          max(col("doc_id")).as("max_key"),
          countDistinct(col("source")).as("n_sources"))
        .orderBy(col("shard").asc)
    },

    // ------------------------------------------------------------------
    // CLASSIFIER CALIBRATION REPORT (r13) — the audit a trained quality
    // gate must pass before its threshold is trusted: bin the q142
    // scores into 10 equal-width bins and compare each bin's mean
    // predicted score against its observed positive rate (the
    // reliability-diagram table; per-bin |gap| is the ECE contribution).
    // A well-calibrated gate has gap ~ 0 in populated bins; a large gap
    // at the threshold bin means the 0.5 cut keeps/drops the wrong mass.
    // Reuses qualityTraining verbatim (same checkpointed features, same
    // rounded GD weights), so the report audits EXACTLY the weights the
    // gate serves. Scale shape: scoring is the same narrow literal-
    // weight expression; the report is ONE map-side-combined agg into
    // <=10 cells. Oracle replays the full GD chain + binning.
    QueryDef.sql(
      "q162_classifier_calibration",
      s"""WITH $gdCtes,
         |sel AS (SELECT round(1/(1+exp(-${gdDot("w")})), 4) AS score, y
         |  FROM f, w3 w),
         |b AS (SELECT CAST(least(floor(score * 10), 9) AS BIGINT) AS bin,
         |    score, y FROM sel)
         |SELECT bin, CAST(count(*) AS BIGINT) AS n_docs,
         |  round(avg(score), 4) AS mean_score,
         |  round(avg(y), 4) AS pos_rate,
         |  round(abs(round(avg(score), 4) - round(avg(y), 4)), 4) AS gap
         |FROM b GROUP BY bin ORDER BY bin ASC""".stripMargin) { (s, dir) =>
      val (f, w) = qualityTraining(s, dir)
      val score = gdScore(w)
      f.select(score.as("score"), col("y"))
        .withColumn("bin",
          least(floor(col("score") * 10), lit(9.0)).cast("long"))
        .groupBy(col("bin"))
        .agg(count(lit(1)).as("n_docs"),
          round(avg(col("score")), 4).as("mean_score"),
          round(avg(col("y")), 4).as("pos_rate"))
        .withColumn("gap",
          round(abs(col("mean_score") - col("pos_rate")), 4))
        .orderBy(col("bin").asc)
    },

    // ------------------------------------------------------------------
    // CURRICULUM TRAINING ORDER (r13) — the materialized global sample
    // order a curriculum run feeds the data loader: documents grouped
    // into deterministic quality tiers (here n_chars bands; any scored
    // tier works — the plan is tier-source-agnostic), shuffled WITHIN
    // each tier by a seedable md5 key (rand()-free, so the order is
    // reproducible and resumable), and assigned one GLOBAL position.
    // The position is the q153 operator, not a partition-less window:
    // `Window.orderBy(...)` with no partition key collapses the corpus
    // onto one reducer (the bench's own WindowExec warning), while
    // DistributedRank range-partitions on (tier, shuffle-key) and emits
    // global row numbers at range parallelism with one tiny boundary-
    // stats merge on the driver — the only plan shape under which
    // "write out the epoch's sample order" survives 100 TB. The md5 key
    // is unique per doc, so the order is total and tie-free by
    // construction; the oracle replays tiering, key, and row_number.
    QueryDef.sql(
      "q181_curriculum_order",
      """WITH t AS (SELECT doc_id,
        |    CASE WHEN n_chars >= 600 THEN 2
        |         WHEN n_chars >= 200 THEN 1 ELSE 0 END AS tier,
        |    md5('curr7' || CAST(doc_id AS VARCHAR)) AS rk
        |  FROM documents)
        |SELECT CAST(row_number() OVER (
        |    ORDER BY tier DESC, rk ASC, doc_id ASC) AS INTEGER) AS pos,
        |  doc_id, tier
        |FROM t ORDER BY pos ASC""".stripMargin) { (s, dir) =>
      val tiered = docs(s, dir).select(col("doc_id"),
          when(col("n_chars") >= 600, 2)
            .when(col("n_chars") >= 200, 1).otherwise(0).as("tier"),
          md5(concat(lit("curr7"), col("doc_id").cast("string"))).as("rk"))
      graft.operators.DistributedRank.withRanks(tiered, Seq(),
          Seq(("tier", false), ("rk", true), ("doc_id", true)))
        .select(col("rn").as("pos"), col("doc_id"), col("tier"))
        .orderBy(col("pos").asc)
    },

    // ------------------------------------------------------------------
    // CLOSED-FORM MULTI-FEATURE OLS (q197, r13) — the calibration
    // regression a pipeline fits when it needs interpretable
    // coefficients (which raw signals predict token count / quality /
    // cost) without an iterative trainer. q142's GD answers "can a
    // linear model separate?"; this answers "what is THE least-squares
    // fit, exactly". Plan: features are narrow codegen'd expressions,
    // every moment the normal equations need folds in ONE map-side-
    // combined HashAggregate (covar_pop/var_pop — Welford merges,
    // O(p²) state per partition), and the 3×3 solve is driver-side
    // (operators/Ols). The oracle is maximally independent: DuckDB
    // computes its OWN covariances and solves the SAME normal equations
    // by an explicit Cramer 3×3 determinant expansion — no engine
    // output feeds it. Features scaled to O(1) so both engines' e4
    // lattice sits far above their FP fold noise.
    QueryDef.sql(
      "q197_ols_normal_equations",
      """WITH f AS (SELECT
        |    CAST(len(string_split_regex(trim(text), '\s+')) AS DOUBLE)
        |      / 100.0 AS y,
        |    CAST(n_chars AS DOUBLE) / 1000.0 AS x1,
        |    CAST(n_chars AS DOUBLE)
        |      / len(string_split_regex(trim(text), '\s+')) AS x2,
        |    CAST(len(list_distinct(string_split_regex(trim(text), '\s+')))
        |      AS DOUBLE)
        |      / len(string_split_regex(trim(text), '\s+')) AS x3
        |  FROM documents),
        |m AS (SELECT count(*) AS n,
        |    avg(y) AS my, avg(x1) AS m1, avg(x2) AS m2, avg(x3) AS m3,
        |    covar_pop(x1, x1) AS s11, covar_pop(x1, x2) AS s12,
        |    covar_pop(x1, x3) AS s13, covar_pop(x2, x2) AS s22,
        |    covar_pop(x2, x3) AS s23, covar_pop(x3, x3) AS s33,
        |    covar_pop(x1, y) AS c1, covar_pop(x2, y) AS c2,
        |    covar_pop(x3, y) AS c3, var_pop(y) AS vy
        |  FROM f),
        |d AS (SELECT *,
        |    s11*(s22*s33 - s23*s23) - s12*(s12*s33 - s23*s13)
        |      + s13*(s12*s23 - s22*s13) AS det
        |  FROM m),
        |b AS (SELECT n, my, m1, m2, m3, vy, c1, c2, c3,
        |    (c1*(s22*s33 - s23*s23) - s12*(c2*s33 - s23*c3)
        |      + s13*(c2*s23 - s22*c3)) / det AS b1,
        |    (s11*(c2*s33 - c3*s23) - c1*(s12*s33 - s23*s13)
        |      + s13*(s12*c3 - c2*s13)) / det AS b2,
        |    (s11*(s22*c3 - s23*c2) - s12*(s12*c3 - c2*s13)
        |      + c1*(s12*s23 - s22*s13)) / det AS b3
        |  FROM d)
        |SELECT CAST(n AS BIGINT) AS n,
        |  CAST(floor(10000.0*b1 + 0.5) AS BIGINT) AS beta1_e4,
        |  CAST(floor(10000.0*b2 + 0.5) AS BIGINT) AS beta2_e4,
        |  CAST(floor(10000.0*b3 + 0.5) AS BIGINT) AS beta3_e4,
        |  CAST(floor(10000.0*(my - b1*m1 - b2*m2 - b3*m3) + 0.5) AS BIGINT)
        |    AS intercept_e4,
        |  CAST(floor(10000.0*((b1*c1 + b2*c2 + b3*c3) / vy) + 0.5) AS BIGINT)
        |    AS r2_e4
        |FROM b""".stripMargin) { (s, dir) =>
      import s.implicits._
      val toks = TF.tokens(col("text"))
      val nTok = size(toks).cast("double")
      val feats = docs(s, dir).select(
        (nTok / 100.0).as("y"),
        (col("n_chars").cast("double") / 1000.0).as("x1"),
        (col("n_chars").cast("double") / nTok).as("x2"),
        (size(array_distinct(toks)).cast("double") / nTok).as("x3"))
      val fit = graft.operators.Ols.fit(feats, "y", Seq("x1", "x2", "x3"))
      def e4(x: Double) = math.floor(10000.0 * x + 0.5).toLong
      Seq((fit.n, e4(fit.betas(0)), e4(fit.betas(1)), e4(fit.betas(2)),
          e4(fit.intercept), e4(fit.r2)))
        .toDF("n", "beta1_e4", "beta2_e4", "beta3_e4", "intercept_e4",
          "r2_e4")
    }
  )
}
