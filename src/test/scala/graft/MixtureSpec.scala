package graft

import org.apache.spark.sql.functions._

/** Semantics of q114 domain-mixture rebalancing beyond the oracle row-hash:
  * determinism, rate-cap behavior, proximity of the downsampled domain to
  * the uniform target, and the nesting property that makes hash-threshold
  * survival rerun-safe on a growing corpus.
  */
class MixtureSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.01"

  private def mix() =
    Queries.byName("q114_domain_mixture").build(spark, dir)

  test("mixture report is deterministic and rate-capped domains keep everything") {
    val a = mix().collect()
    val b = mix().collect()
    assert(a.toSeq == b.toSeq, "mixture must be rand()-free deterministic")
    a.foreach { r =>
      val (nDocs, nKept, rate) =
        (r.getAs[Long]("n_docs"), r.getAs[Long]("n_kept"),
          r.getAs[Double]("rate"))
      assert(nKept <= nDocs, s"kept more than existed: $r")
      assert(rate > 0.0 && rate <= 1.0, s"rate out of range: $r")
      if (rate == 1.0)
        assert(nKept == nDocs,
          s"under-represented domain must keep all docs: $r")
    }
  }

  test("over-represented domain lands near the uniform target share") {
    val rows = mix().collect()
    val total = rows.map(_.getAs[Long]("n_docs")).sum
    val target = total.toDouble / rows.length
    val down = rows.filter(_.getAs[Double]("rate") < 1.0)
    assert(down.nonEmpty, "fixture must have an over-represented domain (en)")
    down.foreach { r =>
      val kept = r.getAs[Long]("n_kept").toDouble
      // binomial noise around target: sd ≈ sqrt(target) ≈ 10 at target
      // 100; 3 sd as the gate
      assert(math.abs(kept - target) <= 3 * math.sqrt(target),
        s"downsampled domain should land near target $target: $r")
    }
  }

  test("kept sets nest as the rate shrinks (grown corpus never churns the mix)") {
    // survival is frac(doc) < rate, so for rates r1 < r2 the r1-kept set
    // must be a SUBSET of the r2-kept set — a domain growing (its rate
    // dropping) only removes docs. Check on the raw survival predicate at
    // two rates.
    val d = spark.read.parquet(s"$dir/documents.parquet")
    val frac = (conv(substring(
        md5(concat(lit("mix"), col("doc_id").cast("string"))), 1, 8),
        16, 10).cast("long") % 1000000) / lit(1000000.0)
    def keptIds(rate: Double) =
      d.filter(frac < lit(rate)).select(col("doc_id"))
        .collect().map(_.getLong(0)).toSet
    val lo = keptIds(0.3)
    val hi = keptIds(0.6)
    assert(lo.nonEmpty && lo.size < hi.size)
    assert(lo.subsetOf(hi),
      "hash-threshold survival must be monotone in the rate")
  }

  test("q159 waterfilling meets the budget, caps epochs, and orders rates by weight") {
    val rows = Queries.byName("q159_mixture_token_budget")
      .build(spark, dir).collect()
    assert(rows.length == 20)
    rows.foreach { r =>
      val rate = r.getAs[Double]("rate")
      assert(rate > 0.0 && rate <= 3.0, s"rate outside (0, E]: $r")
      // emitted rows bounded by ceil(rate) * n_docs
      assert(r.getAs[Long]("rows_emitted") <=
        math.ceil(rate).toLong * r.getAs[Long]("n_docs"), s"over-emitted: $r")
    }
    // tier-19 weights must saturate at the epoch cap; tier-1 must not
    val byW = rows.groupBy(_.getAs[Long]("weight"))
    assert(byW(19L).forall(_.getAs[Double]("rate") == 3.0),
      "heaviest tier should hit the epoch cap")
    assert(byW(1L).forall(_.getAs[Double]("rate") < 1.0),
      "lightest tier should stay fractional")
    // the materialized multiset tracks the budget B = 2 * total chars:
    // hash-threshold binomial noise only — gate at 1% relative
    val avail = rows.map(_.getAs[Long]("chars_avail")).sum
    val emitted = rows.map(_.getAs[Long]("chars_emitted")).sum
    val budget = 2.0 * avail
    assert(math.abs(emitted - budget) / budget < 0.01,
      s"emitted $emitted should track budget $budget")
    // un-saturated rates must be proportional to weight (same lambda):
    // rate/w constant across unsaturated domains up to rate rounding
    val unsat = rows.filter(_.getAs[Double]("rate") < 3.0)
      .map(r => r.getAs[Double]("rate") * r.getAs[Long]("chars_avail") /
        r.getAs[Long]("weight"))
    assert(unsat.nonEmpty)
    // rate is reported rounded to 4 decimals, so the reconstructed
    // lambda carries up to ~T/w * 5e-5 absolute error — gate relatively
    assert((unsat.max - unsat.min) / unsat.max < 0.01,
      "unsaturated domains must share one lambda (take = lambda * w)")
  }

  test("waterfilling degenerates correctly to a single domain: rate = budget/corpus") {
    // one domain, B = 2*T, cap E = 3 > 2 → nobody saturates and the
    // solver must return exactly rate 2.0 (lambda = B/w, rate = lambda*w/T)
    val tmp = java.nio.file.Files.createTempDirectory("mix1dom").toString
    spark.read.parquet(s"$dir/documents.parquet")
      .filter(col("source") === "src7")
      .write.mode("overwrite").parquet(s"$tmp/documents.parquet")
    val r = graft.queries.TrainingPipeline.mixtureRates(spark, tmp).collect()
    assert(r.length == 1)
    assert(r(0).getAs[Double]("rate") == 2.0,
      s"single-domain rate must be exactly the budget ratio: ${r(0)}")
  }

  test("q160 shards are byte-balanced within one max-document of the ideal") {
    val rows = Queries.byName("q160_release_sharding")
      .build(spark, dir).collect()
    assert(rows.map(_.getAs[Long]("shard")).toSeq ==
      (0L until 16L), "all 16 shards present, in order")
    val total = rows.map(_.getAs[Long]("shard_chars")).sum
    val maxDoc = spark.read.parquet(s"$dir/documents.parquet")
      .agg(max(col("n_chars"))).collect()(0).getLong(0)
    val ideal = total.toDouble / 16
    rows.foreach { r =>
      val chars = r.getAs[Long]("shard_chars")
      // cumStart-interval assignment bounds every shard by one straddling
      // document around the ideal byte budget
      assert(math.abs(chars - ideal) <= maxDoc,
        s"shard ${r.getAs[Long]("shard")} chars $chars vs ideal $ideal " +
          s"(maxDoc $maxDoc)")
      assert(r.getAs[Long]("min_key") <= r.getAs[Long]("max_key"))
    }
    // key ranges must be disjoint and ordered — that is what makes the
    // manifest prunable
    rows.sliding(2).foreach { case Array(a, b) =>
      assert(a.getAs[Long]("max_key") < b.getAs[Long]("min_key"),
        "shard key ranges must be disjoint and ordered")
    }
  }
}
