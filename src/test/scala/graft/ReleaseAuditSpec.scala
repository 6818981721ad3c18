package graft

import org.apache.spark.sql.functions._

/** Behavior pins for the r13 release-audit trio: the q183 release diff
  * (every status live, totals accounted), the q181 curriculum order
  * (contiguous global positions, tier blocks in order), and the q182
  * tokenizer-fertility audit (ratios bounded below by their identities).
  */
class ReleaseAuditSpec extends SparkSpec {

  private val dir = "/root/testdata/sf0.001"

  test("q183: all four diff statuses are live and totals account for " +
      "the union of both releases") {
    val d = Queries.byName("q183_release_diff").build(spark, dir).cache()
    val byStatus = d.groupBy(col("status")).agg(sum(col("n_docs")).as("n"))
      .collect().map(r => r.getString(0) -> r.getLong(1)).toMap
    // the injected revision slice (doc_id % 7 = 0 in the bucket overlap)
    // keeps every branch of the diff live — a regression that stops
    // detecting changes cannot stay green
    assert(byStatus.keySet == Set("added", "removed", "changed", "unchanged"),
      s"expected all four statuses live, got $byStatus")
    assert(byStatus.values.forall(_ > 0), s"empty status bucket: $byStatus")
    // totals: one diff row per doc in old ∪ new
    val docs = spark.read.parquet(s"$dir/documents.parquet")
      .select(col("doc_id"),
        (conv(substring(md5(concat(lit("rel"), col("doc_id").cast("string"))),
          1, 8), 16, 10).cast("long") % 10).as("bk"))
    val unionN = docs.filter(col("bk") < 8 || col("bk") >= 2).count()
    assert(byStatus.values.sum == unionN,
      s"diff rows ${byStatus.values.sum} must equal |old ∪ new| $unionN")
    d.unpersist()
  }

  test("q181: global positions are 1..N contiguous and tier blocks are " +
      "strictly ordered high-to-low") {
    val o = Queries.byName("q181_curriculum_order").build(spark, dir).cache()
    val n = o.count()
    val stats = o.agg(min(col("pos")), max(col("pos")),
      countDistinct(col("pos"))).head()
    assert(stats.getInt(0) == 1 && stats.getInt(1) == n &&
      stats.getLong(2) == n, "positions must be a permutation of 1..N")
    // every tier-2 doc sorts before every tier-1 doc, etc.
    val tierRange = o.groupBy(col("tier"))
      .agg(min(col("pos")).as("lo"), max(col("pos")).as("hi"))
      .collect().map(r => r.getInt(0) -> (r.getInt(1), r.getInt(2))).toMap
    val orderedTiers = tierRange.keys.toSeq.sorted.reverse
    orderedTiers.sliding(2).foreach {
      case Seq(hiT, loT) =>
        assert(tierRange(hiT)._2 < tierRange(loT)._1,
          s"tier $hiT must fully precede tier $loT: $tierRange")
      case _ =>
    }
    o.unpersist()
  }

  test("q182: fertility and chars-per-subword respect their identities " +
      "(every word has >= 1 subword, every subword >= 1 char)") {
    val f = Queries.byName("q182_tokenizer_fertility").build(spark, dir)
      .cache()
    assert(f.count() > 0, "at least one language row")
    assert(f.filter(col("n_subwords") < col("n_words")).count() == 0,
      "subwords cannot undercount words")
    assert(f.filter(col("n_chars") < col("n_subwords")).count() == 0,
      "chars cannot undercount subwords")
    assert(f.filter(col("fertility_e4") < 10000L).count() == 0,
      "fertility is >= 1 by identity")
    assert(f.filter(col("cps_e4") < 10000L).count() == 0,
      "chars-per-subword is >= 1 by identity")
    f.unpersist()
  }
}
