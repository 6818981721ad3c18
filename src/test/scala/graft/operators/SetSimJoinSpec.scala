package graft.operators

import graft.SparkSpec
import graft.functions.{NativeExpressions => NE, TextFunctions => TF}
import graft.Tables
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Pins for operators/SetSimJoin — the q170 engine.
  *
  * The load-bearing claim is LOSSLESSNESS: prefix filtering is a blocking
  * scheme with recall exactly 1 (unlike LSH), so the prefix-join result
  * must EQUAL the brute-force all-pairs join, element for element, on
  * real corpus shingle sets at two SFs. The second claim is that the
  * filter actually prunes (candidates ≪ n(n-1)/2). The third is the
  * integer-arithmetic boundary discipline: a pair whose Jaccard is
  * EXACTLY tau must be kept (a double compare against 0.6 would drop it).
  */
class SetSimJoinSpec extends SparkSpec {

  private def shingleSets(dir: String): DataFrame = {
    val toks = TF.tokens(TF.normalizeText(col("text")))
    Tables.load(spark, dir, "documents")
      .select(col("doc_id").as("id"),
        array_distinct(NE.wordNgrams(toks, 3)).as("s"))
      .filter(size(col("s")) > 0)
  }

  private def asSet(df: DataFrame): Set[(Long, Long, Long)] =
    df.select(col("id_a"), col("id_b"),
        floor(col("jaccard") * 10000.0 + 0.5).cast("long").as("j4"))
      .collect()
      .map(r => (r.getLong(0), r.getLong(1), r.getLong(2))).toSet

  test("prefix join equals brute force on corpus shingles (lossless)") {
    for (dir <- Seq("/root/testdata/sf0.001", "/root/testdata/sf0.01")) {
      val items = shingleSets(dir).localCheckpoint()
      val pref = asSet(SetSimJoin.prefixJaccardJoin(items, 3, 5))
      val brute = asSet(SetSimJoin.bruteForceJaccardJoin(items, 3, 5))
      assert(pref == brute,
        s"$dir: prefix-filter join must be exact — " +
          s"missing ${brute.diff(pref).take(5)}, extra ${pref.diff(brute).take(5)}")
      assert(brute.nonEmpty, s"$dir: vacuous fixture — no near-dup pairs")
    }
  }

  test("prefix filter prunes the candidate space") {
    val items = shingleSets("/root/testdata/sf0.01").localCheckpoint()
    val n = items.count()
    val cands = SetSimJoin.candidates(items, 3, 5).count()
    val allPairs = n * (n - 1) / 2
    assert(cands * 100 < allPairs,
      s"expected <1% of the $allPairs-pair space, got $cands candidates")
  }

  test("a pair at exactly tau survives (integer threshold arithmetic)") {
    import spark.implicits._
    // |a ∩ b| = 3, |a ∪ b| = 5 → Jaccard exactly 3/5. The double compare
    // (i/u) * 5 >= 3 evaluates 0.6d * 5 = 2.9999999999999996 < 3 and
    // would drop it; the operator compares i*den >= u*num in longs.
    val items = Seq(
      (1L, Seq("w", "x", "y", "z")),
      (2L, Seq("w", "x", "y", "q"))).toDF("id", "s")
    val out = SetSimJoin.prefixJaccardJoin(items, 3, 5).collect()
    assert(out.length == 1 && out(0).getLong(0) == 1L && out(0).getLong(1) == 2L,
      s"boundary pair must be kept, got ${out.toSeq}")
    assert(math.abs(out(0).getDouble(2) - 0.6) < 1e-15)
  }

  test("pairs strictly below tau are rejected by verify even when blocked") {
    import spark.implicits._
    // ids 1,2 share "aa", which lands in both prefixes (equal dfs break
    // lexically, 'aa' first) — so (1,2) IS a candidate, but J = 1/3;
    // set 3 exists only to give zz1/zz2 a df of 2
    val items = Seq(
      (1L, Seq("aa", "zz1")),
      (2L, Seq("aa", "zz2")),
      (3L, Seq("q", "zz1", "zz2"))).toDF("id", "s")
    val cands = SetSimJoin.candidates(items, 3, 5)
      .collect().map(r => (r.getLong(0), r.getLong(1))).toSet
    assert(cands == Set((1L, 2L)),
      s"(1,2) must be the sole candidate via the shared prefix element, got $cands")
    assert(SetSimJoin.prefixJaccardJoin(items, 3, 5).count() == 0,
      "J = 1/3 < 3/5 must be verified away")
  }

  test("PPJoin length + positional filters hold the candidate counts") {
    // r13 measured the filterless prefix join's candidate share GROWING
    // with the corpus on this ~fixed shingle vocabulary (0.13 % at
    // sf0.01 → 2.4 % at sf0.1 of the pair space — VERDICT r13 #3); with
    // the r14 length + positional filters the measured counts are 25 and
    // 68,725 (0.02 % / 0.55 %). Pin them with zero headroom at the small
    // SF and ~9 % at the large one (the count is deterministic; the
    // slack only covers a future corpus regeneration) so a regression
    // that drops either filter fails loudly here, not in the bench.
    val bounds = Seq(
      ("/root/testdata/sf0.01", 30L),
      ("/root/testdata/sf0.1", 75000L))
    for ((dir, bound) <- bounds) {
      val items = shingleSets(dir).localCheckpoint()
      val cands = SetSimJoin.candidates(items, 3, 5).count()
      assert(cands <= bound,
        s"$dir: candidate count $cands exceeds the frozen bound $bound — " +
          "did the length/positional filters regress?")
    }
  }

  test("empty and singleton inputs produce no pairs") {
    import spark.implicits._
    val empty = Seq.empty[(Long, Seq[String])].toDF("id", "s")
    assert(SetSimJoin.prefixJaccardJoin(empty, 3, 5).count() == 0)
    val one = Seq((7L, Seq("only"))).toDF("id", "s")
    assert(SetSimJoin.prefixJaccardJoin(one, 3, 5).count() == 0)
  }
}
