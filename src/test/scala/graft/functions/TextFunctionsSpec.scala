package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.functions._

/** Behavior tests for the text-analysis operators: planted near-duplicates
  * must be caught by the MinHash-LSH and SimHash pipelines, fingerprints
  * must be deterministic, and the heuristics must score sensibly.
  */
class TextFunctionsSpec extends SparkSpec {

  import graft.functions.{TextFunctions => TF}

  private lazy val base =
    "the quick brown fox jumps over the lazy dog and runs far away into " +
      "the deep green forest while the sun slowly sets behind the hills"

  /** corpus: doc 0 and 1 identical after normalization; doc 2 near-dup
    * (one word changed); doc 3 unrelated.
    */
  private lazy val docs = {
    import spark.implicits._
    Seq(
      (0L, base),
      (1L, "  " + base.toUpperCase + "  "),
      (2L, base.replace("slowly", "quickly")),
      (3L, "completely different content about spark query engines and " +
        "distributed columnar execution plans with adaptive optimization"))
      .toDF("doc_id", "text")
  }

  test("native word_ngrams matches the declared gram semantics") {
    import spark.implicits._
    import org.apache.spark.sql.functions.{col, explode}
    def grams(toks: Seq[String], n: Int): Seq[String] =
      Seq(Tuple1(toks)).toDF("t")
        .select(explode(NativeExpressions.wordNgrams(col("t"), n)))
        .collect().map(_.getString(0)).toSeq
    assert(grams(Seq("a", "b", "c", "d"), 3) == Seq("a b c", "b c d"))
    assert(grams(Seq("a", "b", "c"), 3) == Seq("a b c"))
    assert(grams(Seq("a", "b"), 3).isEmpty, "short docs yield no grams")
    assert(grams(Seq.empty, 2).isEmpty)
    assert(grams(Seq("x"), 1) == Seq("x"))
  }

  test("native minhash_sigs equals the declarative explode+min formulation") {
    import spark.implicits._
    import org.apache.spark.sql.functions._
    // arbitrary token rows incl. the degenerate short-doc shingle shapes
    val rows = Seq(
      Seq("the", "quick", "brown", "fox", "jumps"),
      Seq("one", "two"), Seq("solo"), Seq.empty[String],
      Seq("a", "a", "a", "a"))
    val as = Seq(1299709L, 15485863L, 32452843L)
    val bs = Seq(104729L, 224737L, 350377L)
    val p = 2147483647L
    val df = rows.zipWithIndex.map { case (t, i) => (i.toLong, t) }
      .toDF("id", "toks")
    val native = df.select(col("id"),
      NativeExpressions.minhashSigs(col("toks"), as, bs, p).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    // declarative reference: shingles via sequence/greatest + concat_ws
    // null skipping, h from md5-hex chars 18..32 mod p, per-sig min
    val shingles = transform(
      sequence(lit(0), greatest(size(col("toks")) - 3, lit(0))),
      i => concat_ws(" ", try_element_at(col("toks"), i + 1),
        try_element_at(col("toks"), i + 2), try_element_at(col("toks"), i + 3)))
    val h = conv(substring(md5(col("sh")), 18, 15), 16, 10).cast("long") % p
    val decl = df.select(col("id"), explode(shingles).as("sh"))
      .select(col("id"), h.as("h"))
      .groupBy(col("id"))
      .agg(array(as.zip(bs).map { case (a, b) =>
        min((col("h") * a + b) % p) }: _*).as("sig"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    decl.foreach { case (id, sig) =>
      assert(native(id) == sig, s"row $id: native ${native(id)} vs decl $sig")
    }
    // the empty-token row has one empty-string shingle in BOTH forms
    assert(native(3L).forall(_ != Long.MaxValue))
  }

  test("normalizeText collapses case and whitespace") {
    val r = docs.select(TF.normalizeText(col("text")).as("n"))
      .collect().map(_.getString(0))
    assert(r(0) == r(1))
    assert(r(0) != r(2))
  }

  test("dedup by normalized sha2 digest keeps one of the identical pair") {
    val d = docs.withColumn("digest", sha2(TF.normalizeText(col("text")), 256))
    val survivors = d.groupBy(col("digest"))
      .agg(min(col("doc_id")).as("keeper"), count(lit(1)).as("n"))
      .collect()
    assert(survivors.length == 3)
    assert(survivors.find(_.getLong(2) == 2L).map(_.getLong(1)).contains(0L))
  }

  test("simhash of near-duplicates is close, unrelated docs far") {
    val toks = TF.tokens(TF.normalizeText(col("text")))
    val th = transform(toks, t => xxhash64(t))
    val bitSums = (0 until 32).map { i =>
      aggregate(col("th"), lit(0L), (acc, h) =>
        acc + when(shiftright(h, i).bitwiseAND(lit(1L)) === 1L, lit(1L))
          .otherwise(lit(-1L)))
    }
    val sim = bitSums.zipWithIndex.map { case (b, i) =>
      when(b > 0, lit(1L << i)).otherwise(lit(0L))
    }.reduce(_ bitwiseOR _)
    val h = docs.select(col("doc_id"), th.as("th"))
      .select(col("doc_id"), sim.as("h"))
      .collect().map(r => r.getLong(0) -> r.getLong(1)).toMap
    def hamming(a: Long, b: Long) = java.lang.Long.bitCount(a ^ b)
    assert(hamming(h(0L), h(1L)) == 0, "identical docs -> identical simhash")
    assert(hamming(h(0L), h(2L)) <= 6, "near-dup within threshold")
    assert(hamming(h(0L), h(3L)) > 6, "unrelated doc beyond threshold")
  }

  test("fingerprint is deterministic and identical for normalized dupes") {
    val fp = docs.select(col("doc_id"), TF.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    val fp2 = docs.select(col("doc_id"), TF.fingerprint(col("text")).as("fp"))
      .collect().map(r => r.getLong(0) -> r.getSeq[Long](1)).toMap
    assert(fp == fp2, "two evaluations agree")
    assert(fp(0L) == fp(1L), "normalization-equal docs share fingerprints")
    assert(fp(0L) != fp(3L))
    assert(fp(0L).size <= 8)
  }

  test("language id picks profile languages and falls back to und") {
    import spark.implicits._
    val d = Seq(
      "the cat and the dog is with me",
      "der hund und die katze ist mit mir",
      "le chat et la chienne est avec moi",
      "xyzzy qwerty asdf").toDF("text")
    val got = d.select(TF.languageId(col("text"))).collect().map(_.getString(0))
    assert(got.toSeq == Seq("en", "de", "fr", "und"))
  }

  test("quality score orders fluent text above noise") {
    import spark.implicits._
    val d = Seq(
      ("fluent", base),
      ("noise", "@@@ ### $$$ %%% ^^^ &&& *** ((( )))")).toDF("k", "text")
    val s = d.select(col("k"), TF.qualityScore(col("text")).as("q"))
      .collect().map(r => r.getString(0) -> r.getDouble(1)).toMap
    assert(s("fluent") > s("noise"))
    assert(s.values.forall(q => q >= 0.0 && q <= 1.0))
  }

  test("token and subword counts") {
    import spark.implicits._
    val d = Seq("hello, world! it's 42 degrees").toDF("text")
    val r = d.select(TF.tokenCount(col("text")).as("t"),
      TF.subwordCount(col("text")).as("s")).collect()(0)
    assert(r.getLong(0) == 5)
    // hello , world ! it ' s 4 2 degrees -> 10
    assert(r.getLong(1) == 10)
  }

  test("null, empty, and whitespace-only text never throw (external-corpus hardening)") {
    // the fixture corpus is null-free, but a user's corpus won't be —
    // every text kernel must yield null/empty/zero, never an exception
    import spark.implicits._
    val d = Seq(Option.empty[String], Some(""), Some("   \t\n "))
      .toDF("text")
    val r = d.select(
      TF.normalizeText(col("text")).as("norm"),
      TF.tokens(col("text")).as("toks"),
      TF.tokenCount(col("text")).as("tc"),
      TF.alphaRatio(col("text")).as("ar"),
      TF.languageId(col("text")).as("lang"),
      TF.fingerprint(col("text")).as("fp")).collect()
    assert(r.length == 3) // evaluation itself must not throw
    val nullRow = r(0)
    assert(nullRow.isNullAt(0) && nullRow.isNullAt(1),
      "null text propagates null, never a crash")
    // empty/whitespace rows: defined, finite outputs
    Seq(r(1), r(2)).foreach { row =>
      assert(!row.isNullAt(4) , s"languageId must be defined: $row")
      assert(row.getAs[Double]("ar") == 0.0 || row.isNullAt(3),
        s"alphaRatio of empty text must be 0 or null: $row")
    }
    // the gates built on these kernels must also pass such rows through
    val gated = graft.streaming.Streams.qualityGate(
      d.withColumn("doc_id", monotonically_increasing_id()),
      Array(0.1, 2.0, -1.0, 0.5), threshold = 0.0)
    assert(gated.count() <= 3) // no exception; null score rows may drop
  }

  test("native vector kernels: null rows propagate, mismatched lengths fail loudly") {
    import graft.functions.{NativeExpressions => NE}
    import spark.implicits._
    // null input row -> null output (nullSafeEval contract), both the
    // interpreted and codegen paths
    val d = Seq(
      (Some(Array(1.0f, 2.0f)), Some(Array(3.0f, 4.0f))),
      (Option.empty[Array[Float]], Some(Array(3.0f, 4.0f))))
      .toDF("a", "b")
    val r = d.select(NE.vectorDot(col("a"), col("b")).as("dot")).collect()
    assert(r(0).getDouble(0) == 11.0)
    assert(r(1).isNullAt(0), "null vector must yield null, not crash")
    // mismatched dimensions are corrupt input: documented LOUD failure
    // (never a plausible-wrong score) — same verdict as the DuckDB oracle
    val bad = Seq((Array(1.0f, 2.0f), Array(1.0f, 2.0f, 3.0f))).toDF("a", "b")
    val e = intercept[Exception] {
      bad.select(NE.vectorDot(col("a"), col("b"))).collect()
    }
    def msgs(t: Throwable): Seq[String] =
      Option(t).toSeq.flatMap(x =>
        Option(x.getMessage).toSeq ++ msgs(x.getCause))
    assert(msgs(e).exists(_.contains("mismatched lengths")),
      s"expected the documented loud mismatch failure, got: $e")
  }
}
