package graft.functions

import graft.SparkSpec
import org.apache.spark.sql.DataFrame
import org.apache.spark.sql.functions._

/** Misra–Gries frequent-items summary + certified-exact top-k
  * (functions/HeavyHitters.scala, the q136 engine). Pins:
  *   - the survival guarantee (every term with freq > N/(m+1) is in the
  *     summary, with count underestimated by at most N/(m+1));
  *   - certified-path equality with the exact plan on a skewed stream;
  *   - the exact FALLBACK on an adversarial uniform stream where no
  *     certificate is possible (answer still exact);
  *   - the q136 corpus path takes the CERTIFIED branch at the gate SF.
  */
class HeavyHittersSpec extends SparkSpec {
  import spark.implicits._

  // skewed synthetic stream: term "t<i>" appears 1000 / (i+1) times for
  // i < 50 (a zipf-ish head), plus 5000 singletons (the near-unique tail)
  private lazy val skewed: DataFrame = {
    val head = (0 until 50).flatMap(i => Seq.fill(1000 / (i + 1))(s"t$i"))
    val tail = (0 until 5000).map(i => s"u$i")
    (head ++ tail).toDF("term").repartition(7) // uneven partial summaries
  }

  private def exactTop(df: DataFrame, k: Int): Seq[(String, Long)] = df
    .filter(length(col("term")) > 0)
    .groupBy("term").agg(count(lit(1)).as("cnt"))
    .orderBy(col("cnt").desc, col("term").asc).limit(k)
    .as[(String, Long)].collect().toSeq

  test("summary survival guarantee and error bound") {
    val m = 64
    val n = skewed.count()
    val bound = n / (m + 1)
    val sum = HeavyHitters.summary(skewed, "term", m)
    assert(sum.size <= m, "summary exceeds capacity")
    val truth = skewed.groupBy("term").agg(count(lit(1)).as("c"))
      .as[(String, Long)].collect().toMap
    truth.foreach { case (t, c) =>
      if (c > bound)
        assert(sum.contains(t), s"frequent term $t (count $c > bound $bound) evicted")
    }
    sum.foreach { case (t, est) =>
      val c = truth(t)
      assert(est <= c, s"$t overestimated: $est > $c")
      assert(c - est <= bound, s"$t underestimated past the bound: $c - $est > $bound")
    }
  }

  test("certified top-k equals the exact plan on a skewed stream") {
    // N ~ 9500, m = 128 -> bound ~ 73; the 10th head count is 100 > 73, so
    // the certificate must hold (m = 64 would put the bound at ~146 and
    // honestly fail it — the uniform test below covers that branch)
    val (df, cert) = HeavyHitters.exactTopKWithCert(skewed, "term", k = 10, capacity = 128)
    assert(cert, "expected the certificate to hold on the skewed stream")
    assert(df.as[(String, Long)].collect().toSeq == exactTop(skewed, 10))
  }

  test("uniform stream falls back to exact and still matches") {
    // 600 terms x 10 occurrences: kth count (10) <= N/(m+1) = 6000/65 = 92
    // is impossible to certify with m=64 -> the fallback must fire and the
    // answer must still equal the exact plan
    val uniform = (0 until 600).flatMap(i => Seq.fill(10)(f"w$i%03d")).toDF("term")
      .repartition(5)
    val (df, cert) = HeavyHitters.exactTopKWithCert(uniform, "term", k = 10, capacity = 64)
    assert(!cert, "a uniform domain must not be certified")
    assert(df.as[(String, Long)].collect().toSeq == exactTop(uniform, 10))
  }

  test("q136 corpus path takes the certified branch at the gate SF") {
    val docs = graft.Tables.load(spark, "/root/testdata/sf0.01", "documents")
    val toks = TextFunctions.tokens(TextFunctions.normalizeText(col("text")))
    val phrases = docs.select(toks.as("toks"))
      .select(explode(concat(col("toks"),
        NativeExpressions.wordNgrams(col("toks"), 2),
        NativeExpressions.wordNgrams(col("toks"), 3))).as("phrase"))
    val (df, cert) = HeavyHitters.exactTopKWithCert(phrases, "phrase", k = 25, capacity = 512)
    assert(cert, "q136's sketch path must be certified at sf0.01 " +
      "(unigram head clears N/(m+1) by construction)")
    assert(df.as[(String, Long)].collect().toSeq == exactTop(
      phrases.withColumnRenamed("phrase", "term"), 25))
  }
}
