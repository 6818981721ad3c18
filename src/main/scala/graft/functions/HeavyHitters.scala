package graft.functions

import scala.collection.mutable

import org.apache.spark.sql.{DataFrame, Encoder, Encoders}
import org.apache.spark.sql.catalyst.encoders.ExpressionEncoder
import org.apache.spark.sql.expressions.Aggregator
import org.apache.spark.sql.functions._

/** Bounded-memory frequent-items summary (Misra–Gries, subtract-min batched
  * variant) as a typed `Aggregator` — the candidate-generation half of a
  * CERTIFIED-exact top-k terms query over a heavy-tailed domain.
  *
  * Why it exists: an exact `groupBy(term).count()` over a 100 TB corpus
  * map-side combines, but the shuffle still carries one row per DISTINCT
  * term per partition — and a web-scale phrase domain is billions of
  * near-unique strings (typos, ids, urls), so the exchange is dominated by
  * the useless tail. A Misra–Gries summary of capacity m shuffles AT MOST m
  * rows per partition regardless of the domain size, and guarantees every
  * term with true frequency > N/(m+1) survives into the merged summary
  * (Misra & Gries 1982; the merge keeps total deduction ≤ N/(m+1) per
  * Agarwal et al., "Mergeable Summaries", PODS 2012). Exactness is then
  * restored the same way q135's bloom does it: a second scan confirms ONLY
  * the ≤ m candidates with an exact count — and, unlike a plain sketch
  * read-out, the result carries a CERTIFICATE: if the k-th confirmed count
  * strictly exceeds N/(m+1), no non-candidate term can displace it, so the
  * answer is provably identical to the exact plan. When the certificate
  * fails (a genuinely near-uniform domain has no heavy hitters — no sketch
  * can find what isn't there), the operator falls back to the exact
  * groupBy, trading the shuffle saving for unconditional correctness.
  *
  * Buffer lifecycle: `ScalaAggregator` is a `TypedImperativeAggregate`, so
  * the mutable map lives as a JVM object per partition and the (kryo)
  * buffer encoder only runs at the partial/final shuffle boundary — one
  * ≤ m-entry map per partition, not per row.
  */
final class MisraGries(capacity: Int)
    extends Aggregator[String, mutable.HashMap[String, Long], Map[String, Long]] {
  require(capacity > 0, s"capacity must be positive, got $capacity")

  override def zero: mutable.HashMap[String, Long] = mutable.HashMap.empty

  override def reduce(
      b: mutable.HashMap[String, Long], term: String): mutable.HashMap[String, Long] = {
    if (term != null) {
      b.update(term, b.getOrElse(term, 0L) + 1L)
      if (b.size > capacity) subtractMin(b)
    }
    b
  }

  /** Pointwise sum, then re-bound to capacity by subtracting the (m+1)-th
    * largest count and evicting the non-positive remainder (the mergeable-
    * summaries rule: deductions add across inputs but stay ≤ N/(m+1)
    * total, so the survival guarantee holds for the merged summary). */
  override def merge(
      x: mutable.HashMap[String, Long],
      y: mutable.HashMap[String, Long]): mutable.HashMap[String, Long] = {
    val (big, small) = if (x.size >= y.size) (x, y) else (y, x)
    small.foreach { case (t, c) => big.update(t, big.getOrElse(t, 0L) + c) }
    if (big.size > capacity) {
      val threshold = big.values.toArray.sorted(Ordering[Long].reverse)(capacity)
      val dead = big.collect { case (t, c) if c <= threshold => t }.toArray
      dead.foreach(big.remove)
      big.mapValuesInPlace((_, c) => c - threshold)
    }
    big
  }

  override def finish(b: mutable.HashMap[String, Long]): Map[String, Long] = b.toMap

  // subtract the minimum retained count from every entry and evict zeros:
  // each such event removes >= 1 entry and charges its deduction against
  // capacity+1 counters at once, which is what bounds total per-key
  // deduction by N/(capacity+1) while keeping the per-overflow cost O(m)
  // amortized across the insertions that refilled the map.
  private def subtractMin(b: mutable.HashMap[String, Long]): Unit = {
    val min = b.values.min
    val dead = b.collect { case (t, c) if c <= min => t }.toArray
    dead.foreach(b.remove)
    b.mapValuesInPlace((_, c) => c - min)
  }

  override def bufferEncoder: Encoder[mutable.HashMap[String, Long]] =
    Encoders.kryo[mutable.HashMap[String, Long]]
  override def outputEncoder: Encoder[Map[String, Long]] =
    ExpressionEncoder[Map[String, Long]]()
}

object HeavyHitters {

  /** Exact top-k terms with sketch acceleration and an exactness
    * certificate; see [[exactTopKWithCert]]. */
  def exactTopK(terms: DataFrame, termCol: String, k: Int, capacity: Int = 512): DataFrame =
    exactTopKWithCert(terms, termCol, k, capacity)._1

  /** The full pipeline: MG candidate generation over `termCol`, exact
    * confirmation count restricted to the candidate set, certificate
    * check, and exact fallback when the certificate fails.
    *
    * @param terms     one term per row (nulls and empty strings ignored)
    * @param termCol   the term column name in `terms`
    * @param k         how many top terms to return
    * @param capacity  MG summary capacity m; the certificate requires the
    *                  k-th confirmed count to strictly exceed N/(m+1), so
    *                  size m generously vs k (default 512 vs typical k ≤ 50)
    * @return ((term STRING, cnt LONG) top-k by cnt desc, term asc;
    *         certificate: true = sketch-accelerated result proven equal to
    *         the exact plan, false = exact fallback was taken)
    *
    * Plan shape (certified path): pass 1 is a single-row global aggregate
    * whose shuffle is one ≤ m-entry map per partition (plus the N counter,
    * same scan); pass 2 filters the term stream by an m-term literal set
    * (narrow, codegen'd `isin`) and exact-counts only those — the map-side
    * combine leaves ≤ m rows per partition in the exchange. Neither pass
    * ever shuffles the distinct-term domain. The k-row confirmation
    * collect and the ≤ m-entry summary collect are bounded by contract.
    */
  def exactTopKWithCert(
      terms: DataFrame, termCol: String, k: Int,
      capacity: Int = 512): (DataFrame, Boolean) = {
    val spark = terms.sparkSession
    import spark.implicits._
    require(k <= capacity, s"k=$k must not exceed summary capacity=$capacity")
    val clean = terms
      .filter(col(termCol).isNotNull && length(col(termCol)) > 0)
      .select(col(termCol).as("term"))
    val mg = udaf(new MisraGries(capacity))
    // one scan: the bounded summary AND the stream length N (needed for
    // the certificate) from the same single-row aggregate
    val row = clean.agg(mg(col("term")).as("summary"), count(lit(1)).as("n")).head()
    val candidates = row.getMap[String, Long](0).keys.toArray.sorted
    val n = row.getLong(1)
    val errorBound = n / (capacity + 1) // floor: true count of any non-candidate term
    def exact(src: DataFrame): DataFrame = src
      .groupBy(col("term"))
      .agg(count(lit(1)).as("cnt"))
      .orderBy(col("cnt").desc, col("term").asc)
      .limit(k)
    if (candidates.isEmpty) return (exact(clean), false)
    val confirmed = exact(clean.filter(col("term").isin(candidates.toIndexedSeq: _*)))
      .collect() // ≤ k rows
    // certificate: every non-candidate true count ≤ errorBound, so a full
    // k whose k-th count is STRICTLY above the bound cannot be displaced
    // (ties at the bound could lose to a missing term under term-asc)
    val certified = confirmed.length == k && confirmed.last.getLong(1) > errorBound
    if (certified)
      (confirmed.toSeq.map(r => (r.getString(0), r.getLong(1))).toDF("term", "cnt"), true)
    else (exact(clean), false)
  }

  /** The raw merged summary (term → lower-bound count) for spec-level
    * verification of the survival guarantee. */
  def summary(terms: DataFrame, termCol: String, capacity: Int): Map[String, Long] = {
    val mg = udaf(new MisraGries(capacity))
    terms
      .filter(col(termCol).isNotNull && length(col(termCol)) > 0)
      .agg(mg(col(termCol)).as("summary"))
      .head().getMap[String, Long](0).toMap
  }
}
