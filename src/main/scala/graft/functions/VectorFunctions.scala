package graft.functions

import org.apache.spark.sql.Column
import org.apache.spark.sql.functions._

/** Embedding-vector operators built from codegen-friendly higher-order array
  * functions (`transform`/`zip_with`/`aggregate`) — no UDFs, no collect.
  *
  * All math is done in DOUBLE with a left-to-right sequential fold so results
  * are bit-identical to the DuckDB oracle (`list_cosine_similarity` uses the
  * same dot/(|a||b|) formula). At 100 TB these are narrow per-row expressions:
  * zero shuffles, scale-out is linear.
  */
object VectorFunctions {

  /** ARRAY<FLOAT> → ARRAY<DOUBLE> (all math in double). */
  def toDoubles(v: Column): Column = transform(v, _.cast("double"))

  /** Sequential-fold dot product. */
  def dot(a: Column, b: Column): Column =
    aggregate(zip_with(a, b, (x, y) => x * y), lit(0.0), (acc, x) => acc + x)

  /** Sum of squares. */
  def sumsq(a: Column): Column =
    aggregate(a, lit(0.0), (acc, x) => acc + x * x)

  /** L2 norm. */
  def l2norm(a: Column): Column = sqrt(sumsq(a))

  /** Cosine similarity of two double arrays. */
  def cosine(a: Column, b: Column): Column =
    dot(a, b) / (l2norm(a) * l2norm(b))
}
