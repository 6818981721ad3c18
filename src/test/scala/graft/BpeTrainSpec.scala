package graft

import org.apache.spark.sql.functions._

/** q144 — in-engine BPE tokenizer training. The oracle pins bit-level
  * reproducibility of the 3 merge rounds; this pins the invariants that
  * make the output a valid BPE state:
  *   - losslessness: stripping delimiters from every segmentation
  *     reconstructs the original token exactly;
  *   - progress: the weighted symbol count strictly decreases vs the
  *     character baseline (the merges actually applied);
  *   - well-formedness: no empty symbols.
  */
class BpeTrainSpec extends SparkSpec {

  test("segmentations are lossless, merged, and well-formed") {
    val rows = Queries.byName("q144_bpe_train")
      .build(spark, "/root/testdata/sf0.001")
      .select(col("token"), col("cnt"), col("segmentation"))
      .collect()
    assert(rows.nonEmpty)
    var chars = 0L
    var syms = 0L
    rows.foreach { r =>
      val (tok, n, seg) = (r.getString(0), r.getLong(1), r.getString(2))
      assert(seg.endsWith("|") && !seg.contains("||"),
        s"malformed segmentation for $tok: $seg")
      assert(seg.replace("|", "") == tok,
        s"segmentation of $tok is not lossless: $seg")
      chars += n * tok.length
      syms += n * seg.count(_ == '|')
    }
    assert(syms < chars,
      s"no merge reduced the symbol stream: $syms vs $chars chars")
  }
}
