package graft

import org.apache.spark.sql.{DataFrame, SparkSession}
import org.apache.spark.sql.functions._

/** Band-saturation probe for the banded-hamming dedup family (r15,
  * VERDICT r14 #7): q188/q205/q208/q210 all block candidates through
  * four 16-bit bands, so as the corpus grows on that FIXED band space
  * the random-collision term grows ~n²·B/2^W and the candidate share
  * creeps toward all-pairs. This main MEASURES that curve and the
  * documented lever — widen the bands with n (wider fingerprints, same
  * band count, same pigeonhole radius 3): on the SAME synthetic corpus
  * it counts candidates and hamming-confirmed pairs at the production
  * 4×16 banding and at the widened 4×64 banding (256-bit fingerprints
  * from 256-sample clips / 16×16 hash rasters), and prints ONE JSON
  * line per modality. Injected exact copies (hamming 0 — every band
  * collides at ANY width) pin that widening never loses a true dup.
  *
  * Usage: graft.BandScale <sfDir> [audio|image|both]
  */
object BandScale {

  def main(args: Array[String]): Unit = {
    val sfDir = args(0)
    val mode = args.lift(1).getOrElse("both")
    val cpus = sys.env.getOrElse("SPARK_GRAFT_CPUS", "32")
    val spark = SparkSession.builder()
      .master(s"local[$cpus]")
      .config("spark.sql.shuffle.partitions", cpus)
      .config("spark.sql.session.timeZone", "UTC")
      .config("spark.sql.legacy.parquet.nanosAsLong", "true")
      .config("spark.ui.enabled", "false")
      .getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    val e = Tables.spread(spark,
      corpus(Tables.load(spark, sfDir, "embeddings")
        .select(col("vec_id"), col("embedding"))))
    if (mode == "audio" || mode == "both") {
      val media = audioClips(e)
      val narrow = Multimodal.audioFingerprintWindowed(media).toDF()
        .select(col("id"), col("h0").cast("long").as("b0"),
          col("h1").cast("long").as("b1"), col("h2").cast("long").as("b2"),
          col("h3").cast("long").as("b3"))
      val wide = Multimodal.audioFingerprintWide(media, nBits = 256).toDF()
      report(spark, "audio", narrow, wide, sfDir)
    }
    if (mode == "image" || mode == "both") {
      val media = images16(e)
      val narrow = Multimodal.imagePHashCoded(media).toDF()
        .select(col("id"), col("h0").cast("long").as("b0"),
          col("h1").cast("long").as("b1"), col("h2").cast("long").as("b2"),
          col("h3").cast("long").as("b3"))
      val wide = Multimodal.imageAHashWide(media, side = 16).toDF()
      report(spark, "image", narrow, wide, sfDir)
    }
    spark.stop()
  }

  /** Embeddings + 10 injected exact copies (the q208 liveness shape). */
  private def corpus(e: DataFrame): DataFrame =
    e.unionAll(e.filter(col("vec_id") < 10)
      .select((col("vec_id") + 100000L).as("vec_id"), col("embedding")))

  /** Deterministic 256-sample clips: value k of the embedding expands to
    * 4 samples with a fixed jitter pattern — a pure function of the
    * EMBEDDING, so exact copies produce identical clips at any width.
    */
  private def audioClips(e: DataFrame) = {
    import e.sparkSession.implicits._
    val jit = Array(0, 7, -5, 3)
    e.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, v) =>
        val smp = new Array[Short](v.length * 4)
        var i = 0
        while (i < smp.length) {
          val q = math.floor(v(i / 4).toDouble * 8191.0).toLong + jit(i % 4) * 131L
          smp(i) = math.max(-32768L, math.min(32767L, q)).toShort
          i += 1
        }
        graft.functions.Multimodal.MediaRow(
          id, "audio/wav", Multimodal.encodeWav(smp, 8000))
      })
  }
  private val Multimodal = graft.functions.Multimodal

  /** Deterministic 16×16 grayscale PNGs — the shared q215 generator. */
  private def images16(e: DataFrame) =
    graft.functions.Multimodal.embeddingsAsPng16(e)

  /** Candidate + confirmed counts for one (modality, banding) pair. */
  private def counts(fp: DataFrame): (Long, Long, Double) = {
    val bands = fp.select(col("id"),
      posexplode(array(col("b0"), col("b1"), col("b2"), col("b3"))))
      .select(col("id"), concat_ws("|", col("pos"), col("col")).as("bk"))
    val cand = bands.as("a").join(bands.as("b"),
        col("a.bk") === col("b.bk") && col("a.id") < col("b.id"))
      .select(col("a.id").as("id_a"), col("b.id").as("id_b"))
      .distinct()
    val t0 = System.nanoTime()
    val withH = cand
      .join(fp.select(col("id").as("id_a"), col("b0").as("a0"),
        col("b1").as("a1"), col("b2").as("a2"), col("b3").as("a3")), Seq("id_a"))
      .join(fp.select(col("id").as("id_b"), col("b0").as("c0"),
        col("b1").as("c1"), col("b2").as("c2"), col("b3").as("c3")), Seq("id_b"))
      .select((bit_count(col("a0").bitwiseXOR(col("c0")))
        + bit_count(col("a1").bitwiseXOR(col("c1")))
        + bit_count(col("a2").bitwiseXOR(col("c2")))
        + bit_count(col("a3").bitwiseXOR(col("c3")))).as("h"))
    val agg = withH.agg(count(lit(1)), sum(when(col("h") <= 3, 1L).otherwise(0L)))
      .head()
    val sec = (System.nanoTime() - t0) / 1e9
    (agg.getLong(0), agg.getLong(1), sec)
  }

  private def report(
      spark: SparkSession, modality: String,
      narrow: DataFrame, wide: DataFrame, sfDir: String): Unit = {
    val n = narrow.count()
    val pairSpace = n * (n - 1) / 2
    val (cN, confN, sN) = counts(narrow)
    val (cW, confW, sW) = counts(wide)
    require(confW >= 10 && confN >= 10,
      s"$modality: injected exact copies lost (narrow=$confN wide=$confW)")
    println(
      s"""{"metric":"band_scale_$modality","sf":"$sfDir","n":$n,""" +
        s""""pair_space":$pairSpace,""" +
        s""""narrow":{"bands":"4x16","cand":$cN,"confirmed":$confN,""" +
        s""""share":${f"${cN.toDouble / math.max(1, pairSpace)}%.6f"},"sec":${f"$sN%.2f"}},""" +
        s""""wide":{"bands":"4x64","cand":$cW,"confirmed":$confW,""" +
        s""""share":${f"${cW.toDouble / math.max(1, pairSpace)}%.6f"},"sec":${f"$sW%.2f"}}}""")
  }
}
