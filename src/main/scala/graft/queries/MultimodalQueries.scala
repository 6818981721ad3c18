package graft.queries

import graft.{QueryDef, Tables}
import graft.functions.Multimodal
import org.apache.spark.sql.functions._

/** Multimodal-column checks, all oracle-checked. q90/q91 exercise the
  * REAL image path end-to-end (embedding → TIFF bytes on executors →
  * decode [→ resize → re-encode → decode] → intensity features); the TIFF
  * round trip is the identity on pixels, so DuckDB recomputes the features
  * directly from the quantized embedding. q98 is the analogous REAL audio
  * path (embedding → RIFF/WAVE PCM16 bytes → container parse → RMS/peak).
  * q92 exercises the stubbed raw-PCM/video plumbing, whose byte-level
  * semantics DuckDB also reproduces exactly.
  */
object MultimodalQueries {

  val defs: Seq[QueryDef] = Seq(

    // ------------------------------------------------------------------
    QueryDef.sql(
      "q90_multimodal_image_features",
      """WITH px AS (SELECT vec_id,
        |    list_transform(embedding, x ->
        |      greatest(0, least(255,
        |        CAST(floor((CAST(x AS DOUBLE) + 1.0) * 127.5) AS INTEGER)))) AS p
        |  FROM embeddings)
        |SELECT vec_id AS id,
        |  CAST(8 AS INTEGER) AS width, CAST(8 AS INTEGER) AS height,
        |  round(CAST(list_reduce(p, (a, b) -> a + b) AS DOUBLE) / len(p), 4)
        |    AS mean_intensity,
        |  CAST(list_aggregate(p, 'min') AS INTEGER) AS min_intensity,
        |  CAST(list_aggregate(p, 'max') AS INTEGER) AS max_intensity
        |FROM px ORDER BY id ASC LIMIT 100""".stripMargin) { (s, dir) =>
      // spread: the per-row TIFF encode/decode work must not inherit the
      // local single-split scan (one task); at scale the scan is split-rich
      val media = Multimodal.embeddingsAsImages(
        Tables.spread(s, Tables.load(s, dir, "embeddings")))
      Multimodal.imageFeatures(media).toDF()
        .select(col("id"), col("width"), col("height"),
          round(col("mean_intensity"), 4).as("mean_intensity"),
          col("min_intensity"), col("max_intensity"))
        .orderBy(col("id").asc)
        .limit(100)
    },

    // ------------------------------------------------------------------
    // Image resize: 8x8 -> 4x4 nearest neighbour, then re-extract features.
    // The engine runs the REAL pipeline (encode → decode → NN resize →
    // re-encode → decode → features); the oracle recomputes the same pixels
    // directly from the quantized embedding: resized(x, y) = p[2x + 16y].
    QueryDef.sql(
      "q91_multimodal_resize",
      """WITH px AS (SELECT vec_id,
        |    list_transform(embedding, x ->
        |      greatest(0, least(255,
        |        CAST(floor((CAST(x AS DOUBLE) + 1.0) * 127.5) AS INTEGER)))) AS p
        |  FROM embeddings),
        |r AS (SELECT vec_id,
        |    list_transform(generate_series(0, 15),
        |      k -> p[2 * (k % 4) + 16 * (k // 4) + 1]) AS rp
        |  FROM px)
        |SELECT vec_id AS id,
        |  CAST(4 AS INTEGER) AS width, CAST(4 AS INTEGER) AS height,
        |  round(CAST(list_reduce(rp, (a, b) -> a + b) AS DOUBLE) / len(rp), 4)
        |    AS mean_intensity
        |FROM r ORDER BY id ASC LIMIT 100""".stripMargin) { (s, dir) =>
      val media = Multimodal.embeddingsAsImages(
        Tables.spread(s, Tables.load(s, dir, "embeddings")))
      val resized = Multimodal.resizeImages(media, 4, 4)
      Multimodal.imageFeatures(resized).toDF()
        .select(col("id"), col("width"), col("height"),
          round(col("mean_intensity"), 4).as("mean_intensity"))
        .orderBy(col("id").asc)
        .limit(100)
    },

    // ------------------------------------------------------------------
    // Audio (stub decode) + video frame sampling (stub decode) over
    // document payloads treated as opaque media bytes. The stub interprets
    // UTF-8 bytes as signed 8-bit PCM — the oracle rebuilds the byte view
    // from hex(encode(text)), so even the stub path is hash-checked: RMS
    // over signed bytes and ceil((len/64)/2) sampled frames.
    QueryDef.sql(
      "q92_multimodal_audio_frames",
      """WITH b AS (SELECT doc_id, hex(encode(text)) AS hx,
        |    octet_length(encode(text)) AS n
        |  FROM documents),
        |s AS (SELECT doc_id, n,
        |    list_transform(generate_series(1, n),
        |      i -> CASE WHEN ('0x' || substr(hx, 2*i - 1, 2))::INTEGER > 127
        |        THEN ('0x' || substr(hx, 2*i - 1, 2))::INTEGER - 256
        |        ELSE ('0x' || substr(hx, 2*i - 1, 2))::INTEGER END) AS sb
        |  FROM b)
        |SELECT doc_id AS id, CAST(n AS INTEGER) AS n_samples,
        |  round(CASE WHEN n = 0 THEN 0.0 ELSE
        |    sqrt(list_reduce(list_transform(sb, v -> CAST(v AS DOUBLE) * v),
        |      (a, c) -> a + c) / n) END, 4) AS rms,
        |  CAST((n // 64 + 1) // 2 AS BIGINT) AS n_frames
        |FROM s ORDER BY id ASC LIMIT 200""".stripMargin) { (s, dir) =>
      import s.implicits._
      val media = Tables.spread(s, Tables.load(s, dir, "documents"))
        .select(col("doc_id"), encode(col("text"), "UTF-8").as("bytes"))
        .as[(Long, Array[Byte])]
        .map { case (id, b) => Multimodal.MediaRow(id, "audio/pcm-stub", b) }
      val audio = Multimodal.audioFeatures(media).toDF()
        .select(col("id"), col("n_samples"), round(col("rms"), 4).as("rms"))
      val frames = Multimodal.sampleFrames(media, frameBytes = 64, every = 2)
        .groupBy(col("id")).agg(count(lit(1)).as("n_frames"))
      audio.join(frames, Seq("id"), "left")
        .na.fill(0L, Seq("n_frames"))
        .orderBy(col("id").asc)
        .limit(200)
    },

    // ------------------------------------------------------------------
    // REAL audio path: embedding → actual RIFF/WAVE PCM16 bytes on
    // executors → container parse (header validation, chunk walk) →
    // RMS/peak features. The WAV round trip is the identity on the
    // quantized samples, so DuckDB recomputes the features directly from
    // sample = clamp(floor(v·32767), ±int16). Narrow end to end: the only
    // exchange is the final orderBy's TakeOrdered.
    QueryDef.sql(
      "q98_multimodal_wav_features",
      """WITH s AS (SELECT vec_id,
        |    list_transform(embedding, v ->
        |      greatest(-32768, least(32767,
        |        CAST(floor(CAST(v AS DOUBLE) * 32767.0) AS BIGINT)))) AS smp
        |  FROM embeddings)
        |SELECT vec_id AS id, CAST(16000 AS INTEGER) AS sample_rate,
        |  CAST(len(smp) AS INTEGER) AS n_samples,
        |  round(sqrt(list_reduce(list_transform(smp, v -> CAST(v AS DOUBLE) * v),
        |    (a, b) -> a + b) / len(smp)), 4) AS rms,
        |  CAST(list_reduce(list_transform(smp, v -> abs(v)),
        |    (a, b) -> greatest(a, b)) AS INTEGER) AS peak
        |FROM s ORDER BY id ASC LIMIT 200""".stripMargin) { (s, dir) =>
      val media = Multimodal.embeddingsAsWav(
        Tables.spread(s, Tables.load(s, dir, "embeddings")))
      Multimodal.wavFeatures(media).toDF()
        .select(col("id"), col("sample_rate"), col("n_samples"),
          round(col("rms"), 4).as("rms"), col("peak"))
        .orderBy(col("id").asc)
        .limit(200)
    },

    // ------------------------------------------------------------------
    // REAL video path: embedding → four 4×4 Cmono frames in an actual
    // YUV4MPEG2 container on executors → stream-header parse + FRAME
    // split → every-2nd-frame mean luma. The y4m round trip is the
    // identity on the quantized pixels, so DuckDB recomputes each sampled
    // frame's mean from the same 16-value slice of the q90 quantization.
    QueryDef.sql(
      "q102_multimodal_video_frames",
      """WITH px AS (SELECT vec_id,
        |    list_transform(embedding, x ->
        |      greatest(0, least(255,
        |        CAST(floor((CAST(x AS DOUBLE) + 1.0) * 127.5) AS INTEGER)))) AS p
        |  FROM embeddings),
        |f AS (SELECT vec_id, unnest([0, 2]) AS frame_idx FROM px)
        |SELECT px.vec_id AS id, f.frame_idx,
        |  CAST(4 AS INTEGER) AS width, CAST(4 AS INTEGER) AS height,
        |  round(CAST(list_reduce(list_transform(generate_series(1, 16),
        |      i -> p[16 * frame_idx + i]), (a, b) -> a + b) AS DOUBLE) / 16,
        |    4) AS mean_luma
        |FROM px JOIN f ON px.vec_id = f.vec_id
        |ORDER BY id ASC, frame_idx ASC LIMIT 400""".stripMargin) { (s, dir) =>
      val media = Multimodal.embeddingsAsVideo(
        Tables.spread(s, Tables.load(s, dir, "embeddings")))
      Multimodal.videoFrameFeatures(media, every = 2).toDF()
        .select(col("id"), col("frame_idx"), col("width"), col("height"),
          round(col("mean_luma"), 4).as("mean_luma"))
        .orderBy(col("id").asc, col("frame_idx").asc)
        .limit(400)
    }
  )
}
