package graft.functions

import graft.sources.tiff.TiffIO
import org.apache.spark.sql.{DataFrame, Dataset}
import org.apache.spark.sql.functions._

/** Multimodal (image/audio/video) columns for training-data pipelines:
  * media as opaque BINARY columns + typed metadata, with decode /
  * feature-extraction / resize / frame-sampling as executor-side
  * mapPartitions transforms over typed Datasets.
  *
  * The IMAGE path is fully real (JDK ImageIO TIFF codec — encode, decode,
  * features, resize all execute and are oracle/test-verified). The AUDIO
  * path is real for WAV: a RIFF/WAVE PCM16 container codec below
  * (encodeWav/decodeWav) parses actual wire-format bytes, header
  * validation included. `audioFeatures` (raw-PCM byte interpretation,
  * q92) and the video frame sampler remain DETERMINISTIC STUBS (no
  * general audio/video codec libraries in this container): their
  * Spark-side plumbing — schema, batch shape, partitioning, feature
  * signature — is real and tested; swapping the stub body for a real
  * codec changes nothing else.
  *
  * Scale notes: all transforms are narrow (no shuffle); media bytes never
  * move except scan → task. Partition sizing is governed by
  * spark.sql.files.maxPartitionBytes on the binaryFile scan, so a 100 TB
  * media corpus streams through executors at bounded memory.
  */
object Multimodal {

  final case class MediaRow(id: Long, media_type: String, bytes: Array[Byte])
  final case class ImageFeatures(
      id: Long, width: Int, height: Int,
      mean_intensity: Double, min_intensity: Int, max_intensity: Int)
  final case class AudioFeatures(id: Long, n_samples: Int, rms: Double)
  final case class FrameSample(id: Long, frame_idx: Int, frame_hash: Long)

  /** Decode grayscale images and extract intensity features. REAL decode. */
  def imageFeatures(media: Dataset[MediaRow]): Dataset[ImageFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val s = TiffIO.decode(m.bytes)
      var sum = 0L; var mn = Int.MaxValue; var mx = Int.MinValue
      var i = 0
      while (i < s.pixels.length) {
        val v = s.pixels(i); sum += v
        if (v < mn) mn = v
        if (v > mx) mx = v
        i += 1
      }
      ImageFeatures(m.id, s.width, s.height,
        sum.toDouble / s.pixels.length, mn, mx)
    })
  }

  /** Nearest-neighbour resize to (tw, th). REAL pixels in, real pixels out. */
  def resizeImages(media: Dataset[MediaRow], tw: Int, th: Int): Dataset[MediaRow] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val s = TiffIO.decode(m.bytes)
      val out = new Array[Int](tw * th)
      var y = 0
      while (y < th) {
        val sy = y * s.height / th
        var x = 0
        while (x < tw) {
          out(x + y * tw) = s.pixels(x * s.width / tw + sy * s.width)
          x += 1
        }
        y += 1
      }
      // re-encode at the SOURCE bit depth — an 8-bit re-encode of 16-bit
      // input would silently wrap pixels mod 256
      MediaRow(m.id, m.media_type, TiffIO.encode(tw, th, out, s.bits))
    })
  }

  /** Audio feature extraction. STUB DECODE: interprets the payload as
    * signed 8-bit PCM (deterministic fake — no audio codecs in this
    * environment). Real implementation swaps only the body.
    */
  def audioFeatures(media: Dataset[MediaRow]): Dataset[AudioFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val samples = m.bytes // STUB: pretend bytes are PCM samples
      var acc = 0.0
      var i = 0
      while (i < samples.length) {
        val v = samples(i).toDouble; acc += v * v; i += 1
      }
      AudioFeatures(m.id, samples.length,
        if (samples.isEmpty) 0.0 else math.sqrt(acc / samples.length))
    })
  }

  /** Sample every k-th "frame" of a video payload. STUB DECODE: frames are
    * fixed-size byte windows, fingerprinted with a rolling hash.
    */
  def sampleFrames(
      media: Dataset[MediaRow], frameBytes: Int, every: Int): Dataset[FrameSample] = {
    require(frameBytes > 0, s"frameBytes must be positive, got $frameBytes")
    require(every > 0, s"every must be positive, got $every")
    import media.sparkSession.implicits._
    media.flatMap { m =>
      val nFrames = m.bytes.length / frameBytes
      (0 until nFrames by every).map { f =>
        var h = 1125899906842597L // STUB frame fingerprint (FNV-ish)
        var i = f * frameBytes
        val end = i + frameBytes
        while (i < end) { h = 31 * h + m.bytes(i); i += 1 }
        FrameSample(m.id, f, h)
      }
    }
  }

  /** Render embeddings as real 8x8 grayscale TIFFs — a deterministic media
    * corpus generator for tests/queries: pixel = floor((v+1)*127.5)
    * clamped to [0,255].
    */
  def embeddingsAsImages(embeddings: DataFrame): Dataset[MediaRow] = {
    import embeddings.sparkSession.implicits._
    embeddings.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, v) =>
        val px = v.map(x =>
          math.max(0, math.min(255, math.floor((x + 1.0) * 127.5).toInt)))
        val side = math.sqrt(px.length).toInt
        require(side * side == px.length,
          s"embedding dim ${px.length} is not a perfect square (vec_id=$id)")
        MediaRow(id, "image/tiff", TiffIO.encode(side, side, px, 8))
      })
  }

  // ------------------------------------------------------------------
  // WAV (RIFF/WAVE, PCM16 little-endian mono) — REAL container codec.

  final case class WavFeatures(
      id: Long, sample_rate: Int, n_samples: Int, rms: Double, peak: Int)

  /** Encode PCM16 mono samples as a canonical 44-byte-header WAV file. */
  def encodeWav(samples: Array[Short], sampleRate: Int): Array[Byte] = {
    require(sampleRate > 0, s"sampleRate must be positive, got $sampleRate")
    val dataLen = samples.length * 2
    val buf = java.nio.ByteBuffer.allocate(44 + dataLen)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    buf.put("RIFF".getBytes("US-ASCII")).putInt(36 + dataLen)
    buf.put("WAVE".getBytes("US-ASCII"))
    buf.put("fmt ".getBytes("US-ASCII")).putInt(16)
    buf.putShort(1)               // PCM
    buf.putShort(1)               // mono
    buf.putInt(sampleRate)
    buf.putInt(sampleRate * 2)    // byte rate
    buf.putShort(2)               // block align
    buf.putShort(16)              // bits per sample
    buf.put("data".getBytes("US-ASCII")).putInt(dataLen)
    samples.foreach(buf.putShort)
    buf.array()
  }

  /** Decode a WAV file: walk RIFF chunks (skipping unknown ones, odd
    * sizes padded per spec), require PCM format 1 / 16-bit / mono, return
    * (sampleRate, samples). Fails loudly on malformed or unsupported
    * input rather than guessing.
    */
  def decodeWav(bytes: Array[Byte]): (Int, Array[Short]) = {
    def fail(msg: String) =
      throw new IllegalArgumentException(s"malformed WAV: $msg")
    if (bytes.length < 12) fail(s"only ${bytes.length} bytes")
    val buf = java.nio.ByteBuffer.wrap(bytes)
      .order(java.nio.ByteOrder.LITTLE_ENDIAN)
    def fourcc(): String = {
      val b = new Array[Byte](4); buf.get(b); new String(b, "US-ASCII")
    }
    if (fourcc() != "RIFF") fail("missing RIFF magic")
    buf.getInt() // declared riff size; trust actual length instead
    if (fourcc() != "WAVE") fail("missing WAVE form type")
    var sampleRate = -1
    var data: Array[Short] = null
    while (buf.remaining() >= 8 && data == null) {
      val id = fourcc()
      val size = buf.getInt()
      if (size < 0 || size > buf.remaining())
        fail(s"chunk '$id' declares $size bytes, ${buf.remaining()} remain")
      id match {
        case "fmt " =>
          if (size < 16) fail(s"fmt chunk too short ($size bytes)")
          val fmt = buf.getShort()
          val channels = buf.getShort()
          sampleRate = buf.getInt()
          buf.getInt(); buf.getShort() // byte rate, block align
          val bits = buf.getShort()
          if (fmt != 1) fail(s"unsupported audio format $fmt (want PCM=1)")
          if (channels != 1) fail(s"unsupported channel count $channels")
          if (bits != 16) fail(s"unsupported bit depth $bits")
          buf.position(buf.position() + size - 16)
        case "data" =>
          if (sampleRate < 0) fail("data chunk before fmt chunk")
          data = new Array[Short](size / 2)
          var i = 0
          while (i < data.length) { data(i) = buf.getShort(); i += 1 }
        case _ =>
          buf.position(buf.position() + size + (size & 1)) // pad byte
      }
    }
    if (data == null) fail("no data chunk")
    (sampleRate, data)
  }

  /** Render embeddings as real WAV files — the audio analogue of
    * embeddingsAsImages: sample = clamp(floor(v·32767), ±int16).
    */
  def embeddingsAsWav(
      embeddings: DataFrame, sampleRate: Int = 16000): Dataset[MediaRow] = {
    import embeddings.sparkSession.implicits._
    embeddings.select(col("vec_id"), col("embedding"))
      .as[(Long, Array[Float])]
      .mapPartitions(_.map { case (id, v) =>
        val smp = v.map { x =>
          val q = math.floor(x.toDouble * 32767.0).toLong
          math.max(-32768L, math.min(32767L, q)).toShort
        }
        MediaRow(id, "audio/wav", encodeWav(smp, sampleRate))
      })
  }

  /** REAL audio decode: parse the WAV container, then RMS + peak over the
    * PCM16 samples. Narrow (no shuffle); bytes never leave the task.
    */
  def wavFeatures(media: Dataset[MediaRow]): Dataset[WavFeatures] = {
    import media.sparkSession.implicits._
    media.mapPartitions(_.map { m =>
      val (rate, smp) = decodeWav(m.bytes)
      var acc = 0.0; var peak = 0
      var i = 0
      while (i < smp.length) {
        val v = smp(i).toInt
        acc += v.toDouble * v
        if (math.abs(v) > peak) peak = math.abs(v)
        i += 1
      }
      WavFeatures(m.id, rate, smp.length,
        if (smp.isEmpty) 0.0 else math.sqrt(acc / smp.length), peak)
    })
  }
}
