package graft.functions

import graft.SparkSpec
import graft.sources.tiff.TiffIO

/** Multimodal plumbing tests: real TIFF encode/decode through the typed
  * Dataset transforms, nearest-neighbour resize geometry, and the
  * deterministic stub decoders.
  */
class MultimodalSpec extends SparkSpec {

  private def media(rows: (Long, Array[Int], Int, Int)*) = {
    import spark.implicits._
    spark.createDataset(rows.map { case (id, px, w, h) =>
      Multimodal.MediaRow(id, "image/tiff", TiffIO.encode(w, h, px, 8))
    })
  }

  test("imageFeatures decodes real TIFF bytes and computes intensities") {
    val px = Array.tabulate(8 * 8)(i => i * 4) // 0..252
    val f = Multimodal.imageFeatures(media((7L, px, 8, 8))).collect()
    assert(f.length == 1)
    assert(f(0) == Multimodal.ImageFeatures(7L, 8, 8, px.sum / 64.0, 0, 252))
  }

  test("resize nearest-neighbour picks the exact source pixels") {
    val px = Array.tabulate(8 * 8)(i => i) // value == index
    val resized = Multimodal.resizeImages(media((1L, px, 8, 8)), 4, 4).collect()
    val out = TiffIO.decode(resized(0).bytes)
    assert(out.width == 4 && out.height == 4)
    // target (x,y) -> source (2x, 2y) -> value 2x + 16y
    val expected = for (y <- 0 until 4; x <- 0 until 4) yield 2 * x + 16 * y
    assert(out.pixels.toSeq == expected)
  }

  test("audio stub rms is deterministic on byte payloads") {
    import spark.implicits._
    val m = spark.createDataset(Seq(
      Multimodal.MediaRow(1L, "audio/pcm-stub", Array[Byte](3, -4))))
    val f = Multimodal.audioFeatures(m).collect()(0)
    assert(f.n_samples == 2)
    assert(math.abs(f.rms - math.sqrt((9.0 + 16.0) / 2)) < 1e-12)
  }

  test("frame sampling windows and strides correctly") {
    import spark.implicits._
    val bytes = Array.tabulate[Byte](300)(_.toByte)
    val m = spark.createDataset(Seq(
      Multimodal.MediaRow(5L, "video/stub", bytes)))
    val frames = Multimodal.sampleFrames(m, frameBytes = 100, every = 2).collect()
    assert(frames.map(_.frame_idx).toSeq == Seq(0, 2))
    assert(frames.forall(_.id == 5L))
  }

  test("WAV PCM16 encode/decode round-trips samples and sample rate") {
    val smp = Array[Short](0, 1, -1, 32767, -32768, 12345)
    val (rate, back) = Multimodal.decodeWav(Multimodal.encodeWav(smp, 44100))
    assert(rate == 44100)
    assert(back.toSeq == smp.toSeq)
  }

  test("decodeWav skips unknown RIFF chunks (odd sizes padded)") {
    val wav = Multimodal.encodeWav(Array[Short](7, -7), 8000)
    // splice a 3-byte LIST chunk (odd size -> 1 pad byte) before fmt
    val extra = "LIST".getBytes("US-ASCII") ++
      Array[Byte](3, 0, 0, 0, 1, 2, 3, 0)
    val spliced = wav.take(12) ++ extra ++ wav.drop(12)
    // RIFF size field is ignored by the parser; only magic must hold
    val (rate, back) = Multimodal.decodeWav(spliced)
    assert(rate == 8000 && back.toSeq == Seq[Short](7, -7))
  }

  test("decodeWav fails loudly on malformed or unsupported headers") {
    val good = Multimodal.encodeWav(Array[Short](1, 2, 3), 16000)
    def boom(bytes: Array[Byte], msg: String): Unit = {
      val e = intercept[IllegalArgumentException](Multimodal.decodeWav(bytes))
      assert(e.getMessage.contains(msg), e.getMessage)
    }
    boom(Array[Byte](1, 2, 3), "only 3 bytes")
    boom("JUNK".getBytes ++ good.drop(4), "missing RIFF magic")
    boom(good.take(8) ++ "AVI ".getBytes ++ good.drop(12), "missing WAVE")
    boom(good.take(44), "declares") // data chunk truncated
    val stereo = good.clone(); stereo(22) = 2 // channel count field
    boom(stereo, "channel count 2")
    val alaw = good.clone(); alaw(20) = 6 // audio format field
    boom(alaw, "unsupported audio format 6")
    val wide = good.clone(); wide(34) = 24 // bits per sample field
    boom(wide, "bit depth 24")
  }

  test("embeddingsAsWav quantization matches the oracle formula") {
    import spark.implicits._
    val df = Seq((3L, Array(-1.0f, 0.0f, 1.0f, 0.5f))).toDF("vec_id", "embedding")
    val m = Multimodal.embeddingsAsWav(df).collect()(0)
    assert(m.media_type == "audio/wav")
    val (rate, smp) = Multimodal.decodeWav(m.bytes)
    assert(rate == 16000)
    assert(smp.toSeq == Seq[Short](-32767, 0, 32767, 16383))
    val f = Multimodal.wavFeatures(
      spark.createDataset(Seq(m))).collect()(0)
    assert(f.n_samples == 4 && f.peak == 32767)
  }

  test("embeddingsAsImages quantization matches the oracle formula") {
    import spark.implicits._
    val df = Seq((1L, Array(-1.0f, 0.0f, 1.0f, 0.5f))).toDF("vec_id", "embedding")
    val m = Multimodal.embeddingsAsImages(df).collect()(0)
    val px = TiffIO.decode(m.bytes)
    assert(px.width == 2 && px.height == 2)
    assert(px.pixels.toSeq == Seq(0, 127, 255, 191))
  }
}
