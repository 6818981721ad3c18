package graft.sources

import graft.sources.video.WebmIO
import graft.sources.video.WebmIO.{WBlock, WTrack}
import org.scalatest.funsuite.AnyFunSuite

/** WebmIO pins. The golden fixtures under fixtures/webm_golden are
  * written INDEPENDENTLY by tools/gen_webm_fixture.py (a from-scratch
  * python EBML encoder), so the reader — VINT ids/sizes, the Segment
  * walk, track resolution, cluster/block tables, both keyframe
  * conventions — is checked against bytes it did not produce. The
  * writer's bytes round-trip through the reader.
  */
class WebmIOSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("fixtures/webm_golden", name))

  private def checkClip(doc: WebmIO.WebmDoc): Unit = {
    assert(doc.docType == "webm")
    assert(doc.timestampScaleNs == 1000000L)
    assert(doc.durationTicks == 400.0)
    assert(doc.nCuePoints == 2)
    assert(doc.tracks.map(_.number) == Seq(1L, 2L))
    val v = doc.tracks.head
    assert(v.trackType == 1 && v.codecId == "V_VP9")
    assert(v.width == 320 && v.height == 180)
    assert(v.blockTimes.toSeq == Seq(0L, 40L, 80L, 120L, 200L, 240L))
    // SimpleBlock flag keys at 0; BlockGroup WITH ReferenceBlock at 120
    // is NON-key; BlockGroup WITHOUT one at 200 IS key
    assert(v.blockKey.toSeq == Seq(true, false, false, false, true, false))
    assert(v.blockSizes.toSeq == (0 until 6).map(i => 50 + 7 * i))
    val a = doc.tracks(1)
    assert(a.trackType == 2 && a.codecId == "A_OPUS")
    assert(a.sampleRate == 48000.0 && a.channels == 2)
    assert(a.blockTimes.toSeq ==
      Seq(0L, 20L, 40L, 60L, 80L, 100L, 200L, 220L))
    assert(a.blockKey.forall(identity))
    assert(a.blockSizes.toSeq == (0 until 8).map(j => 10 + 3 * j))
  }

  test("reads the independent EBML golden: VP9+Opus tracks, cluster-" +
      "relative block times, sizes, BOTH keyframe conventions " +
      "(SimpleBlock flag; BlockGroup without ReferenceBlock), Void and " +
      "CRC-32 children skipped, Cues counted") {
    checkClip(WebmIO.readWebm(fixture("clip.webm")))
  }

  test("a STREAMING mux's unknown-size Segment (all-ones vint) reads " +
      "identically — live muxers emit exactly this") {
    checkClip(WebmIO.readWebm(fixture("streaming.webm")))
  }

  test("laced blocks and non-Matroska DocTypes fail loudly") {
    val e1 = intercept[IllegalArgumentException](
      WebmIO.readWebm(fixture("laced.webm")))
    assert(e1.getMessage.contains("lacing"), e1.getMessage)
    val e2 = intercept[IllegalArgumentException](
      WebmIO.readWebm(fixture("badtype.webm")))
    assert(e2.getMessage.contains("quicktime"), e2.getMessage)
  }

  test("writer round trip: tracks, block tables, keyframes, and " +
      "cluster grouping survive; payload sizes are exact") {
    val tracks = Seq(
      WTrack(1, 1, "V_VP9", width = 64, height = 48),
      WTrack(2, 2, "A_OPUS", sampleRate = 48000.0, channels = 1))
    val blocks = (0 until 10).map { i =>
      if (i % 2 == 0) WBlock(1, i.toLong * 33, i % 4 == 0,
        Array.fill[Byte](20 + i)(i.toByte))
      else WBlock(2, i.toLong * 33, key = true,
        Array.fill[Byte](7 + i)((0x40 + i).toByte))
    }
    val webm = WebmIO.writeWebm(tracks, blocks, durationTicks = 330.0,
      blocksPerCluster = 3)
    val doc = WebmIO.readWebm(webm)
    assert(doc.docType == "webm" && doc.durationTicks == 330.0)
    val v = doc.tracks.head
    assert(v.width == 64 && v.height == 48)
    assert(v.blockTimes.toSeq == Seq(0L, 66L, 132L, 198L, 264L))
    assert(v.blockKey.toSeq == Seq(true, false, true, false, true))
    assert(v.blockSizes.toSeq == Seq(20, 22, 24, 26, 28))
    val a = doc.tracks(1)
    assert(a.sampleRate == 48000.0 && a.channels == 1)
    assert(a.blockTimes.toSeq == Seq(33L, 99L, 165L, 231L, 297L))
    assert(a.blockSizes.toSeq == Seq(8, 10, 12, 14, 16))
  }

  test("malformed EBML fails loudly") {
    def bad(b: Array[Byte], msg: String): Unit = {
      val e = intercept[IllegalArgumentException](WebmIO.readWebm(b))
      assert(e.getMessage.contains(msg), e.getMessage)
    }
    bad("not ebml at all".getBytes("US-ASCII"), "malformed WebM/EBML")
    // a declared element size that overruns the file
    val good = fixture("clip.webm")
    val cut = good.take(good.length - 40)
    bad(cut, "overruns")
    // a block that references an undeclared track: rewrite track 2's
    // TrackNumber to 9 in the Tracks element — blocks then dangle
    val doc = WebmIO.readWebm(good)
    assert(doc.tracks.size == 2)
    // (constructed directly: one declared track, one foreign block)
    val webm = WebmIO.writeWebm(
      Seq(WTrack(1, 1, "V_VP9", width = 8, height = 8)),
      Seq(WBlock(3, 0, key = true, Array[Byte](1, 2, 3))),
      durationTicks = 1.0)
    bad(webm, "no TrackEntry")
  }
}
