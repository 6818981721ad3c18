package graft.sources

import org.scalatest.funsuite.AnyFunSuite
import graft.sources.video.Mp4IO
import Mp4IO._

/** Mp4IO pins. The golden fixtures under fixtures/mp4_golden are written
  * INDEPENDENTLY by tools/gen_mp4_fixture.py (raw struct.pack, not this
  * codec), so the reader's sample-table resolution — stsd geometry,
  * stts times, stsc chunk runs, stsz sizes, stco/co64 offsets — is
  * checked against bytes it did not produce. The writer's bytes
  * round-trip through the reader.
  */
class Mp4IOSpec extends AnyFunSuite {

  private def fixture(name: String): Array[Byte] =
    java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get("fixtures/mp4_golden", name))

  private def sha256(b: Array[Byte]): String =
    java.security.MessageDigest.getInstance("SHA-256").digest(b)
      .map("%02x".format(_)).mkString

  /** Pull this file's expected per-sample rows out of manifest.json
    * (offset, size, time, sha256 in array order).
    */
  private def manifestSamples(file: String, trackIdx: Int): Seq[(Long, Int, Long, String)] = {
    val txt = new String(fixture("manifest.json"), "UTF-8")
    val fileBlock = txt.substring(txt.indexOf("\"" + file + "\""))
    val tracks = "\"samples\": \\[".r.findAllMatchIn(fileBlock).toSeq
    val start = tracks(trackIdx).end
    val end = fileBlock.indexOf(']', start)
    val re = ("""\{\s*"offset": (\d+),\s*"size": (\d+),\s*"time": (\d+),""" +
      """\s*"sha256": "([0-9a-f]+)"""").r
    re.findAllMatchIn(fileBlock.substring(start, end))
      .map(m => (m.group(1).toLong, m.group(2).toInt, m.group(3).toLong,
        m.group(4))).toSeq
  }

  test("resolves the independent fixture's video track: geometry, " +
      "timescale, the full sample table through TWO stsc runs, and the " +
      "stss sync table") {
    val bytes = fixture("clip.mp4")
    val tracks = readMp4(bytes)
    assert(tracks.map(_.handler) == Seq("vide", "soun"),
      "both tracks surface, video first")
    val v = tracks.head
    assert(v.trackId == 1 && v.codec == "jpeg")
    assert(v.width == 64 && v.height == 48)
    assert(v.timescale == 30000)
    val want = manifestSamples("clip.mp4", 0)
    assert(v.sampleOffsets.length == 5)
    val got = samples(bytes, v).zipWithIndex.map { case ((t, b), i) =>
      (v.sampleOffsets(i), b.length, t, sha256(b))
    }.toSeq
    assert(got == want, s"sample table diverged:\n$got\nvs\n$want")
    assert(v.sampleSync.toSeq == Seq(true, false, false, true, false),
      "stss sync table (samples 1 and 4)")
    // absent stss = all sync (the co64 clip has no stss)
    assert(readMp4(fixture("clip_co64.mp4")).head.sampleSync.forall(identity))
  }

  test("FRAGMENTED golden (r18): empty-table moov + trex, explicit " +
      "base_data_offset vs default-base-is-moof, per-sample trun rows " +
      "vs tfhd/trex defaults, first-sample-flags, and a v1 tfdt that " +
      "jumps decode time") {
    val bytes = fixture("clip_frag.mp4")
    val tracks = readMp4(bytes)
    assert(tracks.size == 1)
    val v = tracks.head
    assert(v.trackId == 1 && v.handler == "vide" && v.codec == "jpeg")
    assert(v.width == 32 && v.height == 32 && v.timescale == 12800)
    val want = manifestSamples("clip_frag.mp4", 0)
    val got = samples(bytes, v).zipWithIndex.map { case ((t, b), i) =>
      (v.sampleOffsets(i), b.length, t, sha256(b))
    }.toSeq
    assert(got == want, s"fragment sample table diverged:\n$got\nvs\n$want")
    assert(v.sampleSync.toSeq == Seq(true, false, false, true, false),
      "trun flags + first-sample-flags override + trex default")
  }

  test("fragmented writer round trip: bytes, times, and the " +
      "first-of-each-fragment keyframe pattern survive") {
    val frames = (0 until 5).map { i =>
      val b = new Array[Byte](80 + 13 * i)
      new java.util.Random(100L + i).nextBytes(b)
      b
    }
    val mp4 = writeMp4MjpegFragmented(frames, width = 32, height = 32,
      timescale = 12800, sampleDelta = 512, framesPerFragment = 2)
    val tracks = readMp4(mp4)
    assert(tracks.size == 1)
    val v = tracks.head
    assert(v.handler == "vide" && v.codec == "jpeg")
    assert(v.width == 32 && v.height == 32 && v.timescale == 12800)
    val got = samples(mp4, v).toSeq
    assert(got.map(_._1) == Seq(0L, 512L, 1024L, 1536L, 2048L))
    for ((g, w) <- got.map(_._2).zip(frames))
      assert(g.sameElements(w), "frame bytes diverged")
    assert(v.sampleSync.toSeq == Seq(true, false, true, false, true))
    // identical content to the monolithic framing, modulo keyframes
    val mono = readMp4(writeMp4Mjpeg(frames, 32, 32, 12800, 512)).head
    assert(samples(mp4, v).map(_._2.toSeq).toSeq ==
      samples(writeMp4Mjpeg(frames, 32, 32, 12800, 512), mono).map(_._2.toSeq).toSeq)
    assert(mono.sampleSync.forall(identity), "no stss = all sync")
  }

  test("stss via the writer's syncEvery surfaces (every 3rd a keyframe)") {
    val frames = (0 until 7).map(i => Array.fill[Byte](64)(i.toByte))
    val mp4 = writeMp4Mjpeg(frames, 8, 8, 1000, 40, syncEvery = 3)
    val v = readMp4(mp4).head
    assert(v.sampleSync.toSeq ==
      Seq(true, false, false, true, false, false, true))
  }

  test("the non-video track's table resolves too (callers skip by handler)") {
    val bytes = fixture("clip.mp4")
    val a = readMp4(bytes)(1)
    assert(a.trackId == 2 && a.handler == "soun" && a.codec == "twos")
    assert(a.timescale == 8000)
    val want = manifestSamples("clip.mp4", 1)
    val got = samples(bytes, a).zipWithIndex.map { case ((t, b), i) =>
      (a.sampleOffsets(i), b.length, t, sha256(b))
    }.toSeq
    assert(got == want)
  }

  test("uniform stsz + 64-bit co64 offsets resolve") {
    val bytes = fixture("clip_co64.mp4")
    val tracks = readMp4(bytes)
    assert(tracks.size == 1)
    val v = tracks.head
    assert(v.codec == "jpeg" && v.width == 32 && v.height == 32)
    assert(v.timescale == 12800)
    val want = manifestSamples("clip_co64.mp4", 0)
    val got = samples(bytes, v).zipWithIndex.map { case ((t, b), i) =>
      (v.sampleOffsets(i), b.length, t, sha256(b))
    }.toSeq
    assert(got == want)
  }

  test("writer round trip: sample bytes, times, and geometry survive") {
    val frames = (0 until 4).map { i =>
      val b = new Array[Byte](100 + 37 * i)
      new java.util.Random(i.toLong).nextBytes(b)
      b
    }
    val mp4 = writeMp4Mjpeg(frames, width = 32, height = 32,
      timescale = 12800, sampleDelta = 512)
    val tracks = readMp4(mp4)
    assert(tracks.size == 1)
    val v = tracks.head
    assert(v.handler == "vide" && v.codec == "jpeg")
    assert(v.width == 32 && v.height == 32 && v.timescale == 12800)
    val got = samples(mp4, v).toSeq
    assert(got.map(_._1) == Seq(0L, 512L, 1024L, 1536L))
    for ((g, w) <- got.map(_._2).zip(frames))
      assert(g.sameElements(w), "frame bytes diverged")
  }

  test("malformed containers fail loudly") {
    def bad(b: Array[Byte], msg: String): Unit = {
      val e = intercept[IllegalArgumentException](
        readMp4(b).foreach(t => samples(b, t).foreach(identity)))
      assert(e.getMessage.contains(msg), e.getMessage)
    }
    val good = writeMp4Mjpeg(Seq(Array.fill[Byte](64)(1)), 8, 8, 1000, 40)
    bad(good.take(7), "truncated box header")
    // replace the ftyp fourcc with 'free': a well-framed file that
    // still must be rejected for the missing ftyp
    val noFtyp = good.clone()
    System.arraycopy("free".getBytes("US-ASCII"), 0, noFtyp, 4, 4)
    bad(noFtyp, "first box must be 'ftyp'")
    // shrink moov's declared size so a child crosses its end
    val cut = good.clone()
    val moovAt = {
      var p = 0; var found = -1
      while (found < 0 && p + 8 <= cut.length) {
        if (new String(cut, p + 4, 4, "US-ASCII") == "moov") found = p
        else {
          val sz = ((cut(p) & 0xff) << 24) | ((cut(p + 1) & 0xff) << 16) |
            ((cut(p + 2) & 0xff) << 8) | (cut(p + 3) & 0xff)
          p += sz
        }
      }
      found
    }
    assert(moovAt > 0)
    cut(moovAt + 2) = 0; cut(moovAt + 3) = 20 // tiny moov size
    bad(cut, "malformed MP4") // framing error — exact message depends on
    // which box the truncation mangles first
  }

  test("a trun whose declared size cannot hold its per-sample fields " +
      "fails loudly instead of reading the next box's bytes (r19)") {
    val frames = (0 until 4).map(i => Array.fill[Byte](32)(i.toByte))
    val mp4 = writeMp4MjpegFragmented(frames, width = 8, height = 8,
      timescale = 1000, sampleDelta = 40, framesPerFragment = 2)
    // find the first trun; its per-sample reads must be bounded by the
    // box's own declared end, not the buffer
    var at = -1
    var p = 0
    while (at < 0 && p + 8 <= mp4.length) {
      if (new String(mp4, p + 4, 4, "US-ASCII") == "trun") at = p else p += 1
    }
    assert(at > 0, "fragmented writer emitted no trun")
    // inflate sample_count (at payload+4) to 1000: the box framing stays
    // intact, but the per-sample field reads run past the trun's end
    val cut = mp4.clone()
    cut(at + 12) = 0; cut(at + 13) = 0; cut(at + 14) = 3; cut(at + 15) = 0xE8.toByte
    val e = intercept[IllegalArgumentException](readMp4(cut))
    assert(e.getMessage.contains("overruns box end"), e.getMessage)
  }
}
