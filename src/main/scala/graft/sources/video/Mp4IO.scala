package graft.sources.video

import java.io.ByteArrayOutputStream

/** MP4 / ISO-BMFF (ISO 14496-12) reader/writer for MJPEG sample
  * tracks — the real-world video container a crawl actually ships
  * (the engine's video surface was Y4M + animated GIF before this;
  * no user has crawl video in either). Executor-side, JDK-only, loud
  * failures — the [[graft.sources.warc.WarcIO]] discipline on the box
  * format.
  *
  * Layout implemented: the box ("atom") walk — `[size:u32][type:4cc]`
  * with 64-bit `largesize` and size-0 (to-EOF) handled — descending
  * `moov/trak/mdia/{mdhd,hdlr,minf/stbl}`; the full sample-table
  * resolution `stsd` (codec entry + declared geometry), `stts`
  * (decode-time deltas), `stsc` (sample→chunk runs), `stsz` (sizes),
  * `stco`/`co64` (chunk offsets) → absolute per-sample byte ranges
  * into `mdat`. Only `jpeg` (Motion-JPEG) video sample entries are
  * decodable here; other codecs surface loudly, and non-video tracks
  * are the caller's to skip.
  *
  * Scale shape: MP4 files are SCAN INPUT (one binaryFile row per
  * file); [[samples]] is an ITERATOR over the already-resident scan
  * bytes — per-sample copies only, the decoded frames never all
  * materialize, and payloads never shuffle.
  */
object Mp4IO {

  /** One resolved track: sample byte ranges are absolute file offsets
    * (chunk-resolved), `sampleTimes` are decode times in `timescale`
    * units.
    */
  final case class Mp4Track(
      trackId: Int, handler: String, codec: String,
      width: Int, height: Int, timescale: Long,
      sampleOffsets: Array[Long], sampleSizes: Array[Int],
      sampleTimes: Array[Long])

  private def fail(msg: String): Nothing =
    throw new IllegalArgumentException(s"malformed MP4: $msg")

  private def u32(b: Array[Byte], off: Int): Long =
    ((b(off) & 0xffL) << 24) | ((b(off + 1) & 0xffL) << 16) |
      ((b(off + 2) & 0xffL) << 8) | (b(off + 3) & 0xffL)

  private def u64(b: Array[Byte], off: Int): Long =
    (u32(b, off) << 32) | u32(b, off + 4)

  private def u16(b: Array[Byte], off: Int): Int =
    ((b(off) & 0xff) << 8) | (b(off + 1) & 0xff)

  private def fourcc(b: Array[Byte], off: Int): String =
    new String(b, off, 4, "US-ASCII")

  /** Walk the direct children of [start, end): (type, payloadStart,
    * payloadEnd) per box, strict on framing.
    */
  private def children(b: Array[Byte], start: Long, end: Long): Seq[(String, Long, Long)] = {
    val out = Vector.newBuilder[(String, Long, Long)]
    var p = start
    while (p < end) {
      if (p + 8 > end) fail(s"truncated box header at offset $p")
      var size = u32(b, p.toInt)
      val typ = fourcc(b, p.toInt + 4)
      var payload = p + 8
      if (size == 1) {
        if (p + 16 > end) fail(s"truncated largesize box at $p")
        val ls = u64(b, p.toInt + 8)
        if (ls < 16) fail(s"bad largesize $ls for '$typ'")
        size = ls
        payload = p + 16
      } else if (size == 0) {
        size = end - p // to end of enclosing container
      } else if (size < 8) fail(s"bad box size $size for '$typ' at $p")
      if (p + size > end) fail(s"box '$typ' (size $size at $p) exceeds container end $end")
      out += ((typ, payload, p + size))
      p += size
    }
    out.result()
  }

  private def child(b: Array[Byte], boxes: Seq[(String, Long, Long)],
      typ: String, requiredIn: String): (Long, Long) =
    boxes.find(_._1 == typ)
      .map(t => (t._2, t._3))
      .getOrElse(fail(s"missing '$typ' in '$requiredIn'"))

  /** Parse the container and resolve every track's full sample table.
    * The moov walk is metadata-sized; no sample payload is touched.
    */
  def readMp4(bytes: Array[Byte]): Seq[Mp4Track] = {
    val top = children(bytes, 0, bytes.length.toLong)
    if (!top.headOption.exists(_._1 == "ftyp"))
      fail(s"first box must be 'ftyp', got '${top.headOption.map(_._1).getOrElse("<none>")}'")
    val (moovS, moovE) = child(bytes, top, "moov", "file")
    val moovKids = children(bytes, moovS, moovE)
    moovKids.filter(_._1 == "trak").map { case (_, trakS, trakE) =>
      parseTrak(bytes, trakS, trakE)
    }
  }

  private def parseTrak(b: Array[Byte], trakS: Long, trakE: Long): Mp4Track = {
    val trakKids = children(b, trakS, trakE)
    val (tkhdS, _) = child(b, trakKids, "tkhd", "trak")
    val tkhdVer = b(tkhdS.toInt) & 0xff
    val trackId =
      if (tkhdVer == 1) u32(b, tkhdS.toInt + 4 + 8 + 8).toInt
      else u32(b, tkhdS.toInt + 4 + 4 + 4).toInt
    val (mdiaS, mdiaE) = child(b, trakKids, "mdia", "trak")
    val mdiaKids = children(b, mdiaS, mdiaE)
    val (mdhdS, _) = child(b, mdiaKids, "mdhd", "mdia")
    val mdhdVer = b(mdhdS.toInt) & 0xff
    val timescale =
      if (mdhdVer == 1) u32(b, mdhdS.toInt + 4 + 8 + 8)
      else u32(b, mdhdS.toInt + 4 + 4 + 4)
    if (timescale <= 0) fail(s"track $trackId: bad mdhd timescale $timescale")
    val (hdlrS, _) = child(b, mdiaKids, "hdlr", "mdia")
    val handler = fourcc(b, hdlrS.toInt + 8)
    val (minfS, minfE) = child(b, mdiaKids, "minf", "mdia")
    val (stblS, stblE) = child(b, children(b, minfS, minfE), "stbl", "minf")
    val stbl = children(b, stblS, stblE)

    // stsd: codec fourcc + declared geometry (VisualSampleEntry)
    val (stsdS, _) = child(b, stbl, "stsd", "stbl")
    val nEntries = u32(b, stsdS.toInt + 4)
    if (nEntries != 1) fail(s"track $trackId: ${nEntries} stsd entries (want 1)")
    val entryOff = stsdS.toInt + 8
    val codec = fourcc(b, entryOff + 4)
    val (width, height) =
      if (handler == "vide") (u16(b, entryOff + 32), u16(b, entryOff + 34))
      else (0, 0)

    // stsz: per-sample sizes
    val (stszS, _) = child(b, stbl, "stsz", "stbl")
    val uniform = u32(b, stszS.toInt + 4)
    val nSamples = u32(b, stszS.toInt + 8).toInt
    if (nSamples < 0 || nSamples > (1 << 24))
      fail(s"track $trackId: implausible sample count $nSamples")
    val sizes = Array.tabulate(nSamples) { i =>
      val v = if (uniform != 0) uniform else u32(b, stszS.toInt + 12 + 4 * i)
      if (v > Int.MaxValue) fail(s"sample $i too large ($v)")
      v.toInt
    }

    // stco/co64: chunk offsets
    val chunkOffsets: Array[Long] = stbl.find(_._1 == "stco") match {
      case Some((_, s, _)) =>
        val n = u32(b, s.toInt + 4).toInt
        Array.tabulate(n)(i => u32(b, s.toInt + 8 + 4 * i))
      case None =>
        val (s, _) = child(b, stbl, "co64", "stbl")
        val n = u32(b, s.toInt + 4).toInt
        Array.tabulate(n)(i => u64(b, s.toInt + 8 + 8 * i))
    }

    // stsc: sample→chunk runs → per-sample chunk index
    val (stscS, _) = child(b, stbl, "stsc", "stbl")
    val nRuns = u32(b, stscS.toInt + 4).toInt
    val runs = Array.tabulate(nRuns) { i =>
      val o = stscS.toInt + 8 + 12 * i
      (u32(b, o).toInt, u32(b, o + 4).toInt) // (first_chunk 1-based, samples_per_chunk)
    }
    if (nRuns == 0 && nSamples > 0) fail(s"track $trackId: empty stsc")

    // resolve absolute offsets: walk chunks in order, laying samples
    // consecutively within each chunk
    val offsets = new Array[Long](nSamples)
    var sample = 0
    var run = 0
    var chunk = 0 // 0-based
    while (sample < nSamples) {
      if (chunk >= chunkOffsets.length)
        fail(s"track $trackId: sample $sample has no chunk (of ${chunkOffsets.length})")
      while (run + 1 < runs.length && chunk + 1 >= runs(run + 1)._1) run += 1
      val perChunk = runs(run)._2
      var within = 0
      var off = chunkOffsets(chunk)
      while (within < perChunk && sample < nSamples) {
        offsets(sample) = off
        if (off + sizes(sample) > b.length)
          fail(s"track $trackId: sample $sample [$off, ${off + sizes(sample)}) exceeds file ${b.length}")
        off += sizes(sample)
        sample += 1
        within += 1
      }
      chunk += 1
    }

    // stts: decode-time deltas → absolute decode times
    val (sttsS, _) = child(b, stbl, "stts", "stbl")
    val nTt = u32(b, sttsS.toInt + 4).toInt
    val times = new Array[Long](nSamples)
    var t = 0L
    var si = 0
    for (i <- 0 until nTt) {
      val o = sttsS.toInt + 8 + 8 * i
      val count = u32(b, o).toInt
      val delta = u32(b, o + 4)
      for (_ <- 0 until count) {
        if (si < nSamples) { times(si) = t; t += delta; si += 1 }
      }
    }
    if (si != nSamples)
      fail(s"track $trackId: stts covers $si of $nSamples samples")

    Mp4Track(trackId, handler, codec, width, height, timescale,
      offsets, sizes, times)
  }

  /** Iterate a track's samples as (decodeTime, bytes) — per-sample
    * copies off the scan bytes, one at a time.
    */
  def samples(bytes: Array[Byte], track: Mp4Track): Iterator[(Long, Array[Byte])] =
    Iterator.tabulate(track.sampleSizes.length) { i =>
      val off = track.sampleOffsets(i)
      (track.sampleTimes(i),
        java.util.Arrays.copyOfRange(bytes, off.toInt, off.toInt + track.sampleSizes(i)))
    }

  // ------------------------------------------------------------------
  // Writer (fixture path): minimal valid isom file — ftyp, mdat (one
  // chunk per sample), moov with the full sample table. Layout is
  // ftyp|mdat|moov so sample offsets are known before moov is built.
  // ------------------------------------------------------------------

  private def box(typ: String, payload: Array[Byte]): Array[Byte] = {
    val out = new ByteArrayOutputStream(payload.length + 8)
    w32(out, payload.length + 8)
    out.write(typ.getBytes("US-ASCII"))
    out.write(payload)
    out.toByteArray
  }

  private def container(typ: String, kids: Array[Byte]*): Array[Byte] =
    box(typ, kids.reduce(_ ++ _))

  private def w32(out: ByteArrayOutputStream, v: Long): Unit = {
    out.write(((v >> 24) & 0xff).toInt); out.write(((v >> 16) & 0xff).toInt)
    out.write(((v >> 8) & 0xff).toInt); out.write((v & 0xff).toInt)
  }
  private def w16(out: ByteArrayOutputStream, v: Int): Unit = {
    out.write((v >> 8) & 0xff); out.write(v & 0xff)
  }

  private def bytesOf(f: ByteArrayOutputStream => Unit): Array[Byte] = {
    val out = new ByteArrayOutputStream()
    f(out)
    out.toByteArray
  }

  /** Write a one-track MJPEG MP4: each frame is one sample in its own
    * chunk, constant duration `sampleDelta` in `timescale` units.
    */
  def writeMp4Mjpeg(
      frames: Seq[Array[Byte]], width: Int, height: Int,
      timescale: Long, sampleDelta: Long): Array[Byte] = {
    require(frames.nonEmpty, "MP4 writer needs at least one frame")
    val ftyp = box("ftyp", bytesOf { o =>
      o.write("isom".getBytes("US-ASCII")); w32(o, 0x200)
      o.write("isom".getBytes("US-ASCII")); o.write("iso2".getBytes("US-ASCII"))
    })
    val mdatPayload = frames.reduce(_ ++ _)
    val mdat = box("mdat", mdatPayload)
    // sample offsets: ftyp + mdat header (8) + cumulative frame sizes
    val base = ftyp.length + 8
    val offsets = frames.scanLeft(base.toLong)(_ + _.length).init
    val duration = sampleDelta * frames.length

    val mvhd = box("mvhd", bytesOf { o =>
      w32(o, 0) // version+flags
      w32(o, 0); w32(o, 0) // creation/modification
      w32(o, timescale); w32(o, duration)
      w32(o, 0x10000); w16(o, 0x100); w16(o, 0) // rate, volume, reserved
      w32(o, 0); w32(o, 0)
      Seq(0x10000L, 0, 0, 0, 0x10000L, 0, 0, 0, 0x40000000L).foreach(w32(o, _))
      for (_ <- 0 until 6) w32(o, 0) // pre_defined
      w32(o, 2) // next_track_ID
    })
    val tkhd = box("tkhd", bytesOf { o =>
      w32(o, 7) // version 0, flags: enabled+in-movie+in-preview
      w32(o, 0); w32(o, 0)
      w32(o, 1) // track_ID
      w32(o, 0); w32(o, duration)
      w32(o, 0); w32(o, 0) // reserved
      w16(o, 0); w16(o, 0); w16(o, 0); w16(o, 0) // layer, group, volume, reserved
      Seq(0x10000L, 0, 0, 0, 0x10000L, 0, 0, 0, 0x40000000L).foreach(w32(o, _))
      w32(o, width.toLong << 16); w32(o, height.toLong << 16)
    })
    val mdhd = box("mdhd", bytesOf { o =>
      w32(o, 0); w32(o, 0); w32(o, 0)
      w32(o, timescale); w32(o, duration)
      w16(o, 0x55c4); w16(o, 0) // language 'und', pre_defined
    })
    val hdlr = box("hdlr", bytesOf { o =>
      w32(o, 0); w32(o, 0)
      o.write("vide".getBytes("US-ASCII"))
      w32(o, 0); w32(o, 0); w32(o, 0)
      o.write("graft".getBytes("US-ASCII")); o.write(0)
    })
    val vmhd = box("vmhd", bytesOf { o =>
      w32(o, 1) // version 0, flags 1
      w16(o, 0); w16(o, 0); w16(o, 0); w16(o, 0)
    })
    val dinf = container("dinf", box("dref", bytesOf { o =>
      w32(o, 0); w32(o, 1)
      w32(o, 12); o.write("url ".getBytes("US-ASCII")); w32(o, 1)
    }))
    val stsd = box("stsd", bytesOf { o =>
      w32(o, 0); w32(o, 1)
      // VisualSampleEntry 'jpeg': 86 bytes
      w32(o, 86); o.write("jpeg".getBytes("US-ASCII"))
      for (_ <- 0 until 6) o.write(0)
      w16(o, 1) // data_reference_index
      w16(o, 0); w16(o, 0) // pre_defined, reserved
      w32(o, 0); w32(o, 0); w32(o, 0)
      w16(o, width); w16(o, height)
      w32(o, 0x480000); w32(o, 0x480000) // 72 dpi
      w32(o, 0); w16(o, 1) // reserved, frame_count
      for (_ <- 0 until 32) o.write(0) // compressorname
      w16(o, 24); w16(o, 0xffff) // depth, pre_defined -1
    })
    val stts = box("stts", bytesOf { o =>
      w32(o, 0); w32(o, 1); w32(o, frames.length.toLong); w32(o, sampleDelta)
    })
    val stsc = box("stsc", bytesOf { o =>
      w32(o, 0); w32(o, 1); w32(o, 1); w32(o, 1); w32(o, 1)
    })
    val stsz = box("stsz", bytesOf { o =>
      w32(o, 0); w32(o, 0); w32(o, frames.length.toLong)
      frames.foreach(f => w32(o, f.length.toLong))
    })
    val stco = box("stco", bytesOf { o =>
      w32(o, 0); w32(o, offsets.length.toLong)
      offsets.foreach(w32(o, _))
    })
    val stbl = container("stbl", stsd, stts, stsc, stsz, stco)
    val minf = container("minf", vmhd, dinf, stbl)
    val mdia = container("mdia", mdhd, hdlr, minf)
    val trak = container("trak", tkhd, mdia)
    val moov = container("moov", mvhd, trak)
    ftyp ++ mdat ++ moov
  }
}
