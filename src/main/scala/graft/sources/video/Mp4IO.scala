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
    * units. `sampleSync` marks keyframes — from `stss` for
    * moov-resident samples (absent table = all sync) and from the
    * trun/tfhd/trex sample-flags non-sync bit for fragment samples —
    * surfaced even for codecs the engine cannot decode, so
    * fingerprint-dedup and cut heuristics can run on real crawl video.
    */
  final case class Mp4Track(
      trackId: Int, handler: String, codec: String,
      width: Int, height: Int, timescale: Long,
      sampleOffsets: Array[Long], sampleSizes: Array[Int],
      sampleTimes: Array[Long], sampleSync: Array[Boolean])

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

  /** One walked box: [start, end) with the payload after the header.
    * `start` matters for fragments: tfhd's default-base-is-moof
    * measures data offsets from the enclosing moof's FIRST byte.
    */
  private final case class Box(typ: String, start: Long, payload: Long, end: Long)

  /** Walk the direct children of [start, end), strict on framing. */
  private def children(b: Array[Byte], start: Long, end: Long): Seq[Box] = {
    val out = Vector.newBuilder[Box]
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
      out += Box(typ, p, payload, p + size)
      p += size
    }
    out.result()
  }

  private def child(b: Array[Byte], boxes: Seq[Box],
      typ: String, requiredIn: String): (Long, Long) =
    boxes.find(_.typ == typ)
      .map(t => (t.payload, t.end))
      .getOrElse(fail(s"missing '$typ' in '$requiredIn'"))

  /** Per-track fragment defaults from moov/mvex/trex. */
  private final case class Trex(defDur: Long, defSize: Long, defFlags: Long)

  /** Parse the container and resolve every track's full sample table —
    * moov-resident tables AND movie fragments (`moof/traf/tfhd/tfdt/
    * trun`, r18): fragment sample runs are resolved to absolute byte
    * ranges and appended in file order, decode times continuing via
    * `tfdt` (or accumulation when absent). The walk is metadata-sized;
    * no sample payload is touched.
    */
  def readMp4(bytes: Array[Byte]): Seq[Mp4Track] = {
    val top = children(bytes, 0, bytes.length.toLong)
    if (!top.headOption.exists(_.typ == "ftyp"))
      fail(s"first box must be 'ftyp', got '${top.headOption.map(_.typ).getOrElse("<none>")}'")
    val (moovS, moovE) = child(bytes, top, "moov", "file")
    val moovKids = children(bytes, moovS, moovE)
    val tracks = moovKids.filter(_.typ == "trak").map { k =>
      parseTrak(bytes, k.payload, k.end)
    }
    val moofs = top.filter(_.typ == "moof")
    if (moofs.isEmpty) tracks
    else {
      // trex defaults (one per track) — required context for any traf
      // that omits its own defaults
      val trex: Map[Int, Trex] = moovKids.find(_.typ == "mvex") match {
        case None => Map.empty
        case Some(mvex) =>
          children(bytes, mvex.payload, mvex.end).filter(_.typ == "trex").map { t =>
            val o = t.payload.toInt
            (u32(bytes, o + 4).toInt,
              Trex(u32(bytes, o + 12), u32(bytes, o + 16), u32(bytes, o + 20)))
          }.toMap
      }
      val frag = scala.collection.mutable.Map.empty[Int, FragAcc]
      tracks.foreach { t =>
        frag(t.trackId) = new FragAcc(
          t.sampleTimes.lastOption.map(_ + sttsLastDelta(t)).getOrElse(0L))
      }
      moofs.foreach(m => parseMoof(bytes, m, trex, frag))
      tracks.map { t =>
        val a = frag(t.trackId)
        if (a.sizes.isEmpty) t
        else t.copy(
          sampleOffsets = t.sampleOffsets ++ a.offsets,
          sampleSizes = t.sampleSizes ++ a.sizes,
          sampleTimes = t.sampleTimes ++ a.times,
          sampleSync = t.sampleSync ++ a.syncs)
      }
    }
  }

  /** Continuation delta for a track whose moov samples end mid-stream:
    * the duration of the LAST moov sample (uniform-delta tracks: any).
    */
  private def sttsLastDelta(t: Mp4Track): Long =
    if (t.sampleTimes.length >= 2)
      t.sampleTimes(t.sampleTimes.length - 1) - t.sampleTimes(t.sampleTimes.length - 2)
    else 0L

  private final class FragAcc(var nextTime: Long) {
    val offsets = scala.collection.mutable.ArrayBuffer.empty[Long]
    val sizes = scala.collection.mutable.ArrayBuffer.empty[Int]
    val times = scala.collection.mutable.ArrayBuffer.empty[Long]
    val syncs = scala.collection.mutable.ArrayBuffer.empty[Boolean]
  }

  /** One movie fragment: every traf's sample runs resolve to absolute
    * offsets against its base (explicit `base_data_offset`, or the
    * moof's first byte under default-base-is-moof / the first-traf
    * default).
    */
  private def parseMoof(b: Array[Byte], moof: Box,
      trex: Map[Int, Trex], frag: scala.collection.mutable.Map[Int, FragAcc]): Unit = {
    val kids = children(b, moof.payload, moof.end)
    var trafIdx = 0
    kids.filter(_.typ == "traf").foreach { traf =>
      val tkids = children(b, traf.payload, traf.end)
      val (tfhdS, tfhdE) = child(b, tkids, "tfhd", "traf")
      // every optional-field cursor is bounded against its OWN box end
      // before the read — a truncated/malformed tfhd or trun must fail
      // loudly, not consume the following box's bytes as field values
      // (the stts parser's hardening, mirrored)
      def need(p: Long, nBytes: Int, endPos: Long, what: String): Unit =
        if (p + nBytes > endPos)
          fail(s"$what truncated: ${nBytes}B field at $p overruns box end $endPos")
      need(tfhdS, 8, tfhdE, "tfhd")
      val tf = u32(b, tfhdS.toInt).toInt & 0xffffff
      val trackId = u32(b, tfhdS.toInt + 4).toInt
      var pos = tfhdS.toInt + 8
      val baseDataOffset: Option[Long] =
        if ((tf & 0x1) != 0) {
          need(pos, 8, tfhdE, "tfhd base_data_offset")
          val v = u64(b, pos); pos += 8; Some(v)
        } else None
      if ((tf & 0x2) != 0) {
        need(pos, 4, tfhdE, "tfhd sample_description_index")
        pos += 4
      }
      val d = trex.get(trackId)
      def tfhdField(bit: Int, what: String, dflt: Trex => Long): Option[Long] =
        if ((tf & bit) != 0) {
          need(pos, 4, tfhdE, what)
          val v = u32(b, pos); pos += 4; Some(v)
        } else d.map(dflt)
      val defDur = tfhdField(0x8, "tfhd default_sample_duration", _.defDur)
      val defSize = tfhdField(0x10, "tfhd default_sample_size", _.defSize)
      val defFlags = tfhdField(0x20, "tfhd default_sample_flags", _.defFlags)
      val base: Long = baseDataOffset.getOrElse {
        if ((tf & 0x20000) != 0) moof.start // default-base-is-moof
        else if (trafIdx == 0) moof.start // spec default for the first traf
        else fail(s"traf #$trafIdx for track $trackId has neither " +
          "base_data_offset nor default-base-is-moof")
      }
      val acc = frag.getOrElse(trackId,
        fail(s"moof references track $trackId with no moov trak"))
      // tfdt overrides accumulated time when present
      tkids.find(_.typ == "tfdt").foreach { tfdt =>
        need(tfdt.payload, 4, tfdt.end, "tfdt")
        val ver = b(tfdt.payload.toInt) & 0xff
        need(tfdt.payload + 4, if (ver == 1) 8 else 4, tfdt.end,
          "tfdt base_media_decode_time")
        acc.nextTime =
          if (ver == 1) u64(b, tfdt.payload.toInt + 4)
          else u32(b, tfdt.payload.toInt + 4)
      }
      // data cursor: truns without an explicit data_offset continue
      // where the previous run in this traf ended
      var cursor = base
      tkids.filter(_.typ == "trun").foreach { trun =>
        need(trun.payload, 8, trun.end, "trun")
        val rf = u32(b, trun.payload.toInt).toInt & 0xffffff
        val n = u32(b, trun.payload.toInt + 4).toInt
        if (n < 0 || n > (1 << 24)) fail(s"implausible trun sample count $n")
        var rp = trun.payload.toInt + 8
        if ((rf & 0x1) != 0) {
          need(rp, 4, trun.end, "trun data_offset")
          // signed 32-bit, relative to the traf base
          cursor = base + u32(b, rp).toInt
          rp += 4
        }
        val firstFlags: Option[Long] =
          if ((rf & 0x4) != 0) {
            need(rp, 4, trun.end, "trun first_sample_flags")
            val v = u32(b, rp); rp += 4; Some(v)
          } else None
        for (i <- 0 until n) {
          val dur =
            if ((rf & 0x100) != 0) {
              need(rp, 4, trun.end, "trun sample_duration")
              val v = u32(b, rp); rp += 4; v
            }
            else defDur.getOrElse(fail(s"track $trackId: no sample duration " +
              "(trun, tfhd, and trex all silent)"))
          val size =
            if ((rf & 0x200) != 0) {
              need(rp, 4, trun.end, "trun sample_size")
              val v = u32(b, rp); rp += 4; v
            }
            else defSize.getOrElse(fail(s"track $trackId: no sample size"))
          // first_sample_flags overrides sample 0 when per-sample flags
          // are absent; the sample_is_non_sync_sample bit is 1<<16
          val flags =
            if ((rf & 0x400) != 0) {
              need(rp, 4, trun.end, "trun sample_flags")
              val v = u32(b, rp); rp += 4; v
            }
            else if (i == 0 && firstFlags.nonEmpty) firstFlags.get
            else defFlags.getOrElse(fail(s"track $trackId: no sample flags"))
          if ((rf & 0x800) != 0) {
            need(rp, 4, trun.end, "trun sample_composition_time_offset")
            rp += 4 // composition-time offset: unused
          }
          if (size > Int.MaxValue || cursor + size > b.length)
            fail(s"track $trackId: fragment sample [$cursor, ${cursor + size}) " +
              s"exceeds file ${b.length}")
          acc.offsets += cursor
          acc.sizes += size.toInt
          acc.times += acc.nextTime
          acc.syncs += ((flags & 0x10000L) == 0L)
          acc.nextTime += dur
          cursor += size
        }
      }
      trafIdx += 1
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
    val chunkOffsets: Array[Long] = stbl.find(_.typ == "stco") match {
      case Some(box) =>
        val s = box.payload
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

    // stts: decode-time deltas → absolute decode times. Over-coverage
    // is as loud as under-coverage, and the cursor (not the hostile u32
    // count) bounds the loop — a malformed entry cannot drive a long
    // no-op walk (r17 ADVICE).
    val (sttsS, _) = child(b, stbl, "stts", "stbl")
    val nTt = u32(b, sttsS.toInt + 4).toInt
    val times = new Array[Long](nSamples)
    var t = 0L
    var si = 0
    for (i <- 0 until nTt) {
      val o = sttsS.toInt + 8 + 8 * i
      val count = u32(b, o)
      val delta = u32(b, o + 4)
      if (count < 0 || si + count > nSamples)
        fail(s"track $trackId: stts covers ${si + count} of $nSamples samples")
      var k = 0L
      while (k < count) { times(si) = t; t += delta; si += 1; k += 1 }
    }
    if (si != nSamples)
      fail(s"track $trackId: stts covers $si of $nSamples samples")

    // stss: sync-sample table (1-based sample numbers); absent = every
    // sample is a keyframe (ISO 14496-12 8.6.2)
    val sync = Array.fill(nSamples)(stbl.forall(_.typ != "stss"))
    stbl.find(_.typ == "stss").foreach { box =>
      val s = box.payload.toInt
      val n = u32(b, s + 4).toInt
      if (n < 0 || s + 8 + 4L * n > box.end) fail(s"track $trackId: stss truncated")
      for (i <- 0 until n) {
        val sampleNum = u32(b, s + 8 + 4 * i)
        if (sampleNum < 1 || sampleNum > nSamples)
          fail(s"track $trackId: stss names sample $sampleNum of $nSamples")
        sync(sampleNum.toInt - 1) = true
      }
    }

    Mp4Track(trackId, handler, codec, width, height, timescale,
      offsets, sizes, times, sync)
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
    * `syncEvery` > 1 writes an `stss` sync table marking samples
    * 1, 1+syncEvery, … as keyframes (1 = all-sync, no table).
    */
  def writeMp4Mjpeg(
      frames: Seq[Array[Byte]], width: Int, height: Int,
      timescale: Long, sampleDelta: Long, syncEvery: Int = 1): Array[Byte] = {
    require(frames.nonEmpty, "MP4 writer needs at least one frame")
    require(syncEvery >= 1, s"syncEvery must be >= 1, got $syncEvery")
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
    val syncSamples = (1 to frames.length by syncEvery).toSeq
    val stblKids = Seq(stsd, stts, stsc, stsz, stco) ++
      (if (syncEvery > 1) Seq(box("stss", bytesOf { o =>
        w32(o, 0); w32(o, syncSamples.length.toLong)
        syncSamples.foreach(s => w32(o, s.toLong))
      })) else Nil)
    val stbl = container("stbl", stblKids: _*)
    val minf = container("minf", vmhd, dinf, stbl)
    val mdia = container("mdia", mdhd, hdlr, minf)
    val trak = container("trak", tkhd, mdia)
    val moov = container("moov", mvhd, trak)
    ftyp ++ mdat ++ moov
  }

  /** Write the SAME one-track MJPEG stream as a FRAGMENTED MP4 (the
    * DASH/HLS shape real web video ships in): an empty-table moov with
    * `mvex/trex` carrying the default sample duration/flags, then one
    * `moof`+`mdat` pair per `framesPerFragment` frames. Each traf uses
    * default-base-is-moof, a version-1 `tfdt`, and a trun with
    * per-sample sizes; durations come from TREX (deliberately omitted
    * from tfhd/trun so the default-inheritance chain is exercised).
    * The first sample of each fragment is sync, the rest are not —
    * readers must surface the keyframe pattern from sample flags.
    */
  def writeMp4MjpegFragmented(
      frames: Seq[Array[Byte]], width: Int, height: Int,
      timescale: Long, sampleDelta: Long, framesPerFragment: Int): Array[Byte] = {
    require(frames.nonEmpty, "MP4 writer needs at least one frame")
    require(framesPerFragment >= 1, s"framesPerFragment must be >= 1")
    val ftyp = box("ftyp", bytesOf { o =>
      o.write("iso5".getBytes("US-ASCII")); w32(o, 0x200)
      o.write("iso5".getBytes("US-ASCII")); o.write("isom".getBytes("US-ASCII"))
    })
    // moov shell: full headers, EMPTY sample tables, mvex/trex defaults
    val mvhd = box("mvhd", bytesOf { o =>
      w32(o, 0); w32(o, 0); w32(o, 0)
      w32(o, timescale); w32(o, 0) // duration unknown up front
      w32(o, 0x10000); w16(o, 0x100); w16(o, 0)
      w32(o, 0); w32(o, 0)
      Seq(0x10000L, 0, 0, 0, 0x10000L, 0, 0, 0, 0x40000000L).foreach(w32(o, _))
      for (_ <- 0 until 6) w32(o, 0)
      w32(o, 2)
    })
    val tkhd = box("tkhd", bytesOf { o =>
      w32(o, 7); w32(o, 0); w32(o, 0); w32(o, 1); w32(o, 0); w32(o, 0)
      w32(o, 0); w32(o, 0)
      w16(o, 0); w16(o, 0); w16(o, 0); w16(o, 0)
      Seq(0x10000L, 0, 0, 0, 0x10000L, 0, 0, 0, 0x40000000L).foreach(w32(o, _))
      w32(o, width.toLong << 16); w32(o, height.toLong << 16)
    })
    val mdhd = box("mdhd", bytesOf { o =>
      w32(o, 0); w32(o, 0); w32(o, 0)
      w32(o, timescale); w32(o, 0)
      w16(o, 0x55c4); w16(o, 0)
    })
    val hdlr = box("hdlr", bytesOf { o =>
      w32(o, 0); w32(o, 0)
      o.write("vide".getBytes("US-ASCII"))
      w32(o, 0); w32(o, 0); w32(o, 0)
      o.write("graft".getBytes("US-ASCII")); o.write(0)
    })
    val vmhd = box("vmhd", bytesOf { o =>
      w32(o, 1); w16(o, 0); w16(o, 0); w16(o, 0); w16(o, 0)
    })
    val dinf = container("dinf", box("dref", bytesOf { o =>
      w32(o, 0); w32(o, 1)
      w32(o, 12); o.write("url ".getBytes("US-ASCII")); w32(o, 1)
    }))
    val stsd = box("stsd", bytesOf { o =>
      w32(o, 0); w32(o, 1)
      w32(o, 86); o.write("jpeg".getBytes("US-ASCII"))
      for (_ <- 0 until 6) o.write(0)
      w16(o, 1); w16(o, 0); w16(o, 0)
      w32(o, 0); w32(o, 0); w32(o, 0)
      w16(o, width); w16(o, height)
      w32(o, 0x480000); w32(o, 0x480000)
      w32(o, 0); w16(o, 1)
      for (_ <- 0 until 32) o.write(0)
      w16(o, 24); w16(o, 0xffff)
    })
    val emptyTables = Seq(
      box("stts", bytesOf { o => w32(o, 0); w32(o, 0) }),
      box("stsc", bytesOf { o => w32(o, 0); w32(o, 0) }),
      box("stsz", bytesOf { o => w32(o, 0); w32(o, 0); w32(o, 0) }),
      box("stco", bytesOf { o => w32(o, 0); w32(o, 0) }))
    val stbl = container("stbl", (stsd +: emptyTables): _*)
    val minf = container("minf", vmhd, dinf, stbl)
    val mdia = container("mdia", mdhd, hdlr, minf)
    val trak = container("trak", tkhd, mdia)
    val trexFlags = 0x01010000L // depends-on-other + non-sync default
    val mvex = container("mvex", box("trex", bytesOf { o =>
      w32(o, 0) // version+flags
      w32(o, 1) // track_ID
      w32(o, 1) // default_sample_description_index
      w32(o, sampleDelta) // default_sample_duration (truns omit it)
      w32(o, 0) // default_sample_size (truns carry sizes)
      w32(o, trexFlags)
    }))
    val moov = container("moov", mvhd, trak, mvex)

    val out = new ByteArrayOutputStream()
    out.write(ftyp); out.write(moov)
    var seq = 1
    var baseTime = 0L
    frames.grouped(framesPerFragment).foreach { group =>
      def buildMoof(dataOffset: Long): Array[Byte] = {
        val mfhd = box("mfhd", bytesOf { o => w32(o, 0); w32(o, seq.toLong) })
        val tfhd = box("tfhd", bytesOf { o =>
          w32(o, 0x020000) // version 0, flags: default-base-is-moof
          w32(o, 1) // track_ID
        })
        val tfdt = box("tfdt", bytesOf { o =>
          o.write(1); o.write(0); o.write(0); o.write(0) // version 1
          w32(o, baseTime >>> 32); w32(o, baseTime & 0xffffffffL)
        })
        // trun flags: data-offset + first-sample-flags + sample-size
        val trun = box("trun", bytesOf { o =>
          w32(o, 0x000205)
          w32(o, group.length.toLong)
          w32(o, dataOffset)
          w32(o, 0x02000000L) // first sample: sync (depends-on-none)
          group.foreach(f => w32(o, f.length.toLong))
        })
        container("moof", mfhd, container("traf", tfhd, tfdt, trun))
      }
      val moofSize = buildMoof(0L).length
      out.write(buildMoof(moofSize + 8L)) // data starts after mdat header
      val mdatPayload = group.reduce(_ ++ _)
      out.write(box("mdat", mdatPayload))
      baseTime += sampleDelta * group.length
      seq += 1
    }
    out.toByteArray
  }
}
