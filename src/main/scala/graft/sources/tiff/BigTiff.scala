package graft.sources.tiff

/** Minimal BigTIFF (TIFF 0x2B) reader — the >4 GB variant the JDK's
  * ImageIO TIFF plugin cannot parse. The reference gets BigTIFF for free
  * through tifffile (`tif_to_n5.py:21`, `ometif_to_n5.py:34`); large
  * microscopy stacks routinely exceed the classic 32-bit offset space, so
  * a volume ingest that stops at classic TIFF hits a wall early.
  *
  * Scope (fails loudly outside it): uncompressed (compression=1) chunky
  * (planar=1) unsigned-integer samples at 8 or 16 bits, striped or tiled,
  * either byte order, first IFD only — the same first-image semantics as
  * `ImageIO.read`. The container differences from classic TIFF are purely
  * structural: a 16-byte header (version 43, offset size 8), 20-byte IFD
  * entries, and 64-bit counts/offsets (types LONG8/SLONG8/IFD8).
  */
object BigTiff {

  /** The 0x2B version check — cheap enough to run on every decode call. */
  def isBigTiff(bytes: Array[Byte]): Boolean =
    bytes.length >= 4 && {
      val le = bytes(0) == 'I' && bytes(1) == 'I'
      val be = bytes(0) == 'M' && bytes(1) == 'M'
      (le || be) && u16(bytes, 2, le) == 43
    }

  // unsigned little/big-endian readers; u64 values beyond Long.MaxValue
  // cannot occur in an in-memory byte array, so Long is safe throughout
  private def u8(b: Array[Byte], o: Long): Int = b(checkedIdx(b, o, 1)) & 0xff
  private def u16(b: Array[Byte], o: Long, le: Boolean): Int = {
    val i = checkedIdx(b, o, 2)
    if (le) (b(i) & 0xff) | ((b(i + 1) & 0xff) << 8)
    else ((b(i) & 0xff) << 8) | (b(i + 1) & 0xff)
  }
  private def u32(b: Array[Byte], o: Long, le: Boolean): Long = {
    val i = checkedIdx(b, o, 4)
    if (le) (b(i) & 0xffL) | ((b(i + 1) & 0xffL) << 8) |
      ((b(i + 2) & 0xffL) << 16) | ((b(i + 3) & 0xffL) << 24)
    else ((b(i) & 0xffL) << 24) | ((b(i + 1) & 0xffL) << 16) |
      ((b(i + 2) & 0xffL) << 8) | (b(i + 3) & 0xffL)
  }
  private def u64(b: Array[Byte], o: Long, le: Boolean): Long = {
    val lo = u32(b, if (le) o else o + 4, le)
    val hi = u32(b, if (le) o + 4 else o, le)
    require(hi < (1L << 31),
      s"BigTIFF 64-bit value at offset $o exceeds addressable range")
    (hi << 32) | lo
  }
  private def checkedIdx(b: Array[Byte], o: Long, n: Int): Int = {
    require(o >= 0 && o + n <= b.length,
      s"truncated BigTIFF: need bytes [$o, ${o + n}) of ${b.length}")
    o.toInt
  }

  // TIFF field types and their byte widths (the subset a baseline
  // grayscale/RGB file uses; LONG8/SLONG8/IFD8 are BigTIFF additions)
  private def typeWidth(t: Int): Int = t match {
    case 1 | 2 | 6 | 7 => 1 // BYTE / ASCII / SBYTE / UNDEFINED
    case 3 | 8 => 2 // SHORT / SSHORT
    case 4 | 9 | 11 => 4 // LONG / SLONG / FLOAT
    case 5 | 10 | 12 | 16 | 17 | 18 => 8 // RATIONAL±/DOUBLE/LONG8/SLONG8/IFD8
    case t => throw new IllegalArgumentException(s"BigTIFF: unknown field type $t")
  }

  private final case class Entry(tag: Int, typ: Int, count: Long, valOff: Long)

  /** Resolve an entry's integer values (inline when they fit in the
    * 8-byte value field, via offset otherwise).
    */
  private def values(b: Array[Byte], e: Entry, le: Boolean): Seq[Long] = {
    val w = typeWidth(e.typ)
    require(e.count >= 0 && e.count <= Int.MaxValue,
      s"BigTIFF tag ${e.tag}: implausible count ${e.count}")
    val base = if (w * e.count <= 8) e.valOff else u64(b, e.valOff, le)
    (0L until e.count).map { i =>
      w match {
        case 1 => u8(b, base + i).toLong
        case 2 => u16(b, base + i * 2, le).toLong
        case 4 => u32(b, base + i * 4, le)
        case 8 => u64(b, base + i * 8, le)
      }
    }
  }

  /** Decode the first IFD into one grayscale slice per band — the
    * BigTIFF twin of the ImageIO path in [[TiffIO.decodeBands]].
    */
  def decodeBands(bytes: Array[Byte]): Seq[TiffIO.Slice] = {
    require(isBigTiff(bytes), "not a BigTIFF stream")
    val le = bytes(0) == 'I'
    require(u16(bytes, 4, le) == 8 && u16(bytes, 6, le) == 0,
      "malformed BigTIFF header: offset bytesize must be 8, reserved 0")
    val ifd = u64(bytes, 8, le)
    val n = u64(bytes, ifd, le)
    require(n > 0 && n < 4096, s"implausible BigTIFF IFD entry count $n")
    val entries = (0L until n).map { i =>
      val o = ifd + 8 + i * 20
      // the value field keeps its FILE OFFSET: inline values narrower
      // than 8 bytes must be re-read at that position with their own
      // width (an inline SHORT is not a u64)
      Entry(u16(bytes, o, le), u16(bytes, o + 2, le), u64(bytes, o + 4, le), o + 12)
    }.map(e => e.tag -> e).toMap
    def tag(t: Int): Option[Seq[Long]] = entries.get(t).map(values(bytes, _, le))
    def single(t: Int): Option[Long] = tag(t).map { v =>
      require(v.size == 1, s"tag $t: expected one value, got ${v.size}"); v.head
    }
    val w = single(256).getOrElse(
      throw new IllegalArgumentException("BigTIFF: missing ImageWidth")).toInt
    val h = single(257).getOrElse(
      throw new IllegalArgumentException("BigTIFF: missing ImageLength")).toInt
    require(w > 0 && h > 0 && w.toLong * h <= Int.MaxValue,
      s"BigTIFF: implausible dimensions ${w}x$h")
    val spp = single(277).getOrElse(1L).toInt
    val bitsPer = tag(258).getOrElse(Seq(1L))
    require(bitsPer.distinct.size == 1,
      s"BigTIFF: heterogeneous BitsPerSample $bitsPer not supported")
    val bits = bitsPer.head.toInt
    require(bits == 8 || bits == 16,
      s"BigTIFF: only 8/16-bit samples supported, got $bits")
    val comp = single(259).getOrElse(1L)
    require(comp == 1,
      s"BigTIFF: only uncompressed (1) supported, got compression=$comp")
    require(single(284).getOrElse(1L) == 1 || spp == 1,
      "BigTIFF: planar configuration 2 not supported")
    require(tag(339).forall(_.forall(_ == 1)),
      "BigTIFF: only unsigned-integer SampleFormat supported")
    val bps = bits / 8
    val out = Array.fill(spp)(new Array[Int](w * h))
    // sample s of pixel (x, y) lives at chunk-relative sample index
    // (row * rowWidth + x) * spp + s; strips and tiles differ only in
    // the chunk geometry
    def copyRow(srcOff: Long, dstY: Int, dstX0: Int, px: Int): Unit = {
      var x = 0
      while (x < px) {
        var s = 0
        while (s < spp) {
          val o = srcOff + (x.toLong * spp + s) * bps
          out(s)((dstX0 + x) + dstY * w) =
            if (bps == 1) u8(bytes, o) else u16(bytes, o, le)
          s += 1
        }
        x += 1
      }
    }
    if (entries.contains(324) || entries.contains(322)) {
      // tiled layout
      val tw = single(322).getOrElse(
        throw new IllegalArgumentException("BigTIFF: tiled file missing TileWidth")).toInt
      val th = single(323).getOrElse(
        throw new IllegalArgumentException("BigTIFF: tiled file missing TileLength")).toInt
      val offs = tag(324).getOrElse(
        throw new IllegalArgumentException("BigTIFF: tiled file missing TileOffsets"))
      val counts = tag(325).getOrElse(
        throw new IllegalArgumentException("BigTIFF: tiled file missing TileByteCounts"))
      val across = (w + tw - 1) / tw
      val down = (h + th - 1) / th
      require(offs.size == across * down && counts.size == offs.size,
        s"BigTIFF: expected ${across * down} tiles, got ${offs.size}/${counts.size}")
      val tileBytes = tw.toLong * th * spp * bps
      for (ty <- 0 until down; tx <- 0 until across) {
        val i = ty * across + tx
        require(counts(i) == tileBytes,
          s"BigTIFF tile $i: ${counts(i)} bytes, expected $tileBytes")
        val x0 = tx * tw
        val y0 = ty * th
        val px = math.min(tw, w - x0)
        val py = math.min(th, h - y0)
        var r = 0
        while (r < py) {
          copyRow(offs(i) + r.toLong * tw * spp * bps, y0 + r, x0, px)
          r += 1
        }
      }
    } else {
      // striped layout
      val offs = tag(273).getOrElse(
        throw new IllegalArgumentException("BigTIFF: missing StripOffsets"))
      val counts = tag(279).getOrElse(
        throw new IllegalArgumentException("BigTIFF: missing StripByteCounts"))
      val rps = single(278).getOrElse(h.toLong).toInt
      val strips = (h + rps - 1) / rps
      require(offs.size == strips && counts.size == strips,
        s"BigTIFF: expected $strips strips, got ${offs.size}/${counts.size}")
      val rowBytes = w.toLong * spp * bps
      for (s <- 0 until strips) {
        val y0 = s * rps
        val rows = math.min(rps, h - y0)
        require(counts(s) == rows * rowBytes,
          s"BigTIFF strip $s: ${counts(s)} bytes, expected ${rows * rowBytes}")
        var r = 0
        while (r < rows) {
          copyRow(offs(s) + r * rowBytes, y0 + r, 0, w)
          r += 1
        }
      }
    }
    out.toSeq.map(px => TiffIO.Slice(w, h, px, bits))
  }
}
